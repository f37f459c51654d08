"""Focused equivalence tests for the round-12 optimization rewrites.

Each test pins an operator-internal rewrite to the semantics it replaced,
on synthetic inputs small enough to compute the naive form directly:

* ``shingle_id_sets`` — dictionary-encoded verification twin: injective
  codes, and ``_verify_jaccard`` over the encoded sets returns exactly the
  rows it returns over the string sets.
* ``graph_q._ORDER_PAIRS`` — per-order basket pair explosion produces
  exactly the ordered pair set of the items-self-join it replaced.
* edge-iterator triangle counting — sum of ``|N_out(u) ∩ N_out(v)|`` over
  oriented edges equals the wedge-enumeration count it replaced.
* ``graph_q._round_tagged`` — the folded stats input: one row per
  (round, node), values matching the per-round tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark.operators import dedup as D
from ethical_data_ingestion_spark.queries import graph_q as G


def test_shingle_id_sets_codes_are_injective_and_verify_identically(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e g"),
            (3, "a b c d e f"),
            (4, "x y z w v u"),
            (5, "completely different words here now ok"),
        ],
        "doc_id long, text string",
    )
    sets = D._shingle_sets(docs, "doc_id", "text", 3)
    idsets = D.shingle_id_sets(sets, "doc_id")

    # injectivity: as many distinct codes as distinct shingles
    n_strings = (
        sets.select(F.explode("sh").alias("s")).select("s").distinct().count()
    )
    n_codes = (
        idsets.select(F.explode("sh").alias("c")).select("c")
        .distinct()
        .count()
    )
    assert n_codes == n_strings

    # n_sh carried over unchanged
    a = {r["doc_id"]: r["n_sh"] for r in sets.select("doc_id", "n_sh").collect()}
    b = {r["doc_id"]: r["n_sh"] for r in idsets.select("doc_id", "n_sh").collect()}
    assert a == b

    # verification rows identical for every threshold in the sweep range
    cand = D.jaccard_candidates(sets, "doc_id", 0.5)
    for t in (0.5, 0.8, 1.0):
        via_str = sorted(
            map(tuple, D._verify_jaccard(cand, sets, "doc_id", t).collect())
        )
        via_ids = sorted(
            map(tuple, D._verify_jaccard(cand, idsets, "doc_id", t).collect())
        )
        assert via_str == via_ids
        if t == 1.0:
            assert (1, 3, 1.0) in [(r[0], r[1], r[2]) for r in via_str]


def _naive_pairs(items):
    """Ordered (u < v) co-purchase pair set of an (order, part) list."""
    from collections import defaultdict

    by_order = defaultdict(set)
    for o, p in items:
        by_order[o].add(p)
    out = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                out.add((ps[i], ps[j]))
    return out


def test_order_pairs_explode_matches_items_self_join(spark):
    items = [
        (1, 10), (1, 20), (1, 30), (1, 10),   # dup line: same (order, part)
        (2, 10), (2, 40),
        (3, 50),                               # single-item order: no pairs
        (4, 20), (4, 10), (4, 20),
    ]
    li = spark.createDataFrame(items, "l_orderkey long, l_partkey long")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    got = {
        (r["u"], r["v"])
        for r in baskets.select(F.expr(G._ORDER_PAIRS).alias("e"))
        .select("e.u", "e.v")
        .distinct()
        .collect()
    }
    assert got == _naive_pairs(items)
    assert all(u < v for u, v in got)


def test_edge_iterator_triangle_count_matches_wedge_enumeration(spark):
    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge and a 3-cycle
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
           (6, 7), (6, 8), (7, 8)]
    edges = spark.createDataFrame(und, "u long, v long")
    deg_rows = {}
    for u, v in und:
        deg_rows[u] = deg_rows.get(u, 0) + 1
        deg_rows[v] = deg_rows.get(v, 0) + 1
    deg = spark.createDataFrame(
        [(n, d) for n, d in deg_rows.items()], "n long, d long"
    )
    oriented = G._degree_oriented(edges, deg)

    # naive wedge enumeration over the oriented edges (driver-side): a
    # wedge (x, y) out of s closes iff {x, y} is itself an oriented edge
    o = {(r["s"], r["t"]) for r in oriented.select("s", "t").collect()}
    from collections import defaultdict
    from itertools import combinations

    out = defaultdict(set)
    for s, t in o:
        out[s].add(t)
    naive = sum(
        1
        for ts in out.values()
        for x, y in combinations(sorted(ts), 2)
        if (x, y) in o or (y, x) in o
    )
    # K4 has 4 triangles; the 3-cycle adds 1
    assert naive == 5

    nbrs = oriented.groupBy(F.col("s").alias("n")).agg(
        F.collect_list("t").alias("nb")
    )
    nu = nbrs.select(F.col("n").alias("s"), F.col("nb").alias("nb_u"))
    nv = nbrs.select(F.col("n").alias("t"), F.col("nb").alias("nb_v"))
    got = (
        oriented.select("s", "t")
        .join(nu, "s")
        .join(nv, "t")
        .select(F.size(F.array_intersect("nb_u", "nb_v")).alias("c"))
        .agg(F.sum("c").cast("long").alias("n"))
        .collect()[0]["n"]
    )
    assert got == 5


def test_round_tagged_union_matches_per_round_tables(spark):
    labels = [
        spark.createDataFrame([(1, 10 * r), (2, 20 * r)], "node long, lbl long")
        for r in range(0, 2 * G._LPA_ROUNDS + 1)
    ]
    cur = G._round_tagged(labels, lambda r: r)
    rows = {(r["round"], r["node"]): r["lbl"] for r in cur.collect()}
    assert len(rows) == 2 * G._LPA_ROUNDS
    for r in range(1, G._LPA_ROUNDS + 1):
        assert rows[(r, 1)] == 10 * r
        assert rows[(r, 2)] == 20 * r
