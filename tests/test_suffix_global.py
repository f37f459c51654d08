"""Corpus-wide suffix ranking (generalized suffix array) invariants:
cross-implementation agreement with the hash-class sibling, panel
monotonicity, and the plan shape of the doubling rounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.plans.inspect import formatted_plan
from ethical_data_ingestion_spark.queries import spans_q

SF_DIR = "/root/testdata/sf0.001"


def _panel(spark):
    return {
        r.window_tokens: r
        for r in registry.QUERIES["suffix_array_global_profile"](
            spark, SF_DIR
        ).collect()
    }


def test_matches_hash_class_sibling(spark):
    """At every shared width, the ORDERED global ranks must induce exactly
    the equality classes the md5 chain induces: same class count, same
    dup mass, same max class size (suffix_doubling_profile's counts are
    corpus-wide too — its classes are content hashes)."""
    mine = _panel(spark)
    sib = {
        r.window_tokens: r
        for r in registry.QUERIES["suffix_doubling_profile"](
            spark, SF_DIR
        ).collect()
    }
    shared_widths = set(mine) & set(sib)
    assert shared_widths == {1, 2, 4, 8, 16, 32, 64}
    for w in shared_widths:
        assert mine[w].n_classes == sib[w].n_classes, w
        assert mine[w].dup_positions == sib[w].dup_positions, w
        assert mine[w].max_class_size == sib[w].max_class_size, w


def test_panel_monotone_and_bounded(spark):
    """Widening the window can only split classes: n_classes
    non-decreasing, dup/cross-doc mass and max class size non-increasing;
    cross-doc duplication is a subset of duplication; adjacency counts
    are bounded by positions-1 and non-increasing in width."""
    p = _panel(spark)
    widths = sorted(p)
    assert widths == [1, 2, 4, 8, 16, 32, 64, 128]
    for lo, hi in zip(widths, widths[1:]):
        assert p[lo].n_classes <= p[hi].n_classes
        assert p[lo].dup_positions >= p[hi].dup_positions
        assert p[lo].cross_doc_positions >= p[hi].cross_doc_positions
        assert p[lo].max_class_size >= p[hi].max_class_size
        assert p[lo].adj_dup_pairs >= p[hi].adj_dup_pairs
    for w in widths:
        assert p[w].cross_doc_positions <= p[w].dup_positions
        assert p[w].adj_cross_doc_pairs <= p[w].adj_dup_pairs


def test_adjacent_equal_pairs_equal_dup_minus_classes(spark):
    """In suffix order, every duplicated-window class of size s yields
    exactly s-1 adjacent equal pairs (its members are CONTIGUOUS in the
    array — that's the suffix-array property the panel exploits):
    adj_dup_pairs == dup_mass - n_dup_classes at every width."""
    fin = spans_q._suffix_global_ranks(spark, SF_DIR)
    p = _panel(spark)
    for k in range(spans_q._SAG_ROUNDS + 1):
        w = 1 << k
        agg = (
            fin.groupBy(f"k{k}")
            .count()
            .filter(F.col("count") >= 2)
            .agg(
                F.count(F.lit(1)).alias("ncls"),
                F.sum("count").alias("mass"),
            )
            .collect()[0]
        )
        ncls = agg.ncls or 0
        mass = agg.mass or 0
        assert p[w].adj_dup_pairs == mass - ncls, w


def test_doubling_round_has_no_window_at_all(spark):
    """Round-8 verdict item 3: the per-round shift must be the
    (doc_id, i+h) self-EQUI-JOIN, never a doc-partitioned LEAD window —
    a window pins each document to ONE task, so a pathological multi-GB
    document would serialize every round on a single straggler. Pin:
    zero windowspecdefinitions in the shift step's plan, and the join is
    a real equi-join (no nested-loop / cartesian fallback)."""
    fin = spans_q._suffix_global_ranks(spark, SF_DIR)
    toks = fin.select("doc_id", "i", "k0")
    plan = formatted_plan(spans_q._sag_nxt(toks, 1))
    assert "windowspecdefinition" not in plan, "window crept back in"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sa_build_survives_giant_document_skew(spark, tmp_path_factory):
    """One document 100× the median length (the giant-concatenated-web-
    page shape) must not break the build: ranks must still induce the
    exact suffix order, computed here against a Python ground-truth
    suffix sort of the same corpus."""
    rows = [(d, f"tok{d % 7}") for d in range(60)]  # median = 1 token
    giant = " ".join(f"w{(i * i) % 23}" for i in range(100))  # 100 tokens
    rows.append((999, giant))
    d = tmp_path_factory.mktemp("sa_skew")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    fin = spans_q._suffix_global_ranks(spark, str(d))
    got = [
        (r.doc_id, r.i)
        for r in fin.select("rn", "doc_id", "i").orderBy("rn").collect()
    ]
    suffixes = []
    for doc_id, text in rows:
        toks = text.split(" ")
        for i in range(1, len(toks) + 1):
            suffixes.append((toks[i - 1 :], doc_id, i))
    # Manber-Myers sentinel rule: a strict-prefix suffix sorts first;
    # Python's list comparison does exactly that. Ties by (doc_id, i).
    suffixes.sort(key=lambda s: (s[0], s[1], s[2]))
    assert got == [(doc_id, i) for _, doc_id, i in suffixes]


def test_sa_build_auto_deepens_past_report_cap(spark, tmp_path_factory):
    """Round-9 verdict item 1: a document longer than 2^_SAG_ROUNDS tokens
    must AUTO-DEEPEN the doubling (depth = ceil(log2(maxlen))) instead of
    raising, and the deeper ranks must still induce the exact suffix
    order (Python ground-truth suffix sort)."""
    cap = 1 << spans_q._SAG_ROUNDS
    rows = [
        (1, " ".join(f"t{(i * 3) % 11}" for i in range(cap + 5))),
        (2, "t1 t2 t3"),
    ]
    d = tmp_path_factory.mktemp("sa_deepen")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    assert spans_q._sag_depth(spark, str(d)) == spans_q._SAG_ROUNDS + 1
    fin = spans_q._suffix_global_ranks(spark, str(d))
    assert f"k{spans_q._SAG_ROUNDS + 1}" in fin.columns
    got = [
        (r.doc_id, r.i)
        for r in fin.select("rn", "doc_id", "i").orderBy("rn").collect()
    ]
    suffixes = []
    for doc_id, text in rows:
        toks = text.split(" ")
        for i in range(1, len(toks) + 1):
            suffixes.append((toks[i - 1 :], doc_id, i))
    suffixes.sort(key=lambda s: (s[0], s[1], s[2]))
    assert got == [(doc_id, i) for _, doc_id, i in suffixes]


def test_panel_plan_no_cartesian(spark):
    df = registry.QUERIES["suffix_array_global_profile"](spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_lcp_exact_against_python_ground_truth(spark):
    """Recompute the LCP of every adjacent pair token-by-token in Python
    (third implementation, after the Spark level-decomposition and the
    DuckDB array scan) and demand exact equality."""
    texts = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    pairs = spans_q._suffix_lcp_pairs(spark, SF_DIR).collect()
    assert pairs
    for r in pairs:
        ta = texts[r.doc_a][r.pos_a - 1 :]
        tb = texts[r.doc_b][r.pos_b - 1 :]
        lcp = 0
        for x, y in zip(ta, tb):
            if x != y:
                break
            lcp += 1
        assert r.lcp == lcp, (r.doc_a, r.pos_a, r.doc_b, r.pos_b, r.lcp, lcp)


def test_lcp_histogram_covers_all_adjacencies(spark):
    """Histogram mass = n_positions - 1 (every adjacent pair counted
    once); cross-doc mass bounded by total; the top cross-doc span's
    length equals the histogram's max lcp with cross_doc_pairs > 0."""
    fin = spans_q._suffix_global_ranks(spark, SF_DIR)
    npos = fin.count()
    hist = registry.QUERIES["suffix_lcp_histogram"](spark, SF_DIR).collect()
    assert sum(r.n_pairs for r in hist) == npos - 1
    assert all(0 <= r.cross_doc_pairs <= r.n_pairs for r in hist)
    spans = registry.QUERIES["suffix_cross_doc_spans"](spark, SF_DIR).collect()
    max_cross = max(
        (r.lcp for r in hist if r.cross_doc_pairs > 0), default=0
    )
    assert spans[0].lcp_tokens == max_cross
    lcps = [r.lcp_tokens for r in spans]
    assert lcps == sorted(lcps, reverse=True)


def test_removal_panel_monotone(spark):
    rows = registry.QUERIES["substring_dedup_removal_stats"](
        spark, SF_DIR
    ).collect()
    assert [r.span_threshold for r in rows] == [4, 8, 16, 32]
    for lo, hi in zip(rows, rows[1:]):
        assert lo.covered_tokens >= hi.covered_tokens
        assert lo.n_docs_affected >= hi.n_docs_affected
        assert lo.retained_share <= hi.retained_share
    for r in rows:
        assert 0 <= r.covered_tokens <= r.total_tokens
        assert r.n_spans <= r.covered_tokens


def test_sa_neighbor_property_against_bruteforce(spark):
    """The removal panel rests on the suffix-array theorem that a
    suffix's max LCP over ALL other suffixes is attained at an SA
    neighbor. Validate end-to-end: for a sample of positions, brute-
    force the max LCP against every other suffix in Python and compare
    with the pairwise-derived lcpmax."""
    texts = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    suffixes = [
        (d, i) for d, t in texts.items() for i in range(1, len(t) + 1)
    ]
    p = spans_q._suffix_lcp_pairs(spark, SF_DIR)
    from pyspark.sql import functions as F2

    ends = p.select(
        F2.col("doc_a").alias("d"), F2.col("pos_a").alias("i"), "lcp"
    ).unionByName(
        p.select(F2.col("doc_b").alias("d"), F2.col("pos_b").alias("i"), "lcp")
    )
    lcpmax = {
        (r.d, r.i): r.mx
        for r in ends.groupBy("d", "i").agg(F2.max("lcp").alias("mx")).collect()
    }

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                return n
            n += 1
        return n

    import random

    rng = random.Random(8)
    for d, i in rng.sample(suffixes, 60):
        sa = texts[d][i - 1 :]
        best = 0
        for d2, i2 in suffixes:
            if (d2, i2) == (d, i):
                continue
            best = max(best, lcp(sa, texts[d2][i2 - 1 :]))
        assert lcpmax[(d, i)] == best, (d, i, lcpmax[(d, i)], best)
