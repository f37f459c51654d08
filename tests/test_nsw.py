"""Graph-ANN (NSW) invariants: recall vs exact truth, graph degree bound,
and the scale shape of the walk."""

from __future__ import annotations

from ethical_data_ingestion_spark import plans, registry
from ethical_data_ingestion_spark.queries import similarity_q as SQ

SF_DIR = "/root/testdata/sf0.01"


def test_nsw_recall_against_bruteforce(spark):
    exact = {
        (r.query_id, r.vec_id)
        for r in registry.QUERIES["knn_cosine_bruteforce"](spark, SF_DIR).collect()
    }
    approx = (
        registry.QUERIES["knn_cosine_nsw"](spark, SF_DIR).collect()
    )
    got = {(r.query_id, r.vec_id) for r in approx}
    # per the family convention: bound recall, don't demand exactness —
    # a 4-hop, 16-wide walk on a degree-16 layer (measured 0.96 here) keeps
    # comfortably above this floor across fixture revisions
    recall = len(got & exact) / len(exact)
    assert recall >= 0.7, f"NSW recall {recall:.2f} below bound"
    # ranks well-formed per probe
    by_q: dict[int, list[int]] = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_nsw_graph_degree_bounded(spark):
    g = SQ._nsw_graph(spark, SF_DIR)
    mx = g.groupBy("src").count().agg({"count": "max"}).collect()[0][0]
    assert mx <= SQ._NSW_E
    # no self-loops
    assert g.filter("src = dst").count() == 0


def test_nsw_walk_never_scans_corpus_per_hop(spark):
    """The search plan must touch vectors only through node-keyed joins
    (the pinned graph + visited set), never a per-hop corpus rescan with
    a nested loop: no CartesianProduct anywhere."""
    df = registry.QUERIES["knn_cosine_nsw"](spark, SF_DIR)
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_nsw_rejects_zero_hops(spark):
    """n_hops < 1 would leave the scored set unbuilt and crash on a None
    attribute deep in the plan — fail fast instead (round-7 ADVICE)."""
    import pytest

    from ethical_data_ingestion_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    g = SQ._nsw_graph(spark, SF_DIR)
    probes = emb.limit(2).selectExpr("vec_id as query_id", "embedding")
    with pytest.raises(ValueError, match="n_hops"):
        S.knn_nsw(emb, probes, g, n_hops=0)


def test_incremental_index_graph_excludes_delta(spark):
    """The persisted layer must contain only index-side nodes: no edge
    endpoint may satisfy the delta predicate."""
    g = SQ._nsw_index_graph(spark, SF_DIR)
    new_ids = {
        r.vec_id
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(SQ._ann_is_new())
        .select("vec_id")
        .collect()
    }
    for r in g.select("src", "dst").collect():
        assert r.src not in new_ids and r.dst not in new_ids


def test_incremental_ann_panel_invariants(spark):
    """Per label: every inserted node gets at most E out-edges; kept
    back-edges never exceed created out-edges (pruning only removes);
    affected node count never exceeds kept back-edges; and the label
    partition covers the whole delta batch exactly once."""
    rows = registry.QUERIES["incremental_ann_stats"](spark, SF_DIR).collect()
    from ethical_data_ingestion_spark.queries.similarity_q import _NSW_E

    n_delta = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(SQ._ann_is_new())
        .count()
    )
    assert sum(r.n_new for r in rows) == n_delta
    for r in rows:
        assert 0 < r.new_out_edges <= r.n_new * _NSW_E
        assert 0 <= r.back_edges_kept <= r.new_out_edges
        assert r.affected_index_nodes <= r.back_edges_kept
        assert -1.0 <= r.avg_out_cos <= 1.0


def test_streaming_serving_matches_batch_lsh(spark):
    """The drain's answer set must equal the BATCH stream-static twin:
    knn_lsh over (index base, delta probes) with the shared bucket
    index — same candidates, same scores, same top-k."""
    from ethical_data_ingestion_spark.io import load_table
    from ethical_data_ingestion_spark.operators import similarity as S
    from ethical_data_ingestion_spark.queries import streaming_q as SQ2

    emb = load_table(spark, SF_DIR, "embeddings")
    index = emb.filter(~SQ._ann_is_new())
    probes = emb.filter(SQ._ann_is_new()).selectExpr(
        "vec_id as query_id", "embedding"
    )
    batch = {
        (r.query_id, r.vec_id, r.cos, r.rank)
        for r in S.knn_lsh(
            index, probes, k=10, n_bits=SQ2._SERVE_BITS
        ).collect()
    }
    stream = {
        (r.query_id, r.vec_id, r.cos, r.rank)
        for r in registry.QUERIES["streaming_knn_serving"](
            spark, SF_DIR
        ).collect()
    }
    assert stream == batch
