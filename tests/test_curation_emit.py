"""Stage-order proofs for the composed curated-corpus manifest
(`corpus_curation_emit`): reason codes must be the FIRST failing stage in
pipeline order, and each stage's decisions must agree with an independent
brute-force recomputation from the raw corpus."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.queries.corpus_q import _BENCH_SOURCE, _DECON_K
from ethical_data_ingestion_spark.queries.text_q import _ENS_TAU

SF_DIR = "/root/testdata/sf0.001"


def _rows(spark):
    return registry.QUERIES["corpus_curation_emit"](spark, SF_DIR).collect()


def test_manifest_covers_corpus_with_valid_reasons(spark):
    rows = _rows(spark)
    assert len(rows) == load_table(spark, SF_DIR, "documents").count()
    ok = {"benchmark_holdout", "quality", "near_duplicate", "contaminated", None}
    for r in rows:
        assert r.drop_reason in ok
        assert r.kept == (r.drop_reason is None)
    # all four stages and the kept class must occur on the fixture
    assert {r.drop_reason for r in rows} == ok


def test_stage_order_invariants(spark):
    rows = _rows(spark)
    for r in rows:
        if r.source == _BENCH_SOURCE:
            assert r.drop_reason == "benchmark_holdout"
        if r.drop_reason == "quality":
            assert r.z < _ENS_TAU
        if r.drop_reason in ("near_duplicate", "contaminated") or r.kept:
            if r.source != _BENCH_SOURCE:
                assert r.z >= _ENS_TAU


def test_contaminated_rows_share_benchmark_8gram(spark):
    """Brute force, no Spark machinery: a row reason-coded 'contaminated'
    (and any KEPT row) is checked against a Python recomputation of the
    benchmark 8-gram set."""
    docs = load_table(spark, SF_DIR, "documents").collect()

    def grams(text: str) -> set:
        t = " ".join(text.lower().split()).split(" ")
        return {tuple(t[i : i + _DECON_K]) for i in range(len(t) - _DECON_K + 1)}

    bench = set()
    for d in docs:
        if d.source == _BENCH_SOURCE:
            bench |= grams(d.text)
    hit = {d.doc_id for d in docs if d.source != _BENCH_SOURCE and grams(d.text) & bench}
    for r in _rows(spark):
        if r.drop_reason == "contaminated":
            assert r.doc_id in hit
        if r.kept:
            assert r.doc_id not in hit


def test_neardup_stage_elects_best_surviving_member(spark):
    """Within each cross-tier cluster, the docs alive at the dedup stage
    (non-benchmark, z >= tau) keep exactly their max-z member (ties to
    lowest id); a cluster with no alive member keeps nobody via dedup."""
    rows = {r.doc_id: r for r in _rows(spark)}
    clusters = registry.QUERIES["neardup_emit"](spark, SF_DIR).collect()
    by_cluster: dict[int, list] = {}
    for c in clusters:
        if c.cluster_size > 1:
            by_cluster.setdefault(c.cluster_id, []).append(c.doc_id)
    assert by_cluster
    for members in by_cluster.values():
        alive = [
            d for d in members
            if rows[d].source != _BENCH_SOURCE and rows[d].z >= _ENS_TAU
        ]
        survivors = [d for d in alive if rows[d].drop_reason != "near_duplicate"]
        if not alive:
            continue
        best = min(alive, key=lambda d: (-rows[d].z, d))
        assert survivors == [best]
