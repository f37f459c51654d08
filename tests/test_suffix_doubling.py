"""Suffix-class doubling invariants."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def test_suffix_doubling_profile_invariants(spark):
    rows = sorted(
        registry.QUERIES["suffix_doubling_profile"](spark, SF_DIR).collect(),
        key=lambda r: r.window_tokens,
    )
    assert [r.window_tokens for r in rows] == [1, 2, 4, 8, 16, 32, 64]
    n = rows[0].n_positions
    for r in rows:
        assert r.n_positions == n          # every width profiles all positions
        assert r.dup_positions <= n
        assert r.n_classes <= n
        assert 0.0 <= r.dup_share <= 1.0
        assert r.max_class_size >= 1
    # doubling refines classes: wider windows can only SPLIT equality
    # classes, so class counts rise and duplicated mass falls monotonically
    classes = [r.n_classes for r in rows]
    dups = [r.dup_positions for r in rows]
    assert all(a <= b for a, b in zip(classes, classes[1:]))
    assert all(a >= b for a, b in zip(dups, dups[1:]))


def test_minhash_band_sweep_s_curve(spark):
    """More bands (fewer rows/band) monotonically buys recall with
    candidate volume; the 4x4 row must agree with minhash_recall_stats."""
    rows = sorted(
        registry.QUERIES["minhash_band_sweep"](spark, SF_DIR).collect(),
        key=lambda r: r.bands,
    )
    assert [(r.bands, r.rows_per_band) for r in rows] == [
        (2, 8), (4, 4), (8, 2), (16, 1)
    ]
    recalls = [r.recall for r in rows]
    cands = [r.n_candidates for r in rows]
    assert all(a <= b for a, b in zip(recalls, recalls[1:]))
    assert all(a <= b for a, b in zip(cands, cands[1:]))
    base = registry.QUERIES["minhash_recall_stats"](spark, SF_DIR).collect()[0]
    mid = rows[1]
    assert (mid.n_candidates, mid.n_hits, mid.recall) == (
        base.n_candidates, base.n_hits, base.recall
    )


def test_rag_retrieval_quality_invariants(spark):
    rows = registry.QUERIES["rag_retrieval_quality"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.first_own_rank >= 1
        assert abs(r.reciprocal_rank - round(1.0 / r.first_own_rank, 6)) < 1e-9
        assert 0 <= r.own_in_top5 <= 5
        assert r.top1_is_own in (0, 1)
        if r.top1_is_own:
            assert r.first_own_rank == 1
        if r.first_own_rank <= 5:
            assert r.own_in_top5 >= 1
