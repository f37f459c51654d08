"""The round-12 sampled scale-gate twins for the cluster-resolution
mirrors: each must be EXACTLY its full panel over the corpus containing
only the sampled documents (same pair semantics, components re-resolved
on the sampled graph), and must be non-vacuous at sf0.1 (the sf0.001 and
sf0.01 fixtures are too sparse for both endpoints of a near-dup pair to
land in the 10% sample — the panels' target is the sf1 gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.queries.dedup_q import (
    _DEDUP_SAMPLE_MOD,
    _DEDUP_SAMPLE_REM,
    dedup_tier_attribution,
    dedup_tier_attribution_sampled,
    neardup_clusters,
    neardup_clusters_sampled,
    split_leakage_tier_audit,
    split_leakage_tier_audit_sampled,
    survivor_selection_stats,
    survivor_selection_stats_sampled,
)

SF_DIR = "/root/testdata/sf0.1"


def test_sampled_panels_are_full_panels_of_sampled_corpus(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % _DEDUP_SAMPLE_MOD == _DEDUP_SAMPLE_REM
    )
    sub = str(tmp_path / "subcorpus")
    docs.write.parquet(f"{sub}/documents.parquet")

    got = neardup_clusters_sampled(spark, SF_DIR).collect()
    want = neardup_clusters(spark, sub).collect()
    assert len(got) > 0  # non-vacuous at this scale
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    got_t = dedup_tier_attribution_sampled(spark, SF_DIR).collect()
    want_t = dedup_tier_attribution(spark, sub).collect()
    assert len(got_t) > 0
    assert sorted(map(tuple, got_t)) == sorted(map(tuple, want_t))

    got_l = split_leakage_tier_audit_sampled(spark, SF_DIR).collect()
    want_l = split_leakage_tier_audit(spark, sub).collect()
    assert len(got_l) > 0
    assert sorted(map(tuple, got_l)) == sorted(map(tuple, want_l))
    # the cluster-aware guarantee holds WITHIN the sample
    assert all(
        r.n_cross_pairs == 0 for r in got_l if r.scheme == "cluster_aware"
    )

    # survivor selection: z is corpus-relative, so the sampled panel is
    # the full panel OF THE SUB-CORPUS (z over sampled docs) — exact
    got_s = survivor_selection_stats_sampled(spark, SF_DIR).collect()
    want_s = survivor_selection_stats(spark, sub).collect()
    assert len(got_s) == len(want_s) == 1
    assert tuple(got_s[0]) == tuple(want_s[0])
    assert got_s[0].n_clusters > 0


def test_sampled_components_are_not_a_filter_of_full_labels(spark):
    """The re-resolution property: every sampled cluster label is the min
    sampled doc_id of its SAMPLED component — never a label inherited
    from an unsampled document, and cluster sizes count sampled members
    only (two sampled docs linked through an unsampled intermediary are
    separate sampled clusters)."""
    rows = neardup_clusters_sampled(spark, SF_DIR).collect()
    assert rows
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        assert r.doc_id % _DEDUP_SAMPLE_MOD == _DEDUP_SAMPLE_REM
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)  # label is a sampled member's min id
    sizes = {r.cluster_id: r.cluster_size for r in rows}
    for cid, members in by_cluster.items():
        assert sizes[cid] == len(members)
