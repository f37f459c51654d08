"""Policy proofs for the materialized near-dup corpus manifest
(`neardup_emit`): its keep/drop decisions must agree with the tiered
cluster structure and with `survivor_selection_stats`' keep-best
accounting — the two read the SAME clusters and the SAME quality score."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.io import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_emit_keeps_exactly_one_per_cluster(spark):
    rows = registry.QUERIES["neardup_emit"](spark, SF_DIR).collect()
    assert len(rows) == load_table(spark, SF_DIR, "documents").count()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        kept = [r for r in members if r.kept]
        assert len(kept) == 1, f"cluster {cid}: {len(kept)} keepers"
        # singleton (unclustered) docs are their own cluster and keeper
        if len(members) == 1:
            assert members[0].kept and members[0].cluster_size == 1
        else:
            assert all(r.cluster_size == len(members) for r in members)


def test_emit_dropped_mass_matches_selection_panel(spark):
    """n_dropped in survivor_selection_stats == dropped rows here, and the
    keeper set is the keep-best policy the panel priced (same z, same
    tie-break), so retained quality mass is maximal per cluster."""
    rows = registry.QUERIES["neardup_emit"](spark, SF_DIR).collect()
    panel = registry.QUERIES["survivor_selection_stats"](spark, SF_DIR).collect()[0]
    dropped = sum(1 for r in rows if not r.kept)
    assert dropped == panel.n_dropped
    clustered = sum(1 for r in rows if r.cluster_size > 1)
    assert clustered == panel.n_clustered_docs
    assert panel.n_dropped == clustered - panel.n_clusters


def test_emit_keeper_has_max_quality(spark):
    """Independent recomputation: within every multi-doc cluster the kept
    doc's ensemble z is >= every dropped sibling's (ties to lowest id)."""
    from ethical_data_ingestion_spark.queries.text_q import quality_z_df

    z = {
        r.doc_id: r.z
        for r in quality_z_df(load_table(spark, SF_DIR, "documents"))
        .select("doc_id", "z")
        .collect()
    }
    rows = registry.QUERIES["neardup_emit"](spark, SF_DIR).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        if r.cluster_size > 1:
            by_cluster.setdefault(r.cluster_id, []).append(r)
    assert by_cluster, "fixture must contain multi-doc clusters"
    for members in by_cluster.values():
        keeper = next(r for r in members if r.kept)
        best = min(members, key=lambda r: (-z[r.doc_id], r.doc_id))
        assert keeper.doc_id == best.doc_id
