"""Incremental curation across snapshot versions (round-9 verdict item
6): the delta path's decisions, applied on top of v1, must equal an
INDEPENDENT full recompute of v2 — and the delta must exercise real
ripple effects (decision changes on documents the snapshot diff never
touched)."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.operators import dedup as D
from ethical_data_ingestion_spark.queries import version_q as V

SF_DIR = "/root/testdata/sf0.001"


def _full_v2_decisions(spark):
    """Independent full-recompute path: snapshot v2 from scratch — fresh
    shingle sets, all three tiers over the whole snapshot, full CC —
    never touching the delta machinery or the v1 artifacts."""
    snap2 = V._snap(spark, SF_DIR, 2)
    sets2 = V._snap_sets(snap2)
    pairs2 = V._pairs_over(snap2, sets2)
    comp2 = D.connected_components(pairs2, "id1", "id2")
    return {
        r.doc_id: (r.kept, r.drop_reason)
        for r in V._decisions_over(snap2, comp2).collect()
    }


def test_delta_applied_to_v1_equals_full_v2(spark):
    """delta ∪ inherited-unchanged ≡ full v2 decisions, doc by doc."""
    _, _, _, _, dec1 = V._v1_artifacts(spark, SF_DIR)
    v1 = {r.doc_id: (r.kept, r.drop_reason) for r in dec1.collect()}
    delta = registry.QUERIES["incremental_curation_delta"](
        spark, SF_DIR
    ).collect()
    applied = dict(v1)
    for r in delta:
        if r.status == "removed":
            applied.pop(r.doc_id, None)
        else:
            applied[r.doc_id] = (r.v2_kept, r.v2_reason)
    want = _full_v2_decisions(spark)
    assert applied == want


def test_delta_statuses_and_ripple(spark):
    """All three statuses occur; v1-side fields are NULL exactly for
    added docs (and v2-side for removed); and at least one CHANGED row is
    a RIPPLE — a document the snapshot diff never touched whose decision
    still flipped (its cluster's keeper or membership moved)."""
    delta = registry.QUERIES["incremental_curation_delta"](
        spark, SF_DIR
    ).collect()
    statuses = {r.status for r in delta}
    assert statuses == {"added", "removed", "changed"}
    for r in delta:
        assert (r.v1_kept is None) == (r.status == "added"), r
        assert (r.v2_kept is None) == (r.status == "removed"), r
        if r.status == "changed":
            assert (r.v1_kept, r.v1_reason) != (r.v2_kept, r.v2_reason), r
    touched = set()
    from ethical_data_ingestion_spark.io import load_table

    b = V._bench()
    hb_rows = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "source", V._hb().alias("hb"))
        .collect()
    )
    for r in hb_rows:
        if r.source != b and (
            r.hb < V._V2_LO
            or r.hb >= V._V1_LO
            or r.hb % V._REV_MOD == 0
        ):
            touched.add(r.doc_id)
    ripple = [
        d for d in delta if d.status == "changed" and d.doc_id not in touched
    ]
    assert ripple, "no ripple-effect decision change — fixture too tame"


def test_delta_excludes_unchanged_decisions(spark):
    """No row in the delta may carry identical v1/v2 verdicts."""
    delta = registry.QUERIES["incremental_curation_delta"](
        spark, SF_DIR
    ).collect()
    for r in delta:
        if r.status == "changed":
            same = (r.v1_kept == r.v2_kept) and (
                (r.v1_reason or "") == (r.v2_reason or "")
            )
            assert not same, r
