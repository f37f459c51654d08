"""Content-defined chunking invariants."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.operators import multimodal as MM

SF_DIR = "/root/testdata/sf0.001"


def test_cdc_chunks_reassemble_payloads(spark):
    """Chunk lengths per asset must sum to the payload size and chunk_no
    must be gapless from 0 — chunking is a partition of the bytes."""
    assets = MM.as_assets(load_table(spark, SF_DIR, "documents"))
    sizes = {r.asset_id: r.size_bytes for r in assets.select("asset_id", "size_bytes").collect()}
    got: dict[int, list] = {}
    for r in MM.cdc_chunks(assets).collect():
        got.setdefault(r.asset_id, []).append((r.chunk_no, r.chunk_bytes))
    for aid, chunks in got.items():
        chunks.sort()
        assert [c[0] for c in chunks] == list(range(len(chunks)))
        assert sum(c[1] for c in chunks) == sizes[aid]
    # every non-empty payload chunked
    assert set(got) == {a for a, s in sizes.items() if s > 0}


def test_cdc_shift_resistance(spark):
    """THE property fixed-size framing lacks: prepending bytes to a payload
    must leave the tail chunk hashes intact (only the head neighborhood
    re-chunks)."""
    import pandas as pd

    base = b"the quick brown fox jumps over the lazy dog " * 40
    shifted = b"XY" + base
    df = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1, 2], "modality": ["image", "image"],
             "content": [base, shifted]}
        )
    )
    rows = MM.cdc_chunks(df).collect()
    h1 = [r.chunk_md5 for r in sorted((r for r in rows if r.asset_id == 1), key=lambda r: r.chunk_no)]
    h2 = [r.chunk_md5 for r in sorted((r for r in rows if r.asset_id == 2), key=lambda r: r.chunk_no)]
    # all but the first chunk of the original reappear verbatim
    assert set(h1[1:]) <= set(h2)


def test_cdc_panel_consistency(spark):
    for r in registry.QUERIES["multimodal_cdc_stats"](spark, SF_DIR).collect():
        assert r.n_distinct_chunks <= r.n_chunks
        assert 0 <= r.dup_ratio < 1
        assert r.dup_bytes <= r.total_bytes


def test_source_divergence_matrix_invariants(spark):
    """JS in [0,1] bits, full pair matrix, symmetric-by-construction keys."""
    rows = registry.QUERIES["source_divergence_matrix"](spark, SF_DIR).collect()
    srcs = {r.source_a for r in rows} | {r.source_b for r in rows}
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert 0.0 <= r.js_divergence <= 1.0
        assert r.n_shared_words > 0
