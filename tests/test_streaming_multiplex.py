"""Multiplexed ingest drains (round-9 verdict item 8): one stream pass
serving the three ingest panels must be row-identical to the three
registered single drains."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.queries.streaming_q import (
    multiplexed_ingest_drains,
)

SF_DIR = "/root/testdata/sf0.001"

_PANELS = (
    "streaming_incremental_dedup",
    "streaming_quarantine_gate",
    "streaming_curation_gate",
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_multiplexed_panels_row_identical_to_single_drains(spark):
    muxed = multiplexed_ingest_drains(spark, SF_DIR)
    assert set(muxed) == set(_PANELS)
    for name in _PANELS:
        single = registry.QUERIES[name](spark, SF_DIR)
        assert muxed[name].columns == single.columns, name
        got, want = _rows(muxed[name]), _rows(single)
        assert got == want, name
        assert got, name  # non-vacuous


_WINDOW_PANELS = (
    "streaming_tumbling_hourly",
    "streaming_anomaly_windows",
    "streaming_topk_trending",
)


def test_multiplexed_window_panels_row_identical_to_single_drains(spark):
    from ethical_data_ingestion_spark.queries.streaming_q import (
        multiplexed_window_drains,
    )

    muxed = multiplexed_window_drains(spark, SF_DIR)
    assert set(muxed) == set(_WINDOW_PANELS)
    for name in _WINDOW_PANELS:
        single = registry.QUERIES[name](spark, SF_DIR)
        assert muxed[name].columns == single.columns, name
        got, want = _rows(muxed[name]), _rows(single)
        assert got == want, name
        assert got, name  # non-vacuous
