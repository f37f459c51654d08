"""Event-time windowing operators (batch semantics).

The reference has no event-time processing at all — its timestamps are
processing-time stamps (``ethical_crawler.py:838,856``; SURVEY #35). This
module is the north-star extension over the driver's ``events`` table:
tumbling / sliding / session windows expressed with Spark's built-in
``window()`` / ``session_window()`` so the SAME code shape lifts to
Structured Streaming (streaming/pipeline.py) by swapping ``read`` for
``readStream`` and adding a watermark.

Scale note: ``window()`` is a projection + hash agg — one shuffle on
(key, window); session windows shuffle on the session key and merge
per-key sorted runs. Both are linear, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analytics import davg


def tumbling_agg(
    df: DataFrame, ts_col: str, duration: str, keys: list[str]
) -> DataFrame:
    """Tumbling-window aggregate: count + decimal-exact sum(value) per
    (window, keys). Emits ``window_start`` (NTZ) rather than the struct so
    results stay oracle-comparable (DuckDB mirror: ``date_trunc``)."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), *keys, "n_events", "total_value")
    )


def sliding_agg(
    df: DataFrame, ts_col: str, duration: str, slide: str
) -> DataFrame:
    """Sliding-window aggregate (window length > slide ⇒ each event lands
    in duration/slide windows; Spark expands via its TimeWindow generator,
    no self-join)."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            davg("value", "avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
    )


def session_agg(df: DataFrame, ts_col: str, gap: str, key: str) -> DataFrame:
    """Session windows: events for ``key`` closer than ``gap`` merge into
    one session. Built-in ``session_window`` keeps the merge inside the
    aggregation operator (sort-merge per key partition) — the batch twin of
    the streaming stateful operator."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
