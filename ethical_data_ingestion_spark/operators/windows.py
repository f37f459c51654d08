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

from pyspark.sql import DataFrame, Window
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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of (temporal) join: each left row picks up the most recent right
    row with the same key at-or-before its timestamp — the operator behind
    "state as of event time" queries (latest price before a trade, last
    login before an action).

    Spark has no native ASOF JOIN; the scalable form is the union trick:
    tag both sides, union them, and run one ``last(..., ignorenulls=True)``
    window per key ordered by (ts, side) — right rows sort before left at
    equal timestamps, so "at-or-before" includes ties. ONE shuffle on the
    key and a per-partition sort, regardless of how many right rows precede
    each left row — strictly better than the range-join (inequality join)
    formulation, which explodes to |left|·|right-per-key| intermediates.
    DuckDB mirrors it natively (``ASOF LEFT JOIN ... ON a.key = b.key AND
    a.ts >= b.ts``), which is the oracle bridge.
    """
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    missing_in_left = [c for c in value_cols]
    for c in missing_in_left:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    left_cols = [c for c in left.columns]
    u = l_tag.select(
        *left_cols, "_side", "_ats", *[f"_r_{c}" for c in value_cols]
    ).unionByName(
        r_tag.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c != key
                else F.col(key)
                for c in left_cols
            ],
            "_side",
            "_ats",
            *[f"_r_{c}" for c in value_cols],
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *left_cols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Range (interval) join: pair every point row with every interval row
    satisfying ``start <= ts < end`` — without the O(|points|·|intervals|)
    nested-loop a naive inequality join plans.

    Scalable shape: quantize time into ``bucket``-sized cells; each
    interval explodes to the cells it covers (``sequence()`` — interval
    length / bucket rows each), each point maps to one cell, candidates
    come from the (cell) equi-join, and the exact range predicate refines
    them. Shuffle is keyed on the time cell, so cost tracks how much the
    data actually overlaps, not the cross product. Pick ``bucket`` near
    the median interval length: too small explodes intervals, too large
    degrades candidate selectivity.
    """
    cell = F.window(F.col(ts_col), bucket).getField("start")
    p = points.withColumn("_cell", cell)
    i = intervals.withColumn(
        "_cells",
        F.sequence(
            F.window(F.col(start_col), bucket).getField("start"),
            # end is exclusive: an interval ending exactly on a cell
            # boundary does not cover that cell
            F.window(
                F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND"), bucket
            ).getField("start"),
            F.expr(f"INTERVAL {bucket}"),
        ),
    ).withColumn("_cell", F.explode("_cells")).drop("_cells")
    return (
        p.join(i, "_cell")
        .filter((F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_cell")
    )
