"""Windowing + JSON-extraction queries over the events table.

JSON extraction realizes SURVEY #39 (``json.dumps``/``json.loads`` at
``ethical_crawler.py:928,1022`` and the JSON ``metadata`` column) as a
first-class columnar op: ``get_json_object`` stays JVM-side, no Python.

The window queries are the SURVEY #35 extension (absent in the reference):
batch twins of the streaming operators in streaming/pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import windows as W
from ..operators.analytics import davg
from ..registry import register


@register(
    "json_extract_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(json_extract_string(props, '$.k')), 4) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #39: typed extraction from a JSON-text column feeding an
    aggregate. ``get_json_object`` is a Catalyst expression (whole-stage
    codegen), not a UDF — the pattern that holds at 100 TB where a Python
    json.loads loop would be the bottleneck."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            davg("k", "avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "window_tumbling_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def window_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows per event_type. For day-aligned windows
    Spark's ``window()`` start equals DuckDB's ``date_trunc('day')`` —
    which is exactly the oracle bridge."""
    ev = load_table(spark, sf_dir, "events")
    return W.tumbling_agg(ev, "ts", "1 day", ["event_type"]).orderBy(
        "window_start", "event_type"
    )


@register(
    "window_sliding_6h",
    oracle="""
    WITH expanded AS (
      SELECT e.*, date_trunc('hour', ts) - INTERVAL (h) HOUR AS window_start
      FROM events e, range(0, 6) r(h)
      WHERE date_trunc('hour', ts) - INTERVAL (h) HOUR + INTERVAL 6 HOUR > ts
    )
    SELECT window_start, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 4) AS avg_value
    FROM expanded
    GROUP BY window_start
    ORDER BY window_start
    """,
)
def window_sliding_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 6-hour length, 1-hour slide — every event belongs
    to 6 windows. Spark expands rows inside the TimeWindow generator; the
    oracle mirrors with an explicit range() expansion."""
    ev = load_table(spark, sf_dir, "events")
    return W.sliding_agg(ev, "ts", "6 hours", "1 hour").orderBy("window_start")


@register(
    "session_windows_30m",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, value
               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user — Spark's built-in
    ``session_window`` (the batch twin of the streaming stateful session
    operator). The oracle derives identical sessions via gaps-and-islands
    (lag → flag → running sum)."""
    ev = load_table(spark, sf_dir, "events")
    return W.session_agg(ev, "ts", "30 minutes", "user_id").orderBy(
        "user_id", "session_start"
    )


@register(
    "asof_last_purchase",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    joined AS (
      SELECT c.event_id, c.user_id, p.value AS asof_value
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    )
    SELECT user_id,
           COUNT(*) AS n_clicks,
           COUNT(asof_value) AS n_with_prior_purchase,
           CAST(SUM(CAST(asof_value AS DECIMAL(18,2))) AS DOUBLE)
             AS total_asof_value
    FROM joined
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click event joined to the user's most recent
    purchase at-or-before it (union + one last-ignorenulls window — a
    single shuffle on user_id; see operators/windows.asof_join), rolled up
    per user. The oracle runs DuckDB's native ASOF LEFT JOIN — two
    different algorithms, same temporal semantics, hash-equal results."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    # exact decimal SUM, not an average: at sf0.1 several users' averages
    # land exactly on a .xxxx5 half-point, where Spark's round() (shortest
    # decimal repr of the double, then HALF_UP) and DuckDB's (binary value)
    # disagree by 1e-4. The 2-decimal money sum is boundary-free.
    joined = W.asof_join(
        clicks, purchases, key="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"],
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count("asof_value").alias("n_with_prior_purchase"),
            F.sum(F.col("asof_value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_asof_value"),
        )
        .orderBy("user_id")
    )


@register(
    "range_join_session_overlap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_session
      FROM events WHERE user_id < 5
    ),
    numbered AS (
      SELECT *, SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ),
    sessions AS (
      SELECT user_id AS s_user,
             MIN(ts) AS s_start,
             MAX(ts) + INTERVAL 30 MINUTE AS s_end
      FROM numbered GROUP BY user_id, sid
    ),
    pairs AS (
      SELECT e.event_type, e.event_id
      FROM events e JOIN sessions s
        ON s.s_start <= e.ts AND e.ts < s.s_end
    )
    SELECT event_type,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT event_id) AS n_events_covered
    FROM pairs
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def range_join_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: every event paired with every concurrently
    open session of users 0-4 ([start, last+gap) from ``session_window``'s
    own end bound), rolled up per event type. Spark runs the time-bucketed
    candidate join (operators/windows.range_join — shuffle keyed on 1-hour
    cells); the oracle brute-forces the inequality join. Different
    algorithms, hash-equal answers."""
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.filter(F.col("user_id") < 5)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("user_id").alias("s_user"),
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
        )
    )
    pairs = W.range_join(
        ev.select("event_id", "event_type", "ts"), sess,
        ts_col="ts", start_col="s_start", end_col="s_end", bucket="1 hour",
    )
    return (
        pairs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("event_id").alias("n_events_covered"),
        )
        .orderBy("event_type")
    )


@register(
    "group_normalized_values",
    oracle="""
    WITH z AS (
      SELECT event_type,
             ROUND(abs((value - AVG(value) OVER (PARTITION BY event_type))
                   / STDDEV_SAMP(value) OVER (PARTITION BY event_type)), 6) AS az
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(az AS DECIMAL(18,6))) AS DOUBLE) / COUNT(az), 4)
             AS avg_abs_z
    FROM z
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def group_normalized_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization via grouped-map ``applyInPandas`` —
    the fourth Pandas API surface (after pandas_udf / mapInPandas /
    applyInPandasWithState): whole group in, whole group out, Arrow both
    ways, one shuffle on the group key. The numpy body stands in for any
    per-group model step (scaler, PCA, outlier filter). Oracle mirrors
    with window functions — where the semantics ARE expressible
    relationally, the UDF must agree with the relational answer."""
    import pandas as pd

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {"event_type": pdf["event_type"], "az": z.abs().round(6)}
        )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    zdf = ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_type string, az double"
    )
    return (
        zdf.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), davg("az", "avg_abs_z"))
        .orderBy("event_type")
    )
