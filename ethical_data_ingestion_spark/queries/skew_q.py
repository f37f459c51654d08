"""Skew-mitigation queries: salted plans, naive-SQL oracles.

Each query runs the SALTED physical strategy on Spark while the oracle is
the plain join/aggregate — passing the hash gate proves the salted rewrite
is result-identical, which is the property that lets an operator swap it in
on skew evidence alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import skew as K
from ..registry import register


@register(
    "salted_join_priority_revenue",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders via the salted strategy (8 salts, orders
    replicated 8×), then revenue per priority. The oracle is the plain
    join — hash equality IS the proof the rewrite preserves semantics.
    The join is forced to shuffle (no broadcast hint) to exercise the
    salted shuffle path it exists for. 8 salts spread a hot key across 8
    reducers — enough to prove the mechanism; replication cost scales
    linearly with the salt count, so production picks the smallest count
    that levels the skew."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_linenumber",
        "l_extendedprice",
        "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = K.salted_join(
        li, orders, on=["o_orderkey"], big_unique_col="l_linenumber", n_salts=8
    )
    return (
        joined.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("priority")
    )


@register(
    "salted_agg_event_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def salted_agg_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over event_type (5 hot keys — exactly
    the shape where one reducer melts at 100 TB): phase 1 on (key, salt),
    phase 2 combines 16 partials per key. Oracle = the plain GROUP BY."""
    ev = load_table(spark, sf_dir, "events")
    return K.salted_two_phase_agg(
        ev,
        keys=["event_type"],
        unique_col="event_id",
        partials={
            "n_p": F.count(F.lit(1)),
            "sum_p": F.sum(F.col("value").cast("decimal(18,2)")),
            "max_p": F.max("value"),
        },
        finals={
            "n": F.sum("n_p").cast("long"),
            "total_value": F.sum("sum_p").cast("double"),
            "max_value": F.max("max_p").cast("double"),
        },
        n_salts=16,
    ).orderBy("event_type")
