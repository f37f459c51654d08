"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``ethical_data_ingestion_spark.registry``: every operator
module registers its (Spark query, DuckDB-oracle SQL) pair there; this file
just exposes the three driver hooks.

Hash-comparability rules observed by every registered pair (SURVEY §7.5):
identical column aliases on both sides; money sums accumulated in DECIMAL
then cast to double (order-insensitive across partitions); AVGs rounded to
4 decimals on both engines; every LIMIT backed by a total order with a
unique tie-break so the returned *set* is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ethical_data_ingestion_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2) on /root/testdata/sf0.001: the
    reference's canonical GROUP BY + COUNT/AVG + ORDER BY analytics shape
    (``ethical_crawler.py:1039-1050``) generalized to lineitem."""
    return registry.QUERIES["flagship_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ extensions)."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each SQL-expressible query."""
    return dict(registry.ORACLE_SQL)
