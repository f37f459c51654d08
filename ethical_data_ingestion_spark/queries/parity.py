"""Parity queries: the reference's own SQL/pandas surface (SURVEY §2.2-2.3)
mapped onto the oracle-registered fixture tables.

The reference's catalog tables aren't among the oracle views, so each query
keeps the reference's operator *shape* while running over the fixture column
that plays the same role (FIXTURES.md §B1 note): ``documents.source`` ≈
``source_name``, ``events.ts`` ≈ ``ingested_at``, ``orders`` string/timestamp
columns ≈ catalog metadata columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import analytics as A
from ..operators import search as S
from ..registry import register


@register(
    "search_ilike_topk",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE (text ILIKE '%spark%' OR lang ILIKE '%spark%' OR source ILIKE '%spark%')
    ORDER BY doc_id DESC
    LIMIT 20
    """,
)
def search_ilike_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #15 + #25 (``ethical_crawler.py:978-985, 997-1004``): the
    reference's whole search engine — multi-column case-insensitive
    substring match, then top-k by recency. ``doc_id`` stands in for the
    ``ingested_at`` sort key (unique → deterministic set)."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.search(
        docs,
        query="spark",
        search_columns=["text", "lang", "source"],
        order_col="doc_id",
        tiebreak_col="doc_id",
        limit=20,
    )
    return out.select("doc_id", "lang", "source", "n_chars")


@register(
    "filter_equality",
    oracle="""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE lang = 'en' AND source = 'src1'
    """,
)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #16 (``ethical_crawler.py:987-995``): dynamic AND of optional
    equality filters — `None`-valued filters are dropped, as when a CLI flag
    is absent."""
    docs = load_table(spark, sf_dir, "documents")
    out = S.equality_filters(docs, lang="en", source="src1", n_chars=None)
    return out.select("doc_id", "source", "lang", "n_chars")


@register(
    "distinct_sources",
    oracle="SELECT DISTINCT source FROM documents",
)
def distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #19/#28 (``ethical_crawler.py:1383-1388``): attribution —
    distinct single column."""
    return S.distinct_values(load_table(spark, sf_dir, "documents"), "source")


@register(
    "agg_source_stats",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS record_count,
      COUNT(DISTINCT user_id) AS type_count,
      ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 4) AS avg_size,
      MIN(ts) AS first_ingested,
      MAX(ts) AS last_ingested
    FROM events
    GROUP BY event_type
    ORDER BY record_count DESC, event_type
    """,
)
def agg_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #21 (``ethical_crawler.py:1039-1050``): the reference's
    signature per-source 5-aggregate rollup, over events."""
    return A.source_stats(
        load_table(spark, sf_dir, "events"),
        key="event_type",
        distinct_col="user_id",
        avg_col="value",
        ts_col="ts",
    )


@register(
    "freq_by_type",
    oracle="""
    SELECT event_type, COUNT(*) AS count
    FROM events GROUP BY event_type ORDER BY count DESC, event_type
    """,
)
def freq_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #22 (``ethical_crawler.py:1053-1060``): frequency table."""
    return A.frequency_table(load_table(spark, sf_dir, "events"), "event_type")


@register(
    "composite_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS count,
           MAX(o_orderdate) AS last_ingested
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, count DESC, o_orderpriority
    """,
)
def composite_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #23 (``ethical_crawler.py:1425-1434``): composite-key
    aggregate with count + latest timestamp."""
    return A.composite_stats(
        load_table(spark, sf_dir, "orders"),
        key1="o_orderstatus",
        key2="o_orderpriority",
        ts_col="o_orderdate",
    )


@register(
    "rollup_totals",
    oracle="""
    WITH per_pair AS (
      SELECT source, lang, COUNT(*) AS count, MAX(doc_id) AS last_doc
      FROM documents GROUP BY source, lang
    )
    SELECT source,
           CAST(SUM(count) AS BIGINT) AS total_records,
           COUNT(DISTINCT lang) AS langs,
           MAX(last_doc) AS last_doc
    FROM per_pair
    GROUP BY source
    ORDER BY total_records DESC, source
    """,
)
def rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #26 (``ethical_crawler.py:1468-1472``): the reference's
    client-side pandas re-aggregation of the composite stats, folded into a
    second Spark agg — never leaves the cluster. Spark plans the two-level
    rollup as two exchanges; at scale the second is trivially small."""
    docs = load_table(spark, sf_dir, "documents")
    per_pair = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("count"), F.max("doc_id").alias("last_doc")
    )
    return (
        per_pair.groupBy("source")
        .agg(
            F.sum("count").cast("long").alias("total_records"),
            F.countDistinct("lang").alias("langs"),
            F.max("last_doc").alias("last_doc"),
        )
        .orderBy(F.desc("total_records"), "source")
    )


@register(
    "scalar_totals",
    oracle="""
    WITH stats AS (SELECT source, COUNT(*) AS record_count FROM documents GROUP BY source)
    SELECT CAST(SUM(record_count) AS BIGINT) AS total_records,
           CAST(COUNT(*) AS BIGINT) AS total_sources
    FROM stats
    """,
)
def scalar_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #27 (``ethical_crawler.py:1068-1069``): grand totals off the
    per-source stats."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(F.count(F.lit(1)).alias("record_count"))
    return A.scalar_totals(stats, "record_count")


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, ts, event_type, value
    FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #24 (``ethical_crawler.py:1437-1451``): greatest-n-per-group.
    The reference uses a correlated scalar subquery; Spark-first rewrite is
    ``row_number()`` over a window — one shuffle on the group key, no
    self-join. Tie-broken by event_id for determinism (SURVEY §7.5 risk 4)."""
    ev = load_table(spark, sf_dir, "events")
    latest = A.latest_per_group(ev, "user_id", "ts", "event_id")
    return latest.select("user_id", "ts", "event_type", "value").orderBy("user_id")


@register(
    "latest_check_correlated",
    oracle="""
    SELECT user_id, ts, event_type
    FROM events e
    WHERE ts = (SELECT MAX(ts) FROM events e2 WHERE e2.user_id = e.user_id)
    ORDER BY user_id
    """,
)
def latest_check_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #24, literal translation: the *same correlated scalar
    subquery text* the reference issues, run through Spark SQL — Catalyst's
    RewriteCorrelatedScalarSubquery decorrelates it into a join+agg (SURVEY
    §4). Registered alongside the window rewrite to pin both semantics."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT user_id, ts, event_type
        FROM events e
        WHERE ts = (SELECT MAX(ts) FROM events e2 WHERE e2.user_id = e.user_id)
        ORDER BY user_id
        """
    )


@register(
    "upsert_dedupe",
    oracle="""
    WITH incoming AS (
      SELECT source, doc_id, n_chars, 0 AS batch FROM documents
      UNION ALL
      SELECT source, doc_id, n_chars + 1000000 AS n_chars, 1 AS batch
      FROM documents WHERE doc_id % 3 = 0
    ),
    kept AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source, doc_id ORDER BY batch) AS rn
      FROM incoming
    )
    SELECT source, COUNT(*) AS record_count,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept WHERE rn = 1
    GROUP BY source
    ORDER BY source
    """,
)
def upsert_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY #8 (``ethical_crawler.py:909-936``): dedupe-on-key upsert.
    DuckDB's ``INSERT OR IGNORE`` under ``UNIQUE(source_name, record_id)``
    keeps the *first* arriving row per key; Spark has no UNIQUE constraint,
    so the deterministic equivalent is union + ``row_number`` over an
    explicit arrival order, keeping rn=1 (SURVEY §7.5 risk 4). The conflict
    batch perturbs ``n_chars`` so keeping the wrong row changes the hash."""
    docs = load_table(spark, sf_dir, "documents")
    existing = docs.select("source", "doc_id", "n_chars").withColumn("batch", F.lit(0))
    conflict = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("source", "doc_id", (F.col("n_chars") + 1000000).alias("n_chars"))
        .withColumn("batch", F.lit(1))
    )
    incoming = existing.unionByName(conflict)
    w = Window.partitionBy("source", "doc_id").orderBy("batch")
    kept = incoming.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("record_count"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("source")
    )
