"""Fixed StructType schemas.

Two families (FIXTURES.md):

A. The reference's own catalog tables, transcribed from its DuckDB DDL in
   ``initialize_database`` (``ethical_crawler.py:817-889``). The reference
   declares schemas up front (``CREATE TABLE IF NOT EXISTS``) rather than
   inferring them; we mirror that with explicit ``StructType``s — on a
   100 TB lake you never want schema inference over petabytes of parquet.

B. The driver-generated fixture tables at ``/root/testdata/sf*/`` that the
   correctness oracle and bench run over.

DuckDB→Spark type mapping (SURVEY §1.3): VARCHAR/TEXT→StringType,
INTEGER→IntegerType, BIGINT→LongType, DOUBLE→DoubleType, BOOLEAN→BooleanType,
TIMESTAMP→TimestampType, JSON→StringType (+ ``from_json`` at use sites),
VARCHAR[]→ArrayType(StringType), FLOAT[]→ArrayType(FloatType).
Sequence-assigned ids (``data_records_id_seq``, ``ethical_crawler.py:821``)
have no gapless equivalent in a distributed engine; ids here are
assigned via ``xxhash64`` of the natural key or ``monotonically_increasing_id``
and are excluded from oracle comparisons.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- A. reference catalog tables ------------------------------------------

#: ``data_records`` (``ethical_crawler.py:825-845``)
DATA_RECORDS = StructType(
    [
        StructField("id", LongType(), True),
        StructField("source_name", StringType(), False),
        StructField("record_id", StringType(), False),
        StructField("title", StringType(), False),
        StructField("description", StringType(), True),
        StructField("data_type", StringType(), True),
        StructField("url", StringType(), True),
        StructField("metadata", StringType(), True),  # JSON text
        StructField("content_summary", StringType(), True),
        StructField("tags", ArrayType(StringType()), True),
        StructField("last_updated", TimestampType(), True),
        StructField("ingested_at", TimestampType(), True),
        StructField("file_format", StringType(), True),
        StructField("size_bytes", LongType(), True),
        StructField("license_info", StringType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
    ]
)

#: ``compliance_checks`` (``ethical_crawler.py:852-864``)
COMPLIANCE_CHECKS = StructType(
    [
        StructField("id", LongType(), True),
        StructField("source_name", StringType(), False),
        StructField("check_time", TimestampType(), True),
        StructField("robots_txt_compliant", BooleanType(), True),
        StructField("rate_limit_compliant", BooleanType(), True),
        StructField("terms_compliant", BooleanType(), True),
        StructField("api_key_valid", BooleanType(), True),
        StructField("issues", ArrayType(StringType()), True),
        StructField("recommendations", ArrayType(StringType()), True),
    ]
)

#: ``data_sources`` (``ethical_crawler.py:867-881``)
DATA_SOURCES = StructType(
    [
        StructField("name", StringType(), False),
        StructField("base_url", StringType(), True),
        StructField("api_endpoint", StringType(), True),
        StructField("terms_of_service_url", StringType(), True),
        StructField("robots_txt_url", StringType(), True),
        StructField("data_license", StringType(), True),
        StructField("requires_api_key", BooleanType(), True),
        StructField("rate_limit_per_second", DoubleType(), True),
        StructField("last_checked", TimestampType(), True),
        StructField("is_compliant", BooleanType(), True),
        StructField("compliance_notes", StringType(), True),
    ]
)

# --- B. driver fixture tables (FIXTURES.md §B) ----------------------------

REGION = StructType(
    [
        StructField("r_regionkey", IntegerType(), True),
        StructField("r_name", StringType(), True),
    ]
)

NATION = StructType(
    [
        StructField("n_nationkey", IntegerType(), True),
        StructField("n_name", StringType(), True),
        StructField("n_regionkey", IntegerType(), True),
    ]
)

CUSTOMER = StructType(
    [
        StructField("c_custkey", LongType(), True),
        StructField("c_name", StringType(), True),
        StructField("c_nationkey", IntegerType(), True),
        StructField("c_acctbal", DoubleType(), True),
        StructField("c_mktsegment", StringType(), True),
    ]
)

SUPPLIER = StructType(
    [
        StructField("s_suppkey", LongType(), True),
        StructField("s_name", StringType(), True),
        StructField("s_nationkey", IntegerType(), True),
        StructField("s_acctbal", DoubleType(), True),
    ]
)

PART = StructType(
    [
        StructField("p_partkey", LongType(), True),
        StructField("p_name", StringType(), True),
        StructField("p_brand", StringType(), True),
        StructField("p_type", StringType(), True),
        StructField("p_size", IntegerType(), True),
        StructField("p_retailprice", DoubleType(), True),
    ]
)

ORDERS = StructType(
    [
        StructField("o_orderkey", LongType(), True),
        StructField("o_custkey", LongType(), True),
        StructField("o_orderstatus", StringType(), True),
        StructField("o_totalprice", DoubleType(), True),
        StructField("o_orderdate", TimestampType(), True),
        StructField("o_orderpriority", StringType(), True),
    ]
)

LINEITEM = StructType(
    [
        StructField("l_orderkey", LongType(), True),
        StructField("l_partkey", LongType(), True),
        StructField("l_suppkey", LongType(), True),
        StructField("l_linenumber", IntegerType(), True),
        StructField("l_quantity", DoubleType(), True),
        StructField("l_extendedprice", DoubleType(), True),
        StructField("l_discount", DoubleType(), True),
        StructField("l_tax", DoubleType(), True),
        StructField("l_returnflag", StringType(), True),
        StructField("l_linestatus", StringType(), True),
        StructField("l_shipdate", TimestampType(), True),
    ]
)

EVENTS = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),  # JSON text
    ]
)

DOCUMENTS = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS = StructType(
    [
        StructField("vec_id", LongType(), True),
        StructField("embedding", ArrayType(FloatType()), True),
        StructField("label", IntegerType(), True),
    ]
)

FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
