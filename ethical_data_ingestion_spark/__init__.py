"""ethical_data_ingestion_spark — PySpark-native analytics engine.

From-scratch rebuild of the query / data-processing capabilities of the
reference repo ``PeterGreenAppliedAI/ethical-data-ingestion`` (a single-file
asyncio crawler cataloguing open-data sources into DuckDB,
``/root/reference/ethical_crawler.py``), re-expressed as idiomatic Spark
DataFrame operations designed for 100 TB scale, plus the LLM-data-pipeline
operators the reference only gestures at (dedup, similarity search, text
analysis, multimodal columns, event-time windowing).

Layout:
    session.py          SparkSession factory tuned for the test harness
    schemas.py          fixed StructType schemas (catalog + fixture tables)
    io.py               table loaders for the parquet fixtures
    catalog.py          catalog storage: upsert, audit append, save modes
    export.py           parquet/CSV/JSON export sinks with predicate filter
    operators/          the SURVEY §2 operator library (DataFrame→DataFrame)
    sources/            ingestion adapters, compliance gate, robots parser
    functions/          scalar/column function library
    streaming/          Structured Streaming variants of the window ops
"""

__version__ = "0.1.0"
