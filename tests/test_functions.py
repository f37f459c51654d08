"""functions/scalars.py + export.py edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark import export
from ethical_data_ingestion_spark.functions import scalars


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_parse_date_dual(spark):
    df = spark.createDataFrame(
        [("1700000000",), ("2024-03-01T12:00:00Z",), ("2024-03-01 12:00:00",),
         ("garbage",), (None,)],
        "s string",
    )
    out = df.select(scalars.parse_date_dual("s").alias("ts")).collect()
    assert out[0].ts.year == 2023      # epoch seconds
    assert out[1].ts.year == 2024      # ISO with Z
    assert out[2].ts.year == 2024      # plain ISO
    assert out[3].ts is None           # unparseable → NULL, like the reference
    assert out[4].ts is None


def test_generate_summary_skips_nulls(spark):
    df = spark.createDataFrame(
        [("DS", "cat", 5, 12345), ("DS2", None, None, None)],
        "t string, c string, n int, v int",
    )
    out = df.select(
        scalars.generate_summary("t", "c", "n", "v").alias("s")
    ).collect()
    assert out[0].s == "Dataset: DS | Category: cat | Columns: 5 | Views: 12,345"
    assert out[1].s == "Dataset: DS2"


def test_truncate_display(spark):
    long = "x" * 300
    df = spark.createDataFrame([(long,), ("short",)], "s string")
    out = df.select(scalars.truncate_display("s", 200).alias("t")).collect()
    assert out[0].t == "x" * 200 + "..."
    assert out[1].t == "short"


def test_url_host(spark):
    df = spark.createDataFrame([("https://data.cityofnewyork.us/api/x",)], "u string")
    assert out_host(df) == "data.cityofnewyork.us"


def out_host(df):
    return df.select(scalars.url_host("u").alias("h")).collect()[0].h


def test_display_ts(spark):
    df = spark.sql("select timestamp'2024-03-01 12:34:56' as ts")
    assert df.select(scalars.display_ts("ts").alias("d")).collect()[0].d == "2024-03-01 12:34"


def test_export_formats(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id int, src string, x double"
    )
    for fmt, reader in [
        ("parquet", lambda p: spark.read.parquet(p)),
        ("csv", lambda p: spark.read.option("header", True).csv(p)),
        ("json", lambda p: spark.read.json(p)),
    ]:
        path = str(tmp_path / fmt)
        export.export(df, fmt, path, where="src = 'a'")
        back = reader(path)
        assert back.count() == 2, fmt

    # predicate pass-through is Spark-parsed: bad SQL raises, not injects
    import pytest
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        export.export(df, "parquet", str(tmp_path / "bad"), where="no_such_col = 1")


def test_attribution(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)], "id int, src string, x double"
    )
    srcs = {r.src for r in export.attribution(df, "src", where="x > 15").collect()}
    assert srcs == {"a", "b"}
    srcs2 = {r.src for r in export.attribution(df, "src", where="x > 25").collect()}
    assert srcs2 == {"a"}


def test_bm25_ranks_term_frequency_and_rarity(spark):
    from ethical_data_ingestion_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark data", "en", "s", 22),
            (2, "spark data data data", "en", "s", 20),
            (3, "data data data data", "en", "s", 19),
            (4, "filler filler filler filler", "en", "s", 27),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1          # highest tf for the rare term wins
    assert 3 not in ids and 4 not in ids  # docs without the term never rank
    assert out[0].score > out[1].score
