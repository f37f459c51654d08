"""catalog.py: save modes, upsert keep-first semantics, audit state."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark import catalog


def test_save_and_exists(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    assert not catalog.table_exists(spark, "t_exists")
    catalog.save_table(df, "t_exists", "replace")
    assert catalog.table_exists(spark, "t_exists")
    assert spark.table("t_exists").count() == 5
    catalog.save_table(df, "t_exists", "append")
    assert spark.table("t_exists").count() == 10
    catalog.save_table(df, "t_exists", "replace")
    assert spark.table("t_exists").count() == 5


def test_dedupe_first_keeps_lowest_order(spark):
    df = spark.createDataFrame(
        [("a", 1, 2, "second"), ("a", 1, 1, "first"), ("b", 2, 5, "only")],
        "src string, rid int, arrival int, val string",
    )
    out = catalog.dedupe_first(df, ["src", "rid"], "arrival")
    rows = {(r.src, r.rid): r.val for r in out.collect()}
    # INSERT OR IGNORE keep-first: explicit arrival order decides
    assert rows == {("a", 1): "first", ("b", 2): "only"}


def test_upsert_ignore_drops_existing_keys(spark):
    first = spark.createDataFrame(
        [("s1", "r1", 1, "v1"), ("s1", "r2", 2, "v2")],
        "src string, rid string, arrival int, val string",
    )
    n1 = catalog.upsert_ignore(spark, first, "t_upsert", ["src", "rid"], "arrival")
    assert n1 == 2
    second = spark.createDataFrame(
        [("s1", "r2", 3, "CHANGED"), ("s1", "r3", 4, "v3"), ("s1", "r3", 5, "dup")],
        "src string, rid string, arrival int, val string",
    )
    n2 = catalog.upsert_ignore(spark, second, "t_upsert", ["src", "rid"], "arrival")
    assert n2 == 1  # r2 ignored (exists), r3 deduped to one row
    rows = {(r.src, r.rid): r.val for r in spark.table("t_upsert").collect()}
    assert rows[("s1", "r2")] == "v2"  # original kept, not CHANGED
    assert rows[("s1", "r3")] == "v3"  # first arrival kept


def test_latest_audit_state(spark):
    audit = spark.createDataFrame(
        [("s1", 1, 10, False), ("s1", 2, 20, True), ("s2", 1, 15, True)],
        "src string, check_id int, check_time int, ok boolean",
    )
    latest = catalog.latest_audit_state(audit, "src", "check_time", "check_id")
    state = {r.src: r.ok for r in latest.collect()}
    assert state == {"s1": True, "s2": True}
    assert latest.count() == 2


def test_read_evolving_merges_added_columns(spark, tmp_path):
    """A spool batch that gained a column reads as one table: old rows
    NULL-fill the new column; projection of old columns is unaffected."""
    from pyspark.sql import functions as F

    from ethical_data_ingestion_spark.io import read_evolving

    p = str(tmp_path / "spool")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)
    df = read_evolving(spark, p)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}
    # old-column projection still prunes to the narrow schema
    assert df.select("id").count() == 3
