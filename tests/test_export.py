"""Export sinks: format round-trips, expr() predicate, partitioned layout
with pruning visible in the scan plan."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from ethical_data_ingestion_spark import export as E
from ethical_data_ingestion_spark import plans
from ethical_data_ingestion_spark.io import load_table


def test_export_roundtrip_all_formats(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    n_filtered = docs.filter("n_chars > 200").count()
    assert 0 < n_filtered < docs.count()

    for fmt in ("parquet", "csv", "json", "orc"):
        path = str(tmp_path / fmt)
        E.export(docs, fmt, path, where="n_chars > 200")
        if fmt == "parquet":
            back = spark.read.parquet(path)
        elif fmt == "csv":
            back = spark.read.option("header", True).csv(path)
        elif fmt == "orc":
            back = spark.read.orc(path)
        else:
            back = spark.read.json(path)
        assert back.count() == n_filtered, fmt


def test_export_rejects_unknown_format(spark, sf_dir, tmp_path):
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="unsupported export format"):
        E.export(docs, "xml", str(tmp_path / "x"))


def test_partitioned_export_layout_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    path = str(tmp_path / "by_source")
    E.export(docs, "parquet", path, partition_by=["source"])
    # hive-style layout on disk
    dirs = sorted(os.path.basename(p) for p in glob.glob(f"{path}/source=*"))
    assert dirs and all(d.startswith("source=") for d in dirs)
    # a filter on the partition column prunes to one directory: the scan's
    # data filters are empty (partition filter handled before the scan)
    back = spark.read.parquet(path).filter(F.col("source") == "src0")
    plan = plans.formatted_plan(back)
    assert "PartitionFilters" in plan and "source" in plan
    assert back.count() == docs.filter("source = 'src0'").count()


def test_attribution_footer(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = E.attribution(docs, "source", where="n_chars > 200")
    srcs = [r.source for r in out.collect()]
    assert sorted(srcs) == srcs and len(set(srcs)) == len(srcs)


def test_compact_merges_small_files_preserving_rows(spark, tmp_path):
    from ethical_data_ingestion_spark.export import compact

    src = f"{tmp_path}/frag"
    dst = f"{tmp_path}/packed"
    spark.range(10_000).withColumn("v", F.col("id") * 2).repartition(
        64
    ).write.parquet(src)
    stats = compact(spark, src, dst, target_bytes=1 << 30)
    assert stats["files_in"] == 64
    assert stats["files_out"] == 1
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    assert set(out.columns) == {"id", "v"}


def test_compact_respects_target_size(spark, tmp_path):
    from ethical_data_ingestion_spark.export import compact

    src = f"{tmp_path}/frag2"
    dst = f"{tmp_path}/packed2"
    spark.range(50_000).repartition(32).write.parquet(src)
    # pick a target that forces multiple output files
    import os
    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src)
        if f.endswith(".parquet")
    )
    stats = compact(spark, src, dst, target_bytes=total // 4 + 1, shuffle=True)
    assert 2 <= stats["files_out"] <= 8
    assert spark.read.parquet(dst).count() == 50_000


def test_compact_refuses_in_place_overwrite(spark, tmp_path):
    """dst == src (or nested inside src) would delete the source files
    the still-lazy read depends on — must raise, not lose data."""
    import pytest

    from ethical_data_ingestion_spark.export import compact

    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="overlaps"):
        compact(spark, src, src)
    with pytest.raises(ValueError, match="overlaps"):
        compact(spark, src, src + "/sub")
    # sibling with a shared name PREFIX is fine (prefix check must be
    # path-segment-aware)
    stats = compact(spark, src, src + "_out")
    assert stats["files_out"] >= 1


def test_compact_refuses_parent_dir_overwrite(spark, tmp_path):
    """src inside dst is the other destructive direction: the recursive
    overwrite of dst deletes src before the lazy read runs."""
    import pytest

    from ethical_data_ingestion_spark.export import compact

    src = str(tmp_path / "t" / "staging")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="overlaps"):
        compact(spark, src, str(tmp_path / "t"))
