"""Export sinks: parquet / CSV / JSON with SQL-predicate filtering.

Mirrors ``export_to_formats`` (``ethical_crawler.py:1072-1100``): the
reference runs ``COPY (SELECT ... WHERE <user-predicate>) TO file (FORMAT
x)``; here the user predicate goes through ``F.expr`` (parsed by Spark, so
pushdown-eligible — same capability, no string-injection into our own SQL)
and the writers are the distributed sinks. A Spark "file" is a directory of
part-files — the at-scale contract; writing 100 TB through one file handle
(the reference's shape) is exactly what this replaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export(
    df: DataFrame,
    fmt: str,
    path: str,
    where: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """``export_to_formats(query, fmt, path)`` equivalent.

    fmt ∈ {parquet, csv, json, orc} (``ethical_crawler.py:1082-1096``
    defines the first three; orc is the extra columnar sink Spark ships
    natively — same writer contract); csv gets a header row to match
    ``FORMAT CSV, HEADER`` (``:1091``).

    ``partition_by`` writes hive-style ``col=value/`` directories — the
    at-rest layout that gives downstream readers partition PRUNING (a
    filter on the partition column skips whole directories, the
    distributed analogue of the reference's ``ingested_at``/``source_name``
    indexes).
    """
    out = df.filter(F.expr(where)) if where else df
    if fmt == "csv":
        # CSV has no nested types; DuckDB's COPY stringifies lists
        # (ethical_crawler.py:1087-1091 relies on that) — serialize
        # complex columns as JSON text for the same round-trippable shape.
        out = out.select(
            [
                F.to_json(F.col(f.name)).alias(f.name)
                if f.dataType.typeName() in ("array", "map", "struct")
                else F.col(f.name)
                for f in out.schema.fields
            ]
        )
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def attribution(df: DataFrame, source_col: str, where: str | None = None) -> DataFrame:
    """Export attribution footer (``ethical_crawler.py:1383-1388``):
    distinct sources contributing to an (optionally filtered) export."""
    out = df.filter(F.expr(where)) if where else df
    # sorted for deterministic display (the reference renders this footer
    # in arbitrary SQL order, ``ethical_crawler.py:1389-1399``)
    return out.select(source_col).distinct().orderBy(source_col)


def compact(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 << 20,
    shuffle: bool = False,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ``ceil(total_bytes / target_bytes)`` files.

    The 100-TB housekeeping operator: streaming sinks and fine-grained
    ingest (the reference appends row-at-a-time; our streaming audit sink
    appends per micro-batch) accumulate thousands of KB-sized part-files,
    and at scan time each costs a task launch, a footer read, and a
    NameNode/liststore round trip — compaction restores scan efficiency
    without changing content.

    Sizing comes from the filesystem (Hadoop ``ContentSummary``, so the
    same call works on file://, hdfs:// and s3a://), not from guesswork.
    ``shuffle=False`` (default) uses ``coalesce`` — a pure merge, no
    exchange, at the cost of output files tracking input-partition skew;
    ``shuffle=True`` pays one round-robin exchange for evenly sized
    output. Returns ``{"files_in", "bytes_in", "files_out"}``.
    """
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    # The read below is LAZY: mode('overwrite') on dst deletes dst's
    # files before the scan of src runs, so compacting in place (or into
    # a subdirectory of src) would destroy the very part-files the job
    # is about to read. Refuse loudly instead of losing data; in-place
    # compaction must stage to a scratch dir and rename.
    src_q = str(fs.makeQualified(jpath))
    dst_q = str(fs.makeQualified(jvm.org.apache.hadoop.fs.Path(dst)))
    # containment in EITHER direction destroys the source: dst inside src
    # deletes the files mid-read; src inside dst is deleted by the
    # recursive overwrite of dst before the scan runs.
    if (
        dst_q == src_q
        or dst_q.startswith(src_q.rstrip("/") + "/")
        or src_q.startswith(dst_q.rstrip("/") + "/")
    ):
        raise ValueError(
            f"compact destination {dst_q!r} overlaps source {src_q!r} "
            "(equal or one contains the other); overwrite would delete the "
            "source part-files the lazy read depends on — stage to a "
            "separate dir and rename"
        )
    bytes_in = fs.getContentSummary(jpath).getLength()

    def _count_files(p) -> int:
        # recursive, matching getContentSummary's recursive byte total —
        # a hive-partitioned dir has its part-files in SUBdirectories,
        # where a flat listStatus would count 0
        it = fs.listFiles(p, True)
        n = 0
        while it.hasNext():
            if not it.next().getPath().getName().startswith("_"):
                n += 1
        return n

    files_in = _count_files(jpath)
    n_out = max(1, -(-bytes_in // max(target_bytes, 1)))
    df = spark.read.parquet(src)
    out = df.repartition(n_out) if shuffle else df.coalesce(n_out)
    out.write.mode("overwrite").parquet(dst)
    files_out = _count_files(jvm.org.apache.hadoop.fs.Path(dst))
    return {"files_in": files_in, "bytes_in": bytes_in, "files_out": files_out}
