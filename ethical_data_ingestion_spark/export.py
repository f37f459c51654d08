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
