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
) -> None:
    """``export_to_formats(query, fmt, path)`` equivalent.

    fmt ∈ {parquet, csv, json} (``ethical_crawler.py:1082-1096``); csv gets
    a header row to match ``FORMAT CSV, HEADER`` (``:1091``).
    """
    out = df.filter(F.expr(where)) if where else df
    writer = out.write.mode(mode)
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def attribution(df: DataFrame, source_col: str, where: str | None = None) -> DataFrame:
    """Export attribution footer (``ethical_crawler.py:1383-1388``):
    distinct sources contributing to an (optionally filtered) export."""
    out = df.filter(F.expr(where)) if where else df
    return out.select(source_col).distinct()
