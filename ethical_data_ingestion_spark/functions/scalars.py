"""Scalar column functions (SURVEY §2.5, #36-44).

The reference implements these as plain Python on driver-side rows; here
each is a Catalyst ``Column`` expression so it runs JVM-side inside
whole-stage codegen — per-row Python for string munging is precisely what
does not survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_date_dual(col: str | Column) -> Column:
    """Dual-format date parsing (``ethical_crawler.py:472-483``): digit
    strings are unix epoch seconds, otherwise ISO-8601 (with the 'Z' →
    UTC fix-up); unparseable → NULL (the reference returns None).

    ``try_to_timestamp``/``try_cast`` (not the plain forms): Spark 4 runs
    ANSI mode by default, where a malformed cast *throws*; the try-variants
    give the reference's None-on-failure contract. The epoch branch guards
    with an all-digits regex exactly like the reference's ``isdigit()``.
    """
    c = F.col(col) if isinstance(col, str) else col
    is_epoch = c.rlike("^[0-9]+$")
    epoch_ts = F.try_to_timestamp(F.from_unixtime(c.try_cast("long")))
    iso_ts = F.try_to_timestamp(F.regexp_replace(c, "Z$", "+00:00"))
    return F.when(is_epoch, epoch_ts).otherwise(iso_ts)


def generate_summary(
    title: str | Column,
    category: str | Column | None = None,
    n_columns: str | Column | None = None,
    view_count: str | Column | None = None,
) -> Column:
    """Content-summary builder (``ethical_crawler.py:453-470``): ``" | "``-
    joined ``Dataset:/Category:/Columns:/Views:`` parts, skipping NULL
    parts (concat_ws drops NULLs, matching the reference's conditional
    appends); view counts thousands-formatted like ``f"{n:,}"``."""

    def _c(x):
        return F.col(x) if isinstance(x, str) else x

    parts = [F.concat(F.lit("Dataset: "), _c(title))]
    if category is not None:
        parts.append(
            F.when(
                _c(category).isNotNull(), F.concat(F.lit("Category: "), _c(category))
            )
        )
    if n_columns is not None:
        parts.append(
            F.when(
                _c(n_columns).isNotNull(),
                F.concat(F.lit("Columns: "), _c(n_columns).cast("string")),
            )
        )
    if view_count is not None:
        parts.append(
            F.when(
                _c(view_count).isNotNull(),
                F.concat(
                    F.lit("Views: "),
                    F.format_number(_c(view_count).try_cast("long"), 0),
                ),
            )
        )
    return F.concat_ws(" | ", *parts)


def truncate_display(col: str | Column, n: int = 200) -> Column:
    """Display truncation ``description[:200] + '...'``
    (``ethical_crawler.py:1244``), only suffixing when actually truncated."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > n, F.concat(F.substring(c, 1, n), F.lit("..."))
    ).otherwise(c)


def null_guarded_long(col: str | Column) -> Column:
    """``int(x) if pd.notna(x) else None`` (``ethical_crawler.py:1026``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c.cast("double")), c.cast("long"))


def display_ts(col: str | Column) -> Column:
    """``strftime('%Y-%m-%d %H:%M')`` (``ethical_crawler.py:1296,1477``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm")


def url_host(col: str | Column) -> Column:
    """``urlparse(url).netloc`` (``ethical_crawler.py:206-208``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_url(c, F.lit("HOST"))


def json_metadata(col: str | Column, field: str) -> Column:
    """Typed access into the free-form JSON metadata column
    (``ethical_crawler.py:834, 928, 1022``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{field}")
