"""Console presentation layer (reference parity, stdlib only).

The reference renders results as rich-console tables with thousands
separators plus a per-source attribution footer
(``ethical_crawler.py:1186-1199, 1286-1345``). This module reproduces that
presentation without the ``rich`` dependency: aligned ASCII tables from
already-collected rows (presentation never touches the cluster — callers
pass the small result of ``.collect()``), and the same attribution lines
keyed by which sources appear in the data.
"""

from __future__ import annotations

from typing import Any, Sequence

#: Public attribution lines the reference prints per contributing source
#: (``ethical_crawler.py:1332-1345``).
ATTRIBUTIONS: dict[str, str] = {
    "UN Comtrade": "UN Comtrade: Data licensed under CC BY 4.0 | https://comtradeapi.un.org/",
    "NYC Open Data": "NYC Open Data: Public Domain | https://opendata.cityofnewyork.us/",
    "SEC EDGAR": "SEC EDGAR: Public Domain | https://www.sec.gov/",
    "College Scorecard": "College Scorecard: Public Domain | https://collegescorecard.ed.gov/",
}


def _cell(v: Any) -> str:
    if v is None:
        return "N/A"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return f"{v:,}"  # thousands separators, as the reference renders
    if isinstance(v, float):
        return f"{v:,.2f}"
    return str(v)


def format_table(
    columns: Sequence[str], rows: Sequence[Sequence[Any]], title: str | None = None
) -> str:
    """Aligned ASCII table over collected rows (small by construction)."""
    cells = [[_cell(v) for v in row] for row in rows]
    widths = [
        max(len(str(c)), *(len(r[i]) for r in cells)) if cells else len(str(c))
        for i, c in enumerate(columns)
    ]
    sep = "+-" + "-+-".join("-" * w for w in widths) + "-+"
    header = "| " + " | ".join(str(c).ljust(w) for c, w in zip(columns, widths)) + " |"
    body = [
        "| " + " | ".join(r[i].rjust(widths[i]) for i in range(len(columns))) + " |"
        for r in cells
    ]
    lines = ([title, ""] if title else []) + [sep, header, sep, *body, sep]
    return "\n".join(lines)


def render_df(df, title: str | None = None, limit: int = 100) -> str:
    """Collect a (small) DataFrame and format it. ``limit`` caps the rows
    pulled to the driver — presentation must never materialize data-sized
    results. Pulls ``limit + 1`` rows to detect truncation and appends a
    'showing first N' line, so a capped table never masquerades as the
    complete result."""
    rows = df.limit(limit + 1).collect()
    truncated = len(rows) > limit
    rows = rows[:limit]
    table = format_table(df.columns, [list(r) for r in rows], title=title)
    if truncated:
        table += f"\n(showing first {limit} rows; more rows exist)"
    return table


def attribution_footer(source_names: Sequence[str]) -> str:
    """The reference's 'Data Source Attribution' block for the sources
    actually present, in its display order."""
    lines = ["Data Source Attribution:"]
    for name in ("UN Comtrade", "NYC Open Data", "SEC EDGAR", "College Scorecard"):
        if name in set(source_names):
            lines.append(f"  {ATTRIBUTIONS[name]}")
    return "\n".join(lines)
