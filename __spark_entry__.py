"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``ethical_data_ingestion_spark.registry``: every operator
module registers its (Spark query, DuckDB-oracle SQL) pair there; this file
just exposes the three driver hooks.

Hash-comparability rules observed by every registered pair (SURVEY §7.5):
identical column aliases on both sides; money sums accumulated in DECIMAL
then cast to double (order-insensitive across partitions); AVGs rounded to
4 decimals on both engines; every LIMIT backed by a total order with a
unique tie-break so the returned *set* is deterministic.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ethical_data_ingestion_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2) on /root/testdata/sf0.001: the
    reference's canonical GROUP BY + COUNT/AVG + ORDER BY analytics shape
    (``ethical_crawler.py:1039-1050``) generalized to lineitem."""
    return registry.QUERIES["flagship_pricing_summary"](spark, "/root/testdata/sf0.001")


def _rotation_order(names: list[str]) -> list[str]:
    """Order queries least-recently-driver-verified first.

    The driver's correctness gate samples a fixed-size prefix of this
    dict, so a static registration order would leave the same ~70
    queries permanently outside the hard (driver-side) signal — the
    round-4 verdict asked for exactly this rotation. Queries that have
    never appeared in a CORRECTNESS_r*.json go first (registration order
    preserved within a group), then least-recently-sampled; every query
    still passes the full local gate (tests/test_oracle_gate.py) every
    CI run regardless of position. Falls back to registration order if
    no round files are readable.

    Round-6 refinement (round-5 verdict item 1): a query whose MOST RECENT
    driver row was red or errored sorts before everything else — it carries
    an unconfirmed fix, the strongest claim on the hard signal. Previously a
    failed query merely counted as "seen" and sat behind every never-seen
    query for ~2-3 rounds.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    last_seen: dict[str, int] = {}
    failed_last: dict[str, bool] = {}
    rows_only_last: dict[str, bool] = {}
    # Order round files by the PARSED round number, not filename order:
    # lexicographic glob would let r100 sort before r99 and silently make
    # an older round win the last_seen/failed_last overwrite.
    rounds: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        try:
            rounds.append((int(path.rsplit("_r", 1)[-1].split(".")[0]), path))
        except ValueError:
            continue
    for rnd, path in sorted(rounds):
        try:
            for q, row in json.load(open(path)).items():
                last_seen[q] = max(last_seen.get(q, rnd), rnd)
                if isinstance(row, dict):
                    # "no_oracle" rows-only queries pass by design when the
                    # Spark side produced rows; only hard mismatches / errors
                    # count as red.
                    rows_only_last[q] = row.get("err") == "no_oracle"
                    if row.get("err") == "no_oracle":
                        failed_last[q] = row.get("spark_rows") in (None, 0)
                    else:
                        ok = (
                            row.get("err") is None
                            and row.get("rows_match") is not False
                            and row.get("schema_match") is not False
                            and row.get("hash_match") is not False
                        )
                        failed_last[q] = not ok
        except Exception:  # malformed round file: ignore, keep rotating
            continue
    # Round-8 refinement (round-7 verdict item 1): a query whose most
    # recent driver row was rows-only ("no_oracle") but which has SINCE
    # gained a registered hash oracle has never had that hash checked by
    # the driver — treat it as never-seen so it re-enters the sample
    # window immediately (e.g. the two LSH top-k queries graduated in
    # round 7 while their last driver rows were r1/r5 rows-only entries).
    def effective_last_seen(n: str) -> int:
        if rows_only_last.get(n, False) and n in registry.ORACLE_SQL:
            return -1
        return last_seen.get(n, -1)

    reg_pos = {n: i for i, n in enumerate(names)}
    return sorted(
        names,
        key=lambda n: (not failed_last.get(n, False), effective_last_seen(n), reg_pos[n]),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ extensions),
    least-recently-driver-verified first (see :func:`_rotation_order`)."""
    q = registry.QUERIES
    return {name: q[name] for name in _rotation_order(list(q))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each SQL-expressible query."""
    return registry.resolved_oracles()
