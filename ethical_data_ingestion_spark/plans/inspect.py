"""Physical-plan inspection helpers.

The reference has no plan surface at all (its SQL disappears into DuckDB,
SURVEY §3-4); on Spark the physical plan IS the performance contract, so
this module makes plan properties assertable:

* filters reached the parquet scan (``PushedFilters``),
* column pruning happened (``ReadSchema`` narrower than the table),
* small dimensions broadcast instead of shuffling,
* shuffle (Exchange) counts stay at the expected minimum,
* top-k stayed a ``TakeOrderedAndProject`` (never a global sort),
* expressions stayed inside whole-stage codegen.

tests/test_plans.py pins these for the headline queries — a regression
that silently turns a broadcast join into a shuffle join or un-pushes a
filter fails CI even though results stay correct. That is the 100 TB
guardrail: at sf0.1 such a regression costs milliseconds; at the target
scale it is the difference between a working plan and an outage.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text (captured, not printed)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty ``PushedFilters`` list in the plan's scan nodes."""
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.append(m.group(1).strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """``ReadSchema`` of each file scan — the column-pruning witness."""
    return [
        m.group(1).strip()
        for m in re.finditer(r"ReadSchema: (\S+)", formatted_plan(df))
    ]


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange nodes (broadcast exchanges excluded)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def uses_take_ordered(df: DataFrame) -> bool:
    """True when ORDER BY + LIMIT planned as top-k, not a global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of whole-stage codegen spans (wider is better — Python UDF
    boundaries and unsupported expressions break them). Formatted plans
    mark membership via ``[codegen id : N]`` annotations."""
    ids = set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df)))
    return len(ids)


def runtime_bloom_filter_count(df: DataFrame) -> int:
    """Number of runtime bloom-filter probes Catalyst injected
    (``might_contain``/``bloom_filter_agg`` in the plan). At fixture scale
    dimensions broadcast, so the probes only appear when the thresholds
    are tuned down — the plan test does exactly that to pin the behavior
    the 100-TB deployment relies on when a join's build side outgrows the
    broadcast threshold but its FILTERED key set still fits a sketch."""
    plan = formatted_plan(df)
    return len(re.findall(r"might_contain|bloom_filter_agg", plan))
