"""Query registry: the driver-contract surface.

Every implemented operator from SURVEY §2 (plus the LLM-pipeline extension
ops) registers here as a pair:

* ``QUERIES[name]``   — ``(spark, sf_dir) -> DataFrame``, idiomatic Spark
* ``ORACLE_SQL[name]``— equivalent ANSI SQL for the DuckDB oracle, over the
  pre-registered views (region nation customer supplier part orders
  lineitem events documents embeddings)

Rules that keep the pair hash-comparable (see __spark_entry__ docstring):
column names aliased identically on both sides; money sums accumulated in
DECIMAL then cast to double (order-insensitive, SURVEY §7.5 risk 3); AVGs
rounded to 4 decimals on both sides; every LIMIT carried by a total order
with a unique tie-break (risk 4). Ops with no faithful single-statement SQL
equivalent (LSH, streaming state) register in QUERIES only → driver applies
its weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
#: name -> oracle SQL, OR a zero-arg callable producing it (resolved and
#: memoized on first use via :func:`resolve_oracle`). Callables exist so
#: an oracle builder that reads constants from a SIBLING query module
#: does not run at import time: with ``oracle=_builder()`` the decorator
#: fires while ``registry._load_everything`` is mid-import, and if the
#: process's FIRST import was that sibling module, the builder reads a
#: partially-initialized module and dies (the corpus_q/dedup_q/text_q/
#: strings_q first-import fragility). Pass ``oracle=_builder`` instead.
ORACLE_SQL: dict[str, str | Callable[[], str]] = {}


def register(
    name: str,
    oracle: str | Callable[[], str] | None = None,
    override: bool = False,
):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the
    registry, with its DuckDB-oracle SQL mirror (a string, or a zero-arg
    builder resolved lazily — see ``ORACLE_SQL``).

    Duplicate names raise regardless of module — the round-11 collision
    showed the same-module loophole is just as silent (a later panel in
    the same file shadowed an earlier one, and its test went red while
    the registry stayed quiet). Deliberate re-registration (test
    monkey-patching, conditional variants) must pass ``override=True``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        prev = QUERIES.get(name)
        if prev is not None and not override:
            # a silent override would make the LAST definition win and
            # the other's registration vanish without any test failing
            raise ValueError(
                f"query name {name!r} already registered by "
                f"{prev.__module__}; pick a distinct name in "
                f"{fn.__module__} or pass override=True"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def resolve_oracle(name: str) -> str:
    """The oracle SQL for ``name``, resolving (and memoizing) a lazy
    builder on first access."""
    v = ORACLE_SQL[name]
    if callable(v):
        v = v()
        ORACLE_SQL[name] = v
    return v


def resolved_oracles() -> dict[str, str]:
    """Every oracle as a plain string — the driver-contract payload."""
    return {n: resolve_oracle(n) for n in ORACLE_SQL}


def _load_everything() -> None:
    # Import for side effect: each module registers its queries.
    from .queries import (  # noqa: F401
        corpus_q,
        curation_q,
        graph_q,
        parity,
        relational,
        relational_ext,
        relational_tpch,
        relational_tpch2,
        dedup_q,
        embed_q,
        hybrid_q,
        mlfit_q,
        multimodal_q,
        packs_q,
        pipeline_q,
        privacy_q,
        quality_q,
        similarity_q,
        timeseries_q,
        skew_q,
        spans_q,
        streaming_q,
        strings_q,
        text_q,
        version_q,
        windows_q,
    )


_load_everything()
