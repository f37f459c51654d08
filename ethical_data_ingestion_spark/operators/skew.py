"""Skew-mitigation operators: salted joins and two-phase aggregation.

AQE's skew-join splitting (on everywhere, session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the explicit
fallback for the cases AQE can't fix: a single pathological key inside one
shuffle block (AQE splits partitions, not keys), or stateful/streaming
aggregations where no runtime re-planning exists. Both operators here are
result-identical to their naive forms — verified by oracle-checked queries
in queries/skew_q.py — so they can be swapped in purely on performance
evidence.

Salt derivation is a deterministic hash of a caller-named row-unique
column (never ``rand()``: non-reproducible; never ``spark_partition_id``:
changes with input layout), so plans — and the driver's value hashes —
are stable across runs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, n_salts) derived from a
    row-unique column — rows of one hot key spread over n_salts shuffle
    partitions."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts)).cast("int")
    )


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    on: list[str],
    big_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side
    once per salt value, join on (keys + salt).

    The hot key's rows land in ``n_salts`` distinct shuffle partitions
    instead of one straggler; the cost is an ``n_salts``× replication of
    the small side — which is why this targets the "small side too big to
    broadcast, big side has hot keys" middle ground. Results are identical
    to ``big.join(skewed_small, on, how)`` for inner/left joins.
    """
    salted_big = with_salt(big, big_unique_col, n_salts)
    replicated = skewed_small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(replicated, on + ["_salt"], how).drop("_salt")


def salted_join_hotkeys(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    big_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
    sample_fraction: float = 0.01,
    hot_threshold: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Adaptive split join: salt ONLY the hot keys, plain-join the rest.

    Uniform salting (``salted_join``) replicates the whole small side
    ``n_salts``× even when one key in a million is hot. Production skew
    handling splits instead: (1) estimate per-key frequency from a
    deterministic sample of the big side, (2) broadcast the (tiny by
    construction) hot-key list, (3) route hot rows through the salted
    path and the rest through the normal shuffle join, (4) union. Cost of
    replication is paid only for the keys that need it; with no hot keys
    the plan degrades to exactly the plain join plus one sampled count.

    ``hot_threshold`` is in SAMPLED rows: a key is hot if it shows up
    ``hot_threshold`` times in the ``sample_fraction`` sample (i.e. ~
    ``hot_threshold / sample_fraction`` rows overall). Sampling is seeded
    so the plan — and result hashes — are reproducible.

    Correct for inner and left joins: the hot/cold split is a partition of
    the key space applied consistently to both sides, so no pair is lost
    or duplicated across the two branches.
    """
    hot_keys = F.broadcast(
        big.sample(fraction=sample_fraction, seed=seed)
        .groupBy(*on)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= hot_threshold)
        .select(*on)
    )
    big_hot = big.join(hot_keys, on, "left_semi")
    big_cold = big.join(hot_keys, on, "left_anti")
    small_hot = small.join(hot_keys, on, "left_semi")
    small_cold = small.join(hot_keys, on, "left_anti")
    hot_joined = salted_join(big_hot, small_hot, on, big_unique_col, n_salts, how)
    cold_joined = big_cold.join(small_cold, on, how)
    return hot_joined.unionByName(cold_joined)


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    unique_col: str,
    partials: dict[str, Column],
    finals: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation through an explicit salt: phase 1 aggregates
    on (keys + salt) — the hot key's load spreads across n_salts reducers —
    phase 2 re-aggregates the n_salts partials per key.

    Valid for algebraic aggregates (count→sum, sum→sum, min/max→min/max,
    avg→(sum,count) pair). Spark's hash aggregate already does map-side
    partials; the explicit salt matters when the *reduce* side of one key
    exceeds an executor (e.g. exact COUNT(DISTINCT) or collect-like
    aggregations where partials stay large).

    ``partials``: alias → phase-1 aggregate over input rows.
    ``finals``:   alias → phase-2 aggregate over phase-1 columns.
    """
    phase1 = (
        with_salt(df, unique_col, n_salts)
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(a) for a, c in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(a) for a, c in finals.items()]
    )
