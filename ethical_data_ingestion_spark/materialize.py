"""Materialization policy seam.

Several operators need a DataFrame pinned — computed exactly once, with
the SAME contents (and, for range-partitioned inputs, the same partition
boundaries) visible to every downstream job — either because three
structurally different subplans consume it (shingle sets), because an
iterative loop would otherwise replay its whole lineage each round
(connected components), or because a nondeterministic exchange
(``repartitionByRange``'s reservoir sampling) must not be re-executed
(global ranking).

``localCheckpoint`` is the fast single-box answer, but it stores blocks
on executors ONLY: on a real cluster an executor loss makes the
truncated lineage unrecoverable and fails the job. This seam routes all
such sites through one policy switch so a cluster deployment flips every
call site at once:

* ``local``       — ``localCheckpoint(eager=True)``. Fastest; blocks on
                    executors; lineage truncated. Default for local[...]
                    and the bench/driver runs.
* ``disk``        — ``persist(DISK_ONLY)`` + a count() to force it.
                    Survives OOM-evictions; on executor loss Spark
                    RECOMPUTES lost blocks from lineage, which is safe
                    for deterministic plans but re-runs nondeterministic
                    exchanges (a range exchange may resample boundaries —
                    prefer ``checkpoint`` when that matters). persist does
                    NOT truncate lineage, so per-round plans in an
                    iterative loop grow with the round count — use
                    ``checkpoint`` for long loops (CC at high diameter);
                    loops release their previous round via :func:`unpin`
                    so pinned state stays O(1) regardless.
* ``checkpoint``  — reliable ``checkpoint(eager=True)`` into
                    ``spark.sparkContext.getCheckpointDir()`` (set it to
                    durable storage, e.g. HDFS/S3). Survives executor
                    loss with identical contents; the 100-TB default.

Select globally with the env var ``SPARK_GRAFT_MATERIALIZE`` or per call
with ``mode=``.
"""

from __future__ import annotations

import os
import tempfile

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_ENV_VAR = "SPARK_GRAFT_MATERIALIZE"
_MODES = ("local", "disk", "checkpoint")

#: sizeInBytes digit bound above which a checkpoint's inherited statistics
#: are treated as estimate garbage and reset — no real dataset exceeds
#: 10^40 bytes; only compounding join-product ESTIMATES do.
_STATS_DIGIT_CAP = 40

_warned_stats_cap = False


def _cap_checkpoint_stats(df: DataFrame) -> DataFrame:
    """Reset ASTRONOMICAL inherited statistics on a checkpointed plan.

    ``localCheckpoint`` truncates lineage but COPIES the truncated plan's
    statistics onto the new ``LogicalRDD`` (``originStats``). In an
    iterative loop that re-joins its own checkpoint (the suffix-array
    doubling, any self-join iteration), the size-only estimator's join
    rule MULTIPLIES child sizes, so the carried ``sizeInBytes`` BigInt
    roughly CUBES per round — its digit count triples, and every later
    Catalyst pass that consults stats (join selection, runtime-filter
    injection, AQE) pays BigInt arithmetic that grows ~4-6x per round.
    Measured on a 13-round build: rounds 1-7 ~1 s, round 10 = 40 s, round
    13 extrapolates to over an hour — a pure PLANNING hang with executors
    idle (diagnosed from thread samples: ``SizeInBytesOnlyStatsPlanVisitor``
    over thousand-digit ``scala.math.BigInt`` products).

    The fix: when the checkpointed plan's ``sizeInBytes`` exceeds
    ``10^_STATS_DIGIT_CAP`` (no REAL dataset gets near it — it is always
    compounded estimate garbage), rebuild the ``LogicalRDD`` over the SAME
    InternalRow RDD with ``originStats``/``originConstraints`` empty, so
    the node reports ``spark.sql.defaultSizeInBytes`` and the compounding
    resets at every pin. Plans with sane stats pass through untouched
    (their sizes keep driving broadcast decisions). Uses two
    ``private[sql]`` JVM surfaces that are public in bytecode; if a Spark
    upgrade moves them, we log once and degrade to the uncapped plan
    (a perf-only regression, never a correctness one)."""
    global _warned_stats_cap
    try:
        qe = df._jdf.queryExecution()
        an = qe.analyzed()
        if not an.getClass().getName().endswith(".LogicalRDD"):
            return df
        if len(str(an.stats().sizeInBytes())) <= _STATS_DIGIT_CAP:
            return df
        spark = df.sparkSession
        jvm = spark._jvm
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        new_lr = jvm.org.apache.spark.sql.execution.LogicalRDD(
            an.output(), an.rdd(), an.outputPartitioning(),
            an.outputOrdering(), an.isStreaming(), an.stream(),
            spark._jsparkSession, none, none,
        )
        njdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, new_lr
        )
        return DataFrame(njdf, spark)
    except Exception as e:  # noqa: BLE001 — perf-only path, degrade loudly once
        if not _warned_stats_cap:
            _warned_stats_cap = True
            print(
                "materialize: checkpoint-stats cap unavailable "
                f"({type(e).__name__}: {e}); iterative self-join loops may "
                "plan slowly on this Spark build",
                file=__import__("sys").stderr,
            )
        return df


#: id(pinned df) -> (weakref to it, persistent-RDD ids created by its pin).
#: localCheckpoint registers its RDD in SparkContext.persistentRdds with a
#: STRONG reference — dropping the Python DataFrame never frees the blocks
#: (measured: block-manager bytes unchanged after del + GC both sides).
#: :func:`release` uses these ids to unpersist deterministically.
_PIN_RDD_IDS: dict[int, tuple] = {}


def _persistent_ids(sc) -> set:
    return set(sc._jsc.getPersistentRDDs().keySet().toArray())


def materialize(df: DataFrame, mode: str | None = None) -> DataFrame:
    """Pin ``df``: force one computation whose result every downstream job
    reuses. Policy from ``mode`` or ``$SPARK_GRAFT_MATERIALIZE`` (default
    ``local``); see module docstring for the cluster-durability tradeoffs.
    """
    mode = mode or os.environ.get(_ENV_VAR, "local")
    if mode not in _MODES:
        raise ValueError(
            f"materialize mode {mode!r} not in {_MODES} "
            f"(set via mode= or ${_ENV_VAR})"
        )
    if mode == "local":
        import weakref

        sc = df.sparkSession.sparkContext
        try:
            before = _persistent_ids(sc)
        except Exception:  # noqa: BLE001 — tracking is best-effort
            before = None
        pinned = _cap_checkpoint_stats(df.localCheckpoint(eager=True))
        if before is not None:
            try:
                new = _persistent_ids(sc) - before
                if new:
                    _PIN_RDD_IDS[id(pinned)] = (
                        weakref.ref(pinned), sorted(new)
                    )
            except Exception:  # noqa: BLE001
                pass
        return pinned
    if mode == "disk":
        pinned = df.persist(StorageLevel.DISK_ONLY)
        pinned.count()
        return pinned
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        # no durable dir configured: fall back to a local temp dir so the
        # mode stays runnable in tests; a cluster deployment must call
        # setCheckpointDir("hdfs://...") (or s3://) at session build.
        # The fallback dir is removed at interpreter exit — reliable
        # checkpoint files are not auto-cleaned by Spark otherwise
        # (set spark.cleaner.referenceTracking.cleanCheckpoints on
        # clusters to reclaim per-RDD files as they are GC'd).
        import atexit
        import shutil

        d = tempfile.mkdtemp(prefix="spark_graft_ckpt_")
        atexit.register(shutil.rmtree, d, True)
        sc.setCheckpointDir(d)
    return df.checkpoint(eager=True)


#: key -> (session, pinned DataFrame). See :func:`shared`.
_SHARED: dict[tuple, tuple[object, DataFrame]] = {}


def shared_get(key: tuple, spark) -> DataFrame | None:
    """The pinned DataFrame published under ``key`` for this session, or
    None. Lets a consumer reuse an upstream artifact WITHOUT making the
    producer's own repeat runs serve from cache (see ``dedup_q``: the
    pair query always rebuilds; cluster resolution reads the published
    table)."""
    hit = _SHARED.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    if hit is not None:
        # stale session: drop the entry so a host cycling sessions doesn't
        # keep dead-session DataFrame graphs referenced for process life.
        del _SHARED[key]
    return None


def shared_publish(key: tuple, spark, df: DataFrame) -> DataFrame:
    """Materialize ``df`` and publish it under ``key``; returns the
    pinned result."""
    pinned = materialize(df)
    _SHARED[key] = (spark, pinned)
    return pinned


def shared(key: tuple, spark, build) -> DataFrame:
    """Session-scoped cache of a pinned DataFrame: ``build()`` runs (and
    the result is materialized) at most once per (key, session); later
    callers — other queries in the same suite, or repeat calls — reuse
    the pinned blocks.

    This is the pipeline-shaped sharing the round-3 verdict prescribed
    for the ranked-orders materialization, generalized: a production
    corpus pipeline persists its expensive intermediate tables (shingle
    sets, candidate pairs) ONCE and feeds every downstream consumer from
    them, so queries that model those consumers should too. Entries are
    invalidated when the session changes (pinned blocks die with their
    executors); keys embed every parameter the build depends on."""
    hit = _SHARED.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    # evict every stale-session entry on miss (not just this key): the
    # cache must not hold the previous session's object graphs alive.
    for k in [k for k, (s, _) in _SHARED.items() if s is not spark]:
        del _SHARED[k]
    df = materialize(build())
    _SHARED[key] = (spark, df)
    return df


def unpin(df: DataFrame | None, mode: str | None = None) -> None:
    """Release a :func:`materialize`'d DataFrame once NO downstream
    consumer remains (e.g. an iterative loop's previous round after the
    next round has been pinned).

    * ``disk``       — ``unpersist()`` drops the cached plan entry and its
                       blocks; without this, every loop round would stay
                       registered in the CacheManager for session life.
    * ``local``      — no-op: localCheckpoint blocks belong to their
                       truncated-lineage RDD and unpersisting them would
                       make the DataFrame unrecomputable if any reference
                       survives; they are evicted LRU under pressure and
                       die with the session (the mode is the single-box
                       fast path, not the long-lived-cluster one).
    * ``checkpoint`` — no-op here: reliable checkpoint files are removed
                       by Spark's ContextCleaner when the RDD is GC'd iff
                       ``spark.cleaner.referenceTracking.cleanCheckpoints``
                       is set (recommended for cluster deployments), and
                       the checkpoint dir itself is deployment-owned.
    """
    if df is None:
        return
    mode = mode or os.environ.get(_ENV_VAR, "local")
    if mode == "disk":
        df.unpersist()


def release(df: DataFrame | None) -> int:
    """Deterministically FREE a local-mode pin's block-manager memory.

    Contract: the caller guarantees NO consumer touches ``df`` again —
    after release the DataFrame is unrecomputable (its lineage was
    truncated by the checkpoint). This is the between-workload memory
    budget the long-suite bench needs (DEPLOY §14): pinned artifacts
    accumulate in SparkContext.persistentRdds (strong refs — GC never
    frees them) and squeeze execution memory for every later query.
    Returns the number of RDDs unpersisted. No-op for non-local modes
    (``disk`` pins release via :func:`unpin`; reliable checkpoints are
    files, not blocks)."""
    if df is None:
        return 0
    ref_ids = _PIN_RDD_IDS.pop(id(df), None)
    if ref_ids is None or ref_ids[0]() is not df:
        return 0
    sc = df.sparkSession.sparkContext
    n = 0
    try:
        jmap = sc._jsc.getPersistentRDDs()
        for rid in ref_ids[1]:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
                n += 1
    except Exception:  # noqa: BLE001 — releasing is best-effort hygiene
        return n
    return n


def transient_release(spark) -> int:
    """Unpersist every persistent RDD NOT owned by a live shared
    artifact — the per-call :func:`materialize` pins (loop rounds,
    intra-query intermediates) that are dead once their query's action
    returns but sit in ``persistentRdds`` for session life otherwise.
    A long-lived session (the bench, a notebook, a server) calls this
    between queries; one query's transients never help the next, so the
    only effect is execution memory handed back. Returns the number of
    RDDs unpersisted.

    Fail-safe rules (a wrong sweep frees blocks whose lineage was
    truncated — a later consumer dies with missing blocks, worse than
    any memory squeeze): no-op unless the materialize mode is ``local``
    (under ``disk`` the pins are reliable-checkpoint files and _SHARED
    ownership is not tracked via RDD ids at all), and no-op when ANY
    live shared artifact of this session lacks a tracking record (the
    ownership set would be incomplete, so the sweep could hit a shared
    artifact's blocks)."""
    if os.environ.get(_ENV_VAR, "local") != "local":
        return 0
    owned: set = set()
    for s, df in _SHARED.values():
        if s is spark:
            e = _PIN_RDD_IDS.get(id(df))
            if e is None or e[0]() is not df:
                return 0  # untracked shared artifact: keep everything
            owned.update(e[1])
    n = 0
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in set(jmap.keySet().toArray()) - owned:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
                n += 1
    except Exception:  # noqa: BLE001 — best-effort hygiene
        return n
    # sweep trackers whose DataFrames are gone
    for k in [k for k, (r, _) in _PIN_RDD_IDS.items() if r() is None]:
        del _PIN_RDD_IDS[k]
    return n


def pinned_bytes(spark) -> int:
    """Total block-manager bytes held by persistent RDDs (memory +
    disk) — the number a long-lived session budgets against
    (DEPLOY §14/§17)."""
    try:
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return int(sum(i.memSize() + i.diskSize() for i in infos))
    except Exception:  # noqa: BLE001
        return 0


def shared_release(spark, predicate=None) -> int:
    """Evict session-shared artifacts and FREE their blocks (see
    :func:`release` for the contract — later :func:`shared` callers
    simply rebuild). ``predicate(key)`` selects entries; None releases
    every entry of this session. Returns the number of artifacts
    released. The bench calls this between family blocks so each block's
    timings run against a clean block manager instead of the whole
    suite's accumulated artifact set."""
    n = 0
    for k in [k for k, (s, _) in _SHARED.items()
              if s is spark and (predicate is None or predicate(k))]:
        _, df = _SHARED.pop(k)
        release(df)
        n += 1
    return n
