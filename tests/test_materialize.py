"""The materialization policy seam: one env var must flip every
lineage-pinning site from localCheckpoint to cluster-durable modes and
still produce identical results."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.materialize import (
    _SHARED,
    materialize,
    shared,
    shared_get,
    shared_publish,
)
from ethical_data_ingestion_spark.operators import dedup


@pytest.mark.parametrize("mode", ["local", "disk", "checkpoint"])
def test_modes_produce_identical_results(spark, sf_dir, mode, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", mode)
    docs = load_table(spark, sf_dir, "documents")
    out = dedup.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    rows = {(r.id1, r.id2, r.jaccard) for r in out.collect()}
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "local")
    base = dedup.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8)
    assert rows == {(r.id1, r.id2, r.jaccard) for r in base.collect()}


def test_explicit_mode_overrides_env(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "local")
    df = spark.range(10)
    pinned = materialize(df, mode="disk")
    assert pinned.count() == 10
    assert pinned.storageLevel.useDisk  # persisted, not localCheckpointed
    pinned.unpersist()


def test_invalid_mode_raises(spark):
    with pytest.raises(ValueError, match="materialize mode"):
        materialize(spark.range(1), mode="nope")


def test_shared_builds_once_per_session_and_key(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(5)

    key = ("test_shared", "k1")
    _SHARED.pop(key, None)
    a = shared(key, spark, build)
    b = shared(key, spark, build)
    assert len(calls) == 1
    assert a is b
    assert a.count() == 5
    _SHARED.pop(key, None)


def test_shared_publish_and_get(spark):
    key = ("test_pub", "k1")
    _SHARED.pop(key, None)
    assert shared_get(key, spark) is None
    pinned = shared_publish(key, spark, spark.range(3))
    assert shared_get(key, spark) is pinned
    # a DIFFERENT session object invalidates (pinned blocks die with it)
    assert shared_get(key, object()) is None
    _SHARED.pop(key, None)


def test_stale_session_entries_evicted_from_shared():
    """_SHARED must not keep a dead session's object graph alive: a miss
    under a new 'session' object evicts every stale entry."""

    class _FakeDF:
        pass

    class _FakeSession:
        pass

    s_old, s_new = _FakeSession(), _FakeSession()
    _SHARED.clear()
    _SHARED[("k1",)] = (s_old, _FakeDF())
    _SHARED[("k2",)] = (s_old, _FakeDF())
    assert shared_get(("k1",), s_new) is None
    assert ("k1",) not in _SHARED  # evicted on the miss
    # shared() with a new session evicts remaining stale keys too
    built = _FakeDF()
    import ethical_data_ingestion_spark.materialize as M

    orig = M.materialize
    M.materialize = lambda df, mode=None: df
    try:
        out = shared(("k3",), s_new, lambda: built)
    finally:
        M.materialize = orig
    assert out is built
    assert ("k2",) not in _SHARED
    _SHARED.clear()


def test_disk_mode_iterative_loop_keeps_bounded_pinned_state(
    spark, monkeypatch
):
    """Under SPARK_GRAFT_MATERIALIZE=disk an iterative operator must
    unpersist each round once the next is pinned — pinned-RDD count after
    a 20-round label propagation stays O(1), not O(rounds)."""
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "disk")
    # short path graph: disk mode does not truncate lineage, so plan depth
    # grows per round — fine for a handful of rounds (long loops belong in
    # checkpoint mode per the materialize docstring); what this test pins
    # is the CACHE lifecycle, which must stay O(1) in rounds either way.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], "id1 bigint, id2 bigint"
    )

    def n_pinned():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_pinned()
    out = dedup.connected_components(edges, max_iter=12, n_edges=6)
    assert out.select(F.countDistinct("cluster_id")).collect()[0][0] == 1
    after = n_pinned()
    # adj + final labels (+ the just-released round not yet GC'd) — far
    # below the 6+ a leaking loop would pin
    assert after - before <= 4, (before, after)


def _storage_ids(spark):
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return set(jmap.keySet().toArray())


def test_release_frees_pinned_blocks(spark):
    """persistentRdds holds STRONG refs — del + GC never frees a local
    pin (measured); release() must unpersist its tracked RDD ids."""
    from ethical_data_ingestion_spark.materialize import release

    before = _storage_ids(spark)
    pinned = materialize(spark.range(1000).withColumn("x", F.col("id") * 2))
    new = _storage_ids(spark) - before
    assert new, "local pin should register a persistent RDD"
    assert release(pinned) == len(new)
    assert not (_storage_ids(spark) & new)
    assert release(pinned) == 0  # idempotent


def test_shared_release_evicts_and_rebuilds(spark):
    from ethical_data_ingestion_spark.materialize import shared_release

    builds = []

    def build():
        builds.append(1)
        return spark.range(50)

    key = ("relspec", "t")
    a = shared(key, spark, build)
    assert a.count() == 50 and len(builds) == 1
    before = _storage_ids(spark)
    assert shared_release(spark, lambda k: k[0] == "relspec") == 1
    assert shared_get(key, spark) is None
    # blocks actually freed (strictly fewer persistent RDDs than before)
    assert _storage_ids(spark) < before
    b = shared(key, spark, build)
    assert b.count() == 50 and len(builds) == 2  # rebuilt, not resurrected


def test_transient_release_spares_shared_artifacts(spark):
    """Per-call pins are freed; store-owned artifacts keep their blocks
    AND stay usable."""
    from ethical_data_ingestion_spark.materialize import (
        shared_release,
        transient_release,
    )

    key = ("transpec", "t")
    owned = shared(key, spark, lambda: spark.range(25))
    transient = materialize(spark.range(75))
    assert transient.count() == 75
    freed = transient_release(spark)
    assert freed >= 1
    assert owned.count() == 25  # shared artifact untouched and usable
    assert shared_get(key, spark) is not None
    shared_release(spark, lambda k: k[0] == "transpec")
