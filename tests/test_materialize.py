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
