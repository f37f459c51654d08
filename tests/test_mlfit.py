"""In-cluster quality-probe training (round-9 verdict item 7): the
closed-form fit must agree with an independent numpy solve of the same
normal equations, and the calibration panel must reconcile with a direct
per-document replay of the fitted score."""

from __future__ import annotations

import math

import numpy as np

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.queries import mlfit_q

SF_DIR = "/root/testdata/sf0.001"


def _features(spark):
    from pyspark.sql import functions as F

    from ethical_data_ingestion_spark.io import load_table

    docs = load_table(spark, SF_DIR, "documents")
    return docs.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        *mlfit_q._feature_cols(),
    ).collect()


def test_weights_match_numpy_lstsq(spark):
    """Third implementation: build X (integer micro-unit features) and y
    in numpy from the same feature columns and solve the normal
    equations with LAPACK — the probe's weights must agree to float
    precision (the engines' elimination is unpivoted but the normal
    matrix is SPD and well-conditioned here)."""
    rows = _features(spark)
    X = np.array([[r[f"x{i}"] for i in range(mlfit_q._P)] for r in rows], dtype=float)
    y = np.array([r.y for r in rows], dtype=float)
    want = np.linalg.solve(X.T @ X, X.T @ y)
    got = {
        r.term: r.weight
        for r in registry.QUERIES["quality_probe_fit"](spark, SF_DIR).collect()
    }
    for i, t in enumerate(mlfit_q._TERMS):
        assert math.isfinite(got[t])
        assert abs(got[t] - want[i]) <= 1e-9 * max(1.0, abs(want[i])), (t, got[t], want[i])


def test_fit_deterministic_across_invocations(spark):
    a = registry.QUERIES["quality_probe_fit"](spark, SF_DIR).collect()
    b = registry.QUERIES["quality_probe_fit"](spark, SF_DIR).collect()
    assert [(r.term, r.weight) for r in a] == [(r.term, r.weight) for r in b]


def test_calibration_reconciles_with_score_replay(spark):
    """Replay the fitted score per document in Python (same literal
    weights, same left-to-right accumulation) and rebuild the bins —
    counts and outcome rates must match the panel exactly."""
    weights = mlfit_q._fit_weights(spark, SF_DIR)
    rows = _features(spark)
    bins: dict[int, list[int]] = {}
    for r in rows:
        s = 0.0
        for i in range(mlfit_q._P):
            s = s + (float(r[f"x{i}"]) * weights[i])
        b = math.floor(s / mlfit_q._CAL_BIN)
        a = bins.setdefault(b, [0, 0])
        a[0] += 1
        a[1] += r.y
    panel = registry.QUERIES["quality_probe_calibration"](spark, SF_DIR).collect()
    assert {r.bin for r in panel} == set(bins)
    for r in panel:
        assert r.n_docs == bins[r.bin][0], r.bin
        assert r.n_en == bins[r.bin][1], r.bin
        assert abs(r.en_rate - round(bins[r.bin][1] / bins[r.bin][0], 4)) < 1e-12
    assert sum(r.n_docs for r in panel) == len(rows)


def test_probe_separates_outcome_on_fixture(spark):
    """The trained probe must actually rank: mean fitted score of y=1
    documents above mean of y=0 (trivially true for any least-squares
    fit with an intercept unless the features carry zero signal — this
    pins that the pipeline wires real features, not constants)."""
    weights = mlfit_q._fit_weights(spark, SF_DIR)
    rows = _features(spark)
    s1 = [sum(float(r[f"x{i}"]) * weights[i] for i in range(mlfit_q._P)) for r in rows if r.y == 1]
    s0 = [sum(float(r[f"x{i}"]) * weights[i] for i in range(mlfit_q._P)) for r in rows if r.y == 0]
    assert s1 and s0
    assert sum(s1) / len(s1) > sum(s0) / len(s0)
