"""The sampled removal-pricing panel (the sf1-gate-runnable substring
ground truth): it must be EXACTLY the full pricing panel of the corpus
that contains only the sampled documents — same index, melt, and island
merge, smaller input — and its exact-integer retained_share must agree
with arbitrary-precision rounding."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.queries.spans_q import (
    _SAMPLE_MOD,
    _SAMPLE_REM,
    substring_dedup_removal_sampled,
    substring_dedup_removal_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def test_sampled_panel_is_full_panel_of_sampled_corpus(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % _SAMPLE_MOD == _SAMPLE_REM
    )
    sub = str(tmp_path / "subcorpus")
    docs.write.parquet(f"{sub}/documents.parquet")

    want = {
        r.span_threshold: r
        for r in substring_dedup_removal_stats(spark, sub).collect()
    }
    got = {
        r.span_threshold: r
        for r in substring_dedup_removal_sampled(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for L, g in got.items():
        w = want[L]
        assert (g.n_docs_affected, g.n_spans, g.covered_tokens,
                g.total_tokens) == (
            w.n_docs_affected, w.n_spans, w.covered_tokens, w.total_tokens
        ), L
        # full panel rounds via double, sampled via integer half-up —
        # equal to the quantum
        assert abs(g.retained_share - w.retained_share) <= 1e-6, L


def test_sampled_share_matches_exact_rational_rounding(spark):
    for r in substring_dedup_removal_sampled(spark, SF_DIR).collect():
        frac = 1 - Fraction(r.covered_tokens, r.total_tokens)
        # round-half-up to 6 decimals in exact arithmetic
        micro = (2 * frac.numerator * 10**6 + frac.denominator) // (
            2 * frac.denominator
        )
        assert r.retained_share == micro / 1_000_000, r
