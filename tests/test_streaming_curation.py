"""Proofs for the streaming curation gate: the drained reason counts must
equal a batch recomputation of the same screens (so the streaming engine
adds machinery, not semantics), and the Bloom contamination stage must
keep its zero-false-negative guarantee against a Python brute force."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.operators import text as T
from ethical_data_ingestion_spark.queries import streaming_q as SQ
from ethical_data_ingestion_spark.queries.corpus_q import _BENCH_SOURCE, _DECON_K
from ethical_data_ingestion_spark.queries.dedup_q import _is_batch
from ethical_data_ingestion_spark.queries.text_q import _ENS_TAU, quality_z_df

SF_DIR = "/root/testdata/sf0.001"


def _batch_twin(spark):
    """The drain's shared rollup with the streaming engine removed — the
    same expressions over the same delta subset (the decomp harness's
    twin definition)."""
    docs = load_table(spark, SF_DIR, "documents")
    delta = docs.filter(_is_batch()).select("doc_id", "source", "text")
    return SQ._curation_final(SQ._curation_rollup(spark, SF_DIR, delta))


def test_drain_equals_batch_twin(spark):
    drained = sorted(
        tuple(r)
        for r in registry.QUERIES["streaming_curation_gate"](
            spark, SF_DIR
        ).collect()
    )
    twin = sorted(tuple(r) for r in _batch_twin(spark).collect())
    assert drained == twin
    for r in registry.QUERIES["streaming_curation_gate"](spark, SF_DIR).collect():
        assert (
            r.n_holdout + r.n_quality + r.n_duplicate + r.n_contaminated
            + r.n_kept
            == r.n_docs
        )


def test_bloom_stage_has_no_false_negatives(spark):
    """Every delta doc sharing an exact 8-gram with the benchmark source
    must be Bloom-flagged (c=True) — FPs are allowed, FNs never."""
    docs = load_table(spark, SF_DIR, "documents").collect()

    def grams(text: str) -> set:
        t = " ".join(text.lower().split()).split(" ")
        if len(t) < _DECON_K:
            return {tuple(t)}
        return {tuple(t[i : i + _DECON_K]) for i in range(len(t) - _DECON_K + 1)}

    bench = set()
    for d in docs:
        if d.source == _BENCH_SOURCE:
            bench |= grams(d.text)
    words = SQ._sgate_bloom_words(spark, SF_DIR)

    def bloom_member(gram_tokens) -> bool:
        s = " ".join(gram_tokens)
        for i in range(1, SQ._SGATE_K + 1):
            h = hashlib.md5(f"{s}#{i}".encode()).hexdigest()
            pos = int(h[:15], 16) % SQ._SGATE_M
            if not (words[pos // SQ._SGATE_WORD] >> (pos % SQ._SGATE_WORD)) & 1:
                return False
        return True

    hit_exact = 0
    for d in docs:
        h = hashlib.md5(str(d.doc_id).encode()).hexdigest()
        if int(h[:4], 16) >= 13107:
            continue  # not in the delta
        gs = grams(d.text)
        exact = bool(gs & bench)
        bloomed = any(bloom_member(g) for g in gs)
        if exact:
            hit_exact += 1
            assert bloomed, f"false negative on doc {d.doc_id}"
    assert hit_exact > 0, "fixture must contain contaminated delta docs"
