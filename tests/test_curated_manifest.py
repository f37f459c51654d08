"""Composition proofs for the curated shard manifest: it must shard
exactly the curation-kept documents, price them in the same trained-BPE
currency as the full manifest, and keep the greedy contiguous-shard
invariants."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.queries.pipeline_q import _SHARD_TOKENS

SF_DIR = "/root/testdata/sf0.001"


def test_curated_manifest_covers_exactly_the_kept_docs(spark):
    kept = [
        r
        for r in registry.QUERIES["corpus_curation_emit"](spark, SF_DIR).collect()
        if r.kept
    ]
    manifest = (
        registry.QUERIES["training_shard_manifest_curated"](spark, SF_DIR)
        .orderBy("shard_id")
        .collect()
    )
    assert sum(s.n_docs for s in manifest) == len(kept)
    # shard doc-id ranges are disjoint, ordered, and only contain kept ids
    kept_ids = sorted(r.doc_id for r in kept)
    prev_last = -1
    for s in manifest:
        assert s.first_doc > prev_last
        assert s.first_doc <= s.last_doc
        prev_last = s.last_doc
    assert manifest[0].first_doc == kept_ids[0]
    assert manifest[-1].last_doc == kept_ids[-1]


def test_curated_manifest_prices_in_trained_bpe_tokens(spark):
    """Total curated-manifest mass == the full BPE manifest's mass minus
    the dropped docs' BPE token counts (same currency, same counts)."""
    full = registry.QUERIES["training_shard_manifest_bpe"](spark, SF_DIR).collect()
    curated = registry.QUERIES["training_shard_manifest_curated"](
        spark, SF_DIR
    ).collect()
    decisions = registry.QUERIES["corpus_curation_emit"](spark, SF_DIR).collect()
    from ethical_data_ingestion_spark.io import load_table
    from ethical_data_ingestion_spark.queries.strings_q import _bpe_word_segs
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    segs = _bpe_word_segs(spark, SF_DIR)
    per_doc = {
        r.doc_id: r.n_tok
        for r in docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .join(segs, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_sym").alias("n_tok"))
        .collect()
    }
    dropped_mass = sum(
        per_doc.get(d.doc_id, 0) for d in decisions if not d.kept
    )
    assert sum(s.n_tokens for s in curated) == sum(
        s.n_tokens for s in full
    ) - dropped_mass


def test_curated_shards_respect_greedy_budget(spark):
    """Every shard except possibly the last starts because the previous
    one crossed the budget: cumulative mass at each shard boundary is
    >= shard_id * budget (greedy contiguous assignment)."""
    manifest = (
        registry.QUERIES["training_shard_manifest_curated"](spark, SF_DIR)
        .orderBy("shard_id")
        .collect()
    )
    cum = 0
    for s in manifest:
        assert cum // _SHARD_TOKENS == s.shard_id
        cum += s.n_tokens
