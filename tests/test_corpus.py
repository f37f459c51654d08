"""Invariant tests for the corpus-curation queries (corpus_q.py) — the
oracle gate checks cross-engine equality; these pin the semantics."""

from __future__ import annotations

from ethical_data_ingestion_spark.registry import QUERIES


def test_decontam_excludes_benchmark_and_bounds(spark, sf_dir):
    rows = QUERIES["benchmark_decontam_stats"](spark, sf_dir).collect()
    assert rows, "no training sources?"
    assert all(r.source != "src0" for r in rows)  # benchmark never reports
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_docs
        assert abs(r.contamination_rate - r.n_contaminated / r.n_docs) < 1e-6


def test_length_histogram_partitions_the_corpus(spark, sf_dir):
    from ethical_data_ingestion_spark.io import load_table

    rows = QUERIES["doc_length_histogram"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_total
    for r in rows:
        assert 2**r.bucket <= r.min_chars <= r.max_chars < 2 ** (r.bucket + 1)
    buckets = [r.bucket for r in rows]
    assert buckets == sorted(buckets)


def test_kmeans_partitions_points_and_is_deterministic(spark, sf_dir):
    from ethical_data_ingestion_spark.io import load_table

    out1 = QUERIES["embedding_kmeans_stats"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert 1 <= len(out1) <= 8
    assert sum(r.n_points for r in out1) == n_vecs
    for r in out1:
        assert 0 < r.top_label_share <= 1.0
        assert r.inertia_q >= 0
    # pure function of the data: a second full run reproduces every row
    out2 = QUERIES["embedding_kmeans_stats"](spark, sf_dir).collect()
    assert out1 == out2
