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


def test_bloom_decontam_no_false_negatives_and_bounded_fps(spark, sf_dir):
    rows = QUERIES["bloom_decontam_stats"](spark, sf_dir).collect()
    assert rows, "expected per-source rows"
    for r in rows:
        # zero false negatives is the Bloom filter's structural guarantee
        assert r.doc_fns == 0
        # bloom flags are exactly exact hits plus false positives
        assert r.docs_bloom == r.docs_exact + r.doc_fps
        assert r.sh_bloom_hits >= r.sh_fps
        assert r.sh_probed >= r.sh_bloom_hits
        # at the fixture load factor the FP rate stays small (m=131040,
        # k=5, |bench| ~1.3k at sf0.001/0.01 -> expected well under 5%)
        assert r.sh_fps <= 0.05 * r.sh_probed


def test_bloom_decontam_flags_a_planted_contaminated_doc(spark, tmp_path):
    shared = " ".join(f"w{i}" for i in range(12))  # spans an 8-gram
    rows = [
        (0, shared + " " + " ".join(f"b{i}" for i in range(8)), "en", "src0", 99),
        (1, " ".join(f"c{i}" for i in range(8)) + " " + shared, "en", "src1", 99),
        (2, " ".join(f"d{i}" for i in range(20)), "en", "src1", 99),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.source: r for r in QUERIES["bloom_decontam_stats"](spark, str(tmp_path)).collect()}
    assert out["src1"].n_docs == 2
    assert out["src1"].docs_exact == 1  # doc 1 shares the span, doc 2 clean
    assert out["src1"].docs_bloom >= 1
    assert out["src1"].doc_fns == 0


def test_semantic_dedup_is_a_subset_screen_of_global_neardup(spark, sf_dir):
    rows = QUERIES["semantic_dedup_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every within-cluster pair was scored: exactly C(n_points, 2)
        assert r.n_pairs == r.n_points * (r.n_points - 1) // 2
        assert 0 <= r.n_dup_pairs <= r.n_pairs
        # keep-lowest-id: can't drop more docs than dup pairs implicate
        assert 0 <= r.n_drop <= r.n_dup_pairs
    # cluster pruning can only MISS cross-cluster pairs, never invent:
    # within-cluster dup total <= the exact global (blocked-GEMM) count
    n_global = QUERIES["embedding_neardup_pairs"](spark, sf_dir).count()
    assert sum(r.n_dup_pairs for r in rows) <= n_global
