"""Scale-stress and hardening tests for the dedup family.

Three risks the toy fixtures don't exercise (round-3 verdict items 5/8):

* **Candidate blowup**: the candidate-generation filters (PPJoin prefix,
  LSH bands, SimHash blocks) must keep candidates tracking TRUE pairs —
  the fixture's 31-word vocabulary makes shingle co-occurrence brutal,
  and 10× more documents must not square the candidate set. Replicating
  the corpus k× gives an analytic ground truth: every original J ≥ t
  pair becomes k² cross-copy pairs, and each document's k copies add
  C(k,2) identical pairs — so both pair counts AND candidate ratios are
  exactly predictable at 10× scale.
* **Connected-components truncation**: a component with diameter >
  ``max_iter`` must fail LOUDLY (a silently truncated label propagation
  returns wrong cluster ids).
* **Empty inputs**: the panel queries must return empty/sane results,
  not throw, on an empty table (a fresh pipeline's first run).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ethical_data_ingestion_spark.io import load_table
from ethical_data_ingestion_spark.operators import dedup
from ethical_data_ingestion_spark.operators.dedup import (
    _minhash_from_sets,
    _shingle_sets,
    jaccard_candidates,
    minhash_band_candidates,
    simhash_block_candidates,
    simhash_signatures,
)

K_COPIES = 10


@pytest.fixture(scope="module")
def docs_10x(spark, tmp_path_factory):
    """sf0.01 documents replicated 10× with disjoint ids — 5000 docs with
    the fixture's worst-case vocabulary, written to parquet so the dedup
    pipelines read it exactly like a real table."""
    base = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "text"
    )
    n = base.count()
    copies = [
        base.select((F.col("doc_id") + i * n).alias("doc_id"), "text")
        for i in range(K_COPIES)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    path = str(tmp_path_factory.mktemp("stress") / "documents.parquet")
    big.repartition(8).write.parquet(path)
    return spark.read.parquet(path), n


@pytest.mark.slow
def test_jaccard_replication_exact_counts_and_candidate_ratio(spark, docs_10x):
    big, n = docs_10x
    base_docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    base_pairs = dedup.jaccard_pairs(base_docs, "doc_id", "text", k=3, threshold=0.8).count()
    base_cands = jaccard_candidates(
        _shingle_sets(base_docs, "doc_id", "text", 3), "doc_id", 0.8
    ).count()

    pairs = dedup.jaccard_pairs(big, "doc_id", "text", k=3, threshold=0.8)
    # analytic ground truth under k× replication
    expected = n * K_COPIES * (K_COPIES - 1) // 2 + base_pairs * K_COPIES**2
    assert pairs.count() == expected

    cands = jaccard_candidates(
        _shingle_sets(big, "doc_id", "text", 3), "doc_id", 0.8
    ).count()
    # candidates must scale like pairs (~k²), not like all-pairs (the
    # all-pairs square grows 100× too, but from n²/2 = 12.4M — the filter
    # keeps candidates within a constant factor of true pairs instead)
    base_ratio = base_cands / max(base_pairs, 1)
    big_ratio = cands / max(expected, 1)
    assert big_ratio <= 3.0 * base_ratio + 1.0, (
        f"candidate blowup: {cands} candidates for {expected} pairs "
        f"(ratio {big_ratio:.1f} vs base {base_ratio:.1f})"
    )


@pytest.mark.slow
def test_simhash_replication_exact_counts(spark, docs_10x):
    big, n = docs_10x
    base_docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    base_pairs = dedup.simhash_pairs(base_docs, "doc_id", "text", max_hamming=3).count()
    pairs = dedup.simhash_pairs(big, "doc_id", "text", max_hamming=3)
    expected = n * K_COPIES * (K_COPIES - 1) // 2 + base_pairs * K_COPIES**2
    assert pairs.count() == expected
    # block-collision candidates stay pair-tracking too
    cands = simhash_block_candidates(
        simhash_signatures(big, "doc_id", "text"), "doc_id"
    ).count()
    assert cands <= 20 * expected


@pytest.mark.slow
def test_minhash_lsh_replication_exact_counts(spark, docs_10x):
    big, n = docs_10x
    base_docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    base_pairs = dedup.minhash_lsh_pairs(
        base_docs, "doc_id", "text", threshold=0.8
    ).count()
    pairs = dedup.minhash_lsh_pairs(big, "doc_id", "text", threshold=0.8)
    # identical copies share identical signatures, so banding recall is
    # exactly preserved under replication: the analytic count holds for
    # whatever subset the bands caught at base scale
    expected = n * K_COPIES * (K_COPIES - 1) // 2 + base_pairs * K_COPIES**2
    assert pairs.count() == expected
    cands = minhash_band_candidates(
        _minhash_from_sets(_shingle_sets(big, "doc_id", "text", 3), "doc_id", 16),
        "doc_id", 16, 4,
    ).count()
    assert cands <= 20 * expected


def test_connected_components_diameter_over_max_iter_raises(spark):
    # path graph 0-1-2-...-27: diameter 27 > default max_iter 25 →
    # min-label propagation cannot converge; must fail loudly, not
    # return truncated (wrong) labels
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(27)], "id1 bigint, id2 bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(edges, max_iter=25)
    # with headroom it converges and labels the whole path with min id 0
    out = dedup.connected_components(edges, max_iter=35).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == 28


def test_connected_components_accepts_precomputed_edge_count(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], "id1 bigint, id2 bigint")
    out = {
        r.id: r.cluster_id
        for r in dedup.connected_components(edges, n_edges=4).collect()
    }
    assert out == {1: 1, 2: 1, 3: 3, 4: 3}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A fixture dir whose documents/embeddings tables are empty but
    schema-identical to the real ones."""
    d = tmp_path_factory.mktemp("empty_sf")
    for t in ("documents", "embeddings", "orders"):
        df = load_table(spark, "/root/testdata/sf0.001", t)
        df.limit(0).coalesce(1).write.parquet(str(d / f"{t}.parquet"))
    return str(d)


def test_panels_on_empty_tables(spark, empty_sf_dir):
    from ethical_data_ingestion_spark.registry import QUERIES

    for name in (
        "sequence_packing_stats",
        "corpus_mixing_stats",
        "product_quantization_stats",
        "benchmark_decontam_stats",
        "doc_length_histogram",
        "embedding_kmeans_stats",
    ):
        rows = QUERIES[name](spark, empty_sf_dir).collect()
        assert rows == [], f"{name} on empty input returned {rows[:3]}"


def test_round4_doc_panels_on_empty_tables(spark, empty_sf_dir):
    from ethical_data_ingestion_spark.registry import QUERIES

    for name in (
        "unigram_kl_quality",
        "source_topp_curation",
        "heavy_hitters_cms",
    ):
        rows = QUERIES[name](spark, empty_sf_dir).collect()
        assert rows == [], f"{name} on empty input returned {rows[:3]}"


def test_fastss_neighborhood_size_is_quadratic_in_length_only(spark):
    """The editdist candidate generator's variant count per string must be
    exactly 1 + L + C(L,2) minus internal collisions — quadratic in the
    string LENGTH, independent of table size. A regression that expands
    the neighborhood (e.g. to 3 deletions) squares candidate volume at
    100 TB; this pins the budget."""
    import tempfile, os

    from ethical_data_ingestion_spark.registry import QUERIES, _load_everything

    _load_everything()
    names = ["abcdefghij", "0123456789abcdefghij"]  # L = 10, 20
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    from ethical_data_ingestion_spark.queries.strings_q import _del1_sql

    variants = spark.sql(
        f"""
        SELECT p_name,
               size(array_distinct(concat(
                 array(p_name),
                 {_del1_sql('p_name')},
                 flatten(transform({_del1_sql('p_name')},
                                   t -> {_del1_sql('t')}))))) AS n_var
        FROM parquet.`{os.path.join(d, 'part.parquet')}`
        """
    ).collect()
    for r in variants:
        L = len(r.p_name)
        cap = 1 + L + L * (L - 1) // 2
        assert r.n_var <= cap, (r.p_name, r.n_var, cap)
        # distinct characters -> no collisions, so the bound is tight
        assert r.n_var == cap


def test_session_new_panels_on_empty_tables(spark, empty_sf_dir):
    from ethical_data_ingestion_spark.registry import QUERIES

    for name in (
        "ngram_span_overlap",
        "bloom_decontam_stats",
        "dsir_selection_stats",
        "semantic_dedup_stats",
        "incremental_dedup_stats",
        "multimodal_neardup_simhash",
        "price_drift_ks",
        "domain_cap_sampling",
        "padding_efficiency_stats",
        "quality_filter_ensemble",
        "chunk_embed_topk",
        "bpe_merge_candidates",
        "dataset_diff_stats",
        "tokenizer_vocab_coverage",
        "cluster_balanced_sampling",
        "bigram_lm_perplexity",
        "lexicon_screen_stats",
        "contrastive_pair_mining",
        "embedding_pipeline_stats",
        "embed_knn_e2e",
        "embed_knn_lsh",
    ):
        rows = QUERIES[name](spark, empty_sf_dir).collect()
        assert rows == [], f"{name} on empty input returned {rows[:3]}"
    # the recall panel is a scalar summary: on an empty corpus it returns
    # ONE vacuous row (0 pairs, recall/precision 1.0) on BOTH engines —
    # its designed empty shape, not a leak of NULLs
    rows = QUERIES["minhash_recall_stats"](spark, empty_sf_dir).collect()
    assert len(rows) == 1 and rows[0].n_true_pairs == 0
    assert rows[0].recall == 1.0 and rows[0].candidate_precision == 1.0


@pytest.mark.slow
def test_semdedup_pair_volume_tracks_cluster_size(spark):
    """SemDeDup's cluster-count contract (round-4 verdict item 3): the
    within-cluster pair join is quadratic in CLUSTER size, so sizing k
    with ``semdedup_k`` (constant expected cluster size) must keep pair
    volume LINEAR in corpus size, while a fixed k goes quadratic.

    Doubling the sf0.01 embeddings corpus (measured: 500 → 1000 vectors):
    pair volume grows 2.04× with scaled k vs 4.02× with fixed k. Bounds
    carry slack for cluster-balance drift, but a quadratic scaled-k path
    (4×) or a linear fixed-k path (2×) fails loudly.
    """
    from ethical_data_ingestion_spark.queries.corpus_q import (
        _kmeans_assignments,
        semdedup_k,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "label", "embedding"
    )
    n = emb.count()
    target = 64

    def pair_volume(e, k):
        sizes = (
            _kmeans_assignments(e, k=k)
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return sum(r.c * (r.c - 1) // 2 for r in sizes)

    pv1 = pair_volume(emb, semdedup_k(n, target))
    # contract: Σ nᵢ(nᵢ-1)/2 ≈ n·target/2, bounded with skew slack
    assert pv1 <= 3 * n * target

    doubled = emb.unionByName(
        emb.select((F.col("vec_id") + n).alias("vec_id"), "label", "embedding")
    )
    pv_scaled = pair_volume(doubled, semdedup_k(2 * n, target))
    pv_fixed = pair_volume(doubled, semdedup_k(n, target))
    assert pv_scaled / pv1 <= 2.8, "scaled-k pair volume is not linear"
    assert pv_fixed / pv1 >= 3.4, (
        "fixed-k should be the quadratic control; if this dropped, the "
        "clustering changed and the bounds need re-measuring"
    )


def test_semdedup_stats_pairs_equal_cluster_size_formula(spark, sf_dir):
    """Structural bucketed-not-all-pairs check on the REGISTERED panel:
    pairs scored must equal Σ nᵢ(nᵢ-1)/2 over its own cluster sizes."""
    from ethical_data_ingestion_spark.registry import QUERIES

    rows = QUERIES["semantic_dedup_stats"](spark, sf_dir).collect()
    assert rows
    assert sum(r.n_pairs for r in rows) == sum(
        r.n_points * (r.n_points - 1) // 2 for r in rows
    )


def test_late_round6_panels_on_empty_tables(spark, empty_sf_dir):
    from ethical_data_ingestion_spark.registry import QUERIES

    for name in (
        "unimax_allocation_stats",
        "zipf_fit_stats",
        "source_vocab_affinity",
        "embedding_dim_ablation",
        "kcenter_coreset_stats",
        "knn_label_accuracy",
    ):
        rows = QUERIES[name](spark, empty_sf_dir).collect()
        assert rows == [], f"{name} on empty input returned {rows[:3]}"
    # the sweep keeps its 5 threshold rows with zero counts — its
    # designed empty shape (a dashboard wants the axis even when the
    # corpus is empty)
    rows = QUERIES["dedup_threshold_sweep"](spark, empty_sf_dir).collect()
    assert len(rows) == 5
    assert all(r.n_pairs == 0 and r.n_docs_flagged == 0 for r in rows)
