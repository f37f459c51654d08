"""Invariant tests for the round-6 batch-3 panels (ACF, temperature
sampling, KMV sketch, n-gram novelty, t-closeness) — properties the hash
gate can't express: bounds, conservation, monotonicity, sketch accuracy."""

from __future__ import annotations

from collections import defaultdict

from ethical_data_ingestion_spark.registry import QUERIES, _load_everything

_load_everything()

from ethical_data_ingestion_spark.queries.strings_q import _KMV_K  # noqa: E402
from ethical_data_ingestion_spark.queries.timeseries_q import (  # noqa: E402
    _ACF_MAX_LAG,
)


def test_acf_is_bounded_and_pairs_shrink_with_lag(spark, sf_dir):
    rows = QUERIES["acf_daily_stats"](spark, sf_dir).collect()
    assert [r.lag for r in rows] == list(range(1, _ACF_MAX_LAG + 1))
    n_days = rows[0].n_pairs + 1  # lag-1 join has n-1 pairs
    for r in rows:
        # Cauchy-Schwarz: |r(l)| <= 1 up to the 6-dp rounding of the panel
        assert abs(r.acf) <= 1.0 + 1e-6, r
        assert r.n_pairs == n_days - r.lag, r


def test_temperature_sampling_flattens_toward_uniform(spark, sf_dir):
    rows = QUERIES["temperature_sampling_stats"](spark, sf_dir).collect()
    assert rows
    by_alpha = defaultdict(list)
    for r in rows:
        by_alpha[r.alpha].append(r)
    assert set(by_alpha) == {0.25, 0.5, 0.75, 1.0}
    for alpha, grp in by_alpha.items():
        # probabilities conserve (up to per-row 6-dp rounding)
        assert abs(sum(r.p_sampled for r in grp) - 1.0) < 1e-4, alpha
        assert abs(
            sum(r.expected_tokens for r in grp)
            - sum(r.expected_tokens for r in by_alpha[1.0])
        ) < 1.0
        for r in grp:
            assert r.p_sampled > 0 and r.p_raw > 0
    # alpha=1 is natural sampling: boost == 1 for every language
    for r in by_alpha[1.0]:
        assert abs(r.boost - 1.0) < 1e-3, r
    # flattening: the LARGEST language's share shrinks monotonically as
    # alpha drops; the SMALLEST language's boost grows
    big = {a: max(g, key=lambda r: r.n_tokens) for a, g in by_alpha.items()}
    small = {a: min(g, key=lambda r: r.n_tokens) for a, g in by_alpha.items()}
    alphas = sorted(by_alpha)
    for lo, hi in zip(alphas, alphas[1:]):
        assert big[lo].p_sampled <= big[hi].p_sampled + 1e-9
        assert small[lo].boost >= small[hi].boost - 1e-9


def test_kmv_estimate_lands_within_sketch_error(spark, sf_dir):
    rows = QUERIES["kmv_distinct_stats"](spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        assert r.nd_exact > 0
        assert r.kmv_est > 0
        if r.nd_exact <= _KMV_K:
            # sketch holds the whole (hashed) value set: exact modulo
            # 48-bit hash collisions, which are ~0 at fixture scale
            assert r.rel_err < 1e-3, r
        else:
            # ~3.5 sigma at sigma ~= 1/sqrt(k-2)
            assert r.rel_err < 0.22, r


def test_ngram_novelty_rates_are_bounded_and_docs_conserved(spark, sf_dir):
    rows = QUERIES["ngram_novelty_stats"](spark, sf_dir).collect()
    assert rows
    from ethical_data_ingestion_spark.io import load_table

    n_docs_total = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs_total
    for r in rows:
        for v in (
            r.avg_novelty,
            r.pct_fully_novel,
            r.pct_mostly_copied,
            r.gram_novel_rate,
        ):
            assert 0.0 <= v <= 1.0 + 1e-9, r
        # fully-novel docs have novelty 1, so the mean is at least the
        # fully-novel share (every other doc contributes >= 0)
        assert r.avg_novelty >= r.pct_fully_novel - 1e-6, r


def test_t_closeness_is_a_valid_emd_rollup(spark, sf_dir):
    rows = QUERIES["t_closeness_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_classes > 0
        # ordered-attribute EMD with the 1/(m-1) normalizer is in [0, 1]
        assert 0.0 <= r.t_avg <= r.t_max <= 1.0 + 1e-9, r
        assert 0.0 <= r.pct_over_t <= 1.0, r


def test_markov_entropy_is_bounded_by_branching(spark, sf_dir):
    rows = QUERIES["markov_entropy_stats"](spark, sf_dir).collect()
    assert rows
    import math

    for r in rows:
        assert r.n_trans > 0 and r.n_next_types > 0
        assert -1e-9 <= r.entropy_bits <= math.log2(r.n_next_types) + 1e-6
        if r.n_next_types > 1:
            assert 0.0 <= r.norm_entropy <= 1.0 + 1e-6, r
        else:
            assert r.norm_entropy is None


def test_sample_size_planner_margins_are_consistent(spark, sf_dir):
    rows = QUERIES["sample_size_planner"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_rows > 1 and r.sd_price > 0 and r.mean_price > 0
        assert r.n_req_1pct >= 1
        assert 0.0 < r.frac_needed <= 1.0
        # CV identity: margin at a 1% sample = cv * 1.96 / sqrt(0.01 n)
        cv = r.sd_price / r.mean_price
        import math

        expect = 1.96 * cv / math.sqrt(0.01 * r.n_rows)
        assert abs(r.margin_at_1pct - expect) < 5e-3, r


def test_imputation_audit_mask_is_unbiased_at_fixture_scale(spark, sf_dir):
    rows = QUERIES["imputation_audit"](spark, sf_dir).collect()
    assert rows
    n_masked = sum(r.n_masked for r in rows)
    n_rows = sum(r.n_rows for r in rows)
    # hash mask hits ~10% of orders
    assert 0.05 < n_masked / n_rows < 0.15
    for r in rows:
        assert 0 <= r.n_masked < r.n_rows
        if r.n_masked > 0:
            assert r.mae >= 0
            # hash-random missingness: imputation bias is small relative
            # to the stratum mean (loose 3-sigma-ish fixture bound)
            assert abs(r.rel_bias) < 0.25, r


def test_embedding_dim_variance_shares_are_a_valid_topk(spark, sf_dir):
    rows = QUERIES["embedding_dim_variance_stats"](spark, sf_dir).collect()
    assert len(rows) == 8
    prev = None
    cum = 0.0
    for r in rows:
        assert r.variance > 0
        if prev is not None:
            assert r.variance <= prev + 1e-9  # sorted descending
        prev = r.variance
        cum += r.var_share
        assert abs(r.cum_share - cum) < 1e-4
        assert 0.0 < r.var_share <= 1.0
    assert rows[-1].cum_share <= 1.0 + 1e-6


def test_burstiness_is_bounded_and_tiers_partition_users(spark, sf_dir):
    rows = QUERIES["interevent_burstiness_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_users > 0 and r.n_intervals >= 2 * r.n_users
        assert -1.0 - 1e-9 <= r.avg_burstiness <= 1.0 + 1e-9, r
        assert r.avg_gap_sec > 0
        assert 0.0 <= r.pct_bursty <= 1.0
    from ethical_data_ingestion_spark.io import load_table

    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # every user has >= 3 events on the fixture, so tiers partition them
    assert sum(r.n_users for r in rows) == n_users


def test_gini_is_bounded_and_top_decile_dominates(spark, sf_dir):
    rows = QUERIES["revenue_gini_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_cust > 0
        if r.gini is not None:
            assert -1e-9 <= r.gini <= 1.0 + 1e-9, r
            # top decile holds at least its population share
            assert r.top10pct_share >= 0.1 - 1e-6, r
            assert r.top10pct_share <= 1.0 + 1e-9


def test_rfm_grid_is_a_partition_with_monotone_m_scores(spark, sf_dir):
    rows = QUERIES["rfm_segmentation"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5
        assert r.n_cust > 0
        assert 1.0 <= r.avg_m_score <= 5.0
    from ethical_data_ingestion_spark.io import load_table

    n_ordering = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_cust for r in rows) == n_ordering


def test_event_paths_are_a_topk_with_conserved_shares(spark, sf_dir):
    rows = QUERIES["event_path_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    prev = None
    for r in rows:
        assert r.path.count(">") == 2
        assert r.n > 0 and 0 < r.share <= 1.0
        if prev is not None:
            assert r.n <= prev
        prev = r.n
    # 5 event types -> at most 125 paths; top-20 should carry real mass
    assert sum(r.share for r in rows) > 0.15


def test_attribution_conserves_purchase_value(spark, sf_dir):
    rows = QUERIES["attribution_last_touch"](spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.value_share for r in rows) - 1.0) < 1e-4
    from ethical_data_ingestion_spark.io import load_table
    from pyspark.sql import functions as F

    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purchases
    # purchases never attribute to 'purchase' itself
    assert all(r.touch != "purchase" for r in rows)


def test_silhouette_is_bounded_and_points_conserved(spark, sf_dir):
    rows = QUERIES["kmeans_silhouette_stats"](spark, sf_dir).collect()
    assert rows
    from ethical_data_ingestion_spark.io import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_points for r in rows) == n_vecs
    for r in rows:
        # centroid-silhouette is in [-1, 1]; own-centroid assignment
        # makes a <= b, so the average is non-negative by construction
        assert -1e-9 <= r.avg_silhouette <= 1.0 + 1e-9, r
        assert r.pct_negative == 0.0, r
        assert r.avg_dist_own > 0


def test_quality_dup_lift_deciles_partition_and_cum_share_hits_one(
    spark, sf_dir
):
    rows = QUERIES["quality_vs_dup_lift"](spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    from ethical_data_ingestion_spark.io import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    prev_z = None
    for r in rows:
        assert 0.0 <= r.dup_rate <= 1.0
        if prev_z is not None:
            assert r.avg_z >= prev_z - 1e-9  # deciles ordered by z
        prev_z = r.avg_z
    if any(r.n_dup for r in rows):
        assert abs(rows[-1].cum_dup_share - 1.0) < 1e-9


def test_tfidf_keywords_are_per_source_topk(spark, sf_dir):
    rows = QUERIES["tfidf_source_keywords"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
        assert r.tf > 0 and r.df > 0 and r.tfidf > 0
    for src, grp in by_src.items():
        assert len(grp) <= 3
        scores = [r.tfidf for r in grp]
        assert scores == sorted(scores, reverse=True), src


def test_traffic_heatmap_cells_conserve_events(spark, sf_dir):
    rows = QUERIES["traffic_heatmap_stats"](spark, sf_dir).collect()
    assert rows
    from ethical_data_ingestion_spark.io import load_table

    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r.n for r in rows) == n_events
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert 0 <= r.dow <= 6 and 0 <= r.hr <= 23
