"""Invariant tests for the round-6 batch-4 panels (char entropy,
near-dup source matrix, Merkle shard manifest, growth accounting) —
properties the hash gate can't express: bounds, conservation, integrity
sensitivity, and the growth identity active = new + retained + resurrected."""

from __future__ import annotations

import math

from ethical_data_ingestion_spark.registry import QUERIES, _load_everything

_load_everything()

from ethical_data_ingestion_spark.io import load_table  # noqa: E402


def test_char_entropy_bounded_by_log_alphabet(spark, sf_dir):
    rows = QUERIES["char_entropy_stats"](spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r.n_docs for r in rows) == n_docs
    # entropy of a char distribution over an ASCII-ish alphabet is
    # bounded by ln(128); bits = nats / ln 2 up to panel rounding.
    for r in rows:
        assert 0.0 <= r.min_entropy <= r.avg_entropy <= r.max_entropy
        assert r.max_entropy <= math.log(128.0)
        assert abs(r.avg_bits_per_char - r.avg_entropy / math.log(2)) < 1e-4


def test_neardup_source_matrix_is_canonical_and_bounded(spark, sf_dir):
    rows = QUERIES["neardup_source_matrix"](spark, sf_dir).collect()
    assert rows  # the fixture plants near-dups at every SF
    pair_total = QUERIES["dedup_jaccard_pairs"](spark, sf_dir).count()
    assert sum(r.n_pairs for r in rows) == pair_total
    for r in rows:
        assert r.src_a <= r.src_b  # unordered pair canonicalization
        assert 0.8 <= r.avg_jaccard <= r.max_jaccard <= 1.0


def test_merkle_manifest_root_is_shared_and_content_sensitive(
    spark, sf_dir, tmp_path
):
    rows = QUERIES["shard_merkle_manifest"](spark, sf_dir).collect()
    assert [r.shard for r in rows] == list(range(16))
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    roots = {r.root_hash for r in rows}
    assert len(roots) == 1  # one corpus fingerprint on every row
    assert len({r.shard_hash for r in rows}) == 16  # shards all differ
    # integrity: flipping ONE document's text must change that shard's
    # hash and the root, and leave the other 15 shard hashes intact.
    from pyspark.sql import functions as F

    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    out = str(tmp_path / "documents.parquet")
    mutated.coalesce(1).write.mode("overwrite").parquet(out)
    import shutil

    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        if t != "documents":
            src = f"{sf_dir}/{t}.parquet"
            dst = str(tmp_path / f"{t}.parquet")
            try:
                shutil.copytree(src, dst)
            except NotADirectoryError:
                shutil.copy(src, dst)
    rows2 = QUERIES["shard_merkle_manifest"](spark, str(tmp_path)).collect()
    h1 = {r.shard: r.shard_hash for r in rows}
    h2 = {r.shard: r.shard_hash for r in rows2}
    assert h2[0] != h1[0]
    assert all(h2[s] == h1[s] for s in range(1, 16))
    assert rows2[0].root_hash != rows[0].root_hash


def test_growth_accounting_identity_and_churn_conservation(spark, sf_dir):
    rows = QUERIES["growth_accounting_stats"](spark, sf_dir).collect()
    assert rows
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_new for r in rows) == n_users  # each user new once
    by_day = {r.day: r for r in rows}
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
    # churned(d) = active(d-1) - retained(d) whenever d-1 is in the table
    days = sorted(by_day)
    for a, b in zip(days, days[1:]):
        if (b - a).days == 1:
            assert by_day[b].n_churned == by_day[a].n_active - by_day[b].n_retained


def test_degree_distribution_conserves_nodes_and_edges(spark, sf_dir):
    rows = QUERIES["degree_distribution_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # bucket b holds degrees in [2^b, 2^(b+1))
        assert 2**r.bucket <= r.min_deg <= r.max_deg < 2 ** (r.bucket + 1)
        assert r.node_type in ("customer", "supplier")
    # undirected doubling: each side sees every edge once, so the two
    # sides' degree sums are equal (= |edges0|)
    by_type = {}
    for r in rows:
        by_type.setdefault(r.node_type, []).append(r)
    sums = {t: sum(r.sum_deg for r in rs) for t, rs in by_type.items()}
    assert sums["customer"] == sums["supplier"]
    for t, rs in by_type.items():
        assert abs(sum(r.pct_nodes for r in rs) - 1.0) < 1e-3


def test_split_leakage_categories_complete_and_conserve_pairs(spark, sf_dir):
    rows = QUERIES["split_leakage_audit"](spark, sf_dir).collect()
    assert [r.split_pair for r in rows] == [
        "test-test", "test-train", "train-train",
    ]
    total = QUERIES["dedup_jaccard_pairs"](spark, sf_dir).count()
    assert sum(r.n_pairs for r in rows) == total
    for r in rows:
        if r.n_pairs == 0:
            assert r.avg_jaccard is None
        else:
            assert 0.8 <= r.avg_jaccard <= 1.0


def test_embedding_outliers_match_chi2_expectation(spark, sf_dir):
    rows = QUERIES["embedding_outlier_stats"](spark, sf_dir).collect()
    assert len(rows) == 10  # one row per label
    from ethical_data_ingestion_spark.io import load_table

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == n_vecs
    for r in rows:
        # diagonal Mahalanobis over 64 standardized dims: E[m2] = 64
        assert 40.0 < r.avg_m2 < 90.0, r
        assert r.max_m2 >= r.avg_m2
        assert 0.0 <= r.pct_outlier <= 0.25
    # global standardization: overall mean m2 = 64 exactly (up to rounding)
    overall = sum(r.avg_m2 * r.n_vecs for r in rows) / n_vecs
    assert abs(overall - 64.0) < 0.01


def test_hhi_bounds_and_share_consistency(spark, sf_dir):
    rows = QUERIES["market_concentration_hhi"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI in (10000/n, 10000]; a single-supplier nation is 10000
        assert 10000.0 / r.n_suppliers <= r.hhi + 1e-6, r
        assert r.hhi <= 10000.0 + 1e-6
        # top share bounds: at least 1/n, and hhi >= top_share^2
        assert r.top_share >= 1.0 / r.n_suppliers - 1e-9
        assert r.hhi >= (r.top_share**2) * 10000.0 - 0.02


def test_position_attribution_conserves_purchase_value(spark, sf_dir):
    rows = QUERIES["attribution_position_based"](spark, sf_dir).collect()
    assert rows
    from ethical_data_ingestion_spark.io import load_table
    from pyspark.sql import functions as F

    truth = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("t"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    total = sum(r.attributed_value for r in rows)
    # credits conserve value up to the round-4 per-credit quantization
    n_purchases = truth.n
    assert abs(total - float(truth.t)) <= 0.0005 * n_purchases * 3
    assert abs(sum(r.value_share for r in rows) - 1.0) < 1e-3
    # last-touch and U-shaped must agree on the total, not the split
    lt = QUERIES["attribution_last_touch"](spark, sf_dir).collect()
    assert abs(sum(r.attributed_value for r in lt) - float(truth.t)) < 0.01


def test_lang_independence_chi2_nonnegative_and_df_sane(spark, sf_dir):
    rows = QUERIES["lang_source_independence"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.chi2 >= 0.0
        assert r.skewed_p01 == (r.chi2 > 13.277)


def test_pca_loadings_are_unit_norm_and_var_share_sane(spark, sf_dir):
    rows = QUERIES["pca_power_iteration_stats"](spark, sf_dir).collect()
    assert len(rows) == 8
    lam = {r.eigenvalue for r in rows}
    assert len(lam) == 1  # one eigenvalue estimate on every row
    for r in rows:
        assert abs(r.loading) <= 1.0 + 1e-6
        assert 0.0 < r.var_share <= 1.0
    # top-8 of a unit vector: their mass can't exceed 1
    assert sum(r.loading**2 for r in rows) <= 1.0 + 1e-6
    # eigenvalue >= trace/64 (top eigenvalue >= average eigenvalue)
    lam_v = rows[0].eigenvalue
    trace = lam_v / rows[0].var_share
    assert lam_v >= trace / 64.0 - 1e-6


def test_cohort_ltv_is_monotone_in_age(spark, sf_dir):
    rows = QUERIES["cohort_ltv_curve"](spark, sf_dir).collect()
    assert rows
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_week].append(r)
        assert r.n_active <= r.cohort_size
    for cw, rs in by_cohort.items():
        ages = [r.age_weeks for r in rs]
        assert ages == sorted(ages)
        cums = [r.cum_revenue for r in rs]
        assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
        last = rs[-1]
        assert abs(last.ltv_per_user - last.cum_revenue / last.cohort_size) < 1e-3


def test_bootstrap_se_matches_analytic_on_light_tails(spark, sf_dir):
    rows = QUERIES["bootstrap_ci_mean"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.se_analytic > 0 and r.se_bootstrap > 0
        # uniform-ish fixture values: the two SEs must agree within 40%
        # (B=32 resamples give a chi2(31)-noisy SE estimate)
        assert 0.6 < r.se_bootstrap / r.se_analytic < 1.67, r


def test_conversion_latency_buckets_partition_conversions(spark, sf_dir):
    rows = QUERIES["conversion_latency_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 2**r.bucket <= max(r.min_sec, 1) or r.bucket == 0
        assert r.min_sec <= r.avg_sec <= r.max_sec
        if r.bucket > 0:
            assert 2**r.bucket <= r.min_sec
        assert r.max_sec < 2 ** (r.bucket + 1)
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3


def test_seasonal_decompose_sums_to_zero_and_strength_bounded(spark, sf_dir):
    rows = QUERIES["seasonal_decompose_stats"](spark, sf_dir).collect()
    assert len(rows) == 7
    # additive seasonal factors weighted by day counts sum to ~0
    weighted = sum(r.seasonal * r.n_days for r in rows)
    n_days = sum(r.n_days for r in rows)
    assert abs(weighted / n_days) < 1.0  # detrended mean is near zero
    strengths = {r.seasonal_strength for r in rows}
    assert len(strengths) == 1
    s = rows[0].seasonal_strength
    assert s is None or 0.0 <= s <= 1.0


def test_kfold_assignment_is_balanced_and_disjoint(spark, sf_dir):
    rows = QUERIES["kfold_balance_audit"](spark, sf_dir).collect()
    assert [r.fold for r in rows] == list(range(5))
    from ethical_data_ingestion_spark.io import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0.5 < r.size_ratio < 1.5  # no pathological fold
        assert 1 <= r.n_langs <= 5


def test_deletion_cascade_conserves_rows_and_cohort(spark, sf_dir):
    rows = QUERIES["deletion_cascade_audit"](spark, sf_dir).collect()
    assert len(rows) == 5
    from ethical_data_ingestion_spark.io import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_rows for r in rows) == ev.count()
    for r in rows:
        assert 0 <= r.n_delete <= r.n_rows
        assert r.value_at_risk >= 0.0
    # the cohort's overall row share tracks its user share loosely
    total_share = sum(r.n_delete for r in rows) / sum(r.n_rows for r in rows)
    assert 0.0 <= total_share < 0.25


def test_generalization_curve_is_monotone_in_band_width(spark, sf_dir):
    rows = QUERIES["generalization_tradeoff_curve"](spark, sf_dir).collect()
    assert [r.band_width for r in rows] == [500, 1000, 2000, 4000]
    total_rows = None
    for r in rows:
        t = round(r.avg_class_size * r.n_classes)
        total_rows = total_rows or t
        assert abs(t - total_rows) <= 1  # every width covers all rows
    # coarser bands -> fewer classes and (weakly) larger k_min
    ncls = [r.n_classes for r in rows]
    assert ncls == sorted(ncls, reverse=True)
    kmins = [r.k_min for r in rows]
    assert all(b >= a for a, b in zip(kmins, kmins[1:]))
    smalls = [r.pct_rows_small for r in rows]
    assert all(b <= a + 1e-9 for a, b in zip(smalls, smalls[1:]))


def test_freshness_lag_has_one_current_feed(spark, sf_dir):
    rows = QUERIES["freshness_lag_audit"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert min(r.lag_sec for r in rows) == 0  # someone defines the anchor
    for r in rows:
        assert r.lag_sec >= 0
        assert r.sla_breach == (r.lag_sec > 6 * 3600)


def test_dp_utility_curve_noise_scales_inversely_with_eps(spark, sf_dir):
    rows = QUERIES["dp_epsilon_utility_curve"](spark, sf_dir).collect()
    assert [r.eps for r in rows] == [0.25, 0.5, 1.0, 2.0]
    noises = [r.avg_abs_noise for r in rows]
    # E|Laplace(b)| = b = 1/eps: average noise must fall as eps grows
    assert noises == sorted(noises, reverse=True)
    for r in rows:
        assert r.max_abs_noise >= r.avg_abs_noise
        assert 0 <= r.n_within <= r.n_cells
        assert r.rel_err > 0


def test_pmi_topk_is_sorted_and_min_count_respected(spark, sf_dir):
    rows = QUERIES["collocation_pmi_topk"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    for r in rows:
        assert r.n_pair >= 5


def test_mad_anomaly_zscores_are_centered(spark, sf_dir):
    rows = QUERIES["mad_anomaly_days"](spark, sf_dir).collect()
    assert len(rows) == 30
    zs = [r.robust_z for r in rows if r.robust_z is not None]
    assert zs
    # median day has z = 0; half the days sit on each side
    n_neg = sum(1 for z in zs if z < 0)
    n_pos = sum(1 for z in zs if z > 0)
    assert abs(n_neg - n_pos) <= 2
    for r in rows:
        if r.robust_z is not None:
            assert r.is_anomaly == (abs(r.robust_z) > 3.5)


def test_stationary_dist_is_a_distribution_near_observed(spark, sf_dir):
    rows = QUERIES["markov_stationary_dist"](spark, sf_dir).collect()
    assert len(rows) == 5
    s = sum(r.stationary_p for r in rows)
    assert abs(s - 1.0) < 1e-3  # power iteration preserves total mass
    o = sum(r.observed_share for r in rows)
    assert abs(o - 1.0) < 1e-3
    for r in rows:
        assert 0.0 < r.stationary_p < 1.0
        assert abs(r.gap - (r.stationary_p - r.observed_share)) < 1e-5
        # uniform-ish fixture chain: stationary within 10pp of marginal
        assert abs(r.gap) < 0.1


def test_quality_venn_cells_partition_corpus(spark, sf_dir):
    rows = QUERIES["quality_screen_venn"](spark, sf_dir).collect()
    from ethical_data_ingestion_spark.io import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    lowq = sum(r.n_docs for r in rows if r.low_quality)
    # bottom quartile by construction
    assert abs(lowq - n_docs // 4) <= 1
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3


def test_ivf_sweep_recall_and_cost_are_monotone(spark, sf_dir):
    rows = QUERIES["ivf_nprobe_sweep"](spark, sf_dir).collect()
    assert [r.nprobe for r in rows] == [1, 2, 4, 8]
    recalls = [r.recall_at10 for r in rows]
    scans = [r.scan_frac for r in rows]
    # probing more cells can only add candidates
    assert all(b >= a - 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert all(b >= a - 1e-9 for a, b in zip(scans, scans[1:]))
    for r in rows:
        assert 0.0 <= r.recall_at10 <= 1.0
        assert 0.0 < r.scan_frac <= 1.0
    # probing half the cells must capture a majority of true neighbors
    assert rows[-1].recall_at10 >= 0.5


def test_bigram_entropy_below_order0_and_gain_bounded(spark, sf_dir):
    rows = QUERIES["char_bigram_entropy_stats"](spark, sf_dir).collect()
    assert len(rows) == 20
    import math

    for r in rows:
        # conditioning never increases entropy
        assert 0.0 < r.h_order1 <= r.h_order0 + 1e-9
        assert 0.0 <= r.predictability_gain < 1.0
        assert abs(r.bits_per_char_o1 - r.h_order1 / math.log(2)) < 1e-4


def test_screen_mi_cells_partition_and_redundancy_bounded(spark, sf_dir):
    rows = QUERIES["screen_mutual_information"](spark, sf_dir).collect()
    assert len(rows) == 16  # full 4x4 grid on this fixture
    from ethical_data_ingestion_spark.io import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    mis = {r.mi_bits for r in rows}
    assert len(mis) == 1
    mi = rows[0].mi_bits
    assert -1e-6 <= mi <= 2.0 + 1e-6  # MI <= H(quality) = log2(4)
    assert -1e-6 <= rows[0].redundancy <= 1.0 + 1e-6


def test_quantization_sweep_quality_rises_with_bits(spark, sf_dir):
    rows = QUERIES["quantization_bits_sweep"](spark, sf_dir).collect()
    assert rows  # 2-bit row may legitimately vanish (all-zero vectors)
    bits = [r.bits for r in rows]
    assert bits == sorted(bits)
    mses = [r.mse for r in rows]
    assert mses == sorted(mses, reverse=True)  # more bits, less error
    coss = [r.avg_cos for r in rows]
    assert coss == sorted(coss)
    last = rows[-1]
    assert last.bits == 8 and last.avg_cos > 0.99 and last.mse < 1e-4
    for r in rows:
        assert r.min_cos <= r.avg_cos <= 1.0 + 1e-9


def test_leadtime_ols_is_flat_on_uniform_fixture(spark, sf_dir):
    rows = QUERIES["leadtime_quantity_ols"](spark, sf_dir).collect()
    assert len(rows) == 5  # one row per order priority
    for r in rows:
        assert r.n_items > 0
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        # quantity explains ~nothing of the latency variance (r2 is the
        # scale-free check; raw slope is noisy at tiny SFs)
        assert r.r2 < 0.05
        assert r.avg_ship_days > 0
