"""Unit tests for the round-4 widening queries (curation_q, strings_q):
invariants and edge cases the sf0.001 oracle gate can't pin by itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark.registry import QUERIES, _load_everything

_load_everything()


def test_kl_is_nonnegative_and_rolls_up_all_sources(spark, sf_dir):
    rows = QUERIES["unigram_kl_quality"](spark, sf_dir).collect()
    assert rows, "documents fixture has sources"
    for r in rows:
        # KL(p||q) >= 0 up to the per-term 1e-8 rounding; min over docs.
        assert r.min_kl >= -1e-4, r
        assert r.max_kl >= r.min_kl
        assert r.n_docs > 0


def test_topp_keeps_a_prefix_that_crosses_the_budget(spark, sf_dir):
    rows = QUERIES["source_topp_curation"](spark, sf_dir).collect()
    for r in rows:
        assert 0 < r.kept_docs <= r.total_docs
        assert 0 < r.kept_tokens <= r.total_tokens
        # the kept set must REACH the 60% budget (the crossing doc is in)
        assert r.kept_tokens / r.total_tokens >= 0.6 or (
            r.kept_docs == r.total_docs
        )


def test_transition_probs_sum_to_one_per_prev(spark, sf_dir):
    df = QUERIES["event_transition_matrix"](spark, sf_dir)
    sums = (
        df.groupBy("prev_type").agg(F.sum("p").alias("s")).collect()
    )
    for r in sums:
        assert abs(r.s - 1.0) < 0.01, r  # rounded-4 probs, |types| terms


def test_scd2_exactly_one_open_version_per_user(spark, sf_dir):
    rows = QUERIES["scd2_user_history_stats"](spark, sf_dir).collect()
    for r in rows:
        assert r.n_versions >= 1
        assert r.current_value is not None  # the open version exists
        if r.n_versions == 1:
            assert r.avg_days_between_versions is None  # NULLIF guard
        assert r.first_seen <= r.last_change


def test_fastss_neighborhood_join_equals_bruteforce(spark):
    # adversarial literals: empty-ish, 1-char, unicode, transposition
    names = ["ab", "abc", "abcd", "xbcd", "a", "b", "zzzz", "ábc"]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    got = {
        (r.name_a, r.name_b, r.ed)
        for r in QUERIES["editdist_name_pairs"](spark, d).collect()
    }
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(set(names)), 2)
        if lev(a, b) <= 2
    }
    assert got == want


def test_cms_never_undercounts(spark, sf_dir):
    rows = QUERIES["heavy_hitters_cms"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.cms_est >= r.freq  # CMS one-sided error guarantee
        assert r.overcount == r.cms_est - r.freq
    # w=16 < |vocab| forces at least one collision at fixture scale
    assert any(r.overcount > 0 for r in rows)


def test_hll_union_cardinality_merges_not_adds(spark, sf_dir):
    rows = {r.grp: r for r in QUERIES["hll_union_cardinality"](spark, sf_dir).collect()}
    union = rows.pop("__union__")
    # groups overlap on l_orderkey: union is a real set-union, far below
    # the arithmetic sum of per-group distincts
    assert union.n_orders_exact < sum(r.n_orders_exact for r in rows.values())
    assert union.n_rows == sum(r.n_rows for r in rows.values())
    for r in list(rows.values()) + [union]:
        assert r.hll_within_5pct


def test_hll_estimate_mode_stays_in_bounds_at_high_cardinality(spark):
    import pyspark.sql.functions as F

    # 200k distincts forces the sketch out of sparse mode into real
    # estimation; 5% (~3 sigma at lgK=12) must still hold
    est, exact = (
        spark.range(200_000)
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est"),
            F.countDistinct("id").alias("exact"),
        )
        .collect()[0]
    )
    assert abs(est - exact) <= 0.05 * exact


def test_dsir_selects_target_like_documents(spark, tmp_path):
    # target (en) vocabulary is disjoint from the background vocabulary;
    # a non-en doc written in target vocabulary must score positive
    # (selected), one in background vocabulary negative.
    # enough token mass that the +1-per-bucket smoothing (B=1024) doesn't
    # drown the count signal, as it would on a 30-token toy corpus
    tgt_text = " ".join(f"t{i % 30}" for i in range(600))
    bg_text = " ".join(f"g{i % 30}" for i in range(600))
    rows = [
        (0, tgt_text, "en", "srcA", 1),
        (1, tgt_text, "en", "srcA", 1),
        (2, tgt_text, "de", "srcB", 1),   # target-like impostor
        (3, bg_text, "de", "srcB", 1),    # background-like
        (4, bg_text, "fr", "srcC", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = {r.source: r for r in QUERIES["dsir_selection_stats"](spark, str(tmp_path)).collect()}
    assert out["srcA"].n_selected == 2          # target docs score high
    assert out["srcB"].n_selected == 1          # only the impostor
    assert out["srcC"].n_selected == 0
    assert out["srcB"].max_w > 0 > out["srcB"].min_w
