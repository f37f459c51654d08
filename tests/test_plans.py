"""Physical-plan guardrails: pushdown, pruning, broadcast joins, top-k,
shuffle counts — the properties that decide whether a plan survives 100 TB.

Results-correctness is covered by the oracle gate; these tests fail when a
change silently degrades the PLAN (filter stops reaching the scan, a
dimension join falls back to shuffle, a top-k becomes a global sort) even
though results stay right.
"""

from __future__ import annotations

from ethical_data_ingestion_spark import plans, registry


def _q(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir)


def test_flagship_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = _q(spark, sf_dir, "flagship_pricing_summary")
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pushed  # date predicate reached the parquet scan
    schemas = plans.read_schemas(df)
    assert len(schemas) == 1
    # 7 of lineitem's 16 columns — projection pruned the scan
    assert schemas[0].count(":") == 7
    assert "l_comment" not in schemas[0]


def test_selective_filter_fully_pushed(spark, sf_dir):
    df = _q(spark, sf_dir, "revenue_by_filter")
    pushed = " ".join(plans.pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed
    # single fact scan, zero joins: the only shuffle is the final 1-row agg
    assert plans.shuffle_count(df) <= 1


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    df = _q(spark, sf_dir, "regional_revenue")
    # all five dimension joins (orders/customer/supplier/nation/region)
    # must broadcast — a shuffle join on region at 100 TB is the outage
    assert plans.broadcast_join_count(df) >= 5
    assert "r_name" in " ".join(plans.pushed_filters(df))


def test_topk_queries_avoid_global_sort(spark, sf_dir):
    for name in ("search_ilike_topk", "top_unshipped_orders", "word_frequency_topk"):
        df = _q(spark, sf_dir, name)
        assert plans.uses_take_ordered(df), f"{name} lost TakeOrderedAndProject"


def test_wordcount_shuffles_vocabulary_not_corpus(spark, sf_dir):
    df = _q(spark, sf_dir, "word_frequency_topk")
    # explode → partial agg → single exchange on word → final agg → top-k
    assert plans.shuffle_count(df) == 1
    assert plans.read_schemas(df) == ["struct<text:string>"]


def test_tpch2_semi_join_stays_semi(spark, sf_dir):
    # Q4 shape: the EXISTS must plan as a LEFT SEMI join (each order
    # emitted at most once, no post-join distinct), with the orderdate
    # window pushed to the orders scan.
    df = _q(spark, sf_dir, "order_priority_wait")
    plan = plans.formatted_plan(df)
    assert "LeftSemi" in plan
    assert "o_orderdate" in " ".join(plans.pushed_filters(df))


def test_tpch2_dimensions_broadcast(spark, sf_dir):
    # Q7/Q10 shapes: every dimension path must broadcast — supplier,
    # customer, and both nation lookups on Q7; customer+nation on Q10.
    assert plans.broadcast_join_count(_q(spark, sf_dir, "bilateral_trade_volume")) >= 4
    df10 = _q(spark, sf_dir, "returned_items_customers")
    assert plans.broadcast_join_count(df10) >= 2
    assert plans.uses_take_ordered(df10)  # top-20, never a global sort
    # returnflag filter reaches the lineitem scan
    assert "l_returnflag" in " ".join(plans.pushed_filters(df10))


def test_tpch2_disjunction_prunes_both_scans(spark, sf_dir):
    # Q19 shape: the OR-of-conjunctions can't push per-branch, but the
    # derived hulls must reach both scans.
    df = _q(spark, sf_dir, "disjunctive_part_revenue")
    pushed = " ".join(plans.pushed_filters(df))
    assert "l_quantity" in pushed and "p_brand" in pushed


def test_aggregates_run_inside_codegen(spark, sf_dir):
    df = _q(spark, sf_dir, "flagship_pricing_summary")
    df.collect()  # AQE stamps codegen ids only on the finalized plan
    assert plans.wholestage_codegen_count(df) >= 1


def test_neardup_pairs_join_is_block_keyed(spark, sf_dir):
    # the embedding pair join must never be a row-level nested loop over
    # the full vector table: the only BroadcastNestedLoopJoin allowed is
    # the B-row block-grid pairing; vector data reaches Python once, via
    # the blocked-GEMM mapInPandas, and candidates re-join by id (hash).
    df = _q(spark, sf_dir, "embedding_neardup_pairs")
    plan = plans.formatted_plan(df)
    assert "MapInPandas" in plan  # GEMM tiles
    # candidate verify joins are equi-joins on id1/id2
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") >= 2


def test_product_quantization_broadcasts_codebook(spark, sf_dir):
    # the codebook side (M x K rows) must broadcast; the vector side must
    # stay un-shuffled until the per-subspace argmin aggregate
    df = _q(spark, sf_dir, "product_quantization_stats")
    assert plans.broadcast_join_count(df) >= 1


def test_sequence_packing_is_single_scan_single_agg(spark, sf_dir):
    df = _q(spark, sf_dir, "sequence_packing_stats")
    assert len(plans.read_schemas(df)) == 1
    # partial agg combines map-side; one exchange on source + final sort
    assert plans.shuffle_count(df) <= 2


def test_decontam_benchmark_set_broadcasts(spark, sf_dir):
    # the benchmark n-gram set is the SMALL side (an eval suite, not a
    # crawl): it must broadcast into the corpus-side semi-join — a
    # shuffle join on the shingle key at 100 TB re-shuffles the corpus
    df = _q(spark, sf_dir, "benchmark_decontam_stats")
    assert plans.broadcast_join_count(df) >= 1
    plan = plans.formatted_plan(df)
    assert "LeftSemi" in plan  # doc-level flag, never a row-multiplying join


def test_kmeans_assignment_broadcasts_centroids(spark, sf_dir):
    # both Lloyd assignments join the corpus against k=8 centroid rows;
    # each must be a broadcast (nested-loop over 8 rows), and the update
    # aggregate must be hash-keyed on (cid, dim) — no global exchange of
    # vector data
    df = _q(spark, sf_dir, "embedding_kmeans_stats")
    plan = plans.formatted_plan(df)
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2


def test_length_histogram_is_single_scan(spark, sf_dir):
    df = _q(spark, sf_dir, "doc_length_histogram")
    schemas = plans.read_schemas(df)
    assert len(schemas) == 1
    assert "n_chars" in schemas[0] and "text" not in schemas[0]  # pruned
    assert plans.shuffle_count(df) <= 2  # partial agg + order


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir):
    """Spark's runtime row-level filtering (the AQE bloom-filter rewrite)
    is the engine-native replacement for hand-built semi-join reductions:
    when a join can't broadcast, a bloom filter built from the SELECTIVE
    side's join keys is pushed into the other side's scan, pruning shuffle
    input. Fixture tables all broadcast (thresholds are sized for real
    clusters), so this test tunes the thresholds down to prove the rewrite
    fires on our star-join shape — the plan the 100-TB deployment gets
    when `orders` outgrows the broadcast threshold."""
    from pyspark.sql import functions as F

    from ethical_data_ingestion_spark.io import load_table

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "100MB",
        )
        lineitem = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        ).groupBy("o_orderpriority").count()
        assert plans.runtime_bloom_filter_count(joined) >= 1, (
            "runtime bloom filter did not inject; the 100-TB semi-join "
            "reduction path is broken:\n" + plans.simple_plan(joined)
        )
        # and correctness under the rewrite:
        rows = joined.collect()
        assert len(rows) == 1
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_round4_queries_keep_their_scale_shapes(spark, sf_dir):
    """Shuffle/broadcast pins for the round-4 families: a regression that
    adds an exchange (e.g. a countDistinct expand sneaking back into the
    k-anonymity audit) or drops a broadcast fails here even though results
    stay correct."""
    # (name, max shuffles, min broadcast joins)
    pins = [
        ("event_transition_matrix", 4, 0),  # user win + pair agg + prev win + sort
        ("source_topp_curation", 2, 0),     # one exchange on source + sort
        ("scd2_user_history_stats", 2, 0),  # user win reused by agg + sort
        ("heavy_hitters_cms", 3, 2),        # vocab agg; sketch + probes broadcast
        ("editdist_name_pairs", 3, 2),      # names agg + variant join + sort
        ("robust_value_stats", 4, 4),       # two ranking passes, medians broadcast
        ("k_anonymity_audit", 4, 0),        # two-level agg, NO countDistinct expand
        ("order_revenue_reconciliation", 4, 0),  # rollup + full-outer SMJ + agg + sort
        ("exact_order_percentiles", 2, 0),  # range exchange + tiny result sort
    ]
    for name, max_sh, min_bc in pins:
        df = _q(spark, sf_dir, name)
        sh = plans.shuffle_count(df)
        bc = plans.broadcast_join_count(df)
        assert sh <= max_sh, f"{name}: {sh} shuffles (max {max_sh})"
        assert bc >= min_bc, f"{name}: {bc} broadcasts (min {min_bc})"
    # the k-anonymity plan must not contain the distinct-expand operator
    prof = plans.formatted_plan(_q(spark, sf_dir, "k_anonymity_audit"))
    assert "Expand" not in prof


def test_session_new_queries_keep_their_scale_shapes(spark, sf_dir):
    """Plan pins for the span/bloom/sketch/curation/incremental additions:
    the properties that make each one survive 100x data."""
    # span overlap: the final top-25 must stay TakeOrderedAndProject, and
    # the match stage must be an equi-join (no cartesian anywhere)
    df = _q(spark, sf_dir, "ngram_span_overlap")
    assert plans.uses_take_ordered(df), "span top-k lost TakeOrderedAndProject"
    assert "Cartesian" not in plans.formatted_plan(df)

    # bloom decontam: the bitmap side must BROADCAST (constant-size filter
    # is the whole point) — never a shuffle join against the probe stream
    df = _q(spark, sf_dir, "bloom_decontam_stats")
    assert plans.broadcast_join_count(df) >= 1

    # DSIR: both bounded feature models join the corpus via broadcast
    df = _q(spark, sf_dir, "dsir_selection_stats")
    assert plans.broadcast_join_count(df) >= 2

    # semantic dedup: the pair stage is an equi-join ON cid — a cartesian
    # product here is the quadratic blowup the clustering exists to avoid
    df = _q(spark, sf_dir, "semantic_dedup_stats")
    assert "Cartesian" not in plans.formatted_plan(df)

    # hll union: the only corpus-scale exchange is the pair-table pin's
    # (a separate job, not in this plan); everything in the final action
    # aggregates the PINNED pair table, so its exchanges carry ~|orders|
    # partials down to 3-row/1-row tables. Round 6 fused the per-flag agg
    # into this plan (two actions total, was three): its exchange now
    # appears twice (once per consumer branch) plus the countDistinct
    # pass — 6 small exchanges, measured faster than the pinned shape
    # (1.27 → 0.94 s at sf0.1). Pin the count so an accidental SEVENTH
    # exchange (e.g. losing the map-side partial) still fails.
    df = _q(spark, sf_dir, "hll_union_cardinality")
    assert plans.shuffle_count(df) <= 6
    # and the input to every aggregation must be the pinned RDD scan, not
    # a re-read of the parquet source
    assert "Scan parquet" not in plans.formatted_plan(df)


def test_round5_queries_keep_their_scale_shapes(spark, sf_dir):
    """Plan pins for the round-5 additions."""
    # domain cap: the window partitions by source — no single-partition
    # global sort; the only wide ops are source-keyed
    df = _q(spark, sf_dir, "domain_cap_sampling")
    plan = plans.formatted_plan(df)
    assert "Cartesian" not in plan
    assert "partitionBy" not in plan or "source" in plan

    # padding audit: bucket-partitioned window only, map-side-combined agg
    df = _q(spark, sf_dir, "padding_efficiency_stats")
    assert "Cartesian" not in plans.formatted_plan(df)

    # ensemble: one projection + one rollup — no join at all
    df = _q(spark, sf_dir, "quality_filter_ensemble")
    plan = plans.formatted_plan(df)
    assert "Join" not in plan
    assert plans.shuffle_count(df) <= 2  # groupBy + final order

    # skew report: per-column aggs, never a join
    df = _q(spark, sf_dir, "join_skew_report")
    assert "Join" not in plans.formatted_plan(df)

    # corr matrix: ONE scan of lineitem (single-row agg, then explode)
    df = _q(spark, sf_dir, "corr_matrix_lineitem")
    assert len(plans.read_schemas(df)) == 1

    # diff: the full-outer join must move only (key, fingerprint) — the
    # text column is consumed by md5 inside the scan-side projection
    df = _q(spark, sf_dir, "dataset_diff_stats")
    plan = plans.formatted_plan(df)
    assert "FullOuter" in plan or "full_outer" in plan.lower()

    # chunk retrieval: query side broadcasts; no shuffled cartesian
    df = _q(spark, sf_dir, "chunk_embed_topk")
    assert plans.broadcast_join_count(df) >= 1


def test_round6_queries_keep_their_scale_shapes(spark, sf_dir):
    """Plan pins for the round-6 additions and rewrites."""
    # snapshot chain: pure scan-side expressions + conditional aggregates;
    # a join (or a per-version re-shuffle) appearing here means the
    # one-narrow-pass design regressed
    df = _q(spark, sf_dir, "dataset_snapshot_chain")
    plan = plans.formatted_plan(df)
    assert "Join" not in plan
    assert "Cartesian" not in plan

    # tier attribution: every pair source is bucketed candidate generation
    # — no cartesian anywhere in the union, components, or attribution
    df = _q(spark, sf_dir, "dedup_tier_attribution")
    assert "Cartesian" not in plans.formatted_plan(df)

    # simhash fold: signatures are one narrow pass — the signature side of
    # the block join must come from the pinned RDD (no explode + 32-way
    # groupBy re-derivation, and no re-read of the corpus parquet)
    df = _q(spark, sf_dir, "multimodal_neardup_simhash")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "Cartesian" not in plan

    # span islands: ONE pair-keyed exchange between the match join and the
    # top-k — the window + double-groupBy shape (two extra exchanges of
    # the full match-point stream) must not come back
    df = _q(spark, sf_dir, "ngram_span_overlap")
    assert plans.uses_take_ordered(df), "span top-k lost TakeOrderedAndProject"
    assert "Window" not in plans.formatted_plan(df)

    # shuffle audit: every window must be PARTITIONED (pid for the
    # prefix-offset ranking, source for the runs) — a bare global
    # row_number here is the single-partition funnel the prefix-offset
    # design exists to avoid
    df = _q(spark, sf_dir, "training_order_shuffle_stats")
    plan = plans.formatted_plan(df)
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.startswith(("pid", "source")), (
            f"unpartitioned window sneaked in: {spec[:80]}"
        )

    # drift monitor: component aggregation is hash-keyed on
    # (label, half, dim) — no vector-array column may cross a shuffle
    # (the explode projects components before any exchange)
    df = _q(spark, sf_dir, "embedding_drift_stats")
    plan = plans.formatted_plan(df)
    assert "Cartesian" not in plan
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in m.group(1) and " v#" not in m.group(1)


def test_round6_hygiene_panels_keep_their_scale_shapes(spark, sf_dir):
    """Plan pins for the round-6 hygiene panels (winnowing, PII scrub,
    semantic decontam, tokenizer fertility)."""
    # winnowing: fingerprint selection is pinned (no re-derivation of the
    # md5 k-gram chain per join side — no parquet re-scan), candidates are
    # an fp equi-join (never cartesian)
    df = _q(spark, sf_dir, "winnowing_overlap_pairs")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "Cartesian" not in plan

    # PII scrub: ONE linear scan — counts and redaction in the same
    # projection, no join, only the per-source rollup + order exchanges
    df = _q(spark, sf_dir, "pii_scrub_stats")
    plan = plans.formatted_plan(df)
    assert "Join" not in plan
    assert plans.shuffle_count(df) <= 2

    # semantic decontam: the benchmark shard is a broadcast LITERAL inside
    # a codegen fold — after the pinned train projection there is no join
    # of any kind and only the rollup + order exchanges
    df = _q(spark, sf_dir, "semantic_decontam_stats")
    plan = plans.formatted_plan(df)
    assert "Join" not in plan
    assert "Cartesian" not in plan
    assert plans.shuffle_count(df) <= 2

    # tokenizer fertility: one scan, one per-lang rollup
    df = _q(spark, sf_dir, "tokenizer_fertility_stats")
    plan = plans.formatted_plan(df)
    assert "Join" not in plan
    assert plans.shuffle_count(df) <= 2


def test_round6_late_panels_keep_their_scale_shapes(spark, sf_dir):
    """Plan pins for the late-round-6 additions (UniMax allocation, Zipf
    fit, source affinity, dim ablation)."""
    import re

    # unimax: the allocation table is pinned — no consumer re-scans the
    # corpus, and the totals/cap-mass joins are broadcast (never cartesian)
    df = _q(spark, sf_dir, "unimax_allocation_stats")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan

    # zipf: the (lang, word) type table is pinned (one corpus scan for
    # both the totals and the fit) and every window is partitioned by lang
    df = _q(spark, sf_dir, "zipf_fit_stats")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.startswith("lang"), f"unpartitioned window: {spec[:80]}"

    # affinity: the distinct (source, word) table is pinned (one corpus
    # scan feeds sizes and both join sides); pair candidates come from the
    # word equi-join — a cartesian here means the join key was lost
    df = _q(spark, sf_dir, "source_vocab_affinity")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan

    # ablation: the top-k table is pinned — the full-dim reference branch
    # must not re-score the probe x base grid; the recall join broadcasts
    df = _q(spark, sf_dir, "embedding_dim_ablation")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_continuation4_arrow_paths_keep_their_shapes(spark, sf_dir):
    """Plan pins for the continuation-4 Arrow rewrites: the expensive
    stage must be the single mapInPandas pass (no exploded row blowup
    re-entering the plan) and no cartesian anywhere."""
    # pca: gram comes from the per-partition GEMM — one MapInPandas,
    # no vec_id self-join (the 20M-term shape this replaced)
    df = _q(spark, sf_dir, "pca_power_iteration_stats")
    plan = plans.formatted_plan(df)
    assert "MapInPandas" not in plan  # gram is pinned; plan reads the pin
    assert "CartesianProduct" not in plan

    # bootstrap: partials come from one MapInPandas over the raw events
    # projection — the 3.2M-row explode/CASE pipeline must stay gone
    df = _q(spark, sf_dir, "bootstrap_ci_mean")
    plan = plans.formatted_plan(df)
    assert "MapInPandas" in plan
    assert "Generate explode" not in plan
    assert "CartesianProduct" not in plan

    # merkle manifest: two-level chaining — the root fan-in is a
    # broadcast, not a shuffle of row hashes
    df = _q(spark, sf_dir, "shard_merkle_manifest")
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_triangle_degree_join_has_no_forced_broadcast(spark, sf_dir):
    """Round-6 verdict item 3: the degree table in the triangle
    orientation is O(|V|) — a MANDATORY build-side there OOMs executors
    at a web-scale graph. The orientation subplan must carry no broadcast
    hint (AQE may still choose broadcast at runtime from measured sizes —
    that's the point); the 1-row aggregate broadcasts live outside this
    subplan."""
    from ethical_data_ingestion_spark.queries import graph_q

    edges, deg = graph_q._copurchase_edges_and_degrees(spark, sf_dir)
    oriented = graph_q._degree_oriented(edges, deg)
    logical = oriented._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical
    # the degree joins are still equi-joins on the node key (shuffle-able
    # co-partitioned at scale) — a lost key would plan a cartesian
    assert "Join Inner" in logical or "Join UsingJoin" in logical
    assert "Cartesian" not in logical


def test_round7_queries_keep_their_scale_shapes(spark, sf_dir):
    """Plan pins for the round-7 additions."""
    import re

    # BPE trainer: after the vocabulary collapse every round reads pinned
    # segmentations — the corpus parquet is scanned zero times in the
    # final plan (pins), and nothing cartesians on data (the only
    # crossJoin is the 1-row argmax broadcast)
    df = _q(spark, sf_dir, "bpe_training_rounds")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "CartesianProduct" not in plan

    # suffix doubling: every window is doc-partitioned (no corpus-wide
    # WindowExec), no join anywhere in the profile
    df = _q(spark, sf_dir, "suffix_doubling_profile")
    plan = plans.formatted_plan(df)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.startswith("doc_id"), f"unpartitioned window: {spec[:80]}"
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan

    # CDC ledger: vector bytes reach Python exactly once (one
    # ArrowEvalPython/MapInPandas pass), no cartesian
    df = _q(spark, sf_dir, "multimodal_cdc_stats")
    plan = plans.formatted_plan(df)
    assert "MapInPandas" not in plan  # chunk table pinned: UDF ran once at pin time
    assert "CartesianProduct" not in plan

    # JS divergence: the only join over words is the equi-join on the
    # pinned (source, word) table — a cartesian means the key was lost
    df = _q(spark, sf_dir, "source_divergence_matrix")
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "Scan parquet" not in plan  # pinned vocab, no corpus re-scan

    # band sweep: one self-equi-join keyed on (geometry, band, key);
    # the only crossJoin is the 1-row truth-count broadcast
    df = _q(spark, sf_dir, "minhash_band_sweep")
    plan = plans.formatted_plan(df)
    assert "CartesianProduct" not in plan


def test_round8_plan_pins(spark, sf_dir):
    """Round-8 operators: no cartesian anywhere; SNM's rank windows are
    pid-partitioned (TeraSort, never a global window); MMR's windows are
    query-partitioned; the modularity panel joins only on equi-keys."""
    import re

    for name in (
        "incremental_ann_stats",
        "sorted_neighborhood_stats",
        "mmr_diversified_topk",
        "community_modularity_stats",
        "label_propagation_communities",
    ):
        df = _q(spark, sf_dir, name)
        plan = plans.formatted_plan(df)
        assert "CartesianProduct" not in plan, name

    snm = plans.formatted_plan(_q(spark, sf_dir, "sorted_neighborhood_stats"))
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", snm):
        assert spec.startswith("pid"), f"non-TeraSort window: {spec[:80]}"

    mmr = plans.formatted_plan(_q(spark, sf_dir, "mmr_diversified_topk"))
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", mmr):
        assert spec.startswith("query_id"), f"unpartitioned window: {spec[:80]}"


def test_round9_emit_plan_pins(spark, sf_dir):
    """The corpus emits must stay window-free linear assemblies: survivor
    election is a groupBy argmax (no window over cluster members), the
    decontam probe side is a broadcast semi-join, and nothing goes
    cartesian."""
    for name in ("neardup_emit", "corpus_curation_emit"):
        df = _q(spark, sf_dir, name)
        plan = plans.formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        assert "Window" not in plan, f"{name}: window crept into the assembly"

    cce = plans.formatted_plan(_q(spark, sf_dir, "corpus_curation_emit"))
    assert "BroadcastHashJoin" in cce  # benchmark 8-gram set stays broadcast


def test_hybrid_serving_plan_shape(spark):
    """The round-11 hybrid serving rebuild, pinned: each retriever side
    runs on at most TWO shuffle exchanges (the probe-side rollup and the
    query_id alignment that the rank window and fusion join reuse via
    the HashPartitioning subset rule) and NO Python UDF node anywhere —
    probe LSH buckets are DRIVER-compiled from the pinned vectors, so a
    reintroduced pandas UDF or a broken partitioning-reuse shows up here
    before it shows up in the pair bench."""
    import re

    from ethical_data_ingestion_spark.queries import hybrid_q as H

    sf = "/root/testdata/sf0.001"
    H.hybrid_retrieval_topk(spark, sf).collect()  # build session pins
    for label, df in (
        ("lex", H._lex_ranked(spark, sf)),
        ("sem", H._sem_ranked(spark, sf)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_shuffle = len(re.findall(r"Exchange hashpartitioning", plan))
        assert n_shuffle <= 2, (label, n_shuffle)
        assert "EvalPython" not in plan, label  # no Python in the serving path


def test_round12_packs_and_leakage_plan_pins(spark, sf_dir):
    """Round-11/12 panels, pinned (round-11 verdict item 8): the packing
    panels' ONLY Python node is the bounded per-group greedy fold (one
    FlatMapGroupsInPandas each — a second one, or an ArrowEval creeping
    into the efficiency math, fails here); their prefix-offset windows
    are pid-partitioned (TeraSort pattern, never a global window); the
    mixing and leakage panels are pure-JVM (zero Python nodes); nothing
    anywhere goes cartesian."""
    import re

    one_python = ("packing_strategy_stats", "packing_bpe_stats")
    no_python = (
        "mixing_weights_stats",
        "split_leakage_audit",
        "split_leakage_tier_audit",
        "neardup_clusters_sampled",
        "dedup_tier_attribution_sampled",
    )
    for name in one_python + no_python:
        df = _q(spark, sf_dir, name)
        plan = plans.formatted_plan(df)
        assert "CartesianProduct" not in plan, name
        # formatted plans list each node twice (tree + details); count
        # the details-section headers, one per physical node
        n_py = len(re.findall(
            r"^\(\d+\) (?:FlatMapGroupsInPandas|ArrowEvalPython"
            r"|BatchEvalPython)", plan, re.M))
        assert n_py == (1 if name in one_python else 0), (name, n_py)

    for name in one_python:
        plan = plans.formatted_plan(_q(spark, sf_dir, name))
        for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
            assert spec.startswith("pid"), f"{name}: global window {spec[:80]}"

    # the tier audit's doc-share side must stay a broadcast attach
    tier = plans.formatted_plan(_q(spark, sf_dir, "split_leakage_tier_audit"))
    assert "BroadcastHashJoin" in tier


def test_r12_r13_rewrites_keep_their_plan_shapes(spark, sf_dir):
    """Plan pins for the r12 optimization rewrites (r12 verdict item 6)
    and the r13 ones: each rewrite's load-bearing plan property fails on
    revert even though results stay correct."""
    # triangle: edge-iterator closure — array_intersect counts closures;
    # the wedge-enumeration join would roughly double the exchange count
    df = _q(spark, sf_dir, "copurchase_triangle_stats")
    assert "array_intersect" in plans.formatted_plan(df)
    assert plans.shuffle_count(df) <= 8

    # LPA stats tails: ONE real plan (grouped aggs over the round-tagged
    # union), not a driver-assembled LocalTableScan
    for name, max_sh in (
        ("label_propagation_communities", 9),
        ("community_modularity_stats", 13),
        ("lpa_semisync_communities", 18),
    ):
        df = _q(spark, sf_dir, name)
        plan = plans.formatted_plan(df)
        assert "LocalTableScan" not in plan, name
        assert "HashAggregate" in plan, name
        assert plans.shuffle_count(df) <= max_sh, name

    # curated manifest: input is the pinned published-decisions/pricing
    # leaves — NO parquet scan may reappear in the plan
    df = _q(spark, sf_dir, "training_shard_manifest_curated")
    plan = plans.formatted_plan(df)
    assert "Scan parquet" not in plan
    assert "Scan ExistingRDD" in plan

    # decontam consumer: reads the shared 8-gram explode — no Generate
    # (re-explode) may reappear
    df = _q(spark, sf_dir, "benchmark_decontam_stats")
    assert "Generate" not in plans.formatted_plan(df)

    # LSH quality panel: reads the published truth-pair artifact — no
    # re-shingling (Generate) and no parquet re-scan of documents
    df = _q(spark, sf_dir, "minhash_recall_stats")
    plan = plans.formatted_plan(df)
    assert "Generate" not in plan
    assert "Scan parquet" not in plan

    # r13 MMR: single-plan array greedy (array_sort argmax), no pin jobs
    # means the whole selection is one narrow plan
    for name in ("mmr_diversified_topk", "mmr_diversified_topk_ann"):
        df = _q(spark, sf_dir, name)
        plan = plans.formatted_plan(df)
        assert "array_sort" in plan, name
        assert plans.shuffle_count(df) <= 4, name

    # r13 streaming consumers: served from pinned drained-rows artifacts —
    # no parquet scan of the spool/corpus in the registered plan
    for name in (
        "streaming_anomaly_windows",
        "streaming_topk_trending",
        "streaming_quarantine_gate",
        "streaming_curation_gate",
    ):
        df = _q(spark, sf_dir, name)
        plan = plans.formatted_plan(df)
        assert "Scan ExistingRDD" in plan, name
        assert "Scan parquet" not in plan, name
