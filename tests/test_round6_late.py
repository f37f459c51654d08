"""Invariant tests for the late-round-6 panels (UniMax allocation, Zipf
fit, source-vocab affinity, embedding dimension ablation) — properties the
hash gate can't express: conservation laws, bounds, monotonicity."""

from __future__ import annotations

import math

from ethical_data_ingestion_spark.registry import QUERIES, _load_everything

_load_everything()

from ethical_data_ingestion_spark.queries.curation_q import (  # noqa: E402
    _UNIMAX_BUDGET_X,
    _UNIMAX_CAP_EPOCHS,
)


def test_unimax_allocation_conserves_budget_and_respects_cap(spark, sf_dir):
    rows = QUERIES["unimax_allocation_stats"](spark, sf_dir).collect()
    assert rows
    total_tokens = sum(r.tokens for r in rows)
    budget = _UNIMAX_BUDGET_X * total_tokens
    # conservation: allocations sum back to the budget (up to per-row
    # 2-dp rounding of the fair share)
    assert abs(sum(r.alloc_tokens for r in rows) - budget) < 0.01 * len(rows)
    assert abs(sum(r.mix_frac for r in rows) - 1.0) < 1e-3
    fair = None
    for r in rows:
        # nothing exceeds the epoch cap (capped rows sit exactly on it)
        assert r.epochs <= _UNIMAX_CAP_EPOCHS + 1e-6, r
        if r.is_capped:
            assert abs(r.epochs - _UNIMAX_CAP_EPOCHS) < 1e-6, r
            assert abs(r.alloc_tokens - r.capacity) < 1e-6, r
        else:
            # every uncapped corpus gets the SAME fair share
            if fair is None:
                fair = r.alloc_tokens
            assert abs(r.alloc_tokens - fair) < 0.02, r
    # the waterline is real on the fixture: both kinds exist
    kinds = {r.is_capped for r in rows}
    assert kinds == {0, 1}, f"degenerate fixture split: {kinds}"
    # a capped corpus is never larger than any uncapped one (ascending-
    # capacity waterline)
    max_capped = max((r.capacity for r in rows if r.is_capped), default=0)
    min_unc = min(
        (r.capacity for r in rows if not r.is_capped), default=math.inf
    )
    assert max_capped <= min_unc


def test_zipf_fit_slope_is_negative_with_sane_r2(spark, sf_dir):
    rows = QUERIES["zipf_fit_stats"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.zipf_slope < 0, r  # frequency falls with rank, always
        assert 0.0 <= r.r2 <= 1.0 + 1e-9, r
        assert 0 < r.fit_words <= 100
        assert r.n_types >= r.fit_words
        # intercept ≈ log-frequency of the top word: must be positive and
        # at least the fitted value at rank 1 minus slack
        assert r.intercept > 0, r


def test_source_affinity_bounds_and_symmetric_coverage(spark, sf_dir):
    rows = QUERIES["source_vocab_affinity"](spark, sf_dir).collect()
    assert rows
    srcs = set()
    for r in rows:
        srcs.add(r.src_a)
        srcs.add(r.src_b)
        assert r.src_a < r.src_b  # canonical pair orientation
        assert 0.0 <= r.jaccard <= 1.0
        assert r.jaccard <= r.containment <= 1.0 + 1e-9, r
        assert r.n_common <= min(r.types_a, r.types_b)
    n = len(srcs)
    assert len(rows) == n * (n - 1) // 2  # full pair matrix, no dupes


def test_dim_ablation_full_width_is_exact_and_recall_saturates(
    spark, sf_dir
):
    rows = {
        r.dim: r for r in QUERIES["embedding_dim_ablation"](spark, sf_dir).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    # the full-width run IS the ground truth: recall must be exactly 1
    assert rows[64].recall_at10 == 1.0
    assert rows[64].n_hits == rows[64].n_returned
    for r in rows.values():
        assert 0.0 <= r.recall_at10 <= 1.0
        assert -1.0 <= r.mean_cos <= 1.0
        assert r.n_returned == rows[64].n_returned  # same probe x k grid


def test_kcenter_radius_curve_is_monotone_and_centers_distinct(
    spark, sf_dir
):
    rows = sorted(
        QUERIES["kcenter_coreset_stats"](spark, sf_dir).collect(),
        key=lambda r: r.sel_round,
    )
    assert [r.sel_round for r in rows] == list(range(8))
    assert rows[0].vec_id == 0 and rows[0].dist_to_set is None  # seed
    ids = [r.vec_id for r in rows]
    assert len(set(ids)) == len(ids)  # greedy never re-picks a center
    dists = [r.dist_to_set for r in rows[1:]]
    assert all(d > 0 for d in dists)
    # farthest-point traversal: the coverage radius never increases
    assert all(a >= b - 1e-9 for a, b in zip(dists, dists[1:])), dists


def test_late_data_audit_exercises_every_watermark_decision(spark, sf_dir):
    """The late-audit fixture must actually exercise all three watermark
    outcomes (drop / merge / retain-unflushed), and no window end may sit
    exactly on a watermark value — the tie-free assumption under which
    the drop (<=) and eviction (<=) inequalities were pinned by
    experiment."""
    import duckdb

    from ethical_data_ingestion_spark.queries.streaming_q import (
        _LATE_DELAY_MIN,
        _LATE_MOD,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    stats = con.sql(f"""
    WITH bounds AS (SELECT epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx
                    FROM events),
    tagged AS (
      SELECT e.ts,
             CASE WHEN e.event_id % {_LATE_MOD} = 0 THEN 3
                  ELSE least(2, CAST(((epoch_us(e.ts) - b.mn) * 3)
                                     // (b.mx - b.mn + 1) AS INTEGER))
             END AS f,
             date_trunc('hour', e.ts) + INTERVAL 1 HOUR AS wend
      FROM events e, bounds b
    ),
    fmax AS (SELECT f, MAX(ts) AS fmx FROM tagged GROUP BY f),
    wmseq AS (SELECT f, MAX(fmx) OVER (ORDER BY f)
                    - INTERVAL {_LATE_DELAY_MIN} MINUTE AS w FROM fmax),
    thr AS (SELECT f, LAG(w, 2) OVER (ORDER BY f) AS w2 FROM wmseq),
    finalw AS (SELECT MAX(w) AS wf FROM wmseq)
    SELECT
      (SELECT COUNT(*) FROM tagged t JOIN thr USING (f)
        WHERE t.f = 3 AND t.wend <= thr.w2)                  AS dropped,
      (SELECT COUNT(*) FROM tagged t JOIN thr USING (f), finalw
        WHERE t.f = 3 AND t.wend > thr.w2 AND t.wend <= finalw.wf) AS merged,
      (SELECT COUNT(*) FROM tagged t, finalw
        WHERE t.wend > finalw.wf)                            AS unflushed,
      (SELECT COUNT(*) FROM tagged t JOIN wmseq m ON t.wend = m.w) AS ties
    """).fetchone()
    dropped, merged, unflushed, ties = stats
    assert dropped > 0, "no late row was dropped - fixture degenerate"
    assert merged > 0, "no late row merged into open state"
    assert unflushed > 0, "no window retained past final watermark"
    assert ties == 0, "window end == watermark: inequality pin is at risk"

    # and the engine agrees end-to-end: emitted mass = total - dropped -
    # unflushed(kept rows in unemitted windows)
    from ethical_data_ingestion_spark.registry import QUERIES as Q

    emitted = Q["streaming_late_data_audit"](spark, sf_dir).agg(
        {"n_events": "sum"}
    ).collect()[0][0]
    total = con.sql("SELECT COUNT(*) FROM events").fetchone()[0]
    kept_unflushed = con.sql(f"""
    WITH bounds AS (SELECT epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx
                    FROM events),
    tagged AS (
      SELECT e.ts,
             CASE WHEN e.event_id % {_LATE_MOD} = 0 THEN 3
                  ELSE least(2, CAST(((epoch_us(e.ts) - b.mn) * 3)
                                     // (b.mx - b.mn + 1) AS INTEGER))
             END AS f,
             date_trunc('hour', e.ts) + INTERVAL 1 HOUR AS wend
      FROM events e, bounds b
    ),
    fmax AS (SELECT f, MAX(ts) AS fmx FROM tagged GROUP BY f),
    wmseq AS (SELECT f, MAX(fmx) OVER (ORDER BY f)
                    - INTERVAL {_LATE_DELAY_MIN} MINUTE AS w FROM fmax),
    thr AS (SELECT f, LAG(w, 2) OVER (ORDER BY f) AS w2 FROM wmseq),
    finalw AS (SELECT MAX(w) AS wf FROM wmseq)
    SELECT COUNT(*) FROM tagged t JOIN thr USING (f), finalw
    WHERE (thr.w2 IS NULL OR t.wend > thr.w2) AND t.wend > finalw.wf
    """).fetchone()[0]
    assert emitted == total - dropped - kept_unflushed


def test_threshold_sweep_is_monotone_and_agrees_with_pair_panel(
    spark, sf_dir
):
    rows = sorted(
        QUERIES["dedup_threshold_sweep"](spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.7, 0.75, 0.8, 0.85, 0.9]
    for a, b in zip(rows, rows[1:]):  # tightening can only shrink
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_flagged >= b.n_docs_flagged
    for r in rows:
        assert 0.0 <= r.flagged_pct <= 1.0
        # a pair flags at most 2 docs, and flagged docs need >= 1 pair
        assert r.n_docs_flagged <= 2 * r.n_pairs
        assert (r.n_pairs == 0) == (r.n_docs_flagged == 0)
    # cross-panel consistency: the 0.8 row counts exactly the pairs the
    # standalone >= 0.8 panel emits
    n_08 = QUERIES["dedup_jaccard_pairs"](spark, sf_dir).count()
    assert rows[2].n_pairs == n_08


def test_knn_label_accuracy_probes_and_bounds(spark, sf_dir):
    from ethical_data_ingestion_spark.queries.similarity_q import _NN_PROBES

    rows = QUERIES["knn_label_accuracy"](spark, sf_dir).collect()
    assert rows
    assert sum(r.n_probes for r in rows) == _NN_PROBES
    for r in rows:
        assert 0 <= r.n_correct <= r.n_probes
        assert abs(r.acc_at1 - round(r.n_correct / r.n_probes, 4)) < 1e-9


def test_triangle_stats_invariants(spark, sf_dir):
    r = QUERIES["copurchase_triangle_stats"](spark, sf_dir).collect()[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    # every triangle closes exactly 3 of the Sigma C(d,2) wedges
    assert 3 * r.n_triangles <= r.n_wedges
    assert 0.0 <= r.global_cc <= 1.0
    # handshake bound: edges <= C(nodes, 2)
    assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2


def test_zonemap_panel_layouts_tell_the_clustering_story(spark, sf_dir):
    rows = QUERIES["zonemap_pruning_stats"](spark, sf_dir).collect()
    assert len(rows) == 6
    by = {(r.layout, r.pred): r for r in rows}
    for (_, pred), r in by.items():
        assert 0 <= r.n_pruned <= r.n_files
        assert r.rows_matched <= r.rows_scanned  # survivors cover matches
        # matches are a property of the predicate, not the layout
        assert r.rows_matched == by[("ingest", pred)].rows_matched
    # scattered keys prune nothing; date clustering prunes most files
    for pred in ("month", "quarter", "year"):
        assert by[("ingest", pred)].prune_pct == 0.0
        assert by[("date_clustered", pred)].prune_pct >= 0.5
        assert (
            by[("date_clustered", pred)].scan_efficiency
            > by[("ingest", pred)].scan_efficiency
        )


def test_triangle_count_on_planted_graph(spark, tmp_path):
    """K4 (one 4-part order) has exactly 4 triangles; a 3-edge path adds
    none — pins the orientation/wedge/close logic against hand-counted
    truth, independent of the fixture."""
    rows = (
        # K4 on parts 1..4
        [(100, p) for p in (1, 2, 3, 4)]
        # path 5-6-7-8: orders each contributing one edge
        + [(200, 5), (200, 6), (201, 6), (201, 7), (202, 7), (202, 8)]
    )
    d = str(tmp_path / "planted")
    spark.createDataFrame(
        rows, schema="l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(f"{d}/lineitem.parquet")
    r = QUERIES["copurchase_triangle_stats"](spark, d).collect()[0]
    assert r.n_nodes == 8
    assert r.n_edges == 6 + 3  # K4's C(4,2) + path's 3
    assert r.n_triangles == 4
    # K4 wedges: 4 nodes x C(3,2)=12; path wedges: 2 inner nodes x 1
    assert r.n_wedges == 12 + 2


def test_zorder_panel_shows_the_interleave_tradeoff(spark, sf_dir):
    rows = QUERIES["zorder_pruning_stats"](spark, sf_dir).collect()
    assert len(rows) == 6
    by = {(r.layout, r.pred): r for r in rows}
    for (_, pred), r in by.items():
        assert r.rows_matched <= r.rows_scanned
        assert r.rows_matched == by[("zorder", pred)].rows_matched
    # 1-D date clustering: great on its own column, near-blind on the
    # other (tiny files can prune by chance at sf0.001 — allow a sliver)
    assert by[("date_clustered", "date_band")].prune_pct >= 0.5
    assert by[("date_clustered", "cust_band")].prune_pct <= 0.1
    # Z-order: prunes materially on BOTH single dimensions
    assert by[("zorder", "date_band")].prune_pct >= 0.25
    assert (
        by[("zorder", "cust_band")].prune_pct
        > by[("date_clustered", "cust_band")].prune_pct
    )
    # ...and scans no more rows than 1-D clustering on the 2-D box
    assert (
        by[("zorder", "date_cust_box")].rows_scanned
        <= by[("date_clustered", "date_cust_box")].rows_scanned
    )


def test_streaming_checkpoint_recovery_resumes_exactly_once(
    spark, tmp_path
):
    """Kill a windowed drain halfway, add more files, restart from the
    SAME checkpoint into the SAME file sink: the sink must end up equal
    to a one-shot run over all the data — no lost windows, no
    duplicates. (The memory sink refuses recovery; the parquet sink is
    the fault-tolerant path a production drain uses.)"""
    import datetime as dt

    from pyspark.sql import functions as F

    sch = "event_id LONG, ts TIMESTAMP, value DOUBLE"
    TS = dt.datetime
    batches = [
        [(1, TS(2024, 1, 1, 1, 10), 10.0), (2, TS(2024, 1, 1, 2, 10), 20.0)],
        [(3, TS(2024, 1, 1, 3, 10), 30.0), (4, TS(2024, 1, 1, 4, 10), 40.0)],
        [(5, TS(2024, 1, 1, 5, 10), 50.0), (6, TS(2024, 1, 1, 6, 10), 60.0)],
        [(7, TS(2024, 1, 1, 7, 10), 70.0), (8, TS(2024, 1, 1, 8, 10), 80.0)],
    ]

    def _agg(stream):
        return (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
            .select(F.col("window.start").alias("ws"), "n", "tv")
        )

    def _drain(src, out, ckpt):
        q = (
            _agg(
                spark.readStream.schema(sch)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            tuple(r) for r in spark.read.parquet(out).collect()
        )

    src, out, ckpt = (str(tmp_path / n) for n in ("src", "out", "ckpt"))

    def _write(d, i):
        spark.createDataFrame(batches[i], sch).coalesce(1).write.mode(
            "append"
        ).parquet(d)

    # phase 1: two files, drain, query stops
    _write(src, 0)
    _write(src, 1)
    after1 = _drain(src, out, ckpt)
    # phase 2: two more files arrive; RESTART from the same checkpoint
    _write(src, 2)
    _write(src, 3)
    after2 = _drain(src, out, ckpt)

    # one-shot reference over identical data, fresh checkpoint/sink
    ref_src, ref_out, ref_ck = (
        str(tmp_path / n) for n in ("rsrc", "rout", "rck")
    )
    for i in range(4):
        _write(ref_src, i)
    ref = _drain(ref_src, ref_out, ref_ck)

    assert after2 == ref, (after2, ref)
    # the restart appended strictly new windows — no replay, no loss
    assert after1 and len(after2) > len(after1)
    assert set(after1) <= set(after2)
    assert len(after2) == len(set(after2)), "duplicate rows in sink"


def test_seasonality_dft_amplitude_identity_and_bounds(spark, sf_dir):
    import math

    rows = QUERIES["seasonality_dft_stats"](spark, sf_dir).collect()
    assert [r.period for r in rows] == [7, 10, 15]
    for r in rows:
        assert r.n_days > 0
        assert r.amplitude >= 0
        # output identity: amplitude derives from the printed projections
        expect = 2.0 * math.sqrt(r.a_cos**2 + r.b_sin**2) / r.n_days
        assert abs(r.amplitude - expect) < 1e-4, r


def test_forecast_backtest_shapes_and_error_sanity(spark, sf_dir):
    rows = {r.method: r for r in QUERIES["forecast_backtest_stats"](
        spark, sf_dir).collect()}
    assert set(rows) == {"ewma", "naive"}
    # both methods forecast the same target days
    assert rows["ewma"].n_forecasts == rows["naive"].n_forecasts > 0
    for r in rows.values():
        assert 0 <= r.mae <= r.rmse  # rmse dominates mae always
        assert r.mape >= 0


def test_lpa_panel_invariants(spark):
    """Label propagation: label count collapses monotonically; the
    largest community grows; every round's label set is reachable
    (n_labels >= 1); changed counts bounded by node count."""
    from ethical_data_ingestion_spark import registry
    from ethical_data_ingestion_spark.queries import graph_q

    rows = registry.QUERIES["label_propagation_communities"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r.round for r in rows] == [1, 2, 3, 4]
    edges, _n = graph_q._trade_graph(spark, "/root/testdata/sf0.001")
    n_nodes = edges.select("src").distinct().count()
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_labels >= hi.n_labels
        assert lo.max_community <= hi.max_community
    for r in rows:
        assert 1 <= r.n_labels
        assert 0 <= r.n_changed <= n_nodes
        assert r.max_community <= n_nodes
        assert r.singleton_communities <= r.n_labels


def test_modularity_bounds(spark):
    """Q in [-0.5, 1); intra_share in [0, 1]; community count matches
    the convergence panel's label count round for round."""
    from ethical_data_ingestion_spark import registry

    sf = "/root/testdata/sf0.001"
    q = {r.round: r for r in registry.QUERIES["community_modularity_stats"](
        spark, sf).collect()}
    lpa = {r.round: r for r in registry.QUERIES[
        "label_propagation_communities"](spark, sf).collect()}
    for r in (1, 2, 3, 4):
        assert -0.5 <= q[r].modularity < 1.0
        assert 0.0 <= q[r].intra_share <= 1.0
        assert q[r].n_communities == lpa[r].n_labels
