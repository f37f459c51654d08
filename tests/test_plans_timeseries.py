"""Plan guardrails for the time-series and data-quality families: the
properties that make these shapes survive 100 TB — single exchanges for
chained windows, map-side-combined aggregates, broadcast dimension joins in
the FK audit, and no single-partition global window in the rank-selection
percentile path."""

from __future__ import annotations

from ethical_data_ingestion_spark import plans, registry


def _q(spark, sf_dir, name):
    return registry.QUERIES[name](spark, sf_dir)


def test_gap_fill_one_exchange_after_preagg(spark, sf_dir):
    # groupBy(user_id, day) then a user_id window: the window must reuse
    # the aggregate's partitioning lineage — one data shuffle, not two
    # (the day aggregation and the lead window both key on user_id).
    df = _q(spark, sf_dir, "gap_fill_daily")
    # shuffles: agg exchange + window exchange share user_id prefix; Spark
    # plans agg on (user_id, day) then re-keys on user_id → 2, plus the
    # final presentation sort. Anything above that means the explode or
    # fill re-shuffled raw rows.
    assert plans.shuffle_count(df) <= 3
    assert plans.read_schemas(df) == ["struct<ts:bigint,user_id:bigint,value:double>"] or (
        "user_id" in plans.read_schemas(df)[0]
    )


def test_funnel_single_user_exchange(spark, sf_dir):
    # three chained stage-windows + per-user rollup, all on user_id: ONE
    # data exchange, then the singleton reduce for the final 1-row panel.
    df = _q(spark, sf_dir, "funnel_conversion")
    assert plans.shuffle_count(df) <= 2
    # only the three needed columns leave the scan
    schema = plans.read_schemas(df)[0]
    assert "props" not in schema and "value" not in schema


def test_event_runs_windows_share_one_sort(spark, sf_dir):
    # both row_numbers and the island group-by are user_id-prefixed: one
    # data exchange (plus final 5-row ordering).
    df = _q(spark, sf_dir, "event_type_runs")
    assert plans.shuffle_count(df) <= 3


def test_column_profile_is_single_scan(spark, sf_dir):
    # the whole profile must come from ONE pass over orders — the oracle's
    # 6-scan UNION ALL shape appearing here is the regression.
    df = _q(spark, sf_dir, "column_profile_orders")
    assert len(plans.read_schemas(df)) == 1


def test_percentiles_avoid_single_partition_window(spark, sf_dir):
    # the rank-selection plan must never funnel the data through an
    # Exchange SinglePartition feeding a Window (the naive global
    # row_number); ranks come from range partitions + broadcast offsets.
    df = _q(spark, sf_dir, "exact_order_percentiles")
    plan = plans.formatted_plan(df)
    window_feeds = [
        seg for seg in plan.split("Window")[:-1]
        if "Exchange SinglePartition" in seg[-600:]
    ]
    assert not window_feeds, "global single-partition window in percentile plan"


def test_deciles_avoid_single_partition_window(spark, sf_dir):
    # NTILE semantics must come from the rank-selection machinery, never a
    # global ordered window: no Exchange SinglePartition may feed a Window.
    df = _q(spark, sf_dir, "order_price_deciles")
    plan = plans.formatted_plan(df)
    window_feeds = [
        seg for seg in plan.split("Window")[:-1]
        if "Exchange SinglePartition" in seg[-600:]
    ]
    assert not window_feeds, "global single-partition window in decile plan"


def test_fk_audit_broadcasts_dimension_parents(spark, sf_dir):
    # six of seven FK edges have dimension parents — every one must be a
    # broadcast join; only lineitem->orders may shuffle at scale.
    df = _q(spark, sf_dir, "fk_integrity_audit")
    assert plans.broadcast_join_count(df) >= 6
