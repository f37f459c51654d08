"""Bucketed co-located joins: identical bucketing on the join key makes the
join shuffle-free — the at-rest layout strategy for repeated 100 TB joins."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from ethical_data_ingestion_spark import catalog, plans
from ethical_data_ingestion_spark.io import load_table


def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    catalog.save_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8)
    catalog.save_bucketed(orders, "orders_bucketed", "l_orderkey", n_buckets=8)

    a = spark.table("li_bucketed")
    b = spark.table("orders_bucketed")
    # disable broadcast so the join must rely on the bucket layout
    joined = a.hint("merge").join(b, "l_orderkey")
    assert plans.shuffle_count(joined) == 0, plans.formatted_plan(joined)

    expected = li.join(orders, "l_orderkey").count()
    assert joined.count() == expected


def test_unbucketed_baseline_does_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = li.hint("merge").join(orders, "l_orderkey")
    assert plans.shuffle_count(joined) >= 2  # both sides repartition


def test_clustered_write_produces_disjoint_zone_maps(spark, sf_dir, tmp_path):
    """save_clustered must yield files whose min/max footer ranges are
    pairwise non-overlapping (boundary equality allowed) — the property
    that makes a range predicate skip files at the footer. An unsorted
    write of the same data is checked to NOT have it, so the test can't
    pass vacuously."""
    import pyarrow.parquet as pq

    from ethical_data_ingestion_spark.catalog import save_clustered
    from ethical_data_ingestion_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    cpath = str(tmp_path / "clustered")
    save_clustered(orders, cpath, ["o_totalprice"], n_files=4)

    def ranges(path):
        out = []
        for f in sorted(Path(path).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema
                    == "o_totalprice"
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            if mins:
                out.append((min(mins), max(maxs)))
        return sorted(out)

    rs = ranges(cpath)
    assert len(rs) >= 3
    for (lo1, hi1), (lo2, hi2) in zip(rs, rs[1:]):
        assert hi1 <= lo2, f"overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"

    upath = str(tmp_path / "unsorted")
    orders.repartition(4).write.mode("overwrite").parquet(upath)
    us = ranges(upath)
    overlaps = sum(1 for (l1, h1), (l2, h2) in zip(us, us[1:]) if h1 > l2)
    assert overlaps > 0, "unsorted control unexpectedly disjoint"
