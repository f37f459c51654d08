"""Flagship query + star-schema relational queries.

The flagship (SURVEY §7.2) generalizes the reference's canonical analytics
query — GROUP BY + COUNT + AVG + ORDER BY, advertised at
``README.txt:258-266`` and implemented at ``ethical_crawler.py:1039-1050`` —
to the lineitem fact table (TPC-H Q1 shape: scan → hash agg → sort).

The join queries exercise the relational surface the reference reaches only
via a correlated subquery (SURVEY §2.3 "explicit absences"): real star-schema
joins, planned Spark-first — dimensions broadcast (region/nation/customer/
supplier/part are tiny next to fact tables at any scale), fact-side filters
pushed into the parquet scan before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import analytics as A
from ..operators.analytics import dsum
from ..registry import register


@register(
    "flagship_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      -- via VARCHAR: DuckDB's direct DECIMAL->DOUBLE conversion is not
      -- correctly rounded (int128 scale-divide in float) and went one ulp
      -- off Spark's BigDecimal.doubleValue at sf1 magnitudes; strtod on
      -- the exact decimal string IS correctly rounded on both engines
      CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity), 4) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_extendedprice), 4) AS avg_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_discount), 4) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (Q1 shape): filter → single hash agg → small sort.

    One shuffle, map-side partial agg; the filter reaches the parquet
    scan as a pushed predicate on ``l_shipdate``.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            A.davg("l_quantity", "avg_qty"),
            A.davg("l_extendedprice", "avg_price"),
            A.davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_by_filter",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def revenue_by_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape — the `--where` predicate pass-through (SURVEY #17,
    ``ethical_crawler.py:1078-1080``) feeding a global aggregate. The whole
    conjunction is expressed via ``F.expr`` exactly as a user would pass it,
    and Catalyst still pushes every clause into the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = (
        "l_shipdate >= timestamp '1996-01-01' and l_shipdate < timestamp '1997-01-01' "
        "and l_discount between 0.05 and 0.07 and l_quantity < 24"
    )
    return li.filter(F.expr(pred)).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue")
    )


@register(
    "top_unshipped_orders",
    oracle="""
    SELECT
      l.l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: customer⋈orders⋈lineitem with fact-side filters and top-k.

    customer is tiny relative to the facts → explicit ``broadcast`` so the
    customer⋈orders join never shuffles orders; lineitem⋈orders shuffles on
    the orderkey (unavoidable without co-bucketing; at 100 TB you'd bucket
    both facts on orderkey at write time). Top-k tie-broken by orderkey for
    set determinism.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "regional_revenue",
    oracle="""
    SELECT
      n.n_name,
      CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: five-way star join, every dimension broadcast.

    Only the lineitem⋈orders edge shuffles; supplier/nation/region fold
    into a chain of broadcast hash joins that Catalyst pipelines inside one
    codegen stage over the lineitem scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )
