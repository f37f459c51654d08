"""Extended star-schema suite: the TPC-H query shapes the round-1 suite
didn't cover — conditional-aggregate ratios, distribution histograms,
HAVING-driven semi joins, argmax-by-group, market share, and
anti-join-with-scalar-subquery.

The reference never issues these (its only join-shaped SQL is one
correlated subquery, ``ethical_crawler.py:1437-1451``); they realize the
"richer relational surface" extension of SURVEY §2.3 over the driver's
star schema, planned Spark-first:

* every dimension (region/nation/supplier/part/customer) broadcasts —
  none grows with corpus size at 100 TB, so the fact-table scan is the
  only shuffled input;
* fact-side date filters sit directly on the scan (parquet min/max
  pruning);
* HAVING pre-aggregations reduce BEFORE joining back (semi join carries
  keys only);
* all money math accumulates in DECIMAL and emits double, the
  cross-engine-exact contract of operators/analytics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.analytics import davg, dsum
from ..registry import register

_DISC4 = "decimal(18,4)"


def _disc_price() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DISC4)


@register(
    "promo_revenue_ratio",
    oracle="""
    SELECT
      ROUND(
        CAST(SUM(CASE WHEN p_type = 'PROMO'
                      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        * 100, 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — conditional-aggregate ratio. ``part`` is a broadcast
    dimension (bounded catalog, never fact-sized), so the plan is one
    fact scan with the shipdate filter pushed down, zero shuffles before
    the single global agg. Both engines divide the same two exact
    decimal sums, so the ratio is bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast(_DISC4)
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double")
                * 100,
                4,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    ORDER BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — two-level aggregation producing a histogram: orders
    per customer (left join keeps zero-order customers; COUNT of the
    join-key column counts only matches), then customers per order-count.
    First agg shuffles on custkey; the histogram agg's input is one row
    per customer — negligible at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


@register(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300
    )
    SELECT o.o_orderkey, c.c_name, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY o.o_orderkey, c.c_name, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape — HAVING-driven semi join: pre-aggregate lineitem to the
    qualifying order keys (map-side combined, output is keys only), semi
    join the fact tables against that small set, then re-aggregate. The
    heavy reduction happens before any join; the top-k carries a unique
    tie-break (orderkey) so LIMIT is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "c_name", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape — argmax over an aggregated view: quarterly revenue per
    supplier, keep the max-revenue supplier(s). The scalar max broadcasts
    (cross join with a 1-row frame) instead of a window over the whole
    aggregate; equality on doubles is safe because both sides derive from
    the same exact decimal sum."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    )
    best = rev.agg(F.max("total_revenue").alias("_best"))
    return (
        rev.join(F.broadcast(best), rev.total_revenue == best._best, "left_semi")
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "nation_market_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(
             CAST(SUM(CASE WHEN n.n_name = 'NATION_0'
                           THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE),
             6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape — market share via conditional aggregation over a
    multi-join: the fraction of each order-year's revenue supplied by one
    nation. supplier⋈nation broadcasts; lineitem⋈orders is the only real
    shuffle (both fact-sized). Share = exact-decimal sum ÷ exact-decimal
    sum, rounded identically on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    target = F.when(F.col("n_name") == "NATION_0", _disc_price()).otherwise(
        F.lit(0).cast(_DISC4)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(_disc_price()).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "rich_idle_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape — scalar subquery + anti join: above-average-balance
    customers with no recent orders. The threshold is one broadcast
    scalar; the anti join's right side is pre-filtered to recent orders
    (date filter pushed to the scan) and reduced to distinct keys before
    shuffling. The average divides an exact decimal sum, so the
    threshold — and therefore the qualifying set — is cross-engine
    identical."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg_bal")
        )
        .collect()[0][0]
    )
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.filter(F.col("c_acctbal") > F.lit(thresh))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", "total_bal"),
        )
        .orderBy("c_mktsegment")
    )
