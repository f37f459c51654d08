"""Second extended star-schema suite: the remaining classic TPC-H query
shapes — EXISTS semi joins with non-equi correlation (Q4), bilateral
fact-to-two-dimension-paths volume (Q7), group-filtered top-k with a
returned-goods predicate (Q10), correlated-average small-quantity analysis
(Q17), disjunctive multi-range predicates (Q19), and the
exactly-one-late-supplier aggregation rewrite (Q21).

The reference never issues joins at all (SURVEY §2.3 "explicit absences");
these complete the relational surface over the driver's star schema. The
fixture lacks partsupp / l_commitdate / l_receiptdate / l_shipmode, so the
date-lag shapes (Q4, Q21) are expressed against the one lag the data has —
``l_shipdate`` vs ``o_orderdate`` — preserving the plan shape (correlated
EXISTS, grouped exactly-one filters) rather than the constants.

Spark-first planning rules, same as relational_tpch.py:

* dimensions broadcast; only fact⋈fact edges (lineitem⋈orders) shuffle;
* correlated EXISTS / NOT EXISTS become semi joins or grouped counts —
  never per-row subquery execution;
* per-group averages for correlated comparisons are pre-aggregated once
  and joined back (|part|-sized, broadcastable) instead of windowing the
  fact table (which would shuffle the full fact on partkey anyway but
  carry every fact column through the sort);
* money sums accumulate in DECIMAL, emit double (cross-engine exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

_DISC4 = "decimal(18,4)"


def _disc_price() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DISC4)


@register(
    "order_priority_wait",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 365 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_wait(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape — priority histogram of orders with at least one line
    shipped more than a year after the order date. The correlated EXISTS
    is a LEFT SEMI join on the order key with the date lag as a residual
    non-equi condition: lineitem is projected to (orderkey, shipdate)
    before the join, so the semi probe carries 16 bytes/row however wide
    lineitem is, and each order is emitted at most once with no distinct
    step."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 365 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "bilateral_trade_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape — shipping volume between every (supplier nation,
    customer nation) pair by ship year. The two nation paths reach the
    fact row through DIFFERENT dimensions (supplier side vs customer
    side), which is the point of the shape: one lineitem⋈orders shuffle,
    then four broadcast joins resolve both nation names inside the same
    codegen stage. The cross-nation filter drops the diagonal before
    aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "returned_items_customers",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_items_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape — customers ranked by revenue on RETURNED lines within a
    window. The returnflag filter sits on the lineitem scan (dictionary
    predicate, pushed to parquet); customer and nation broadcast; top-20
    plans as TakeOrderedAndProject with the custkey tie-break making the
    result set order-insensitive."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p_brand,
           COUNT(*) AS n_lines,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN part_avg USING (l_partkey)
    WHERE l_quantity < half_avg_qty
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape — revenue locked in small-quantity orders, per brand.
    The correlated scalar subquery (per-part average quantity) is
    pre-aggregated ONCE into a |part|-sized table and broadcast back —
    the decorrelation Catalyst would do for the subquery form, made
    explicit so the fact table is scanned exactly twice (once for the
    averages, once for the filter) with no per-row subquery.

    ``l_quantity`` is integral-valued, so AVG = exact-integer sum /
    count is bit-identical across engines and the strict `<` comparison
    is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly"),
        )
        .orderBy("p_brand")
    )


@register(
    "disjunctive_part_revenue",
    oracle="""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 45)
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape — a disjunction of (brand, size-range, quantity-range)
    branches across the join. The part-only conjuncts can't individually
    push below the join under OR, but the common superset predicates CAN:
    the brand IN-list and the size/quantity hull are implied by the whole
    disjunction, so both scans stay pruned while the exact disjunction
    evaluates post-join inside codegen. (Catalyst derives some of this;
    stating the hulls explicitly guarantees it at any version.)"""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").between(1, 45)
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3")
        & F.col("p_size").between(1, 35)
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    branch = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 15))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(20, 45))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_disc_price()).cast("double").alias("revenue"),
        )
    )


@register(
    "late_shipment_suppliers",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 365 DAY) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
      FROM lines GROUP BY l_orderkey
    ),
    blamed AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lines l JOIN per_order p USING (l_orderkey)
      WHERE p.n_supp > 1 AND p.n_late_supp = 1 AND l.is_late
    )
    SELECT s_name, COUNT(*) AS n_orders
    FROM blamed JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_name
    ORDER BY n_orders DESC, s_name
    """,
)
def late_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — suppliers solely responsible for a late multi-supplier
    order. The classic form is EXISTS (another supplier in the order) AND
    NOT EXISTS (another LATE supplier) — two correlated self-joins on the
    fact table. Rewritten as ONE grouped pass: per order, count distinct
    suppliers and distinct late suppliers; the pair (n_supp > 1,
    n_late_supp = 1) encodes both quantifiers, then the single late
    supplier is recovered by joining the per-order verdict back. Two
    shuffles on orderkey total, versus four for the literal
    double-self-join — and no skew amplification since the group key is
    the order."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier")
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAY")
        ).alias("is_late"),
    )
    per_order = lines.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    blamed = (
        lines.filter(F.col("is_late"))
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        blamed.join(F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "s_name")
    )
