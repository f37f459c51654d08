"""Extended relational surface: grouping sets, HAVING, set operations,
semi/anti joins, pivot, analytic windows.

The reference never issues these (SURVEY §2.3 "explicit absences"), but a
user migrating real analytics onto this engine will — so they're covered
first-class, each as one declarative Spark plan with a DuckDB hash mirror.
Scale notes per query; the common theme: everything below is a single
hash-aggregate or broadcast-join shape, no self-joins, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize
from ..operators.analytics import davg, dsum
from ..registry import register


@register(
    "rollup_revenue_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def rollup_revenue_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (status, priority): detail + per-status subtotal + grand
    total in ONE aggregation pass — Spark expands grouping sets before the
    shuffle, so partial aggregation still applies (vs 3 separate jobs).
    Rollup NULLs are coalesced to a sentinel on both engines (fixture
    columns are non-null, so the sentinel is unambiguous)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


@register(
    "cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping sets in one pass (adds the per-priority
    margin ROLLUP lacks)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
        .orderBy("status", "priority")
    )


@register(
    "having_big_customers",
    oracle="""
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8
    ORDER BY total_spend DESC, custkey
    LIMIT 50
    """,
)
def having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING + top-k: post-aggregation filter is just a filter
    on the agg output — Catalyst keeps it after the partial/final agg, so
    no extra pass. Unique custkey tie-break keeps the LIMIT set stable."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "total_spend"))
        .filter(F.col("n_orders") >= 8)
        .orderBy(F.desc("total_spend"), "custkey")
        .limit(50)
    )


@register(
    "set_ops_customer_cohorts",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
         y97 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT 'both' AS cohort, custkey FROM (SELECT custkey FROM y96 INTERSECT SELECT custkey FROM y97)
    UNION ALL
    SELECT 'only_1996' AS cohort, custkey FROM (SELECT custkey FROM y96 EXCEPT SELECT custkey FROM y97)
    UNION ALL
    SELECT 'only_1997' AS cohort, custkey FROM (SELECT custkey FROM y97 EXCEPT SELECT custkey FROM y96)
    ORDER BY cohort, custkey
    """,
)
def set_ops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one cohort query (retention
    shape). Spark plans set ops as aggregates/joins on the key — each leg
    is one shuffle on custkey; the year filters ride down to the scans."""
    orders = load_table(spark, sf_dir, "orders")

    def cohort(y: int) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp_ntz"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp_ntz"))
            )
            .select(F.col("o_custkey").alias("custkey"))
            .distinct()
        )

    y96, y97 = cohort(1996), cohort(1997)
    tagged = (
        y96.intersect(y97).select(F.lit("both").alias("cohort"), "custkey")
        .unionAll(y96.exceptAll(y97).select(F.lit("only_1996").alias("cohort"), "custkey"))
        .unionAll(y97.exceptAll(y96).select(F.lit("only_1997").alias("cohort"), "custkey"))
    )
    return tagged.orderBy("cohort", "custkey")


@register(
    "suppliers_without_recent_sales",
    oracle="""
    SELECT s.s_suppkey AS suppkey, s.s_name AS name
    FROM supplier s
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey
        AND l.l_shipdate >= TIMESTAMP '2001-08-01' AND l.l_quantity >= 45
    )
    ORDER BY suppkey
    """,
)
def suppliers_without_recent_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: the fact-table side is pre-filtered
    (predicates pushed to the lineitem scan) and only distinct suppkeys
    shuffle — an anti join against a 100 TB fact table moves keys, not
    rows. (Cutoff chosen so the fixture yields a non-trivial survivor
    set — every supplier ships continuously, so a date alone excludes
    nobody.)"""
    sup = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2001-08-01").cast("timestamp_ntz"))
        & (F.col("l_quantity") >= 45)
    )
    return (
        sup.join(li, sup.s_suppkey == li.l_suppkey, "left_anti")
        .select(F.col("s_suppkey").alias("suppkey"), F.col("s_name").alias("name"))
        .orderBy("suppkey")
    )


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never the two-pass value-discovery
    form at scale) — compiles to conditional aggregation, one pass."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "priority",
            F.coalesce("F", F.lit(0)).alias("f_cnt"),
            F.coalesce("O", F.lit(0)).alias("o_cnt"),
            F.coalesce("P", F.lit(0)).alias("p_cnt"),
        )
        .orderBy("priority")
    )


@register(
    "running_value_by_user",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_id, running_value
    FROM ranked WHERE rn <= 5
    ORDER BY user_id, event_id
    """,
)
def running_value_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-user running total (decimal-accumulated for
    cross-engine determinism), first 5 events each. One shuffle on user_id,
    sort within partitions — the standard sessionless cumulative shape."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_value"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id", "running_value")
        .orderBy("user_id", "event_id")
    )


@register(
    "approx_order_stats",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS hll_within_bounds,
           TRUE AS p50_within_rank_bounds,
           TRUE AS p95_within_rank_bounds
    FROM orders
    """,
)
def approx_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for interactive scale: HLL++ distinct count and
    quantile summaries compute in one pass with O(1) state per partition
    and commutative merges — at 100 TB these replace exact COUNT(DISTINCT)
    (a full shuffle of the key universe) and exact percentiles (a sort)
    whenever ±2% is acceptable.

    DuckDB's estimators differ bit-wise from Spark's, so the raw estimates
    can't be hash-compared; instead the query emits engine-independent
    ASSERTIONS: the exact aggregates (hash-checked against the oracle
    verbatim) plus booleans stating each sketch sits within its bound —
    HLL within 3×rsd = 6% of the exact distinct count (rsd is a standard
    deviation, not a guarantee: 2% would be a ~1σ gate that a healthy
    sketch can legitimately exceed on another fixture; 3σ is the
    conventional "sketch is broken" line; measured ≤0.6% here), each
    percentile_approx estimate inside the exact rank band (±5 points at
    p50, ±2 at p95; accuracy 10000 ⇒ rank error ≤ n/10000, far inside
    both). The oracle expects TRUE: a sketch drifting out of bounds flips
    the boolean and fails the hash gate.

    The rank-band check counts rows at-or-below each estimate — an
    estimate sits between the exact 45th and 55th percentile VALUES iff
    its ≤/<-counts straddle those ranks — so no exact percentile sort
    runs anywhere (an earlier draft used the ``percentile()`` aggregate:
    a single-reduce sort, 6.1s at sf0.1 and the wrong shape at 100 TB).

    TWO jobs, shaped to dodge a measured codegen pathology: putting
    ``countDistinct`` (distinct-expand rewrite) and ``percentile_approx``
    (TypedImperativeAggregate) in ONE aggregate costs ~6s PER CALL at
    sf0.1 — not a one-time compile (measured: split shapes run 0.3–0.8s
    warm). Job 1 collects ONLY the two percentile-estimate scalars
    (narrow one-column agg — the documented scalar-stat pattern, never
    data rows). The returned DataFrame is a TWO-LEVEL aggregate with no
    expand anywhere: level 1 groups by ``o_custkey`` carrying the row
    count and the four band-indicator sums (map-side combined — the
    shuffle is one row per distinct customer); level 2 folds totals,
    reads the exact distinct count as the surviving group count, and
    computes the HLL estimate over the group keys — identical to HLL
    over the raw rows, since HLL depends only on the DISTINCT key set.
    Every boolean gate (HLL 3σ, rank bands as floor/ceil expressions
    over ``n_orders``) evaluates JVM-side — no second driver round-trip.
    Measured at sf0.1: 0.7s steady-state vs 1.8s for the round-3
    three-job split and ~6s for the single wide agg."""
    orders = load_table(spark, sf_dir, "orders")
    q = F.percentile_approx("o_totalprice", F.array(F.lit(0.5), F.lit(0.95)), 10000)
    est = (
        orders.select("o_totalprice")
        .agg(F.element_at(q, 1).alias("_p50"), F.element_at(q, 2).alias("_p95"))
        .collect()[0]
    )
    c = F.col("o_totalprice")
    lvl1 = (
        orders.select("o_custkey", "o_totalprice")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum((c <= est["_p50"]).cast("long")).alias("g_le50"),
            F.sum((c < est["_p50"]).cast("long")).alias("g_lt50"),
            F.sum((c <= est["_p95"]).cast("long")).alias("g_le95"),
            F.sum((c < est["_p95"]).cast("long")).alias("g_lt95"),
        )
    )
    wide = lvl1.agg(
        F.sum("c").alias("n_orders"),
        F.count(F.lit(1)).alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("_hll"),
        F.sum("g_le50").alias("le50"),
        F.sum("g_lt50").alias("lt50"),
        F.sum("g_le95").alias("le95"),
        F.sum("g_lt95").alias("lt95"),
    )

    def _band(le: str, lt: str, lo_q: float, hi_q: float) -> F.Column:
        n1 = F.col("n_orders") - 1
        lo = F.floor(F.lit(lo_q) * n1)
        hi = F.ceil(F.lit(hi_q) * n1)
        return (F.col(le) >= lo + 1) & (F.col(lt) <= hi)

    hll_ok = (
        F.abs(F.col("_hll") - F.col("exact_customers"))
        <= F.lit(3 * 0.02) * F.col("exact_customers")
    )
    return wide.select(
        "n_orders",
        "exact_customers",
        hll_ok.alias("hll_within_bounds"),
        _band("le50", "lt50", 0.45, 0.55).alias("p50_within_rank_bounds"),
        _band("le95", "lt95", 0.93, 0.97).alias("p95_within_rank_bounds"),
    )


@register(
    "copurchase_brand_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    pairs AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS support
      FROM items a JOIN items b
        ON a.okey = b.okey AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    ),
    tot AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items)
    SELECT brand_a, brand_b, support,
           ROUND(support::DOUBLE / tot.n_orders, 6) AS support_ratio
    FROM pairs, tot
    ORDER BY support DESC, brand_a, brand_b
    LIMIT 25
    """,
)
def copurchase_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: top-25 part-brand pairs that
    appear together in one order, with per-order support counts — the
    frequent-itemset (k=2) pass behind recommendation and affinity
    analysis.

    Shape at 100 TB: the part dimension BROADCASTS into the fact scan;
    the pair stage is a self-equi-join ON THE ORDER KEY — both sides
    arrive hash-partitioned by okey from the distinct, so the join is
    co-located and pair volume is Σ C(basket, 2), bounded by basket
    size (single-digit in TPC-H shapes), never |orders|². Support
    counts combine map-side; the top-25 is TakeOrderedAndProject. The
    distinct-per-(order, brand) projection first is what keeps multi-
    lineitem brands from inflating support."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # pinned: three consumers (both self-join sides + the order total) —
    # unpinned, the fact join + distinct would run three times
    items = materialize(
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a = items.select("okey", F.col("brand").alias("brand_a"))
    b = items.select("okey", F.col("brand").alias("brand_b"))
    pairs = (
        a.join(b, "okey")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    tot = items.agg(F.countDistinct("okey").alias("n_orders"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            "support",
            F.round(
                F.col("support").cast("double") / F.col("n_orders"), 6
            ).alias("support_ratio"),
        )
        .orderBy(F.desc("support"), "brand_a", "brand_b")
        .limit(25)
    )


@register(
    "market_concentration_hhi",
    oracle="""
    WITH srev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) AS rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    nrev AS (
      SELECT nationkey, SUM(rev) AS trev,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             MAX(rev) AS maxrev
      FROM srev GROUP BY nationkey
    ),
    hhi AS (
      SELECT s.nationkey,
             SUM(CAST(ROUND((s.rev::DOUBLE / n.trev::DOUBLE)
                            * (s.rev::DOUBLE / n.trev::DOUBLE), 9)
                      AS DECIMAL(18,9))) AS h
      FROM srev s JOIN nrev n USING (nationkey)
      GROUP BY s.nationkey
    )
    SELECT nat.n_name AS nation, n.n_suppliers,
           ROUND(n.trev::DOUBLE, 2) AS total_revenue,
           ROUND(h.h::DOUBLE * 10000.0, 2) AS hhi,
           ROUND(n.maxrev::DOUBLE / n.trev::DOUBLE, 6) AS top_share
    FROM nrev n
    JOIN hhi h USING (nationkey)
    JOIN nation nat ON n.nationkey = nat.n_nationkey
    ORDER BY nation
    """,
)
def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index of supplier
    revenue within each nation: per-supplier discounted revenue shares
    squared and summed (scaled to the antitrust convention, 0–10,000;
    <1,500 competitive, >2,500 concentrated), with supplier count and
    the single largest share. The supply-chain risk panel next to
    `nation_market_share` (which compares nations to each other; this
    measures fragility WITHIN one) — a nation whose parts flow through
    two suppliers is a disruption risk no matter how big its total.

    Exactness: revenue accumulates in DECIMAL(18,4) (the relational
    family's money discipline); each squared share is round-9 DECIMAL
    before the per-nation sum, so HHI is order-free; top_share is a
    mirrored double division. Scale shape: one map-side-combined
    (nation, supplier) rollup — the shuffle key is the supplier
    dimension, not lineitem rows — then |nations|-row joins; the nation
    name join broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    srev = materialize(
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            ).alias("rev")
        )
    )
    nrev = srev.groupBy("nationkey").agg(
        F.sum("rev").alias("trev"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.max("rev").alias("maxrev"),
    )
    share = F.col("rev").cast("double") / F.col("trev").cast("double")
    hhi = (
        srev.join(nrev.select("nationkey", "trev"), "nationkey")
        .select(
            "nationkey",
            F.round(share * share, 9).cast("decimal(18,9)").alias("t"),
        )
        .groupBy("nationkey")
        .agg(F.sum("t").alias("h"))
    )
    return (
        nrev.join(hhi, "nationkey")
        .join(nat, nrev.nationkey == nat.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            "n_suppliers",
            F.round(F.col("trev").cast("double"), 2).alias("total_revenue"),
            F.round(F.col("h").cast("double") * 10000.0, 2).alias("hhi"),
            F.round(
                F.col("maxrev").cast("double") / F.col("trev").cast("double"),
                6,
            ).alias("top_share"),
        )
        .orderBy("nation")
    )


@register(
    "leadtime_quantity_ols",
    oracle="""
    WITH pts AS (
      SELECT o.o_orderpriority AS grp,
             CAST(l.l_quantity AS BIGINT) AS x,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
                  AS BIGINT) AS y
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    sums AS (
      SELECT grp,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS BIGINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS BIGINT) AS DOUBLE) AS syy
      FROM pts GROUP BY grp
    )
    SELECT grp AS priority,
           CAST(n AS BIGINT) AS n_items,
           ROUND(sy / n, 4) AS avg_ship_days,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM sums ORDER BY priority
    """,
)
def leadtime_quantity_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order size slow fulfilment? Per order priority, the OLS
    regression of order-to-ship latency (days) on line-item quantity:
    slope in days-per-unit with intercept and R². The logistics twin of
    `zipf_fit_stats`' regression discipline — on TPC-H's uniform random
    delays the slope is honestly ~0 with R² ~ 0 (stated here so the
    flat fixture readout is a feature: the panel's job is to FLAG a
    dependence, and the null fixture proves it doesn't hallucinate
    one).

    Exactness: x and y are exact integers, so all five moment sums are
    exact BIGINTs (no rounding anywhere before the final mirrored
    double formula — simpler than the zipf fit, which must quantize its
    logs). Scale shape: the orders join shuffles on the fact's own
    orderkey, then one map-side-combined pass into |priorities| rows of
    moments; the regression algebra runs on 5 rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    pts = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("grp"),
        F.col("l_quantity").cast("long").alias("x"),
        F.datediff("l_shipdate", "o_orderdate").cast("long").alias("y"),
    )
    sums = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("long").cast("double").alias("sx"),
        F.sum("y").cast("long").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return sums.select(
        F.col("grp").alias("priority"),
        n.cast("long").alias("n_items"),
        F.round(sy / n, 4).alias("avg_ship_days"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    ).orderBy("priority")
