"""Privacy / disclosure-risk queries (round 4 widening).

The reference is an ETHICAL data-ingestion engine — robots.txt respect,
rate limits, compliance gates, audit trails (``ethical_crawler.py``'s
whole reason to exist). These queries extend that posture to the release
side of the pipeline, where a 100-TB corpus engine actually leaks data:

* ``k_anonymity_audit`` — the disclosure-risk panel run before any table
  leaves the platform: equivalence-class sizes over the quasi-identifier
  set (nation × market segment × account-balance band), k-anonymity and
  l-diversity minima, and the share of rows sitting in re-identifiable
  (k < 5) classes.
* ``dp_noisy_release_calibration`` — a Laplace-mechanism release of
  per-nation counts (ε = 1) next to the true counts, as the calibration
  harness: noise is generated DETERMINISTICALLY (md5-uniform → inverse
  CDF, the same engine-independent hash idiom as the sampling family) so
  the panel is hash-checkable and reproducible; a production release
  swaps the hash source for a secret seed, nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize
from ..registry import register

#: classes smaller than this are "re-identifiable" in the audit.
_K_SMALL = 5
#: Laplace scale b = 1/epsilon, epsilon = 1.
_DP_B = 1.0
#: P(|Laplace(1)| > 7) ≈ 0.09% — the "noise is broken" line.
_DP_BOUND = 7.0


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH cls AS (
      SELECT c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
             COUNT(*) AS k,
             COUNT(DISTINCT c_acctbal) AS l
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment,
           CAST(SUM(k) AS BIGINT) AS n_rows,
           COUNT(*) AS n_classes,
           MIN(k) AS k_min,
           ROUND(SUM(CASE WHEN k < {_K_SMALL} THEN k ELSE 0 END)::DOUBLE
                 / SUM(k)::DOUBLE, 4) AS pct_rows_small,
           MIN(l) AS l_min,
           ROUND(SUM(k)::DOUBLE / COUNT(*)::DOUBLE, 4) AS avg_class_size
    FROM cls
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit of the customer table under the
    quasi-identifier set (nation, segment, $1000 balance band), rolled up
    per market segment: minimum class size (k), share of rows in classes
    below k=5 (the re-identifiable mass a release gate would block), and
    minimum l-diversity of the sensitive attribute (exact balance) within
    a class.

    Aggregation is TWO-LEVEL (the ``column_profile_orders`` pattern):
    first GROUP BY (QID, sensitive) — map-side combined, the shuffle
    carries one row per distinct (class, value) — then the class stats
    fold the value counts, so k = Σcnt and l = row count with no
    ``countDistinct`` expand doubling the shuffle. This is the
    release-gate complement of the ingest-side compliance gate
    (``sources/compliance.py``)."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("band")
    lvl0 = cust.groupBy(
        "c_mktsegment", "c_nationkey", band, "c_acctbal"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    cls = lvl0.groupBy("c_mktsegment", "c_nationkey", "band").agg(
        F.sum("cnt").alias("k"),
        F.count(F.lit(1)).alias("l"),
    )
    return (
        cls.groupBy("c_mktsegment")
        .agg(
            F.sum("k").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_classes"),
            F.min("k").alias("k_min"),
            F.round(
                F.sum(
                    F.when(F.col("k") < _K_SMALL, F.col("k")).otherwise(0)
                ).cast("double")
                / F.sum("k").cast("double"),
                4,
            ).alias("pct_rows_small"),
            F.min("l").alias("l_min"),
            F.round(
                F.sum("k").cast("double") / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_class_size"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "dp_noisy_release_calibration",
    oracle=f"""
    WITH cnt AS (
      SELECT c_nationkey, COUNT(*) AS true_count
      FROM customer GROUP BY c_nationkey
    ),
    withu AS (
      SELECT c_nationkey, true_count,
             (('0x' || substring(md5('dp:' || CAST(c_nationkey AS VARCHAR)),
                                 1, 8))::BIGINT + 1)::DOUBLE
               / 4294967297.0 AS u
      FROM cnt
    ),
    noised AS (
      SELECT c_nationkey, true_count,
             CASE WHEN u < 0.5 THEN {_DP_B} * ln(2.0 * u)
                  ELSE -{_DP_B} * ln(2.0 * (1.0 - u)) END AS noise
      FROM withu
    )
    SELECT c_nationkey,
           true_count,
           ROUND(true_count + noise, 4) AS noisy_count,
           ROUND(abs(noise), 4) AS abs_err,
           abs(noise) <= {_DP_BOUND} AS within_bound
    FROM noised
    ORDER BY c_nationkey
    """,
)
def dp_noisy_release_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism release of per-nation customer counts (ε = 1)
    with the true counts alongside — the calibration panel a privacy team
    runs BEFORE shipping the noisy-only release: is the noise magnitude
    consistent with the ε guarantee (|noise| ≤ 7 at the 99.9% line), and
    what utility loss does each cell pay?

    Noise is md5-uniform pushed through the Laplace inverse CDF — fully
    deterministic and engine-independent (the hash idiom of the sampling
    family), so the panel is hash-checkable; the aggregation itself is
    one map-side-combined GROUP BY, and the noise math runs on |groups|
    rows — free at any scale. A production release derives u from a
    secret per-release seed instead of a public hash; the plan is
    unchanged."""
    cust = load_table(spark, sf_dir, "customer")
    cnt = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp:"), F.col("c_nationkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ).cast("double") / F.lit(4294967297.0)
    noised = cnt.withColumn(
        "noise",
        F.when(u < 0.5, F.lit(_DP_B) * F.log(2.0 * u)).otherwise(
            -F.lit(_DP_B) * F.log(2.0 * (F.lit(1.0) - u))
        ),
    )
    return noised.select(
        "c_nationkey",
        "true_count",
        F.round(F.col("true_count") + F.col("noise"), 4).alias("noisy_count"),
        F.round(F.abs("noise"), 4).alias("abs_err"),
        (F.abs("noise") <= _DP_BOUND).alias("within_bound"),
    ).orderBy("c_nationkey")


#: t-closeness flag threshold: classes whose banded-balance distribution
#: sits further than this EMD from the global distribution leak.
_T_FLAG = 0.2


@register(
    "t_closeness_audit",
    oracle=f"""
    WITH cb AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM customer GROUP BY 1, 2, 3
    ),
    cls AS (SELECT seg, nat, CAST(SUM(cnt) AS BIGINT) AS k
            FROM cb GROUP BY seg, nat),
    gb AS (SELECT band, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM cb GROUP BY band),
    tot AS (SELECT CAST(SUM(gcnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS m FROM gb),
    grid AS (
      SELECT c.seg, c.nat, c.k, g.band, g.gcnt,
             COALESCE(x.cnt, 0) AS cnt
      FROM cls c CROSS JOIN gb g
      LEFT JOIN cb x ON x.seg = c.seg AND x.nat = c.nat AND x.band = g.band
    ),
    diffs AS (
      SELECT seg, nat, band,
             CAST(ROUND(cnt::DOUBLE / k::DOUBLE, 9) AS DECIMAL(18,9))
             - CAST(ROUND(gcnt::DOUBLE / tot.n::DOUBLE, 9)
                    AS DECIMAL(18,9)) AS d
      FROM grid, tot
    ),
    cum AS (
      SELECT seg, nat, band,
             SUM(d) OVER (PARTITION BY seg, nat ORDER BY band
                          ROWS UNBOUNDED PRECEDING) AS cd
      FROM diffs
    ),
    tcl AS (
      SELECT seg, nat,
             CAST(SUM(CAST(abs(cd) AS DECIMAL(38,9))) AS DOUBLE)
               / (tot.m - 1)::DOUBLE AS t
      FROM cum, tot GROUP BY seg, nat, tot.m
    )
    SELECT seg AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           ROUND(MAX(t), 6) AS t_max,
           ROUND(SUM(CAST(ROUND(t, 9) AS DECIMAL(18,9)))::DOUBLE
                 / COUNT(*), 6) AS t_avg,
           ROUND(SUM(CASE WHEN t > {_T_FLAG} THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS pct_over_t
    FROM tcl GROUP BY seg ORDER BY c_mktsegment
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    release-gate metric k-anonymity and l-diversity both miss: a class
    can be large AND diverse yet still leak if its sensitive-attribute
    DISTRIBUTION differs from the population (skew attack). For every
    (segment, nation) equivalence class, t = the ordered-attribute Earth
    Mover's Distance between the class's $1000-balance-band distribution
    and the global one: EMD = sum_i |cum(p - q)_i| / (m - 1). Per
    segment: worst class, mean, and the share of classes past the
    t={_T_FLAG} release line. Completes the privacy triptych with
    `k_anonymity_audit` (class size / value diversity) and
    `dp_noisy_release_calibration` (noise release).

    Engine-exactness: cumulative sums in a window may TREE-aggregate
    (DuckDB segment trees), so p and q are round-9-quantized to DECIMAL
    BEFORE differencing — the running sum is then exact under any
    association, and every downstream fold stays DECIMAL until the final
    mirrored double division. Scale shape: one map-side-combined
    (class x band) count; the grid is |classes| x |bands| with bands
    calendar-bounded (~12) and the global band table broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("band")
    cb = materialize(
        cust.groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
            band,
        ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    cls = cb.groupBy("seg", "nat").agg(
        F.sum("cnt").cast("long").alias("k")
    )
    gb = cb.groupBy("band").agg(F.sum("cnt").cast("long").alias("gcnt"))
    tot = F.broadcast(
        gb.agg(
            F.sum("gcnt").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("m"),
        )
    )
    grid = (
        cls.crossJoin(F.broadcast(gb))
        .join(cb, ["seg", "nat", "band"], "left")
        .select(
            "seg", "nat", "band", "k", "gcnt",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
        )
        .crossJoin(tot)
    )
    p9 = F.round(
        F.col("cnt").cast("double") / F.col("k").cast("double"), 9
    ).cast("decimal(18,9)")
    q9 = F.round(
        F.col("gcnt").cast("double") / F.col("n").cast("double"), 9
    ).cast("decimal(18,9)")
    w = (
        Window.partitionBy("seg", "nat")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "seg", "nat", "band", "m", (p9 - q9).alias("d")
    ).withColumn("cd", F.sum("d").over(w))
    tcl = cum.groupBy("seg", "nat", "m").agg(
        (
            F.sum(F.abs("cd").cast("decimal(38,9)")).cast("double")
            / (F.col("m") - 1).cast("double")
        ).alias("t")
    )
    nC = F.count(F.lit(1))
    return (
        tcl.groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            nC.cast("long").alias("n_classes"),
            F.round(F.max("t"), 6).alias("t_max"),
            F.round(
                F.sum(F.round(F.col("t"), 9).cast("decimal(18,9)"))
                .cast("double")
                / nC,
                6,
            ).alias("t_avg"),
            F.round(
                F.sum(
                    F.when(F.col("t") > _T_FLAG, 1).otherwise(0)
                ).cast("double")
                / nC,
                6,
            ).alias("pct_over_t"),
        )
        .orderBy("c_mktsegment")
    )


#: deterministic "deletion request" cohort: ~4% of users by md5 residue.
_DEL_RESIDUE = 25


@register(
    "deletion_cascade_audit",
    oracle=f"""
    WITH del AS (
      SELECT DISTINCT user_id FROM events
      WHERE ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
            % {_DEL_RESIDUE} = 0
    ),
    marked AS (
      SELECT e.event_type,
             CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END AS hit,
             CAST(ROUND(e.value, 2) AS DECIMAL(18,2)) AS v
      FROM events e LEFT JOIN del d ON e.user_id = d.user_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(hit) AS BIGINT) AS n_delete,
           ROUND(SUM(hit)::DOUBLE / COUNT(*)::DOUBLE, 6) AS delete_share,
           ROUND(SUM(CASE WHEN hit = 1 THEN v
                          ELSE CAST(0 AS DECIMAL(18,2)) END)::DOUBLE, 2)
             AS value_at_risk
    FROM marked GROUP BY event_type ORDER BY event_type
    """,
)
def deletion_cascade_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: a deterministic ~4% cohort of
    users (md5 residue — standing in for an actual deletion-request
    table) traced through the event store, reporting per event type how
    many rows a GDPR/CCPA erasure would cascade-delete and the metric
    value that disappears with them. The release-side audit a data-
    protection officer runs BEFORE approving the erasure job: a type
    whose delete_share is far from the cohort's user share means those
    users are over-represented in that signal and downstream aggregates
    will shift (the ethical-ingestion posture of the reference —
    ``ethical_crawler.py``'s compliance gates — extended to the right
    of erasure). Swapping the residue for a real request table changes
    one CTE, nothing else.

    Exactness: the cohort is the engine-independent md5-residue idiom;
    counts are integers, values round-2 DECIMAL sums. Scale shape: the
    deletion cohort is a distinct-user semi-join key set (broadcast at
    real request volumes); one linear pass over events with map-side
    combine — exactly the shape of the real delete's dry run."""
    ev = load_table(spark, sf_dir, "events")
    res = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("long")
        % _DEL_RESIDUE
    )
    deld = ev.select("user_id").distinct().filter(res == 0)
    marked = ev.join(
        F.broadcast(deld.withColumn("hit", F.lit(1))), "user_id", "left"
    ).select(
        "event_type",
        F.coalesce("hit", F.lit(0)).alias("hit"),
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("hit").cast("long").alias("n_delete"),
            F.round(
                F.sum("hit").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("delete_share"),
            F.round(
                F.sum(
                    F.when(F.col("hit") == 1, F.col("v")).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double"),
                2,
            ).alias("value_at_risk"),
        )
        .orderBy("event_type")
    )


#: account-balance band widths swept by the generalization curve.
_GEN_BANDS = (500, 1000, 2000, 4000)


@register(
    "generalization_tradeoff_curve",
    oracle=f"""
    WITH widths AS (
      SELECT unnest(ARRAY[{", ".join(str(w) for w in _GEN_BANDS)}]) AS w
    ),
    cls AS (
      SELECT widths.w, c_mktsegment, c_nationkey,
             CAST(floor(c_acctbal / widths.w::DOUBLE) AS BIGINT) AS band,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM customer CROSS JOIN widths
      GROUP BY 1, 2, 3, 4
    )
    SELECT w AS band_width,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           MIN(k) AS k_min,
           CAST(SUM(CASE WHEN k < {_K_SMALL} THEN k ELSE 0 END) AS BIGINT)
             AS rows_small,
           ROUND(SUM(CASE WHEN k < {_K_SMALL} THEN k ELSE 0 END)::DOUBLE
                 / SUM(k)::DOUBLE, 6) AS pct_rows_small,
           ROUND(SUM(k)::DOUBLE / COUNT(*)::DOUBLE, 4) AS avg_class_size
    FROM cls GROUP BY w ORDER BY w
    """,
)
def generalization_tradeoff_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-anonymity generalization ladder: the `k_anonymity_audit`
    quasi-identifier set re-evaluated at four account-balance band
    widths, reporting how k_min and the re-identifiable row mass fall
    as the band coarsens — the utility-vs-privacy curve a release
    reviewer actually negotiates over ("how much resolution must we
    give up before k >= 5?"). The audit panel fixes one banding; this
    one prices the knob.

    Exactness: the sweep is a 4-row broadcast explode; class sizes are
    integers; the two ratios mirror. Scale shape: the explode multiplies
    the one groupBy's input x4 but the shuffle still carries only
    (width, QI-class) combine cells — at 100 TB this is four k-anon
    audits for the price of one pass over the table."""
    cust = load_table(spark, sf_dir, "customer")
    widths = F.explode(
        F.array(*[F.lit(w) for w in _GEN_BANDS])
    ).alias("w")
    cls = (
        cust.select("c_mktsegment", "c_nationkey", "c_acctbal", widths)
        .groupBy(
            "w",
            "c_mktsegment",
            "c_nationkey",
            F.floor(
                F.col("c_acctbal") / F.col("w").cast("double")
            )
            .cast("long")
            .alias("band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    small = F.when(F.col("k") < _K_SMALL, F.col("k")).otherwise(0)
    return (
        cls.groupBy(F.col("w").alias("band_width"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("k").alias("k_min"),
            F.sum(small).cast("long").alias("rows_small"),
            F.round(
                F.sum(small).cast("double") / F.sum("k").cast("double"), 6
            ).alias("pct_rows_small"),
            F.round(
                F.sum("k").cast("double") / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_class_size"),
        )
        .orderBy("band_width")
    )


#: epsilon grid for the utility curve — dyadic values so b = 1/eps is
#: exact in both engines.
_DP_EPS = (0.25, 0.5, 1.0, 2.0)
#: the 99.9% Laplace quantile is ~6.9·b; flag draws past 7·b.
_DP_Q999 = 7.0


@register(
    "dp_epsilon_utility_curve",
    oracle=f"""
    WITH cnt AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM customer GROUP BY c_nationkey
    ),
    eps AS (
      SELECT CAST(unnest(ARRAY[{", ".join(str(e) for e in _DP_EPS)}])
                  AS DOUBLE) AS eps
    ),
    withu AS (
      SELECT e.eps, c.c_nationkey, c.true_count,
             (('0x' || substring(md5('dp:' || CAST(e.eps AS VARCHAR) || ':'
                                     || CAST(c.c_nationkey AS VARCHAR)),
                                 1, 8))::BIGINT + 1)::DOUBLE
               / 4294967297.0 AS u
      FROM cnt c CROSS JOIN eps e
    ),
    noised AS (
      SELECT eps, true_count,
             CASE WHEN u < 0.5 THEN (1.0 / eps) * ln(2.0 * u)
                  ELSE -(1.0 / eps) * ln(2.0 * (1.0 - u)) END AS noise
      FROM withu
    ),
    agg AS (
      SELECT eps,
             CAST(COUNT(*) AS BIGINT) AS n_cells,
             CAST(SUM(true_count) AS BIGINT) AS st,
             SUM(CAST(ROUND(abs(noise), 9) AS DECIMAL(18,9))) AS sa,
             MAX(CAST(ROUND(abs(noise), 9) AS DECIMAL(18,9))) AS mx,
             CAST(SUM(CASE WHEN abs(noise) <= {_DP_Q999} / eps
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_within
      FROM noised GROUP BY eps
    )
    SELECT eps, n_cells,
           ROUND(sa::DOUBLE / n_cells::DOUBLE, 4) AS avg_abs_noise,
           ROUND(mx::DOUBLE, 4) AS max_abs_noise,
           ROUND(sa::DOUBLE / st::DOUBLE, 6) AS rel_err,
           n_within
    FROM agg ORDER BY eps
    """,
)
def dp_epsilon_utility_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The privacy-budget menu: the `dp_noisy_release_calibration`
    release re-priced across an epsilon grid (0.25–2, Laplace scale
    b = 1/eps), reporting mean and max absolute noise, noise as a share
    of the released mass (the utility loss), and how many cells stay
    inside the 99.9% quantile. This is the table a privacy review
    actually bargains over — the audit panel fixes eps = 1; this one
    shows what each step of the budget buys, so the "can we afford
    eps = 0.5?" conversation happens over numbers instead of vibes.

    Determinism: one md5-uniform draw per (eps, cell) through the
    Laplace inverse CDF (the calibration panel's idiom — mirrored ln
    expression); |noise| is round-9-quantized to DECIMAL before the
    mean/max so the rollup is order-free. Scale shape: noise math runs
    on |eps| x |groups| rows — free at any scale; the only corpus pass
    is the one map-side-combined GROUP BY."""
    cust = load_table(spark, sf_dir, "customer")
    cnt = cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("true_count")
    )
    eps = F.explode(
        F.array(*[F.lit(float(e)) for e in _DP_EPS])
    ).alias("eps")
    withe = cnt.select("c_nationkey", "true_count", eps)
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("dp:"),
                        F.col("eps").cast("string"),
                        F.lit(":"),
                        F.col("c_nationkey").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ).cast("double") / F.lit(4294967297.0)
    b = F.lit(1.0) / F.col("eps")
    noise = F.when(u < 0.5, b * F.log(2.0 * u)).otherwise(
        -b * F.log(2.0 * (F.lit(1.0) - u))
    )
    noised = withe.select(
        "eps",
        "true_count",
        noise.alias("noise"),
    )
    an9 = F.round(F.abs("noise"), 9).cast("decimal(18,9)")
    agg = noised.groupBy("eps").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("true_count").cast("long").alias("st"),
        F.sum(an9).alias("sa"),
        F.max(an9).alias("mx"),
        F.sum(
            F.when(
                F.abs("noise") <= F.lit(_DP_Q999) / F.col("eps"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_within"),
    )
    return agg.select(
        "eps",
        "n_cells",
        F.round(
            F.col("sa").cast("double") / F.col("n_cells").cast("double"), 4
        ).alias("avg_abs_noise"),
        F.round(F.col("mx").cast("double"), 4).alias("max_abs_noise"),
        F.round(
            F.col("sa").cast("double") / F.col("st").cast("double"), 6
        ).alias("rel_err"),
        "n_within",
    ).orderBy("eps")
