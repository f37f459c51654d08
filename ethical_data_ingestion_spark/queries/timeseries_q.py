"""Time-series / product-analytics queries over the events table.

The hypertable-style operations a timeseries-aware engine ships and the
reference's roadmap gestures at ("data feeds", `README.txt:24`; the
`ingested_at` temporal index, `ethical_crawler.py:886`) but never builds:
gap-filled resampling, funnel conversion, cohort retention, and
gaps-and-islands run analysis. All pure DataFrame ops — one shuffle on the
entity key each, no UDFs, so every plan survives a 100× scale-up unchanged
(the shuffle key is `user_id`; state per key is bounded by that user's
activity, never by corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize
from ..registry import register


@register(
    "gap_fill_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value,
             COUNT(*) AS n_events
      FROM events
      GROUP BY 1, 2
    ),
    spanned AS (
      SELECT *,
             LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
      FROM daily
    )
    SELECT s.user_id,
           CAST(gs.d AS DATE) AS day,
           CAST(gs.d AS DATE) = s.day AS is_observed,
           s.day_value AS filled_value,
           CASE WHEN CAST(gs.d AS DATE) = s.day THEN s.n_events ELSE 0 END
             AS n_events
    FROM spanned s,
         unnest(generate_series(
           CAST(s.day AS TIMESTAMP),
           CAST(COALESCE(s.next_day - 1, s.day) AS TIMESTAMP),
           INTERVAL 1 DAY)) gs(d)
    ORDER BY user_id, day
    """,
)
def gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily resample with forward fill (the hypertable
    ``time_bucket_gapfill`` + ``locf`` shape): one row per user per
    calendar day between that user's first and last active day, carrying
    the last observed day's total on silent days.

    Plan: aggregate to user-days first (corpus-linear scan, map-side
    combined), THEN generate gap rows from each observed day up to its
    successor (``lead`` + ``sequence`` + ``explode``). The explode runs on
    the already-aggregated table, so the fill never touches raw-event
    volume — output is |users| x |span days| regardless of event count,
    and the only shuffle is the user_id window. The forward-fill value
    rides along with the generating row: no second join, no
    last-ignorenulls pass over the spine.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("user_id").orderBy("day")
    spanned = daily.withColumn("next_day", F.lead("day").over(w))
    return (
        spanned.select(
            "user_id",
            "day_value",
            "n_events",
            F.col("day").alias("d0"),
            F.explode(
                F.sequence(
                    "day",
                    F.coalesce(F.date_sub("next_day", 1), F.col("day")),
                )
            ).alias("day"),
        )
        .select(
            "user_id",
            "day",
            (F.col("day") == F.col("d0")).alias("is_observed"),
            F.col("day_value").alias("filled_value"),
            F.when(F.col("day") == F.col("d0"), F.col("n_events"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_events"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "funnel_conversion",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    with_click AS (
      SELECT e.user_id, p.t_view,
             MIN(CASE WHEN e.event_type = 'click' AND e.ts >= p.t_view
                      THEN e.ts END) AS t_click
      FROM events e JOIN per_user p USING (user_id)
      GROUP BY e.user_id, p.t_view
    ),
    with_purchase AS (
      SELECT e.user_id, c.t_view, c.t_click,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= c.t_click
                      THEN e.ts END) AS t_purchase
      FROM events e JOIN with_click c USING (user_id)
      GROUP BY e.user_id, c.t_view, c.t_click
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_view) AS n_viewed,
           COUNT(t_click) AS n_clicked_after_view,
           COUNT(t_purchase) AS n_purchased_after_click,
           ROUND(COUNT(t_purchase)::DOUBLE / NULLIF(COUNT(t_view), 0), 6)
             AS view_to_purchase_rate
    FROM with_purchase
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase: a user converts a stage
    only with an event at-or-after their previous stage's first event.

    The staged minima are windows over ``user_id`` that each reference the
    previous stage's column — all on one partitioning, so Catalyst plans a
    single exchange and evaluates the three passes on the sorted runs
    in-place (vs. the oracle's three self-join aggregations). Final rollup
    is a singleton reduce of one row per user."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .groupBy("user_id")
        .agg(
            F.max("t_view").alias("t_view"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_purchase").alias("n_purchased_after_click"),
        F.round(
            F.count("t_purchase").cast("double")
            / F.nullif(F.count("t_view"), F.lit(0)),
            6,
        ).alias("view_to_purchase_rate"),
    )


def _guarded_day_mask() -> F.Column:
    """``1 << day_idx`` with a loud range guard: Spark's shiftleft silently
    wraps the shift amount mod 64 (and mangles negatives), so a day
    outside the [0, 63] window would corrupt masks with no signal — while
    the DuckDB oracle raises Out of Range for the same input. Match the
    oracle's behavior: raise_error instead of silent wrap."""
    return F.expr(
        "CASE WHEN day_idx BETWEEN 0 AND 63 "
        "THEN shiftleft(cast(1 as bigint), day_idx) "
        "ELSE CAST(raise_error(concat('activity_bitmap_stats: day_idx ', "
        "cast(day_idx as string), "
        "' outside the 64-day window from the epoch')) AS BIGINT) END"
    )


@register(
    "activity_bitmap_stats",
    oracle="""
    WITH masks AS (
      SELECT user_id,
             bit_or(1::BIGINT << CAST(date_diff('day', DATE '2024-01-01',
                    CAST(date_trunc('day', ts) AS DATE)) AS INTEGER)) AS mask
      FROM events
      GROUP BY user_id
    ),
    counted AS (
      SELECT user_id, bit_count(mask) AS n_active_days,
             CAST(mask & 127 AS BIGINT) AS first_week_mask
      FROM masks
    )
    SELECT n_active_days,
           COUNT(*) AS n_users,
           COUNT(*) FILTER (WHERE first_week_mask = 127) AS n_full_first_week
    FROM counted
    GROUP BY n_active_days
    ORDER BY n_active_days
    """,
)
def activity_bitmap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity as a bit-packed day mask (bit i = active on day
    i), aggregated to the active-day distribution — the bitmap-index
    trick behind engagement/retention systems at scale: a month of
    presence collapses to ONE int64 per user, set operations (streaks,
    'active all of week 1') become bitwise ANDs, and the shuffle carries
    8 bytes per user instead of per-event rows. ``bit_or`` combines
    map-side like any commutative aggregate.

    The single-word mask covers 64 days from the 2024-01-01 epoch
    (fixtures span 30); an event outside that window raises (matching the
    oracle's Out of Range) rather than silently wrapping — longer horizons
    take an (epoch_word, mask) pair, i.e. one extra group-by key."""
    ev = load_table(spark, sf_dir, "events")
    day_idx = F.datediff(
        F.to_date("ts"), F.lit("2024-01-01").cast("date")
    ).cast("int")
    masks = (
        ev.withColumn("day_idx", day_idx)
        .groupBy("user_id")
        .agg(F.bit_or(_guarded_day_mask()).alias("mask"))
    )
    counted = masks.select(
        "user_id",
        F.bit_count("mask").alias("n_active_days"),
        (F.col("mask").bitwiseAND(F.lit(127))).cast("long").alias(
            "first_week_mask"
        ),
    )
    return (
        counted.groupBy("n_active_days")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(
                (F.col("first_week_mask") == 127).cast("long")
            ).alias("n_full_first_week"),
        )
        .orderBy("n_active_days")
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week,
           CAST(floor(date_diff('day',
                CAST(date_trunc('day', f.first_ts) AS DATE),
                CAST(date_trunc('day', e.ts) AS DATE)) / 7.0) AS BIGINT)
             AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active_users,
           COUNT(*) AS n_events
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the ISO week of their
    first event; activity counted per whole-week offset since that first
    day. One window (min ts per user) on the same user_id exchange the
    activity rows already need, then a cohort x offset aggregate whose
    output is |weeks|^2 — constant-sized, never data-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    tagged = ev.withColumn("first_ts", F.min("ts").over(w))
    return (
        tagged.groupBy(
            F.date_trunc("week", "first_ts").cast("date").alias("cohort_week"),
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("first_ts")) / 7.0
            ).alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_active_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "moving_avg_7d",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events
      GROUP BY 1, 2
    )
    SELECT user_id, day,
           CAST(SUM(CAST(day_value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_7d,
           COUNT(*) OVER w AS n_days_active_7d
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    ORDER BY user_id, day
    """,
)
def moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling aggregate per user over the daily series —
    the RANGE-frame window (value-based, not row-based: silent days
    genuinely fall out of the frame, which a ROWS frame gets wrong).

    Spark's rangeBetween needs a numeric ordering key, so the frame runs
    over ``datediff`` from the epoch — day-granular integers, with the
    trailing week as ``rangeBetween(-6, 0)``. Same single user_id
    exchange as the daily pre-aggregate; the frame scan is linear per
    partition (running frame, not re-scan-per-row)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.datediff("day", F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "user_id",
        "day",
        F.sum(F.col("day_value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_7d"),
        F.count(F.lit(1)).over(w).alias("n_days_active_7d"),
    ).orderBy("user_id", "day")


@register(
    "event_type_runs",
    oracle="""
    WITH numbered AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
           - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS island,
             user_id
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, island, COUNT(*) AS run_len
      FROM numbered GROUP BY 1, 2, 3
    )
    SELECT event_type,
           COUNT(*) AS n_runs,
           MAX(run_len) AS max_run_len,
           ROUND(CAST(SUM(run_len) AS DOUBLE) / COUNT(*), 4) AS avg_run_len
    FROM runs
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_type_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive same-type runs inside each user's
    event stream (the classic rownum-difference trick), rolled up to run
    statistics per type — the shape behind streak detection, bot
    flagging (impossibly long runs), and repeated-failure alerts.

    Both row_numbers sort the same ``user_id`` runs, so Catalyst plans ONE
    exchange + sort and evaluates the two windows on it back-to-back; the
    island group-by then combines map-side."""
    ev = load_table(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_ut = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    runs = (
        ev.select(
            "user_id",
            "event_type",
            (F.row_number().over(w_u) - F.row_number().over(w_ut)).alias(
                "island"
            ),
        )
        .groupBy("user_id", "event_type", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").alias("max_run_len"),
            F.round(
                F.sum("run_len").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_run_len"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-5 widening: recency weighting and changepoint detection.

#: Daily decay-weight table for a 7-day half-life, PRECOMPUTED in Python
#: and embedded as the same decimal literals in both engines: libm exp()
#: is not guaranteed correctly rounded, so evaluating exp per row risks
#: last-ulp divergence at rounding boundaries; a shared literal table is
#: deterministic by construction. 64 entries cover any fixture span;
#: ages beyond the table decay to 0 (the weight is < 2e-3 by day 63).
import math as _math

_DECAY_WEIGHTS = [
    round(_math.exp(-_math.log(2) / 7 * d), 10) for d in range(64)
]


def _decay_case_sql() -> str:
    whens = " ".join(
        f"WHEN {d} THEN {w!r}" for d, w in enumerate(_DECAY_WEIGHTS)
    )
    return f"CASE age_day {whens} ELSE 0.0 END"


@register(
    "time_decay_scores",
    oracle=f"""
    WITH anchor AS (
      SELECT CAST(floor(epoch(MAX(ts))) AS BIGINT) AS mx FROM events
    ),
    aged AS (
      SELECT event_type, value,
             CAST((anchor.mx - CAST(floor(epoch(ts)) AS BIGINT)) // 86400
                  AS INTEGER) AS age_day
      FROM events, anchor
    ),
    w AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) AS DECIMAL(18,8)) AS pv,
             CAST(ROUND(value * ({{decay_case}}), 8) AS DECIMAL(18,8)) AS wv
      FROM aged
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(pv) AS DOUBLE), 4) AS plain_sum,
           ROUND(CAST(SUM(wv) AS DOUBLE), 4) AS decayed_sum,
           ROUND(CAST(SUM(wv) AS DOUBLE) / CAST(SUM(pv) AS DOUBLE), 6)
             AS freshness_ratio
    FROM w
    GROUP BY event_type
    ORDER BY event_type
    """.replace("{decay_case}", _decay_case_sql()),
)
def time_decay_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay aggregates (7-day half-life at daily
    granularity, anchored at the newest event): the recency-weighted
    totals behind trending scores, decayed user affinities, and
    freshness-weighted feature stores — where a plain SUM treats a
    month-old event like today's. The freshness ratio (decayed/plain)
    per type quantifies how front-loaded each type's value mass is.

    Engine-exactness: ages are WHOLE days of whole seconds (DuckDB's
    fractional ``epoch()`` floored to match Spark's truncating
    ``unix_timestamp``), and the weights come from a precomputed literal
    table shared by both engines — no per-row libm ``exp`` whose
    last-ulp behavior differs across platforms. Weighted values round
    to 8 and sum in DECIMAL (partition-order-proof). One map-side
    combined pass; the anchor is a scalar aggregate."""
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.unix_timestamp(F.max("ts")).alias("mx"))
    age_day = F.expr("(mx - unix_timestamp(ts)) div 86400").cast("int")
    weight = F.element_at(
        F.array(*[F.lit(w) for w in _DECAY_WEIGHTS]),
        F.least(age_day, F.lit(len(_DECAY_WEIGHTS) - 1)) + 1,
    )
    # element_at covers ages 0..62; exact-age-63+ rows take the table's
    # last entry on the Spark side vs 0.0 in SQL — guard to 0 beyond the
    # table to match the mirror exactly
    weight = F.when(age_day < len(_DECAY_WEIGHTS), weight).otherwise(F.lit(0.0))
    w = ev.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.col("value").cast("decimal(18,2)").cast("decimal(18,8)").alias("pv"),
        F.round(F.col("value") * weight, 8).cast("decimal(18,8)").alias("wv"),
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("pv").cast("double"), 4).alias("plain_sum"),
            F.round(F.sum("wv").cast("double"), 4).alias("decayed_sum"),
            F.round(
                F.sum("wv").cast("double") / F.sum("pv").cast("double"), 6
            ).alias("freshness_ratio"),
        )
        .orderBy("event_type")
    )


@register(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS x
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT COUNT(*) AS n_days, CAST(SUM(x) AS BIGINT) AS total FROM daily
    ),
    pref AS (
      SELECT day,
             ROW_NUMBER() OVER (ORDER BY day) AS i,
             SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cx
      FROM daily
    ),
    s AS (
      SELECT day,
             CAST(tot.n_days * cx - pref.i * tot.total AS BIGINT) AS s_scaled
      FROM pref, tot
    )
    SELECT (SELECT n_days FROM tot) AS n_days,
           (SELECT total FROM tot) AS total_events,
           day AS changepoint_day,
           CAST(abs(s_scaled) AS BIGINT) AS max_cusum_scaled
    FROM s
    ORDER BY abs(s_scaled) DESC, day
    LIMIT 1
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over the daily event-count series: the
    day where the cumulative deviation from the overall mean peaks — the
    classic level-shift locator for "when did traffic change". Scaled to
    stay INTEGER-exact: S'_d = n_days·Σ_{i≤d}x_i − d·total is n_days
    times the usual CUSUM, so the argmax is identical and every value is
    a BIGINT (no mean-as-double anywhere — the statistic itself is
    hash-checked, not just the location).

    The daily rollup is corpus-scale (map-side combined); everything
    after runs on |days| rows, where the unbounded window is the
    documented benign k-row case. Ties break on the earliest day in
    both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").cast("long").alias("total"),
    )
    wd = Window.orderBy("day")
    pref = daily.select(
        "day",
        F.row_number().over(wd).alias("i"),
        F.sum("x").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("cx"),
    )
    s = pref.crossJoin(F.broadcast(tot)).select(
        "day",
        "n_days",
        "total",
        (F.col("n_days") * F.col("cx") - F.col("i") * F.col("total"))
        .cast("long")
        .alias("s_scaled"),
    )
    return (
        s.orderBy(F.abs(F.col("s_scaled")).desc(), "day")
        .limit(1)
        .select(
            "n_days",
            F.col("total").alias("total_events"),
            F.col("day").alias("changepoint_day"),
            F.abs(F.col("s_scaled")).cast("long").alias("max_cusum_scaled"),
        )
    )


#: Candidate seasonal periods (days) probed by the DFT panel — chosen to
#: fit the fixture's 30-day event window (≥2 full cycles each).
_DFT_PERIODS = (7, 10, 15)


@register(
    "seasonality_dft_stats",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    b AS (SELECT MIN(day) AS d0, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx FROM daily),
    idx AS (
      SELECT date_diff('day', b.d0, d.day) AS t,
             CAST(d.x AS DECIMAL(18,6))
               - CAST(ROUND(b.sx::DOUBLE / b.n::DOUBLE, 6)
                      AS DECIMAL(18,6)) AS xc,
             b.n
      FROM daily d, b
    ),
    per AS (SELECT CAST(x AS INTEGER) AS period
            FROM (VALUES ({'), ('.join(str(p) for p in _DFT_PERIODS)})) v(x)),
    terms AS (
      SELECT p.period, i.n,
             CAST(i.xc * CAST(ROUND(cos(2 * pi() * i.t / p.period), 9)
                              AS DECIMAL(18,9)) AS DECIMAL(38,15)) AS tc,
             CAST(i.xc * CAST(ROUND(sin(2 * pi() * i.t / p.period), 9)
                              AS DECIMAL(18,9)) AS DECIMAL(38,15)) AS ts_
      FROM idx i, per p
    ),
    sums AS (
      SELECT period, MAX(n) AS n,
             CAST(SUM(tc) AS DOUBLE) AS a,
             CAST(SUM(ts_) AS DOUBLE) AS bb
      FROM terms GROUP BY period
    )
    SELECT period,
           CAST(n AS BIGINT) AS n_days,
           ROUND(a, 6) AS a_cos,
           ROUND(bb, 6) AS b_sin,
           ROUND(2.0 * sqrt(a * a + bb * bb) / n, 6) AS amplitude
    FROM sums
    ORDER BY period
    """,
)
def seasonality_dft_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality detection by explicit DFT probe: the daily event-count
    series, mean-removed, projected onto cos/sin at candidate periods
    {_DFT_PERIODS} days — the amplitude column ranks which cycle length
    actually structures the traffic (on the fixture the three amplitudes
    sit near the noise floor and the ranking flips with scale — exactly
    the honest readout: no strong cycle, don't schedule around one). The spectral complement of `cusum_changepoint`
    (level shifts) and `moving_avg_7d` (smoothing): a pipeline scheduler
    reads this to pick its re-ingest cadence.

    Float discipline: cos/sin terms are rounded to 9 dp and CAST TO
    DECIMAL before multiplying the (also-DECIMAL) centered counts, so
    Sigma-a and Sigma-b are order-insensitive and engine-exact; pi() is
    the same IEEE double in both engines; amplitude is one mirrored
    double expression. The series is CALENDAR-BOUNDED (one row per day)
    so every aggregate after the daily rollup is over a tiny table — at
    100 TB the only big step is the map-side-combined daily count."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    b = F.broadcast(
        daily.agg(
            F.min("day").alias("d0"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
        )
    )
    mean6 = F.round(
        F.col("sx").cast("double") / F.col("n").cast("double"), 6
    ).cast("decimal(18,6)")
    idx = daily.crossJoin(b).select(
        F.datediff(F.col("day"), F.col("d0")).alias("t"),
        (F.col("x").cast("decimal(18,6)") - mean6).alias("xc"),
        "n",
    )
    per = F.explode(
        F.array(*[F.lit(p) for p in _DFT_PERIODS])
    ).alias("period")
    two_pi_t = F.lit(2.0) * F.expr("pi()") * F.col("t")
    c9 = F.round(F.cos(two_pi_t / F.col("period")), 9).cast("decimal(18,9)")
    s9 = F.round(F.sin(two_pi_t / F.col("period")), 9).cast("decimal(18,9)")
    terms = idx.select("t", "xc", "n", per).select(
        "period",
        "n",
        (F.col("xc") * c9).cast("decimal(38,15)").alias("tc"),
        (F.col("xc") * s9).cast("decimal(38,15)").alias("ts_"),
    )
    sums = terms.groupBy("period").agg(
        F.max("n").alias("n"),
        F.sum("tc").cast("double").alias("a"),
        F.sum("ts_").cast("double").alias("bb"),
    )
    return sums.select(
        "period",
        F.col("n").cast("long").alias("n_days"),
        F.round("a", 6).alias("a_cos"),
        F.round("bb", 6).alias("b_sin"),
        F.round(
            F.lit(2.0)
            * F.sqrt(F.col("a") * F.col("a") + F.col("bb") * F.col("bb"))
            / F.col("n"),
            6,
        ).alias("amplitude"),
    ).orderBy("period")


#: EWMA forecast backtest: smoothing factor (alpha) of the one-step
#: forecaster compared against the naive last-value baseline.
_EWMA_ALPHA = 0.3


@register(
    "forecast_backtest_stats",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    b AS (SELECT MIN(day) AS d0 FROM daily),
    idx AS (SELECT date_diff('day', b.d0, d.day) AS t, d.x
            FROM daily d, b),
    ew AS (
      SELECT cur.t, cur.x,
             -- x is an integer count: scale-0, width-12 keeps the
             -- product's internal width at 12+18=30 (int128 path) —
             -- DECIMAL(18,6) * DECIMAL(18,9) overflowed DuckDB's int64
             -- multiply at sf0.1 daily volumes (x ~ 3344)
             CAST(SUM(CAST(prev.x AS DECIMAL(12,0))
                      * CAST(ROUND({_EWMA_ALPHA}
                              * pow({1 - _EWMA_ALPHA}, cur.t - 1 - prev.t),
                              9) AS DECIMAL(18,9)))
                  AS DECIMAL(38,15)) AS yhat_raw,
             CAST(SUM(CAST(ROUND({_EWMA_ALPHA}
                            * pow({1 - _EWMA_ALPHA}, cur.t - 1 - prev.t),
                            9) AS DECIMAL(18,9)))
                  AS DECIMAL(38,15)) AS wsum
      FROM idx cur JOIN idx prev ON prev.t < cur.t
      GROUP BY cur.t, cur.x
    ),
    scored AS (
      SELECT 'ewma' AS method, t, x,
             ROUND(CAST(yhat_raw AS DOUBLE) / CAST(wsum AS DOUBLE), 6)
               AS yhat
      FROM ew
      UNION ALL
      SELECT 'naive', cur.t, cur.x, CAST(prev.x AS DOUBLE)
      FROM idx cur JOIN idx prev ON prev.t = cur.t - 1
    ),
    err AS (
      SELECT method, t,
             CAST(ROUND(abs(x - yhat), 6) AS DECIMAL(18,6)) AS ae,
             CAST(ROUND((x - yhat) * (x - yhat), 6)
                  AS DECIMAL(28,6)) AS se,
             CAST(ROUND(abs(x - yhat) / x, 9) AS DECIMAL(18,9)) AS ape
      FROM scored
    )
    SELECT method,
           CAST(COUNT(*) AS BIGINT) AS n_forecasts,
           ROUND(CAST(SUM(ae) AS DOUBLE) / COUNT(*), 4) AS mae,
           ROUND(sqrt(CAST(SUM(se) AS DOUBLE) / COUNT(*)), 4) AS rmse,
           ROUND(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 4) AS mape
    FROM err GROUP BY method ORDER BY method
    """,
)
def forecast_backtest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead forecast backtest over the daily event-count
    series: an EWMA forecaster (alpha={_EWMA_ALPHA}, weights renormalized
    over the available prefix) against the naive last-value baseline —
    MAE / RMSE / MAPE per method. The capacity-planning sanity panel: if
    smoothing can't beat "tomorrow = today", the series has no
    exploitable structure (cf. `seasonality_dft_stats`) and the pipeline
    scheduler shouldn't pretend otherwise.

    The EWMA prefix convolution is an explicit pair join on the
    CALENDAR-BOUNDED daily table (n days → C(n,2) term rows — tiny at
    any corpus size), with every weight rounded to 9 dp and accumulated
    in DECIMAL so forecasts are engine-exact; error aggregates use the
    same round-then-DECIMAL discipline. At 100 TB only the daily rollup
    touches the event volume."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    b = F.broadcast(daily.agg(F.min("day").alias("d0")))
    idx = daily.crossJoin(b).select(
        F.datediff(F.col("day"), F.col("d0")).alias("t"), "x"
    )
    cur = idx.alias("cur")
    prev = idx.alias("prev")
    w9 = F.round(
        F.lit(_EWMA_ALPHA)
        * F.pow(F.lit(1 - _EWMA_ALPHA), F.col("cur.t") - 1 - F.col("prev.t")),
        9,
    ).cast("decimal(18,9)")
    ew = (
        cur.join(prev, F.col("prev.t") < F.col("cur.t"))
        .groupBy(F.col("cur.t").alias("t"), F.col("cur.x").alias("x"))
        .agg(
            F.sum(
                (F.col("prev.x").cast("decimal(18,6)") * w9).cast(
                    "decimal(38,15)"
                )
            ).alias("yhat_raw"),
            F.sum(w9.cast("decimal(38,15)")).alias("wsum"),
        )
    )
    ewma = ew.select(
        F.lit("ewma").alias("method"),
        "t",
        "x",
        F.round(
            F.col("yhat_raw").cast("double") / F.col("wsum").cast("double"),
            6,
        ).alias("yhat"),
    )
    naive = (
        cur.join(prev, F.col("prev.t") == F.col("cur.t") - 1)
        .select(
            F.lit("naive").alias("method"),
            F.col("cur.t").alias("t"),
            F.col("cur.x").alias("x"),
            F.col("prev.x").cast("double").alias("yhat"),
        )
    )
    e = F.col("x") - F.col("yhat")
    err = ewma.union(naive).select(
        "method",
        F.round(F.abs(e), 6).cast("decimal(18,6)").alias("ae"),
        F.round(e * e, 6).cast("decimal(28,6)").alias("se"),
        F.round(F.abs(e) / F.col("x"), 9).cast("decimal(18,9)").alias("ape"),
    )
    return (
        err.groupBy("method")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_forecasts"),
            F.round(
                F.sum("ae").cast("double") / F.count(F.lit(1)), 4
            ).alias("mae"),
            F.round(
                F.sqrt(F.sum("se").cast("double") / F.count(F.lit(1))), 4
            ).alias("rmse"),
            F.round(
                F.sum("ape").cast("double") / F.count(F.lit(1)), 4
            ).alias("mape"),
        )
        .orderBy("method")
    )


#: ACF probe lags (days) for the autocorrelation panel.
_ACF_MAX_LAG = 14


@register(
    "acf_daily_stats",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    b AS (SELECT MIN(day) AS d0, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx
          FROM daily),
    idx AS (
      SELECT date_diff('day', b.d0, d.day) AS t,
             CAST(d.x AS DECIMAL(18,6))
               - CAST(ROUND(b.sx::DOUBLE / b.n::DOUBLE, 6)
                      AS DECIMAL(18,6)) AS xc
      FROM daily d, b
    ),
    den AS (
      SELECT CAST(SUM(CAST(xc * xc AS DECIMAL(38,12))) AS DOUBLE) AS s0
      FROM idx
    ),
    lag_ AS (SELECT CAST(x AS INTEGER) AS lag
             FROM range(1, {_ACF_MAX_LAG} + 1) v(x)),
    num AS (
      SELECT l.lag,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(a.xc * f.xc AS DECIMAL(38,12))) AS DOUBLE) AS sl
      FROM lag_ l
      JOIN idx a ON TRUE
      JOIN idx f ON f.t = a.t + l.lag
      GROUP BY l.lag
    )
    SELECT n.lag, n.n_pairs,
           ROUND(n.sl / d.s0, 6) AS acf
    FROM num n, den d
    ORDER BY n.lag
    """,
)
def acf_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..{_ACF_MAX_LAG}: r(l) = sum(xc_t * xc_(t+l)) / sum(xc_t^2) over the
    mean-removed counts. The time-domain complement of
    `seasonality_dft_stats` (which probes three FIXED candidate periods):
    the ACF scans EVERY short lag, so a weekly rhythm shows up as a bump
    at lag 7 without having to guess the period first. A pipeline
    scheduler reads both panels together before picking a re-ingest
    cadence.

    Float discipline (the `seasonality_dft_stats` pattern): daily counts
    are exact BIGINTs; the mean is rounded to 6 dp then the centered
    values live in DECIMAL(18,6); every product is CAST to
    DECIMAL(38,12) before summing, so numerator and denominator are
    order-insensitive exact and the single double division at the end is
    engine-exact. Scale shape: the only corpus-scale step is the
    map-side-combined daily count; the lag self-join runs on the
    CALENDAR-BOUNDED daily table (n_days x {_ACF_MAX_LAG} pair rows)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    b = F.broadcast(
        daily.agg(
            F.min("day").alias("d0"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
        )
    )
    mean6 = F.round(
        F.col("sx").cast("double") / F.col("n").cast("double"), 6
    ).cast("decimal(18,6)")
    idx = materialize(
        daily.crossJoin(b).select(
            F.datediff(F.col("day"), F.col("d0")).alias("t"),
            (F.col("x").cast("decimal(18,6)") - mean6).alias("xc"),
        )
    )
    den = F.broadcast(
        idx.agg(
            F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,12)"))
            .cast("double")
            .alias("s0")
        )
    )
    lags = F.explode(
        F.array(*[F.lit(l) for l in range(1, _ACF_MAX_LAG + 1)])
    ).alias("lag")
    a = idx.select("t", "xc", lags).alias("a")
    f2 = idx.alias("f")
    num = (
        a.join(f2, F.col("f.t") == F.col("a.t") + F.col("a.lag"))
        .groupBy("a.lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                (F.col("a.xc") * F.col("f.xc")).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("sl"),
        )
    )
    return (
        num.crossJoin(den)
        .select(
            "lag",
            "n_pairs",
            F.round(F.col("sl") / F.col("s0"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


#: activity tiers for the burstiness rollup (by interval count) — bounds
#: chosen to straddle the fixture's 48-87 interval range so every tier is
#: populated at every SF (the generator's per-user activity is SF-stable).
_BURST_TIERS_SQL = """CASE WHEN n_iv < 55 THEN 'a_lt_55'
             WHEN n_iv < 65 THEN 'b_55_64'
             WHEN n_iv < 75 THEN 'c_65_74'
             ELSE 'd_75_plus' END"""


@register(
    "interevent_burstiness_stats",
    oracle=f"""
    WITH secs AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             LAG(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    iv AS (
      SELECT user_id, sec - prev AS dt FROM secs WHERE prev IS NOT NULL
    ),
    per AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_iv,
             CAST(SUM(dt) AS BIGINT) AS s1,
             SUM(CAST(dt AS DECIMAL(38,0)) * CAST(dt AS DECIMAL(38,0)))
               AS s2
      FROM iv GROUP BY user_id HAVING COUNT(*) >= 2
    ),
    sc AS (
      SELECT {_BURST_TIERS_SQL} AS tier, n_iv,
             s1::DOUBLE / n_iv::DOUBLE AS mu,
             sqrt(greatest(s2::DOUBLE / n_iv::DOUBLE
                  - (s1::DOUBLE / n_iv::DOUBLE)
                    * (s1::DOUBLE / n_iv::DOUBLE), 0.0)) AS sigma
      FROM per
    ),
    b AS (
      SELECT tier, n_iv, mu,
             CASE WHEN sigma + mu > 0
                  THEN (sigma - mu) / (sigma + mu) END AS burst
      FROM sc
    )
    SELECT tier,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
           ROUND(SUM(CAST(ROUND(mu, 6) AS DECIMAL(18,6)))::DOUBLE
                 / COUNT(*), 4) AS avg_gap_sec,
           ROUND(SUM(CAST(ROUND(burst, 9) AS DECIMAL(18,9)))::DOUBLE
                 / COUNT(*), 6) AS avg_burstiness,
           ROUND(SUM(CASE WHEN burst > 0.1 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS pct_bursty
    FROM b GROUP BY tier ORDER BY tier
    """,
)
def interevent_burstiness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabasi burstiness of each user's event stream, rolled up by
    activity tier: B = (sigma - mu)/(sigma + mu) over the user's
    inter-event gaps (whole seconds) — B near -1 is a metronome, 0 is
    Poisson, toward +1 is bursty sessions separated by long silences.
    The panel tells a sessionizer whether gap-based session windows
    (`session_windows_30m`) will cut anything real, and a rate-limit
    designer what peak-to-mean to expect per activity tier.

    Engine-exactness: gaps are exact BIGINTs off the shared
    floor(epoch)/unix_timestamp idiom (`time_decay_scores`); per-user
    moment sums are integer/DECIMAL exact; mu/sigma/B are mirrored
    double expressions (variance clamped at 0 against FP cancellation
    — same guard both sides); per-tier averages quantize round-9 to
    DECIMAL. ANSI guard: sigma+mu = 0 (all gaps zero) yields NULL in
    both engines and NULLs skip both SUM and the average count... so B
    averages are over scoreable users only via the DECIMAL sum of
    non-null terms divided by COUNT(*) — a user with all-zero gaps
    would deflate; the fixture has none and HAVING >= 2 keeps the
    estimator defined. Scale shape: one windowed pass partitioned by
    user, map-side-combined moments, |tiers| rows after."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.unix_timestamp("ts")
    secs = ev.select(
        "user_id",
        sec.alias("sec"),
        F.lag(sec).over(w).alias("prev"),
    ).filter(F.col("prev").isNotNull())
    dtd = (F.col("sec") - F.col("prev")).cast("decimal(38,0)")
    per = (
        secs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_iv"),
            F.sum(F.col("sec") - F.col("prev")).cast("long").alias("s1"),
            F.sum(dtd * dtd).alias("s2"),
        )
        .filter(F.col("n_iv") >= 2)
    )
    nd = F.col("n_iv").cast("double")
    mu = F.col("s1").cast("double") / nd
    sigma = F.sqrt(
        F.greatest(F.col("s2").cast("double") / nd - mu * mu, F.lit(0.0))
    )
    sc = per.select(
        F.expr(_BURST_TIERS_SQL).alias("tier"),
        "n_iv",
        mu.alias("mu"),
        sigma.alias("sigma"),
    )
    burst = F.when(
        F.col("sigma") + F.col("mu") > 0,
        (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")),
    )
    b = sc.select("tier", "n_iv", "mu", burst.alias("burst"))
    n = F.count(F.lit(1))
    return (
        b.groupBy("tier")
        .agg(
            n.cast("long").alias("n_users"),
            F.sum("n_iv").cast("long").alias("n_intervals"),
            F.round(
                F.sum(F.round(F.col("mu"), 6).cast("decimal(18,6)"))
                .cast("double")
                / n,
                4,
            ).alias("avg_gap_sec"),
            F.round(
                F.sum(F.round(F.col("burst"), 9).cast("decimal(18,9)"))
                .cast("double")
                / n,
                6,
            ).alias("avg_burstiness"),
            F.round(
                F.sum(
                    F.when(F.col("burst") > 0.1, 1).otherwise(0)
                ).cast("double")
                / n,
                6,
            ).alias("pct_bursty"),
        )
        .orderBy("tier")
    )


@register(
    "traffic_heatmap_stats",
    oracle="""
    WITH cell AS (
      SELECT dayofweek(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hr,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS sv
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cell)
    SELECT c.dow, c.hr, c.n,
           ROUND(c.n::DOUBLE / tot.t::DOUBLE, 6) AS share,
           ROUND(c.sv::DOUBLE / c.n::DOUBLE, 4) AS avg_value
    FROM cell c, tot
    ORDER BY c.dow, c.hr
    """,
)
def traffic_heatmap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day traffic heatmap (Sunday = 0): event
    count, share of total traffic, and mean event value per calendar
    cell — the load-shape panel a pipeline scheduler and a rate-limit
    designer read together with `seasonality_dft_stats`/`acf_daily_stats`
    (those detect whether a weekly cycle exists; this shows WHERE in the
    week the load sits, and whether quiet hours exist to schedule
    re-ingest into). NTZ timestamps make the cells timezone-independent.

    Exactness: Spark's dayofweek is 1-based (Sunday=1), DuckDB's 0-based
    — the Spark side subtracts 1 to the shared convention. Counts are
    integers, value sums round-2 DECIMAL, the two ratios mirrored double
    divisions. Scale shape: one map-side-combined pass into at most
    7x24 cells."""
    ev = load_table(spark, sf_dir, "events")
    cell = ev.groupBy(
        (F.dayofweek("ts") - 1).alias("dow"),
        F.hour("ts").cast("long").alias("hr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("sv"),
    )
    tot = F.broadcast(cell.agg(F.sum("n").cast("long").alias("t")))
    return (
        cell.crossJoin(tot)
        .select(
            "dow",
            "hr",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("sv").cast("double") / F.col("n").cast("double"), 4
            ).alias("avg_value"),
        )
        .orderBy("dow", "hr")
    )


@register(
    "growth_accounting_stats",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, ts::DATE AS day FROM events
    ),
    lagged AS (
      SELECT user_id, day,
             LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev
      FROM ud
    ),
    daily AS (
      SELECT day,
             CAST(COUNT(*) AS BIGINT) AS n_active,
             CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
             CAST(SUM(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_retained,
             CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < day - 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      FROM lagged GROUP BY day
    )
    SELECT d.day, d.n_active, d.n_new, d.n_retained, d.n_resurrected,
           p.n_active - d.n_retained AS n_churned,
           CASE WHEN p.n_active - d.n_retained > 0
                THEN ROUND((d.n_new + d.n_resurrected)::DOUBLE
                           / (p.n_active - d.n_retained)::DOUBLE, 4)
           END AS quick_ratio
    FROM daily d LEFT JOIN daily p ON p.day = d.day - 1
    ORDER BY d.day
    """,
)
def growth_accounting_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting over the event stream (the classic
    new / retained / resurrected / churned decomposition): each active
    (user, day) is classified by the user's previous active day — first
    ever (new), yesterday (retained), earlier (resurrected) — and
    churned(d) = active(d-1) - retained(d) is the mass that did NOT come
    back. The quick ratio (new+resurrected)/churned is the one-number
    health readout: >1 means the corpus's contributor base grows. The
    day-over-day pairing is a calendar self-join on day-1, NOT a row
    LAG over the daily table — a fully quiet calendar day would silently
    shift a row-lag's baseline to the wrong date.

    Exactness: every cell is an integer count; the one ratio is a
    mirrored guarded double division (ANSI 0/0 would raise in Spark,
    NULL in DuckDB — the F.when guard makes both NULL). Scale shape:
    distinct (user, day) is a map-side-combined exchange on user_id; the
    LAG window partitions by user; the rollup output is |days| rows and
    the self-join is on that tiny table."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = ud.withColumn("prev", F.lag("day").over(w))
    daily = materialize(
        lagged.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(F.col("prev").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(
                F.when(F.col("prev") == F.date_sub("day", 1), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_retained"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("prev") < F.date_sub("day", 1)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_resurrected"),
        )
    )
    prev = daily.select(
        F.date_add("day", 1).alias("day"), F.col("n_active").alias("pa")
    )
    churned = F.col("pa") - F.col("n_retained")
    return (
        daily.join(prev, "day", "left")
        .select(
            "day",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            churned.alias("n_churned"),
            F.when(
                churned > 0,
                F.round(
                    (F.col("n_new") + F.col("n_resurrected")).cast("double")
                    / churned.cast("double"),
                    4,
                ),
            ).alias("quick_ratio"),
        )
        .orderBy("day")
    )


@register(
    "cohort_ltv_curve",
    oracle="""
    WITH uw AS (
      SELECT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(ROUND(value, 2) AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END AS rev
      FROM events
    ),
    first AS (SELECT user_id, MIN(wk) AS cw FROM uw GROUP BY user_id),
    sizes AS (SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM first GROUP BY cw),
    aged AS (
      SELECT f.cw, (u.wk - f.cw) // 7 AS age_weeks, u.user_id, u.rev
      FROM uw u JOIN first f USING (user_id)
    ),
    cells AS (
      SELECT cw, age_weeks,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active,
             SUM(rev) AS rev
      FROM aged GROUP BY cw, age_weeks
    ),
    cum AS (
      SELECT cw, age_weeks, n_active, rev,
             SUM(rev) OVER (PARTITION BY cw ORDER BY age_weeks
                            ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM cells
    )
    SELECT c.cw AS cohort_week, CAST(c.age_weeks AS BIGINT) AS age_weeks,
           c.n_active, s.cohort_size,
           ROUND(c.rev::DOUBLE, 2) AS revenue,
           ROUND(c.cum_rev::DOUBLE, 2) AS cum_revenue,
           ROUND(c.cum_rev::DOUBLE / s.cohort_size::DOUBLE, 4)
             AS ltv_per_user
    FROM cum c JOIN sizes s USING (cw)
    ORDER BY cohort_week, age_weeks
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: users grouped by first-activity
    week, purchase revenue accumulated per cohort over age-in-weeks, and
    LTV per cohort member (cumulative revenue / cohort size). The value
    twin of `retention_cohorts` (which counts who comes BACK; this sums
    what they SPEND) — together they answer whether later cohorts
    monetize faster, the panel behind every payback-period decision.

    Exactness: revenue quantizes round-2 to DECIMAL at the row, so the
    per-cell sums and the per-cohort cumulative window (DECIMAL in,
    DECIMAL out — the t-closeness tree-aggregation precedent) are exact;
    age_weeks is pure DATE integer arithmetic (both engines' week
    truncation is ISO-Monday); ratios are mirrored double divisions.
    Scale shape: first-week per user is a map-side-combined min; the
    cell rollup shuffles once on (cohort, age); the cumulative window
    partitions by cohort over a calendar-bounded handful of rows."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("wk"),
        F.when(
            F.col("event_type") == "purchase",
            F.round("value", 2).cast("decimal(18,2)"),
        )
        .otherwise(F.lit(0).cast("decimal(18,2)"))
        .alias("rev"),
    )
    first = uw.groupBy("user_id").agg(F.min("wk").alias("cw"))
    sizes = F.broadcast(
        first.groupBy("cw").agg(
            F.count(F.lit(1)).cast("long").alias("cohort_size")
        )
    )
    aged = uw.join(first, "user_id").select(
        "cw",
        (F.datediff("wk", "cw") / 7).cast("long").alias("age_weeks"),
        "user_id",
        "rev",
    )
    cells = aged.groupBy("cw", "age_weeks").agg(
        F.countDistinct("user_id").cast("long").alias("n_active"),
        F.sum("rev").alias("rev"),
    )
    wcum = (
        Window.partitionBy("cw")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn("cum_rev", F.sum("rev").over(wcum))
        .join(sizes, "cw")
        .select(
            F.col("cw").alias("cohort_week"),
            F.col("age_weeks").cast("long").alias("age_weeks"),
            "n_active",
            "cohort_size",
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
            F.round(F.col("cum_rev").cast("double"), 2).alias("cum_revenue"),
            F.round(
                F.col("cum_rev").cast("double")
                / F.col("cohort_size").cast("double"),
                4,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


@register(
    "conversion_latency_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             LAST_VALUE(CASE WHEN event_type = 'view'
                             THEN CAST(floor(epoch(ts)) AS BIGINT)
                        END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lv
      FROM events
    ),
    lat AS (
      SELECT sec - lv AS lat
      FROM seq WHERE event_type = 'purchase' AND lv IS NOT NULL
    ),
    b AS (
      SELECT CAST(length(bin(lat)) - 1 AS BIGINT) AS bucket, lat
      FROM lat
    ),
    cells AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
             MIN(lat) AS min_sec, MAX(lat) AS max_sec,
             CAST(SUM(lat) AS BIGINT) AS s
      FROM b GROUP BY bucket
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells)
    SELECT c.bucket, c.n, c.min_sec, c.max_sec,
           ROUND(c.s::DOUBLE / c.n::DOUBLE, 2) AS avg_sec,
           ROUND(c.n::DOUBLE / tot.t::DOUBLE, 6) AS share
    FROM cells c, tot ORDER BY c.bucket
    """,
)
def conversion_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase conversion latency, log2-bucketed: for every
    purchase preceded by a view, the seconds since that user's most
    recent view, histogrammed into power-of-two buckets (bucket b holds
    [2^b, 2^(b+1)) seconds). The latency companion to
    `funnel_conversion` (which counts WHO converts; this times HOW
    FAST) — the bucket where the mass sits decides both the session
    window (`session_windows_30m`'s 30-minute gap should dominate the
    histogram's left mass) and the watermark delay a streaming join
    (`streaming_purchase_click_join`) needs to catch conversions
    in-flight.

    Exactness: the carried view timestamp is the family's LAST_VALUE
    IGNORE NULLS frame; latencies are integer epoch-second differences;
    the bucket is pure integer bit-length arithmetic (no floating log2);
    sums are integer, the two ratios mirrored double divisions. Scale
    shape: one windowed pass partitioned by user, then a map-side-
    combined ~32-bucket rollup."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        sec.alias("sec"),
        F.last(
            F.when(F.col("event_type") == "view", sec), ignorenulls=True
        )
        .over(w)
        .alias("lv"),
    )
    lat = seq.filter(
        (F.col("event_type") == "purchase") & F.col("lv").isNotNull()
    ).select((F.col("sec") - F.col("lv")).alias("lat"))
    cells = materialize(
        lat.select(
            (F.length(F.bin("lat")) - 1).cast("long").alias("bucket"), "lat"
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("lat").alias("min_sec"),
            F.max("lat").alias("max_sec"),
            F.sum("lat").cast("long").alias("s"),
        )
    )
    tot = F.broadcast(cells.agg(F.sum("n").cast("long").alias("t")))
    return (
        cells.crossJoin(tot)
        .select(
            "bucket",
            "n",
            "min_sec",
            "max_sec",
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"), 2
            ).alias("avg_sec"),
            F.round(
                F.col("n").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("bucket")
    )


@register(
    "seasonal_decompose_stats",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    tr AS (
      SELECT day, n,
             SUM(n) OVER (ORDER BY day
                          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ),
    det AS (
      SELECT dayofweek(day) AS dow,
             CAST(ROUND(n::DOUBLE - s7::DOUBLE / 7.0, 9)
                  AS DECIMAL(18,9)) AS d
      FROM tr WHERE c7 = 7
    ),
    seas AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(d) AS sd,
             SUM(CAST(ROUND(d::DOUBLE * d::DOUBLE, 9) AS DECIMAL(18,9)))
               AS sd2
      FROM det GROUP BY dow
    ),
    res AS (
      SELECT SUM(CAST(ROUND((t.d::DOUBLE - s.sd::DOUBLE / s.n_days::DOUBLE)
                            * (t.d::DOUBLE - s.sd::DOUBLE / s.n_days::DOUBLE),
                            9) AS DECIMAL(18,9))) AS ssr,
             CAST(SUM(1) AS BIGINT) AS m
      FROM det t JOIN seas s USING (dow)
    ),
    vtot AS (
      SELECT SUM(sd2)::DOUBLE AS ssd, CAST(SUM(n_days) AS BIGINT) AS m
      FROM seas
    )
    SELECT s.dow, s.n_days,
           ROUND(s.sd::DOUBLE / s.n_days::DOUBLE, 4) AS seasonal,
           ROUND(CASE WHEN v.ssd > 0
                      THEN 1.0 - r.ssr::DOUBLE / v.ssd
                      END, 4) AS seasonal_strength
    FROM seas s, res r, vtot v
    ORDER BY s.dow
    """,
)
def seasonal_decompose_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event
    count: trend = centered 7-day moving average (only days with a full
    window), seasonal = per-day-of-week mean of the detrended series,
    and seasonal_strength = 1 - SS_residual/SS_detrended — the share of
    de-trended variance the weekly pattern explains (the STL-lite
    readout). Completes the cycle-detection trio: `seasonality_dft_stats`
    asks IF a weekly line exists, `traffic_heatmap_stats` shows WHERE
    load sits, this one sizes HOW MUCH of the variation the weekly shape
    explains — the number that decides whether capacity planning can key
    on day-of-week alone.

    Exactness: daily counts are integers; the centered MA is an integer
    window sum divided by 7.0 (one mirrored double op); detrended values
    quantize round-9 to DECIMAL before every sum of them or their
    squares, so all second moments are order-free; dow uses DuckDB's
    0-based convention (`traffic_heatmap_stats` precedent). Scale shape:
    everything after the daily rollup operates on a calendar-bounded
    table (the unpartitioned windows span |days| rows by construction)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    det = (
        daily.select(
            "day",
            "n",
            F.sum("n").over(w7).alias("s7"),
            F.count(F.lit(1)).over(w7).alias("c7"),
        )
        .filter(F.col("c7") == 7)
        .select(
            (F.dayofweek("day") - 1).alias("dow"),
            F.round(
                F.col("n").cast("double") - F.col("s7").cast("double") / 7.0,
                9,
            )
            .cast("decimal(18,9)")
            .alias("d"),
        )
    )
    det = materialize(det)
    seas = materialize(
        det.groupBy("dow").agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("d").alias("sd"),
            F.sum(
                F.round(
                    F.col("d").cast("double") * F.col("d").cast("double"), 9
                ).cast("decimal(18,9)")
            ).alias("sd2"),
        )
    )
    smean = F.col("sd").cast("double") / F.col("n_days").cast("double")
    res = F.broadcast(
        det.join(F.broadcast(seas), "dow")
        .select(
            F.round(
                (F.col("d").cast("double") - smean)
                * (F.col("d").cast("double") - smean),
                9,
            )
            .cast("decimal(18,9)")
            .alias("r")
        )
        .agg(F.sum("r").alias("ssr"))
    )
    vtot = F.broadcast(
        seas.agg(F.sum("sd2").cast("double").alias("ssd"))
    )
    return (
        seas.crossJoin(res)
        .crossJoin(vtot)
        .select(
            "dow",
            "n_days",
            F.round(smean, 4).alias("seasonal"),
            F.round(
                F.when(
                    F.col("ssd") > 0,
                    F.lit(1.0)
                    - F.col("ssr").cast("double") / F.col("ssd"),
                ),
                4,
            ).alias("seasonal_strength"),
        )
        .orderBy("dow")
    )


#: freshness SLA: a feed more than 6 hours behind the corpus max is late.
_FRESH_SLA_SEC = 6 * 3600


@register(
    "freshness_lag_audit",
    oracle=f"""
    WITH anchor AS (
      SELECT CAST(floor(epoch(MAX(ts))) AS BIGINT) AS mx FROM events
    ),
    feeds AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_sec,
             MAX(ts) AS last_ts
      FROM events GROUP BY event_type
    )
    SELECT f.event_type, f.n_rows, f.last_ts,
           a.mx - f.last_sec AS lag_sec,
           (a.mx - f.last_sec > {_FRESH_SLA_SEC}) AS sla_breach
    FROM feeds f, anchor a
    ORDER BY f.event_type
    """,
)
def freshness_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness audit: each event type treated as an upstream feed,
    scored by how far its newest record trails the newest record in the
    whole store, with a 6-hour SLA flag. The ops panel every ingest
    platform pages on — a feed whose lag grows monotonically is a dead
    producer (the reference's rate-limited fetchers going quiet), and
    catching it here beats discovering it as a silent gap in
    `gap_fill_daily` a week later.

    Exactness: lags are integer epoch-second differences off a single
    MAX anchor; the flag is an integer comparison. Scale shape: one
    map-side-combined MAX/COUNT per type plus a broadcast scalar anchor
    — at 100 TB this reads parquet footer statistics almost entirely
    (zonemap min/max on ts), the same pruning `zonemap_pruning_stats`
    prices."""
    ev = load_table(spark, sf_dir, "events")
    anchor = F.broadcast(
        ev.agg(F.unix_timestamp(F.max("ts")).alias("mx"))
    )
    feeds = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.unix_timestamp(F.max("ts")).alias("last_sec"),
        F.max("ts").alias("last_ts"),
    )
    return (
        feeds.crossJoin(anchor)
        .select(
            "event_type",
            "n_rows",
            "last_ts",
            (F.col("mx") - F.col("last_sec")).alias("lag_sec"),
            (F.col("mx") - F.col("last_sec") > _FRESH_SLA_SEC).alias(
                "sla_breach"
            ),
        )
        .orderBy("event_type")
    )


#: MAD anomaly multiplier (the classic 3.5 consistency-scaled rule).
_MAD_K = 3.5
_MAD_CONSISTENCY = 1.4826


@register(
    "mad_anomaly_days",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    med AS (
      SELECT AVG(n::DOUBLE) AS med FROM (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n, day) AS rn,
               COUNT(*) OVER () AS m
        FROM daily
      ) WHERE rn IN ((m + 1) // 2, (m + 2) // 2)
    ),
    dev AS (
      SELECT d.day, d.n, abs(d.n::DOUBLE - med.med) AS ad
      FROM daily d, med
    ),
    mad AS (
      SELECT AVG(ad) AS mad FROM (
        SELECT ad, ROW_NUMBER() OVER (ORDER BY ad, day) AS rn,
               COUNT(*) OVER () AS m
        FROM dev
      ) WHERE rn IN ((m + 1) // 2, (m + 2) // 2)
    )
    SELECT d.day, d.n,
           ROUND(CASE WHEN mad.mad > 0
                      THEN (d.n::DOUBLE - med.med)
                           / ({_MAD_CONSISTENCY} * mad.mad) END, 4)
             AS robust_z,
           (mad.mad > 0 AND abs(d.n::DOUBLE - med.med)
                            > {_MAD_K} * {_MAD_CONSISTENCY} * mad.mad)
             AS is_anomaly
    FROM dev d, med, mad
    ORDER BY d.day
    """,
)
def mad_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly screen: each day's event count scored
    by its median/MAD z-score (consistency constant 1.4826, flag at
    |z| > {_MAD_K}) — the outlier detector that still works when the
    outliers themselves corrupt the baseline, which is exactly when the
    mean/stddev screens (`streaming_anomaly_windows`, `cusum_changepoint`)
    go blind: one 10x ingest spike inflates a stddev enough to hide a
    second spike, but moves the median not at all.

    Exactness: the median and MAD are exact middle-rank averages over
    the calendar-bounded daily table (ROW_NUMBER with value+day
    tie-break — no percentile_approx); deviations and z are mirrored
    double expressions; the zero-MAD degenerate case NULLs the score on
    both engines. Scale shape: after the one map-side-combined daily
    rollup everything runs on |days| rows; the unpartitioned windows are
    calendar-bounded by construction."""
    ev = load_table(spark, sf_dir, "events")
    daily = materialize(
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
    )

    def _median(df, col, tie):
        w = Window.orderBy(col, tie)
        ranked = df.select(
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
        )
        return F.broadcast(
            ranked.filter(
                (F.col("rn") == ((F.col("m") + 1) / 2).cast("long"))
                | (F.col("rn") == ((F.col("m") + 2) / 2).cast("long"))
            ).agg(F.avg(F.col(col).cast("double")).alias("med"))
        )

    med = _median(daily, "n", "day")
    dev = daily.crossJoin(med).select(
        "day",
        "n",
        "med",
        F.abs(F.col("n").cast("double") - F.col("med")).alias("ad"),
    )
    dev = materialize(dev)
    madw = Window.orderBy("ad", "day")
    mad = F.broadcast(
        dev.select(
            "ad",
            F.row_number().over(madw).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
        )
        .filter(
            (F.col("rn") == ((F.col("m") + 1) / 2).cast("long"))
            | (F.col("rn") == ((F.col("m") + 2) / 2).cast("long"))
        )
        .agg(F.avg("ad").alias("mad"))
    )
    scale = F.lit(_MAD_CONSISTENCY) * F.col("mad")
    return (
        dev.crossJoin(mad)
        .select(
            "day",
            "n",
            F.round(
                F.when(
                    F.col("mad") > 0,
                    (F.col("n").cast("double") - F.col("med")) / scale,
                ),
                4,
            ).alias("robust_z"),
            (
                (F.col("mad") > 0)
                & (
                    F.abs(F.col("n").cast("double") - F.col("med"))
                    > F.lit(_MAD_K) * scale
                )
            ).alias("is_anomaly"),
        )
        .orderBy("day")
    )
