"""Corpus-curation II + warehouse-history queries (round 4 widening).

Four more first-class LLM-pipeline / warehouse operators, each an
oracle-checked ``queries()`` entry:

* ``unigram_kl_quality`` — per-document KL divergence of the word-unigram
  distribution against the corpus background (the CCNet-style "does this
  document look like the corpus" quality signal), rolled up per source.
* ``source_topp_curation`` — nucleus (top-p) curation: per source keep the
  highest-value documents until they carry a target share of the source's
  tokens; reports the kept/total budget per source.
* ``event_transition_matrix`` — first-order Markov transition counts and
  probabilities between consecutive event types per user (product-analytics
  "what do users do next" panel).
* ``scd2_user_history_stats`` — slowly-changing-dimension type-2 history
  derived from an event changelog: version intervals per user via
  lead-window effective-dating, rolled up to per-user version statistics.

Float discipline follows the BM25 pattern (``text_q.py``): any per-row
double that will be SUMMED is first rounded and cast to DECIMAL so the sum
is order-insensitive and engine-exact; single-division ratios are plain
doubles rounded at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize
from ..operators import text as T
from ..registry import register

#: nucleus curation target: keep docs until they carry 60% of the source's
#: tokens (ranked best-first).
_TOPP = 0.6


@register(
    "unigram_kl_quality",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, source, term, COUNT(*) AS tf
      FROM toks GROUP BY doc_id, source, term
    ),
    tf2 AS (
      SELECT doc_id, source, term, tf,
             SUM(tf) OVER (PARTITION BY doc_id) AS dl
      FROM tf
    ),
    ctf AS (SELECT term, SUM(tf) AS ctf FROM tf GROUP BY term),
    globs AS (SELECT SUM(ctf) AS cl FROM ctf),
    contrib AS (
      SELECT doc_id, source,
             CAST(ROUND(
               (tf::DOUBLE / dl::DOUBLE)
               * ln((tf::DOUBLE / dl::DOUBLE) / (ctf::DOUBLE / cl::DOUBLE)),
               8) AS DECIMAL(18,8)) AS c
      FROM tf2 JOIN ctf USING (term), globs
    ),
    kl AS (
      SELECT doc_id, source, ROUND(CAST(SUM(c) AS DOUBLE), 6) AS kl
      FROM contrib GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(kl AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4)
             AS avg_kl,
           MIN(kl) AS min_kl,
           MAX(kl) AS max_kl
    FROM kl
    GROUP BY source
    ORDER BY source
    """,
)
def unigram_kl_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document KL(doc ‖ corpus) over word unigrams, per-source rollup
    — the language-model-free version of the perplexity quality filter:
    documents whose unigram distribution diverges hard from the corpus
    background are boilerplate, spam, or wrong-language.

    Shape at 100 TB: the explode → (doc, term) partial count combines
    map-side; the background distribution is vocabulary-bounded (≪ corpus)
    and joins on ``term`` — a shuffle bounded by |vocab| on the build side,
    with AQE free to broadcast it when it is small; the per-doc window
    reuses the (doc_id, term) grouping's hash partitioning. No data-sized
    driver traffic anywhere: the corpus-length scalar rides a 1-row
    cross-joined broadcast, never a ``collect``.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(T.tokens("text")).alias("term")
    )
    # both the per-doc branch and the background-distribution branch
    # consume tf; without pinning, Catalyst evaluates the explode+count
    # subtree TWICE — two full corpus scans at the 100-TB design point.
    # tf is |docs|·|doc vocab| rows (≪ token count), cheap to pin.
    tf = materialize(
        toks.groupBy("doc_id", "source", "term").agg(
            F.count(F.lit(1)).alias("tf")
        )
    )
    tf2 = tf.withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
    ctf = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    globs = ctf.agg(F.sum("ctf").alias("cl"))
    p = F.col("tf").cast("double") / F.col("dl").cast("double")
    q = F.col("ctf").cast("double") / F.col("cl").cast("double")
    contrib = (
        tf2.join(ctf, "term")
        .crossJoin(F.broadcast(globs))
        .select(
            "doc_id",
            "source",
            F.round(p * F.log(p / q), 8).cast("decimal(18,8)").alias("c"),
        )
    )
    kl = contrib.groupBy("doc_id", "source").agg(
        F.round(F.sum("c").cast("double"), 6).alias("kl")
    )
    return (
        kl.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("kl").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_kl"),
            F.min("kl").alias("min_kl"),
            F.max("kl").alias("max_kl"),
        )
        .orderBy("source")
    )


@register(
    "source_topp_curation",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    ranked AS (
      SELECT source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source
                              ORDER BY n_tok DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tok,
             SUM(n_tok) OVER (PARTITION BY source) AS tot_tok
      FROM sized
    )
    SELECT source,
           COUNT(*) AS total_docs,
           CAST(SUM(CASE WHEN (cum_tok - n_tok)::DOUBLE < {_TOPP} * tot_tok::DOUBLE
                         THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
           CAST(SUM(CASE WHEN (cum_tok - n_tok)::DOUBLE < {_TOPP} * tot_tok::DOUBLE
                         THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
           CAST(MAX(tot_tok) AS BIGINT) AS total_tokens,
           ROUND(SUM(CASE WHEN (cum_tok - n_tok)::DOUBLE < {_TOPP} * tot_tok::DOUBLE
                          THEN n_tok ELSE 0 END)::DOUBLE
                 / MAX(tot_tok)::DOUBLE, 4) AS kept_share
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def source_topp_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) curation budget: per source, rank documents
    best-first (token count here — swap in any quality score) and keep
    them until the kept set carries ``_TOPP`` of the source's tokens; the
    document that crosses the boundary is included. Reports the kept/total
    document and token budgets per source — the knob a data-mixing recipe
    turns per corpus slice.

    Both windows partition by ``source``, so the whole query is ONE hash
    exchange on the group key with partition-local sorts — groups spread
    across the cluster, nothing global. The running-sum frame is ROWS (not
    RANGE) with a unique (n_tok DESC, doc_id) order, making bucket
    membership a total order — deterministic across engines and reruns.
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "source", F.size(T.tokens("text")).alias("n_tok")
    )
    w_run = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tok"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("source")
    ranked = sized.select(
        "source",
        "n_tok",
        F.sum("n_tok").over(w_run).alias("cum_tok"),
        F.sum("n_tok").over(w_all).alias("tot_tok"),
    )
    kept = (F.col("cum_tok") - F.col("n_tok")).cast("double") < F.lit(
        _TOPP
    ) * F.col("tot_tok").cast("double")
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("kept_docs"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).alias(
                "kept_tokens"
            ),
            F.max("tot_tok").alias("total_tokens"),
            F.round(
                F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).cast("double")
                / F.max("tot_tok").cast("double"),
                4,
            ).alias("kept_share"),
        )
        .orderBy("source")
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           ROUND(n::DOUBLE
                 / SUM(n) OVER (PARTITION BY prev_type)::DOUBLE, 4) AS p
    FROM pairs
    ORDER BY prev_type, next_type
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event stream:
    counts and conditional probabilities of ``prev_type → next_type`` —
    the "what happens after X" panel behind next-action prediction
    features and funnel anomaly detection.

    The lag window partitions by ``user_id`` (cluster-wide spread, never a
    global sort) with the fixture-wide deterministic (ts, event_id) order;
    the pair count then combines map-side and the probability
    normalization runs over |types|² rows — trivia after the first
    aggregation. One real shuffle on user_id, one on the tiny pair key.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("prev_type")).cast("double"),
            4,
        ).alias("p"),
    ).orderBy("prev_type", "next_type")


@register(
    "scd2_user_history_stats",
    oracle="""
    WITH versions AS (
      SELECT user_id, value, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_versions,
           MIN(valid_from) AS first_seen,
           MAX(valid_from) AS last_change,
           ROUND(CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN
                     CAST(ROUND(value, 6) AS DECIMAL(18,6)) END) AS DOUBLE),
                 4) AS closed_value_mass,
           ROUND(MAX(CASE WHEN valid_to IS NULL THEN value END), 4)
             AS current_value,
           ROUND(CAST(date_diff('day', MIN(valid_from), MAX(valid_from))
                      AS DOUBLE) / NULLIF(COUNT(*) - 1, 0), 4)
             AS avg_days_between_versions
    FROM versions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def scd2_user_history_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a changelog: every
    event is a new version of its user's ``value``; effective-dating comes
    from a lead window (``valid_from`` = event time, ``valid_to`` = next
    event's time, NULL = current) — the standard warehouse rewrite of the
    reference's row-at-a-time UPDATE loop, one shuffle on the entity key.

    The rollup reports per-entity version counts, first/last change times,
    the DECIMAL-exact value mass over closed versions, the open (current)
    version's value, and mean days between versions (day-granular ints —
    no timezone arithmetic anywhere; timestamps stay NTZ end-to-end).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = ev.select(
        "user_id",
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    closed = F.col("valid_to").isNotNull()
    return (
        versions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.min("valid_from").alias("first_seen"),
            F.max("valid_from").alias("last_change"),
            F.round(
                F.sum(
                    F.when(
                        closed,
                        F.round(F.col("value"), 6).cast("decimal(18,6)"),
                    )
                ).cast("double"),
                4,
            ).alias("closed_value_mass"),
            F.round(
                F.max(F.when(~closed, F.col("value"))), 4
            ).alias("current_value"),
            F.round(
                F.datediff(F.max("valid_from"), F.min("valid_from")).cast(
                    "double"
                )
                / F.nullif(F.count(F.lit(1)) - F.lit(1), F.lit(0)),
                4,
            ).alias("avg_days_between_versions"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance-weighted data selection (Xie et al. 2023, "Data
# Selection for Language Models via Importance Resampling"): score every
# document by the log-likelihood ratio of a TARGET domain model over the
# RAW corpus model, both estimated on hashed unigram features, and select
# the documents the target model prefers. The deterministic selection rule
# here is weight > 0 ("more target-like than corpus-like") — DSIR's
# Gumbel-noise resampling replaced by its noise-free decision boundary so
# the whole panel stays a pure function of the data.

_DSIR_B = 1024  # hashed feature buckets
#: target domain: English documents (the "quality domain" stand-in; in
#: production this is the trusted corpus you want more of).
_DSIR_TARGET = "lang = 'en'"


@register(
    "dsir_selection_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             (('0x' || substring(md5(unnest(string_split(text, ' '))), 1, 4))::BIGINT
              % {_DSIR_B}) AS b
      FROM documents
    ),
    tgt AS (
      SELECT (('0x' || substring(md5(unnest(string_split(text, ' '))), 1, 4))::BIGINT
              % {_DSIR_B}) AS b
      FROM documents WHERE {_DSIR_TARGET}
    ),
    ct AS (SELECT b, COUNT(*) AS n FROM tgt GROUP BY b),
    cr AS (SELECT b, COUNT(*) AS n FROM toks GROUP BY b),
    tots AS (
      SELECT (SELECT COUNT(*) FROM tgt) AS tt,
             (SELECT COUNT(*) FROM toks) AS tr
    ),
    ratio AS (
      SELECT cr.b,
             CAST(ROUND(
               ln( ((COALESCE(ct.n, 0) + 1)::DOUBLE / (tots.tt + {_DSIR_B})::DOUBLE)
                 / ((cr.n + 1)::DOUBLE / (tots.tr + {_DSIR_B})::DOUBLE) ),
               8) AS DECIMAL(18,8)) AS c
      FROM cr LEFT JOIN ct ON cr.b = ct.b, tots
    ),
    w AS (
      SELECT doc_id, source,
             ROUND(CAST(SUM(c) AS DOUBLE), 6) AS w
      FROM toks JOIN ratio USING (b)
      GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           ROUND(CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4)
             AS avg_w,
           MIN(w) AS min_w,
           MAX(w) AS max_w
    FROM w
    GROUP BY source
    ORDER BY source
    """,
)
def dsir_selection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights per document — hashed-unigram (B=1024)
    log-ratio of an add-1-smoothed target-domain model over the raw corpus
    model — rolled up per source with the weight>0 selection count.

    Shape at 100 TB: both feature models are B-bucket count vectors —
    BOUNDED state (≤1024 rows each) no matter the corpus size, built by
    one map-side-combined aggregate apiece; the per-token scoring join is
    against the tiny ratio table (broadcast), so the corpus is touched in
    exactly two linear passes (model build, scoring) with no shuffle wider
    than B rows plus the per-doc weight agg. That bounded-feature-space
    property is DSIR's whole point vs full-vocabulary likelihood ratios.
    Per-token log contributions round→DECIMAL before summing (the
    unigram_kl float discipline), so weights are order-insensitive and the
    panel is hash-exact."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 4), 16, 10).cast("long")
        % _DSIR_B
    ).alias("b")
    toks = docs.select(
        "doc_id", "source", "lang", F.explode(T.tokens("text")).alias("term")
    ).select("doc_id", "source", "lang", bucket)
    # the explode feeds the raw model, the target model, and the scoring
    # pass — pin it once (corpus-scale subtree, three consumers)
    toks = materialize(toks)
    cr = toks.groupBy("b").agg(F.count(F.lit(1)).alias("nr"))
    ct = (
        toks.filter(F.expr(_DSIR_TARGET))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    # coalesce both totals: an empty target domain must give tt=0 (finite
    # smoothed weights, mirroring the oracle's COUNT(*)=0), not NULL-out
    # every weight
    tots = cr.agg(F.coalesce(F.sum("nr"), F.lit(0)).alias("tr")).crossJoin(
        ct.agg(F.coalesce(F.sum("nt"), F.lit(0)).alias("tt"))
    )
    ratio = (
        cr.join(ct, "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("nt"), F.lit(0)) + 1).cast("double")
                        / (F.col("tt") + _DSIR_B).cast("double")
                    )
                    / (
                        (F.col("nr") + 1).cast("double")
                        / (F.col("tr") + _DSIR_B).cast("double")
                    )
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("c"),
        )
    )
    w = (
        toks.join(F.broadcast(ratio), "b")
        .groupBy("doc_id", "source")
        .agg(F.round(F.sum("c").cast("double"), 6).alias("w"))
    )
    return (
        w.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("w") > 0).cast("long")).cast("long").alias("n_selected"),
            F.round(
                F.sum(F.col("w").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_w"),
            F.min("w").alias("min_w"),
            F.max("w").alias("max_w"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-5 widening: two more batching/curation operators every large-scale
# training pipeline runs.

_DOMAIN_CAP = 15    # max docs kept per source (binds: fixture sources have 25)
_BATCH_B = 16       # sequences per training batch in the padding panel


@register(
    "domain_cap_sampling",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN n_tok ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           ROUND(SUM(CASE WHEN rk <= {_DOMAIN_CAP} THEN n_tok ELSE 0 END)::DOUBLE
                 / SUM(n_tok)::DOUBLE, 6) AS token_keep_ratio
    FROM d
    GROUP BY source
    ORDER BY source
    """,
)
def domain_cap_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap (the CommonCrawl-pipeline "no domain may
    contribute more than N documents" rule): rank each source's documents
    by a deterministic content-independent hash (md5 of the doc id — an
    unbiased uniform draw that is reproducible across engines and runs,
    unlike RAND()) and keep the first {_DOMAIN_CAP}. Reports the doc and
    token mass retained per source.

    Scale shape: one window partitioned BY SOURCE (parallel across
    domains; a skewed mega-domain is one partition's sort of its own doc
    ids, not a global sort) feeding a map-side-combined rollup — no
    global ordering anywhere. At 100 TB the same plan caps billions of
    docs across millions of domains in one shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    d = docs.select(
        "source",
        T.n_tokens("text").alias("n_tok"),
        F.row_number().over(w).alias("rk"),
    )
    kept = F.col("rk") <= _DOMAIN_CAP
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept.cast("long")).cast("long").alias("n_kept"),
            F.sum("n_tok").cast("long").alias("tokens_total"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("tokens_kept"),
            F.round(
                F.sum(F.when(kept, F.col("n_tok")).otherwise(0)).cast("double")
                / F.sum("n_tok").cast("double"),
                6,
            ).alias("token_keep_ratio"),
        )
        .orderBy("source")
    )


@register(
    "padding_efficiency_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    bucketed AS (
      SELECT doc_id, n_tok,
             CAST(floor(log2(greatest(n_tok, 1))) AS BIGINT) AS bucket,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(floor(log2(greatest(n_tok, 1))) AS BIGINT)
               ORDER BY doc_id) AS rk
      FROM d
    ),
    batches AS (
      SELECT bucket, (rk - 1) // {_BATCH_B} AS batch_id,
             COUNT(*) AS n_in_batch,
             MAX(n_tok) AS batch_max,
             CAST(SUM(n_tok) AS BIGINT) AS batch_used
      FROM bucketed GROUP BY bucket, batch_id
    )
    SELECT bucket,
           CAST(SUM(n_in_batch) AS BIGINT) AS n_docs,
           COUNT(*) AS n_batches,
           CAST(SUM(batch_max * n_in_batch) AS BIGINT) AS padded_tokens,
           CAST(SUM(batch_used) AS BIGINT) AS used_tokens,
           ROUND(1.0 - SUM(batch_used)::DOUBLE
                 / SUM(batch_max * n_in_batch)::DOUBLE, 6) AS padding_waste
    FROM batches
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def padding_efficiency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing audit: documents are bucketed by
    log2 token length, batched {_BATCH_B} at a time in doc-id order
    within the bucket, and each batch pads to its own longest sequence —
    the panel reports the padding waste per bucket, the number an
    inference/training scheduler tunes bucket boundaries against
    (complementing ``sequence_packing_stats``'s per-source concat-chunk
    utilization and ``packing_strategy_stats``'s strategy comparison).

    All integer arithmetic; the only windows are partitioned by bucket
    (parallel, bounded), and the rollup is map-side combined."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", T.n_tokens("text").alias("n_tok"))
    bucket = F.floor(F.log2(F.greatest("n_tok", F.lit(1)))).cast("long")
    w = Window.partitionBy("bucket").orderBy("doc_id")
    bucketed = d.select("doc_id", "n_tok", bucket.alias("bucket")).withColumn(
        "batch_id", ((F.row_number().over(w) - 1) / _BATCH_B).cast("long")
    )
    batches = bucketed.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n_in_batch"),
        F.max("n_tok").alias("batch_max"),
        F.sum("n_tok").cast("long").alias("batch_used"),
    )
    return (
        batches.groupBy("bucket")
        .agg(
            F.sum("n_in_batch").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_batches"),
            F.sum(F.col("batch_max") * F.col("n_in_batch"))
            .cast("long")
            .alias("padded_tokens"),
            F.sum("batch_used").cast("long").alias("used_tokens"),
            F.round(
                F.lit(1.0)
                - F.sum("batch_used").cast("double")
                / F.sum(F.col("batch_max") * F.col("n_in_batch")).cast("double"),
                6,
            ).alias("padding_waste"),
        )
        .orderBy("bucket")
    )


@register(
    "dataset_diff_stats",
    oracle="""
    WITH h AS (
      SELECT doc_id, source, text,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % 100 AS hb
      FROM documents
    ),
    v1 AS (
      SELECT doc_id, source, md5(text) AS fp FROM h WHERE hb < 80
    ),
    v2 AS (
      SELECT doc_id, source,
             md5(CASE WHEN hb % 5 = 0 THEN text || ' [rev2]' ELSE text END)
               AS fp
      FROM h WHERE hb >= 10
    ),
    d AS (
      SELECT COALESCE(v1.source, v2.source) AS source,
             CASE
               WHEN v1.doc_id IS NULL THEN 'added'
               WHEN v2.doc_id IS NULL THEN 'removed'
               WHEN v1.fp <> v2.fp THEN 'changed'
               ELSE 'unchanged'
             END AS status
      FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    )
    SELECT source,
           CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_added,
           CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_changed,
           CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unchanged
    FROM d
    GROUP BY source
    ORDER BY source
    """,
)
def dataset_diff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: reconcile two corpus snapshots by primary key
    + content fingerprint and report added/removed/changed/unchanged per
    source — the audit every versioned-dataset release runs (and the
    row-level complement of ``order_revenue_reconciliation``'s aggregate
    drift attribution).

    The two snapshots are carved DETERMINISTICALLY from the one fixture
    (md5 buckets: v1 = buckets <80, v2 = buckets ≥10 with every 5th
    bucket's text revised), so the diff exercises all four statuses with
    an engine-exact construction. Plan shape: one full-outer hash join on
    the key with md5 fingerprints computed in the scan projections —
    content never crosses the shuffle, only (key, fp) — then a map-side
    combined rollup. At 100 TB both snapshots shuffle once on the key;
    with both snapshots bucketed on the key (``catalog.save_bucketed``)
    the join runs shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    hb = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    h = docs.select("doc_id", "source", "text", hb.alias("hb"))
    v1 = h.filter(F.col("hb") < 80).select(
        F.col("doc_id").alias("id1"),
        F.col("source").alias("src1"),
        F.md5("text").alias("fp1"),
    )
    v2 = h.filter(F.col("hb") >= 10).select(
        F.col("doc_id").alias("id2"),
        F.col("source").alias("src2"),
        F.md5(
            F.when(
                F.col("hb") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("fp2"),
    )
    d = v1.join(v2, v1.id1 == v2.id2, "full_outer").select(
        F.coalesce("src1", "src2").alias("source"),
        F.when(F.col("id1").isNull(), "added")
        .when(F.col("id2").isNull(), "removed")
        .when(F.col("fp1") != F.col("fp2"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        d.groupBy("source")
        .agg(
            *[
                F.sum((F.col("status") == s).cast("long"))
                .cast("long")
                .alias(f"n_{s}")
                for s in ("added", "removed", "changed", "unchanged")
            ]
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Snapshot-chain versioning (round 6, extending dataset_diff_stats from
# one diff to the release HISTORY a versioned-dataset registry keeps).

_CHAIN_VERSIONS = 4
_CHAIN_TRANSITIONS = [(1, 2), (2, 3), (3, 4), (1, 4)]  # consecutive + long-range


def _chain_member_sql(k: int) -> str:
    return f"((hb + 17 * {k}) % 100 < 70)"


def _chain_rev_sql(k: int) -> str:
    return f"((hb + {k}) // 30)"


@register(
    "dataset_snapshot_chain",
    oracle=f"""
    WITH h AS (
      SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
               % 100 AS hb
      FROM documents
    )
    {" UNION ALL ".join(
        f'''
    SELECT 'v{a}->v{b}' AS transition,
           CAST(SUM(CASE WHEN {_chain_member_sql(a)} THEN 1 ELSE 0 END) AS BIGINT) AS n_prev,
           CAST(SUM(CASE WHEN {_chain_member_sql(b)} THEN 1 ELSE 0 END) AS BIGINT) AS n_next,
           CAST(SUM(CASE WHEN {_chain_member_sql(b)} AND NOT {_chain_member_sql(a)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           CAST(SUM(CASE WHEN {_chain_member_sql(a)} AND NOT {_chain_member_sql(b)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN {_chain_member_sql(a)} AND {_chain_member_sql(b)}
                         AND {_chain_rev_sql(a)} <> {_chain_rev_sql(b)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(SUM(CASE WHEN {_chain_member_sql(a)} AND {_chain_member_sql(b)}
                         AND {_chain_rev_sql(a)} = {_chain_rev_sql(b)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
           ROUND(SUM(CASE WHEN {_chain_member_sql(a)} AND {_chain_member_sql(b)}
                     THEN 1 ELSE 0 END)::DOUBLE
                 / SUM(CASE WHEN {_chain_member_sql(a)} THEN 1 ELSE 0 END)::DOUBLE,
                 6) AS retention_rate
    FROM h'''
        for a, b in _CHAIN_TRANSITIONS
    )}
    ORDER BY transition
    """,
)
def dataset_snapshot_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-history churn panel over a chain of dataset snapshots:
    per transition (three consecutive + the v1→v4 long-range row) the
    added/removed/changed/unchanged counts and the retention rate — what
    a dataset registry shows next to each release so consumers can see
    how much of what they trained on last month still exists, and how
    fast the corpus is churning.

    The four versions are carved deterministically from the one fixture
    (rolling 70% md5-bucket windows shifted 17 buckets per version, so
    every transition genuinely adds AND removes; content revisions tick
    when (hb + k) crosses a 30-bucket boundary), extending the
    ``dataset_diff_stats`` construction from one diff to a chain.

    Scale shape: because version membership and revision epoch derive
    from the SAME row, the whole panel is ONE narrow scan — per-row
    membership/revision expressions feed 4 × 6 conditional aggregates,
    map-side combined to a handful of rows; no join, no shuffle beyond
    the final 1-partition combine. A production registry diffing STORED
    snapshots runs ``dataset_diff_stats``'s full-outer-join shape per
    transition instead (bucketed on the key → shuffle-free); this panel
    is the reporting layer on top of those diffs."""
    docs = load_table(spark, sf_dir, "documents")
    hb = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    h = docs.select(hb.alias("hb"))

    def member(k: int) -> F.Column:
        return (F.col("hb") + 17 * k) % 100 < 70

    def rev(k: int) -> F.Column:
        return F.expr(f"(hb + {k}) div 30")

    parts = []
    for a, b in _CHAIN_TRANSITIONS:
        both = member(a) & member(b)
        n_prev = F.sum(member(a).cast("long")).cast("long")
        parts.append(
            h.agg(
                F.lit(f"v{a}->v{b}").alias("transition"),
                n_prev.alias("n_prev"),
                F.sum(member(b).cast("long")).cast("long").alias("n_next"),
                F.sum((member(b) & ~member(a)).cast("long"))
                .cast("long").alias("n_added"),
                F.sum((member(a) & ~member(b)).cast("long"))
                .cast("long").alias("n_removed"),
                F.sum((both & (rev(a) != rev(b))).cast("long"))
                .cast("long").alias("n_changed"),
                F.sum((both & (rev(a) == rev(b))).cast("long"))
                .cast("long").alias("n_unchanged"),
                F.round(
                    F.sum(both.cast("long")).cast("double")
                    / n_prev.cast("double"),
                    6,
                ).alias("retention_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("transition")


# ---------------------------------------------------------------------------
# Round-6: training-order shuffle quality.

_SHUF_SEED = "#42"


@register(
    "training_order_shuffle_stats",
    oracle=f"""
    WITH ord AS (
      SELECT doc_id, source,
             md5(CAST(doc_id AS VARCHAR) || '{_SHUF_SEED}') AS ok
      FROM documents
    ),
    seq AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (ORDER BY ok, doc_id) - 1 AS rn
      FROM ord
    ),
    runs AS (
      SELECT source,
             rn - ROW_NUMBER() OVER (PARTITION BY source ORDER BY rn) AS grp
      FROM seq
    ),
    rlen AS (
      SELECT source, grp, COUNT(*) AS run_len FROM runs GROUP BY source, grp
    )
    SELECT source,
           CAST(SUM(run_len) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           ROUND(SUM(run_len)::DOUBLE / COUNT(*)::DOUBLE, 4) AS mean_run
    FROM rlen
    GROUP BY source
    ORDER BY source
    """,
)
def training_order_shuffle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-quality audit of the seeded training order: lay the corpus
    out in its deterministic shuffled order (md5(doc_id + seed) — the
    same keyed permutation a data loader uses for reproducible epochs)
    and measure per-source clumping: number of same-source runs, longest
    run, mean run length. Long same-source runs mean consecutive batches
    are correlated — the silent training pathology a shuffle audit
    catches before a loss curve does.

    Scale shape: global positions come from the TeraSort-style
    prefix-offset ranking (``quality_q._global_ranks`` — range exchange
    + per-partition row numbers + broadcast offsets; no single-partition
    window anywhere), then runs are gaps-and-islands under a
    source-partitioned window and two map-side-combined rollups. Oracle:
    the identical permutation via one ROW_NUMBER (single-node engine —
    a global window is fine THERE; the Spark side is the distributed
    form of the same ranking)."""
    from .quality_q import _global_ranks

    docs = load_table(spark, sf_dir, "documents")
    ord_ = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHUF_SEED))).alias("ok"),
    )
    ranked, _n = _global_ranks(ord_, "ok", "doc_id")
    w = Window.partitionBy("source").orderBy("rn")
    runs = ranked.select(
        "source", (F.col("rn") - F.row_number().over(w)).alias("grp")
    )
    rlen = runs.groupBy("source", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        rlen.groupBy("source")
        .agg(
            F.sum("run_len").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.max("run_len").cast("long").alias("longest_run"),
            F.round(
                F.sum("run_len").cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("mean_run"),
        )
        .orderBy("source")
    )


#: UniMax water-filling: per-corpus epoch cap and the total training-token
#: budget as a multiple of the corpus's natural token mass.
_UNIMAX_CAP_EPOCHS = 4
_UNIMAX_BUDGET_X = 2


@register(
    "unimax_allocation_stats",
    oracle=f"""
    WITH tok AS (
      SELECT source, lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
      FROM documents GROUP BY source, lang
    ),
    cap AS (
      SELECT source, lang, tokens,
             CAST({_UNIMAX_CAP_EPOCHS} * tokens AS BIGINT) AS capacity
      FROM tok
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST({_UNIMAX_BUDGET_X} * SUM(tokens) AS BIGINT) AS budget
      FROM cap
    ),
    ranked AS (
      SELECT c.*, t.n, t.budget,
             CAST(ROW_NUMBER() OVER
                  (ORDER BY capacity, source, lang) AS BIGINT) AS rn,
             CAST(COALESCE(SUM(capacity) OVER (
                    ORDER BY capacity, source, lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS prefix_cap
      FROM cap c, tot t
    ),
    flagged AS (
      SELECT *,
             (capacity * (n - rn + 1) + prefix_cap < budget) AS capped
      FROM ranked
    ),
    cstat AS (
      SELECT CAST(COALESCE(SUM(CASE WHEN capped THEN capacity END), 0)
                  AS BIGINT) AS capped_sum,
             CAST(COALESCE(SUM(CASE WHEN capped THEN 1 END), 0)
                  AS BIGINT) AS n_capped
      FROM flagged
    )
    SELECT source, lang, tokens, capacity,
           CAST(capped AS INTEGER) AS is_capped,
           ROUND(CASE WHEN capped THEN capacity::DOUBLE
                 ELSE (budget - capped_sum)::DOUBLE
                      / (n - n_capped)::DOUBLE END, 2) AS alloc_tokens,
           ROUND((CASE WHEN capped THEN capacity::DOUBLE
                  ELSE (budget - capped_sum)::DOUBLE
                       / (n - n_capped)::DOUBLE END)
                 / tokens::DOUBLE, 4) AS epochs,
           ROUND((CASE WHEN capped THEN capacity::DOUBLE
                  ELSE (budget - capped_sum)::DOUBLE
                       / (n - n_capped)::DOUBLE END)
                 / budget::DOUBLE, 6) AS mix_frac
    FROM flagged, cstat
    ORDER BY source, lang
    """,
)
def unimax_allocation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax-style capped water-filling of a training-token budget across
    (source, lang) corpora (Chung et al. 2023): every corpus gets an equal
    share of the budget EXCEPT that no corpus may be repeated for more than
    {_UNIMAX_CAP_EPOCHS} epochs — capped corpora keep their full capacity
    and the freed budget is re-spread equally over the uncapped rest. This
    is the epoch-bounded complement of ``corpus_mixing_stats`` (uncapped
    temperature sampling): the panel a multilingual-mixture owner reads to
    see which corpora are repetition-bound and what the realized mixture
    fractions are.

    The waterline needs NO iteration: with corpora sorted by capacity
    ascending, corpus i is capped iff
    ``capacity_i * (n - i + 1) + prefix_cap_i < budget`` — the condition is
    monotone in i (the difference telescopes to
    ``(c_{{i+1}} - c_i) * (n - i) >= 0``), so one window pass + one global
    aggregate computes the exact fixed point. All threshold arithmetic is
    BIGINT (engine-exact); the only division is the final fair share.

    Scale shape: one token-count aggregate (map-side combined) to ~|S|x|L|
    rows, then windows over that tiny allocation table — the document scan
    is never shuffled. The declared-unused ML surface (SURVEY #45
    extension; reference schema `ethical_crawler.py:842` ff. stores corpus
    metadata it never budgets)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source", "lang").agg(
        F.sum(T.n_tokens("text")).cast("long").alias("tokens")
    )
    # pin the ~|S|x|L|-row allocation table: three consumers (totals,
    # window pass, cap-mass aggregate) must not re-scan the corpus
    cap = materialize(
        tok.withColumn(
            "capacity", (F.col("tokens") * _UNIMAX_CAP_EPOCHS).cast("long")
        )
    )
    tot = F.broadcast(
        cap.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.sum("tokens") * _UNIMAX_BUDGET_X).cast("long").alias("budget"),
        )
    )
    w = Window.orderBy("capacity", "source", "lang")
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    ranked = (
        cap.crossJoin(tot)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .withColumn(
            "prefix_cap",
            F.coalesce(F.sum("capacity").over(wp), F.lit(0)).cast("long"),
        )
    )
    flagged = ranked.withColumn(
        "capped",
        (
            F.col("capacity") * (F.col("n") - F.col("rn") + 1)
            + F.col("prefix_cap")
        )
        < F.col("budget"),
    )
    cstat = F.broadcast(
        flagged.agg(
            F.coalesce(
                F.sum(F.when(F.col("capped"), F.col("capacity"))), F.lit(0)
            )
            .cast("long")
            .alias("capped_sum"),
            F.sum(F.col("capped").cast("long")).cast("long").alias("n_capped"),
        )
    )
    fair = (F.col("budget") - F.col("capped_sum")).cast("double") / (
        F.col("n") - F.col("n_capped")
    ).cast("double")
    alloc = F.when(F.col("capped"), F.col("capacity").cast("double")).otherwise(
        fair
    )
    return (
        flagged.crossJoin(cstat)
        .select(
            "source",
            "lang",
            "tokens",
            "capacity",
            F.col("capped").cast("int").alias("is_capped"),
            F.round(alloc, 2).alias("alloc_tokens"),
            F.round(alloc / F.col("tokens").cast("double"), 4).alias("epochs"),
            F.round(alloc / F.col("budget").cast("double"), 6).alias(
                "mix_frac"
            ),
        )
        .orderBy("source", "lang")
    )


#: Temperature-sampling token budget (tokens drawn from the mixture).
_TEMP_BUDGET = 100_000


@register(
    "temperature_sampling_stats",
    oracle=f"""
    WITH tok AS (
      SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS ntot FROM tok),
    al AS (SELECT CAST(x AS DOUBLE) AS alpha
           FROM (VALUES (0.25), (0.5), (0.75), (1.0)) v(x)),
    w AS (
      SELECT al.alpha, t.lang, t.n_tokens,
             CAST(ROUND(CASE al.alpha
               WHEN 0.25 THEN sqrt(sqrt(t.n_tokens::DOUBLE))
               WHEN 0.5  THEN sqrt(t.n_tokens::DOUBLE)
               WHEN 0.75 THEN sqrt(t.n_tokens::DOUBLE)
                              * sqrt(sqrt(t.n_tokens::DOUBLE))
               ELSE t.n_tokens::DOUBLE
             END, 6) AS DECIMAL(38,6)) AS w6
      FROM tok t, al
    ),
    ws AS (SELECT alpha, SUM(w6) AS wsum FROM w GROUP BY alpha)
    SELECT w.alpha, w.lang, w.n_tokens,
           ROUND(w.w6::DOUBLE / ws.wsum::DOUBLE, 6) AS p_sampled,
           ROUND(w.n_tokens::DOUBLE / tot.ntot::DOUBLE, 6) AS p_raw,
           ROUND((w.w6::DOUBLE / ws.wsum::DOUBLE)
                 / (w.n_tokens::DOUBLE / tot.ntot::DOUBLE), 4) AS boost,
           ROUND((w.w6::DOUBLE / ws.wsum::DOUBLE) * {_TEMP_BUDGET}.0, 2)
             AS expected_tokens
    FROM w JOIN ws ON w.alpha = ws.alpha, tot
    ORDER BY w.alpha, w.lang
    """,
)
def temperature_sampling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual temperature sampling (the mT5 / XLM-R mixture rule):
    per-language sampling probability p_l proportional to n_l^alpha at
    alpha in {{0.25, 0.5, 0.75, 1.0}}, with the upsampling boost over
    natural frequency and the expected token draw at a {_TEMP_BUDGET}-token
    budget. alpha=1 is proportional sampling (head languages dominate);
    lower alpha flattens the mixture toward uniform — the panel shows
    exactly how much tail-language boost each temperature buys. The
    power-law complement of `unimax_allocation_stats` (hard caps).

    Engine-exactness trick: the alpha grid is chosen so n^alpha is an
    exact IEEE expression — sqrt(sqrt(n)), sqrt(n), sqrt(n)*sqrt(sqrt(n)),
    n — sqrt and a single multiply are correctly-rounded in BOTH engines,
    so no pow() ulp drift can leak into the hash. Weights are then
    quantized to 6 dp DECIMAL before the per-alpha sum (order-insensitive
    denominator); every ratio is a mirrored double expression. Scale
    shape: one map-side-combined token count per lang; everything after
    is |langs| x |alphas| rows."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens")
    )
    tot = F.broadcast(
        tok.agg(F.sum("n_tokens").cast("long").alias("ntot"))
    )
    nd = F.col("n_tokens").cast("double")
    w_expr = (
        F.when(F.col("alpha") == 0.25, F.sqrt(F.sqrt(nd)))
        .when(F.col("alpha") == 0.5, F.sqrt(nd))
        .when(F.col("alpha") == 0.75, F.sqrt(nd) * F.sqrt(F.sqrt(nd)))
        .otherwise(nd)
    )
    w = tok.select(
        F.explode(
            F.array(*[F.lit(a) for a in (0.25, 0.5, 0.75, 1.0)])
        ).alias("alpha"),
        "lang",
        "n_tokens",
    ).select(
        "alpha",
        "lang",
        "n_tokens",
        F.round(w_expr, 6).cast("decimal(38,6)").alias("w6"),
    )
    ws = w.groupBy("alpha").agg(F.sum("w6").alias("wsum"))
    p = F.col("w6").cast("double") / F.col("wsum").cast("double")
    praw = F.col("n_tokens").cast("double") / F.col("ntot").cast("double")
    return (
        w.join(ws, "alpha")
        .crossJoin(tot)
        .select(
            "alpha",
            "lang",
            "n_tokens",
            F.round(p, 6).alias("p_sampled"),
            F.round(praw, 6).alias("p_raw"),
            F.round(p / praw, 4).alias("boost"),
            F.round(p * F.lit(float(_TEMP_BUDGET)), 2).alias(
                "expected_tokens"
            ),
        )
        .orderBy("alpha", "lang")
    )


@register(
    "markov_entropy_stats",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    tots AS (
      SELECT prev_type, CAST(SUM(c) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS nt
      FROM pairs GROUP BY prev_type
    ),
    terms AS (
      SELECT p.prev_type, t.t, t.nt,
             CAST(ROUND((p.c::DOUBLE / t.t::DOUBLE)
                        * log2(p.c::DOUBLE / t.t::DOUBLE), 9)
                  AS DECIMAL(18,9)) AS h9
      FROM pairs p JOIN tots t USING (prev_type)
    )
    SELECT prev_type AS event_type,
           MAX(t) AS n_trans,
           MAX(nt) AS n_next_types,
           ROUND(-SUM(h9)::DOUBLE, 6) AS entropy_bits,
           CASE WHEN MAX(nt) > 1
                THEN ROUND(-SUM(h9)::DOUBLE / log2(MAX(nt)::DOUBLE), 6)
           END AS norm_entropy
    FROM terms GROUP BY prev_type ORDER BY event_type
    """,
)
def markov_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predictability of the user event stream: per preceding event type,
    the Shannon entropy (bits) of the next-event distribution, plus the
    entropy normalized by log2(branching factor). The information-theory
    rollup of `event_transition_matrix` (which shows the raw transition
    probabilities): norm_entropy near 1 means "after this event anything
    happens" (the matrix row is uniform — sessionization features will
    not help a model), near 0 means the next step is nearly determined.
    Transitions use the same (user, ts, event_id)-ordered LAG derivation
    as the matrix panel, so the two panels are row-consistent.

    Float discipline: each p*log2(p) term is round-9-quantized to
    DECIMAL before the per-type sum (order-insensitive; the 1-ulp log2
    risk sits behind the 9-dp round, the `zipf_fit_stats` precedent);
    branching guard mirrors NULL for single-successor types. Scale
    shape: one windowed pass partitioned by user, then
    |types|^2-bounded aggregates."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tots = pairs.groupBy("prev_type").agg(
        F.sum("c").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("nt"),
    )
    p = F.col("c").cast("double") / F.col("t").cast("double")
    terms = pairs.join(tots, "prev_type").select(
        "prev_type",
        "t",
        "nt",
        F.round(p * F.log2(p), 9).cast("decimal(18,9)").alias("h9"),
    )
    ent = -F.sum("h9").cast("double")
    return (
        terms.groupBy(F.col("prev_type").alias("event_type"))
        .agg(
            F.max("t").alias("n_trans"),
            F.max("nt").alias("n_next_types"),
            F.round(ent, 6).alias("entropy_bits"),
            F.when(
                F.max("nt") > 1,
                F.round(ent / F.log2(F.max("nt").cast("double")), 6),
            ).alias("norm_entropy"),
        )
        .orderBy("event_type")
    )


@register(
    "event_path_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t3
      FROM events
    ),
    paths AS (
      SELECT t1 || '>' || t2 || '>' || t3 AS path,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM paths)
    SELECT p.path, p.n,
           ROUND(p.n::DOUBLE / tot.t::DOUBLE, 6) AS share
    FROM paths p, tot
    ORDER BY p.n DESC, p.path
    LIMIT 20
    """,
)
def event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user paths (the Sankey/flow panel behind every
    product-analytics tool): sliding windows of three consecutive event
    types per user, counted corpus-wide with each path's share of all
    3-step windows. The 2nd-order extension of `event_transition_matrix`
    (1-step) and `markov_entropy_stats` (1-step predictability): if a
    path like view>click>purchase dominates its prefix's alternatives,
    the funnel is real; a flat top-20 says navigation is noise.

    Exactness: pure integer counts over LEAD windows with the family's
    (ts, event_id) total order; the top-20 carries a unique (n DESC,
    path) tie-break on both sides. Scale shape: one windowed pass
    partitioned by user, map-side-combined path counts (bounded by
    |types|^3), TakeOrderedAndProject for the limit."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    paths = seq.groupBy(
        F.concat_ws(">", "t1", "t2", "t3").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = F.broadcast(paths.agg(F.sum("n").cast("long").alias("t")))
    return (
        paths.crossJoin(tot)
        .select(
            "path",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
        )
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@register(
    "attribution_last_touch",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, value, ts, event_id,
             LAST_VALUE(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    ),
    pur AS (
      SELECT COALESCE(touch, 'direct') AS touch,
             CAST(ROUND(value, 2) AS DECIMAL(18,2)) AS v
      FROM seq WHERE event_type = 'purchase'
    ),
    agg AS (
      SELECT touch, CAST(COUNT(*) AS BIGINT) AS n_purchases,
             SUM(v) AS sv
      FROM pur GROUP BY touch
    ),
    tot AS (SELECT SUM(sv) AS t FROM agg)
    SELECT a.touch, a.n_purchases,
           ROUND(a.sv::DOUBLE, 2) AS attributed_value,
           ROUND(a.sv::DOUBLE / tot.t::DOUBLE, 6) AS value_share
    FROM agg a, tot
    ORDER BY a.touch
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: every purchase's value is credited
    to the last non-purchase event type the user emitted strictly before
    it (purchases with no prior touch credit 'direct'). The
    marketing-analytics panel that closes the product family —
    transitions say what users do next, the funnel says how many arrive,
    this says which touchpoint gets paid. Last-touch is the deliberately
    simple baseline model; swapping the window for a decayed multi-touch
    kernel reuses `time_decay_scores`' weight table.

    Exactness: the carried touch is LAST_VALUE IGNORE NULLS over the
    family's (ts, event_id) ROWS frame — identical frame semantics both
    engines; purchase values quantize round-2 to DECIMAL before the per-
    touch sums. Scale shape: one windowed pass partitioned by user, then
    |types|-row aggregates."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        )
        .over(w)
        .alias("touch"),
    )
    pur = seq.filter(F.col("event_type") == "purchase").select(
        F.coalesce("touch", F.lit("direct")).alias("touch"),
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    )
    agg = pur.groupBy("touch").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("v").alias("sv"),
    )
    tot = F.broadcast(agg.agg(F.sum("sv").alias("t")))
    return (
        agg.crossJoin(tot)
        .select(
            "touch",
            "n_purchases",
            F.round(F.col("sv").cast("double"), 2).alias("attributed_value"),
            F.round(
                F.col("sv").cast("double") / F.col("t").cast("double"), 6
            ).alias("value_share"),
        )
        .orderBy("touch")
    )


@register(
    "attribution_position_based",
    oracle="""
    WITH base AS (
      SELECT user_id, event_type, value, ts, event_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS rgrp
      FROM events
    ),
    pur AS (
      SELECT user_id, rgrp,
             CAST(ROUND(value, 2) AS DECIMAL(18,2)) AS v
      FROM base WHERE event_type = 'purchase'
    ),
    tch AS (
      SELECT user_id, rgrp, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, rgrp
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, rgrp) AS n
      FROM base WHERE event_type <> 'purchase' AND rgrp >= 1
    ),
    credited AS (
      SELECT t.event_type AS touch,
             CAST(ROUND((CASE WHEN t.n = 1 THEN 1.0
                              WHEN t.n = 2 THEN 0.5
                              WHEN t.rn = 1 OR t.rn = t.n THEN 0.4
                              ELSE 0.2 / (t.n - 2) END) * p.v::DOUBLE, 4)
                  AS DECIMAL(18,4)) AS c
      FROM tch t JOIN pur p USING (user_id, rgrp)
      UNION ALL
      SELECT 'direct' AS touch, CAST(p.v AS DECIMAL(18,4)) AS c
      FROM pur p
      WHERE NOT EXISTS (SELECT 1 FROM tch t
                        WHERE t.user_id = p.user_id AND t.rgrp = p.rgrp)
    ),
    agg AS (
      SELECT touch, CAST(COUNT(*) AS BIGINT) AS n_credits,
             SUM(c) AS sv
      FROM credited GROUP BY touch
    ),
    tot AS (SELECT SUM(sv) AS t FROM agg)
    SELECT a.touch, a.n_credits,
           ROUND(a.sv::DOUBLE, 2) AS attributed_value,
           ROUND(a.sv::DOUBLE / tot.t::DOUBLE, 6) AS value_share
    FROM agg a, tot ORDER BY a.touch
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch revenue attribution: each
    purchase's value splits 40/20/40 across the touch events since the
    user's previous purchase — first touch 40%, last touch 40%, the
    middle touches share 20% equally (1 touch takes 100%, 2 touches
    50/50, no touches credit 'direct'). The multi-touch counterweight to
    `attribution_last_touch`: last-touch over-pays the final click; the
    U-shape pays discovery and closing.

    The touch→purchase assignment is the reverse-cumulative-purchase
    trick: rgrp = COUNT(purchases) over [CURRENT ROW, UNBOUNDED
    FOLLOWING] gives every event the id of its NEXT purchase, turning a
    per-purchase range join into one window pass plus an equi-join on
    (user, rgrp). Exactness: each credit share is a mirrored double
    expression (exact dyadic constants 0.4/0.5/1.0; the one true
    division 0.2/(n-2) is identical both engines), credit x value is
    round-4-quantized to DECIMAL before summing; conservation (sum of
    credits = sum of purchase values) is pinned in tests. Scale shape:
    two windowed passes partitioned by user, an equi-join on (user,
    rgrp), and a |types|-row rollup — no range join, no explode."""
    ev = load_table(spark, sf_dir, "events")
    wrev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    base = ev.select(
        "user_id",
        "event_type",
        "value",
        "ts",
        "event_id",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .over(wrev)
        .alias("rgrp"),
    )
    pur = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "rgrp",
        F.round("value", 2).cast("decimal(18,2)").alias("v"),
    )
    wtch = Window.partitionBy("user_id", "rgrp").orderBy("ts", "event_id")
    wcnt = Window.partitionBy("user_id", "rgrp")
    tch = (
        base.filter((F.col("event_type") != "purchase") & (F.col("rgrp") >= 1))
        .select(
            "user_id",
            "rgrp",
            "event_type",
            F.row_number().over(wtch).alias("rn"),
            F.count(F.lit(1)).over(wcnt).alias("n"),
        )
    )
    credit = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    touched = tch.join(pur, ["user_id", "rgrp"]).select(
        F.col("event_type").alias("touch"),
        F.round(credit * F.col("v").cast("double"), 4)
        .cast("decimal(18,4)")
        .alias("c"),
    )
    direct = (
        pur.join(
            tch.select("user_id", "rgrp").distinct(),
            ["user_id", "rgrp"],
            "left_anti",
        ).select(
            F.lit("direct").alias("touch"),
            F.col("v").cast("decimal(18,4)").alias("c"),
        )
    )
    agg = touched.unionByName(direct).groupBy("touch").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.sum("c").alias("sv"),
    )
    tot = F.broadcast(agg.agg(F.sum("sv").alias("t")))
    return (
        agg.crossJoin(tot)
        .select(
            "touch",
            "n_credits",
            F.round(F.col("sv").cast("double"), 2).alias("attributed_value"),
            F.round(
                F.col("sv").cast("double") / F.col("t").cast("double"), 6
            ).alias("value_share"),
        )
        .orderBy("touch")
    )


#: power-iteration rounds for the stationary distribution.
_STAT_ITERS = 4


def _stationary_oracle() -> str:
    """Generated CTE chain (graph_q/PCA discipline): one iteration CTE
    per power-iteration round over the 5x5 transition matrix."""
    its = []
    for t in range(1, _STAT_ITERS + 1):
        prev = "p0" if t == 1 else f"it{t - 1}"
        its.append(
            f"""it{t} AS (
      SELECT pm.next_type AS t,
             SUM(CAST(ROUND({prev}.p * pm.p, 9)
                      AS DECIMAL(18,9)))::DOUBLE AS p
      FROM pm JOIN {prev} ON pm.prev_type = {prev}.t
      GROUP BY pm.next_type
    )"""
        )
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ),
    pm AS (
      SELECT prev_type, next_type,
             n::DOUBLE / SUM(n) OVER (PARTITION BY prev_type)::DOUBLE AS p
      FROM pairs
    ),
    p0 AS (SELECT DISTINCT prev_type AS t, 0.2 AS p FROM pm),
    {",".join(its)},
    obs AS (
      SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn FROM obs)
    SELECT obs.t AS event_type, obs.n AS n_events,
           ROUND(obs.n::DOUBLE / tot.tn::DOUBLE, 6) AS observed_share,
           ROUND(it{_STAT_ITERS}.p, 6) AS stationary_p,
           ROUND(it{_STAT_ITERS}.p
                 - obs.n::DOUBLE / tot.tn::DOUBLE, 6) AS gap
    FROM obs JOIN it{_STAT_ITERS} ON obs.t = it{_STAT_ITERS}.t, tot
    ORDER BY event_type
    """


@register("markov_stationary_dist", oracle=_stationary_oracle())
def markov_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-event Markov chain
    (`event_transition_matrix`'s P, taken to the limit by four rounds of
    power iteration from uniform), next to the observed marginal share
    of each event type. The gap column is the behavioral-drift readout:
    the marginal says where traffic IS, the stationary says where the
    transition dynamics would take it if they kept running — a positive
    gap on 'error' means the chain funnels sessions toward errors
    faster than today's mix shows, the early-warning complement of
    `markov_entropy_stats` (which scores predictability, not
    destination).

    Exactness follows the iterative discipline (PageRank/PCA): the
    transition probabilities are one mirrored double division off
    integer counts; each iteration round-9-quantizes its 25 product
    terms before the DECIMAL sum; four rounds are generated as chained
    CTEs so the engines cannot drift. Scale shape: one windowed pass
    partitioned by user builds the 5x5 matrix; every iteration runs on
    25 rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    pm = materialize(
        pairs.select(
            "prev_type",
            "next_type",
            (
                F.col("n").cast("double")
                / F.sum("n")
                .over(Window.partitionBy("prev_type"))
                .cast("double")
            ).alias("p"),
        )
    )
    p = pm.select(F.col("prev_type").alias("t")).distinct().select(
        "t", F.lit(0.2).alias("p")
    )
    for _ in range(_STAT_ITERS):
        p = (
            pm.join(
                F.broadcast(p.withColumnRenamed("p", "pv")),
                pm.prev_type == F.col("t"),
            )
            .select(
                F.col("next_type").alias("nt"),
                F.round(F.col("pv") * F.col("p"), 9)
                .cast("decimal(18,9)")
                .alias("term"),
            )
            .groupBy("nt")
            .agg(F.sum("term").cast("double").alias("p"))
            .select(F.col("nt").alias("t"), "p")
        )
    obs = ev.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = F.broadcast(obs.agg(F.sum("n").cast("long").alias("tn")))
    oshare = F.col("n").cast("double") / F.col("tn").cast("double")
    return (
        obs.join(p, "t")
        .crossJoin(tot)
        .select(
            F.col("t").alias("event_type"),
            F.col("n").alias("n_events"),
            F.round(oshare, 6).alias("observed_share"),
            F.round("p", 6).alias("stationary_p"),
            F.round(F.col("p") - oshare, 6).alias("gap"),
        )
        .orderBy("event_type")
    )
