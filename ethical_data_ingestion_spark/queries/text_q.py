"""Text-analysis queries over the documents table (SURVEY #45 extension).

Every query pairs a Catalyst-expression pipeline with an exactly-equivalent
DuckDB SQL mirror (same stopword lists, same regex, same rounding), so the
"ML-ish" text ops get the same hash-level correctness gate as the relational
ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize
from ..operators import text as T
from ..operators.analytics import davg
from ..registry import register

_EN = "'the','a','of','and','to'"
_DE = "'der','die','das','und','ist'"
_ES = "'el','la','de','y','que'"
_FR = "'le','la','et','les','des'"


def _sw_count(sql_list: str) -> str:
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({sql_list})))"


@register(
    "text_quality_stats",
    oracle=f"""
    WITH scored AS (
      SELECT
        source,
        len(string_split(text, ' ')) AS n_tok,
        ROUND({_sw_count(_EN)}::DOUBLE / len(string_split(text, ' '))::DOUBLE, 6) AS swr,
        ROUND(length(replace(text, ' ', ''))::DOUBLE
              / len(string_split(text, ' '))::DOUBLE, 6) AS alen
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(swr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(swr), 4) AS avg_stopword_ratio,
           ROUND(CAST(SUM(CAST(alen AS DECIMAL(18,6))) AS DOUBLE) / COUNT(alen), 4) AS avg_token_len
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring rollup: token counts, stopword ratio, mean token
    length per source — the cheap quality signals an LLM-data pipeline
    filters on. All array/string expressions; zero Python in the row path."""
    docs = load_table(spark, sf_dir, "documents")
    en = [s for lang, s in T.LANG_STOPWORDS if lang == "en"][0]
    scored = docs.select(
        "source",
        T.n_tokens("text").alias("n_tok"),
        T.stopword_ratio("text", en).alias("swr"),
        T.avg_token_len("text").alias("alen"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            davg("swr", "avg_stopword_ratio"),
            davg("alen", "avg_token_len"),
        )
        .orderBy("source")
    )


@register(
    "token_count_bpe",
    oracle=f"""
    SELECT source,
           CAST(SUM(len(regexp_extract_all(text, '{T.TOKEN_RE}'))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex) — the
    `tiktoken` surface (SURVEY #45) as pure Catalyst regexp expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.sum(T.n_tokens_bpe("text")).cast("long").alias("total_bpe_tokens"),
            F.sum(T.n_tokens("text")).cast("long").alias("total_ws_tokens"),
        )
        .orderBy("source")
    )


@register(
    "lang_id_confusion",
    oracle=f"""
    WITH guessed AS (
      SELECT lang,
             CASE
               WHEN {_sw_count(_EN)} > 0 AND {_sw_count(_EN)} >= greatest({_sw_count(_DE)}, {_sw_count(_ES)}, {_sw_count(_FR)}) THEN 'en'
               WHEN {_sw_count(_DE)} > 0 AND {_sw_count(_DE)} >= greatest({_sw_count(_EN)}, {_sw_count(_ES)}, {_sw_count(_FR)}) THEN 'de'
               WHEN {_sw_count(_ES)} > 0 AND {_sw_count(_ES)} >= greatest({_sw_count(_EN)}, {_sw_count(_DE)}, {_sw_count(_FR)}) THEN 'es'
               WHEN {_sw_count(_FR)} > 0 AND {_sw_count(_FR)} >= greatest({_sw_count(_EN)}, {_sw_count(_DE)}, {_sw_count(_ES)}) THEN 'fr'
               ELSE 'und'
             END AS lang_guess
      FROM documents
    )
    SELECT lang, lang_guess, COUNT(*) AS n
    FROM guessed
    GROUP BY lang, lang_guess
    ORDER BY lang, lang_guess
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword vote) × labeled lang — a confusion
    matrix. The fixture text is synthetic word soup, so the value here is
    the operator mechanics, verified bit-for-bit against the SQL CASE
    mirror of the same vote."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_guess("text").alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_guess")
    )


@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    ORDER BY doc_id
    LIMIT 100
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 over normalized text (md5 chosen because
    it is bit-identical across engines; xxhash64 is Spark-private)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", T.fingerprint("text").alias("fp"))
        .orderBy("doc_id")
        .limit(100)
    )


@register(
    "word_frequency_topk",
    oracle="""
    SELECT w AS word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY freq DESC, word
    LIMIT 25
    """,
)
def word_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequency top-k: explode → count → TakeOrdered. The
    classic two-phase pattern: partial counts map-side, only |vocab| rows
    shuffle — at 100 TB the shuffle is bounded by vocabulary size, not
    corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(25)
    )


@register(
    "search_bm25_topk",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    doclen AS (SELECT doc_id, COUNT(*)::DOUBLE AS dl FROM corpus GROUP BY doc_id),
    globs AS (SELECT COUNT(*)::DOUBLE AS n_docs, AVG(dl) AS avgdl FROM doclen),
    tf AS (
      SELECT doc_id, term, COUNT(*)::DOUBLE AS tf
      FROM corpus WHERE term IN ('spark', 'vector', 'window')
      GROUP BY doc_id, term
    ),
    dft AS (SELECT term, COUNT(*)::DOUBLE AS dft FROM tf GROUP BY term),
    parts AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln((g.n_docs - d.dft + 0.5) / (d.dft + 0.5) + 1.0)
               * (tf.tf * (1.2 + 1)) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / g.avgdl)),
               6) AS DECIMAL(18,6)) AS part
      FROM tf JOIN dft d USING (term) JOIN doclen l USING (doc_id), globs g
    ),
    scored AS (
      SELECT doc_id, ROUND(CAST(SUM(part) AS DOUBLE), 4) AS score
      FROM parts GROUP BY doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the query {spark, vector, window} — the ranked-FTS
    upgrade of the reference's ILIKE search (SURVEY #15). Same relevance
    math on both engines; per-term partials rounded then decimal-summed so
    the ranking is partition-order-proof."""
    from ..operators.search import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "vector", "window"], k=20)


@register(
    "validation_gate_stats",
    oracle="""
    WITH checked AS (
      SELECT source,
             (text IS NOT NULL AND length(text) > 0) AS r_nonempty,
             (lang IN ('en','de','es','fr','zh','ja','pt','ru')) AS r_lang,
             (n_chars = length(text)) AS r_chars,
             (len(string_split(text, ' ')) >= 3) AS r_mintok
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE r_nonempty AND r_lang AND r_chars AND r_mintok)
             AS n_pass,
           COUNT(*) FILTER (WHERE NOT r_nonempty) AS v_empty,
           COUNT(*) FILTER (WHERE NOT r_lang) AS v_lang,
           COUNT(*) FILTER (WHERE NOT r_chars) AS v_chars,
           COUNT(*) FILTER (WHERE NOT r_mintok) AS v_mintok
    FROM checked
    GROUP BY source
    ORDER BY source
    """,
)
def validation_gate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compliance gate (SURVEY #31) applied to DATA, not just sources —
    the training-pipeline shape: declarative per-row rules evaluated in one
    projection, rows with any violation quarantined, per-rule violation
    counts for the audit panel. Every rule is a codegen'd boolean fused
    into the scan; the gate costs one pass at any scale."""
    from ..sources.compliance import Rule, with_issues

    docs = load_table(spark, sf_dir, "documents")
    rules = [
        Rule("nonempty", F.col("text").isNotNull() & (F.length("text") > 0), "empty text"),
        Rule("lang", F.col("lang").isin("en", "de", "es", "fr", "zh", "ja", "pt", "ru"), "unknown lang"),
        Rule("chars", F.col("n_chars") == F.length("text"), "n_chars mismatch"),
        Rule("mintok", T.n_tokens("text") >= 3, "too few tokens"),
    ]
    checked = with_issues(docs, rules)
    return (
        checked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.size("issues") == 0).cast("long")).alias("n_pass"),
            F.sum(F.array_contains("issues", "empty text").cast("long")).alias("v_empty"),
            F.sum(F.array_contains("issues", "unknown lang").cast("long")).alias("v_lang"),
            F.sum(F.array_contains("issues", "n_chars mismatch").cast("long")).alias("v_chars"),
            F.sum(F.array_contains("issues", "too few tokens").cast("long")).alias("v_mintok"),
        )
        .orderBy("source")
    )


@register(
    "text_repetition_stats",
    oracle="""
    WITH grams AS (
      SELECT doc_id, source,
             list_transform(
               range(1, greatest(len(string_split(text, ' ')) - 1, 1) + 1),
               i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')) AS bg
      FROM documents
    ),
    counts AS (
      SELECT doc_id, source, g, COUNT(*) AS c
      FROM (SELECT doc_id, source, unnest(bg) AS g FROM grams)
      GROUP BY doc_id, source, g
    ),
    per_doc AS (
      SELECT doc_id, source,
             ROUND(MAX(c)::DOUBLE / SUM(c)::DOUBLE, 6) AS top_bigram_frac
      FROM counts GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(top_bigram_frac AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(top_bigram_frac), 4) AS avg_top_bigram_frac,
           CAST(SUM(CASE WHEN top_bigram_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repetitive
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality scoring (the Gopher-rule family): fraction
    of a document occupied by its most frequent word bigram; documents
    above 20% flag as repetitive. Explode → per-doc count → max/sum ratio:
    two shuffles keyed on doc, both map-side combined — linear at corpus
    scale."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", "source",
        F.explode(T.shingles_raw("text", 2)).alias("g"),
    )
    counts = grams.groupBy("doc_id", "source", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("doc_id", "source").agg(
        F.round(F.max("c").cast("double") / F.sum("c").cast("double"), 6).alias(
            "top_bigram_frac"
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("top_bigram_frac", "avg_top_bigram_frac"),
            F.sum((F.col("top_bigram_frac") > 0.2).cast("long")).alias(
                "n_repetitive"
            ),
        )
        .orderBy("source")
    )


_SEQ_LEN = 2048


@register(
    "sequence_packing_stats",
    oracle=f"""
    WITH counted AS (
      SELECT source,
             len(regexp_extract_all(text, '{T.TOKEN_RE}')) AS n_tok
      FROM documents
    ),
    per_source AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN n_tok > {_SEQ_LEN} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_docs_over_seq
      FROM counted
      GROUP BY source
    )
    SELECT source, n_docs, total_tokens, n_docs_over_seq,
           CAST(floor((total_tokens + {_SEQ_LEN - 1}) / {_SEQ_LEN}.0)
                AS BIGINT) AS n_sequences,
           ROUND(total_tokens / (floor((total_tokens + {_SEQ_LEN - 1})
                 / {_SEQ_LEN}.0) * {_SEQ_LEN}.0), 4) AS utilization
    FROM per_source
    ORDER BY source
    """,
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch construction panel: concat-and-chunk sequence packing
    (the GPT-style pretraining layout — documents concatenated per source,
    split into fixed {_SEQ_LEN}-token sequences) summarized per source:
    total BPE-ish tokens, resulting sequence count, packing utilization
    (1.0 minus tail waste), and how many documents exceed one sequence.

    One scan + one map-side-combined aggregate — packing a 100 TB corpus
    is metadata arithmetic over token counts, not a data movement: the
    counts pushed here are the same cumulative offsets a packer job would
    write, so the panel costs one aggregation regardless of corpus size.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.n_tokens_bpe("text")).cast("long").alias("total_tokens"),
        F.sum((T.n_tokens_bpe("text") > _SEQ_LEN).cast("long")).alias(
            "n_docs_over_seq"
        ),
    )
    n_seq = F.floor(
        (F.col("total_tokens") + (_SEQ_LEN - 1)) / float(_SEQ_LEN)
    ).cast("long")
    return per.select(
        "source",
        "n_docs",
        "total_tokens",
        "n_docs_over_seq",
        n_seq.alias("n_sequences"),
        F.round(
            F.col("total_tokens") / (n_seq * float(_SEQ_LEN)), 4
        ).alias("utilization"),
    ).orderBy("source")


_MIX_ALPHA = 0.5  # temperature exponent for mixing weights


@register(
    "corpus_mixing_stats",
    oracle=f"""
    WITH tok AS (
      SELECT source,
             CAST(SUM(len(regexp_extract_all(text, '{T.TOKEN_RE}')))
                  AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, tokens,
             CAST(ROUND(sqrt(tokens), 9) AS DECIMAL(28,9)) AS wgt
      FROM tok
    ),
    tot AS (
      SELECT CAST(SUM(tokens) AS DOUBLE) AS t,
             CAST(SUM(wgt) AS DOUBLE) AS sw
      FROM w
    )
    SELECT source, tokens,
           ROUND(tokens / t, 6) AS natural_frac,
           ROUND(CAST(wgt AS DOUBLE) / sw, 6) AS mixing_weight,
           ROUND((CAST(wgt AS DOUBLE) / sw) / (tokens / t), 4) AS boost
    FROM w, tot
    ORDER BY source
    """,
)
def corpus_mixing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture recipe panel: temperature-based source mixing
    (weight ∝ tokens^{_MIX_ALPHA}, the standard alpha-sampling used for
    multilingual/multi-source pretraining) — per source: natural token
    share, re-balanced mixing weight, and the resulting up/down-sampling
    boost. The per-source weights are what a sampler job feeds back into
    `stratified_sample_stats`-style hash sampling.

    One token-count aggregate (map-side combined) + a broadcast of the
    2-scalar totals row — no shuffle of document rows, no window. The
    sqrt weights round to 9 decimals and accumulate in DECIMAL so the
    totals are partition-order-proof and oracle-exact."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(T.n_tokens_bpe("text")).cast("long").alias("tokens")
    )
    w = tok.withColumn(
        "wgt", F.round(F.sqrt("tokens"), 9).cast("decimal(28,9)")
    )
    tot = F.broadcast(
        w.agg(
            F.sum("tokens").cast("double").alias("t"),
            F.sum("wgt").cast("double").alias("sw"),
        )
    )
    return (
        w.crossJoin(tot)
        .select(
            "source",
            "tokens",
            F.round(F.col("tokens") / F.col("t"), 6).alias("natural_frac"),
            F.round(F.col("wgt").cast("double") / F.col("sw"), 6).alias(
                "mixing_weight"
            ),
            F.round(
                (F.col("wgt").cast("double") / F.col("sw"))
                / (F.col("tokens") / F.col("t")),
                4,
            ).alias("boost"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-5 widening: fixed-weight quality-filter ensemble.

_ENS_TAU = 0.6  # decision threshold; calibrated so both classes occur

#: Per-document quality-score CTEs (``qf`` → ``qz(doc_id, source, z)``) —
#: the doc-level form of ``quality_filter_ensemble``'s frozen-weight score,
#: shared with cross-module consumers (dedup survivor selection). Keep the
#: expressions in lockstep with the ensemble oracle below.
def quality_z_cte(from_rel: str = "documents") -> str:
    """The qf → qz CTE pair over an arbitrary source relation (must
    expose doc_id, source, text) — lets stream-subset oracles score the
    same expressions over a filtered CTE instead of the full table."""
    return f"""qf AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_tok,
             ROUND({_sw_count(_EN)}::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE, 6) AS swr,
             ROUND(length(replace(text, ' ', ''))::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE, 6) AS alen,
             ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE, 6) AS ttr
      FROM {from_rel}
    ),
    qz AS (
      SELECT doc_id, source,
             ROUND(1.2 * swr + 0.8 * ttr
                   + 0.4 * least(1.0, n_tok / 128.0)
                   - 0.08 * abs(alen - 5.0), 6) AS z
      FROM qf
    )"""


QUALITY_Z_CTE = quality_z_cte()


def quality_z_df(docs: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, source, *extra, z): the frozen-weight quality score per
    document — the Spark twin of :data:`QUALITY_Z_CTE`, and the per-doc
    core of ``quality_filter_ensemble`` (same expressions, same operation
    order, so scores are bit-deterministic across engines). ``extra``
    columns pass through untouched (the streaming gate keeps ``text`` for
    the PII screen in the same projection)."""
    en = [s for lang, s in T.LANG_STOPWORDS if lang == "en"][0]
    n_tok = T.n_tokens("text")
    ttr = F.round(
        F.size(F.array_distinct(T.tokens("text"))).cast("double")
        / n_tok.cast("double"),
        6,
    )
    f = docs.select(
        "doc_id",
        "source",
        *extra,
        n_tok.alias("n_tok"),
        T.stopword_ratio("text", en).alias("swr"),
        T.avg_token_len("text").alias("alen"),
        ttr.alias("ttr"),
    )
    return f.select(
        "doc_id",
        "source",
        *extra,
        F.round(
            F.lit(1.2) * F.col("swr")
            + F.lit(0.8) * F.col("ttr")
            + F.lit(0.4)
            * F.least(F.lit(1.0), F.col("n_tok") / F.lit(128.0))
            - F.lit(0.08) * F.abs(F.col("alen") - F.lit(5.0)),
            6,
        ).alias("z"),
    )


@register(
    "quality_filter_ensemble",
    oracle=f"""
    WITH f AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tok,
             ROUND({_sw_count(_EN)}::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE, 6) AS swr,
             ROUND(length(replace(text, ' ', ''))::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE, 6) AS alen,
             ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' '))::DOUBLE, 6) AS ttr
      FROM documents
    ),
    z AS (
      SELECT source,
             ROUND(1.2 * swr + 0.8 * ttr
                   + 0.4 * least(1.0, n_tok / 128.0)
                   - 0.08 * abs(alen - 5.0), 6) AS z
      FROM f
    )
    SELECT source,
           (z >= {_ENS_TAU}) AS passed,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(z AS DECIMAL(18,6))) AS DOUBLE) / COUNT(z), 4)
             AS avg_score
    FROM z
    GROUP BY source, passed
    ORDER BY source, passed
    """,
)
def quality_filter_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality classifier (the deterministic stand-in
    for a fastText/logreg quality model): four cheap signals — stopword
    ratio, type-token ratio, capped length, mean-token-length deviation —
    combined with frozen weights into one score, thresholded into a
    keep/drop decision, rolled up per (source, decision).

    Engine-exactness: each feature is a single rounded division of
    integers; the combination is evaluated in the IDENTICAL operation
    order on both engines (left-associated weighted sum), so the score —
    and therefore the boundary decision — is bit-deterministic, no
    epsilon band needed. Per-doc scores pass through DECIMAL before the
    averaging sum (order-insensitive). A production deployment swaps the
    frozen weights for trained ones; the plan (one projection, one
    rollup, no shuffle beyond the group-by) is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    z = quality_z_df(docs).select("source", "z")
    return (
        z.groupBy("source", (F.col("z") >= _ENS_TAU).alias("passed"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("z", "avg_score"),
        )
        .orderBy("source", "passed")
    )


_LM_A = 0.5  # add-k smoothing mass


@register(
    "bigram_lm_perplexity",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
      FROM toks, unnest(range(1, len(t))) AS r(i)
      WHERE len(t) >= 2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
    v AS (
      SELECT COUNT(DISTINCT word) AS v
      FROM (SELECT unnest(t) AS word FROM toks)
    ),
    terms AS (
      SELECT bg.doc_id, bg.source,
             CAST(ROUND(
               -ln((c12.c12 + {_LM_A}) / (c1.c1 + {_LM_A} * v.v)),
               8) AS DECIMAL(18,8)) AS nll
      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    ),
    perdoc AS (
      SELECT doc_id, source,
             ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS ce
      FROM terms GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(ce AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4)
             AS avg_ce,
           MIN(ce) AS min_ce,
           MAX(ce) AS max_ce
    FROM perdoc
    GROUP BY source
    ORDER BY source
    """,
)
def bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model cross-entropy per document (add-{_LM_A}
    smoothing), rolled up per source — the KenLM-style perplexity filter
    every CCNet-descended pipeline runs, with the corpus itself as the
    LM training set. High cross-entropy flags documents whose word
    transitions the corpus finds surprising (boilerplate, shuffled text,
    wrong language); pairs with ``unigram_kl_quality``, which scores the
    marginal distribution where this scores the TRANSITIONS.

    Scale shape: bigram extraction is a generator explode; model
    estimation is two map-side-combined counts bounded by |bigram types|
    and |vocab|; scoring joins the (small) model tables back to the
    bigram stream on their keys. Float discipline is the suite's
    ln-round-8→DECIMAL pattern, so per-doc sums are partition-order
    proof; per-doc ce rounds to 6 before the source-level decimal
    average."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.split("text", " ").alias("t")
    )
    bg = (
        toks.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.size("t") - 1)).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            "source",
            F.element_at("t", F.col("i")).alias("w1"),
            F.element_at("t", F.col("i") + 1).alias("w2"),
        )
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    v = toks.select(F.explode("t").alias("word")).agg(
        F.countDistinct("word").alias("v")
    )
    terms = (
        bg.join(c12, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "source",
            F.round(
                -F.log(
                    (F.col("c12") + _LM_A)
                    / (F.col("c1") + _LM_A * F.col("v"))
                ),
                8,
            )
            .cast("decimal(18,8)")
            .alias("nll"),
        )
    )
    perdoc = terms.groupBy("doc_id", "source").agg(
        F.round(
            F.sum("nll").cast("double") / F.count(F.lit(1)), 6
        ).alias("ce")
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("ce", "avg_ce"),
            F.min("ce").alias("min_ce"),
            F.max("ce").alias("max_ce"),
        )
        .orderBy("source")
    )


# lexicon rank window for the screen's stand-in blocklist (see below)
_LEX_LO, _LEX_HI = 10, 12


@register(
    "lexicon_screen_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    freq AS (
      SELECT word, COUNT(*) AS f FROM toks WHERE word <> '' GROUP BY word
    ),
    lex AS (
      SELECT word FROM (
        SELECT word, ROW_NUMBER() OVER (ORDER BY f DESC, word) AS r FROM freq
      ) WHERE r BETWEEN {_LEX_LO} AND {_LEX_HI}
    ),
    hits AS (
      -- word <> '' mirrors the Spark side's empty-token filter: a doc
      -- whose text yields ONLY empty tokens must be excluded in both
      -- engines' n_docs/flag_rate denominators (round-5 advice)
      SELECT t.doc_id, t.source, COUNT(l.word) AS n_hits
      FROM toks t LEFT JOIN lex l ON t.word = l.word
      WHERE t.word <> ''
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(n_hits) AS BIGINT) AS total_hits,
           ROUND(SUM(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*)::DOUBLE, 6) AS flag_rate
    FROM hits
    GROUP BY source
    ORDER BY source
    """,
)
def lexicon_screen_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordlist safety screen: flag documents containing any blocklist
    term and report per-source flag rates and hit mass — the
    lexicon-based tier (toxicity/NSFW/spam wordlists) every corpus
    safety pipeline runs before model-based classifiers. The blocklist
    here is a deterministic stand-in (corpus frequency ranks
    {_LEX_LO}–{_LEX_HI}, so the fixture exercises non-zero rates without
    shipping a real toxicity lexicon); a production run broadcasts its
    actual wordlist into the same plan.

    Scale shape: the lexicon is tiny — BROADCAST against the token
    stream (left join, no corpus shuffle); per-doc hit counts combine
    map-side, the per-source rollup is trivial. Document-level flags
    rather than token redaction: the drop/keep decision is the
    screen's product (redaction lives in ``operators/text.redact_pii``)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = materialize(
        docs.select(
            "doc_id", "source", F.explode(T.tokens("text")).alias("word")
        ).filter(F.col("word") != "")
    )
    freq = toks.groupBy("word").agg(F.count(F.lit(1)).alias("f"))
    # Two-phase top-k instead of a vocabulary-sized global window (round-6
    # verdict item 6): rank band [LO, HI] = top-HI minus top-(LO-1), both
    # TakeOrderedAndProject under the (f DESC, word) total order (word is
    # unique in freq, so the prefix property makes the anti-join exact).
    # The HI-row head is pinned so the second top-k and the anti-join read
    # it, not the vocabulary; no WindowExec with an empty partition spec
    # anywhere in the plan.
    top_hi = materialize(freq.orderBy(F.desc("f"), "word").limit(_LEX_HI))
    top_lo = top_hi.orderBy(F.desc("f"), "word").limit(_LEX_LO - 1)
    lex = (
        top_hi.join(top_lo, "word", "left_anti")
        .select("word")
        .withColumn("_hit", F.lit(1))
    )
    hits = (
        toks.join(F.broadcast(lex), "word", "left")
        .groupBy("doc_id", "source")
        .agg(F.count("_hit").alias("n_hits"))
    )
    flagged = (F.col("n_hits") > 0).cast("long")
    return (
        hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(flagged).cast("long").alias("n_flagged"),
            F.sum("n_hits").cast("long").alias("total_hits"),
            F.round(
                F.sum(flagged).cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("flag_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# PII scrub audit (round-6 widening): promote the redact_pii operator
# (operators/text.py) from unit-test-only to an oracle-checked corpus
# panel. The fixture corpus contains no PII by construction, so the panel
# injects DETERMINISTIC synthetic PII (keyed on doc_id residues, mirrored
# verbatim in the oracle) before scrubbing — the fixture-exercise idiom the
# DP-noise panel already uses: production swaps the injection for the raw
# crawl text, nothing else changes.


def _pii_augmented_text() -> "F.Column":
    """The deterministic synthetic-PII injection (doc_id-residue keyed),
    shared by the panel and its idempotence test."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" reach user"),
                did.cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
            F.lit("")
        ),
        F.when(did % 11 == 0, F.lit(" id 123-45-6789")).otherwise(F.lit("")),
        F.when(did % 13 == 0, F.lit(" pay 4111 1111 1111 1111")).otherwise(
            F.lit("")
        ),
    )


@register(
    "pii_scrub_stats",
    oracle=r"""
    WITH aug AS (
      SELECT source,
             text
             || CASE WHEN doc_id % 5 = 0
                     THEN ' reach user' || CAST(doc_id AS VARCHAR)
                          || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 7 = 0
                     THEN ' call 555-123-4567' ELSE '' END
             || CASE WHEN doc_id % 11 = 0
                     THEN ' id 123-45-6789' ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN ' pay 4111 1111 1111 1111' ELSE '' END AS t
      FROM documents
    ), per AS (
      SELECT source,
             length(t) AS len_raw,
             length(regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(t,
                        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                        '(?:\+?\d{1,2}[\s.-])?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}', '<PHONE>', 'g'),
                        '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
                        '\b(?:\d[ -]?){13,19}\b', '<CARD>', 'g')) AS len_red,
             len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             len(regexp_extract_all(t, '(?:\+?\d{1,2}[\s.-])?\(?\d{3}\)?[\s.-]\d{3}[\s.-]\d{4}')) AS n_phone,
             len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
             len(regexp_extract_all(t, '\b(?:\d[ -]?){13,19}\b')) AS n_card
      FROM aug
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_email + n_phone + n_ssn + n_card > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
           CAST(SUM(n_email) AS BIGINT) AS n_email,
           CAST(SUM(n_phone) AS BIGINT) AS n_phone,
           CAST(SUM(n_ssn) AS BIGINT) AS n_ssn,
           CAST(SUM(n_card) AS BIGINT) AS n_card,
           CAST(SUM(len_raw - len_red) AS BIGINT) AS chars_removed,
           ROUND(SUM(CASE WHEN n_email + n_phone + n_ssn + n_card > 0
                          THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*)::DOUBLE, 4) AS pct_flagged
    FROM per
    GROUP BY source
    ORDER BY source
    """,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: per-source match counts per PII class, documents
    flagged, and characters removed by redaction — the release-gate panel
    a corpus runs before text leaves the quarantine zone (the scrubbing
    itself is operators/text.redact_pii, SURVEY #45 posture; reference
    scope: the compliance-verification stance of ethical_crawler.py:304
    `check_compliance`, extended to the release side).
    Synthetic PII is injected deterministically by doc_id residue so the
    fixture exercises non-zero rates; the oracle mirrors the injection.

    Scale shape: one linear scan — the counts (regexp_count) and the
    redaction (chained regexp_replace) are Catalyst expressions computed
    in the SAME projection, so auditing costs no second pass over the
    corpus; the rollup is a per-source groupBy with map-side partials.
    No Python in the row path, no shuffle beyond the final tiny rollup."""
    docs = load_table(spark, sf_dir, "documents")
    aug = _pii_augmented_text()
    per = docs.select(
        "source",
        F.length(aug).alias("len_raw"),
        F.length(T.redact_pii(aug)).alias("len_red"),
        *T.pii_counts(aug),
    )
    hit = (
        F.col("n_email") + F.col("n_phone") + F.col("n_ssn") + F.col("n_card")
        > 0
    ).cast("long")
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(hit).alias("docs_flagged"),
            F.sum("n_email").alias("n_email"),
            F.sum("n_phone").alias("n_phone"),
            F.sum("n_ssn").alias("n_ssn"),
            F.sum("n_card").alias("n_card"),
            F.sum(F.col("len_raw") - F.col("len_red")).alias("chars_removed"),
            F.round(
                F.sum(hit).cast("double") / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("pct_flagged"),
        )
        .orderBy("source")
    )


@register(
    "tokenizer_fertility_stats",
    oracle=f"""
    WITH per AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, '{T.TOKEN_RE}')) AS n_bpe,
             length(text) AS n_chars
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           ROUND(SUM(n_bpe)::DOUBLE / SUM(n_words)::DOUBLE, 4) AS fertility,
           ROUND(SUM(n_chars)::DOUBLE / SUM(n_bpe)::DOUBLE, 4)
             AS chars_per_token
    FROM per GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_fertility_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: BPE-ish tokens per whitespace word
    and characters per token, per language bucket — the panel that drives
    tokenizer/vocab selection for a multilingual corpus (high fertility =
    the tokenizer fragments that language, inflating training cost per
    byte of signal). Pure Catalyst regexp/split expressions (the tiktoken
    seam, SURVEY #45); the per-language rollup is exact-integer ratios so
    the oracle divides identical numbers.

    Scale shape: one linear scan, per-language map-side partials, final
    |langs|-row exchange — nothing else."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.n_tokens("text")).cast("long").alias("total_words"),
            F.sum(T.n_tokens_bpe("text")).cast("long").alias(
                "total_bpe_tokens"
            ),
            F.round(
                F.sum(T.n_tokens_bpe("text")).cast("double")
                / F.sum(T.n_tokens("text")).cast("double"),
                4,
            ).alias("fertility"),
            F.round(
                F.sum(F.length("text")).cast("double")
                / F.sum(T.n_tokens_bpe("text")).cast("double"),
                4,
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )


@register(
    "vocab_growth_stats",
    oracle="""
    WITH nn AS (SELECT COUNT(*) AS n FROM documents),
    tok AS (
      SELECT CAST(floor(CAST(d.doc_id * 10 AS DOUBLE) / nn.n) AS INTEGER)
               AS decile,
             unnest(string_split(d.text, ' ')) AS word
      FROM documents d, nn
    ),
    tok2 AS (SELECT decile, word FROM tok WHERE word <> ''),
    dstat AS (
      SELECT CAST(floor(CAST(d.doc_id * 10 AS DOUBLE) / nn.n) AS INTEGER)
               AS decile,
             COUNT(*) AS n_docs
      FROM documents d, nn GROUP BY 1
    ),
    tstat AS (SELECT decile, COUNT(*) AS n_tokens FROM tok2 GROUP BY 1),
    firsts AS (SELECT word, MIN(decile) AS first_decile FROM tok2
               GROUP BY word),
    neww AS (SELECT first_decile AS decile, COUNT(*) AS new_words
             FROM firsts GROUP BY 1)
    SELECT d.decile,
           d.n_docs,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(w.new_words, 0) AS BIGINT) AS new_words,
           CAST(SUM(COALESCE(w.new_words, 0)) OVER (ORDER BY d.decile)
                AS BIGINT) AS cum_vocab,
           CAST(SUM(t.n_tokens) OVER (ORDER BY d.decile) AS BIGINT)
             AS cum_tokens,
           ROUND(COALESCE(w.new_words, 0)::DOUBLE / t.n_tokens::DOUBLE, 6)
             AS novelty_rate
    FROM dstat d JOIN tstat t USING (decile) LEFT JOIN neww w USING (decile)
    ORDER BY d.decile
    """,
)
def vocab_growth_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps' law) by corpus decile: new word
    types first seen per decile of the corpus (doc_id order), cumulative
    vocabulary vs cumulative tokens, and the per-decile novelty rate — the
    diminishing-returns panel a data-scaling decision reads (when the
    curve flattens, more of the same source buys little new signal).

    Scale shape: deciles come from doc_id ARITHMETIC against one count
    scalar — not an ntile window, so there is no global sort/funnel at any
    size; first-sight is a per-word min (map-side combinable), and the
    only windows run over the 10-row decile table (benign). At 100 TB the
    same plan holds with doc_id replaced by any dense ingest sequence."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    dec = F.floor((F.col("doc_id") * 10).cast("double") / F.lit(n)).cast(
        "int"
    )
    toks = docs.select(
        dec.alias("decile"), F.explode(T.tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    dstat = docs.groupBy(dec.alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tstat = toks.groupBy("decile").agg(F.count(F.lit(1)).alias("n_tokens"))
    neww = (
        toks.groupBy("word")
        .agg(F.min("decile").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_words"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dstat.join(tstat, "decile")
        .join(neww, "decile", "left")
        .withColumn("new_words", F.coalesce("new_words", F.lit(0)))
        .select(
            "decile",
            "n_docs",
            "n_tokens",
            "new_words",
            F.sum("new_words").over(w).alias("cum_vocab"),
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.round(
                F.col("new_words").cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("novelty_rate"),
        )
        .orderBy("decile")
    )


@register(
    "quality_calibration_stats",
    oracle=f"""
    WITH {QUALITY_Z_CTE}
    SELECT CAST(floor(qz.z / 0.25) AS INTEGER) AS bin,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(qz.z AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(qz.z), 4) AS avg_z,
           CAST(SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_en,
           ROUND(SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*)::DOUBLE, 4) AS en_rate
    FROM qz JOIN documents d USING (doc_id)
    GROUP BY 1 ORDER BY 1
    """,
)
def quality_calibration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score calibration curve: the frozen-weight ensemble score
    binned at width 0.25, with the empirical rate of an INDEPENDENT
    outcome (lang = 'en' — the score uses EN stopword mass, so it acts
    as an English-quality classifier) per bin. This is the reliability
    diagram a curation team reads before picking the ensemble's drop
    threshold: monotone en_rate across bins = the score ranks; the bin
    where the rate saturates = the efficient operating point. (On the
    synthetic fixture, lang is assigned independently of text, so the
    curve is deliberately flat — the panel verifies the binning/rollup
    machinery; a real corpus supplies the signal.)

    Scale shape: one scan through the shared quality-z expressions, an
    integer bin key (z/0.25 is exact — z is a rounded 6-decimal value,
    dividing by 0.25 multiplies by 4), and a |bins|-row rollup."""
    docs = load_table(spark, sf_dir, "documents")
    z = quality_z_df(docs).join(docs.select("doc_id", "lang"), "doc_id")
    en = (F.col("lang") == "en").cast("long")
    return (
        z.groupBy(
            F.floor(F.col("z") / F.lit(0.25)).cast("int").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg(F.col("z"), "avg_z"),
            F.sum(en).alias("n_en"),
            F.round(
                F.sum(en).cast("double") / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("en_rate"),
        )
        .orderBy("bin")
    )


#: Zipf fit: words per language entering the log-log OLS (head of the
#: rank-frequency curve; the tail is count-quantized and off-law anyway).
_ZIPF_TOPN = 100


@register(
    "zipf_fit_stats",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM tok WHERE word <> '' GROUP BY lang, word
    ),
    base AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(freq) AS BIGINT) AS total_tokens
      FROM freq GROUP BY lang
    ),
    ranked AS (
      SELECT lang, freq,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY freq DESC, word) AS rank
      FROM freq
    ),
    fit AS (
      SELECT lang,
             CAST(ROUND(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
             CAST(ROUND(ln(CAST(freq AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
      FROM ranked WHERE rank <= {_ZIPF_TOPN}
    ),
    sums AS (
      SELECT lang,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy
      FROM fit GROUP BY lang
    )
    SELECT b.lang, b.n_types, b.total_tokens,
           CAST(s.n AS BIGINT) AS fit_words,
           ROUND((s.n * s.sxy - s.sx * s.sy)
                 / (s.n * s.sxx - s.sx * s.sx), 6) AS zipf_slope,
           ROUND((s.sy - ((s.n * s.sxy - s.sx * s.sy)
                          / (s.n * s.sxx - s.sx * s.sx)) * s.sx)
                 / s.n, 6) AS intercept,
           ROUND(((s.n * s.sxy - s.sx * s.sy)
                  * (s.n * s.sxy - s.sx * s.sy))
                 / ((s.n * s.sxx - s.sx * s.sx)
                    * (s.n * s.syy - s.sy * s.sy)), 6) AS r2
    FROM base b JOIN sums s ON b.lang = s.lang
    ORDER BY b.lang
    """,
)
def zipf_fit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per language: OLS of log(frequency) on log(rank)
    over the top-{_ZIPF_TOPN} words — slope (a natural corpus sits near
    -1; machine-generated or templated text flattens it), intercept, and
    R². A corpus-health fingerprint: a source whose slope drifts round
    over round has changed its generator, not its topic mix.

    Float discipline (the BM25/house pattern): every per-row log is
    rounded to 9 dp and cast to DECIMAL before SUMMING, so Σx, Σy, Σxy,
    Σx², Σy² are order-insensitive and engine-exact; slope/intercept/R²
    are then single double expressions mirrored term-for-term in the
    oracle. Rank ties break on the word itself — fully deterministic.

    Scale shape: one (lang, word) count aggregate (map-side combined),
    a per-lang top-{_ZIPF_TOPN} window over the type table (parallel by
    lang; at 100 TB swap the window head for a per-lang bounded heap —
    same contract), and a |langs|-row fit table. The document scan is
    never shuffled; no global sort anywhere."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(T.tokens("text")).alias("word")
    ).filter(F.col("word") != "")
    # pin the (lang, word) type table — both the per-lang totals and the
    # ranked fit consume it; without the pin each branch re-scans and
    # re-aggregates the corpus
    freq = materialize(
        toks.groupBy("lang", "word").agg(
            F.count(F.lit(1)).cast("long").alias("freq")
        )
    )
    base = freq.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("freq").cast("long").alias("total_tokens"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), "word")
    ranked = freq.withColumn("rank", F.row_number().over(w))
    x = F.round(F.log(F.col("rank").cast("double")), 9).cast("decimal(18,9)")
    y = F.round(F.log(F.col("freq").cast("double")), 9).cast("decimal(18,9)")
    fit = ranked.filter(F.col("rank") <= _ZIPF_TOPN).select(
        "lang", x.alias("x"), y.alias("y")
    )
    sums = fit.groupBy("lang").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,18)"))
        .cast("double")
        .alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (
        base.join(sums, "lang")
        .select(
            "lang",
            "n_types",
            "total_tokens",
            n.cast("long").alias("fit_words"),
            F.round(slope, 6).alias("zipf_slope"),
            F.round((sy - slope * sx) / n, 6).alias("intercept"),
            F.round(
                ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                6,
            ).alias("r2"),
        )
        .orderBy("lang")
    )


#: TF-IDF keyword extraction: terms reported per source.
_TFIDF_TOP = 3


@register(
    "tfidf_source_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT source, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY source, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df
      FROM tf GROUP BY term
    ),
    ns AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS s
           FROM documents),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, df.df,
             ROUND(tf.tf::DOUBLE
                   * ROUND(ln((ns.s + 1)::DOUBLE / (df.df + 1)::DOUBLE)
                           + 1.0, 9), 6) AS tfidf
      FROM tf JOIN df USING (term), ns
    ),
    rk AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY tfidf DESC, term) AS rn
      FROM scored
    )
    SELECT source, term, tf, df, tfidf
    FROM rk WHERE rn <= {_TFIDF_TOP}
    ORDER BY source, tfidf DESC, term
    """,
)
def tfidf_source_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic terms per source by smoothed TF-IDF (sklearn-style
    idf = ln((S+1)/(df+1)) + 1 over source-level "documents"): the top-
    {_TFIDF_TOP} terms that distinguish each source from the rest of the
    corpus — the source-fingerprint panel behind corpus cards and
    domain-mixing decisions (on this fixture's shared word-soup
    vocabulary the idf spread is small and the panel honestly shows
    near-uniform keywords; real crawl sources separate sharply). The
    document-frequency denominator is at SOURCE granularity, making
    this the corpus-description complement of `search_bm25_topk`
    (per-doc retrieval scoring).

    Exactness: tf/df are integers; the idf factor is round-9-quantized
    before the single multiply (ln 1-ulp risk behind the round, the
    `zipf_fit_stats` precedent); per-source top-k carries a unique
    (tfidf DESC, term) tie-break. Scale shape: one token explode ->
    map-side-combined (source, term) counts; df is a second combine over
    the distinct pairs; ranking windows partition by source."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(T.tokens("text")).alias("term")
    ).filter(F.col("term") != "")
    tf = materialize(
        toks.groupBy("source", "term").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        )
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    ns = F.broadcast(
        docs.agg(F.countDistinct("source").cast("long").alias("s"))
    )
    idf9 = F.round(
        F.log(
            (F.col("s") + 1).cast("double") / (F.col("df") + 1).cast("double")
        )
        + 1.0,
        9,
    )
    scored = tf.join(df, "term").crossJoin(ns).select(
        "source",
        "term",
        "tf",
        "df",
        F.round(F.col("tf").cast("double") * idf9, 6).alias("tfidf"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TFIDF_TOP)
        .select("source", "term", "tf", "df", "tfidf")
        .orderBy("source", F.desc("tfidf"), "term")
    )


@register(
    "char_entropy_stats",
    oracle="""
    WITH ch AS (
      SELECT doc_id, source, unnest(string_split(text, '')) AS c
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, source, c, CAST(COUNT(*) AS BIGINT) AS k
      FROM ch WHERE c <> '' GROUP BY doc_id, source, c
    ),
    withn AS (
      SELECT doc_id, source, k,
             SUM(k) OVER (PARTITION BY doc_id) AS n
      FROM cnt
    ),
    ent AS (
      SELECT doc_id, source,
             SUM(CAST(ROUND((k::DOUBLE / n::DOUBLE)
                            * ln(n::DOUBLE / k::DOUBLE), 9)
                      AS DECIMAL(12,9))) AS e
      FROM withn GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(e)::DOUBLE / COUNT(*)::DOUBLE, 6) AS avg_entropy,
           ROUND(MIN(e)::DOUBLE, 6) AS min_entropy,
           ROUND(MAX(e)::DOUBLE, 6) AS max_entropy,
           ROUND(SUM(e)::DOUBLE / COUNT(*)::DOUBLE / ln(2.0), 6)
             AS avg_bits_per_char
    FROM ent GROUP BY source ORDER BY source
    """,
)
def char_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (nats), rolled up per
    source — the compression-ratio quality proxy (CCNet/Gopher-style):
    near-zero entropy flags repeated-character spam, unusually high
    entropy flags base64/binary junk pasted into text fields; a
    production screen drops both tails before tokenization ever runs.
    `avg_bits_per_char` is the same number in bits — an upper-bound
    estimate of what an order-0 coder could compress the corpus to.

    Exactness: per-(doc, char) counts are integers; each entropy term
    (k/n)·ln(n/k) is round-9 quantized to DECIMAL before the per-doc sum
    (order-free; `zipf_fit_stats`' ln-behind-round discipline), so the
    per-doc entropy is bit-identical across engines and min/max/avg all
    hash-stably. Scale shape: the char explode collapses immediately into
    a map-side-combined (doc, char) count — the shuffle carries at most
    |alphabet| rows per document, not characters — and the per-doc window
    partitions by doc_id. No unpartitioned window, no driver traffic."""
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select("doc_id", "source", F.explode(F.split("text", "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("doc_id", "source", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    wdoc = Window.partitionBy("doc_id")
    term = F.round(
        (F.col("k").cast("double") / F.col("n").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("k").cast("double")),
        9,
    ).cast("decimal(12,9)")
    ent = (
        cnt.withColumn("n", F.sum("k").over(wdoc))
        .select("doc_id", "source", term.alias("t"))
        .groupBy("doc_id", "source")
        .agg(F.sum("t").alias("e"))
    )
    return (
        ent.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum("e").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("avg_entropy"),
            F.round(F.min("e").cast("double"), 6).alias("min_entropy"),
            F.round(F.max("e").cast("double"), 6).alias("max_entropy"),
            F.round(
                F.sum("e").cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.log(F.lit(2.0)),
                6,
            ).alias("avg_bits_per_char"),
        )
        .orderBy("source")
    )


#: chi-square critical value, p = 0.01 at df = 4 (5 languages - 1).
_CHI2_CRIT_DF4 = 13.277


@register(
    "lang_source_independence",
    oracle=f"""
    WITH obs AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY source, lang
    ),
    rs AS (SELECT source, CAST(SUM(o) AS BIGINT) AS nr FROM obs
           GROUP BY source),
    cs AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS nc FROM obs
           GROUP BY lang),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM obs),
    grid AS (
      SELECT r.source, c.lang, r.nr, c.nc, n.nt,
             COALESCE(o.o, 0) AS o
      FROM rs r CROSS JOIN cs c CROSS JOIN n
      LEFT JOIN obs o USING (source, lang)
    ),
    terms AS (
      SELECT source,
             CAST(ROUND(
               (o::DOUBLE - nr::DOUBLE * nc::DOUBLE / nt::DOUBLE)
               * (o::DOUBLE - nr::DOUBLE * nc::DOUBLE / nt::DOUBLE)
               / (nr::DOUBLE * nc::DOUBLE / nt::DOUBLE), 9)
               AS DECIMAL(18,9)) AS t,
             nr
      FROM grid
    )
    SELECT source, MIN(nr) AS n_docs,
           ROUND(SUM(t)::DOUBLE, 4) AS chi2,
           (SUM(t)::DOUBLE > {_CHI2_CRIT_DF4}) AS skewed_p01
    FROM terms GROUP BY source ORDER BY source
    """,
)
def lang_source_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square goodness-of-fit of each source's language mix against
    the corpus-wide language distribution (per-source chi2 statistic
    over the full source x lang grid including structural zeros, df =
    |langs|-1 = 4, flagged at the p = 0.01 critical value 13.277). The
    corpus-composition drift alarm: a crawl source whose language mix
    departs from the corpus profile either found a genuinely different
    community (good — weight it) or its language-ID broke (bad — gate
    it); either way it is the panel that catches the change BEFORE the
    mixture weights computed by `corpus_mixing_stats` silently shift.

    Exactness: observed counts are integers; each (o-e)^2/e term is one
    mirrored double expression round-9-quantized to DECIMAL before the
    per-source sum (order-free), so the statistic and the boolean flag
    hash exactly. Scale shape: the contingency table is a map-side-
    combined |sources| x |langs| rollup; margins and the dense grid are
    tiny broadcasts; nothing after the first groupBy touches corpus
    rows."""
    docs = load_table(spark, sf_dir, "documents")
    obs = materialize(
        docs.groupBy("source", "lang").agg(
            F.count(F.lit(1)).cast("long").alias("o")
        )
    )
    rs = obs.groupBy("source").agg(F.sum("o").cast("long").alias("nr"))
    cs = obs.groupBy("lang").agg(F.sum("o").cast("long").alias("nc"))
    n = obs.agg(F.sum("o").cast("long").alias("nt"))
    grid = (
        rs.crossJoin(F.broadcast(cs))
        .crossJoin(F.broadcast(n))
        .join(obs, ["source", "lang"], "left")
        .select(
            "source",
            "nr",
            "nc",
            "nt",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
    )
    e = F.col("nr").cast("double") * F.col("nc").cast("double") / F.col(
        "nt"
    ).cast("double")
    term = F.round(
        (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e,
        9,
    ).cast("decimal(18,9)")
    return (
        grid.select("source", "nr", term.alias("t"))
        .groupBy("source")
        .agg(
            F.min("nr").alias("n_docs"),
            F.round(F.sum("t").cast("double"), 4).alias("chi2"),
            (F.sum("t").cast("double") > _CHI2_CRIT_DF4).alias("skewed_p01"),
        )
        .orderBy("source")
    )


#: collocation mining: minimum bigram frequency and report size.
_PMI_MIN_COUNT = 5
_PMI_TOP = 20


@register(
    "collocation_pmi_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    uni AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(ws) AS w FROM toks) WHERE w <> ''
      GROUP BY w
    ),
    bi AS (
      SELECT ws[i] AS w1, ws[i + 1] AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks, unnest(range(1, len(ws))) AS t(i)
      WHERE ws[i] <> '' AND ws[i + 1] <> ''
      GROUP BY 1, 2
    ),
    nu AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
    nb AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM bi),
    scored AS (
      SELECT b.w1, b.w2, b.c,
             ROUND(ln((b.c::DOUBLE / nb.n::DOUBLE)
                      / ((u1.c::DOUBLE / nu.n::DOUBLE)
                         * (u2.c::DOUBLE / nu.n::DOUBLE))), 6) AS pmi
      FROM bi b
      JOIN uni u1 ON b.w1 = u1.word
      JOIN uni u2 ON b.w2 = u2.word
      CROSS JOIN nu CROSS JOIN nb
      WHERE b.c >= {_PMI_MIN_COUNT}
    )
    SELECT w1, w2, c AS n_pair, pmi
    FROM scored
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_TOP}
    """,
)
def collocation_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: adjacent
    word pairs seen at least {_PMI_MIN_COUNT} times, scored by
    ln(p(ab) / (p(a)p(b))) and reported top-{_PMI_TOP}. High-PMI pairs
    are the multi-word expressions ("new york", "machine learning") a
    tokenizer should fuse and `bpe_merge_candidates` will discover at
    the byte level — this is the word-level twin, and on the fixture's
    independent word soup the panel honestly tops out near PMI 0 plus
    sampling noise (the min-count floor keeps pure-noise pairs out).

    Exactness: all counts are integers; PMI is ONE mirrored double
    expression (divisions then ln) rounded to 6, and the top-k carries
    the (pmi DESC, w1, w2) unique tie-break. The Spark bigram stream
    reuses the slide-by-one zip of the shingle family; DuckDB unnests
    positional ranges — same pairs, engine-native idioms. Scale shape:
    bigram and unigram counts are map-side-combined explodes; the two
    vocabulary joins broadcast at fixture scale (a web-scale vocab
    shuffles on the word key instead — same plan, AQE picks); the
    final TakeOrderedAndProject carries {_PMI_TOP} rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("ws"))
    uni = materialize(
        toks.select(F.explode("ws").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("ws", 1, F.greatest(F.size("ws") - 1, F.lit(0))),
                F.slice(
                    "ws", 2, F.greatest(F.size("ws") - 1, F.lit(0))
                ),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bi = materialize(
        pairs.filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    nu = F.broadcast(uni.agg(F.sum("c").cast("long").alias("n_uni")))
    nb = F.broadcast(bi.agg(F.sum("c").cast("long").alias("n_bi")))
    u1 = F.broadcast(uni.select(F.col("word").alias("w1"), F.col("c").alias("c1")))
    u2 = F.broadcast(uni.select(F.col("word").alias("w2"), F.col("c").alias("c2")))
    pmi = F.round(
        F.log(
            (F.col("c").cast("double") / F.col("n_bi").cast("double"))
            / (
                (F.col("c1").cast("double") / F.col("n_uni").cast("double"))
                * (F.col("c2").cast("double") / F.col("n_uni").cast("double"))
            )
        ),
        6,
    )
    return (
        bi.filter(F.col("c") >= _PMI_MIN_COUNT)
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(nu)
        .crossJoin(nb)
        .select("w1", "w2", F.col("c").alias("n_pair"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOP)
    )


@register(
    "char_bigram_entropy_stats",
    oracle="""
    WITH ch AS (
      SELECT doc_id, source, string_split(text, '') AS cs FROM documents
    ),
    pair AS (
      SELECT doc_id, source, cs[i] AS c1, cs[i + 1] AS c2
      FROM ch, unnest(range(1, len(cs))) AS t(i)
    ),
    pcnt AS (
      SELECT source, c1, c2, CAST(COUNT(*) AS BIGINT) AS k
      FROM pair GROUP BY source, c1, c2
    ),
    ptot AS (SELECT source, CAST(SUM(k) AS BIGINT) AS n FROM pcnt
             GROUP BY source),
    hpair AS (
      SELECT p.source,
             SUM(CAST(ROUND((p.k::DOUBLE / t.n::DOUBLE)
                            * ln(t.n::DOUBLE / p.k::DOUBLE), 9)
                      AS DECIMAL(12,9))) AS h2
      FROM pcnt p JOIN ptot t USING (source) GROUP BY p.source
    ),
    ucnt AS (
      SELECT source, c1 AS c, CAST(SUM(k) AS BIGINT) AS k
      FROM pcnt GROUP BY source, c1
    ),
    huni AS (
      SELECT u.source,
             SUM(CAST(ROUND((u.k::DOUBLE / t.n::DOUBLE)
                            * ln(t.n::DOUBLE / u.k::DOUBLE), 9)
                      AS DECIMAL(12,9))) AS h1
      FROM ucnt u JOIN ptot t USING (source) GROUP BY u.source
    )
    SELECT h2.source,
           ROUND(h1.h1::DOUBLE, 6) AS h_order0,
           ROUND(h2.h2::DOUBLE - h1.h1::DOUBLE, 6) AS h_order1,
           ROUND((h2.h2::DOUBLE - h1.h1::DOUBLE) / ln(2.0), 6)
             AS bits_per_char_o1,
           ROUND(1.0 - (h2.h2::DOUBLE - h1.h1::DOUBLE)
                       / h1.h1::DOUBLE, 6) AS predictability_gain
    FROM hpair h2 JOIN huni h1 USING (source)
    ORDER BY h2.source
    """,
)
def char_bigram_entropy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-1 (conditional) character entropy per source: H(c2|c1) =
    H(pairs) - H(first chars), from corpus-level bigram counts — the
    next rung above `char_entropy_stats`' order-0 screen. bits_per_
    char_o1 is what an order-1 coder would pay, and predictability_gain
    (1 - H1/H0) is the share of the order-0 entropy that character
    context already explains: natural language sits far above zero,
    random byte junk at ~0, and templated spam near 1 — the three-way
    separation one entropy number can't make. Marginals are taken over
    the FIRST pair element, so the identity H(c2|c1) = H(pair) - H(c1)
    holds exactly on the same sample space.

    Exactness: bigram counts are integers at (source, c1, c2) grain;
    every entropy term is round-9 DECIMAL before its sum (order-free,
    `char_entropy_stats` discipline); the two entropies subtract as one
    mirrored double expression. Scale shape: the pair explode collapses
    into a map-side-combined count bounded by |alphabet|^2 per source;
    the unigram table folds from the pair table — no second corpus
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    cs = docs.select("source", F.split("text", "").alias("cs"))
    pair = cs.select(
        "source",
        F.explode(
            F.zip_with(
                F.slice("cs", 1, F.greatest(F.size("cs") - 1, F.lit(0))),
                F.slice("cs", 2, F.greatest(F.size("cs") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("c1"), b.alias("c2")),
            )
        ).alias("p")
    ).select("source", "p.c1", "p.c2")
    pcnt = materialize(
        pair.groupBy("source", "c1", "c2").agg(
            F.count(F.lit(1)).cast("long").alias("k")
        )
    )
    ptot = pcnt.groupBy("source").agg(F.sum("k").cast("long").alias("n"))

    def _h(cnts: DataFrame) -> DataFrame:
        term = F.round(
            (F.col("k").cast("double") / F.col("n").cast("double"))
            * F.log(F.col("n").cast("double") / F.col("k").cast("double")),
            9,
        ).cast("decimal(12,9)")
        return (
            cnts.join(ptot, "source")
            .select("source", term.alias("t"))
            .groupBy("source")
            .agg(F.sum("t").alias("h"))
        )

    hpair = _h(pcnt).withColumnRenamed("h", "h2")
    ucnt = pcnt.groupBy("source", F.col("c1").alias("c")).agg(
        F.sum("k").cast("long").alias("k")
    )
    huni = _h(ucnt).withColumnRenamed("h", "h1")
    h1d = F.col("h1").cast("double")
    h2d = F.col("h2").cast("double")
    return (
        hpair.join(huni, "source")
        .select(
            "source",
            F.round(h1d, 6).alias("h_order0"),
            F.round(h2d - h1d, 6).alias("h_order1"),
            F.round((h2d - h1d) / F.log(F.lit(2.0)), 6).alias(
                "bits_per_char_o1"
            ),
            F.round(F.lit(1.0) - (h2d - h1d) / h1d, 6).alias(
                "predictability_gain"
            ),
        )
        .orderBy("source")
    )


@register(
    "source_divergence_matrix",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    f AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE word <> '' GROUP BY source, word
    ),
    n AS (SELECT source, CAST(SUM(c) AS BIGINT) AS nt FROM f GROUP BY source),
    fs AS (SELECT f.source, f.word, f.c, n.nt FROM f JOIN n USING (source)),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.c::DOUBLE / a.nt::DOUBLE AS p,
             b.c::DOUBLE / b.nt::DOUBLE AS q
      FROM fs a JOIN fs b ON a.word = b.word AND a.source < b.source
    ),
    terms AS (
      SELECT source_a, source_b,
             ROUND(p * log2(2 * p / (p + q)) + q * log2(2 * q / (p + q)), 9)
               AS t,
             ROUND(p, 9) AS rp, ROUND(q, 9) AS rq
      FROM pairs
    ),
    agg AS (
      SELECT source_a, source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared_words,
             CAST(SUM(CAST(t AS DECIMAL(18,9))) AS DOUBLE) AS st,
             CAST(SUM(CAST(rp AS DECIMAL(18,9))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(rq AS DECIMAL(18,9))) AS DOUBLE) AS sq
      FROM terms GROUP BY source_a, source_b
    )
    SELECT source_a, source_b, n_shared_words,
           ROUND(0.5 * st + 0.5 * (2.0 - sp - sq), 6) AS js_divergence
    FROM agg
    ORDER BY source_a, source_b
    """,
)
def source_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen–Shannon divergence (bits) between per-source unigram
    distributions — the domain-shift / mixture-drift metric behind data-
    mixing weights (a source whose JS to every sibling jumps between
    snapshots changed its generator). Zero-overlap mass needs no full
    outer join: JS = ½Σ_shared[p·log2(2p/(p+q)) + q·log2(2q/(p+q))]
    + ½(2 − Σ_shared p − Σ_shared q), so the only join is the word
    equi-join on the pinned (source, word, count) table — the same
    vocabulary-collapse shape as `source_vocab_affinity`, never a corpus
    cross join. Terms round to 9 into DECIMAL sums (order-insensitive);
    the final bits round to 6, mirrored expression-for-expression."""
    docs = load_table(spark, sf_dir, "documents")
    f = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n = f.groupBy("source").agg(F.sum("c").cast("long").alias("nt"))
    fs = materialize(f.join(n, "source").select("source", "word", "c", "nt"))
    a = fs.alias("a")
    b = fs.alias("b")
    p = F.col("a.c").cast("double") / F.col("a.nt").cast("double")
    q = F.col("b.c").cast("double") / F.col("b.nt").cast("double")
    t = F.round(
        p * F.log2(F.lit(2) * p / (p + q)) + q * F.log2(F.lit(2) * q / (p + q)),
        9,
    )
    agg = (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            t.alias("t"),
            F.round(p, 9).alias("rp"),
            F.round(q, 9).alias("rq"),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_words"),
            F.sum(F.col("t").cast("decimal(18,9)")).cast("double").alias("st"),
            F.sum(F.col("rp").cast("decimal(18,9)")).cast("double").alias("sp"),
            F.sum(F.col("rq").cast("decimal(18,9)")).cast("double").alias("sq"),
        )
    )
    return agg.select(
        "source_a",
        "source_b",
        "n_shared_words",
        F.round(
            F.lit(0.5) * F.col("st")
            + F.lit(0.5) * (F.lit(2.0) - F.col("sp") - F.col("sq")),
            6,
        ).alias("js_divergence"),
    ).orderBy("source_a", "source_b")
