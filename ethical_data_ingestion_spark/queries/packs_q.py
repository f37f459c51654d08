"""Sequence packing and data-mixing panels — the two knobs a pretraining
run sets after curation: how documents fill fixed-length training
sequences, and how much of each source the sampler draws. (The
per-source concat-chunk utilization rollup is ``text_q.
sequence_packing_stats``; this module prices and COMPARES strategies.)

``packing_strategy_stats`` prices THREE packing strategies over the same
corpus at ``_SEQ_LEN``-token sequences:

* ``concat_chunk`` — the GPT-style packer: concatenate every document in
  doc_id order and split every L tokens. Zero padding except the final
  tail, but documents are SPLIT across sequence boundaries (the panel
  counts them — the cost is attention across unrelated fragments and
  truncated contexts).
* ``doc_per_seq`` — the no-packing baseline: one document per sequence,
  padded to L. Zero splits, maximal padding.
* ``greedy_group`` — boundary-respecting greedy fill: documents in
  doc_id order are packed first-fit into the current sequence; a
  document that does not fit starts a new sequence. The fold is
  NON-ASSOCIATIVE (the remainder lost at each sequence break depends on
  every prior document), so it cannot be a prefix sum; it distributes by
  packing independent ``_PACK_G``-document groups (``doc_id div G`` — a
  data-independent key), each group starting fresh sequences. That IS
  the production semantics: a distributed packer packs partition-local
  and flushes at partition ends; pinning the partition to a fixed key
  makes the result engine-reproducible instead of
  partitioning-dependent. Spark runs the per-group fold in ONE
  Arrow-batched ``applyInPandas`` pass (the sanctioned custom-operator
  shape for semantics built-ins cannot express); the DuckDB mirror
  replays the identical fold as a rank-stepped recursive CTE — iteration
  k advances EVERY group's rank-k document at once, so recursion depth
  is bounded by the group size (≤ {_PACK_G}) at ANY corpus scale while
  each level is one hash join over |groups| rows.

Documents longer than L are EXCLUDED from packing and reported as
``n_oversize`` (a 100-TB deployment pre-chunks them with the chunking
operators; excluding beats silently truncating). Efficiency ratios are
exact integer half-up in micro-units — no double rounding anywhere.

``mixing_weights_stats`` prices temperature-based source sampling
(the Pile/ROOTS-style mixture knob): per-source token mass m_s, the
proportional (α=1) share as exact integer micro-units, and the α=0.5
temperature share sqrt(m_s)/Σ sqrt(m_s) — temperature upweights small
sources; the panel also reports each source's expected epochs at a
``_MIX_BUDGET_X``×-total-token training budget under α=0.5, the number
that tells a curator which sources will repeat. Cross-engine exactness
without rounding: sqrt is IEEE-correctly-rounded in both engines
(identical bits on identical BIGINT masses), and the denominator is a
LEFT FOLD over sources in name order on both sides (Spark
``aggregate(array_sort(collect_list(...)))``, DuckDB
``list_reduce(list(... ORDER BY source))``) — same addition order,
same doubles, so quotients need no rounding to hash-match.

Scale shape: every panel is one corpus scan + a per-source or per-group
rollup; the packing fold is linear with bounded per-group state; nothing
is quadratic, nothing collects data rows to the driver.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize
from ..registry import register

_SEQ_LEN = 256     # training-sequence length in whitespace tokens
_PACK_G = 256      # docs per independent greedy-packing group
_MIX_BUDGET_X = 4  # training budget, in multiples of the corpus mass
_NTOK = "len(string_split(text, ' '))"


def _counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )


def _eff_micro(payload: str, seqs: str) -> str:
    """pack_efficiency = payload / (n_seq · L), exact half-up micro-units
    (Spark SQL; ``//`` twin below).

    The numerator is a whole-corpus token mass ×2e6, so it is computed in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): a BIGINT numerator wraps
    silently in non-ANSI Spark past ~4.6e12 tokens (~18 TB of text) while
    DuckDB raises — the one place the two engines would diverge WITHOUT
    an error at 100-TB corpus scale. The QUOTIENT is ≤ 1e6 (a share in
    micro-units), so Spark's ``decimal div → long`` result type is exact.
    """
    return (
        f"((2 * cast({payload} as decimal(38,0)) * 1000000"
        f" + ({seqs} * {_SEQ_LEN}))"
        f" div (2 * {seqs} * {_SEQ_LEN})) / 1000000.0D"
    )


def _eff_micro_duck(payload: str, seqs: str) -> str:
    return (
        f"((2 * ({payload})::HUGEINT * 1000000 + (({seqs}) * {_SEQ_LEN}))"
        f" // (2 * ({seqs}) * {_SEQ_LEN})) / 1000000.0"
    )


def _pack_group_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """The greedy first-fit fold over ONE group's documents in doc_id
    order: (group, n_sequences, payload) — plain Python over ≤ _PACK_G
    rows per group, Arrow-batched."""
    pdf = pdf.sort_values("doc_id")
    used = 0
    n_seq = 0
    for n in pdf["n_tok"]:
        n = int(n)
        if n_seq == 0 or used + n > _SEQ_LEN:
            n_seq += 1
            used = 0
        used += n
    return pd.DataFrame(
        {
            "g": [int(pdf["g"].iloc[0])],
            "n_seq": [n_seq],
            "payload": [int(pdf["n_tok"].sum())],
        }
    )


def _packing_oracle_sql(counts_body: str) -> str:
    """The strategy-pricing oracle over ANY per-doc ``counts(doc_id,
    n_tok)`` CTE chain — the whitespace panel and the trained-BPE panel
    share every CTE below it (same prefix math, same rank-stepped greedy
    fold), differing only in the token currency."""
    return f"""
    WITH RECURSIVE {counts_body},
    eligible AS (SELECT * FROM counts WHERE n_tok <= {_SEQ_LEN}),
    oversize AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_over
      FROM counts WHERE n_tok > {_SEQ_LEN}
    ),
    pre AS (
      SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS pstart
      FROM eligible
    ),
    cc AS (
      -- concat-chunk: total stream split every L; a doc is split when
      -- its [start, end) crosses a multiple of L
      SELECT CAST((SUM(n_tok) + {_SEQ_LEN} - 1) // {_SEQ_LEN} AS BIGINT)
               AS n_seq,
             CAST(SUM(n_tok) AS BIGINT) AS payload,
             CAST(SUM(CASE WHEN (COALESCE(pstart, 0) + n_tok - 1)
                                // {_SEQ_LEN}
                           > COALESCE(pstart, 0) // {_SEQ_LEN}
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_split
      FROM pre
    ),
    dps AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_seq,
             CAST(SUM(n_tok) AS BIGINT) AS payload
      FROM eligible
    ),
    ranked AS (
      SELECT doc_id // {_PACK_G} AS g, doc_id, n_tok,
             ROW_NUMBER() OVER (PARTITION BY doc_id // {_PACK_G}
                                ORDER BY doc_id) AS r
      FROM eligible
    ),
    fold AS (
      -- rank-stepped greedy fold: level k advances every group's rank-k
      -- doc; depth <= group size, rows per level = |groups|
      SELECT g, r, n_tok AS used, CAST(1 AS BIGINT) AS n_seq
      FROM ranked WHERE r = 1
      UNION ALL
      SELECT k.g, k.r,
             CASE WHEN f.used + k.n_tok > {_SEQ_LEN}
                  THEN k.n_tok ELSE f.used + k.n_tok END,
             CASE WHEN f.used + k.n_tok > {_SEQ_LEN}
                  THEN f.n_seq + 1 ELSE f.n_seq END
      FROM fold f JOIN ranked k ON k.g = f.g AND k.r = f.r + 1
    ),
    gg AS (
      SELECT CAST(SUM(n_seq) AS BIGINT) AS n_seq
      FROM (SELECT g, MAX(n_seq) AS n_seq FROM (
              SELECT g, n_seq,
                     ROW_NUMBER() OVER (PARTITION BY g ORDER BY r DESC)
                       AS rr
              FROM fold) WHERE rr = 1 GROUP BY g)
    ),
    rows_out AS (
      SELECT 'concat_chunk' AS strategy, cc.n_seq, cc.payload,
             cc.n_seq * {_SEQ_LEN} - cc.payload AS n_pad_tokens,
             cc.n_split AS n_docs_split
      FROM cc
      UNION ALL
      SELECT 'doc_per_seq', dps.n_seq, dps.payload,
             dps.n_seq * {_SEQ_LEN} - dps.payload, 0 FROM dps
      UNION ALL
      SELECT 'greedy_group', gg.n_seq, d.payload,
             gg.n_seq * {_SEQ_LEN} - d.payload, 0 FROM gg, dps d
    )
    SELECT strategy,
           CAST(n_seq AS BIGINT) AS n_sequences,
           CAST(payload AS BIGINT) AS payload_tokens,
           CAST(n_pad_tokens AS BIGINT) AS n_pad_tokens,
           {_eff_micro_duck('payload', 'n_seq')} AS pack_efficiency,
           CAST(n_docs_split AS BIGINT) AS n_docs_split,
           o.n_over AS n_oversize
    FROM rows_out, oversize o
    ORDER BY strategy
    """


def _packing_oracle() -> str:
    return _packing_oracle_sql(
        f"""counts AS (
      SELECT doc_id, CAST({_NTOK} AS BIGINT) AS n_tok FROM documents
    )"""
    )


@register("packing_strategy_stats", oracle=_packing_oracle)
def packing_strategy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per packing strategy: sequences produced, payload and
    padding token mass, exact pack efficiency, documents split across
    sequence boundaries, and the oversize-document count (see module
    docstring for strategy semantics and the distribution argument)."""
    return _strategies_panel(spark, _counts(spark, sf_dir))


def _strategies_panel(spark: SparkSession, counts: DataFrame) -> DataFrame:
    """Price the three packing strategies over ANY per-doc
    ``(doc_id, n_tok)`` table — the Spark twin of
    :func:`_packing_oracle_sql`'s parameterization."""
    eligible = counts.filter(F.col("n_tok") <= _SEQ_LEN)
    n_over = F.broadcast(
        counts.filter(F.col("n_tok") > _SEQ_LEN).agg(
            F.count(F.lit(1)).cast("long").alias("n_oversize")
        )
    )

    # --- concat_chunk: per-doc global prefix offsets (range-partitioned
    # cumsum + broadcast partition offsets — the TeraSort prefix pattern,
    # never a corpus-wide single-partition window)
    nparts = max(spark.sparkContext.defaultParallelism // 2, 8)
    parts = materialize(
        eligible.repartitionByRange(nparts, "doc_id").withColumn(
            "pid", F.spark_partition_id()
        )
    )
    hist = {
        r["pid"]: r["s"]
        for r in parts.groupBy("pid").agg(F.sum("n_tok").alias("s")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(hist):
        offsets[pid] = acc
        acc += hist[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "pid int, off long"
        )
    )
    w = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = parts.join(off_df, "pid").select(
        "n_tok",
        (F.sum("n_tok").over(w) + F.col("off") - F.col("n_tok")).alias(
            "pstart"
        ),
    )
    cc = pre.agg(
        F.expr(f"cast((sum(n_tok) + {_SEQ_LEN} - 1) div {_SEQ_LEN} as bigint)")
        .alias("n_seq"),
        F.sum("n_tok").cast("long").alias("payload"),
        F.sum(
            (
                ((F.col("pstart") + F.col("n_tok") - 1) / _SEQ_LEN).cast(
                    "long"
                )
                > (F.col("pstart") / _SEQ_LEN).cast("long")
            ).cast("long")
        )
        .cast("long")
        .alias("n_split"),
    )

    # --- doc_per_seq
    dps = eligible.agg(
        F.count(F.lit(1)).cast("long").alias("n_seq"),
        F.sum("n_tok").cast("long").alias("payload"),
    )

    # --- greedy_group: non-associative fold per fixed doc_id-div-G group
    grouped = eligible.select(
        F.expr(f"doc_id div {_PACK_G}").alias("g"), "doc_id", "n_tok"
    )
    gg = (
        grouped.groupBy("g")
        .applyInPandas(_pack_group_fold, "g long, n_seq long, payload long")
        .agg(
            F.sum("n_seq").cast("long").alias("n_seq"),
            F.sum("payload").cast("long").alias("payload"),
        )
    )

    def _row(strategy: str, agg_df: DataFrame, split_col: bool) -> DataFrame:
        return agg_df.select(
            F.lit(strategy).alias("strategy"),
            F.col("n_seq").alias("n_sequences"),
            F.col("payload").alias("payload_tokens"),
            (F.col("n_seq") * _SEQ_LEN - F.col("payload"))
            .cast("long")
            .alias("n_pad_tokens"),
            F.expr(_eff_micro("payload", "n_seq")).alias("pack_efficiency"),
            (F.col("n_split") if split_col else F.lit(0))
            .cast("long")
            .alias("n_docs_split"),
        )

    out = (
        _row("concat_chunk", cc, True)
        .unionByName(_row("doc_per_seq", dps, False))
        .unionByName(_row("greedy_group", gg, False))
    )
    return out.crossJoin(n_over).orderBy("strategy")


def _mixing_oracle() -> str:
    return f"""
    WITH mass AS (
      SELECT source, CAST(SUM({_NTOK}) AS BIGINT) AS m
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(m) AS BIGINT) AS t,
             -- ordered LEFT FOLD of sqrt masses: identical addition
             -- order to the Spark side's sorted-aggregate fold
             list_reduce(list(sqrt(m::DOUBLE) ORDER BY source),
                         (a, b) -> a + b) AS denom05
      FROM mass
    )
    SELECT m.source,
           m.m AS mass_tokens,
           ((2 * m.m::HUGEINT * 1000000 + t.t) // (2 * t.t)) / 1000000.0
             AS share_a1,
           sqrt(m.m::DOUBLE) / t.denom05 AS share_a05,
           ({_MIX_BUDGET_X} * t.t) * (sqrt(m.m::DOUBLE) / t.denom05)
             / m.m::DOUBLE AS epochs_a05
    FROM mass m, tot t
    ORDER BY m.source
    """


@register("mixing_weights_stats", oracle=_mixing_oracle)
def mixing_weights_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling panel: token mass, the proportional (α=1)
    share in exact micro-units, the α=0.5 temperature share, and the
    expected epochs of each source at a {_MIX_BUDGET_X}×-corpus training
    budget under α=0.5 — epochs > 1 means the sampler will repeat that
    source. Bit-exact across engines with NO rounding: see the module
    docstring (correctly-rounded sqrt + name-ordered denominator fold).
    """
    docs = load_table(spark, sf_dir, "documents")
    mass = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("m")
    )
    tot = F.broadcast(
        mass.agg(
            F.sum("m").cast("long").alias("t"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("source", F.col("m")))
                    ),
                    lambda x: F.sqrt(x["m"].cast("double")),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("denom05"),
        )
    )
    share05 = F.sqrt(F.col("m").cast("double")) / F.col("denom05")
    return (
        mass.crossJoin(tot)
        .select(
            "source",
            F.col("m").alias("mass_tokens"),
            F.expr(
                # DECIMAL(38,0) numerator: m is a whole-source token
                # mass — BIGINT wraps past ~4.6e12 tokens (see _eff_micro)
                f"((2 * cast(m as decimal(38,0)) * 1000000 + t)"
                f" div (2 * t)) / 1000000.0D"
            ).alias("share_a1"),
            share05.alias("share_a05"),
            (
                (F.lit(_MIX_BUDGET_X) * F.col("t")) * share05
                / F.col("m").cast("double")
            ).alias("epochs_a05"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# BPE-priced packing (round-12): the SAME three strategies priced in
# TRAINED-BPE tokens. `packing_strategy_stats` prices in whitespace
# tokens, but the loader that consumes packed sequences budgets in the
# trained tokenizer's tokens (the shard manifests and the curate mount
# already price in them via `pipeline_q`): a curator comparing packing
# strategies in whitespace currency and shard budgets in BPE currency is
# comparing apples to oranges — fertility (BPE tokens per whitespace
# token) is > 1 and VARIES BY SOURCE, so the strategies' efficiency
# ordering and the oversize set can both differ between currencies.
# Realizes the reference's declared-but-unused tiktoken import
# (ethical_crawler.py:31-34) at the packing seam.


def _bpe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trained-BPE token count: explode to (doc_id, word)
    counts (map-side combined), join the session-shared word → symbol
    table (vocabulary-sized — AQE broadcasts it), roll up per document.
    Documents with no words (empty text) are kept at n_tok = 0 via the
    LEFT join so every strategy prices the same document set.

    Scale shape: the corpus-sized side collapses to (doc, distinct-word)
    counts before the join; the per-token work is one split+explode scan.
    No per-token join, no UDF — the trained segmentation is replayed once
    per corpus by the shared artifact, not per query. r13: the per-doc
    pricing itself is the session-shared `strings_q._doc_bpe_counts`
    table (guide §2.4 — four query paths priced the same documents per
    run)."""
    from .strings_q import _doc_bpe_counts

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id")
        .join(_doc_bpe_counts(spark, sf_dir), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bpe", F.lit(0)).cast("long").alias("n_tok"),
        )
    )


def _packing_bpe_oracle() -> str:
    # lazy: reads sibling-module constants (strings_q) — must not run at
    # import time (registry first-import rule)
    from .strings_q import _BPE_ROUNDS, _bpe_round_ctes

    s2 = "chr(31) || chr(31)"
    counts_body = f"""{_bpe_round_ctes(_BPE_ROUNDS)},
    wordsym AS (
      SELECT word,
             CAST(len(string_split(substr(seg, 2, length(seg) - 2), {s2}))
                  AS BIGINT) AS n_sym
      FROM seg{_BPE_ROUNDS}
    ),
    wcd AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> '' GROUP BY doc_id, word
    ),
    counts AS (
      SELECT d.doc_id,
             CAST(COALESCE(SUM(w.cnt * s.n_sym), 0) AS BIGINT) AS n_tok
      FROM documents d
      LEFT JOIN wcd w ON w.doc_id = d.doc_id
      LEFT JOIN wordsym s ON s.word = w.word
      GROUP BY d.doc_id
    )"""
    return _packing_oracle_sql(counts_body)


@register("packing_bpe_stats", oracle=_packing_bpe_oracle)
def packing_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`packing_strategy_stats` in the LOADER's currency: the same three
    strategies (concat-chunk / doc-per-seq / boundary-respecting greedy)
    priced in trained-BPE tokens from the session-shared
    `strings_q._bpe_word_segs` segmentation — so packing efficiency is
    directly comparable with the shard manifests' token budgets. With
    fertility > 1, documents near the whitespace sequence limit overflow
    it in BPE tokens: expect a larger ``n_oversize``, more splits under
    concat-chunk, and a DIFFERENT efficiency spread than the whitespace
    panel (pinned by test on the fixture).

    Shares every strategy/efficiency code path with the whitespace panel
    (``_strategies_panel`` / ``_packing_oracle_sql``); only the counts
    table differs."""
    return _strategies_panel(spark, _bpe_counts(spark, sf_dir))
