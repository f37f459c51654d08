"""String-similarity + sketch queries (round 4 widening).

* ``editdist_name_pairs`` — edit-distance ≤ 2 similarity self-join over
  distinct part names via FastSS deletion neighborhoods: candidates come
  from an equi-join on ≤2-deletion variants (never all-pairs), then exact
  ``levenshtein`` verification on candidates only — the same
  candidates-then-verify discipline as the Jaccard/MinHash/SimHash family
  (``operators/dedup.py``), applied to edit distance.
* ``heavy_hitters_cms`` — count-min sketch (d=4 hash rows × w=16 buckets,
  deliberately tiny so collisions actually occur at fixture scale) priced
  against exact counts for the exact top-25 words: the estimate is always
  ≥ the true count, and the panel reports each word's overcount.

Both are integer/hash-deterministic end-to-end, so the DuckDB mirrors are
hash-exact (FastSS is candidate-lossless for ed ≤ 2: any alignment with
≤ 2 edit operations yields a common string after deleting the involved
positions from each side, so the brute-force oracle and the
neighborhood-join Spark plan return identical pair sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize, shared, unpin
from ..operators import text as T
from ..registry import register

_ED_MAX = 2

#: count-min geometry: 4 independent md5-salted hash rows, 16 buckets each
#: (w intentionally < |vocab| so the sketch must over-count at fixture
#: scale and the panel shows real collision behavior).
_CMS_D = 4
_CMS_W = 16


def _del1_sql(s: str) -> str:
    """SQL for the 1-deletion neighborhood of string expression ``s``
    (empty-safe: Spark's ``sequence(0, -1)`` would count DOWN, so the
    empty string maps to an empty array explicitly)."""
    return (
        f"CASE WHEN length({s}) <= 0 THEN array() "
        f"ELSE transform(sequence(0, length({s}) - 1), "
        f"i -> concat(substring({s}, 1, i), substring({s}, i + 2))) END"
    )


@register(
    "editdist_name_pairs",
    oracle=f"""
    WITH names AS (
      SELECT p_name, COUNT(*) AS cnt
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a,
           b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS ed,
           a.cnt * b.cnt AS n_row_pairs
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= {_ED_MAX}
     AND levenshtein(a.p_name, b.p_name) <= {_ED_MAX}
    ORDER BY name_a, name_b
    """,
)
def editdist_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (≤ 2) similarity self-join over distinct part names —
    fuzzy entity resolution for catalog strings (typos, pluralization,
    one-word swaps within edit budget).

    Candidate generation is FastSS deletion neighborhoods, NOT all-pairs:
    each distinct name expands to its ≤2-deletion variants (1 + L + L·(L−1)/2
    strings, quadratic only in string LENGTH), candidates are the pairs
    sharing a variant (one equi-join on the variant string), and exact
    ``levenshtein`` runs on candidates only. The DuckDB oracle brute-forces
    all pairs — identical result set proves the neighborhood join lossless.
    At 100 TB the distinct-name table is what scales (millions of strings):
    the variant join's key space is uniform md5-like strings, the exact
    verify touches only candidate pairs, and the row-multiplicity join
    never materializes row-level pairs (counts multiply instead).
    """
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("cnt"))
    d1 = _del1_sql("p_name")
    d2 = f"flatten(transform({d1}, t -> {_del1_sql('t')}))"
    variants = names.select(
        "p_name",
        "cnt",
        F.explode(
            F.expr(f"array_distinct(concat(array(p_name), {d1}, {d2}))")
        ).alias("v"),
    )
    a = variants.select(
        F.col("p_name").alias("name_a"), F.col("cnt").alias("cnt_a"), "v"
    )
    b = variants.select(
        F.col("p_name").alias("name_b"), F.col("cnt").alias("cnt_b"), "v"
    )
    cand = (
        a.join(b, "v")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b", "cnt_a", "cnt_b")
        .distinct()
    )
    return (
        cand.withColumn("ed", F.levenshtein("name_a", "name_b"))
        .filter(F.col("ed") <= _ED_MAX)
        .select(
            "name_a",
            "name_b",
            "ed",
            (F.col("cnt_a") * F.col("cnt_b")).alias("n_row_pairs"),
        )
        .orderBy("name_a", "name_b")
    )


#: Spark-side CMS bucket expression over columns ``r`` (hash row) and
#: ``word`` — the SINGLE source for both the sketch-build and the probe
#: sides (they must hash identically or every estimate silently breaks
#: the CMS ≥ freq guarantee); textually parallel to the DuckDB oracle's
#: ``('0x' || substring(md5(...), 1, 4))::BIGINT % w``.
_BUCKET_EXPR = (
    "CAST(conv(substring(md5(concat(cast(r AS STRING), ':', word)), 1, 4), "
    f"16, 10) AS BIGINT) % {_CMS_W}"
)


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    exact AS (
      SELECT word, COUNT(*) AS freq FROM toks GROUP BY word
    ),
    sketch AS (
      SELECT r,
             ('0x' || substring(md5(r::VARCHAR || ':' || word), 1, 4))::BIGINT
               % {_CMS_W} AS bucket,
             SUM(freq) AS bucket_cnt
      FROM exact, (VALUES (0), (1), (2), (3)) rs(r)
      GROUP BY 1, 2
    ),
    top25 AS (
      SELECT word, freq FROM exact
      ORDER BY freq DESC, word LIMIT 25
    ),
    est AS (
      SELECT t.word, t.freq, MIN(s.bucket_cnt) AS cms_est
      FROM top25 t, (VALUES (0), (1), (2), (3)) rs(r)
      JOIN sketch s
        ON s.r = rs.r
       AND s.bucket = ('0x' || substring(md5(rs.r::VARCHAR || ':' || t.word), 1, 4))::BIGINT
                      % {_CMS_W}
      GROUP BY t.word, t.freq
    )
    SELECT word, freq,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - freq AS BIGINT) AS overcount
    FROM est
    ORDER BY freq DESC, word
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters priced against exact counts.

    In a stream the sketch ingests tokens one at a time; in batch the
    counters are ADDITIVE, so building them from the word-frequency table
    is algebraically identical and hashes each distinct word d times
    instead of each token occurrence — the corpus is scanned ONCE (for
    the exact counts the panel needs anyway) and the sketch build runs on
    |vocab| rows (measured at sf0.1: token-side build 2.0–3.0 s →
    vocab-side 0.7 s). The shuffle still carries at most d·w rows per
    partition regardless of corpus size — the whole point of a sketch at
    100 TB. Estimates for the exact top-25 words then come from a
    broadcast join of the d·w-row sketch — never a second corpus pass.
    CMS never undercounts, and with w=16 < |vocab| the fixture actually
    exercises collisions, so ``overcount`` is non-zero and the panel
    demonstrates (deterministically — md5-salted hashes, no RNG) the
    accuracy/size trade every production sketch makes.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(T.tokens("text")).alias("word"))
    exact = toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    rs = F.explode(F.array(*[F.lit(r) for r in range(_CMS_D)])).alias("r")
    sketch = (
        exact.select("word", "freq", rs)
        .select(
            "freq",
            "r",
            F.expr(_BUCKET_EXPR).alias("bucket"),
        )
        .groupBy("r", "bucket")
        .agg(F.sum("freq").alias("bucket_cnt"))
    )
    top25 = exact.orderBy(F.desc("freq"), "word").limit(25)
    probes = top25.select(
        "word",
        "freq",
        rs,
    ).select(
        "word",
        "freq",
        "r",
        F.expr(_BUCKET_EXPR).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("word", "freq")
        .agg(F.min("bucket_cnt").alias("cms_est"))
    )
    return est.select(
        "word",
        "freq",
        "cms_est",
        (F.col("cms_est") - F.col("freq")).alias("overcount"),
    ).orderBy(F.desc("freq"), "word")


@register(
    "hll_union_cardinality",
    oracle="""
    SELECT l_returnflag AS grp,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders_exact,
           TRUE AS hll_within_5pct
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT '__union__' AS grp,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders_exact,
           TRUE AS hll_within_5pct
    FROM lineitem
    ORDER BY grp
    """,
)
def hll_union_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: per-returnflag HLL sketches of
    the order-key set, plus a ``__union__`` row whose estimate comes from
    MERGING the per-group sketches (``hll_union_agg``), not from re-scanning
    the data — the defining property that makes sketches the 100-TB answer
    for distinct counts (constant-size state, map-side combinable, and
    rollup-able across any grouping without a second pass). The flag groups
    genuinely overlap on l_orderkey, so union < sum proves real set-union
    semantics. Datasketches HLL at the default lgK=12 has σ ≈ 1.6 %
    relative error; the panel asserts |est − exact| ≤ 5 % (≈ 3σ) as a
    hash-checked boolean next to engine-exact counts. The exact distincts
    ride along only to price the sketch — at the design point you keep the
    sketch column and drop the exact pass."""
    li = load_table(spark, sf_dir, "lineitem")
    # ONE corpus-scale pass total: group by (flag, orderkey) WITH a row
    # count — map-side combined, so the shuffle carries ~|orders|·|flags|
    # partial rows, and the pinned pair table then answers everything:
    # per-group row counts (Σc), per-group exact distincts (COUNT(*)),
    # the per-group sketches (HLL is duplicate-insensitive, so sketching
    # the pair set builds the identical sketch), and the global exact
    # distinct (distinct of the pair set, not the corpus). The previous
    # shape paid TWO full countDistinct passes plus a counting scan over
    # the raw table for the same answers.
    pairsd = materialize(
        li.groupBy("l_returnflag", "l_orderkey").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    # Round-6 fusion (round-5 verdict item 5): the panel is now exactly
    # TWO actions — the pair-table pin above and the final collect. The
    # previous shape also pinned the 3-row per-flag table (a whole extra
    # job for 3 rows); here `per` stays lazy and its two consumers (the
    # per-group rows and the union row's sketch merge) read it inside ONE
    # job, where Catalyst's ReuseExchange serves both branches from the
    # same 3-row aggregation exchange over the pinned pair table.
    per = pairsd.groupBy("l_returnflag").agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_orders_exact"),
        F.hll_sketch_agg("l_orderkey").alias("sk"),
    )
    ok = (
        F.abs(
            F.hll_sketch_estimate(F.col("sk")).cast("double")
            - F.col("n_orders_exact")
        )
        <= 0.05 * F.col("n_orders_exact")
    ).alias("hll_within_5pct")
    groups = per.select(
        F.col("l_returnflag").alias("grp"), "n_rows", "n_orders_exact", ok
    )
    merged = (
        per.agg(
            # empty table: sum is NULL and the union estimate is NULL —
            # coalesce to the oracle's (0, TRUE) row instead of NULLs
            F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n_rows"),
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("double")
            .alias("est"),
        )
        .crossJoin(
            pairsd.agg(
                F.countDistinct("l_orderkey").alias("n_orders_exact")
            )
        )
        .select(
            F.lit("__union__").alias("grp"),
            "n_rows",
            "n_orders_exact",
            F.coalesce(
                F.abs(F.col("est") - F.col("n_orders_exact"))
                <= 0.05 * F.col("n_orders_exact"),
                F.col("n_orders_exact") == 0,
            ).alias("hll_within_5pct"),
        )
    )
    return groups.unionByName(merged).orderBy("grp")


@register(
    "bpe_merge_candidates",
    oracle="""
    WITH vocab AS (
      SELECT word, COUNT(*) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    pairs AS (
      SELECT substr(word, i, 2) AS pair, CAST(SUM(freq) AS BIGINT) AS weight,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
      FROM vocab, unnest(range(1, len(word))) AS r(i)
      GROUP BY 1
    )
    SELECT pair, weight, n_words
    FROM pairs
    ORDER BY weight DESC, pair
    LIMIT 25
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting step of BPE tokenizer TRAINING: weight every adjacent
    character pair by its corpus occurrence count (Σ over vocabulary of
    word-frequency × within-word occurrences) and rank the top-25 — the
    pair a trainer would merge first, plus the next candidates. Sennrich
    et al.'s algorithm iterates this count-merge loop; the count is the
    distributed-scale part (one vocabulary aggregation + one generator
    explode over words — corpus text is scanned ONCE for the vocab, and
    everything after runs on |vocab| rows, the same collapse the CMS
    panel uses).

    Words shorter than 2 characters generate no pairs; the explicit
    length filter also dodges Spark's descending ``sequence(1, 0)``
    (DuckDB's ``range(1, 1)`` is empty — an engine divergence that would
    otherwise emit phantom pairs). Ties in the merge ranking break
    lexicographically on the pair in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        vocab.filter(F.length("word") >= 2)
        .select(
            "word",
            "freq",
            F.explode(
                F.sequence(F.lit(1), F.length("word") - 1)
            ).alias("i"),
        )
        .select(
            F.expr("substring(word, i, 2)").alias("pair"), "word", "freq"
        )
        .groupBy("pair")
        .agg(
            F.sum("freq").cast("long").alias("weight"),
            F.countDistinct("word").alias("n_words"),
        )
    )
    return pairs.orderBy(F.desc("weight"), "pair").limit(25)


_VOCAB_N = 64  # frozen-vocabulary size for the coverage audit


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (
      SELECT word, COUNT(*) AS f FROM toks WHERE word <> '' GROUP BY word
    ),
    vocab AS (
      SELECT word FROM freq ORDER BY f DESC, word LIMIT {_VOCAB_N}
    )
    SELECT t.source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           ROUND(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*)::DOUBLE, 6) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.word = v.word
    WHERE t.word <> ''
    GROUP BY t.source
    ORDER BY t.source
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: freeze the top-{_VOCAB_N} corpus words
    as "the tokenizer vocabulary" and report each source's token count
    and out-of-vocabulary rate — the panel that decides whether a
    tokenizer trained on one distribution fits an incoming source (high
    OOV ⇒ re-train or re-weight; pairs with ``bpe_merge_candidates``,
    which builds the vocabulary this audits).

    Scale shape: vocabulary selection is a TakeOrderedAndProject over
    the word-frequency table; the coverage pass BROADCASTS the tiny
    frozen vocab against the token stream (left join, no corpus
    shuffle), then rolls up per source map-side. Frequency ties at the
    vocabulary boundary break lexicographically in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    # pinned: the explode feeds BOTH the vocabulary aggregation and the
    # coverage join's probe side, and Catalyst does not share common
    # subtrees across them — unpinned, the corpus parses twice
    toks = materialize(
        docs.select("source", F.explode(T.tokens("text")).alias("word"))
        .filter(F.col("word") != "")
    )
    vocab = (
        toks.groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
        .orderBy(F.desc("f"), "word")
        .limit(_VOCAB_N)
        .select("word")
        .withColumn("_in", F.lit(1))
    )
    oov = F.col("_in").isNull()
    return (
        toks.join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov.cast("long")).cast("long").alias("n_oov"),
            F.round(
                F.sum(oov.cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


#: KMV (bottom-k) sketch size and the 48-bit hash space it draws from.
_KMV_K = 256
_KMV_SPACE = float(1 << 48)  # md5-derived 12-hex-digit uniform hash
#: (k-1) * 2^48 pre-folded to one exact double literal (56 bits — exact);
#: DuckDB would otherwise parse `255.0 * 2.8e14` as DECIMAL and overflow.
_KMV_NUMER = float((_KMV_K - 1) * (1 << 48))

_KMV_COLS = ("l_orderkey", "l_partkey", "l_suppkey")


def _kmv_oracle() -> str:
    blocks = []
    for c in _KMV_COLS:
        blocks.append(f"""
    hs_{c} AS (
      SELECT DISTINCT
        ('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM lineitem
    ),
    bk_{c} AS (
      SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS got
      FROM (SELECT h FROM hs_{c} ORDER BY h LIMIT {_KMV_K})
    ),
    st_{c} AS (
      SELECT '{c}' AS colname,
             (SELECT CAST(COUNT(DISTINCT {c}) AS BIGINT) FROM lineitem)
               AS nd_exact,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM hs_{c}) AS ndh,
             kth, got
      FROM bk_{c}
    )""")
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM st_{c}" for c in _KMV_COLS
    )
    return f"""
    WITH {','.join(blocks)}
    SELECT colname, nd_exact,
           ROUND(CASE WHEN ndh <= {_KMV_K} THEN ndh::DOUBLE
                 ELSE {_KMV_NUMER!r}::DOUBLE / kth::DOUBLE END, 4)
             AS kmv_est,
           ROUND(abs(CASE WHEN ndh <= {_KMV_K} THEN ndh::DOUBLE
                     ELSE {_KMV_NUMER!r}::DOUBLE / kth::DOUBLE END
                     - nd_exact::DOUBLE) / nd_exact::DOUBLE, 6)
             AS rel_err
    FROM ({union})
    ORDER BY colname
    """


@register("kmv_distinct_stats", oracle=_kmv_oracle())
def kmv_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002)
    priced against exact distincts for three lineitem key columns: keep
    the k={_KMV_K} smallest 48-bit hashes of each column's value set and
    estimate |D| = (k-1) / u_k where u_k is the k-th minimum normalized
    hash. The third mergeable sketch in the family (CMS = frequencies,
    HLL = cardinalities at fixed 2^lgK size, KMV = cardinalities with a
    tunable-k accuracy dial AND exact set-intersection estimates via
    min-wise resemblance — why engines keep both). Hashes are md5-derived
    (`conv(substr(md5(v),1,12),16,10)`), so both engines draw the SAME
    pseudo-random sequence and the estimate is hash-exact, not
    tolerance-checked: the +/-1/sqrt(k) ~ 6% error the panel shows is the
    real KMV error, deterministically reproduced.

    Scale shape: ONE unpivoted scan -> distinct (column, value) pairs
    (map-side-combined shuffle, the same pass exact distinct needs
    anyway); the bottom-k per column is TakeOrderedAndProject over the
    pinned distinct-pair table — never a global sort. At 100 TB you keep
    only the k-hash state per column (mergeable across shards) and drop
    the exact pass; it rides along here to price the sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    stack_expr = "stack({}, {}) as (colname, v)".format(
        len(_KMV_COLS),
        ", ".join(f"'{c}', cast({c} as string)" for c in _KMV_COLS),
    )
    pairs = materialize(li.selectExpr(stack_expr).distinct())
    hashes = materialize(
        pairs.select(
            "colname",
            F.conv(F.substring(F.md5(F.col("v")), 1, 12), 16, 10)
            .cast("long")
            .alias("h"),
        ).distinct()
    )
    exact = pairs.groupBy("colname").agg(
        F.count(F.lit(1)).cast("long").alias("nd_exact")
    )
    ndh = hashes.groupBy("colname").agg(
        F.count(F.lit(1)).cast("long").alias("ndh")
    )
    bottoms = None
    for c in _KMV_COLS:
        bk = (
            hashes.filter(F.col("colname") == c)
            .orderBy("h")
            .limit(_KMV_K)
            .groupBy("colname")
            .agg(F.max("h").alias("kth"))
        )
        bottoms = bk if bottoms is None else bottoms.union(bk)
    est = F.when(
        F.col("ndh") <= _KMV_K, F.col("ndh").cast("double")
    ).otherwise(
        F.lit(_KMV_NUMER) / F.col("kth").cast("double")
    )
    return (
        exact.join(ndh, "colname")
        .join(bottoms, "colname")
        .select(
            "colname",
            "nd_exact",
            F.round(est, 4).alias("kmv_est"),
            F.round(
                F.abs(est - F.col("nd_exact").cast("double"))
                / F.col("nd_exact").cast("double"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("colname")
    )


# ---------------------------------------------------------------------------
# Iterative BPE trainer (round-7; round-6 verdict item 4): the full
# count→argmax→merge→re-segment loop of Sennrich et al., N rounds — the
# fourth canonical iterative shape after connected components, PageRank,
# and k-center, mirrored via generated CTE rounds like PageRank's oracle.

_BPE_ROUNDS = 6
_BPE_SEP = "\x1f"           # unit separator: never occurs in fixture text
_BPE_SEP2 = _BPE_SEP * 2


def _bpe_round_ctes(n_rounds: int) -> str:
    """Generated CTE chain of the BPE training loop (shared by the
    trainer panel and the tokenizer-compression apply panel). Segmentations
    are carried as strings — tokens joined by a DOUBLE separator and
    bracketed by single separators (``|a||b||c|``) — so one merge round is
    a plain ``replace(seg, |a||b|, |ab|)``: both engines' ``replace`` is
    left-to-right non-overlapping, which is exactly BPE's greedy merge
    (``aaa`` + pair (a,a) → ``aa a``, one merge, not two). The double
    separator gives each adjacent pair its own delimiters, so back-to-back
    occurrences (``abab``) all merge in one pass and a pair can never
    falsely match across token boundaries (``xa|by`` vs pair (a,b)).
    Word identity rides along every seg CTE so `seg{{n}}` maps word →
    final segmentation."""
    s1 = "chr(31)"
    s2 = "chr(31) || chr(31)"
    ctes = [
        f"""vocab AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE word <> '' GROUP BY word
    ),
    seg0 AS (
      SELECT word, freq,
             {s1} || array_to_string(string_split(word, ''), {s2}) || {s1}
               AS seg
      FROM vocab
    )"""
    ]
    for r in range(1, n_rounds + 1):
        p = r - 1
        ctes.append(
            f"""toklist{p} AS (
      SELECT freq,
             string_split(substr(seg, 2, length(seg) - 2), {s2}) AS toks
      FROM seg{p}
    ),
    pairs{r} AS (
      SELECT toks[i] AS a, toks[i + 1] AS b,
             CAST(SUM(freq) AS BIGINT) AS weight
      FROM toklist{p}, unnest(range(1, len(toks))) AS u(i)
      GROUP BY 1, 2
    ),
    best{r} AS (
      SELECT a, b, weight FROM pairs{r} ORDER BY weight DESC, a, b LIMIT 1
    ),
    seg{r} AS (
      SELECT s.word, s.freq,
             replace(s.seg, {s1} || b.a || {s2} || b.b || {s1},
                     {s1} || b.a || b.b || {s1}) AS seg
      FROM seg{p} s, best{r} b
    ),
    tok{r} AS (
      SELECT freq,
             unnest(string_split(substr(seg, 2, length(seg) - 2), {s2})) AS s
      FROM seg{r}
    ),
    stats{r} AS (
      SELECT CAST(SUM(freq) AS BIGINT) AS corpus_symbols,
             CAST(COUNT(DISTINCT s) AS BIGINT) AS n_distinct_symbols
      FROM tok{r}
    )"""
        )
    return ",\n    ".join(ctes)


def _bpe_training_oracle(n_rounds: int) -> str:
    rows = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS merge_round, b.a AS sym_a, b.b AS sym_b, "
        f"b.a || b.b AS merged, b.weight AS pair_weight, "
        f"st.corpus_symbols, st.n_distinct_symbols "
        f"FROM best{r} b, stats{r} st"
        for r in range(1, n_rounds + 1)
    )
    return (
        "WITH "
        + _bpe_round_ctes(n_rounds)
        + f"\n    {rows}\n    ORDER BY merge_round"
    )


@register("bpe_training_rounds", oracle=_bpe_training_oracle(_BPE_ROUNDS))
def bpe_training_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING, {_BPE_ROUNDS} full merge rounds: count every
    adjacent symbol pair (corpus-weighted), merge the argmax pair
    ((weight DESC, a, b) total order) into every word's segmentation,
    re-segment, repeat — `bpe_merge_candidates` is one count step of this
    loop; this is the loop itself, the algorithm behind every production
    tokenizer's vocabulary.

    Scale shape: the corpus is scanned ONCE (vocabulary collapse —
    everything after runs on |vocab| rows); each round is a vocab-sized
    pair aggregation (map-side combined), a 1-row argmax broadcast into a
    pure-JVM ``replace`` over the segmentation strings (no fold, no UDF),
    and a pinned re-segmentation so round plans stay O(1)-deep (PageRank's
    pin discipline). Segmentations ride a bracketed double-separator
    string encoding — see :func:`_bpe_training_oracle` for why that makes
    greedy non-overlapping merge exactly ``replace()`` in both engines.

    Per round the panel reports the merged pair, its pre-merge weight, and
    post-merge corpus totals: ``corpus_symbols`` strictly decreases (every
    merge collapses ≥1 occurrence) while the symbol inventory grows the
    merge list monotonically — pinned in ``tests/test_bpe_training.py``."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    sep = F.lit(_BPE_SEP)
    seg = materialize(
        vocab.select(
            "freq",
            F.concat(
                sep, F.concat_ws(_BPE_SEP2, F.split("word", "")), sep
            ).alias("seg"),
        )
    )
    inner = F.expr("substring(seg, 2, length(seg) - 2)")
    out: DataFrame | None = None
    for r in range(1, _BPE_ROUNDS + 1):
        toks = F.split(inner, _BPE_SEP2)
        adj = F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        pairs = (
            seg.select("freq", toks.alias("toks"))
            .filter(F.size("toks") >= 2)
            .select("freq", F.explode(adj).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("weight"))
        )
        best = pairs.orderBy(F.desc("weight"), "a", "b").limit(1)
        seg = materialize(
            seg.crossJoin(F.broadcast(best)).select(
                "freq",
                F.replace(
                    F.col("seg"),
                    F.concat(sep, F.col("a"), F.lit(_BPE_SEP2), F.col("b"), sep),
                    F.concat(sep, F.col("a"), F.col("b"), sep),
                ).alias("seg"),
            )
        )
        stats = seg.select("freq", F.explode(F.split(inner, _BPE_SEP2)).alias("s")).agg(
            F.sum("freq").cast("long").alias("corpus_symbols"),
            F.countDistinct("s").cast("long").alias("n_distinct_symbols"),
        )
        row = best.crossJoin(stats).select(
            F.lit(r).alias("merge_round"),
            F.col("a").alias("sym_a"),
            F.col("b").alias("sym_b"),
            F.concat("a", "b").alias("merged"),
            F.col("weight").alias("pair_weight"),
            "corpus_symbols",
            "n_distinct_symbols",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("merge_round")


# ---------------------------------------------------------------------------
# BPE APPLY (round-8 verdict item 2): training learns the merge list;
# this encodes the corpus with it — the standard train→apply tokenizer
# pair. The apply rides the vocabulary collapse too: replaying the merge
# rounds on the word table yields word → final segmentation, and encoding
# the corpus is then a vocab-sized join, never a per-token scan.


def _bpe_word_segs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shared word → trained-BPE symbol count table: replays the
    exact {_BPE_ROUNDS} greedy merge rounds of `bpe_training_rounds`
    (same argmax total order, same bracketed double-separator replace)
    but carries ``word`` through, so the final segmentation maps back to
    the vocabulary. Returns (word, n_sym).

    Scale shape: identical to training — the corpus is scanned once into
    a vocabulary; every round is a vocab-sized pair aggregation + a
    1-row broadcast argmax + a pure-JVM replace; rounds pin via
    ``materialize`` and release their predecessor."""

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        vocab = (
            docs.select(F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        )
        sep = F.lit(_BPE_SEP)
        seg = materialize(
            vocab.select(
                "word",
                "freq",
                F.concat(
                    sep, F.concat_ws(_BPE_SEP2, F.split("word", "")), sep
                ).alias("seg"),
            )
        )
        inner = F.expr("substring(seg, 2, length(seg) - 2)")
        for _ in range(_BPE_ROUNDS):
            toks = F.split(inner, _BPE_SEP2)
            adj = F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
            pairs = (
                seg.select("freq", toks.alias("toks"))
                .filter(F.size("toks") >= 2)
                .select("freq", F.explode(adj).alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").cast("long").alias("weight"))
            )
            best = pairs.orderBy(F.desc("weight"), "a", "b").limit(1)
            prev = seg
            seg = materialize(
                seg.crossJoin(F.broadcast(best)).select(
                    "word",
                    "freq",
                    F.replace(
                        F.col("seg"),
                        F.concat(
                            sep, F.col("a"), F.lit(_BPE_SEP2), F.col("b"), sep
                        ),
                        F.concat(sep, F.col("a"), F.col("b"), sep),
                    ).alias("seg"),
                )
            )
            unpin(prev)
        return seg.select(
            "word",
            F.size(F.split(inner, _BPE_SEP2)).cast("long").alias("n_sym"),
        )

    return shared(("bpe_word_segs", sf_dir, _BPE_ROUNDS), spark, build)


def _doc_bpe_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shared per-document trained-BPE pricing table
    (doc_id, n_ws, n_bpe, chars) — r13 (guide §2.4): FOUR query paths
    (``packing_bpe_stats``, ``training_shard_manifest_bpe``, the curated
    shard path, ``bpe_encode_stats``) each re-exploded the corpus into
    (doc, word) counts and re-joined the segmentation per run; the
    pipeline prices a document once and every consumer reads the table.
    Documents whose every word is empty are ABSENT (consumers left-join
    + coalesce 0, as before). All sums are exact BIGINTs, so rollups per
    source/shard over this table are value-identical to the direct
    per-run derivations."""

    def build() -> DataFrame:
        segs = _bpe_word_segs(spark, sf_dir)
        docs = load_table(spark, sf_dir, "documents")
        wc = (
            docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("doc_id", "word")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        return (
            wc.join(segs, "word")
            .groupBy("doc_id")
            .agg(
                F.sum("cnt").cast("long").alias("n_ws"),
                F.sum(F.col("cnt") * F.col("n_sym")).cast("long").alias(
                    "n_bpe"
                ),
                F.sum(F.col("cnt") * F.length("word")).cast("long").alias(
                    "chars"
                ),
            )
        )

    return shared(("doc_bpe_counts", sf_dir, _BPE_ROUNDS), spark, build)


def _bpe_encode_oracle() -> str:
    R = _BPE_ROUNDS
    s2 = "chr(31) || chr(31)"
    return f"""
    WITH {_bpe_round_ctes(R)},
    wordsym AS (
      SELECT word,
             CAST(len(string_split(substr(seg, 2, length(seg) - 2), {s2}))
                  AS BIGINT) AS n_sym
      FROM seg{R}
    ),
    wc AS (
      SELECT source, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT source, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE word <> ''
      GROUP BY source, word
    ),
    tok AS (
      SELECT source,
             CAST(SUM(cnt) AS BIGINT) AS whitespace_tokens,
             CAST(SUM(cnt * n_sym) AS BIGINT) AS bpe_tokens,
             CAST(SUM(cnt * length(word)) AS BIGINT) AS chars
      FROM wc JOIN wordsym USING (word)
      GROUP BY source
    ),
    nd AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    )
    SELECT n.source, n.n_docs, t.whitespace_tokens, t.bpe_tokens, t.chars,
           ROUND(t.bpe_tokens::DOUBLE / t.whitespace_tokens::DOUBLE, 6)
             AS bpe_fertility,
           ROUND(t.chars::DOUBLE / t.bpe_tokens::DOUBLE, 6)
             AS chars_per_bpe_token
    FROM nd n JOIN tok t USING (source)
    ORDER BY n.source
    """


@register("bpe_encode_stats", oracle=_bpe_encode_oracle())
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus encoded with the TRAINED BPE merges (the apply half of the
    train→apply pair): per source the whitespace token count, the token
    count under the learned {_BPE_ROUNDS}-merge tokenizer, the character
    mass, the fertility (BPE tokens per whitespace token — the number
    every real tokenizer report leads with), and chars per BPE token
    (compression). Unlike `token_count_bpe`'s regex stand-in, these are
    the trained tokenizer's own counts — what a shard manifest's token
    budgets should be priced in.

    Scale shape: word → symbol-count via the shared merge replay
    (vocab-sized), corpus side collapses to (source, word) counts before
    the join (map-side combined), so the join is |vocab × sources| rows
    and AQE broadcasts the tiny segmentation table. No per-token join,
    no UDF."""
    # r13: per-source sums read the session-shared per-document pricing
    # table (guide §2.4) — exact BIGINT sums, value-identical to the
    # previous per-run (source, word)-count rollup
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        _doc_bpe_counts(spark, sf_dir)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_ws").cast("long").alias("whitespace_tokens"),
            F.sum("n_bpe").cast("long").alias("bpe_tokens"),
            F.sum("chars").cast("long").alias("chars"),
        )
    )
    nd = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return (
        nd.join(tok, "source")
        .select(
            "source",
            "n_docs",
            "whitespace_tokens",
            "bpe_tokens",
            "chars",
            F.round(
                F.col("bpe_tokens").cast("double")
                / F.col("whitespace_tokens").cast("double"),
                6,
            ).alias("bpe_fertility"),
            F.round(
                F.col("chars").cast("double") / F.col("bpe_tokens").cast("double"),
                6,
            ).alias("chars_per_bpe_token"),
        )
        .orderBy("source")
    )
