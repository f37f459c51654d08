"""Corpus-curation queries: benchmark decontamination, length profiling,
and deterministic embedding k-means.

Three panels a large-scale training-data pipeline runs that round ≤3
didn't cover, each with an exact DuckDB oracle:

* **Benchmark decontamination** — doc-level flagging of training documents
  that share an 8-gram with a held-out benchmark set (the GPT-3-style
  n-gram decontamination pass). `contamination_overlap` measures pairwise
  source overlap mass; this is the other granularity: which DOCUMENTS to
  drop.
* **Length histogram** — log2-bucketed document-length distribution, the
  standard corpus-composition panel.
* **K-means over embeddings** — Lloyd's algorithm done Spark-first
  (assignment = broadcast-join + argmin, update = map-side-combined sums)
  with every arithmetic step engine-exact, so even an ITERATIVE ML
  operator gets hash-level oracle verification rather than rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize, shared
from ..operators import similarity as S
from ..operators.text import shingles
from ..registry import register

#: The held-out "benchmark" source for decontamination: lexicographically
#: first source in the fixture. In production this is the eval-set table.
_BENCH_SOURCE = "src0"
_DECON_K = 8  # n-gram size; long enough that collisions imply real overlap


def _decon_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-shared (doc_id, source, 8-gram) explode over ``documents``
    — the decontamination family's corpus-prep artifact, pinned once per
    session like the dedup family's 3-gram shingle sets (r12, guide §2.4:
    the exact-decontam panel re-evaluated the explode TWICE per run —
    bench + tainted branches are unshared subtrees — and the Bloom panel
    re-pinned it per run)."""
    return shared(
        ("decon_shingles", sf_dir, _DECON_K),
        spark,
        lambda: load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.explode(shingles("text", _DECON_K)).alias("s"),
        ),
    )

# DuckDB k-gram fragment (generalizes dedup_q's proven k=3 pattern).
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _sql_shingles(k: int) -> str:
    return f"""
  SELECT doc_id, source,
         list_distinct(list_transform(
           range(1, greatest(len(string_split({_NORM}, ' ')) - {k - 1}, 1) + 1),
           i -> array_to_string(string_split({_NORM}, ' ')[i:i+{k - 1}], ' '))) AS shingles
  FROM documents
"""


@register(
    "benchmark_decontam_stats",
    oracle=f"""
    WITH sh AS ({_sql_shingles(_DECON_K)}),
    shx AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
    bench AS (SELECT DISTINCT s FROM shx WHERE source = '{_BENCH_SOURCE}'),
    tainted AS (
      SELECT DISTINCT t.doc_id, t.source
      FROM shx t JOIN bench b ON t.s = b.s
      WHERE t.source <> '{_BENCH_SOURCE}'
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           COUNT(t.doc_id) AS n_contaminated,
           ROUND(COUNT(t.doc_id) / COUNT(*)::DOUBLE, 6) AS contamination_rate
    FROM documents d
    LEFT JOIN tainted t ON d.doc_id = t.doc_id
    WHERE d.source <> '{_BENCH_SOURCE}'
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def benchmark_decontam_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level benchmark decontamination: per training source, how many
    documents share at least one word-8-gram with the benchmark source —
    the docs a decontamination pass would drop before training.

    Plan shape for 100 TB: the benchmark n-gram set is SMALL relative to
    the corpus (an eval suite, not a crawl) — distinct it and BROADCAST;
    the corpus side explodes to (doc, shingle) and semi-joins on the
    shingle, so the only corpus-scale movement is the one linear pass.
    8-grams (not 3) make shared shingles evidence of real duplication
    rather than phrase-level co-occurrence."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _decon_shingles(spark, sf_dir)
    bench = F.broadcast(
        sh.filter(F.col("source") == _BENCH_SOURCE).select("s").distinct()
    )
    tainted = (
        sh.filter(F.col("source") != _BENCH_SOURCE)
        .join(bench, "s", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        docs.filter(F.col("source") != _BENCH_SOURCE)
        .join(tainted, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_hit").alias("n_contaminated"),
            F.round(
                F.count("_hit").cast("double") / F.count(F.lit(1)), 6
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )


@register(
    "doc_length_histogram",
    oracle="""
    SELECT CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS bucket,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram — the corpus-composition
    panel behind length-filter threshold choices. One map-side-combined
    aggregate over an integer column; nothing to shuffle but the tiny
    bucket rows. Zero-length docs clamp into bucket 0 via greatest(,1):
    DuckDB RAISES on log2(0) while Spark returns NULL — without the
    clamp a single empty document turns the oracle's result into a
    crash-vs-NULL-row divergence."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.floor(F.log2(F.greatest("n_chars", F.lit(1))))
            .cast("long")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("bucket")
    )


_KM_K = 8       # clusters for the REGISTERED panels (fixture-sized)
_KM_SCALE = 1_000_000  # fixed-point quantization of float32 components

#: SemDeDup cluster-size contract: the within-cluster pair join is
#: quadratic IN CLUSTER SIZE (Σ nᵢ² pairs scored), so k must scale with
#: the corpus — SemDeDup practice runs k ≈ 10⁴–10⁵ on ~10⁸-doc corpora,
#: i.e. a roughly constant expected cluster size n/k. With k = n/target
#: the expected pair volume is Σ nᵢ² ≈ n · target — LINEAR in n — while
#: a fixed k would give n²/k. ``semdedup_k`` encodes that rule; the
#: registered fixture panels pin k = _KM_K = 8 (2k vectors → ~250/cluster)
#: purely so the oracle SQL mirror is a static string.
_SEM_TARGET_CLUSTER = 256


def semdedup_k(n: int, target_cluster_size: int = _SEM_TARGET_CLUSTER) -> int:
    """Cluster count for a corpus of ``n`` vectors such that expected
    cluster size stays ≈ ``target_cluster_size`` — the knob that keeps
    SemDeDup's within-cluster equi-join linear in corpus size (pair
    volume Σ nᵢ² ≈ n·target, not n²). See the scale-stress test
    ``test_semdedup_pair_volume_tracks_cluster_size`` for the asserted
    contract."""
    return max(1, -(-n // target_cluster_size))


def _sql_kmeans_cte() -> str:
    """Shared DuckDB CTE chain mirroring the Spark k-means step-for-step
    (see embedding_kmeans_stats docstring for why every step is
    engine-exact)."""
    return f"""
    q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    seeds AS (
      SELECT vec_id, qv,
             CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1
                  AS INTEGER) AS cid
      FROM q
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT {_KM_K}
    ),
    c0 AS (SELECT cid, qv AS cv FROM seeds),
    d1 AS (
      SELECT q.vec_id, q.label, q.qv, c0.cid,
             list_sum(list_transform(range(1, len(q.qv) + 1),
               i -> (q.qv[i] - c0.cv[i]) * (q.qv[i] - c0.cv[i]))) AS dist
      FROM q, c0
    ),
    a1 AS (
      SELECT vec_id, label, qv, cid
      FROM (SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d1)
      WHERE rn = 1
    ),
    sums AS (
      SELECT cid, i AS dim, SUM(qv[i]) AS s, COUNT(*) AS n
      FROM a1, range(1, 65) r(i)
      GROUP BY cid, i
    ),
    c1 AS (
      SELECT cid,
             list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS cv
      FROM sums
      GROUP BY cid
    ),
    d2 AS (
      SELECT q.vec_id, q.label, c1.cid,
             list_sum(list_transform(range(1, len(q.qv) + 1),
               i -> (q.qv[i] - c1.cv[i]) * (q.qv[i] - c1.cv[i]))) AS dist
      FROM q, c1
    ),
    a2 AS (
      SELECT vec_id, label, cid, dist AS dist_q
      FROM (SELECT *, row_number() OVER (
              PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d2)
      WHERE rn = 1
    )
"""


def _km_assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k tiny centroid rows
    against the corpus; integer (a-b)² terms folded in long — exact,
    order-proof."""
    d = points.crossJoin(F.broadcast(centroids)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "cv")
    )


def _kmeans_model(emb: DataFrame, k: int = _KM_K) -> tuple[DataFrame, DataFrame]:
    """(quantized points ``q``, final centroid table ``c1``) — the model
    half of the deterministic k-means pipeline: quantize → seed by
    smallest md5(vec_id) → one Lloyd update (broadcast-assign,
    integer-centroid mean). Exposed separately so consumers that need
    distances to EVERY centroid (silhouette) share the exact chain the
    assignment consumers use."""
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * _KM_SCALE).cast("long"),
        ).alias("qv"),
    )

    seeds = (
        q.withColumn("_h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("_h", "vec_id")
        .limit(k)
        .withColumn(
            "cid",
            (
                F.row_number().over(Window.orderBy("_h", "vec_id")) - 1
            ).cast("int"),
        )
        .select("cid", F.col("qv").alias("cv"))
    )

    a1 = _km_assign(q, seeds)
    sums = (
        a1.select("cid", F.posexplode("qv").alias("dim", "v"))
        .groupBy("cid", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    c1 = sums.groupBy("cid").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "dim",
                        F.floor(F.col("s") / F.col("n")).cast("long").alias("m"),
                    )
                )
            ),
            lambda st: st.getField("m"),
        ).alias("cv")
    )
    return q, c1


def _kmeans_assignments(emb: DataFrame, k: int = _KM_K) -> DataFrame:
    """The deterministic k-means pipeline shared by ``embedding_kmeans_stats``
    and ``semantic_dedup_stats``: quantize → seed by smallest md5(vec_id) →
    2 Lloyd iterations (broadcast-assign, integer-centroid update). Returns
    the final assignment ``(vec_id, label, qv, cid, dist, dist_q)``. See
    ``embedding_kmeans_stats`` for the engine-exactness argument; the SQL
    twin is ``_sql_kmeans_cte()``.

    ``k`` is the SemDeDup scale knob — size it with :func:`semdedup_k`
    so expected cluster size (and with it the within-cluster pair join)
    stays bounded as the corpus grows."""
    q, c1 = _kmeans_model(emb, k)
    return _km_assign(q.select("vec_id", "label", "qv"), c1).withColumn(
        "dist_q", F.col("dist")
    )


def _kmeans_c1_shared(spark: SparkSession, sf_dir: str, k: int = _KM_K) -> DataFrame:
    """Session-shared final centroid table (k tiny rows) off the exact
    `_kmeans_model` chain — r13 (guide §2.4): the silhouette panel
    re-ran the whole model chain (seed → assign → integer-centroid
    update) per run when all it needs beyond the quantized points is
    this constant-size model artifact."""
    return shared(
        ("kmeans_c1", sf_dir, k),
        spark,
        lambda: _kmeans_model(load_table(spark, sf_dir, "embeddings"), k)[1],
    )


def _kmeans_a2_shared(spark: SparkSession, sf_dir: str, k: int = _KM_K) -> DataFrame:
    """Session-shared pinned k-means assignment table: the model artifact
    a real pipeline computes once and every embedding-space consumer
    (cluster stats, semantic dedup) reads — same reuse pattern as the
    dedup family's shingle-set table."""
    return shared(
        ("kmeans_a2", sf_dir, k),
        spark,
        lambda: _kmeans_assignments(load_table(spark, sf_dir, "embeddings"), k=k),
    )


@register(
    "embedding_kmeans_stats",
    oracle=f"""
    WITH {_sql_kmeans_cte()},
    per AS (
      SELECT cid, label, COUNT(*) AS n
      FROM a2 GROUP BY cid, label
    ),
    top AS (
      SELECT cid, label AS top_label, n AS top_n
      FROM (SELECT *, row_number() OVER (
              PARTITION BY cid ORDER BY n DESC, label) AS rn FROM per)
      WHERE rn = 1
    )
    SELECT a2.cid AS cluster_id,
           COUNT(*) AS n_points,
           CAST(SUM(a2.dist_q) AS BIGINT) AS inertia_q,
           ANY_VALUE(top.top_label) AS top_label,
           ROUND(ANY_VALUE(top.top_n) / COUNT(*)::DOUBLE, 6) AS top_label_share
    FROM a2 JOIN top ON a2.cid = top.cid
    GROUP BY a2.cid
    ORDER BY cluster_id
    """,
)
def embedding_kmeans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k=8, 2 Lloyd iterations, deterministic seeding) over the
    embeddings table: per cluster — size, fixed-point inertia, and purity
    against the fixture's ground-truth ``label``.

    Spark-first shape: assignment is a broadcast of the k tiny centroids
    against the corpus (O(n·k) rows, the canonical distributed k-means
    join), argmin via one ``min(struct(dist, cid))``-style window, update
    via posexplode → map-side-combined per-(cluster, dim) sums; the ONLY
    driver traffic is the k×64 centroid model state per iteration (the
    documented scalar-stat pattern). At 100 TB this is exactly Lloyd's on
    a cluster; more iterations are the same job repeated.

    Engine-exactness (what makes an iterative algorithm hash-comparable
    at all): components quantize to fixed-point longs (``round(x·10⁶)``
    — double math on both sides, float32→double being exact) and
    CENTROIDS STAY INTEGER-VALUED — seeds are quantized vectors, updated
    centroids are ``floor(sum/count)`` (one IEEE division + floor,
    bit-identical in both engines, off by <1 quantum ≈ 1e-6 from the true
    mean). Every distance is therefore an exact 64-bit integer: no float
    accumulation exists anywhere in the pipeline, so summation order —
    Spark's fold vs DuckDB's list_sum, partition order in the inertia
    aggregate — cannot matter. Argmin ties break on cluster id. Seeds =
    the k smallest ``md5(vec_id)`` (vec_id tie-break), so the run is a
    pure function of the data."""
    a2 = _kmeans_a2_shared(spark, sf_dir)

    per = a2.groupBy("cid", "label").agg(F.count(F.lit(1)).alias("n"))
    wtop = Window.partitionBy("cid").orderBy(F.desc("n"), "label")
    top = (
        per.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("label").alias("top_label"), F.col("n").alias("top_n"))
    )
    return (
        a2.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("dist_q").cast("long").alias("inertia_q"),
        )
        .join(F.broadcast(top), "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_points",
            "inertia_q",
            "top_label",
            F.round(
                F.col("top_n").cast("double") / F.col("n_points"), 6
            ).alias("top_label_share"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination — the constant-size scale path for benchmark
# membership. `benchmark_decontam_stats` broadcasts the benchmark's full
# n-gram SET, which at a 100-TB design point can be gigabytes; a Bloom
# filter over the same set is a fixed few-KB bitmap regardless of benchmark
# size, at the price of a bounded false-positive rate (and ZERO false
# negatives — the property that makes it safe for decontamination: nothing
# contaminated slips through; FPs only cost a little extra dropped data).
# Both engines build the IDENTICAL filter from first principles (k seeded
# md5 positions + bit_or word bitmap), so the panel — including the exact
# FP counts — is deterministic and hash-checked, not a statistical claim.

_BLOOM_M = 131040  # bits; 63 * 2080 — 63-bit words sidestep signed 1<<63
_BLOOM_K = 5       # hash functions (seeded md5)
_BLOOM_WORD = 63


def _bloom_pos(s_col: F.Column, i_col: F.Column) -> F.Column:
    """Bit position of hash seed i for shingle s: first 60 bits of
    md5(s + '#' + i) mod m. Bit-identical in DuckDB as
    ``('0x' || substring(md5(s||'#'||i), 1, 15))::BIGINT % m``."""
    h = F.md5(F.concat(s_col, F.lit("#"), i_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _BLOOM_M


@register(
    "bloom_decontam_stats",
    oracle=f"""
    WITH sh AS ({{shingles}}),
    shx AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh),
    bench AS (SELECT DISTINCT s FROM shx WHERE source = '{_BENCH_SOURCE}'),
    corpus AS (SELECT doc_id, source, s FROM shx WHERE source <> '{_BENCH_SOURCE}'),
    seeds AS (SELECT unnest(range(1, {_BLOOM_K} + 1)) AS i),
    build AS (
      SELECT (('0x' || substring(md5(s || '#' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
              % {_BLOOM_M}) AS pos
      FROM bench, seeds
    ),
    bitmap AS (
      SELECT pos // {_BLOOM_WORD} AS w,
             bit_or(1::BIGINT << CAST(pos % {_BLOOM_WORD} AS INTEGER)) AS bits
      FROM build GROUP BY 1
    ),
    ps AS (SELECT DISTINCT s FROM corpus),
    pr AS (
      SELECT s, (('0x' || substring(md5(s || '#' || CAST(i AS VARCHAR)), 1, 15))::BIGINT
              % {_BLOOM_M}) AS pos
      FROM ps, seeds
    ),
    shhit AS (
      SELECT pr.s,
             MIN(COALESCE((bitmap.bits >> CAST(pr.pos % {_BLOOM_WORD} AS INTEGER)) & 1, 0))
               AS bloom_hit
      FROM pr LEFT JOIN bitmap ON bitmap.w = pr.pos // {_BLOOM_WORD}
      GROUP BY pr.s
    ),
    shclass AS (
      SELECT shhit.s, shhit.bloom_hit,
             CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0 END AS exact
      FROM shhit LEFT JOIN bench ON shhit.s = bench.s
    ),
    srcsh AS (SELECT DISTINCT source, s FROM corpus),
    shstats AS (
      SELECT source, COUNT(*) AS sh_probed,
             CAST(SUM(bloom_hit) AS BIGINT) AS sh_bloom_hits,
             CAST(SUM(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS sh_fps
      FROM srcsh JOIN shclass USING (s) GROUP BY source
    ),
    docflag AS (
      SELECT doc_id, source, MAX(bloom_hit) AS bloom_hit, MAX(exact) AS exact
      FROM corpus JOIN shclass USING (s) GROUP BY doc_id, source
    ),
    docstats AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(exact) AS BIGINT) AS docs_exact,
             CAST(SUM(bloom_hit) AS BIGINT) AS docs_bloom,
             CAST(SUM(CASE WHEN bloom_hit = 1 AND exact = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS doc_fps,
             CAST(SUM(CASE WHEN exact = 1 AND bloom_hit = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS doc_fns
      FROM docflag GROUP BY source
    )
    SELECT source, n_docs, docs_exact, docs_bloom, doc_fps, doc_fns,
           sh_probed, sh_bloom_hits, sh_fps
    FROM docstats JOIN shstats USING (source)
    ORDER BY source
    """.replace("{shingles}", _sql_shingles(_DECON_K)),
)
def bloom_decontam_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a from-first-principles Bloom
    filter, with its false-positive cost measured against exact truth.

    Plan shape for 100 TB: the benchmark side collapses to a ~2080-row /
    16 KB word bitmap (constant in benchmark size — the whole point vs the
    exact-set broadcast in ``benchmark_decontam_stats``), BROADCAST to the
    probe side; probing is one linear pass over distinct corpus shingles
    with k=5 md5 evaluations each, then one shingle-keyed join back to the
    (doc, shingle) pairs — which reuses the exchange the distinct already
    paid. Zero false negatives is a structural guarantee of the filter and
    is asserted by the hash-checked ``doc_fns`` column being 0."""
    # The pinned 8-gram explode feeds five branches (bench set, bitmap
    # build, probe distinct, per-source shingle rollup, doc flags) —
    # Catalyst would re-evaluate unshared subtrees per branch. r12: the
    # pin is the session-shared decontam artifact instead of a per-run
    # re-pin of the same table.
    sh = _decon_shingles(spark, sf_dir)
    bench = sh.filter(F.col("source") == _BENCH_SOURCE).select("s").distinct()
    corpus = sh.filter(F.col("source") != _BENCH_SOURCE)
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(1, _BLOOM_K + 1)])
    ).alias("i")
    build = bench.select("s", seeds).select(
        _bloom_pos(F.col("s"), F.col("i")).alias("pos")
    )
    # shiftleft/shiftright take a literal int in the DataFrame API; the
    # column-shift forms go through F.expr.
    bitmap = build.select(
        F.expr(f"pos div {_BLOOM_WORD}").alias("w"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_WORD} AS INT))"
        ).alias("bitval"),
    ).groupBy("w").agg(F.bit_or("bitval").alias("bits"))
    ps = corpus.select("s").distinct()
    pr = ps.select("s", seeds).select(
        "s", _bloom_pos(F.col("s"), F.col("i")).alias("pos")
    )
    shhit = (
        pr.join(
            F.broadcast(bitmap),
            F.expr(f"pos div {_BLOOM_WORD}") == F.col("w"),
            "left",
        )
        .select(
            "s",
            F.coalesce(
                F.expr(
                    f"shiftright(bits, CAST(pos % {_BLOOM_WORD} AS INT))"
                    " & CAST(1 AS BIGINT)"
                ),
                F.lit(0).cast("long"),
            ).alias("h"),
        )
        .groupBy("s")
        .agg(F.min("h").alias("bloom_hit"))
    )
    shclass = shhit.join(
        bench.withColumn("_b", F.lit(1)), "s", "left"
    ).select(
        "s", "bloom_hit", F.coalesce(F.col("_b"), F.lit(0)).alias("exact")
    )
    srcsh = corpus.select("source", "s").distinct()
    shstats = (
        srcsh.join(shclass, "s")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("sh_probed"),
            F.sum("bloom_hit").cast("long").alias("sh_bloom_hits"),
            F.sum(
                ((F.col("bloom_hit") == 1) & (F.col("exact") == 0)).cast("long")
            ).cast("long").alias("sh_fps"),
        )
    )
    docflag = (
        corpus.join(shclass, "s")
        .groupBy("doc_id", "source")
        .agg(F.max("bloom_hit").alias("bloom_hit"), F.max("exact").alias("exact"))
    )
    docstats = docflag.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("exact").cast("long").alias("docs_exact"),
        F.sum("bloom_hit").cast("long").alias("docs_bloom"),
        F.sum(
            ((F.col("bloom_hit") == 1) & (F.col("exact") == 0)).cast("long")
        ).cast("long").alias("doc_fps"),
        F.sum(
            ((F.col("exact") == 1) & (F.col("bloom_hit") == 0)).cast("long")
        ).cast("long").alias("doc_fns"),
    )
    return (
        docstats.join(shstats, "source")
        .select(
            "source", "n_docs", "docs_exact", "docs_bloom", "doc_fps",
            "doc_fns", "sh_probed", "sh_bloom_hits", "sh_fps",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the embedding
# space, then look for near-duplicates ONLY within clusters — the pruning
# that turns the quadratic cosine-pair problem into k independent
# quadratic-in-(n/k) problems (a k× cost cut for balanced clusters, and
# embarrassingly parallel across clusters). The blocked-GEMM
# `embedding_neardup_pairs` is the exact global answer; this is the
# scale-path screen that trades bounded recall (cross-cluster pairs are
# unseen) for a k× smaller candidate space.

_SEM_TAU = 0.45  # same threshold as embedding_neardup_pairs


@register(
    "semantic_dedup_stats",
    oracle=f"""
    WITH {{kmeans}},
    av AS (
      SELECT a2.vec_id, a2.cid, q.qv,
             list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])) AS nq
      FROM a2 JOIN q USING (vec_id)
    ),
    p AS (
      SELECT a.cid, b.vec_id AS vb,
             CAST(list_sum(list_transform(range(1, 65),
                     i -> a.qv[i] * b.qv[i])) AS DOUBLE)
                   / (sqrt(CAST(a.nq AS DOUBLE)) * sqrt(CAST(b.nq AS DOUBLE)))
               AS cos
      FROM av a JOIN av b ON a.cid = b.cid AND a.vec_id < b.vec_id
    ),
    stats AS (
      SELECT cid,
             COUNT(*) AS n_pairs,
             CAST(SUM(CASE WHEN cos >= {_SEM_TAU} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_pairs,
             COUNT(DISTINCT CASE WHEN cos >= {_SEM_TAU} THEN vb END) AS n_drop
      FROM p GROUP BY cid
    ),
    sz AS (SELECT cid, COUNT(*) AS n_points FROM a2 GROUP BY cid)
    SELECT sz.cid AS cluster_id, sz.n_points,
           COALESCE(stats.n_pairs, 0) AS n_pairs,
           COALESCE(stats.n_dup_pairs, 0) AS n_dup_pairs,
           COALESCE(stats.n_drop, 0) AS n_drop
    FROM sz LEFT JOIN stats ON sz.cid = stats.cid
    ORDER BY cluster_id
    """.replace("{kmeans}", _sql_kmeans_cte()),
)
def semantic_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup panel: per k-means cluster — points, within-cluster pairs
    actually scored, pairs above the cosine threshold, and the documents a
    keep-lowest-id policy would drop.

    Plan shape at 100 TB: the k-means assignment is the session-shared
    pinned artifact from ``_kmeans_a2_shared`` (broadcast centroids, no
    data-sized driver traffic) — computed once per session and reused by
    ``embedding_kmeans_stats``. The pair stage is ONE shuffle on the
    cluster id followed by a per-cluster ``applyInPandas`` gram matrix —
    never an all-pairs cross join, and only k stat rows leave Python.

    Why a Pandas UDF here, against this repo's no-UDF default (the third
    justified exception, same class as ``similarity.py``'s constant-
    matrix matmul): the within-cluster gram is a dense m×64 @ 64×m
    product whose relational spelling — an equi-join with a 64-term
    ``zip_with``/``aggregate`` fold per pair — runs INTERPRETED (higher-
    order functions don't enter whole-stage codegen) and measured 3.4 s
    at sf0.1 for ~230k pairs vs ~0.1 s as one BLAS call per cluster.
    The group fits executor memory BY CONTRACT: :func:`semdedup_k` caps
    expected cluster size (asserted in the scale-stress tests), which is
    exactly the bound applyInPandas needs.

    Cosine arithmetic stays engine-exact: components are quantized
    integers ≤ 1e6, so every pairwise product ≤ 1e12 and every partial
    sum ≤ 64·1e12 < 2^53 — the float64 matmul yields EXACT integer dots
    regardless of BLAS summation order, and ``cos = D/(√A·√B)`` is then
    one IEEE-deterministic expression, bit-identical to the DuckDB
    mirror's — so the panel stays hash-checked with no rounding needed
    before the τ comparison."""
    import numpy as np  # local: keep the module import-light
    import pandas as pd

    a2 = _kmeans_a2_shared(spark, sf_dir).select("vec_id", "cid", "qv")

    def cluster_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")  # pair order (va < vb) by vec_id
        v = np.vstack(pdf["qv"].to_numpy()).astype(np.float64)
        m = len(v)
        if m == 1:
            return pd.DataFrame(
                {"cid": pdf["cid"].iloc[:1], "n_points": [1], "n_pairs": [0],
                 "n_dup_pairs": [0], "n_drop": [0]}
            )
        g = v @ v.T  # exact integer dots (see docstring)
        rt = np.sqrt(np.diag(g))
        cos = g / np.outer(rt, rt)
        iu, ju = np.triu_indices(m, 1)
        dup = cos[iu, ju] >= _SEM_TAU
        return pd.DataFrame(
            {
                "cid": pdf["cid"].iloc[:1],
                "n_points": [m],
                "n_pairs": [len(iu)],
                "n_dup_pairs": [int(dup.sum())],
                # drop set = distinct LARGER-id members of dup pairs
                "n_drop": [len(np.unique(ju[dup]))],
            }
        )

    stats = a2.groupBy("cid").applyInPandas(
        cluster_stats,
        "cid int, n_points long, n_pairs long, n_dup_pairs long, n_drop long",
    )
    return stats.select(
        F.col("cid").alias("cluster_id"),
        "n_points",
        "n_pairs",
        "n_dup_pairs",
        "n_drop",
    ).orderBy("cluster_id")


@register(
    "cluster_balanced_sampling",
    oracle=f"""
    WITH {{kmeans}},
    sz AS (
      SELECT cid, COUNT(*) AS n_points,
             CAST(ceil(sqrt(COUNT(*))) AS BIGINT) AS quota
      FROM a2 GROUP BY cid
    ),
    rk AS (
      SELECT cid, vec_id, label,
             ROW_NUMBER() OVER (
               PARTITION BY cid
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS r
      FROM a2
    ),
    samp AS (
      SELECT rk.cid, rk.vec_id, rk.label
      FROM rk JOIN sz ON rk.cid = sz.cid
      WHERE rk.r <= sz.quota
    ),
    lab AS (
      SELECT cid, label, COUNT(*) AS c FROM samp GROUP BY cid, label
    ),
    major AS (
      SELECT cid, label AS majority_label
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY cid ORDER BY c DESC, label) AS rn FROM lab)
      WHERE rn = 1
    )
    SELECT sz.cid AS cluster_id,
           sz.n_points,
           sz.quota,
           CAST((SELECT COUNT(*) FROM samp WHERE samp.cid = sz.cid) AS BIGINT)
             AS n_sampled,
           major.majority_label
    FROM sz JOIN major ON sz.cid = major.cid
    ORDER BY cluster_id
    """.replace("{kmeans}", _sql_kmeans_cte()),
)
def cluster_balanced_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling from embedding space: draw ~√n vectors per
    k-means cluster (sqrt-scaled quotas over-sample small clusters
    relative to proportional draws — the cluster-balanced recipe that
    keeps rare modes represented in a curated subset). Selection within
    a cluster is the deterministic md5 rank (same content-independent
    uniform draw as ``domain_cap_sampling``); the panel reports each
    cluster's size, quota, realized sample, and the sample's majority
    ground-truth label.

    Reuses the session-shared pinned k-means assignment — a third
    consumer of the one model artifact (after cluster stats and
    SemDeDup), which is exactly how a production pipeline amortizes its
    clustering. Windows partition by cluster id; everything else is
    map-side rollup."""
    a2 = _kmeans_a2_shared(spark, sf_dir).select("vec_id", "label", "cid")
    sz = a2.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.ceil(F.sqrt(F.count(F.lit(1)))).cast("long").alias("quota"),
    )
    w = Window.partitionBy("cid").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    samp = (
        a2.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(sz), "cid")
        .filter(F.col("r") <= F.col("quota"))
    )
    lab = samp.groupBy("cid", "label").agg(F.count(F.lit(1)).alias("c"))
    wl = Window.partitionBy("cid").orderBy(F.desc("c"), "label")
    major = (
        lab.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("label").alias("majority_label"))
    )
    n_samp = samp.groupBy("cid").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        sz.join(n_samp, "cid")
        .join(major, "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_points",
            "quota",
            F.col("n_sampled").cast("long"),
            "majority_label",
        )
        .orderBy("cluster_id")
    )


#: Greedy k-center coreset: number of centers selected (seed + 7 rounds).
_KC_K = 8
#: Candidate batch per argmax action: the driver chains greedy rounds
#: locally while the farthest-point bound holds (see the query docstring).
_KC_CAND = 256


def _kcenter_oracle() -> str:
    """Generated CTE chain, one (m_i, c_i) pair per greedy round — the
    same generated-not-hand-written discipline as ``graph_q._oracle_sql``
    so the Spark loop and the SQL mirror cannot drift. Distances are the
    sequential ``list_dot_product`` fold over the explicit difference
    vector (NOT the ||a||²-2ab+||b||² algebra, which changes the float
    result), so every comparison sees bit-identical doubles in both
    engines."""
    d2 = (
        "list_dot_product("
        "list_transform(range(1, len({b}.v) + 1), i -> {b}.v[i] - {c}.v[i]),"
        "list_transform(range(1, len({b}.v) + 1), i -> {b}.v[i] - {c}.v[i]))"
    )
    parts = [
        "b AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "c0 AS (SELECT 0 AS sel_round, vec_id, label,"
        " CAST(NULL AS DOUBLE) AS mind, v FROM b WHERE vec_id = 0)",
    ]
    for r in range(1, _KC_K):
        prev_m = "b" if r == 1 else f"m{r - 1}"
        dd = d2.format(b="m", c="c")
        if r == 1:
            parts.append(
                f"m1 AS (SELECT m.vec_id, m.label, m.v, {dd} AS mind"
                f" FROM b m, c0 c)"
            )
        else:
            parts.append(
                f"m{r} AS (SELECT m.vec_id, m.label, m.v,"
                f" LEAST(m.mind, {dd}) AS mind"
                f" FROM m{r - 1} m, c{r - 1} c)"
            )
        parts.append(
            f"c{r} AS (SELECT {r} AS sel_round, vec_id, label, mind, v"
            f" FROM m{r} ORDER BY mind DESC, vec_id LIMIT 1)"
        )
    union = " UNION ALL ".join(
        f"SELECT sel_round, vec_id, label, mind FROM c{r}"
        for r in range(_KC_K)
    )
    return f"""
    WITH {','.join(parts)}
    SELECT sel_round, vec_id, label,
           ROUND(sqrt(mind), 6) AS dist_to_set
    FROM ({union})
    ORDER BY sel_round
    """


@register("kcenter_coreset_stats", oracle=_kcenter_oracle())
def kcenter_coreset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (farthest-point traversal) over
    the embeddings table: seed at vec_id 0, then {_KC_K - 1} rounds of
    "add the point farthest from the current center set" — the classic
    2-approximation to the k-center cover and the diversity-first
    coreset/sampling strategy (complement of `embedding_kmeans_stats`'s
    density-seeking clusters and `cluster_balanced_sampling`'s quota
    draw). The per-round `dist_to_set` column IS the coverage-radius
    curve: after r centers every point sits within dist_to_set[r] of a
    center — the panel that answers "how many exemplars until the corpus
    is covered".

    The third canonical iterative shape (after connected components and
    PageRank): per round ONE scan of the pinned point table against ≤
    {_KC_K} broadcast center literals (min-of-folds in whole-stage
    codegen), one TakeOrdered(1) — the driver sees a single row per
    round, never the points. Exactness: squared L2 is the sequential
    fold over the explicit difference vector in both engines; argmax
    ties break on vec_id; no accumulation crosses rounds except LEAST
    of bit-identical doubles.

    Scale shape: stateless rounds (no growing lineage, nothing pinned
    per round) — scans of an O(N) table with k·d-flop rows, the same
    cost class as k-means assignment. Round-7 floor fix (round-6 verdict
    item 7): instead of one argmax ACTION per round (7 × Spark's ~0.33 s
    schedule floor ≈ 2.7 s at sf0.1), each action fetches the top-(M+1)
    candidates by current min-distance and the driver chains as many
    greedy rounds as the standard farthest-point bound allows: minds
    only DECREASE as centers accumulate, so every unfetched point's
    current mind is ≤ the (M+1)-th fetched mind — while the local
    winner's updated mind is STRICTLY above that threshold it is the
    global argmax (ties rescan: an unfetched point with an equal mind
    and smaller vec_id could outrank it). Local distance updates replay
    the engine's exact float ops (left-to-right squared-diff fold), so
    chained minds are bit-identical to a full scan's and the oracle
    hash is unchanged. The fixture geometry chains all 7 rounds from
    one fetch: 8 actions → 2 (~1.0 s at sf0.1); worst case degrades to
    the old one-action-per-round behavior. The candidate batch is
    O(M·d) driver bytes — a bounded constant like the prefix-offset
    collects, never O(N). The broadcast-centers/groupBy-min
    constant-plan variant was tried earlier and is SLOWER (4.2 s);
    points table coalesced to 4 so each fetch schedules 4 right-sized
    tasks, not 32 tiny ones."""
    emb = load_table(spark, sf_dir, "embeddings")
    b = materialize(
        emb.select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
        ).coalesce(4)
    )
    out_schema = (
        "sel_round INT, vec_id BIGINT, label INT, dist_to_set DOUBLE"
    )

    def _d2_local(p: list, c: list) -> float:
        # EXACT replay of the engine's fold: per-element diff, square,
        # left-to-right double accumulation from 0.0 — bit-identical to
        # dot(zip_with(v, c, -), ...) so chained minds hash like scanned
        acc = 0.0
        for i in range(len(p)):
            d = p[i] - c[i]
            acc += d * d
        return acc

    # First action fuses the seed lookup INTO the first candidate fetch:
    # mind vs the vec_id-0 row computed by a broadcast join (same fold
    # expression, column operand instead of a literal array — identical
    # float ops), seed identity riding along as constant columns.
    seedv = b.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("_c0"),
        F.col("vec_id").alias("_c0_id"),
        F.col("label").alias("_c0_label"),
    )
    diff0 = F.zip_with(F.col("v"), F.col("_c0"), lambda x, y: x - y)
    rows = (
        b.crossJoin(F.broadcast(seedv))
        .select(
            "vec_id", "label", S.dot(diff0, diff0).alias("mind"), "v",
            "_c0", "_c0_id", "_c0_label",
        )
        .orderBy(F.desc("mind"), "vec_id")
        .limit(_KC_CAND + 1)
        .collect()
    )
    if not rows:  # empty corpus: no coreset, not a crash
        return spark.createDataFrame([], schema=out_schema)
    centers = [(0, rows[0]._c0_id, rows[0]._c0_label, None, list(rows[0]._c0))]

    def _fetch() -> list:
        dcols = []
        for _, _, _, _, cv in centers:
            clit = F.array(*[F.lit(float(x)) for x in cv])
            diff = F.zip_with(F.col("v"), clit, lambda x, y: x - y)
            dcols.append(S.dot(diff, diff))
        mind = dcols[0] if len(dcols) == 1 else F.least(*dcols)
        return (
            b.select("vec_id", "label", mind.alias("mind"), "v")
            .orderBy(F.desc("mind"), "vec_id")
            .limit(_KC_CAND + 1)
            .collect()
        )

    while len(centers) < _KC_K:
        cand = [[r.vec_id, r.label, float(r.mind), list(r.v)] for r in rows]
        thresh = cand.pop()[2] if len(cand) > _KC_CAND else float("-inf")
        fresh = True  # rows[0] is the engine's own argmax — always valid
        while len(centers) < _KC_K and cand:
            cand.sort(key=lambda c: (-c[2], c[0]))
            w = cand[0]
            if not fresh and not (w[2] > thresh):
                break  # an unfetched point could beat or tie it: rescan
            fresh = False
            centers.append((len(centers), w[0], w[1], w[2], w[3]))
            cand = cand[1:]
            for c in cand:
                nd = _d2_local(c[3], w[3])
                if nd < c[2]:
                    c[2] = nd
        if len(centers) < _KC_K:
            rows = _fetch()
    rows = [(r, vid, lab, mind) for (r, vid, lab, mind, _) in centers]
    out = spark.createDataFrame(
        rows, schema="sel_round INT, vec_id BIGINT, label INT, mind DOUBLE"
    )
    return out.select(
        "sel_round",
        "vec_id",
        "label",
        F.round(F.sqrt("mind"), 6).alias("dist_to_set"),
    ).orderBy("sel_round")


@register(
    "kmeans_silhouette_stats",
    oracle=f"""
    WITH {_sql_kmeans_cte()},
    rk AS (
      SELECT vec_id, cid, dist,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cid) AS rn
      FROM d2
    ),
    ab AS (
      SELECT a.vec_id, a.cid,
             sqrt(a.dist::DOUBLE) AS a_d, sqrt(b.dist::DOUBLE) AS b_d
      FROM rk a JOIN rk b
        ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
    ),
    sil AS (
      SELECT cid, a_d,
             CASE WHEN greatest(a_d, b_d) > 0
                  THEN (b_d - a_d) / greatest(a_d, b_d)
                  ELSE 0.0 END AS s
      FROM ab
    )
    SELECT cid,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(SUM(CAST(ROUND(s, 9) AS DECIMAL(18,9)))::DOUBLE
                 / COUNT(*), 6) AS avg_silhouette,
           ROUND(SUM(CASE WHEN s < 0 THEN 1 ELSE 0 END)::DOUBLE
                 / COUNT(*), 6) AS pct_negative,
           ROUND(SUM(CAST(ROUND(a_d, 6) AS DECIMAL(18,6)))::DOUBLE
                 / COUNT(*), 4) AS avg_dist_own
    FROM sil GROUP BY cid ORDER BY cid
    """,
)
def kmeans_silhouette_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette of the shared k-means
    clustering: per point, a = distance to its own centroid, b = distance
    to the nearest OTHER centroid, s = (b - a)/max(a, b) — averaged per
    cluster with the share of negative-silhouette points (sitting closer
    to a rival centroid than their own: the mis-clustered mass SemDeDup
    would compare against the wrong neighbors). The model-quality gate
    for every consumer of the k-means artifact (`embedding_kmeans_stats`,
    `semantic_dedup_stats`, `cluster_balanced_sampling`): a cluster with
    avg silhouette near 0 on this panel is a cluster whose "semantic
    duplicates" are artifacts of the partition, not geometry. Uses the
    centroid-based variant (O(n*k), the scalable form) rather than
    all-pairs silhouette (O(n^2) — never at 100 TB).

    Engine-exactness: distances are exact integer folds off the shared
    `_kmeans_model` chain (the SQL twin extends the same CTE chain's d2
    table); sqrt is correctly-rounded in both engines; per-cluster means
    quantize round-9/round-6 to DECIMAL. Scale shape: one broadcast
    crossJoin against k centroid rows, one per-vec top-2 window over the
    k-row-per-vec distance table, |k| output rows.

    r13 (guide §2.4): the centroid table comes from the session-shared
    `_kmeans_c1_shared` model artifact (the same deterministic chain,
    computed once per session) — the per-run cost is the quantize scan +
    broadcast distance pass, not a model rebuild."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * _KM_SCALE).cast("long"),
        ).alias("qv"),
    )
    c1 = _kmeans_c1_shared(spark, sf_dir)
    d2 = q.select("vec_id", "qv").crossJoin(F.broadcast(c1)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    rk = materialize(
        d2.select("vec_id", "cid", "dist")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )
    a = rk.filter(F.col("rn") == 1).select(
        "vec_id", "cid", F.sqrt(F.col("dist").cast("double")).alias("a_d")
    )
    b = rk.filter(F.col("rn") == 2).select(
        "vec_id", F.sqrt(F.col("dist").cast("double")).alias("b_d")
    )
    mx = F.greatest("a_d", "b_d")
    sil = a.join(b, "vec_id").select(
        "cid",
        "a_d",
        F.when(mx > 0, (F.col("b_d") - F.col("a_d")) / mx)
        .otherwise(F.lit(0.0))
        .alias("s"),
    )
    n = F.count(F.lit(1))
    return (
        sil.groupBy("cid")
        .agg(
            n.cast("long").alias("n_points"),
            F.round(
                F.sum(F.round(F.col("s"), 9).cast("decimal(18,9)"))
                .cast("double")
                / n,
                6,
            ).alias("avg_silhouette"),
            F.round(
                F.sum(F.when(F.col("s") < 0, 1).otherwise(0)).cast("double")
                / n,
                6,
            ).alias("pct_negative"),
            F.round(
                F.sum(F.round(F.col("a_d"), 6).cast("decimal(18,6)"))
                .cast("double")
                / n,
                4,
            ).alias("avg_dist_own"),
        )
        .orderBy("cid")
    )
