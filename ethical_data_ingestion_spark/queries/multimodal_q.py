"""Multimodal binary-column queries (driver-contract surface).

The asset table is synthesized deterministically from ``documents`` (UTF-8
payload bytes, round-robin modality — see ``operators/multimodal.as_assets``)
so both engines construct byte-identical binaries: Spark via
``encode(text,'UTF-8')``, DuckDB via ``encode(text)``. That makes even the
``mapInPandas`` paths (frame sampling, byte features) oracle-checkable: the
Python UDF computes from the real bytes, the SQL mirror recomputes the same
result arithmetically (frame geometry) or via hex explode (entropy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..materialize import materialize, shared
from ..operators import dedup as D
from ..operators import multimodal as MM
from ..operators.analytics import davg
from ..registry import register

_ASSETS_SQL = """
      SELECT doc_id AS asset_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS modality,
             encode(text) AS content,
             octet_length(encode(text)) AS size_bytes,
             sha256(text) AS content_sha256
      FROM documents
"""


@register(
    "multimodal_meta_stats",
    oracle=f"""
    WITH assets AS ({_ASSETS_SQL})
    SELECT modality,
           COUNT(*) AS n_assets,
           CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
           ROUND(CAST(SUM(CAST(size_bytes AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(size_bytes), 4) AS avg_bytes,
           COUNT(DISTINCT content_sha256) AS n_distinct_payloads
    FROM assets
    GROUP BY modality
    ORDER BY modality
    """,
)
def multimodal_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup over binary payloads: sizes + exact-dup count
    via content hash — all JVM-side (``octet_length``/``sha2`` on binary),
    one |modalities|-row shuffle."""
    assets = MM.as_assets(load_table(spark, sf_dir, "documents"))
    return (
        assets.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("size_bytes").cast("long").alias("total_bytes"),
            davg("size_bytes", "avg_bytes"),
            F.countDistinct("content_sha256").alias("n_distinct_payloads"),
        )
        .orderBy("modality")
    )


@register(
    "multimodal_frame_stats",
    oracle=f"""
    WITH assets AS ({_ASSETS_SQL}),
    geo AS (
      SELECT modality,
             greatest(1, CAST(ceil(size_bytes / {MM.FRAME_BYTES}.0) AS BIGINT))
               AS n_frames,
             least(size_bytes, {MM.FRAME_BYTES}) AS first_frame_len,
             CASE WHEN size_bytes = 0 THEN 0
                  WHEN size_bytes % {MM.FRAME_BYTES} = 0 THEN {MM.FRAME_BYTES}
                  ELSE size_bytes % {MM.FRAME_BYTES} END AS last_frame_len
      FROM assets
    )
    SELECT modality,
           COUNT(*) AS n_assets,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           CAST(MAX(n_frames) AS BIGINT) AS max_frames,
           CAST(SUM(first_frame_len) AS BIGINT) AS total_head_bytes,
           CAST(SUM(last_frame_len) AS BIGINT) AS total_tail_bytes
    FROM geo
    GROUP BY modality
    ORDER BY modality
    """,
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling rollup. The Spark side genuinely chunks the payload
    bytes inside Arrow-batched ``mapInPandas`` (the codec-iterator slot);
    the oracle recomputes the identical geometry arithmetically from
    ``octet_length`` — UDF plumbing verified to hash equality, not just
    row counts."""
    assets = MM.as_assets(load_table(spark, sf_dir, "documents"))
    return (
        MM.sample_frames(assets)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.max("n_frames").cast("long").alias("max_frames"),
            F.sum("first_frame_len").cast("long").alias("total_head_bytes"),
            F.sum("last_frame_len").cast("long").alias("total_tail_bytes"),
        )
        .orderBy("modality")
    )


@register(
    "multimodal_byte_entropy",
    oracle=f"""
    WITH assets AS ({_ASSETS_SQL}),
    hexed AS (
      SELECT asset_id, modality, hex(content) AS h, size_bytes AS n
      FROM assets
    ),
    bytes AS (
      SELECT asset_id, ('0x' || substr(h, 2 * i + 1, 2))::INTEGER AS b
      FROM (SELECT asset_id, h, unnest(range(n)) AS i FROM hexed)
    ),
    counts AS (
      SELECT asset_id, b, COUNT(*)::DOUBLE AS c
      FROM bytes GROUP BY asset_id, b
    ),
    totals AS (
      SELECT asset_id, SUM(c) AS n FROM counts GROUP BY asset_id
    ),
    ent AS (
      SELECT counts.asset_id,
             ROUND(SUM(-(c / n) * log2(c / n)), 6) AS e
      FROM counts JOIN totals USING (asset_id)
      GROUP BY counts.asset_id
    )
    SELECT modality,
           COUNT(*) AS n_assets,
           ROUND(CAST(SUM(CAST(e AS DECIMAL(18,6))) AS DOUBLE) / COUNT(e), 4)
             AS avg_entropy
    FROM ent JOIN hexed USING (asset_id)
    GROUP BY modality
    ORDER BY modality
    """,
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature extraction (entropy head of the histogram
    features). Spark computes numpy-vectorized inside ``mapInPandas``; the
    oracle re-derives the same entropy by hex-exploding the blob in SQL.
    Rounded per-asset to 6 decimals on both sides before the decimal-sum
    average (SURVEY §7.5 risk 3)."""
    assets = MM.as_assets(load_table(spark, sf_dir, "documents"))
    feats = MM.byte_features(assets).select(
        "asset_id", "modality", F.round("byte_entropy", 6).alias("e")
    )
    return (
        feats.groupBy("modality")
        .agg(F.count(F.lit(1)).alias("n_assets"), davg("e", "avg_entropy"))
        .orderBy("modality")
    )


@register(
    "multimodal_neardup_simhash",
    oracle=f"""
    WITH assets AS ({_ASSETS_SQL}),
    ch AS (
      SELECT asset_id, modality,
             list_distinct(list_transform(
               range(1, CAST(ceil(length(hex(content)) / 32.0) AS BIGINT) + 1),
               i -> substr(hex(content), (i - 1) * 32 + 1, 32))) AS chunks
      FROM assets
    ),
    hs AS (
      SELECT asset_id, modality,
             list_transform(chunks,
               t -> (('0x' || substr(md5(t), 1, 8))::UBIGINT)::BIGINT) AS hashes
      FROM ch
    ),
    sig AS (
      SELECT asset_id, modality,
             CAST(list_sum(list_transform(range(0, 32),
               b -> CASE WHEN list_sum(list_transform(hashes,
                              h -> ((h >> b) & 1) * 2 - 1)) > 0
                         THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS sig
      FROM hs
      WHERE len(hashes) > 0
    )
    SELECT a.asset_id AS id1, b.asset_id AS id2,
           a.modality AS modality1, b.modality AS modality2,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.asset_id < b.asset_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    ORDER BY id1, id2
    """,
)
def multimodal_neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level near-duplicate media detection: SimHash over distinct
    16-byte content chunks (the content-defined stand-in for a perceptual
    hash — the fixtures carry no real media, so chunk features play the
    role pHash/chromaprint features play in production), Hamming ≤ 3,
    candidates via the same lossless 8-bit pigeonhole blocking as the text
    family.

    This extends dedup from the text column to the BINARY columns: byte
    chunks need no tokenizer, no normalization, and no decode, so the same
    pipeline covers image/audio/video payloads uniformly. Shape at 100 TB:
    hex+chunk is a linear scan, each chunk is hashed once, the 32 per-bit
    sums combine map-side, and candidate volume is governed by block
    collisions — never all-pairs (the brute-force oracle doubles as the
    completeness proof for the blocking scheme)."""
    assets = MM.as_assets(load_table(spark, sf_dir, "documents"))
    chunks = assets.select(
        "asset_id",
        "modality",
        # empty content must yield an EMPTY chunk array: sequence(0, -1)
        # descends ([0, -1]) rather than being empty, which would mint a
        # phantom '' chunk the oracle (range-based, naturally empty) never
        # sees — two empty payloads would then hamming-0 pair only in Spark
        F.expr(
            "CASE WHEN length(content) = 0 THEN array()"
            " ELSE array_distinct(transform("
            " sequence(0, CAST(ceil(length(hex(content)) / 32.0) AS INT) - 1),"
            " i -> substring(hex(content), i * 32 + 1, 32))) END"
        ).alias("sh"),
    ).withColumn("n_sh", F.size("sh"))
    # modality rides through the signature/candidate pipeline (carry=),
    # so no join back to the asset table — the panel is the signature
    # fold + ONE block-key equi-join + top-level sort, nothing else
    pairs = D.simhash_pairs(
        assets, "asset_id", "content", max_hamming=3, sets=chunks,
        carry=("modality",),
    )
    return pairs.select(
        "id1", "id2", "modality1", "modality2",
        F.col("hamming").cast("int").alias("hamming"),
    ).orderBy("id1", "id2")


@register(
    "multimodal_cdc_stats",
    oracle=f"""
    WITH assets AS ({_ASSETS_SQL}),
    hexed AS (
      SELECT asset_id, modality, lower(hex(content)) AS h, size_bytes AS n
      FROM assets WHERE size_bytes > 0
    ),
    bytes AS (
      SELECT asset_id, modality, h, i,
             ('0x' || substr(h, 2 * i + 1, 2))::BIGINT AS b
      FROM (SELECT asset_id, modality, h, n, unnest(range(n)) AS i FROM hexed)
    ),
    win AS (
      SELECT asset_id, modality, h, i, b,
             LAG(b, 3) OVER w AS b3, LAG(b, 2) OVER w AS b2,
             LAG(b, 1) OVER w AS b1
      FROM bytes
      WINDOW w AS (PARTITION BY asset_id ORDER BY i)
    ),
    cuts AS (
      SELECT asset_id, modality, h, i,
             CASE WHEN i >= {MM.CDC_WINDOW - 1}
                       AND (b3 * 16777216 + b2 * 65536 + b1 * 256 + b)
                           % {MM.CDC_MOD} = 0
                  THEN 1 ELSE 0 END AS cut
      FROM win
    ),
    numbered AS (
      SELECT asset_id, modality, h, i,
             COALESCE(SUM(cut) OVER (PARTITION BY asset_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_no
      FROM cuts
    ),
    chunks AS (
      SELECT asset_id, modality, chunk_no,
             CAST(COUNT(*) AS BIGINT) AS chunk_bytes,
             md5(substr(ANY_VALUE(h), 2 * MIN(i) + 1, 2 * COUNT(*)))
               AS chunk_md5
      FROM numbered
      GROUP BY asset_id, modality, chunk_no
    ),
    by_hash AS (
      SELECT modality, chunk_md5,
             COUNT(*) AS cnt, MIN(chunk_bytes) AS cb
      FROM chunks GROUP BY modality, chunk_md5
    )
    SELECT c.modality,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT c.chunk_md5) AS BIGINT) AS n_distinct_chunks,
           CAST(SUM(c.chunk_bytes) AS BIGINT) AS total_bytes,
           ROUND(CAST(SUM(CAST(c.chunk_bytes AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_chunk_bytes,
           CAST(d.dup_bytes AS BIGINT) AS dup_bytes,
           ROUND(CAST(d.dup_bytes AS DOUBLE) / SUM(c.chunk_bytes), 6)
             AS dup_ratio
    FROM chunks c
    JOIN (SELECT modality, SUM((cnt - 1) * cb) AS dup_bytes
          FROM by_hash GROUP BY modality) d USING (modality)
    GROUP BY c.modality, d.dup_bytes
    ORDER BY c.modality
    """,
)
def multimodal_cdc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup panel — the blob-store tier below
    document-level near-dup: payloads split at rolling-hash boundaries
    (insertion-shift-resistant, unlike fixed frames), chunks keyed by
    content hash, and the per-modality ledger reports exactly what a
    content-addressable store would save (duplicate chunk mass + ratio).

    Spark computes boundaries numpy-vectorized inside one Arrow
    ``mapInPandas`` pass (no shuffle introduced); the oracle re-derives
    the identical cuts from the hex-exploded blob with window LAGs and a
    running cut count — chunk hashes are md5 over lowercase hex on BOTH
    engines, so the panel is value-hash-checked end to end."""
    assets = MM.as_assets(load_table(spark, sf_dir, "documents"))
    # pin: two aggregation branches read the chunk table; without the pin
    # each would re-run the Python chunker (plan pin asserts ONE pass)
    chunks = materialize(MM.cdc_chunks(assets))
    by_hash = (
        chunks.groupBy("modality", "chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("chunk_bytes").alias("cb"),
        )
        .groupBy("modality")
        .agg(
            F.sum((F.col("cnt") - 1) * F.col("cb")).alias("dup_bytes")
        )
    )
    return (
        chunks.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_md5").alias("n_distinct_chunks"),
            F.sum("chunk_bytes").cast("long").alias("total_bytes"),
            davg("chunk_bytes", "avg_chunk_bytes"),
        )
        .join(by_hash, "modality")
        .select(
            "modality",
            "n_chunks",
            "n_distinct_chunks",
            "total_bytes",
            "avg_chunk_bytes",
            F.col("dup_bytes").cast("long").alias("dup_bytes"),
            F.round(
                F.col("dup_bytes").cast("double") / F.col("total_bytes"), 6
            ).alias("dup_ratio"),
        )
        .orderBy("modality")
    )


def _phash_oracle() -> str:
    """Brute-force mirror: recompute every payload's DCT sign hash from
    the hex-exploded bytes (64-bin fold → ordered pixel list →
    ``list_dot_product`` per AC coefficient, sequential fold matching
    the UDF's strict pixel-order accumulation), then ALL-PAIRS Hamming —
    so the hash gate also proves the Spark side's pigeonhole banding
    complete (any pair the bands missed would mismatch the hash)."""
    bit_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, "
        f"[{','.join(repr(w) for w in row)}]) > 0 THEN {1 << j} ELSE 0 END)"
        for j, row in enumerate(MM.dct_weights())
    )
    return f"""
    WITH assets AS ({_ASSETS_SQL}),
    hexed AS (
      SELECT asset_id, modality, lower(hex(content)) AS h, size_bytes AS n
      FROM assets WHERE size_bytes > 0
    ),
    bytes AS (
      SELECT asset_id, i, ('0x' || substr(h, 2 * i + 1, 2))::BIGINT AS b
      FROM (SELECT asset_id, h, n, unnest(range(n)) AS i FROM hexed)
    ),
    px AS (
      SELECT asset_id, i % 64 AS k, CAST(SUM(b) AS DOUBLE) AS p
      FROM bytes GROUP BY asset_id, i % 64
    ),
    grid AS (
      SELECT asset_id, modality, g.k
      FROM hexed, (SELECT unnest(range(64)) AS k) g
    ),
    pxf AS (
      SELECT grid.asset_id, grid.modality, grid.k, COALESCE(px.p, 0.0) AS p
      FROM grid LEFT JOIN px
        ON px.asset_id = grid.asset_id AND px.k = grid.k
    ),
    pxl AS (
      SELECT asset_id, modality, list(p ORDER BY k) AS v
      FROM pxf GROUP BY asset_id, modality
    ),
    hs AS (
      SELECT asset_id, modality, CAST({bit_terms} AS BIGINT) AS ph
      FROM pxl
    )
    SELECT a.asset_id AS id1, b.asset_id AS id2,
           a.modality AS modality1, b.modality AS modality2,
           CAST(bit_count(xor(a.ph, b.ph)) AS INTEGER) AS hamming
    FROM hs a JOIN hs b ON a.asset_id < b.asset_id
    WHERE bit_count(xor(a.ph, b.ph)) <= {MM_PHASH_MAXH}
    ORDER BY id1, id2
    """


MM_PHASH_MAXH = 3  # bands = maxh + 1 (pigeonhole-complete blocking)


@register("multimodal_phash_neardup", oracle=_phash_oracle())
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate media pairs: 63-bit DCT sign hash
    per payload (the pHash dataflow — bin to an 8x8 'image', 2-D DCT,
    keep AC coefficient signs; decode stand-in documented on the
    operator), candidates from lossless 16-bit pigeonhole bands
    (Hamming <= {MM_PHASH_MAXH} forces a collision in one of
    {MM_PHASH_MAXH + 1} bands), exact Hamming verify on candidates only.

    Complements `multimodal_neardup_simhash` (bag-of-chunks resemblance)
    with the FREQUENCY-DOMAIN fingerprint family: SimHash sees shared
    content blocks; pHash sees global structure, robust to small local
    edits that shift every chunk. Shape at 100 TB: one Arrow pass for
    hashes, band equi-join for candidates, never all-pairs (the oracle
    IS all-pairs — completeness proof for the banding)."""
    assets = MM.as_assets(load_table(spark, sf_dir, "documents"))
    # pin the hash table: the Arrow DCT pass is the index artifact, and
    # unpinned it would be re-evaluated in EVERY join branch below (the
    # self-join + two label joins replicated it 8x in the plan — pinned
    # by tests/test_multimodal.py)
    h = shared(
        ("phash63", sf_dir),
        spark,
        lambda: assets.filter(F.col("size_bytes") > 0).select(
            "asset_id", "modality", MM.phash63_udf()("content").alias("ph")
        ),
    )
    n_bands = MM_PHASH_MAXH + 1
    bands = h.select(
        "asset_id",
        "ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("band"),
                        F.shiftright("ph", 16 * t)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for t in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("asset_id", "ph", "bk.band", "bk.key")
    a = bands.select(
        F.col("asset_id").alias("id1"), F.col("ph").alias("ph1"),
        "band", "key",
    )
    b = bands.select(
        F.col("asset_id").alias("id2"), F.col("ph").alias("ph2"),
        "band", "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "ph1", "ph2")
        .distinct()
    )
    lbl = assets.select("asset_id", "modality")
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("ph1").bitwiseXOR(F.col("ph2"))).cast("int"),
        )
        .filter(F.col("hamming") <= MM_PHASH_MAXH)
        .join(lbl.withColumnRenamed("asset_id", "id1")
              .withColumnRenamed("modality", "modality1"), "id1")
        .join(lbl.withColumnRenamed("asset_id", "id2")
              .withColumnRenamed("modality", "modality2"), "id2")
        .select("id1", "id2", "modality1", "modality2", "hamming")
        .orderBy("id1", "id2")
    )
