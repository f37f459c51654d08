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
