"""ANN index store: persist the chunk-LSH serving index, serve cold.

Round-9 verdict item 5: ``tests/test_index_persistence.py`` proved the
parquet round-trip INSIDE one session; a real 100-TB deployment restarts —
the serving job that mounts the index is never the job that built it. This
module is that lifecycle seam:

* :func:`save_chunk_ann_index` — write the session-pinned chunk index
  (base vectors + exploded LSH bucket table) plus a ``meta.json`` carrying
  the plane GEOMETRY (dim / n_tables / n_bits / seed). The hyperplanes are
  deterministic from the geometry (``operators.similarity.hyperplanes`` is
  md5-seeded), so persisting four integers-and-a-string reconstructs the
  exact planes in any process — no float arrays to version.
* :func:`load_chunk_ann_index` — mount the artifacts in ANY SparkSession
  (a fresh driver-style one included) and rebuild the planes from meta.
* :func:`serve_chunk_ann_from_disk` — run the standard serving join
  (``embed_q._chunk_ann_serve``) off the mounted index.

``tests/test_ann_cold_start.py`` pins the failover story end-to-end: a
SUBPROCESS with a brand-new plain SparkSession loads the index written
here and must answer byte-identically to the session-pinned
``chunk_embed_topk_ann`` path.

Scale shape: the index artifacts are plain parquet — partitioned,
column-pruned scans on mount; the bucket table is the only thing the
serving join reads per probe batch (bucket-sized candidates, never the
corpus). At 100 TB, write the bucket table ``partitionBy("t")`` and
bucket-sort within tables so a serving executor mounts only its shard.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_META = "meta.json"
_BASE = "base"
_BUCKETS = "buckets"


def save_chunk_ann_index(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> dict:
    """Build (or reuse the session-pinned) chunk LSH index for ``sf_dir``
    and persist it under ``index_dir``. Returns the meta dict written."""
    from .queries.embed_q import _DIM, _chunk_lsh_buckets

    base, b_buckets, planes = _chunk_lsh_buckets(spark, sf_dir)
    base.write.mode("overwrite").parquet(f"{index_dir}/{_BASE}")
    b_buckets.write.mode("overwrite").parquet(f"{index_dir}/{_BUCKETS}")
    meta = {
        "kind": "chunk_lsh",
        "dim": _DIM,
        "n_tables": len(planes),
        "n_bits": len(planes[0]),
        "seed": "edi",
        "sf_dir": sf_dir,
    }
    with open(os.path.join(index_dir, _META), "w") as fh:
        json.dump(meta, fh)
    return meta


def load_chunk_ann_index(
    spark: SparkSession, index_dir: str
) -> tuple[DataFrame, DataFrame, list, dict]:
    """(base, buckets, planes, meta) mounted from ``index_dir`` — planes
    reconstructed deterministically from the persisted geometry, so any
    process serves with exactly the build-time hash functions."""
    from .operators import similarity as S

    with open(os.path.join(index_dir, _META)) as fh:
        meta = json.load(fh)
    if meta.get("kind") != "chunk_lsh":
        raise ValueError(f"not a chunk_lsh index dir: {index_dir} ({meta})")
    planes = S.hyperplanes(
        meta["dim"], meta["n_tables"], meta["n_bits"], seed=meta["seed"]
    )
    base = spark.read.parquet(f"{index_dir}/{_BASE}")
    buckets = spark.read.parquet(f"{index_dir}/{_BUCKETS}")
    return base, buckets, planes, meta


def serve_chunk_ann_from_disk(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """The cold-start serving path: mount the on-disk index and run the
    standard candidate-join + exact-rescore serve — same output contract
    as the session-pinned ``chunk_embed_topk_ann``."""
    from .queries.embed_q import _chunk_ann_serve

    base, buckets, planes, _ = load_chunk_ann_index(spark, index_dir)
    return _chunk_ann_serve(spark, sf_dir, base, buckets, planes)
