"""ANN index persistence lifecycle: the session-pinned chunk LSH index
must survive a parquet round-trip and answer queries identically — the
cross-session serving story (build once on the cluster, mount from
storage in every serving job) that session pinning alone cannot give."""

from __future__ import annotations

from ethical_data_ingestion_spark import registry
from ethical_data_ingestion_spark.queries import embed_q as E

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_chunk_lsh_index_survives_parquet_roundtrip(spark, tmp_path):
    base, b_buckets, planes = E._chunk_lsh_buckets(spark, SF_DIR)
    bdir = str(tmp_path / "chunk_base")
    idir = str(tmp_path / "chunk_lsh_index")
    base.write.mode("overwrite").parquet(bdir)
    b_buckets.write.mode("overwrite").parquet(idir)

    rbase = spark.read.parquet(bdir)
    rindex = spark.read.parquet(idir)
    # artifact integrity: the reloaded index is row-identical
    assert _rows(rindex) == _rows(b_buckets)
    # nullability flags legitimately differ after a parquet round-trip;
    # names and types must not
    assert [(f.name, f.dataType) for f in rindex.schema] == [
        (f.name, f.dataType) for f in b_buckets.schema
    ]

    # serving equivalence: answers from the reloaded index match the
    # registered query (which serves from the freshly built one)
    served = E._chunk_ann_serve(spark, SF_DIR, rbase, rindex, planes)
    fresh = registry.QUERIES["chunk_embed_topk_ann"](spark, SF_DIR)
    assert _rows(served) == _rows(fresh)
