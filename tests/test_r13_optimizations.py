"""Equivalence pins for the r13 rewrites (beyond the streaming ones in
test_streaming_multiplex/multibatch): each optimization that restructured
an operator's internals is pinned row-identical to the form it replaced.
"""

from __future__ import annotations

from ethical_data_ingestion_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_mmr_single_plan_equals_join_form_exact_pool(spark):
    """_mmr_select (single-plan array greedy) ≡ _mmr_select_joins (the
    pre-r13 pin+join greedy) on the exact candidate pool."""
    from ethical_data_ingestion_spark.queries import embed_q as E
    from pyspark.sql import Window, functions as F

    cemb = E._chunk_index(spark, SF_DIR)
    q = (
        E._embedded_docs(spark, SF_DIR)
        .filter(F.col("doc_id") < E._RAG_QUERIES)
        .select(F.col("doc_id").alias("query_id"),
                F.col("embedding").alias("qv"))
        .withColumn("qn2", E.E.embedding_norm2("qv"))
        .filter(F.col("qn2") > 0)
    )
    dot_qc = F.aggregate(
        F.zip_with(F.col("qv").cast("array<double>"),
                   F.col("embedding").cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    wq = Window.partitionBy("query_id")
    cands = (
        cemb.join(F.broadcast(q), F.col("doc_id") != F.col("query_id"))
        .select("query_id", "ckey", "embedding", "n2",
                F.round(dot_qc / (F.sqrt(F.col("qn2").cast("double"))
                                  * F.sqrt(F.col("n2").cast("double"))), 6)
                .alias("rel"))
        .withColumn("rank", F.row_number().over(
            wq.orderBy(F.desc("rel"), F.col("ckey"))))
        .filter(F.col("rank") <= E._MMR_N)
        .drop("rank")
    )
    got = _rows(E._mmr_select(cands))
    want = _rows(E._mmr_select_joins(cands))
    assert got == want
    assert got  # non-vacuous


def test_mmr_single_plan_equals_join_form_ann_pool(spark):
    """Same pin on the ANN-served pool (through the registered query, so
    the published-candidates path is exercised too)."""
    from ethical_data_ingestion_spark.queries import embed_q as E
    from pyspark.sql import Window, functions as F

    pool = (
        E._ann_scored_published(spark, SF_DIR)
        .select((F.col("query_id") - F.lit(E._CHUNK_QOFF)).cast("long")
                .alias("query_id"),
                "ckey", F.col("cos").alias("rel"))
        .withColumn("rank", F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(F.desc("rel"), F.col("ckey"))))
        .filter(F.col("rank") <= E._MMR_N)
        .drop("rank")
    )
    cemb = E._chunk_index(spark, SF_DIR)
    cands = pool.join(cemb.select("ckey", "embedding", "n2"), "ckey").select(
        "query_id", "ckey", "embedding", "n2", "rel"
    )
    got = _rows(registry.QUERIES["mmr_diversified_topk_ann"](spark, SF_DIR))
    want = _rows(E._mmr_select_joins(cands))
    assert got == want
    assert got  # non-vacuous


def test_ann_scored_published_matches_direct_serve(spark):
    """chunk_embed_topk_ann through the published-candidates path must
    equal the parameterized direct serve (_chunk_ann_serve)."""
    from ethical_data_ingestion_spark.queries import embed_q as E

    base, b_buckets, planes = E._chunk_lsh_buckets(spark, SF_DIR)
    want = _rows(E._chunk_ann_serve(spark, SF_DIR, base, b_buckets, planes))
    got = _rows(registry.QUERIES["chunk_embed_topk_ann"](spark, SF_DIR))
    assert got == want
    assert got  # non-vacuous
