"""Streaming-drain decomposition: engine premium vs batch twin, per drain.

The bench suite prices 9 Structured-Streaming drains — real micro-batch
machinery (state-store commits, per-trigger planning, file-source
listing) — against DuckDB running their batch GROUP-BY mirrors, which
makes the streaming rows look slow for reasons that have nothing to do
with plan quality. This tool separates the two factors the round-4
verdict asked to see separated: for every drain it times

* the REGISTERED drain (streaming engine end-to-end, exactly as bench
  runs it), and
* a BATCH TWIN — the same DataFrame computation with the streaming
  engine removed (same aggregation/join/window logic on the same
  events table),

asserts the two produce the SAME rows (so the premium is attributable
to the engine, not to differing work), and prints a markdown table with
``premium = drain − twin`` plus one JSON line for tooling. The table is
pasted into BASELINE.md's streaming adjudication.

Methodology matches bench.py: min over two fresh runs per measurement
after a shared warmup; the spool staging is hoisted exactly as bench
hoists it.
"""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
os.environ["PYTHONWARNINGS"] = "ignore"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ethical_data_ingestion_spark.io import load_table, preresolve_tables  # noqa: E402
from ethical_data_ingestion_spark.registry import QUERIES  # noqa: E402
from ethical_data_ingestion_spark.session import get_spark  # noqa: E402

_GAP = "1800 seconds"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _sum_value():
    return F.sum(F.col("value").cast("decimal(18,2)")).cast("double")


def _guarded_batch_sessions(spark, sf_dir) -> DataFrame:
    """Batch session_window twin shared by both session drains (the
    streaming queries' own guard helper is reused for the emit set)."""
    from ethical_data_ingestion_spark.queries.streaming_q import (
        _guard_sessions,
    )

    ev = _events(spark, sf_dir)
    sess = (
        ev.groupBy(F.session_window("ts", _GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("session_last"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "session_last",
            "n_events",
        )
    )
    return _guard_sessions(sess, spark, sf_dir)


def _twins(spark: SparkSession, sf_dir: str) -> dict[str, callable]:
    ev = lambda: _events(spark, sf_dir)  # noqa: E731

    def tumbling():
        return (
            ev()
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"), _sum_value().alias("total_value"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
            .orderBy("window_start", "event_type")
        )

    def dedup():
        return (
            ev().select("user_id", "event_type").distinct()
            .orderBy("user_id", "event_type")
        )

    def sessions():
        return _guarded_batch_sessions(spark, sf_dir)

    def rollup():
        return (
            ev()
            .groupBy(
                F.to_date("ts").alias("day"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).alias("n_events"), _sum_value().alias("total_value"))
            .orderBy("day", "event_type")
        )

    def interval_join():
        e = ev().select("user_id", "event_type", "ts")
        p = e.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("pts")
        )
        c = e.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("cuid"), F.col("ts").alias("cts")
        )
        return (
            p.join(
                c,
                (F.col("user_id") == F.col("cuid"))
                & (F.col("cts") > F.col("pts"))
                & (F.col("cts") <= F.col("pts") + F.expr("INTERVAL 3600 SECOND")),
            )
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("user_id")
        )

    def enriched():
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", F.col("c_mktsegment").alias("segment")
        )
        return (
            ev()
            .withColumn("c_custkey", F.col("user_id") + 1)
            .join(F.broadcast(cust), "c_custkey")
            .groupBy("segment")
            .agg(F.count(F.lit(1)).alias("n_events"), _sum_value().alias("total_value"))
            .orderBy("segment")
        )

    def anomaly():
        win = (
            ev()
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n")
        )
        cnt = F.count(F.lit(1)).cast("double")
        mean = F.sum("n").cast("double") / cnt
        ex2 = F.sum(F.col("n") * F.col("n")).cast("double") / cnt
        stats = win.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_windows"),
            mean.alias("mean"),
            F.sqrt(ex2 - mean * mean).alias("sd"),
        )
        joined = win.join(F.broadcast(stats), "event_type")
        anom = (F.col("n").cast("double") - F.col("mean")) > F.lit(2.0) * F.col("sd")
        return (
            joined.groupBy("event_type")
            .agg(
                F.max("n_windows").alias("n_windows"),
                F.sum(F.when(anom, 1).otherwise(0)).alias("n_anomalous"),
                F.max("n").alias("max_window_count"),
                F.round(F.max("mean"), 4).alias("mean_count"),
                F.round(F.max("sd"), 4).alias("sd_count"),
            )
            .orderBy("event_type")
        )

    def trending():
        win = (
            ev()
            .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        )
        from pyspark.sql import Window as W

        r = W.partitionBy("window_start").orderBy(
            F.desc("n_events"), "event_type"
        )
        return (
            win.withColumn("rank", F.row_number().over(r).cast("int"))
            .filter(F.col("rank") <= 2)
            .orderBy("window_start", "rank")
        )

    def incr_dedup():
        from ethical_data_ingestion_spark.operators import text as T
        from ethical_data_ingestion_spark.queries.dedup_q import _is_batch
        from ethical_data_ingestion_spark.queries.streaming_q import (
            _classify_perfp,
        )

        docs = load_table(spark, sf_dir, "documents")
        batch = docs.filter(_is_batch()).select("doc_id", "text")
        perfp = (
            batch.select("doc_id", T.fingerprint("text").alias("fp"))
            .groupBy("fp")
            .agg(
                F.count(F.lit(1)).alias("n_occ"),
                F.min("doc_id").alias("first_doc_id"),
            )
        )
        return _classify_perfp(spark, sf_dir, perfp)

    def quarantine():
        from ethical_data_ingestion_spark.queries.dedup_q import _is_batch
        from ethical_data_ingestion_spark.queries.streaming_q import (
            _quarantine_final,
            _quarantine_rollup,
        )

        docs = load_table(spark, sf_dir, "documents")
        batch = docs.filter(_is_batch()).select("doc_id", "source", "text")
        return _quarantine_final(_quarantine_rollup(batch))

    def late_audit():
        from ethical_data_ingestion_spark.queries.streaming_q import (
            _late_audit_batch_twin,
        )

        return _late_audit_batch_twin(spark, sf_dir)

    def curation_gate():
        from ethical_data_ingestion_spark.queries.dedup_q import _is_batch
        from ethical_data_ingestion_spark.queries.streaming_q import (
            _curation_final,
            _curation_rollup,
        )

        docs = load_table(spark, sf_dir, "documents")
        batch = docs.filter(_is_batch()).select("doc_id", "source", "text")
        return _curation_final(_curation_rollup(spark, sf_dir, batch))

    def knn_serving():
        from ethical_data_ingestion_spark.operators import similarity as S
        from ethical_data_ingestion_spark.queries.similarity_q import (
            _ann_is_new,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        index = emb.filter(~_ann_is_new())
        probes = emb.filter(_ann_is_new()).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        from ethical_data_ingestion_spark.queries.streaming_q import (
            _SERVE_BITS,
        )

        return S.knn_lsh(index, probes, k=10, n_bits=_SERVE_BITS).withColumn(
            "rank", F.col("rank").cast("int")
        )

    return {
        "streaming_tumbling_hourly": tumbling,
        "streaming_dedup_keys": dedup,
        "streaming_sessions_stateful": sessions,
        "streaming_sessions_jvm": sessions,
        "continuous_rollup_daily": rollup,
        "streaming_purchase_click_join": interval_join,
        "streaming_enriched_segments": enriched,
        "streaming_anomaly_windows": anomaly,
        "streaming_topk_trending": trending,
        "streaming_incremental_dedup": incr_dedup,
        "streaming_quarantine_gate": quarantine,
        "streaming_late_data_audit": late_audit,
        "streaming_knn_serving": knn_serving,
        "streaming_curation_gate": curation_gate,
    }


def _rows(df: DataFrame) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def _time_min2(fn) -> tuple[float, list[tuple]]:
    t0 = time.time()
    rows = _rows(fn())
    t = time.time() - t0
    t0 = time.time()
    rows = _rows(fn())
    return round(min(t, time.time() - t0), 3), rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "streaming_decomp", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    preresolve_tables(spark, sf_dir)
    # warm exactly as bench.py does for the streaming path
    spark.range(64).withColumn("g", F.col("id") % 4).groupBy("g").applyInPandas(
        lambda pdf: pdf, "id long, g long"
    ).count()
    from ethical_data_ingestion_spark.queries import streaming_q as SQ
    from ethical_data_ingestion_spark.session import scratch_dir

    SQ._spooled_stream(spark, sf_dir, n_files=4, mfpt=2)
    SQ._spooled_stream(spark, sf_dir, n_files=1, mfpt=None)
    warm = scratch_dir("eds_decomp_warm_")
    spark.range(16).select(
        F.col("id"), F.timestamp_seconds(F.col("id")).alias("ts")
    ).coalesce(1).write.mode("overwrite").parquet(warm)
    (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(warm)
        .withWatermark("ts", "0 seconds")
        .dropDuplicatesWithinWatermark(["id"])
        .writeStream.format("noop")
        .option("checkpointLocation", scratch_dir("eds_decomp_ckpt_"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    twins = _twins(spark, sf_dir)
    table = []
    for name, twin in twins.items():
        drain_s, drain_rows = _time_min2(lambda: QUERIES[name](spark, sf_dir))
        twin_s, twin_rows = _time_min2(twin)
        same = drain_rows == twin_rows
        table.append(
            {
                "drain": name,
                "drain_s": drain_s,
                "twin_s": twin_s,
                "premium_s": round(drain_s - twin_s, 3),
                "rows_match": same,
            }
        )

    print("| drain | engine drain s | batch twin s | engine premium s | twin rows match |")
    print("|---|---|---|---|---|")
    for r in table:
        print(
            f"| {r['drain']} | {r['drain_s']} | {r['twin_s']} "
            f"| {r['premium_s']} | {'yes' if r['rows_match'] else 'NO'} |"
        )
    tot_d = round(sum(r["drain_s"] for r in table), 3)
    tot_t = round(sum(r["twin_s"] for r in table), 3)
    print(
        f"| **total** | **{tot_d}** | **{tot_t}** | **{round(tot_d - tot_t, 3)}** | |"
    )

    # --- multiplex measurement (round-9 verdict item 8): the three
    # ingest-side panels share one delta-document stream; serving them
    # from ONE foreachBatch pass must beat three separate engine drains
    # with every panel row-identical.
    mux_results = {}
    for label, mux_fn, mux_panels in (
        (
            "ingest",
            SQ.multiplexed_ingest_drains,
            (
                "streaming_incremental_dedup",
                "streaming_quarantine_gate",
                "streaming_curation_gate",
            ),
        ),
        (
            "window",
            SQ.multiplexed_window_drains,
            (
                "streaming_tumbling_hourly",
                "streaming_anomaly_windows",
                "streaming_topk_trending",
            ),
        ),
    ):
        t0 = time.time()
        muxed = {k: _rows(v) for k, v in mux_fn(spark, sf_dir).items()}
        t1 = time.time()
        muxed = {k: _rows(v) for k, v in mux_fn(spark, sf_dir).items()}
        mux_s = round(min(t1 - t0, time.time() - t1), 3)
        singles_s = 0.0
        mux_match = True
        for name in mux_panels:
            s, rows = _time_min2(lambda: QUERIES[name](spark, sf_dir))
            singles_s += s
            if muxed[name] != rows:
                mux_match = False
        singles_s = round(singles_s, 3)
        print()
        print(f"| {label} panels | three single drains s | one multiplexed pass s | saved s | rows identical |")
        print("|---|---|---|---|---|")
        print(
            f"| {', '.join(p.split('_', 1)[1] for p in mux_panels)} | {singles_s} "
            f"| {mux_s} | {round(singles_s - mux_s, 3)} | "
            f"{'yes' if mux_match else 'NO'} |"
        )
        mux_results[label] = {
            "singles_s": singles_s, "mux_s": mux_s, "rows_match": mux_match,
        }
    print(json.dumps({
        "sf_dir": sf_dir, "rows": table, "multiplex": mux_results,
    }))


if __name__ == "__main__":
    main()
