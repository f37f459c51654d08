"""Heavy-query wall-time scaling gate: sf0.1 vs derived sf1 (10x rows).

Round-6 verdict item 5: the 100-TB scale story is argued from plan
shapes — prove it with measurements. Runs the heaviest queries at both
scales in ONE session (artifacts shared within each sf as in a real
suite run), reports warm (min of N_RUNS after a discarded first touch
per sf) wall times and the sf1/sf0.1 ratio. A plan that survives scale
shows ~<=10x growth on 10x data (linear work, log-depth exchanges);
flat-floor queries (kcenter's argmax rounds) show ~1x — that's the
invariance claim, also worth recording.

Usage: python tools/sf_scaling_bench.py [sf1_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from ethical_data_ingestion_spark import registry  # noqa: E402
from ethical_data_ingestion_spark.session import get_spark  # noqa: E402

HEAVY = [
    "copurchase_triangle_stats",
    "pagerank_trade_graph",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "minhash_recall_stats",
    "dedup_threshold_sweep",
    "winnowing_overlap_pairs",
    "ngram_span_overlap",
    "dedup_tier_attribution",
    "dedup_tier_attribution_sampled",
    "incremental_dedup_stats",
    "survivor_selection_stats",
    "survivor_selection_stats_sampled",
    "split_leakage_tier_audit_sampled",
    "neardup_clusters",
    "neardup_clusters_sampled",
    "kcenter_coreset_stats",
    "bpe_training_rounds",
    # round-7 panels (round-7 verdict item 3): suffix_doubling_profile is
    # the largest unadjudicated non-streaming deficit (3.9x vs DuckDB at
    # sf0.1 — expected to amortize: its cost is log-round plan depth, not
    # data volume); the rest joined the suite after the round-6 sweep ran
    "suffix_doubling_profile",
    "suffix_array_global_profile",
    "suffix_lcp_histogram",
    "knn_cosine_nsw",
    "incremental_ann_stats",
    "multimodal_cdc_stats",
    "source_divergence_matrix",
    "minhash_band_sweep",
    "rag_retrieval_quality",
    # round-8 late panels
    "suffix_cross_doc_spans",
    "substring_dedup_removal_stats",
    "substring_dedup_removal_sampled",
    "sorted_neighborhood_stats",
    "label_propagation_communities",
    "community_modularity_stats",
    "multimodal_phash_neardup",
    "streaming_knn_serving",
    # round-9 panels
    "substring_dedup_emit",
    "bpe_encode_stats",
    "chunk_embed_topk_ann",
    "mmr_diversified_topk_ann",
    "lpa_semisync_communities",
    "training_shard_manifest_bpe",
    "packing_strategy_stats",
    "packing_bpe_stats",
    "neardup_emit",
    "corpus_curation_emit",
    # round-10 panels
    "hybrid_retrieval_topk",
    "incremental_curation_delta",
]

N_RUNS = 2


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    # The 41-query x 2-scale session accumulates every family's pinned
    # artifact (SA ranks, LCP pairs, tiered clusters, LSH/pHash tables)
    # for BOTH scale factors; the 8g default heap OOM'd the JVM mid-sf1
    # leg in round 9. The sweep is the one tool that needs a bigger
    # driver, so size it here rather than globally.
    import os
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        "sf_scaling", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    out: dict[str, dict] = {}
    for sf_name, sf_dir in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)]:
        for name in HEAVY:
            fn = registry.QUERIES[name]
            try:
                fn(spark, sf_dir).collect()  # first touch: builds shared artifacts
                best = float("inf")
                rows = 0
                for _ in range(N_RUNS):
                    t = time.time()
                    rows = len(fn(spark, sf_dir).collect())
                    best = min(best, time.time() - t)
            except Exception as exc:  # keep sweeping; ratio pass guards the gap
                out.setdefault(name, {})[f"err_{sf_name}"] = str(exc)[:200]
                print(f"{sf_name} {name}: ERROR {exc}", file=sys.stderr)
                continue
            out.setdefault(name, {})[sf_name] = round(best, 2)
            out[name][f"rows_{sf_name}"] = rows
            print(f"{sf_name} {name}: {best:.2f}s rows={rows}", file=sys.stderr)
    for name, d in out.items():
        # guard both ends: a sub-5ms query rounds to 0.0 (ratio
        # undefined) and a query that errored mid-sweep leaves a
        # partial dict with one sf missing
        lo, hi = d.get("sf0.1"), d.get("sf1")
        d["ratio"] = round(hi / lo, 2) if lo and hi is not None else None
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
