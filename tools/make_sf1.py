"""Derive an sf1-scale dataset (10x sf0.1) for the scaling spot-gate.

The driver ships sf0.001/0.01/0.1 only; the round-6 verdict (item 5)
asks for wall-time scaling evidence on the heaviest queries at ~6M
lineitem rows. This tool derives sf1 deterministically from the shipped
sf0.1 parquet by 10x replication with DISJOINT shifts, so row counts,
key cardinalities, and per-key densities all scale 10x while join/agg
semantics stay the shape the sf0.1 plans see:

* fact/dim keys: replica i shifts every key by ``i * 10_000_000``
  (far above any sf0.1 key), so the trade graph / co-purchase graph
  becomes 10 disjoint copies — output metrics scale linearly and a
  superlinear wall-time can only come from the ENGINE, which is what
  the gate measures.
* documents.text: replica i Caesar-rotates a-z by i and 0-9 by i
  (two independent cycles — the fixture text is lowercase
  alphanumeric, so this covers the whole token alphabet), making
  replica vocabularies (and therefore shingle/fingerprint spaces)
  disjoint —
  near-dup pair density per document stays constant instead of every
  doc gaining 9 cross-replica twins (which would quadratically inflate
  the OUTPUT, not the engine work under test). Lengths, frequencies,
  and Zipf shape are preserved.
* embeddings: replica i rotates the 64-dim vector by i positions —
  norms and within-replica geometry preserved.
* region/nation/events: copied verbatim (dimension tables don't scale
  with sf in TPC-H either; events is not in the heavy set).

Usage: python tools/make_sf1.py [out_dir]   (default /root/repo/.scratch/sf1)
"""

from __future__ import annotations

import shutil
import string
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from ethical_data_ingestion_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
PAD = 10_000_000
REPLICAS = 10

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
}
# nation keys stay valid dimension references: don't shift them
NO_SHIFT = {"c_nationkey", "s_nationkey"}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1"
    spark = get_spark("make_sf1")
    alpha = string.ascii_lowercase

    for name, keys in KEY_COLS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(REPLICAS):
            p = df
            for k in keys:
                if k not in NO_SHIFT:
                    p = p.withColumn(k, F.col(k) + F.lit(i * PAD))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{REPLICAS}")

    digits = string.digits
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(REPLICAS):
        # rotate letters and digits as independent cycles so every
        # alphanumeric token is remapped (uppercase/punctuation don't
        # occur in the fixture text; anything unmapped passes through)
        src_al = alpha + digits
        dst_al = (alpha[i:] + alpha[:i]) + (digits[i:] + digits[:i])
        parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * PAD))
            .withColumn("text", F.translate("text", src_al, dst_al))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    print("documents: x10 caesar-shifted")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for i in range(REPLICAS):
        roll = (
            F.col("embedding")
            if i == 0
            else F.concat(
                F.slice("embedding", i + 1, 64 - i), F.slice("embedding", 1, i)
            )
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * PAD)).alias("vec_id"),
                roll.alias("embedding"),
                "label",
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    print("embeddings: x10 rolled")

    for name in ["region", "nation", "events"]:
        shutil.copy(f"{SRC}/{name}.parquet", f"{out}/{name}.parquet")
        print(f"{name}: copied")


if __name__ == "__main__":
    main()
