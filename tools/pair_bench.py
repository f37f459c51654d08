"""Back-to-back Spark / DuckDB pair comparison.

Runs ``bench.py`` (Spark) and ``tools/duckdb_bench.py`` (the oracle SQL
over the same parquet) sequentially on the same box, then prints the
common-set totals, the batch-only split, and the largest per-query gaps
in both directions — the table BASELINE.md's calm-pair sections are
built from.

Usage:
    python tools/pair_bench.py [sf_dir]     # default /root/testdata/sf0.1
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)

    spark_out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=_REPO,
    )
    if spark_out.returncode != 0:
        print("bench.py failed:", spark_out.stderr[-2000:])
        return 1
    # bench.py's stdout line carries totals only; the per-query map is in
    # BENCH.json next to it
    with open(os.path.join(_REPO, "BENCH.json")) as fh:
        sp = json.load(fh)

    duck_out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "duckdb_bench.py"), sf_dir],
        capture_output=True, text=True, cwd=_REPO,
    )
    if duck_out.returncode != 0:
        print("duckdb_bench.py failed:", duck_out.stderr[-2000:])
        return 1
    du = json.loads(duck_out.stdout.strip().splitlines()[-1])

    sq, dq = sp["queries"], du["queries"]
    common = sorted(set(sq) & set(dq))
    batch = [q for q in common
             if not q.startswith(("streaming_", "continuous_"))]

    def tot(d, keys):
        return round(sum(d[k] for k in keys), 1)

    st, dt = tot(sq, common), tot(dq, common)
    sb, db = tot(sq, batch), tot(dq, batch)
    print(f"common set ({len(common)}q): spark {st}s vs duckdb {dt}s "
          f"= {st / dt:.2f}x")
    print(f"batch-only ({len(batch)}q): spark {sb}s vs duckdb {db}s "
          f"= {sb / db:.2f}x")

    gaps = sorted(common, key=lambda q: sq[q] - dq[q])
    print("\nbiggest spark wins (spark_s, duckdb_s):")
    for q in gaps[:8]:
        print(f"  {q:36s} {sq[q]:7.2f} {dq[q]:7.2f}")
    print("\nbiggest spark deficits:")
    for q in gaps[-8:][::-1]:
        print(f"  {q:36s} {sq[q]:7.2f} {dq[q]:7.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
