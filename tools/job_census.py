"""Per-query Spark JOB-COUNT census over the HEADLINE suite (r12 verdict
item 3): run each query once (suite order, same block/artifact discipline
as bench.py's first pass), tag it with a job group, and record how many
Spark jobs it issued plus its wall time. Sub-second queries issuing >1
job are the fold candidates (the LPA single-plan pattern).

Usage: python .scratch/job_census.py [--sf /root/testdata/sf0.1]
Writes .scratch/job_census.json: {name: {"s": wall, "jobs": n}}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import warnings

warnings.filterwarnings("ignore")
os.environ["PYTHONWARNINGS"] = "ignore"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ethical_data_ingestion_spark.registry import QUERIES  # noqa: E402
from ethical_data_ingestion_spark.session import get_spark  # noqa: E402
from ethical_data_ingestion_spark.io import preresolve_tables  # noqa: E402
from ethical_data_ingestion_spark.materialize import transient_release  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import bench

    spark = get_spark("census", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    preresolve_tables(spark, args.sf)
    sc = spark.sparkContext
    st = sc.statusTracker()

    out: dict[str, dict] = {}
    # one warm pass per query to build shared artifacts, then the measured
    # tagged pass — so job counts reflect steady state (shared() hits),
    # matching the bench's recorded (min-over-fresh-runs) regime.
    for name in bench.HEADLINE:
        fn = QUERIES[name]
        try:
            fn(spark, args.sf).collect()
            transient_release(spark)
            group = f"census:{name}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            fn(spark, args.sf).collect()
            wall = round(time.time() - t0, 3)
            sc.setJobGroup(None, None)
            jobs = len(st.getJobIdsForGroup(group))
            transient_release(spark)
            out[name] = {"s": wall, "jobs": jobs}
            print(f"{name}: {wall:.2f}s jobs={jobs}", flush=True)
        except Exception as e:  # noqa: BLE001
            out[name] = {"err": str(e)[:200]}
            print(f"{name}: ERR {e}", flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "job_census.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    multi = {k: v for k, v in out.items() if v.get("jobs", 0) > 1}
    print(f"\n{len(multi)} queries with >1 job:")
    for k, v in sorted(multi.items(), key=lambda kv: -kv[1]["jobs"]):
        print(f"  jobs={v['jobs']:3d} {v['s']:6.2f}s  {k}")


if __name__ == "__main__":
    main()
