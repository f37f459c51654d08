"""Round-close gate: measure the closing numbers AT HEAD, atomically.

Round 11 closed with a red pytest because the "closing test count" was
measured two commits before the last functional change landed (round-11
verdict, What's wrong #2). This script removes that failure mode: it
refuses to run on a dirty worktree, records the SHA it measured, runs the
full gates, and writes everything it measured to ``CLOSING.json`` — so
the one commit that follows it is by construction docs-only.

Usage::

    python tools/round_close.py [sf_dir]          # default sf0.01

Runs, in order:

1. ``git status --porcelain`` — abort if any tracked file is dirty
   (untracked ``.scratch/`` debris is tolerated and listed).
2. Full ``pytest tests/ -q`` (~20 min).
3. Full ``tools/oracle_check.py <sf_dir>`` over the entire registry
   (~12 min at sf0.01), with the hint-log gate it carries.
4. Registry / bench-HEADLINE counts.

Writes ``CLOSING.json``::

    {"sha": ..., "measured_utc": ..., "pytest": {"passed": N, "failed":
     N, "skipped": N, "summary": "..."}, "oracle": {"ok": N, "fail": N,
     "sf_dir": ...}, "registry_queries": N, "bench_headline": N,
     "wall_s": {...}}

Exit code 0 only if pytest has zero failures AND the oracle gate is
clean. Commit ``CLOSING.json`` (plus log updates) as the round's final
commit; the recorded ``sha`` is the one the numbers belong to.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], log_path: str) -> tuple[int, str, float]:
    """Run cmd from the repo root, teeing combined output to log_path;
    return (returncode, full output, wall seconds)."""
    t0 = time.time()
    with open(log_path, "wb") as log:
        proc = subprocess.run(
            cmd, cwd=REPO, stdout=log, stderr=subprocess.STDOUT
        )
    out = open(log_path, errors="replace").read()
    return proc.returncode, out, time.time() - t0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    scratch = os.path.join(REPO, ".scratch")
    os.makedirs(scratch, exist_ok=True)

    sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
    ).stdout.strip()
    porcelain = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.splitlines()
    dirty = [l for l in porcelain if not l.startswith("??")]
    untracked = [l for l in porcelain if l.startswith("??")]
    if dirty:
        print("ABORT: worktree has uncommitted tracked changes — the "
              "closing numbers would not belong to any SHA:")
        for l in dirty:
            print(" ", l)
        return 2
    if untracked:
        print("note: untracked files ignored:", *untracked, sep="\n  ")

    print(f"round_close: measuring at {sha} (sf_dir={sf_dir})")

    # --- full pytest -------------------------------------------------
    py_log = os.path.join(scratch, "round_close_pytest.log")
    print("running full pytest (log:", py_log, ")...")
    py_rc, py_out, py_s = _run(
        [sys.executable, "-m", "pytest", "tests/", "-q"], py_log
    )
    tail = py_out.strip().splitlines()[-1] if py_out.strip() else ""
    counts = dict.fromkeys(("passed", "failed", "skipped"), 0)
    for n, kind in re.findall(r"(\d+) (passed|failed|skipped)", tail):
        counts[kind] = int(n)
    print(f"pytest: {tail} ({py_s:.0f}s)")

    # --- full oracle gate --------------------------------------------
    oc_log = os.path.join(scratch, "round_close_oracle.log")
    print("running full oracle_check (log:", oc_log, ")...")
    oc_rc, oc_out, oc_s = _run(
        [sys.executable, "tools/oracle_check.py", sf_dir], oc_log
    )
    ok = len(re.findall(r"^OK\s", oc_out, re.M))
    fails = len(re.findall(r"^FAIL\s", oc_out, re.M))
    print(f"oracle: {ok} OK / {fails} FAIL, rc={oc_rc} ({oc_s:.0f}s)")

    # --- counts ------------------------------------------------------
    sys.path.insert(0, REPO)
    from ethical_data_ingestion_spark import registry  # noqa: E402

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    closing = {
        "sha": sha,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "pytest": {**counts, "summary": tail, "returncode": py_rc},
        "oracle": {"ok": ok, "fail": fails, "returncode": oc_rc,
                   "sf_dir": sf_dir},
        "registry_queries": len(registry.QUERIES),
        "bench_headline": len(set(bench.HEADLINE)),
        "wall_s": {"pytest": round(py_s, 1), "oracle": round(oc_s, 1)},
    }
    out_path = os.path.join(REPO, "CLOSING.json")
    with open(out_path, "w") as f:
        json.dump(closing, f, indent=2)
        f.write("\n")
    print("wrote", out_path)

    green = counts["failed"] == 0 and py_rc == 0 and fails == 0 and oc_rc == 0
    print("ROUND CLOSE:", "GREEN" if green else "RED")
    return 0 if green else 1


if __name__ == "__main__":
    sys.exit(main())
