#!/usr/bin/env python3
"""Quiet-host bench runs WITH per-key maps committed (VERDICT r15 item 1).

The driver's BENCH_r{N}.json keeps only the top-20 slowest keys inside its
tail window, and earlier BENCH_r{N}_local.json quiet runs recorded totals
only — so driver-window outliers could only be adjudicated against
SCALE.md memory. This tool runs the full suite quietly N times and writes
one JSON artifact whose every entry carries the FULL per-query map (the
"[bench] all queries:" stderr line), so bench_triage.py's trailing history
and any per-key adjudication can read a same-tree, same-posture artifact.

Usage:
  python3 tools/quiet_bench.py --runs 3 --out BENCH_r16_local.json \
      [--sf-dir /root/testdata/sf0.1] [--cpus 32] [--append]

--append merges new runs onto an existing artifact (a list), so early-round
and end-of-round readings accumulate in one file.
"""
import argparse
import json
import os
import re
import subprocess
import sys

PAIR_RE = re.compile(r'"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)')


def run_once(sf_dir, cpus):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    env.pop("SPARK_GRAFT_ONLY", None)
    proc = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    full_map, head = {}, None
    for stream in (proc.stderr, proc.stdout):
        for line in stream.splitlines():
            if "[bench] all queries:" in line:
                full_map = {k: float(v) for k, v in PAIR_RE.findall(line)}
            elif line.startswith('{"metric"'):
                try:
                    head = json.loads(line)
                except json.JSONDecodeError:
                    pass
    if head is None:
        print("[quiet_bench] no JSON head line; sbt tail:\n"
              + "\n".join((proc.stdout or "").splitlines()[-5:]), file=sys.stderr)
        return None
    return {
        "total_sec": head.get("total_sec", head.get("value")),
        "n_queries": head.get("n_queries"),
        "failed": head.get("failed"),
        "r1_subset_sec": head.get("r1_subset_sec"),
        "sf": head.get("sf"),
        "queries": full_map or head.get("queries", {}),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--append", action="store_true")
    args = ap.parse_args()

    entries = []
    if args.append and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        entries = prev if isinstance(prev, list) else [prev]

    for i in range(args.runs):
        r = run_once(args.sf_dir, args.cpus)
        if r is None:
            continue
        entries.append(r)
        print(f"[quiet_bench] run {i + 1}/{args.runs}: total={r['total_sec']} "
              f"failed={r['failed']} keys={len(r['queries'])}", file=sys.stderr)
        with open(args.out, "w") as f:
            json.dump(entries, f)
    totals = [e["total_sec"] for e in entries if e.get("total_sec")]
    print(json.dumps({"runs": len(entries), "totals": totals}))


if __name__ == "__main__":
    main()
