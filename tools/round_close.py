#!/usr/bin/env python3
"""One-command round-close evidence sweep (VERDICT r16 item 6).

Rounds 15/16 established three closing artifacts, each previously run by
hand (and therefore skippable): the quiet full-suite benches with FULL
per-key maps (tools/quiet_bench.py), the driver-window outlier triage
(tools/bench_triage.py), and the partition-order independence re-pin
(full graft.Verify at SPARK_GRAFT_CPUS=5 vs the DuckDB oracle). This
tool runs all three in sequence so a round cannot close without them.

Usage:
  python3 tools/round_close.py --round 17 \
      [--quiet-runs 3] [--sf-dir /root/testdata/sf0.1] \
      [--skip-triage] [--skip-cpus5] [--skip-quiet]

Outputs (all repo-root, committed by the caller):
  BENCH_r{N}_local.json   — quiet runs appended (full per-key maps)
  BENCH_TRIAGE.json       — outlier adjudication vs BENCH_r{N}.json,
                            skipped quietly when that artifact is absent
                            (driver hasn't run yet this round)
  stdout                  — one JSON summary line with every gate's result

Sequencing matters: nothing here may run concurrently with another sbt
process (shared target/ corrupts measurements — the r16 lesson), so the
steps run strictly one after another in this process.
"""
import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env=None, timeout=7200):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, capture_output=True, text=True, env=e,
                          cwd=REPO, timeout=timeout)


def quiet_benches(n_runs, sf_dir, rnd):
    out = os.path.join(REPO, f"BENCH_r{rnd}_local.json")
    p = run([sys.executable, os.path.join(REPO, "tools", "quiet_bench.py"),
             "--runs", str(n_runs), "--out", out, "--append",
             "--sf-dir", sf_dir])
    try:
        summary = json.loads(p.stdout.strip().splitlines()[-1])
    except (json.JSONDecodeError, IndexError):
        summary = {"error": (p.stderr or "")[-500:]}
    summary["artifact"] = os.path.basename(out)
    return summary


def triage(rnd, sf_dir):
    current = os.path.join(REPO, f"BENCH_r{rnd}.json")
    if not os.path.exists(current):
        return {"skipped": f"no BENCH_r{rnd}.json yet (driver has not run)"}
    out = os.path.join(REPO, "BENCH_TRIAGE.json")
    p = run([sys.executable, os.path.join(REPO, "tools", "bench_triage.py"),
             "--current", current, "--sf-dir", sf_dir, "--out", out])
    try:
        with open(out) as f:
            t = json.load(f)
        flagged = t.get("flagged", t if isinstance(t, list) else [])
        return {"artifact": "BENCH_TRIAGE.json",
                "n_flagged": len(flagged) if isinstance(flagged, list) else None}
    except (OSError, json.JSONDecodeError):
        return {"error": (p.stderr or p.stdout or "")[-500:]}


def cpus5_verify(sf_dir_verify):
    import shutil
    outdir = "/tmp/round_close_verify"
    # a stale outdir from a prior round would let a now-crashing key
    # re-pass on its old output — always start clean
    shutil.rmtree(outdir, ignore_errors=True)
    p = run(["sbt", "-batch", f"runMain graft.Verify {sf_dir_verify} {outdir}"],
            env={"SPARK_GRAFT_CPUS": "5"})
    if p.returncode != 0:
        return {"error": (p.stderr or "")[-500:]}
    # Verify catches per-query exceptions and exits 0; a crashed key
    # writes NO output dir, so check.py (which walks existing dirs) would
    # count it neither pass nor fail — scrape the failure lines so a
    # crashing key can never read green
    crashed = sorted(set(re.findall(r"\[verify\] (\w+) failed:",
                                    (p.stdout or "") + (p.stderr or ""))))
    c = run([sys.executable, os.path.join(REPO, "tools", "check.py"),
             sf_dir_verify, outdir])
    m = re.search(r"(\d+) pass, (\d+) fail", c.stdout or "")
    if not m:
        return {"error": (c.stderr or c.stdout or "")[-500:], "crashed": crashed}
    return {"pass": int(m.group(1)), "fail": int(m.group(2)) + len(crashed),
            "crashed": crashed}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--quiet-runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--sf-dir-verify", default="/root/testdata/sf0.01")
    ap.add_argument("--skip-triage", action="store_true")
    ap.add_argument("--skip-cpus5", action="store_true")
    ap.add_argument("--skip-quiet", action="store_true")
    args = ap.parse_args()

    summary = {"round": args.round}
    # CPUS=5 verify FIRST: it is the cheapest gate and a correctness
    # failure should stop the (long) quiet benches from burning an hour
    if not args.skip_cpus5:
        print("[round_close] CPUS=5 partition-order verify ...", file=sys.stderr)
        summary["cpus5_verify"] = cpus5_verify(args.sf_dir_verify)
        # abort-on-ANY-failure means the gate must fail CLOSED: an error
        # dict (no "fail" key) is a failure, not a pass-through
        if summary["cpus5_verify"].get("fail") != 0:
            print(json.dumps(summary))
            sys.exit(1)
    if not args.skip_quiet:
        print(f"[round_close] {args.quiet_runs} quiet full-suite benches ...",
              file=sys.stderr)
        summary["quiet"] = quiet_benches(args.quiet_runs, args.sf_dir, args.round)
    if not args.skip_triage:
        print("[round_close] driver-outlier triage ...", file=sys.stderr)
        summary["triage"] = triage(args.round, args.sf_dir)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
