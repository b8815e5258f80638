#!/usr/bin/env python3
"""Bench swing triage — make host-noise adjudication self-documenting.

Every round burns builder/judge cycles re-litigating ±40% host-noise
swings (r11 op_regression 16.67 s on an untouched 1-job plan; r12
pipeline_multimodal 5.16 s on untouched codec-bound code). This tool
codifies the adjudication that was previously done by hand:

  1. build each key's TRAILING history from the committed BENCH_r*.json
     artifacts (parsed top-20 maps + the per-query fragments preserved in
     each artifact's 2000-char `tail`) and BENCH_r*_quiet_local.json runs;
  2. flag keys in the CURRENT run that exceed --ratio x their trailing
     median (and an absolute floor, so sub-second jitter never flags);
  3. re-run each flagged key ISOLATED (SPARK_GRAFT_ONLY, same bench
     posture) --runs times and adjudicate: if the isolated median falls
     back inside --ratio x trailing median, the swing was host noise on
     the shared run; otherwise it is a real regression to investigate;
  4. emit the adjudication table (markdown to stdout, JSON to --out).

Usage:
  python3 tools/bench_triage.py --current BENCH_r13.json \
      [--history 'BENCH_r*.json'] [--ratio 2.0] [--floor 1.5] \
      [--runs 3] [--sf-dir /root/testdata/sf0.1] [--no-rerun] \
      [--out BENCH_TRIAGE.json]

`--current` accepts a driver artifact ({"tail":..,"parsed":..}), a raw
bench stdout line ({"metric":"total",..,"queries":{..}}), or a plain
{name: seconds} map (e.g. captured from the bench stderr full-map line).
`--no-rerun` skips step 3 (table shows candidates only) — useful when the
tool runs on a machine without the repo/sbt.

Keep --ratio at >= 2.0: an isolated run pays fresh-JVM/cold-cache costs a
shared full-suite run amortizes (and conversely escapes the suite's
cross-key GC pressure), so isolated-vs-trailing comparisons below ~1.5x
are inside the measurement bias and would mislabel noise as regression.
The historical swings this tool exists for (r11 op_regression 8.2x, r12
pipeline_multimodal 3.8x) are far above that floor.
"""
import argparse
import glob
import json
import os
import re
import statistics
import subprocess
import sys

PAIR_RE = re.compile(r'"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)')
# integer-valued artifact/bench metadata now matches PAIR_RE too (it accepts
# integer seconds) — exclude it all so metadata never masquerades as a query
NON_QUERY_KEYS = {"value", "r1_subset_sec", "r1_subset_n", "total_sec", "sf",
                  "n", "rc", "cpus", "failed", "n_queries", "warmup_failed"}


def pairs_from_text(text):
    """Recover {name: sec} pairs from a raw text fragment (artifact tails
    keep a window of the bench stderr full per-query map)."""
    out = {}
    for name, val in PAIR_RE.findall(text or ""):
        if name not in NON_QUERY_KEYS:
            out[name] = float(val)
    return out


def maps_from_artifact(path):
    """Yield per-query {name: sec} maps found in one bench artifact — ONE
    merged map per run entry (an artifact's `tail`, `parsed`, and `queries`
    views describe the SAME run; yielding them separately would let one run
    vote multiple times in the trailing median)."""
    with open(path) as f:
        doc = json.load(f)
    entries = doc if isinstance(doc, list) else [doc]
    for entry in entries:
        if not isinstance(entry, dict):
            continue
        merged = {}
        if isinstance(entry.get("tail"), str):
            merged.update(pairs_from_text(entry["tail"]))
        if isinstance(entry.get("queries"), dict):
            merged.update({k: float(v) for k, v in entry["queries"].items()})
        parsed = entry.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            merged.update({k: float(v) for k, v in parsed["queries"].items()})
        if not merged:
            # a plain {name: sec} map dumped from the stderr line
            merged = {k: float(v) for k, v in entry.items()
                      if isinstance(v, (int, float)) and k not in NON_QUERY_KEYS}
        if merged:
            yield merged


def load_current(path):
    maps = list(maps_from_artifact(path))
    if not maps:
        sys.exit(f"[triage] no per-query timings found in {path}")
    # a list artifact holds MULTIPLE runs (e.g. BENCH_r13_local.json's quiet
    # runs) — "current" means the LATEST one, not a blend of all of them
    return maps[-1]


def load_history(patterns, exclude):
    """name -> list of trailing observations (one per artifact map)."""
    hist = {}
    seen = set()
    for pat in patterns:
        for path in sorted(glob.glob(pat)):
            real = os.path.realpath(path)
            if real in seen or os.path.realpath(exclude) == real:
                continue
            seen.add(real)
            try:
                for m in maps_from_artifact(path):
                    for name, sec in m.items():
                        hist.setdefault(name, []).append(sec)
            except (json.JSONDecodeError, OSError) as e:
                print(f"[triage] skipping {path}: {e}", file=sys.stderr)
    return hist


def isolated_rerun(names, sf_dir, runs, cpus):
    """Re-run the flagged keys together, isolated, `runs` times; return
    name -> [sec, ...]. One sbt invocation per run (JVM-cold each time,
    like the driver's run)."""
    out = {n: [] for n in names}
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=str(cpus))
    for i in range(runs):
        proc = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        # full per-query map rides the stderr "[bench] all queries:" line;
        # sbt forks may route it to stdout — scan both
        got = {}
        for stream in (proc.stderr, proc.stdout):
            for line in stream.splitlines():
                if "[bench] all queries:" in line:
                    got.update(pairs_from_text(line))
        if not got:  # fall back to the stdout JSON top-20
            got = pairs_from_text(proc.stdout)
        hit = 0
        for n in names:
            if n in got:
                out[n].append(got[n])
                hit += 1
        print(f"[triage] isolated run {i + 1}/{runs}: {hit}/{len(names)} "
              f"keys measured", file=sys.stderr)
        if proc.returncode != 0 and hit == 0:
            print(f"[triage] sbt run failed rc={proc.returncode}; tail:\n"
                  + "\n".join(proc.stdout.splitlines()[-5:]), file=sys.stderr)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", required=True)
    ap.add_argument("--history", nargs="*",
                    default=["BENCH_r*.json"])
    ap.add_argument("--ratio", type=float, default=2.0,
                    help="flag when current > ratio * trailing median")
    ap.add_argument("--floor", type=float, default=1.5,
                    help="never flag keys whose current timing is below "
                         "this many seconds (scheduling jitter floor)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--no-rerun", action="store_true")
    ap.add_argument("--out", default="BENCH_TRIAGE.json")
    args = ap.parse_args()

    current = load_current(args.current)
    history = load_history(args.history, exclude=args.current)

    rows = []
    for name, sec in sorted(current.items()):
        obs = history.get(name, [])
        if len(obs) < 2 or sec < args.floor:
            continue
        med = statistics.median(obs)
        if med > 0 and sec > args.ratio * med:
            rows.append({"key": name, "current_sec": sec,
                         "trailing_median_sec": round(med, 2),
                         "trailing_n": len(obs),
                         "ratio": round(sec / med, 2)})
    rows.sort(key=lambda r: -r["ratio"])

    if rows and not args.no_rerun:
        iso = isolated_rerun([r["key"] for r in rows], args.sf_dir,
                             args.runs, args.cpus)
        for r in rows:
            runs = iso.get(r["key"], [])
            r["isolated_runs_sec"] = [round(v, 2) for v in runs]
            if runs:
                iso_med = statistics.median(runs)
                r["isolated_median_sec"] = round(iso_med, 2)
                noise = iso_med <= args.ratio * r["trailing_median_sec"]
                r["verdict"] = "host-noise" if noise else "REGRESSION"
            else:
                r["verdict"] = "no-isolated-measurement"
    elif rows:
        for r in rows:
            r["verdict"] = "candidate (rerun skipped)"

    result = {"current": os.path.basename(args.current),
              "ratio_threshold": args.ratio, "floor_sec": args.floor,
              "flagged": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)

    if not rows:
        print(f"No key exceeds {args.ratio}x its trailing median "
              f"(floor {args.floor}s) — nothing to adjudicate.")
        return
    print("| key | current | trailing median (n) | ratio | isolated | verdict |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        iso = "/".join(str(v) for v in r.get("isolated_runs_sec", [])) or "—"
        print(f"| {r['key']} | {r['current_sec']:.2f} s "
              f"| {r['trailing_median_sec']:.2f} s ({r['trailing_n']}) "
              f"| {r['ratio']:.2f}x | {iso} | {r['verdict']} |")


if __name__ == "__main__":
    main()
