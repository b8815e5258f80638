#!/usr/bin/env python3
"""Copy an SF fixture directory with each table re-written as SEVERAL
parquet row groups, content-identical (same rows, same order, same
schema) — the scaling-sweep companion VERDICT r19 item 2 asks for.

Every sf0.1 driver fixture table is ONE parquet row group, so every scan
(and map-side partial aggregate) runs as ONE task regardless of core
count: low-vs-high-core ratios read <= 1 by construction and the scaling
contract is unmeasurable at that SF. The driver data itself is read-only
(TESTDATA.md), so this tool builds a derived copy under --out with row
groups capped at --rows-per-group, and the sweep runs the bench against
the copy via $SPARK_GRAFT_SF_DIR.

Usage:
  python3 tools/split_rowgroups.py --sf-dir /root/testdata/sf0.1 \
      --out /tmp/sf0.1_rg --rows-per-group 80000
"""
import argparse
import os

import pyarrow.parquet as pq


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows-per-group", type=int, default=80000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in sorted(os.listdir(args.sf_dir)):
        if not name.endswith(".parquet"):
            continue
        src = os.path.join(args.sf_dir, name)
        dst = os.path.join(args.out, name)
        t = pq.read_table(src)
        pq.write_table(t, dst, row_group_size=args.rows_per_group,
                       compression="snappy")
        meta = pq.ParquetFile(dst).metadata
        print(f"{name}: rows={meta.num_rows} row_groups={meta.num_row_groups}")


if __name__ == "__main__":
    main()
