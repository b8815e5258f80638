#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify output against
DuckDB executing SparkEntry.oracleSql on the same parquet tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # fail CLOSED on queries the dump itself reported as crashed: such a
    # query has no dir to compare (Verify deletes any stale one), so
    # without this the run could still print "N pass, 0 fail"
    failed_path = os.path.join(out_dir, "failed.json")
    if os.path.exists(failed_path):
        for name in json.load(open(failed_path)):
            print(f"✗ {name}: DUMP FAILED (query crashed in Verify)")
            n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        files = glob.glob(f"{path}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {str(e)[:300]}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"✗ {name}: COLUMNS spark={list(g.columns)} duckdb={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"✗ {name}: ROWS spark={len(g)} duckdb={len(w)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"✓ {name}: rows={len(g)}")
            n_pass += 1
        except AssertionError as e:
            print(f"✗ {name}: VALUES {str(e).splitlines()[-1][:300]}")
            # show first differing rows
            neq = (g != w) & ~(g.isna() & w.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print(f"    first diff row {i}:\n    spark : {g.loc[i].to_dict()}\n    duckdb: {w.loc[i].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
