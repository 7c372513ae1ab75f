#!/usr/bin/env python3
"""Local driver-mimic: compare Verify.scala parquet dumps against DuckDB
oracle results on the same tables. Usage:
  python3 scripts/check_oracle.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    # normalize floats for comparison
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(4)
    return df

n_ok = n_bad = 0
for name in sorted(oracle):
    pq_dir = os.path.join(outdir, name)
    files = glob.glob(f"{pq_dir}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no parquet output"); n_bad += 1; continue
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"ERROR    {name}: {e}"); n_bad += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} duck={list(want.columns)}"); n_bad += 1; continue
    # align dtypes: compare as strings after rounding
    gs, ws = got.astype(str), want.astype(str)
    if gs.shape != ws.shape:
        print(f"SHAPE    {name}: spark={gs.shape} duck={ws.shape}"); n_bad += 1; continue
    if gs.equals(ws):
        print(f"OK       {name} ({len(got)} rows)"); n_ok += 1
    else:
        diff = (gs != ws).any(axis=1)
        print(f"MISMATCH {name}: {diff.sum()}/{len(gs)} rows differ")
        print("  spark:", got[diff].head(3).to_dict("records"))
        print("  duck :", want[diff].head(3).to_dict("records"))
        n_bad += 1

print(f"\n{n_ok} ok, {n_bad} bad")
sys.exit(1 if n_bad else 0)
