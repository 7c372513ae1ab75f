#!/usr/bin/env python3
"""Rehearsal-grade oracle compare: scripts/check_oracle.py plus per-query
DuckDB wall time, a total comparison budget, and cheapest-first ordering
so a budget lapse leaves the MOST queries compared (the round-10 lesson:
FIFO ordering let two ~45-min recursive dedup replays starve 180 cheap
comparisons). Usage:
  python3 scripts/check_oracle_timed.py <sfdir> <outdir> [budget_min]
Writes <outdir>/compare_report.json: per-query status + seconds, totals.
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd

sfdir = sys.argv[1]
outdir = sys.argv[2]
budget_s = float(sys.argv[3]) * 60 if len(sys.argv) > 3 else 117 * 60

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(4)
    return df

# Cheapest first: oracle SQL length is a crude but monotone-enough proxy
# for DuckDB replay cost here (the recursive dedup/ANN chains are the
# longest texts AND the slowest replays by orders of magnitude).
names = sorted(oracle, key=lambda n: (len(oracle[n]), n))

# Resume: SKIP_OK_LOG=<prior log> marks that run's OK queries as cached
# instead of re-replaying them (used when a stale-oracle fix forces a
# partial re-run — only sound because OK rows compared engine output
# against an oracle text that has NOT changed since).
skip_ok = set()
if os.environ.get("SKIP_OK_LOG"):
    import re
    skip_ok = set(re.findall(r"^OK\s+(\S+)", open(os.environ["SKIP_OK_LOG"]).read(), re.M))

t0 = time.time()
report, n_ok, n_bad, n_skip = {}, 0, 0, 0
for name in names:
    if name in skip_ok:
        report[name] = {"status": "OK_CACHED"}
        n_ok += 1
        continue
    if time.time() - t0 > budget_s:
        report[name] = {"status": "BUDGET_SKIPPED"}
        n_skip += 1
        continue
    pq_dir = os.path.join(outdir, name)
    files = glob.glob(f"{pq_dir}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no parquet output", flush=True)
        report[name] = {"status": "MISSING"}; n_bad += 1; continue
    q0 = time.time()
    try:
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        report[name] = {"status": "ERROR", "err": str(e)[:500],
                        "sec": round(time.time() - q0, 1)}
        print(f"ERROR    {name}: {str(e)[:300]}", flush=True); n_bad += 1; continue
    sec = round(time.time() - q0, 1)
    if list(got.columns) != list(want.columns):
        report[name] = {"status": "SCHEMA", "sec": sec,
                        "spark": list(got.columns), "duck": list(want.columns)}
        print(f"SCHEMA   {name}", flush=True); n_bad += 1; continue
    gs, ws = got.astype(str), want.astype(str)
    if gs.shape != ws.shape:
        report[name] = {"status": "SHAPE", "sec": sec,
                        "spark": list(gs.shape), "duck": list(ws.shape)}
        print(f"SHAPE    {name}: spark={gs.shape} duck={ws.shape}", flush=True)
        n_bad += 1; continue
    if gs.equals(ws):
        report[name] = {"status": "OK", "rows": len(got), "sec": sec}
        print(f"OK       {name} ({len(got)} rows, {sec}s)", flush=True); n_ok += 1
    else:
        diff = (gs != ws).any(axis=1)
        report[name] = {"status": "MISMATCH", "sec": sec,
                        "n_diff": int(diff.sum()), "n": len(gs),
                        "spark_head": got[diff].head(3).to_dict("records"),
                        "duck_head": want[diff].head(3).to_dict("records")}
        print(f"MISMATCH {name}: {diff.sum()}/{len(gs)} rows differ", flush=True)
        n_bad += 1

n_cached = sum(1 for v in report.values() if v.get("status") == "OK_CACHED")
summary = {"ok": n_ok, "ok_replayed": n_ok - n_cached, "ok_cached": n_cached,
           "bad": n_bad, "budget_skipped": n_skip,
           "total": len(names), "wall_s": round(time.time() - t0, 1)}
with open(f"{outdir}/compare_report.json", "w") as f:
    json.dump({"summary": summary, "queries": report}, f, indent=1, default=str)
print(json.dumps(summary), flush=True)
# Exit codes (r11 ADVICE: a budget-lapsed or cache-heavy run must not
# read as fully green to scripted callers):
#   0 = every query REPLAYED and OK this run
#   1 = at least one MISMATCH/SCHEMA/SHAPE/ERROR/MISSING
#   2 = no failures, but some queries were BUDGET_SKIPPED
#   3 = no failures or skips, but some OKs were carried from a prior
#       log (OK_CACHED) rather than replayed here
sys.exit(1 if n_bad else (2 if n_skip else (3 if n_cached else 0)))
