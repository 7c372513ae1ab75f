#!/usr/bin/env python3
"""Per-round oracle-replay cost ledger (r13 verdict stretch #8).

The 10x BUDGET_SKIPPED class was created by replay-cost growth that
sf0.1 runs never surfaced: check_oracle_timed.py times each DuckDB
replay, but the numbers were discarded after the compare. This script
folds a compare_report.json into a committed ORACLE_COST.json so a
replay-cost regression is caught at sf0.1 review time, not at the 10x
rehearsal.

  python3 scripts/oracle_cost.py <compare_report.json> <out.json> [prev.json]

Writes {query: sec} sorted by descending cost plus totals; if a prior
ledger is given, reports the biggest regressions (>2x and >5s) on
stdout so the round summary can quote them.
"""
import sys, json

report = json.load(open(sys.argv[1]))
out_path = sys.argv[2]
prev = json.load(open(sys.argv[3]))["seconds"] if len(sys.argv) > 3 else {}

secs = {name: q["sec"] for name, q in report["queries"].items()
        if isinstance(q.get("sec"), (int, float))}
ordered = dict(sorted(secs.items(), key=lambda kv: (-kv[1], kv[0])))
ledger = {
    "total_s": round(sum(secs.values()), 1),
    "n_timed": len(secs),
    "top10": dict(list(ordered.items())[:10]),
    "seconds": ordered,
}
with open(out_path, "w") as f:
    json.dump(ledger, f, indent=1)

regressions = []
for name, sec in secs.items():
    if name in prev and prev[name] > 0 and sec > 5 and sec > 2 * prev[name]:
        regressions.append((name, prev[name], sec))
for name, old, new in sorted(regressions, key=lambda r: -r[2]):
    print(f"REGRESSION {name}: {old}s -> {new}s")
print(json.dumps({"total_s": ledger["total_s"], "n_timed": ledger["n_timed"],
                  "regressions": len(regressions)}))
