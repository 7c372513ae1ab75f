#!/usr/bin/env python3
"""Build a schema-preserving Nx rehearsal corpus from an existing SF dir
by id-offset replication (the round-10 recipe, now committed so the
rehearsal is reproducible).

  python3 scripts/make_rehearsal.py <src_sf_dir> <dst_dir> <factor>

Fact-ish tables (part, orders, lineitem, events, documents, embeddings)
are unioned `factor` times with every table-local id column shifted by
copy_index * OFFSET; cross-table foreign keys into REPLICATED tables
(l_orderkey -> orders, l_partkey -> part) shift with their parents,
while keys into UNREPLICATED dimensions (o_custkey, l_suppkey, user_id,
c_nationkey, ...) stay put — referential integrity holds and the dims
get factor-times hotter, which is exactly the skew direction a scale
rehearsal should stress. Non-key columns are copied verbatim, so every
document / vector / event payload becomes an exact factor-way duplicate:
deliberate pressure on the dedup semantics and hot-bucket guards.

OFFSET = 10,000,000 is divisible by every FIXED small modulus the
engine keys behavior on (vec_id % 10 = 7 delta split, % 100 probe
panels), so each replica lands in the same delta/probe class as its
original and the gate decisions replay at scale instead of shifting.
CAVEAT (r11 ADVICE): the DYNAMIC panel modulus max(10, n/500) is NOT
covered by this guarantee for arbitrary factors — e.g. factor 6 over a
5,000-doc corpus gives pm = 60 and 10M % 60 = 40, so replicas land in
a different probe class than their originals. Engine/oracle comparison
stays exact regardless (both derive the same pm from the same count);
only the replica-panel-alignment property weakens. It holds whenever
(factor * n_docs / 500) divides 10M — true for the committed 4× and
10× recipes over the sf0.1 corpus (pm 10 and 100).
"""
import sys, os
import duckdb

src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
OFFSET = 10_000_000
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()

VERBATIM = ["region", "nation", "customer", "supplier"]
# table -> columns shifted by copy_index * OFFSET
SHIFTED = {
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_partkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

for t in VERBATIM:
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
        f"TO '{dst}/{t}.parquet' (FORMAT parquet)"
    )
    print(t, "verbatim")

for t, keys in SHIFTED.items():
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()
    ]
    parts = []
    for i in range(factor):
        sel = ", ".join(
            f"({c} + {i * OFFSET})::BIGINT AS {c}" if c in keys else c
            for c in cols
        )
        parts.append(f"SELECT {sel} FROM read_parquet('{src}/{t}.parquet')")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{t}.parquet' (FORMAT parquet)"
    )
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(t, n)
print("done:", dst, f"factor={factor}")
