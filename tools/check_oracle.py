#!/usr/bin/env python3
"""Driver-mimic correctness check: compare Verify's parquet dumps against
DuckDB running SparkEntry.oracleSql on the same test tables.

Usage: python3 tools/check_oracle.py [sf_dir] [verify_out_dir] [name_filter]
(Run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first.)
"""
import sys, os, json, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    # normalize values for comparison: tz-aware ts -> naive, floats exact
    if hasattr(v, "tzinfo") and v.tzinfo is not None:
        return v.replace(tzinfo=None)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))

fails, okays = [], []
for name, sql in sorted(oracle.items()):
    if FILT and FILT not in name:
        continue
    pq = f"{OUT}/{name}"
    if not os.path.isdir(pq):
        fails.append((name, "NO SPARK OUTPUT"))
        continue
    try:
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        exp = con.execute(sql)
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
    except Exception as e:
        fails.append((name, f"ERROR: {e}"))
        continue
    gc, gr = canon(grows, gcols)
    ec, er = canon(erows, ecols)
    if gc != ec:
        fails.append((name, f"SCHEMA: spark={gc} oracle={ec}"))
    elif len(gr) != len(er):
        fails.append((name, f"ROWCOUNT: spark={len(gr)} oracle={len(er)}"))
    elif gr != er:
        diffs = [(a, b) for a, b in zip(gr, er) if a != b]
        fails.append((name, f"VALUES: {len(diffs)}/{len(gr)} rows differ; first: spark={diffs[0][0]} oracle={diffs[0][1]} cols={gc}"))
    else:
        okays.append((name, len(gr)))

for n, c in okays:
    print(f"  OK   {n} ({c} rows)")
for n, msg in fails:
    print(f"  FAIL {n}: {msg[:500]}")
print(f"\n{len(okays)} ok, {len(fails)} fail")
sys.exit(1 if fails else 0)
