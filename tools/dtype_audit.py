#!/usr/bin/env python3
"""Oracle type-hazard audit: the driver's hasher materializes both the Spark
parquet dump and the DuckDB oracle result through pandas, so a top-level
column whose *pandas dtype* differs between the two sides (DuckDB HUGEINT ->
float64 vs Spark int64, DECIMAL -> object, etc.) hash-mismatches even when
every value is equal.  This tool runs each oracle in DuckDB and reads the
matching Verify parquet dump, both via .df(), and flags dtype mismatches.

Usage: python3 tools/dtype_audit.py [sf_dir] [verify_out_dir] [name_filter]
(Run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first.)
"""
import sys, os, json
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
FILT = sys.argv[3] if len(sys.argv) > 3 else ""

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def dtypes(df):
    return {c: str(df[c].dtype) for c in df.columns}


# dtype pairs that hash identically in practice (the driver stringifies
# values, so e.g. int32 vs int64 agree; float32 vs float64 can round-differ
# and ARE flagged).
COMPATIBLE = [
    {"int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64",
     "Int8", "Int16", "Int32", "Int64"},
    {"object", "string"},
    {"bool", "boolean"},
]


def compat(a, b):
    if a == b:
        return True
    return any(a in s and b in s for s in COMPATIBLE)


flags, okays, skips = [], 0, []
for name, sql in sorted(oracle.items()):
    if FILT and FILT not in name:
        continue
    pq = f"{OUT}/{name}"
    if not os.path.isdir(pq):
        skips.append(name)
        continue
    try:
        sdt = dtypes(con.execute(f"SELECT * FROM '{pq}/*.parquet'").df())
        odt = dtypes(con.execute(sql).df())
    except Exception as e:
        flags.append((name, f"ERROR: {e}"))
        continue
    if set(sdt) != set(odt):
        flags.append((name, f"COLUMNS: spark={sorted(sdt)} oracle={sorted(odt)}"))
        continue
    bad = {c: (sdt[c], odt[c]) for c in sdt if not compat(sdt[c], odt[c])}
    if bad:
        flags.append((name, f"DTYPE spark-vs-oracle: {bad}"))
    else:
        okays += 1

print(f"{okays} clean, {len(flags)} flagged, {len(skips)} no-spark-output")
for n, msg in flags:
    print(f"  FLAG {n}: {msg[:400]}")
for n in skips:
    print(f"  SKIP {n} (no Verify dump)")
sys.exit(1 if flags else 0)
