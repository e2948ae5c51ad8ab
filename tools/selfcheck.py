#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the
library). Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each dumped query, replays the oracle SQL in DuckDB against the same
parquet tables and compares row count, column names, and a hash of the
value matrix with columns sorted by name and rows sorted canonically.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
"""
import sys, json, glob, os, hashlib
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # canonical row order: sort by all columns as strings
    df = df.astype(str)
    rows = sorted(map(tuple, df.values.tolist()))
    return rows

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    pq = glob.glob(f"{out}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output");  fails += 1;  continue
    try:
        wa = con.execute(sql).arrow()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}");  fails += 1;  continue
    ga = con.execute(f"SELECT * FROM '{pq[0]}'").arrow()
    want, got = wa.to_pandas(), ga.to_pandas()
    if sorted(got.columns) != sorted(want.columns):
        print(f"FAIL {name}: cols got={sorted(got.columns)} want={sorted(want.columns)}")
        fails += 1;  continue
    # dtype compare (arrow-level, from the same single execution): a
    # strict comparator would flag e.g. int32 vs int64 even when values
    # agree
    tmis = [(f.name, str(f.type), str(wa.schema.field(f.name).type))
            for f in ga.schema
            if str(f.type) != str(wa.schema.field(f.name).type)]
    if tmis:
        print(f"WARN {name}: dtype mismatch {tmis}")
    if len(got) != len(want):
        print(f"FAIL {name}: rows got={len(got)} want={len(want)}");  fails += 1;  continue
    # driver-fidelity probe: the DRIVER's comparator sort_values-es the
    # RAW pandas frame (no astype(str)), which throws on array-typed
    # cells ("unhashable type: numpy.ndarray") — r10 shipped two typed-
    # array registry columns that were green here and red there. Fail
    # locally on anything the driver cannot sort.
    try:
        got.sort_values(by=sorted(got.columns))
    except Exception as e:
        print(f"FAIL {name}: driver-unsortable output ({type(e).__name__}: {e})")
        fails += 1;  continue
    cg, cw = canon(got), canon(want)
    if cg != cw:
        bad = [i for i, (a, b) in enumerate(zip(cg, cw)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at canon rows {bad}")
        for i in bad[:2]:
            print(f"   got : {cg[i]}\n   want: {cw[i]}")
        fails += 1;  continue
    h = hashlib.md5(str(cg).encode()).hexdigest()[:8]
    print(f"OK   {name}: {len(got)} rows  hash={h}")

print(f"\n{len(oracle) - fails}/{len(oracle)} oracle-checked queries pass")
sys.exit(1 if fails else 0)
