#!/usr/bin/env python3
"""Audit oracle output dtypes against the Spark parquet dumps.

tools/check.py compares VALUES only; the driver's hash is TYPED. The
one class the driver rejects that check.py passes is DECIMAL: DuckDB
promotes sum(INTEGER/BIGINT) to HUGEINT, which Arrow surfaces as
decimal128 while Spark emits int64 (the round-11 q_domain_stats red).
Run this after adding oracles: any DECIMAL line is a future driver
failure — CAST the aggregate. Int-width (int32 vs int64) and
int-vs-string rows are long-green at the driver and reported only for
completeness.

Usage: python3 tools/dtype_audit.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

sf, out = sys.argv[1], sys.argv[2]
oracles = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")


def norm(t):
    s = str(t)
    if s.startswith("decimal128"):
        return "DECIMAL"
    return s.replace("large_", "")


decimal_leaks = 0
for q, sql in sorted(oracles.items()):
    d = f"{out}/{q}"
    if not os.path.isdir(d):
        print("no spark output:", q)
        continue
    try:
        osch = con.sql(sql).arrow().schema
    except Exception as e:  # noqa: BLE001 - report and continue
        print("oracle err", q, str(e)[:100])
        continue
    od = {f.name: norm(f.type) for f in osch}
    sd = {f.name: norm(f.type) for f in pq.read_table(d).schema}
    if set(od) != set(sd):
        print("COLS", q, sorted(od), sorted(sd))
        continue
    for c in od:
        if od[c] != sd[c]:
            sev = "DECIMAL-LEAK" if "DECIMAL" in (od[c], sd[c]) else "info"
            if sev == "DECIMAL-LEAK":
                decimal_leaks += 1
            print(sev, q, c, "oracle:", od[c], "spark:", sd[c])
print(f"== {decimal_leaks} decimal leaks over {len(oracles)} oracles ==")
sys.exit(1 if decimal_leaks else 0)
