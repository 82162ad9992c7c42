#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate: read each query's
parquet dump from Verify, run its oracle SQL in DuckDB over the same sf dir,
sort columns by name and rows by all columns, and compare values.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import glob
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return norm(v.item())
    return v


def rows_of(table):
    cols = sorted(table.column_names)
    data = table.select(cols).to_pylist()
    rows = [tuple(norm(r[c]) for c in cols) for r in data]
    return sorted(rows, key=repr), cols


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pq.read_table(files[0])
            want = con.sql(oracle[name]).arrow()
            grows, gcols = rows_of(got)
            wrows, wcols = rows_of(want)
            if gcols != wcols:
                print(f"FAIL {name}: columns {gcols} vs {wcols}")
                n_fail += 1
            elif grows != wrows:
                diff = [(a, b) for a, b in zip(grows, wrows) if a != b]
                print(f"FAIL {name}: {len(grows)} vs {len(wrows)} rows; "
                      f"first diff: {diff[0] if diff else (grows[-1], wrows[-1] if wrows else None)}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(grows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
