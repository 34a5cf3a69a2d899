#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the engine's parquet result,
run the matching oracle_sql.json SQL in DuckDB against views over the sfDir
parquet tables, sort columns by name, and compare values row-by-row with
float tolerance. Queries without oracle SQL get a rows-only check.
"""
import json, math, sys, glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
REL_TOL = 1e-6


def norm_cell(v):
    import numpy as np
    if isinstance(v, np.ndarray):
        return list(v)
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    import datetime
    if isinstance(v, (datetime.date, datetime.datetime, pd.Timestamp)):
        return str(pd.Timestamp(v))
    return v


def eq(a, b):
    a, b = norm_cell(a), norm_cell(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        return abs(fa - fb) <= REL_TOL * max(1.0, abs(fa), abs(fb))
    # timestamps/dates: compare str forms (duckdb vs pyarrow types differ)
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    dirs = sorted(glob.glob(f"{out_dir}/*/"))
    names = {d.rstrip("/").split("/")[-1] for d in dirs}
    for missing in sorted(set(oracle) - names):
        print(f"{missing}: MISSING OUTPUT (query failed in Verify?)")
        failures += 1
    for qdir in dirs:
        name = qdir.rstrip("/").split("/")[-1]
        files = glob.glob(f"{qdir}/part-*.parquet") or glob.glob(f"{qdir}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)]) \
            if files else pd.DataFrame()
        if name not in oracle:
            status = "ROWS_ONLY_OK" if len(got) > 0 else "ROWS_ONLY_EMPTY"
            if len(got) == 0:
                failures += 1
            print(f"{name}: {status} rows={len(got)}")
            continue
        exp = con.execute(oracle[name]).fetchdf()
        got2 = got[sorted(got.columns)]
        exp2 = exp[sorted(exp.columns)]
        if list(got2.columns) != list(exp2.columns):
            print(f"{name}: SCHEMA MISMATCH got={list(got2.columns)} exp={list(exp2.columns)}")
            failures += 1
            continue
        if len(got2) != len(exp2):
            print(f"{name}: ROWCOUNT MISMATCH got={len(got2)} exp={len(exp2)}")
            failures += 1
            continue
        bad = []
        gv, ev = got2.values.tolist(), exp2.values.tolist()
        for i, (gr, er) in enumerate(zip(gv, ev)):
            for j, (g, e) in enumerate(zip(gr, er)):
                if not eq(g, e):
                    bad.append((i, got2.columns[j], g, e))
        if bad:
            print(f"{name}: VALUE MISMATCH x{len(bad)}, first: row={bad[0]}")
            failures += 1
        else:
            print(f"{name}: OK rows={len(got2)}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
