#!/usr/bin/env python3
"""Config-invariance gate: two graft.Verify dump trees (e.g. unprofiled
vs SPARK_GRAFT_PROFILE=cluster100tb) must contain IDENTICAL relations —
deployment knobs may change plans, never results. Covers every dumped
query, including the rows-only ones the DuckDB oracle can't see.

Usage: python3 tools/profcompare.py <dumpDirA> <dumpDirB>

Rows are compared after a stable all-column sort; floats cell-exact
(the engine's determinism posture: same engine + same data must be
bit-stable regardless of partitioning — sums that weren't order-free
would already have failed the driver's hash compare)."""
import sys
from pathlib import Path

import pandas as pd


def load(d: Path):
    files = sorted(d.glob("*.parquet"))
    assert files, f"no parquet under {d}"
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    cols = sorted(df.columns)
    df = df[cols]
    # stable sort on the string form of every column (mixed types, arrays)
    key = df.astype(str).apply(lambda r: "\x00".join(r), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def main():
    a, b = Path(sys.argv[1]), Path(sys.argv[2])
    qa = {p.name for p in a.iterdir() if p.is_dir()}
    qb = {p.name for p in b.iterdir() if p.is_dir()}
    common = sorted(qa & qb)
    assert common, "no common query dirs"
    only_a, only_b = sorted(qa - qb), sorted(qb - qa)
    fails = []
    for q in common:
        try:
            da, db = load(a / q), load(b / q)
        except Exception as e:
            fails.append(f"{q}: load error {e}")
            continue
        if list(da.columns) != list(db.columns):
            fails.append(f"{q}: schema {list(da.columns)} != "
                         f"{list(db.columns)}")
        elif len(da) != len(db):
            fails.append(f"{q}: rows {len(da)} != {len(db)}")
        elif not da.astype(str).equals(db.astype(str)):
            neq = (da.astype(str) != db.astype(str)).any(axis=1)
            fails.append(f"{q}: {int(neq.sum())} differing rows "
                         f"(first idx {int(neq.idxmax())})")
        else:
            print(f"{q}: IDENTICAL rows={len(da)}")
    if only_a:
        print(f"only in {a}: {only_a}")
    if only_b:
        print(f"only in {b}: {only_b}")
    if fails:
        print("\n".join(fails))
        print(f"FAILED ({len(fails)} of {len(common)})")
        sys.exit(1)
    print(f"\nALL IDENTICAL ({len(common)} queries)")


if __name__ == "__main__":
    main()
