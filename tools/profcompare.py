#!/usr/bin/env python3
"""Config-invariance gate: two graft.Verify dump trees (e.g. unprofiled
vs SPARK_GRAFT_PROFILE=cluster100tb) must contain IDENTICAL relations —
deployment knobs may change plans, never results. Covers every dumped
query, including the rows-only ones the DuckDB oracle can't see.

Usage: python3 tools/profcompare.py <dumpDirA> <dumpDirB>

Rows are compared after a stable all-column sort. Non-float columns
(and the exact-arithmetic relations — the PCA/k-means ladders, the
int-ratio dedup scores) compare bit-exact. Float AGGREGATE columns
compare at 1e-9 relative: a partition-width change legally reorders
double accumulation (measured max 1.5e-12 relative on the MWAS family
between local[16]@819200-seed and local[8]@8 — pure last-ulp noise,
both runs hash-matching the same DuckDB oracle), while any semantic
divergence the oracle could miss (wrong group, dropped rows, swapped
side) is orders of magnitude larger or non-float."""
import math
import sys
from pathlib import Path

import pandas as pd

REL_TOL = 1e-9


def cells_eq(x, y) -> bool:
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return math.isclose(x, y, rel_tol=REL_TOL, abs_tol=1e-300)
    return str(x) == str(y)


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
        else:
            bad = 0
            first = None
            for i in range(len(da)):
                for c in da.columns:
                    if not cells_eq(da.at[i, c], db.at[i, c]):
                        bad += 1
                        if first is None:
                            first = (i, c, da.at[i, c], db.at[i, c])
                        break
            if bad:
                fails.append(f"{q}: {bad} differing rows, first {first}")
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
