#!/usr/bin/env python3
"""Cross-engine float-drift audit (round-8 hazard sweep).

Usage: python3 tools/driftaudit.py <sfDir> <verifyOutDir> [threshold]

For every oracled query, joins the engine parquet against the DuckDB
oracle row-by-row (both sorted the query's own ORDER BY way — we reuse
row order, which Verify preserves) and reports the max ABSOLUTE
difference per float column. selfcheck.py answers "would the gate
pass"; this answers the sharper audit question "how close are the two
engines really", so a column drifting toward whatever grid the driver's
hash normalizes to is visible BEFORE it straddles a boundary and flips
red (the etl_merge_upsert / bucketed_join failure class).

Columns whose max |diff| exceeds `threshold` (default 1e-6) are listed;
exit 1 if any. Decimal-exact columns show 0.0 by construction.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, threshold=1e-6):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    flagged = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/part-*.parquet"))
        if not files:
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        exp = con.execute(oracle[name]).fetchdf()
        if len(got) != len(exp):
            print(f"{name}: ROWCOUNT got={len(got)} exp={len(exp)}")
            flagged += 1
            continue
        # the row-aligned diff assumes both dumps share a TOTAL,
        # engine-identical order. Self-check (r9): when the non-float
        # identity tuple duplicates, that totality can't be verified from
        # the dump alone (it may still hold via float tiebreakers the
        # projection dropped — q18 does exactly that), so any drift
        # reported on such a query is annotated as possible row
        # MISALIGNMENT instead of being read as real engine divergence
        ident_cols = [c for c in got.columns if got[c].dtype.kind != "f"]
        try:
            ident_dup = bool(got[ident_cols].duplicated().any()) \
                if ident_cols else True
        except TypeError:  # unhashable cells (arrays) — stringify
            ident_dup = bool(
                got[ident_cols].astype(str).duplicated().any())
        for c in got.columns:
            if c not in exp.columns:
                continue
            g, e = got[c].reset_index(drop=True), exp[c].reset_index(drop=True)
            if not (g.dtype.kind == "f" or e.dtype.kind == "f"):
                continue
            try:
                gf = g.astype(float)
                ef = e.astype(float)
            except (TypeError, ValueError):
                continue
            diff = (gf - ef).abs()
            # NaN==NaN is agreement; one-sided NaN is a value bug the
            # selfcheck already catches — don't double-report it here
            diff = diff[~(gf.isna() & ef.isna())].dropna()
            if len(diff) == 0:
                continue
            mx = diff.max()
            if math.isfinite(mx) and mx > threshold:
                mag = max(gf.abs().max(), 1.0)
                note = (" [identity non-unique: may be row "
                        "MISALIGNMENT, not drift]" if ident_dup else "")
                print(f"{name}.{c}: max|diff|={mx:.3g} "
                      f"(mag~{mag:.3g}, rel={mx / mag:.3g}){note}")
                flagged += 1
    print("DRIFT-CLEAN" if flagged == 0
          else f"{flagged} columns above {threshold}")
    return flagged


if __name__ == "__main__":
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-6
    sys.exit(1 if main(sys.argv[1], sys.argv[2], thr) else 0)
