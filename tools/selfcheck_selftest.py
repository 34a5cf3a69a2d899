#!/usr/bin/env python3
"""Mutation self-test for the correctness gate (r9).

selfcheck.py is the thing standing between a silent wrong answer and
the driver's hash verdict — so prove it still BITES. This script copies
a real Verify dump, plants three independent defects, and requires the
gate to catch every one (and to still pass the untouched control copy):

  1. strict-column 1e-12 drift  (etl_csv_roundtrip.total, ROUNDED_COLS)
       -> must be a VALUE MISMATCH: ~4500 ulp, far above the 8-ulp
          conversion-noise band the strict compare allows, yet 10^6
          BELOW REL_TOL -- only the strict path can catch it. This is
          the straddle class (the r7 red row) in miniature; a first
          draft of this test flipped 1 ulp and learned the band is
          deliberate (Spark BigDecimal vs DuckDB 10^n rounding differ
          by a few ulps on the SAME grid point).
  2. loose-column visible drift (q23_welch.t, +1e-3 relative)
       -> must be a VALUE MISMATCH under REL_TOL.
  3. dropped last row           (q9_distinct_agg)
       -> must be a ROWCOUNT MISMATCH.

Usage: python3 tools/selfcheck_selftest.py <sf_dir> <verify_out_dir>
Exit 0 iff all four verdicts (3 catches + 1 clean control) hold.
"""
import glob
import math
import shutil
import subprocess
import sys
import tempfile
import os

import pyarrow.parquet as pq
import pyarrow as pa


def run_gate(sf_dir, out_dir):
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "selfcheck.py"), sf_dir, out_dir],
        capture_output=True, text=True)
    return r.stdout


def mutate(out_dir, query, fn):
    """Apply fn(table) -> table to the query's single part file."""
    [f] = sorted(glob.glob(f"{out_dir}/{query}/part-*.parquet"))
    t = pq.read_table(f)
    pq.write_table(fn(t), f)


def drift(t, col, rel):
    v = t[col].to_pylist()
    i = next(i for i, x in enumerate(v) if x is not None and x != 0.0)
    v[i] = v[i] * (1 + rel)
    return t.set_column(t.schema.get_field_index(col), col,
                        pa.array(v, type=t.schema.field(col).type))


def main(sf_dir, src):
    ok = True

    def check(tag, out, want, query):
        nonlocal ok
        line = next((l for l in out.splitlines()
                     if l.startswith(query + ":")), "<no line>")
        hit = want in line
        print(f"[selftest] {tag}: {'OK' if hit else 'FAILED'} ({line})")
        ok &= hit

    with tempfile.TemporaryDirectory() as tmp:
        for tag, query, fn, want in [
                ("strict 1e-12 drift", "etl_csv_roundtrip",
                 lambda t: drift(t, "total", 1e-12), "VALUE MISMATCH"),
                ("loose 1e-3 drift", "q23_welch",
                 lambda t: drift(t, "t", 1e-3), "VALUE MISMATCH"),
                ("dropped row", "q9_distinct_agg",
                 lambda t: t.slice(0, len(t) - 1), "ROWCOUNT MISMATCH")]:
            d = os.path.join(tmp, query.replace("/", "_"))
            shutil.copytree(src, d)
            mutate(d, query, fn)
            check(tag, run_gate(sf_dir, d), want, query)
        # control: the untouched copy must still pass end to end
        d = os.path.join(tmp, "control")
        shutil.copytree(src, d)
        out = run_gate(sf_dir, d)
        clean = "ALL OK" in out
        print(f"[selftest] control: {'OK' if clean else 'FAILED'}")
        ok &= clean

    print("[selftest] GATE BITES" if ok else "[selftest] GATE IS BLIND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
