#!/usr/bin/env python3
"""Write-side pickle interop gate: load graft-written .mwaspkl files with
REAL pandas/pickle (the reference's own loader shape -- two pickle.loads:
ref list, then the set DataFrame) and compare them cell-for-cell against
pandas' own reading of the original files.

Usage: python3 tools/picklecheck.py <originalDir> <writtenDir>

Builder-side verification only (pandas is a driver-side tool): exits 0
with ALL OK, or 1 with a per-file diff.
"""
import io
import pickle
import sys
from pathlib import Path

import pandas as pd


def load_mwaspkl(path: Path):
    data = path.read_bytes()
    if len(data) == 1:
        return data.decode(), None, None  # sentinel: '0' or '1'
    f = io.BytesIO(data)
    refs = pickle.load(f)
    df = pickle.load(f)
    assert isinstance(refs, list), f"{path.name}: ref dump is {type(refs)}"
    assert isinstance(df, pd.DataFrame), f"{path.name}: df dump is {type(df)}"
    return "ok", refs, df


def normalize(df: pd.DataFrame):
    """Column order + python-native cells (numpy scalars -> int/bool)."""
    cols = ["attributes", "values", "biosample_index_list", "include?"]
    assert list(df.columns) == cols, f"columns: {list(df.columns)}"
    rows = []
    for _, r in df.iterrows():
        rows.append((
            str(r["attributes"]),
            str(r["values"]),
            [int(x) for x in r["biosample_index_list"]],
            bool(r["include?"]),
        ))
    return rows


def main():
    orig_dir, written_dir = Path(sys.argv[1]), Path(sys.argv[2])
    failures = []
    originals = sorted(orig_dir.glob("*.mwaspkl"))
    assert originals, f"no .mwaspkl files under {orig_dir}"
    for opath in originals:
        wpath = written_dir / opath.name
        if not wpath.exists():
            failures.append(f"{opath.name}: missing from written tree")
            continue
        ostat, orefs, odf = load_mwaspkl(opath)
        wstat, wrefs, wdf = load_mwaspkl(wpath)
        # an ok-status original with zero sets legitimately degrades to
        # the converter's '0' sentinel on write
        if ostat == "ok" and odf is not None and len(odf) == 0:
            ostat, orefs, odf = "0", None, None
        if ostat in ("0", "1") or wstat in ("0", "1"):
            if ostat != wstat:
                failures.append(f"{opath.name}: sentinel {ostat} != {wstat}")
            continue
        if orefs != wrefs:
            failures.append(f"{opath.name}: ref list differs "
                            f"({len(orefs)} vs {len(wrefs)})")
            continue
        orows, wrows = normalize(odf), normalize(wdf)
        if orows != wrows:
            bad = next(i for i, (a, b) in enumerate(zip(orows, wrows))
                       if a != b) if len(orows) == len(wrows) else -1
            failures.append(
                f"{opath.name}: frame differs (rows {len(orows)} vs "
                f"{len(wrows)}, first diff at {bad})")
            continue
        print(f"{opath.name}: OK rows={len(orows)} refs={len(orefs)}")
    if failures:
        print("\n".join(failures))
        print("FAILED")
        sys.exit(1)
    print("\nALL OK (pandas round trip)")


if __name__ == "__main__":
    main()
