#!/usr/bin/env python3
"""Export the reference-written .mwaspkl fixture corpus to parquet with
REAL pandas/pickle — the independent decoder — so the driver's DuckDB
oracle can hash-compare the pickle queries instead of rows-only checking
them (DuckDB cannot read Python pickles; pandas is the reference's own
loader, so its decode IS the ground truth).

Two mirrors, matching the two registered query grains:

  scan.parquet — the flattened DataSource V2 relation (one row per set;
      sentinels and zero-set ok-files as single null-set rows), the grain
      of `pickle_ds_scan`.
  sets.parquet — the condensed-set relation of PickleCompat.condensedSets
      minus set_id (xxhash64 is not cross-engine; the `mwas_condense`
      oracle drops it for the same reason), the grain of `pickle_migrate`:
      (attribute, value) pairs re-sorted canonically, members resolved
      through the ref list and sorted.

Usage: python3 tools/picklemirror.py [fixtureDir] [outDir]
Defaults: src/test/resources/mwaspkl  ->  src/test/resources/mwaspkl_mirror

Builder-side generation only (pandas is a driver-side tool); the output
parquet is COMMITTED so Verify's oracle SQL can read it at driver time.
Regenerate only when the fixture corpus changes.
"""
import io
import pickle
import sys
from pathlib import Path

import pandas as pd


def load_mwaspkl(path: Path):
    data = path.read_bytes()
    if len(data) == 0:
        raise ValueError(f"corrupt/empty fixture: {path}")
    if len(data) == 1:
        status = {ord("0"): "empty", ord("1"): "blacklisted"}[data[0]]
        return status, None, None
    f = io.BytesIO(data)
    refs = pickle.load(f)
    df = pickle.load(f)
    assert isinstance(refs, list) and isinstance(df, pd.DataFrame)
    return "ok", refs, df


def main():
    fix = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        "src/test/resources/mwaspkl")
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else Path(
        "src/test/resources/mwaspkl_mirror")
    out.mkdir(parents=True, exist_ok=True)

    scan_rows, set_rows = [], []
    for p in sorted(fix.glob("*.mwaspkl")):
        bioproject = p.name[: -len(".mwaspkl")]
        status, refs, df = load_mwaspkl(p)
        if status != "ok":
            scan_rows.append((bioproject, status, None, None, None, None,
                              None))
            continue
        n_bio = len(refs)
        if len(df) == 0:
            scan_rows.append((bioproject, "ok", None, None, None, None,
                              n_bio))
            continue
        for _, r in df.iterrows():
            attrs = str(r["attributes"])
            vals = str(r["values"])
            idx = [int(x) for x in r["biosample_index_list"]]
            inc = bool(r["include?"])
            scan_rows.append((bioproject, "ok", attrs, vals,
                              "; ".join(str(i) for i in idx), inc, n_bio))
            # canonical set grain: pairs sorted by (attribute, value),
            # members resolved through the ref list and sorted — the
            # same canonicalization condensedSets applies, here done by
            # the INDEPENDENT decoder (UTF-8 byte order == code-point
            # order, so python sorted() agrees with Spark sort_array)
            pairs = sorted(zip(attrs.split("; "), vals.split("; ")))
            members = sorted(refs[i] for i in idx)
            set_rows.append((bioproject,
                             "; ".join(a for a, _ in pairs),
                             "; ".join(v for _, v in pairs),
                             "; ".join(members), len(members), inc, n_bio))

    scan = pd.DataFrame(scan_rows, columns=[
        "bioproject", "status", "attributes", "values", "index_list",
        "include", "n_biosamples"])
    scan["include"] = scan["include"].astype("boolean")
    scan["n_biosamples"] = scan["n_biosamples"].astype("Int64")
    scan.to_parquet(out / "scan.parquet", index=False)

    sets = pd.DataFrame(set_rows, columns=[
        "bioproject", "attributes", "values", "members", "n_stored",
        "include", "n_biosamples"])
    sets["n_stored"] = sets["n_stored"].astype("int64")
    sets["n_biosamples"] = sets["n_biosamples"].astype("int64")
    sets.to_parquet(out / "sets.parquet", index=False)

    print(f"scan.parquet: {len(scan)} rows; sets.parquet: {len(sets)} rows")


if __name__ == "__main__":
    main()
