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

# Float columns the QUERY rounds (round(x, n) / grid-exact cents sums) —
# compared at ulp strictness regardless of how their reprs print: a
# rounded column's real straddle can legally print with DIFFERING widths
# on the two engines (869714749.32 vs 869714749.3 — the r7 red row), so
# width inference must not soften these. Kept static per NOTES_r8's
# round-site class table; a NEW rounded column should be added here when
# its query lands (unlisted columns still get the repr inference below).
ROUNDED_COLS = {
    "etl_csv_roundtrip": {"total"},
    "etl_csv_gzip": {"total"},
    "json_ingest": {"avg_value"},
    "hash_sample": {"avg_price"},
    "stratified_sample": {"avg_price"},
    "catalog_semi": {"total_spots"},
    "etl_merge_upsert": {"price", "total_price"},
    "sql_interface": {"revenue"},
    "bucketed_join": {"revenue"},
    "q3_join_revenue": {"rev"},
    "q18_math_case": {"chg"},
    "q_pivot": {"p1", "p2", "p3", "p4", "p5"},
    "q_grouping_sets": {"total"},
    "q_window_extras": {"pr", "cd"},
    "skew_salted_join": {"weighted"},
    "orc_roundtrip": {"sum_value"},
    "jsonl_roundtrip": {"sum_value", "avg_k"},
    "text_quality": {"avg_word_len", "stopword_ratio", "punct_ratio",
                     "upper_ratio", "quality"},
    "text_filter_pipeline": {"quality"},
    "corpus_pipeline_e2e": {"quality"},
    "text_repetition": {"dup_word_frac", "top_word_frac",
                        "top_bigram_frac"},
    "text_decontaminate": {"overlap"},
    "text_chunk_dedup": {"boiler_frac"},
    "text_cdc_dedup": {"dup_word_frac"},
    "text_dist_drift": {"kl_vs_corpus"},
    "text_tfidf": {"score"},
    "text_vocab_oov": {"oov_rate"},
    "mwas_results_analyze": {"sets_per_group", "avg_abs_stat"},
    "mwas_corpus_stats": {"avg_bytes"},
    "stream_sessions": {"sum_value"},
    "stream_running_stats": {"sum_value", "max_value"},
    "dedup_canonical": {"quality"},
    "dedup_embedding_nn": {"cosine"},
    "ann_cosine_topk": {"cosine"},
    "ann_filtered_topk": {"cosine"},
    "ann_lsh_bucket": {"cosine"},
    "ann_ivf_assign": {"cosine"},
    "emb_centroids": {"dispersion", "centroid_norm"},
    "ann_pq_adc": {"adc_dist"},
    "ann_ivfpq": {"adc_dist"},
    "ann_index_search": {"adc_dist"},
    "zorder_layout": {"pk_span_frac", "sk_span_frac"},
    "bloom_decontaminate": {"overlap"},
    "stream_decontaminate": {"overlap"},
    "semdedup": {"max_prior_cos"},
    "token_pmi": {"pmi"},
    "text_lm_score": {"avg_logp", "ppl"},
    "event_sessionize": {"sum_value"},
    "anomaly_zscore": {"mu", "z"},
    "temporal_join": {"sum_value"},
    "rolling_features": {"avg_roll_n", "max_roll_v"},
    "bm25_search": {"score"},
    "pagerank_neardup": {"pagerank"},
    "triangle_count": {"clustering"},
    "winsorize": {"win_mean"},
    "timeseries_fill": {"day_sum", "locf_sum"},
    "markov_transitions": {"p"},
    "equiwidth_hist": {"avg_p", "bucket_lo"},
    "item_cooccurrence": {"cosine"},
    "last_touch_attribution": {"revenue"},
    "quantile_bins": {"avg_p"},
    "stream_markov": {"p"},
    "snapshot_diff": {"old_price", "new_price"},
    "schema_evolution": {"total"},
    "cohort_ltv": {"cum_revenue", "ltv"},
    "dedup_substring": {"repeated_frac"},
    "dedup_substring_spans": {"covered_frac"},
    "source_overlap_matrix": {"overlap_jaccard"},
    "text_entropy": {"word_entropy", "norm_entropy"},
    "quality_logreg": {"logit", "prob"},
    "stream_substring": {"repeated_frac"},
    "stream_bm25_search": {"score"},
    "stream_dist_drift": {"kl_vs_corpus"},
    "stream_mix_rebalance": {"realized_frac"},
    "corpus_mix_rebalance": {"realized_frac"},
    "corpus_mix_temperature": {"realized_frac"},
    "emb_project_rp": {"p0", "p1", "p2", "p3", "p4", "p5", "p6", "p7"},
    "emb_dim_stats": {"mean", "sd"},
    "dsir_select": {"dsir_score"},
    "ccnet_quality_buckets": {"avg_fam", "avg_ppl", "min_fam", "max_fam"},
    "vocab_zipf_fit": {"slope", "intercept", "r2"},
    "corpus_report_card": {"dup_frac", "avg_quality", "avg_entropy"},
}


def short_decimals(f):
    """Fractional digits in the shortest repr of f, or None if f is not a
    "short" decimal (exponent form, or more than 6 fractional digits).

    A float the query has passed through round(x, n) — every rounded
    column in the suite uses n <= 6 — is the double nearest an n-decimal
    value, so its shortest repr has <= n fractional digits. A genuinely
    unrounded float prints ~17 SIGNIFICANT digits, which at any magnitude
    above ~1e11 could still be <= 6 FRACTIONAL digits, but no unrounded
    column in the suite reaches that; at the common 1e8-sum magnitude an
    unrounded value prints 8-9 fractional digits and correctly falls to
    the REL_TOL branch. This lets eq() compare rounded columns at ulp
    strictness — the way the driver's hash does — while keeping REL_TOL
    for the unrounded ones. (Added after etl_merge_upsert: a one-cent
    rounding divergence is 1e-10 relative on a ~1e8 sum, invisible to
    REL_TOL but fatal to the driver's hash_match.)"""
    s = repr(f)
    if "e" in s or "E" in s:
        return None
    if "." not in s:
        return 0
    frac = s.split(".")[1]
    return len(frac) if len(frac) <= 6 else None


def ulp_eq(fa, fb):
    """Rounded-column compare: equal to within a few ulps.

    Two engines rounding the SAME exact decimal can land on doubles a few
    ulps apart (Spark rounds via BigDecimal → nearest double; DuckDB
    multiplies/divides by 10^n), so bit-exact is too strict — q3's
    round(sum, 4) at ~1.5e8 magnitude differs by 1 ulp and still
    hash-matches for the driver. A REAL half-way divergence differs by
    10^-n, astronomically larger than an ulp at any magnitude where the
    n-decimal grid is finer than the double grid."""
    return abs(fa - fb) <= 8 * math.ulp(max(abs(fa), abs(fb), 1e-300))


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


def eq(a, b, strict=False):
    """strict=True → the column is KNOWN rounded (ROUNDED_COLS): floats
    compare at ulp level unconditionally. strict=False → infer from the
    reprs: same-width short decimals look rounded (ulp compare); anything
    else — including short reprs of DIFFERING widths, which unrounded
    values can coincidentally produce (exact quarters, integer-valued
    doubles) — gets REL_TOL. Known-rounded columns must not rely on the
    inference because a genuine straddle can print with differing widths
    (…49.32 vs …49.3, trailing zero dropped)."""
    a, b = norm_cell(a), norm_cell(b)
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(eq(x, y, strict)
                                        for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isinf(fa) or math.isinf(fb):
            return fa == fb
        if strict:
            return ulp_eq(fa, fb)
        sa, sb = short_decimals(fa), short_decimals(fb)
        if sa is not None and sb is not None and sa == sb:
            # both sides are same-width short decimals → the query
            # rounded them: ulp-level compare, not REL_TOL (a one-cent
            # divergence is 1e-10 relative on a 1e8 sum — invisible to
            # REL_TOL, fatal to the driver's hash)
            return ulp_eq(fa, fb)
        return abs(fa - fb) <= REL_TOL * max(1.0, abs(fa), abs(fb))
    # timestamps/dates: compare str forms (duckdb vs pyarrow types differ)
    if type(a) is not type(b):
        return str(a) == str(b)
    return a == b


def kind_conflict(gd, ed):
    """True when one side is integer-kind and the other float-kind.

    The driver's strict hash materializes values AS TYPED: a DuckDB
    HUGEINT (→ double in the harness) against Spark's BIGINT hashes
    `0.0` vs `0` even when every value is numerically equal — the r15
    red row (corpus_pipeline_e2e's uncast `start_off // 500`). The
    float-coercing eq() below is value-blind to that class by design,
    so the KIND must be compared separately. Only int-vs-float is
    fatal: same-kind width differences (int32 vs int64) survive the
    driver's materialization, and object-kind columns (strings,
    decimals, lists) have engine-specific pandas reprs that eq()
    already normalizes."""
    ints, flts = set("iu"), set("f")
    gk, ek = gd.kind, ed.kind
    return (gk in ints and ek in flts) or (gk in flts and ek in ints)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    dirs = sorted(glob.glob(f"{out_dir}/*/"))
    names = {d.rstrip("/").split("/")[-1] for d in dirs}
    # a missing dump still fails the run (Verify crashed, or a full run
    # is incomplete) but is counted separately: a FILTERED local Verify
    # legitimately dumps a subset, and "68 FAILURES" for 68 never-run
    # queries buries the real verdict on the ones that did run
    missing = sorted(set(oracle) - names)
    for m in missing:
        print(f"{m}: MISSING OUTPUT (query failed, or filtered Verify?)")
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
        # Bind (not execute) the oracle to audit its DECLARED result
        # types: any HUGEINT output column is an automatic failure —
        # the driver harness materializes HUGEINT as a double and the
        # strict hash diverges from Spark's integral value even when
        # the numbers are equal. CAST the oracle column to BIGINT.
        rel = con.sql(oracle[name])
        huge = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()]
        if huge:
            print(f"{name}: ORACLE TYPE HUGEINT cols={huge} "
                  f"(driver hashes as double; CAST ... AS BIGINT)")
            failures += 1
            continue
        exp = rel.fetchdf()
        got2 = got[sorted(got.columns)]
        exp2 = exp[sorted(exp.columns)]
        if list(got2.columns) != list(exp2.columns):
            print(f"{name}: SCHEMA MISMATCH got={list(got2.columns)} exp={list(exp2.columns)}")
            failures += 1
            continue
        tbad = [c for c in got2.columns
                if kind_conflict(got2[c].dtype, exp2[c].dtype)]
        if tbad:
            print(f"{name}: TYPE KIND MISMATCH cols="
                  + str([(c, str(got2[c].dtype), str(exp2[c].dtype))
                         for c in tbad])
                  + " (int-vs-float is fatal to the driver's hash)")
            failures += 1
            continue
        if len(got2) != len(exp2):
            print(f"{name}: ROWCOUNT MISMATCH got={len(got2)} exp={len(exp2)}")
            failures += 1
            continue
        bad = []
        strict_cols = ROUNDED_COLS.get(name, set())
        strict = [c in strict_cols for c in got2.columns]
        gv, ev = got2.values.tolist(), exp2.values.tolist()
        for i, (gr, er) in enumerate(zip(gv, ev)):
            for j, (g, e) in enumerate(zip(gr, er)):
                if not eq(g, e, strict[j]):
                    bad.append((i, got2.columns[j], g, e))
        if bad:
            print(f"{name}: VALUE MISMATCH x{len(bad)}, first: row={bad[0]}")
            failures += 1
        else:
            print(f"{name}: OK rows={len(got2)}")
    verdict = "ALL OK" if failures == 0 else f"{failures} FAILURES"
    if missing:
        verdict += f" ({len(missing)} not dumped)"
    print(f"\n{verdict}")
    return failures + len(missing)


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
