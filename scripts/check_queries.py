"""Dev harness: compare registered Spark queries against their DuckDB oracles.

Usage: python scripts/check_queries.py [name ...]   (default: all with oracles)
       python scripts/check_queries.py --sf1-sweep  (the 51-query cross-family
           sweep against the 10x tier; generate it first with
           scripts/gen_scale_fixture.py, and point SPARK_GRAFT_TEST_SF at it —
           defaults to .localdata/sf1 in this mode)
Env:   SPARK_GRAFT_TEST_SF (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from gads_etl_spark.catalog import TABLES  # noqa: E402


def canon(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(repr(v) for v in r) for r in pdf[cols].itertuples(index=False))


def ulp_match(a_pdf, e_pdf) -> bool:
    """Secondary check when exact repr-match fails: cell-wise equality
    with floats allowed a ~1-ulp relative slack (rel_tol=1e-12).

    Exists for one measured phenomenon (SCALING.md, sf1 q01): decimal
    sums past ~2.8e10 with 6 decimals exceed double's 2^53 exact range in
    micro-units, and DuckDB's decimal->double cast rounds one ulp
    differently than Java BigDecimal while the un-cast decimals are
    bit-identical. 1e-12 is ~4500 ulps yet five orders of magnitude
    below the smallest real defect (one dropped row in a 6M-row sum
    shifts the result by ~3e-7 relative), so this cannot mask a bug —
    only a cast-rounding artifact. Non-float cells stay exact.
    """
    import math

    if sorted(a_pdf.columns) != sorted(e_pdf.columns):
        return False
    if len(a_pdf) != len(e_pdf):
        return False
    cols = sorted(a_pdf.columns)
    a_rows = sorted(a_pdf[cols].itertuples(index=False),
                    key=lambda r: tuple(repr(v) for v in r))
    e_rows = sorted(e_pdf[cols].itertuples(index=False),
                    key=lambda r: tuple(repr(v) for v in r))
    for ra, re_ in zip(a_rows, e_rows):
        for va, ve in zip(ra, re_):
            if isinstance(va, float) and isinstance(ve, float):
                if va != ve and not (
                    math.isnan(va) and math.isnan(ve)
                ) and not math.isclose(va, ve, rel_tol=1e-12, abs_tol=1e-12):
                    return False
            elif repr(va) != repr(ve):
                return False
    return True


#: The cross-family sweep run against the amplified 10× tier each round
#: (SCALING.md "sf1 parity"): all TPC-H headline + the largest multi-join,
#: every event-analytics query, the full dedup/similarity ladder,
#: sampling/packing/vocab, retrieval, observability, window frames. Kept
#: to oracles that stay tractable in DuckDB at 10× (the quadratic-in-
#: DuckDB recursive-CTE component oracles are exercised at sf0.01).
SF1_SWEEP = [
    "q01_pricing_summary", "q03_shipping_priority", "q05_regional_revenue",
    "q06_forecast_revenue", "q18_large_orders", "q21_waiting_suppliers",
    "ev_sessionization", "ev_sessionization_twophase", "ev_scd2_history",
    "ev_cohort_retention", "ev_top_paths", "ev_transition_matrix",
    "ev_rate_anomalies", "ev_gap_histogram", "ev_funnel_cohorts",
    "ev_funnel_cohorts_stagewise", "ev_heavy_hitters", "ev_tumbling_hourly",
    "ev_asof_attribution", "ev_dedup_latest", "ev_json_props",
    "ev_error_bursts", "ev_hot_user_enrichment",
    "ext_exact_dedup", "ext_bow_dedup", "ext_fuzzy_match",
    "ext_fuzzy_passjoin", "ext_sorted_neighborhood", "ext_minhash_candidates",
    "ext_tfidf_cosine", "ext_shingle_jaccard", "ext_simhash",
    "ext_dup_spans", "ext_hash_sample", "ext_pps_sample",
    "ext_temperature_mix", "ext_block_pack", "ext_build_vocab",
    "ext_encode_docs", "ext_decontaminate", "ext_domain_mix",
    "ext_bm25_search", "ext_bm25_multi", "ext_hybrid_search",
    "ext_knn_bruteforce", "ext_knn_ivfpq_res",
    "ext_pagerank", "op_trend_fit", "op_resample_interpolate",
    "ext_epoch_shuffle",
    "ext_embedding_quantize", "ext_chunk_docs", "ext_token_stats",
    "ext_text_normalize", "ext_quality_score", "ext_split_assign",
    "obs_status_counts", "obs_date_gaps", "obs_top_failed",
    "op_window_frames",
]


def main() -> int:
    from gads_etl_spark.session import get_session
    from gads_etl_spark.queries import REGISTRY

    args = sys.argv[1:]
    sf1_mode = "--sf1-sweep" in args
    args = [a for a in args if a != "--sf1-sweep"]
    default_sf = "/root/testdata/sf0.01"
    if sf1_mode:
        default_sf = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata", "sf1")
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", default_sf)
    names = args or (
        SF1_SWEEP if sf1_mode
        else [n for n, q in sorted(REGISTRY.items()) if q.oracle])

    spark = get_session("check-queries", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # Driver fixtures are flat files; Spark-written tiers (e.g. the
        # .localdata/sf1 amplification) are directories of part files.
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            a_pdf = q.fn(spark, sf).toPandas()
            if not q.oracle:
                print(f"{name:34s} rows-only {len(a_pdf):6d} rows ({time.perf_counter()-t0:.1f}s)")
                continue
            e_pdf = con.execute(q.oracle).fetchdf()
        except Exception as exc:
            print(f"{name:34s} ERROR: {exc}")
            failures += 1
            continue
        a, e = canon(a_pdf), canon(e_pdf)
        schema_ok = sorted(a_pdf.columns) == sorted(e_pdf.columns)
        ok = a == e and schema_ok
        label = "MATCH"
        if not ok and schema_ok and ulp_match(a_pdf, e_pdf):
            ok = True
            label = "MATCH~ulp"  # exact but for float cast rounding
        print(f"{name:34s} {label if ok else 'MISMATCH'} "
              f"spark={len(a)} oracle={len(e)} ({time.perf_counter()-t0:.1f}s)")
        if not ok:
            failures += 1
            if not schema_ok:
                print(f"  cols spark={sorted(a_pdf.columns)} oracle={sorted(e_pdf.columns)}")
            sa, se = set(a), set(e)
            for r in list(sa - se)[:2]:
                print("  only spark:", r)
            for r in list(se - sa)[:2]:
                print("  only duck :", r)
    print(f"{failures} failures / {len(names)} checked")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
