"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints the full detail object (headline + "extra" breadth set) on one
JSON line, then the COMPACT headline metric on the FINAL line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
The compact line is last and short (~400 bytes) so any tail-capture of
stdout always ends with one complete, parseable metric line no matter
how large the breadth set grows (round 9's single giant line overran
the driver's tail buffer and recorded parsed: null).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Headline set: kept fixed across rounds so the driver's recorded total
#: is comparable round-over-round.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_regional_revenue",
    "q06_forecast_revenue",
    "q18_large_orders",
]

#: Breadth set: one representative query per suite (pipeline,
#: observability, dedup, ANN, event windows). Timed separately and
#: reported under "extra" — not part of the headline total.
EXTRA = [
    "pq_authority_dedup",
    "obs_date_gaps",
    "ext_exact_dedup",
    "ext_minhash_candidates",
    "ext_incremental_dedup",
    "ext_knn_bruteforce",
    "ext_knn_ivf",
    "ext_knn_pq",
    "ext_knn_ivfpq",
    "ext_knn_ivfpq_res",
    "ext_dup_spans",
    "ev_tumbling_hourly",
    "ev_sessionization",
    "ev_sessionization_twophase",
    "ev_asof_attribution",
    "ext_cluster_dedup",
    "ext_pack_bins",
    "q21_waiting_suppliers",
    "ext_decontaminate",
    "ext_domain_mix",
    "ext_embedding_quantize",
    "ev_funnel_cohorts",
    "ev_funnel_cohorts_stagewise",
    "op_window_frames",
    "ev_scd2_history",
    "ext_fuzzy_match",
    "ext_fuzzy_passjoin",
    "ext_sorted_neighborhood",
    "ext_tfidf_cosine",
    "ext_winnow_fingerprint",
    "ext_multimodal_decode",
    "ext_snapshot_diff",
    "ext_dq_checks",
    "ext_build_vocab",
    "ext_encode_docs",
    "ext_block_pack",
    "ext_pps_sample",
    "ext_cluster_best_dedup",
    "ev_distinct_sketch_rollup",
    "ev_rate_anomalies",
    "ext_trigram_typicality",
    "ev_cohort_retention",
    "ev_gap_histogram",
    "ext_simhash_radius",
    "ev_transition_matrix",
    "ev_top_paths",
    "ext_bm25_search",
    "ext_bm25_multi",
    "ev_heavy_hitters",
    "ext_hybrid_search",
    "ev_hot_user_enrichment",
    "ext_temperature_mix",
    "ext_pagerank",
    "op_trend_fit",
    "op_resample_interpolate",
    "ext_epoch_shuffle",
]


def _bench_tier(spark, sf_dir: str) -> dict:
    """Measure HEADLINE + EXTRA against one sf directory; returns the
    same shape as the single-tier JSON body."""
    global SF_DIR
    prev, SF_DIR = SF_DIR, sf_dir
    try:
        return _measure(spark)
    finally:
        SF_DIR = prev


def run_tiers(spark) -> None:
    """--tiers: the two-tier scaling artifact — measure sf0.1 and the
    amplified .localdata/sf1 fixture in one process and emit BOTH plus
    the per-query wall ratio, so scaling drift is captured as data
    round-over-round instead of SCALING.md prose. Generate the sf1 tier
    first: ``python scripts/gen_scale_fixture.py``."""
    here = os.path.dirname(os.path.abspath(__file__))
    sf1_dir = os.path.join(here, ".localdata", "sf1")
    if not os.path.isdir(sf1_dir):
        print(json.dumps({"error": f"{sf1_dir} missing — run "
                          "scripts/gen_scale_fixture.py first"}))
        return
    low = _bench_tier(spark, SF_DIR)
    high = _bench_tier(spark, sf1_dir)

    def _all(t):
        return {**t["queries"], **t["extra"]}

    lo_q, hi_q = _all(low), _all(high)
    ratios = {n: round(hi_q[n] / lo_q[n], 2)
              for n in lo_q if n in hi_q and lo_q[n] > 0}
    body = json.dumps({
        "metric": "two_tier_scaling",
        "unit": "sec",
        "tiers": {"sf0.1": low, "sf1": high},
        "wall_ratio_sf1_over_sf0.1": ratios,
        "data_factor": 10,
    })
    # The tiers artifact is the round's scaling evidence — persist it in
    # the repo (committed as BENCH_tiers.json) as well as printing it.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_tiers.json")
    with open(out_path, "w") as fh:
        fh.write(body + "\n")
    print(body)


def main() -> None:
    from gads_etl_spark.session import get_session

    spark = get_session("gads-etl-spark-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    if "--tiers" in sys.argv[1:]:
        run_tiers(spark)
        spark.stop()
        return
    out = _measure(spark)
    # Detail first, compact headline LAST: a bounded tail-capture of
    # stdout must always end with one complete parseable metric line.
    print(json.dumps({**out, "detail": True}))
    compact = {k: out[k] for k in
               ("metric", "value", "incomplete", "unit", "queries", "sf")}
    compact["extra_total"] = out["extra_total"]
    compact["errors_n"] = len(out["errors"])
    print(json.dumps(compact))
    spark.stop()


def _measure(spark) -> dict:
    from gads_etl_spark.queries import REGISTRY

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        # Explicit-list mode (e.g. the sf10 probe, where running the
        # full breadth set at 100x data would take hours): bench exactly
        # these as the "queries" map, no extras.
        names = [n for n in only.split(",") if n in REGISTRY]
    else:
        names = [n for n in HEADLINE if n in REGISTRY]
    env_extra = os.environ.get("SPARK_GRAFT_BENCH_EXTRA")
    if env_extra:
        names += [n for n in env_extra.split(",") if n in REGISTRY and n not in names]

    measured_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    errors: dict[str, str] = {}

    def run(batch: list[str]) -> dict[str, float]:
        # One warmup execution per query, then `measured_runs` measured
        # executions reported as the MEDIAN. The warmup absorbs one-time
        # costs that don't exist in steady state on a long-lived cluster
        # (JIT + whole-stage-codegen compilation per query shape, parquet
        # footer reads, broadcast thread-pool spin-up); the median over
        # repeated passes settles single-run noise. Every query is
        # failure-isolated: one broken query records an error entry and
        # the JSON line still prints with everything else's numbers.
        timings: dict[str, float] = {}
        for name in batch:
            try:
                REGISTRY[name].fn(spark, SF_DIR).count()  # warmup
                samples = []
                n = 0
                for _ in range(measured_runs):
                    t0 = time.perf_counter()
                    n = REGISTRY[name].fn(spark, SF_DIR).count()
                    samples.append(time.perf_counter() - t0)
                timings[name] = round(statistics.median(samples), 4)
                print(f"# {name}: {timings[name]:.3f}s median of "
                      f"{[round(s, 3) for s in samples]} ({n} rows)",
                      file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 — isolate per query
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# {name}: ERROR {errors[name][:120]}", file=sys.stderr)
        return timings

    timings = run(names)
    extra = {} if only else run([n for n in EXTRA if n in REGISTRY])

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # A failed query is dropped from timings, so a partial total would
    # look BETTER than a clean run — never emit a comparable value for an
    # incomplete artifact.
    out = {
        "metric": "headline_queries_total_wall",
        "value": None if errors else round(sum(timings.values()), 4),
        "incomplete": bool(errors),
        "unit": "sec",
        "queries": timings,
        "extra": extra,
        "extra_total": round(sum(extra.values()), 4),
        "errors": errors,
        "runs": {"warmup": 1, "measured": measured_runs, "stat": "median"},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    return out


if __name__ == "__main__":
    main()
