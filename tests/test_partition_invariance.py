"""Results must not depend on shuffle partition count.

COVERAGE.md claims decimal/micro-unit aggregation keeps results
bit-identical as partition counts scale — the cluster-portability
property (local[32] today, 1000 executors tomorrow). Pin it: run
representative queries under shuffle.partitions=2 and =32 and require
identical sorted rows. Float-returning queries are included on purpose —
their registered form must already be reduction-order-safe (decimal /
integer-unit internals, rounded outputs)."""

from __future__ import annotations

import pytest

from gads_etl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"

QUERIES = [
    "q01_pricing_summary",        # decimal aggregation
    "pq_authority_dedup",         # window dedup
    "ev_scd2_history",            # gaps-and-islands windows
    "ext_hash_sample",            # hash-range sampling
    "obs_date_gaps",              # sequence/explode/anti-join
    "ext_fuzzy_match",            # blocked self-join
    "ext_snapshot_diff",          # fingerprint full-outer CDC join
    "ext_build_vocab",            # offset-based dense rank assignment
    "ext_block_pack",             # per-shard cumsum + overlap slicing
    "ext_pps_sample",             # weighted hash-threshold sampling
    "ext_dq_checks",              # batched constraint aggregate
    "ev_rate_anomalies",          # integer z-test over trailing window
    "ext_trigram_typicality",     # broadcast frequent-set join
    "ext_curation_funnel",        # chained prefix aggregates
    "ext_fuzzy_passjoin",         # segment-key equi-join + distinct
    "ext_sorted_neighborhood",    # offset-based global rank + bucket join
    "ext_tfidf_cosine",           # integer-quantized weighted cosine
    "ev_transition_matrix",       # lag window + bounded rollup + ratio
    "ev_top_paths",               # trigram rollup + deterministic top-k
    "ext_bm25_search",            # micro-int score sums + integer-ordered top-k
    "ext_hybrid_search",          # nano-int RRF over two TakeOrdered legs
    "ev_hot_user_enrichment",     # selective salting must be invisible
    "ext_temperature_mix",        # integer thresholds + hash membership
    "ext_bm25_multi",             # broadcast query-relation fan-out + window
    "ext_pagerank",               # integer power iteration, 8 rounds
    "op_trend_fit",               # OLS from exact decimal Gram sums
    "op_resample_interpolate",    # per-key calendar + integer anchors
    "ext_epoch_shuffle",          # hash-digit shards + in-shard ranks
]


def _rows(spark, name):
    df = REGISTRY[name].fn(spark, SF)
    return sorted(tuple(map(repr, r)) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES)
def test_partition_count_invariant(spark, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        low = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        high = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert low == high, f"{name} varies with shuffle partition count"
    assert low, f"{name} returned no rows at sf0.01"
