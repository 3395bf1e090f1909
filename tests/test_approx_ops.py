"""Accuracy bounds for the approximate operators.

The registered queries (op_approx_distinct / op_quantiles / op_sample)
now project bound CERTIFICATES — deterministic flags an oracle can check —
so these tests assert (a) every certificate flag comes back true, and
(b) the underlying raw approximations, exercised directly, actually sit
inside the bounds the certificates claim (the flags must not be
vacuously true because the raw value disappeared).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gads_etl_spark.catalog import load_table
from gads_etl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_approx_distinct_certificate_and_raw_bound(spark):
    rows = REGISTRY["op_approx_distinct"].fn(spark, SF).collect()
    assert rows
    assert all(r.approx_within_5pct for r in rows)
    # Raw bound, computed independently of the certificate query.
    raw = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact"),
        )
        .collect()
    )
    for r in raw:
        err = abs(r.approx - r.exact) / r.exact
        assert err <= 0.05, (r.o_orderpriority, err)


def test_quantiles_certificate_and_raw_median(spark):
    row = REGISTRY["op_quantiles"].fn(spark, SF).collect()[0]
    assert row.q25_rank_ok and row.q50_rank_ok and row.q90_rank_ok and row.q99_rank_ok
    # Raw sketch accuracy vs the exact median, independently.
    orders = load_table(spark, SF, "orders")
    q25, q50, q90, q99 = orders.agg(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.9, 0.99], 10_000)
    ).collect()[0][0]
    assert q25 < q50 < q90 < q99
    exact_median = orders.agg(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    assert abs(q50 - exact_median) / exact_median < 0.02


def test_sample_certificate_and_raw_fraction(spark):
    row = REGISTRY["op_sample"].fn(spark, SF).collect()[0]
    assert row.sample_size_ok and row.sample_mean_ok
    # Raw sampling bounds, independently of the certificate query.
    li = load_table(spark, SF, "lineitem")
    total = li.count()
    sampled = li.sample(fraction=0.1, seed=42)
    n_sampled = sampled.count()
    assert 0.08 <= n_sampled / total <= 0.12
    true_avg = li.agg(F.avg("l_quantity")).collect()[0][0]
    samp_avg = sampled.agg(F.avg("l_quantity")).collect()[0][0]
    assert abs(samp_avg - true_avg) / true_avg < 0.05
