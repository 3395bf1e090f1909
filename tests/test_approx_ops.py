"""Accuracy bounds for the approximate operators (rows-only queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gads_etl_spark.catalog import load_table
from gads_etl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_5pct(spark):
    rows = REGISTRY["op_approx_distinct"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        err = abs(r.approx_customers - r.exact_customers) / r.exact_customers
        assert err <= 0.05, (r.o_orderpriority, err)


def test_quantiles_bracket_exact_median(spark):
    row = REGISTRY["op_quantiles"].fn(spark, SF).collect()[0]
    q25, q50, q90, q99 = row.price_quantiles
    assert q25 < q50 < q90 < q99
    exact_median = load_table(spark, SF, "orders").agg(
        F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    assert abs(q50 - exact_median) / exact_median < 0.02


def test_sample_fraction_and_mean(spark):
    row = REGISTRY["op_sample"].fn(spark, SF).collect()[0]
    total = load_table(spark, SF, "lineitem").count()
    assert 0.08 <= row.n_sampled / total <= 0.12
    true_avg = load_table(spark, SF, "lineitem").agg(F.avg("l_quantity")).collect()[0][0]
    assert abs(row.avg_qty - true_avg) / true_avg < 0.05
