"""Tests for the Python DataSource connector (gads_fixture format)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.sources.ads_source import (
    AdsFixtureDataSource,
    AdsFixtureReader,
    _CustomerDay,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(AdsFixtureDataSource)
    return spark


def _read(spark, **opts):
    base = dict(customers="111,222,333", start_date="2024-01-01",
                end_date="2024-01-05", rows_per_day="120")
    base.update({k: str(v) for k, v in opts.items()})
    r = spark.read.format("gads_fixture")
    for k, v in base.items():
        r = r.option(k, v)
    return r.load()


class TestAdsSource:
    def test_row_counts_and_schema(self, registered):
        df = _read(registered)
        assert df.count() == 3 * 5 * 120  # customers × days × rows_per_day
        assert [f.name for f in df.schema.fields] == [
            "customer_id", "segments_date", "campaign_id",
            "clicks", "impressions", "cost_micros",
        ]

    def test_one_partition_per_customer_day(self, registered):
        df = _read(registered)
        # The partition grid is the parallelism unit — 3 customers × 5
        # days must become 15 independent input partitions.
        assert df.rdd.getNumPartitions() == 15

    def test_deterministic_across_reads(self, registered):
        a = sorted(map(tuple, _read(registered).collect()))
        b = sorted(map(tuple, _read(registered).collect()))
        assert a == b

    def test_customer_filter_prunes_partitions(self, registered):
        df = _read(registered).where(F.col("customer_id") == "222")
        assert df.count() == 5 * 120
        assert set(r.customer_id for r in df.select("customer_id").distinct().collect()) == {"222"}

    def test_post_scan_filter_still_correct(self, registered):
        # A non-pushable predicate must still be applied by Spark.
        df = _read(registered).where(F.col("clicks") > 500)
        rows = df.collect()
        assert 0 < len(rows) < 3 * 5 * 120
        assert all(r.clicks > 500 for r in rows)

    def test_pushdown_prunes_reader_state(self):
        r = AdsFixtureReader({"customers": "111,222,333",
                              "start_date": "2024-01-01",
                              "end_date": "2024-01-05"})
        from pyspark.sql.datasource import EqualTo, GreaterThan

        leftover = list(r.pushFilters([
            EqualTo(("customer_id",), "222"),
            GreaterThan(("clicks",), 10),
        ]))
        assert r.customers == ["222"]
        assert len(leftover) == 1  # clicks filter handed back to Spark
        assert len(r.partitions()) == 5

    def test_paging_covers_all_rows_without_dup(self):
        from gads_etl_spark.sources.ads_source import PAGE_SIZE, _pages

        pages = list(_pages("111", "2024-01-01", 120))
        assert [len(p) for p in pages] == [PAGE_SIZE, PAGE_SIZE, 20]
        flat = [t for p in pages for t in p]
        assert len(set(flat)) == 120

    def test_missing_customers_option_fails_fast(self, registered):
        with pytest.raises(Exception, match="customers"):
            registered.read.format("gads_fixture").load().count()
