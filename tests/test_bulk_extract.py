"""Bulk extraction: all customers of a day in one partitionBy job."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gads_etl_spark.pipeline import (
    PartitionKey,
    PointerStore,
    RawZone,
    StateStore,
    WarehouseLoader,
)
from gads_etl_spark.pipeline.consumer import read_published
from gads_etl_spark.pipeline.extract import QueryDefinition, extract_day_bulk
from gads_etl_spark.pipeline.validator import validate_batch

QDEF = QueryDefinition(
    name="campaign_stats", entity="campaign", date_column="segments.date",
    fields=("campaign.id", "campaign.customer", "segments.date", "metrics.clicks"),
)

DAY = date(2024, 1, 5)
N_CUSTOMERS = 40


def _source(spark):
    rows = [
        Row(campaign=Row(id=c * 100 + i, customer=c),
            segments=Row(date=DAY.isoformat()),
            metrics=Row(clicks=i))
        for c in range(N_CUSTOMERS) for i in range(3)
    ]
    return spark.createDataFrame(rows)


def test_bulk_extract_validate_publish(spark, tmp_path):
    raw = RawZone(spark, str(tmp_path / "raw"))
    states = StateStore(spark, str(tmp_path / "state"))
    pointers = PointerStore(spark, str(tmp_path / "ptr"))

    metas = extract_day_bulk(
        _source(spark), raw, QDEF, customer_col="campaign_customer",
        logical_date=DAY, run_id="run-a",
    )
    assert len(metas) == N_CUSTOMERS
    assert all(m["record_count"] == 3 for m in metas)

    # Every partition is sealed, individually readable, and laid out in
    # the exact same hive structure single-partition writes use.
    key = PartitionKey("google_ads", "7", "campaign_stats", DAY)
    assert raw.is_sealed(key, "run-a")
    part = raw.read_partition(key, "run-a")
    assert part.count() == 3
    assert set(part.columns) >= {"campaign_id", "metrics_clicks", "__query_name"}

    requests = spark.createDataFrame([
        {"source": m["source"], "customer_id": m["customer_id"],
         "query_name": m["query_name"], "logical_date": m["logical_date"],
         "run_id": m["run_id"], "schema_version": m["schema_version"]}
        for m in metas
    ])
    outcome = validate_batch(raw, states, requests)
    assert outcome.where(F.col("status") == "success").count() == N_CUSTOMERS

    plan = WarehouseLoader(states, pointers).run()
    assert plan.counts()["load"] == N_CUSTOMERS
    assert read_published(raw, pointers).count() == N_CUSTOMERS * 3


def test_bulk_rerun_blocked_by_seal(spark, tmp_path):
    raw = RawZone(spark, str(tmp_path / "raw"))
    extract_day_bulk(_source(spark), raw, QDEF, "campaign_customer", DAY, "run-a")
    from gads_etl_spark.pipeline.raw_sink import SealedPartitionError

    with pytest.raises(SealedPartitionError):
        extract_day_bulk(_source(spark), raw, QDEF, "campaign_customer", DAY, "run-a")
