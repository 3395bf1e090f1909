"""Daily runner E2E: config-driven extract → batch validate → publish."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gads_etl_spark.pipeline import PointerStore, RawZone, StateStore
from gads_etl_spark.pipeline.config import load_config
from gads_etl_spark.pipeline.consumer import read_published
from gads_etl_spark.pipeline.curated_sink import CuratedZone
from gads_etl_spark.pipeline.runner import run_daily

YAML = """
source: google_ads
customer_ids: "123, 456"
queries:
  - name: campaign_stats
    entity: campaign
    date_column: segments.date
    fields: [campaign.id, segments.date, metrics.clicks]
"""

TARGET = date(2024, 1, 2)


def _campaign_source(spark):
    rows = [
        Row(campaign=Row(id=c), segments=Row(date=d), metrics=Row(clicks=c * 10))
        for d in ("2024-01-01", "2024-01-02")
        for c in (1, 2)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture
def env(spark, tmp_path):
    return dict(
        spark=spark,
        config=load_config(YAML),
        sources={"campaign": _campaign_source(spark)},
        raw=RawZone(spark, str(tmp_path / "raw")),
        states=StateStore(spark, str(tmp_path / "state")),
        pointers=PointerStore(spark, str(tmp_path / "ptr")),
        curated=CuratedZone(spark, str(tmp_path / "curated")),
    )


def test_daily_run_end_to_end(env):
    report = run_daily(**env, target_date=TARGET)

    assert report.ok
    assert len(report.extracted) == 2  # 1 query × 2 customers
    assert report.validated_success == 2
    assert report.staged == 2
    assert report.published == {"load": 2, "replace": 0, "demote": 0}

    visible = read_published(env["curated"], env["pointers"])
    # Each customer partition holds the target date's rows only.
    assert visible.count() == 4
    assert visible.select("segments_date").distinct().collect()[0][0] == "2024-01-02"


def test_rerun_same_day_replaces_with_new_run(env):
    first = run_daily(**env, target_date=TARGET, run_id="2024-01-02T01:00:00.000Z")
    second = run_daily(**env, target_date=TARGET, run_id="2024-01-02T02:00:00.000Z")

    assert first.ok and second.ok
    assert second.published == {"load": 0, "replace": 2, "demote": 0}
    ptr_runs = {r.run_id for r in env["pointers"].read().collect()}
    assert ptr_runs == {"2024-01-02T02:00:00.000Z"}


def test_missing_entity_is_partial_failure(env):
    env = dict(env)
    env["sources"] = {}  # connector down for every partition
    report = run_daily(**env, target_date=TARGET)
    assert not report.ok
    assert len(report.extract_errors) == 2
    assert report.published == {"load": 0, "replace": 0, "demote": 0}
