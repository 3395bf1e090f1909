"""Maintenance operations: manifest compaction, control-table time travel."""

from __future__ import annotations

import os
from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.pipeline import PartitionKey, RawZone, StateStore
from gads_etl_spark.pipeline.state_store import STATE_SCHEMA


def _row(customer_id, status):
    return {
        "source": "google_ads", "customer_id": customer_id,
        "query_name": "q", "logical_date": date(2024, 1, 1),
        "status": status, "current_run_id": None, "schema_version": None,
        "record_count": None, "updated_at": datetime(2024, 3, 1),
        "error_message": None, "attempt_count": 1,
    }


class TestManifestCompaction:
    def test_compacts_to_one_file_same_rows(self, spark, tmp_path):
        zone = RawZone(spark, str(tmp_path / "raw"))
        for c in range(5):
            zone.write_partition(
                spark.range(3).select(F.col("id").alias("x")),
                PartitionKey("google_ads", str(c), "q", date(2024, 1, 1)), "run-a")
        manifest_dir = f"{zone.root}/_manifest"
        files_before = [f for f in os.listdir(manifest_dir) if f.endswith(".parquet")]
        assert len(files_before) == 5  # one per seal batch
        before_rows = sorted(map(str, zone.manifest().collect()))

        assert zone.compact_manifest() == 5

        files_after = [f for f in os.listdir(manifest_dir) if f.endswith(".parquet")]
        assert len(files_after) == 1
        assert sorted(map(str, zone.manifest().collect())) == before_rows
        # Still appendable + seal contract intact after compaction.
        zone.write_partition(
            spark.range(2).select(F.col("id").alias("x")),
            PartitionKey("google_ads", "99", "q", date(2024, 1, 1)), "run-a")
        assert zone.manifest().count() == 6

    def test_noop_on_single_file(self, spark, tmp_path):
        zone = RawZone(spark, str(tmp_path / "raw2"))
        assert zone.compact_manifest() == 0


class TestTimeTravel:
    def test_history_and_read_version(self, spark, tmp_path):
        states = StateStore(spark, str(tmp_path / "state"))
        states.upsert(spark.createDataFrame([_row("1", "pending")], STATE_SCHEMA))
        states.upsert(spark.createDataFrame([_row("1", "success")], STATE_SCHEMA))

        hist = states._table.history()
        assert len(hist) == 2
        v0 = states._table.read_version(hist[0]).collect()
        assert v0[0].status == "pending"
        assert states.read().collect()[0].status == "success"
        with pytest.raises(KeyError):
            states._table.read_version("v_nope")

    def test_vacuum_keeps_current(self, spark, tmp_path):
        states = StateStore(spark, str(tmp_path / "state"))
        for i in range(8):
            states.upsert(spark.createDataFrame(
                [_row("1", "pending" if i % 2 else "failed")], STATE_SCHEMA))
        removed = states._table.vacuum(keep=2)
        assert removed == 6
        assert len(states._table.history()) == 2
        # Current version survives and still reads.
        assert states.read().count() == 1
