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


class TestCrashRecovery:
    def test_orphan_manifest_from_crashed_commit_is_harmless(self, spark, tmp_path):
        # Crash window: a commit that died AFTER writing its version
        # manifest but BEFORE swapping CURRENT leaves an orphan manifest.
        # The table must keep reading the pre-crash version, accept the
        # next commit normally (its parent is CURRENT, not the orphan),
        # and vacuum must collect the orphan's data eventually.
        import json as _json

        from gads_etl_spark.pipeline import fsutil

        states = StateStore(spark, str(tmp_path / "state"))
        states.upsert(spark.createDataFrame([_row("1", "pending")], STATE_SCHEMA))
        table = states._table
        current = table._current_manifest()
        orphan = table._next_version(current)
        fsutil.write_text_atomic(
            spark, f"{table._versions_dir}/{orphan}.json",
            _json.dumps({"version": orphan, "seq": current["seq"] + 1,
                         "parent": current["version"], "buckets": {}}))

        # Reads still serve the committed version; the next writer's
        # optimistic check passes because CURRENT never moved.
        assert states.read().count() == 1
        states.upsert(spark.createDataFrame([_row("2", "pending")], STATE_SCHEMA))
        assert states.read().count() == 2
        assert orphan in table.history()  # visible as history, harmless
        assert table.read_version(orphan).count() == 0


class TestConcurrentCommitDetection:
    def test_stale_writer_detected(self, spark, tmp_path):
        # Optimistic concurrency: a commit computed against a parent that
        # is no longer CURRENT must fail loudly instead of silently
        # overwriting the other writer's merge (lost update).
        from gads_etl_spark.pipeline.state_store import ConcurrentCommitError

        writer_a = StateStore(spark, str(tmp_path / "state"))
        writer_b = StateStore(spark, str(tmp_path / "state"))
        writer_a.upsert(spark.createDataFrame([_row("1", "pending")], STATE_SCHEMA))
        stale_parent = writer_a._table._current_manifest()
        writer_b.upsert(spark.createDataFrame([_row("2", "pending")], STATE_SCHEMA))
        with pytest.raises(ConcurrentCommitError):
            writer_a._table._publish("v_dead", stale_parent, {})
        # The winning writer's state is intact.
        assert writer_a.read().count() == 2


def _dir_digest(path):
    """sha256 over (name, bytes) of every file under a local bucket dir."""
    import hashlib
    import pathlib

    h = hashlib.sha256()
    for f in sorted(pathlib.Path(path).rglob("*")):
        if f.is_file():
            h.update(f.name.encode())
            h.update(f.read_bytes())
    return h.hexdigest()


class TestBucketedMerge:
    """MERGE is O(touched buckets): untouched bucket files are carried
    into the new version manifest by reference — never read or rewritten."""

    def test_untouched_buckets_carry_over_byte_identical(self, spark, tmp_path):
        states = StateStore(spark, str(tmp_path / "state"))
        seed = [_row(str(c), "pending") for c in range(40)]
        states.upsert(spark.createDataFrame(seed, STATE_SCHEMA))
        m0 = states._table._current_manifest()
        assert len(m0["buckets"]) > 1  # 40 keys spread over several buckets

        update = spark.createDataFrame([_row("7", "success")], STATE_SCHEMA)
        touched = states._table._touched_buckets(update)
        assert len(touched) == 1
        untouched = {k: p for k, p in m0["buckets"].items()
                     if k != str(touched[0])}
        digests_before = {k: _dir_digest(p) for k, p in untouched.items()}

        states.upsert(update)

        m1 = states._table._current_manifest()
        # The touched bucket moved to a new data dir; every other bucket
        # entry is the SAME path, and its files are byte-identical.
        assert m1["buckets"][str(touched[0])] != m0["buckets"][str(touched[0])]
        for k, path in untouched.items():
            assert m1["buckets"][k] == path
            assert _dir_digest(path) == digests_before[k]
        got = {r.customer_id: r.status for r in states.read().collect()}
        assert got["7"] == "success"
        assert sum(1 for s in got.values() if s == "pending") == 39

    def test_merge_reads_only_touched_buckets(self, spark, tmp_path):
        # Byte-identity (above) proves untouched buckets aren't REWRITTEN;
        # this proves they aren't even READ — the input side of the O(Δ)
        # claim. At 10M ledger rows that is the difference between a MERGE
        # that scans one bucket and one that scans the table.
        states = StateStore(spark, str(tmp_path / "state"))
        states.upsert(spark.createDataFrame(
            [_row(str(c), "pending") for c in range(40)], STATE_SCHEMA))
        table = states._table
        seen: list[list[str]] = []
        orig = table._read_paths

        def spying_read_paths(paths):
            seen.append(list(paths))
            return orig(paths)

        table._read_paths = spying_read_paths
        states.upsert(spark.createDataFrame([_row("7", "success")], STATE_SCHEMA))
        table._read_paths = orig
        assert len(seen) == 1 and len(seen[0]) == 1  # exactly the touched bucket

    def test_vacuum_preserves_carried_over_data(self, spark, tmp_path):
        # After single-key merges, the CURRENT manifest still references
        # bucket files written by the very first commit. vacuum drops old
        # *manifests* but must keep any data dir a surviving manifest
        # references — deleting by version age alone would corrupt the
        # live table.
        states = StateStore(spark, str(tmp_path / "state"))
        states.upsert(spark.createDataFrame(
            [_row(str(c), "pending") for c in range(40)], STATE_SCHEMA))
        for i in range(6):
            states.upsert(spark.createDataFrame(
                [_row("7", "pending" if i % 2 else "failed")], STATE_SCHEMA))
        assert states._table.vacuum(keep=2) == 5
        # Untouched buckets still resolve to the v1 data dirs; the full
        # table reads intact and kept versions time-travel.
        got = {r.customer_id for r in states.read().collect()}
        assert len(got) == 40
        for v in states._table.history():
            assert states._table.read_version(v).count() == 40
