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
    def test_stale_pointer_cache_is_ignored(self, spark, tmp_path):
        # Crash window: a commit that died AFTER exclusive-creating its
        # manifest but BEFORE refreshing the CURRENT cache file. The
        # manifest IS the commit record — readers derive truth from the
        # manifest listing, so the new version is visible regardless.
        from gads_etl_spark.pipeline import fsutil

        states = StateStore(spark, str(tmp_path / "state"))
        states.upsert(spark.createDataFrame([_row("1", "pending")], STATE_SCHEMA))
        v1 = states._table._current_version()
        states.upsert(spark.createDataFrame([_row("2", "pending")], STATE_SCHEMA))
        # Simulate the crash by rolling the cache back to v1.
        fsutil.write_text_atomic(spark, states._table._pointer, v1)
        assert states._table._current_version() != v1
        assert states.read().count() == 2
        # And the next commit proceeds normally from the real current.
        states.upsert(spark.createDataFrame([_row("3", "pending")], STATE_SCHEMA))
        assert states.read().count() == 3

    def test_partial_manifest_corpse_skipped_then_reclaimed(self, spark, tmp_path):
        # Crash window: a writer that died MID-manifest-write leaves an
        # unparseable corpse at the next seq. Readers must skip it (the
        # version never committed), and the next committer must reclaim
        # the seq — delete the corpse, retry the exclusive create — so a
        # crash never wedges the table.
        from gads_etl_spark.pipeline import fsutil

        states = StateStore(spark, str(tmp_path / "state"))
        states.upsert(spark.createDataFrame([_row("1", "pending")], STATE_SCHEMA))
        table = states._table
        corpse = table._next_version(table._current_manifest())
        fsutil.write_text_atomic(
            spark, f"{table._versions_dir}/{corpse}.json", '{"version": "v_')

        assert states.read().count() == 1  # corpse invisible to readers
        assert corpse not in table.history()
        with pytest.raises(KeyError):
            table.read_version(corpse)

        states.upsert(spark.createDataFrame([_row("2", "pending")], STATE_SCHEMA))
        assert states.read().count() == 2
        # The reclaimed seq now holds the real commit.
        assert corpse in table.history()
        assert table.read_version(corpse).count() == 2


class TestConcurrentCommitDetection:
    def test_stale_writer_detected(self, spark, tmp_path):
        # Cheap path: a commit computed against a parent that is no longer
        # current fails the early staleness check with a clear message.
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

    def test_interleaved_dual_writer_loses_at_exclusive_create(
            self, spark, tmp_path, monkeypatch):
        # The hard case the old check-then-act could not see: writer B
        # passes its staleness check, THEN writer A commits, THEN B tries
        # to publish. B computed the same next seq as A, so B's exclusive
        # manifest create collides and raises — deterministically, with
        # no window, because the filesystem arbitrates the create.
        from gads_etl_spark.pipeline.state_store import (
            ConcurrentCommitError, merge_upsert)

        writer_a = StateStore(spark, str(tmp_path / "state"))
        writer_b = StateStore(spark, str(tmp_path / "state"))
        writer_a.upsert(spark.createDataFrame([_row("1", "pending")], STATE_SCHEMA))
        table_b = writer_b._table

        # B reads the table and prepares its commit from this parent.
        parent_b = table_b._current_manifest()
        version_b = table_b._next_version(parent_b)
        merged_b = merge_upsert(
            writer_b.read(),
            spark.createDataFrame([_row("B", "pending")], STATE_SCHEMA),
            table_b.key_cols)
        buckets_b = table_b._write_buckets(merged_b, version_b)

        # A commits first and wins the seq.
        writer_a.upsert(spark.createDataFrame([_row("A", "success")], STATE_SCHEMA))

        # Freeze B's staleness check at its (now stale) read — the
        # interleaving where check-then-act silently lost an update.
        monkeypatch.setattr(
            table_b, "_current_version", lambda: parent_b["version"])
        with pytest.raises(ConcurrentCommitError):
            table_b._publish(version_b, parent_b, buckets_b)
        monkeypatch.undo()

        # A's commit is intact; B's row never became visible.
        got = {r.customer_id: r.status for r in writer_a.read().collect()}
        assert got == {"1": "pending", "A": "success"}
        # B's orphan data dir is referenced by no manifest. A default
        # vacuum must NOT touch it: a young unreferenced dir is
        # indistinguishable from a live commit between data write and
        # manifest publish (age-gated GC, Delta-style retention).
        import os
        data_root = str(tmp_path / "state" / "data")
        n_dirs_before = len(os.listdir(data_root))
        writer_a._table.vacuum(keep=100)
        assert len(os.listdir(data_root)) == n_dirs_before
        # With the grace period waived (offline maintenance), it's GC'd.
        writer_a._table.vacuum(keep=100, retention_ms=0)
        assert len(os.listdir(data_root)) == n_dirs_before - 1


class TestAtomicManifestPublish:
    def test_loser_always_observes_full_content(self, spark, tmp_path):
        # The race the old create-then-write protocol lost: writer A
        # creates the manifest, writer B collides, reads it back EMPTY
        # (A hasn't written yet), classifies it as a corpse, deletes it,
        # and claims the seq — both "win" and one commit vanishes. With
        # publish-with-content the destination never exists without its
        # full payload, so whenever ANY racer sees FileExistsError the
        # occupant must parse. Hammer the claim from many threads.
        import json
        import threading

        from gads_etl_spark.pipeline import fsutil

        path = str(tmp_path / "claims" / "v_0000000001.json")
        fsutil.mkdirs(spark, str(tmp_path / "claims"))
        n = 8
        barrier = threading.Barrier(n)
        outcomes: list[tuple[str, object]] = []
        lock = threading.Lock()

        def racer(i: int) -> None:
            payload = json.dumps({"version": "v_0000000001", "writer": i})
            barrier.wait()
            try:
                fsutil.publish_text_claim(spark, path, payload)
                with lock:
                    outcomes.append(("won", i))
            except FileExistsError:
                # At the instant of loss the occupant MUST be complete.
                seen = fsutil.read_text(spark, path)
                with lock:
                    outcomes.append(("lost", json.loads(seen)))

        threads = [threading.Thread(target=racer, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        winners = [i for kind, i in outcomes if kind == "won"]
        assert len(winners) == 1  # the filesystem admitted exactly one
        final = json.loads(fsutil.read_text(spark, path))
        assert final == {"version": "v_0000000001", "writer": winners[0]}
        # Every loser saw the winner's full manifest, never a partial.
        for kind, seen in outcomes:
            if kind == "lost":
                assert seen == final
        # No temp litter left behind by winners or losers.
        litter = [f for f in os.listdir(tmp_path / "claims") if ".tmp-" in f]
        assert litter == []

    def test_vacuum_age_gates_inflight_attempt_dirs(self, spark, tmp_path):
        # A commit writes data/<version>-<token>/ BEFORE publishing its
        # manifest; vacuum must not GC such a young unreferenced dir.
        states = StateStore(spark, str(tmp_path / "state"))
        states.upsert(spark.createDataFrame([_row("1", "pending")], STATE_SCHEMA))
        table = states._table
        # Simulate the in-flight window: buckets written, manifest not yet.
        inflight = table._write_buckets(states.read(), "v_0000000099")
        data_root = str(tmp_path / "state" / "data")
        n_before = len(os.listdir(data_root))
        table.vacuum(keep=1)  # default retention: in-flight dir survives
        assert len(os.listdir(data_root)) == n_before
        # The attempt can still land: its buckets are intact.
        table._publish("v_0000000002", table._current_manifest(), inflight)
        assert states.read().count() == 1
        # Old enough (grace waived) + still referenced → still survives.
        table.vacuum(keep=5, retention_ms=0)
        assert states._table.read_version("v_0000000002").count() == 1


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
