"""Object-store parity for the raw zone (SURVEY.md §2.1 S4).

The reference proves its S3 sink against MinIO
(reference tests/integration/test_raw_sink_object_minio.py:38-62): the
same write/seal/refuse/list contract must hold when the zone root is an
object-store URI rather than a local path. This container has no MinIO,
so the parity witness is Hadoop's ``viewfs://`` scheme — a genuinely
different ``FileSystem`` implementation (client-side mount table) that
every RawZone byte must reach through the Hadoop FS API, exactly the
code path an ``s3a://`` root takes. If RawZone ever shortcut to
``os.path`` / ``open()``, every test here would fail.

The full lifecycle is exercised end-to-end on the non-file scheme:
payload write, metadata-last seal, seal visibility, overwrite refusal,
run_id discovery via the manifest, FAILFAST read-back, and manifest
compaction's rename dance.
"""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.pipeline import PartitionKey, PointerStore, RawZone, StateStore
from gads_etl_spark.pipeline.raw_sink import SealedPartitionError
from gads_etl_spark.pipeline.state_store import STATE_SCHEMA
from gads_etl_spark.pipeline.pointer_store import POINTER_SCHEMA

KEY = PartitionKey("google_ads", "123", "campaign_stats", date(2024, 1, 1))


def _payload(spark, n=5):
    return spark.range(n).select(
        F.col("id").alias("campaign_id"),
        (F.col("id") * 10).alias("clicks"),
    )


@pytest.fixture
def object_zone(spark, tmp_path):
    """RawZone rooted at a viewfs:// URI backed by tmp_path.

    The mount authority must be unique per test: Hadoop's FileSystem
    cache keys on (scheme, authority) and resolves the mount table once
    at init, so reusing an authority would silently keep pointing at the
    previous test's tmp_path.
    """
    mount = f"objparity-{tmp_path.name.lower()}"
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set(f"fs.viewfs.mounttable.{mount}.link./zone", f"file://{tmp_path}")
    root = f"viewfs://{mount}/zone/raw"
    return RawZone(spark, root)


class TestObjectStoreParity:
    def test_fs_is_not_local_scheme(self, spark, object_zone):
        # The parity claim rests on the root resolving to a different
        # FileSystem implementation than the local default.
        fs, _ = object_zone._fs(object_zone.root)
        assert "ViewFileSystem" in fs.getClass().getName()

    def test_write_seal_read_roundtrip(self, spark, object_zone):
        meta = object_zone.write_partition(_payload(spark), KEY, "run-a")
        assert meta["record_count"] == 5
        assert object_zone.is_sealed(KEY, "run-a")
        assert object_zone.read_partition(KEY, "run-a").count() == 5
        assert object_zone.manifest().count() == 1

    def test_overwrite_refused_on_object_scheme(self, spark, object_zone):
        object_zone.write_partition(_payload(spark), KEY, "run-a")
        with pytest.raises(SealedPartitionError):
            object_zone.write_partition(_payload(spark), KEY, "run-a")

    def test_unsealed_invisible_on_object_scheme(self, spark, object_zone):
        with pytest.raises(FileNotFoundError):
            object_zone.read_partition(KEY, "run-missing")

    def test_run_id_discovery(self, spark, object_zone):
        object_zone.write_partition(_payload(spark), KEY, "run-b")
        object_zone.write_partition(_payload(spark), KEY, "run-a")
        assert object_zone.list_run_ids(KEY) == ["run-a", "run-b"]

    def test_manifest_compaction_rename_dance(self, spark, object_zone):
        # compact_manifest rewrites the manifest dir via temp-dir renames —
        # the operation most sensitive to FS rename semantics.
        for d in (1, 2, 3):
            k = PartitionKey("google_ads", "123", "campaign_stats",
                            date(2024, 2, d))
            object_zone.write_partition(_payload(spark), k, "run-c")
        n_before = object_zone.manifest().count()
        object_zone.compact_manifest()
        assert object_zone.manifest().count() == n_before


@pytest.fixture
def object_root(spark, tmp_path):
    """A viewfs:// URI backed by tmp_path (unique mount per test — see
    the object_zone fixture for why the authority must not be reused)."""
    mount = f"ctlparity-{tmp_path.name.lower()}"
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    hc.set(f"fs.viewfs.mounttable.{mount}.link./zone", f"file://{tmp_path}")
    return f"viewfs://{mount}/zone"


def _state_row(customer_id, status, attempt=1):
    return {
        "source": "google_ads", "customer_id": customer_id,
        "query_name": "q", "logical_date": date(2024, 1, 1),
        "status": status, "current_run_id": None, "schema_version": None,
        "record_count": None, "updated_at": datetime(2024, 3, 1),
        "error_message": None, "attempt_count": attempt,
    }


def _pointer_row(customer_id, run_id):
    return {
        "source": "google_ads", "customer_id": customer_id,
        "query_name": "q", "logical_date": date(2024, 1, 1),
        "run_id": run_id, "schema_version": "v1",
        "loaded_at": datetime(2024, 3, 1),
    }


class TestControlPlaneObjectStore:
    """State/pointer/version lifecycle on a non-local FileSystem scheme.

    The control plane is the most cluster-critical storage layer — if any
    of its I/O shortcut to ``open()``/``os.replace`` these tests would
    fail, because a ``viewfs://`` URI is not a local path.
    """

    def test_state_merge_lifecycle(self, spark, object_root):
        states = StateStore(spark, f"{object_root}/state")
        states.upsert(spark.createDataFrame(
            [_state_row("1", "pending"), _state_row("2", "pending")],
            STATE_SCHEMA))
        states.upsert(spark.createDataFrame(
            [_state_row("1", "success")], STATE_SCHEMA))
        got = {r.customer_id: r.status for r in states.read().collect()}
        assert got == {"1": "success", "2": "pending"}

    def test_state_time_travel_and_vacuum(self, spark, object_root):
        states = StateStore(spark, f"{object_root}/state")
        for i in range(4):
            states.upsert(spark.createDataFrame(
                [_state_row("1", "pending", attempt=i + 1)], STATE_SCHEMA))
        hist = states._table.history()
        assert len(hist) == 4
        assert states._table.read_version(hist[0]).collect()[0].attempt_count == 1
        assert states._table.vacuum(keep=2) == 2
        assert len(states._table.history()) == 2
        assert states.read().collect()[0].attempt_count == 4

    def test_publish_claim_refuses_existing_on_rename_branch(
            self, spark, object_root):
        # viewfs takes publish_text_claim's RENAME branch, and the
        # underlying local rename OVERWRITES — the existence precheck is
        # what keeps the sequential collision exact there: a second
        # publish to an occupied path must raise, never clobber a
        # committed manifest, and the loser's temp must not linger.
        from gads_etl_spark.pipeline import fsutil

        path = f"{object_root}/claims/v_0000000001.json"
        fsutil.publish_text_claim(spark, path, '{"w": "first"}')
        with pytest.raises(FileExistsError):
            fsutil.publish_text_claim(spark, path, '{"w": "second"}')
        assert fsutil.read_text(spark, path) == '{"w": "first"}'
        litter = [n for n in fsutil.list_names(
            spark, f"{object_root}/claims") if ".tmp-" in n]
        assert litter == []

    def test_stale_writer_raises_on_rename_branch(self, spark, object_root):
        # The full protocol consequence: a writer holding a stale parent
        # must get ConcurrentCommitError on viewfs exactly as on local.
        from gads_etl_spark.pipeline.state_store import ConcurrentCommitError

        writer_a = StateStore(spark, f"{object_root}/state2")
        writer_b = StateStore(spark, f"{object_root}/state2")
        writer_a.upsert(spark.createDataFrame(
            [_state_row("1", "pending")], STATE_SCHEMA))
        stale_parent = writer_a._table._current_manifest()
        writer_b.upsert(spark.createDataFrame(
            [_state_row("2", "pending")], STATE_SCHEMA))
        with pytest.raises(ConcurrentCommitError):
            writer_a._table._publish("v_dead", stale_parent, {})
        assert writer_a.read().count() == 2

    def test_pointer_upsert_delete(self, spark, object_root):
        pointers = PointerStore(spark, f"{object_root}/pointers")
        pointers.upsert(spark.createDataFrame(
            [_pointer_row("1", "run-a"), _pointer_row("2", "run-b")],
            POINTER_SCHEMA))
        pointers.delete(spark.createDataFrame(
            [_pointer_row("1", "run-a")], POINTER_SCHEMA))
        got = [r.customer_id for r in pointers.read().collect()]
        assert got == ["2"]


class TestFullLifecycleObjectStore:
    """The whole pipeline — raw seal → batch validation → reconcile →
    curated staging → pointer publish → consumer read — with EVERY
    storage layer rooted on the non-local FileSystem scheme. This is the
    deployment shape on a real cluster (one shared s3a://hdfs:// lake
    root); any layer shortcutting to local-path I/O fails here."""

    def test_extract_validate_publish_consume(self, spark, object_root):
        from gads_etl_spark.pipeline.consumer import read_published
        from gads_etl_spark.pipeline.curated_sink import (
            CuratedZone,
            materialize_plan,
        )
        from gads_etl_spark.pipeline.loader import WarehouseLoader
        from gads_etl_spark.pipeline.validator import validate_batch

        raw = RawZone(spark, f"{object_root}/raw")
        curated = CuratedZone(spark, f"{object_root}/curated")
        states = StateStore(spark, f"{object_root}/state")
        pointers = PointerStore(spark, f"{object_root}/pointers")

        keys = [PartitionKey("google_ads", str(c), "campaign_stats",
                             date(2024, 1, 1)) for c in range(3)]
        for k in keys:
            raw.write_partition(_payload(spark), k, "run-a")

        requests = spark.createDataFrame(
            [{**k.as_dict(), "run_id": "run-a", "schema_version": "v1"}
             for k in keys])
        validate_batch(raw, states, requests)
        assert states.read().where(F.col("status") == "success").count() == 3

        loader = WarehouseLoader(states, pointers)
        plan = loader.reconcile()
        assert materialize_plan(raw, curated, plan) == 3
        loader.run()
        assert pointers.read().count() == 3

        published = read_published(curated, pointers)
        assert published.count() == 3 * 5  # 3 partitions × 5 payload rows
