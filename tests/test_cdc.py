"""Snapshot-diff (CDC) operator: classification, null discipline,
fingerprint-vs-exact equivalence, and the apply_diff round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.operators import cdc


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, a string, b int")


@pytest.fixture()
def snapshots(spark):
    old = _mk(spark, [
        (1, "same", 10),
        (2, "will-change", 20),
        (3, "will-be-removed", 30),
        (4, None, 40),            # null compared value, unchanged
        (5, "null-flip", None),   # value -> null counts as changed
    ])
    new = _mk(spark, [
        (1, "same", 10),
        (2, "changed!", 20),
        (4, None, 40),
        (5, "null-flip", 50),
        (6, "brand-new", 60),
    ])
    return old, new


def _classes(df):
    return {r["k"]: r["change"] for r in df.collect()}


class TestSnapshotDiff:
    EXPECT = {2: "changed", 3: "removed", 5: "changed", 6: "added"}

    def test_fingerprint_classification(self, snapshots):
        old, new = snapshots
        got = _classes(cdc.snapshot_diff(old, new, ["k"]))
        assert got == self.EXPECT

    def test_exact_matches_fingerprint(self, snapshots):
        old, new = snapshots
        fp = _classes(cdc.snapshot_diff(old, new, ["k"], fingerprint=True))
        exact = _classes(cdc.snapshot_diff(old, new, ["k"], fingerprint=False))
        assert fp == exact == self.EXPECT

    def test_include_unchanged(self, snapshots):
        old, new = snapshots
        got = _classes(cdc.snapshot_diff(old, new, ["k"], include_unchanged=True))
        assert got == {**self.EXPECT, 1: "unchanged", 4: "unchanged"}

    def test_null_vs_empty_not_confused(self, spark):
        """hash(null, x) == hash(x, null) in Spark's hash functions; the
        presence bitmap must keep (null,'x') distinct from ('x',null)."""
        old = _mk(spark, [(1, None, None)])
        new = spark.createDataFrame([(1, "", None)], "k int, a string, b int")
        got = _classes(cdc.snapshot_diff(old, new, ["k"]))
        assert got == {1: "changed"}
        # and a column-order-style swap: (null, 0) vs ("0", null)
        old2 = spark.createDataFrame([(1, None, 0)], "k int, a string, b int")
        new2 = spark.createDataFrame([(1, "0", None)], "k int, a string, b int")
        assert _classes(cdc.snapshot_diff(old2, new2, ["k"])) == {1: "changed"}

    def test_compare_cols_subset(self, snapshots):
        old, new = snapshots
        # comparing only column b: k=2 text change becomes invisible
        got = _classes(cdc.snapshot_diff(old, new, ["k"], compare_cols=["b"]))
        assert got == {3: "removed", 5: "changed", 6: "added"}

    def test_no_compare_cols_raises(self, spark):
        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError, match="no columns to compare"):
            cdc.snapshot_diff(df, df, ["k"])

    def test_apply_diff_roundtrip(self, snapshots):
        old, new = snapshots
        delta = cdc.snapshot_diff(old, new, ["k"])
        rebuilt = cdc.apply_diff(old, delta, new, ["k"])
        assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))

    def test_constant_width_shuffle(self, snapshots):
        """The fingerprint path must not carry compared columns through
        the exchange — the join inputs project to key + hash only."""
        old, new = snapshots
        plan = cdc.snapshot_diff(old, new, ["k"])._jdf.queryExecution().executedPlan().toString()
        # compared columns a/b appear only below the hash projection, never
        # as join output attributes
        join_line = next(l for l in plan.splitlines() if "SortMergeJoin" in l or "ShuffledHashJoin" in l)
        assert "a#" not in join_line and "b#" not in join_line


class TestIncrementalIndexMaintenance:
    """CDC delta drives O(Δ) maintenance of a live ANN index: drop dead
    keys, re-assign only added/changed vectors against the FIXED
    centroids, and the result must equal a full re-assignment of the new
    corpus — the contract that makes a 100 TB index maintainable without
    nightly rebuilds (assignment is deterministic given centroids)."""

    def test_incremental_equals_full_rebuild(self, spark):
        from gads_etl_spark.catalog import load_table
        from gads_etl_spark.operators import similarity as S

        v1 = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding")
        # simulated next corpus version: drops, vector revisions, adds
        survived = v1.where(F.col("vec_id") % 17 != 0)
        revised = survived.select(
            "vec_id",
            F.when(F.col("vec_id") % 13 == 0,
                   F.transform("embedding", lambda x: -x))
            .otherwise(F.col("embedding")).alias("embedding"),
        )
        added = v1.where(F.col("vec_id") % 19 == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        v2 = revised.unionByName(added)

        cents = S.fit_ivf_centroids(v1, n_clusters=8)
        index_v1 = S.ivf_assign(v1, cents)

        delta = cdc.snapshot_diff(v1, v2, ["vec_id"],
                                  compare_cols=["embedding"])
        classes = {r["change"] for r in delta.collect()}
        assert classes == {"added", "removed", "changed"}
        dead = delta.where(F.col("change").isin("removed", "changed")) \
                    .select("vec_id")
        fresh_keys = delta.where(F.col("change").isin("added", "changed")) \
                          .select("vec_id")
        incremental = index_v1.join(dead, "vec_id", "left_anti").unionByName(
            S.ivf_assign(v2.join(fresh_keys, "vec_id", "left_semi"), cents))

        full = S.ivf_assign(v2, cents)
        canon = lambda df: sorted(
            (r["vec_id"], r["cell"], tuple(r["_v"])) for r in df.collect())
        assert canon(incremental) == canon(full)
        # and the delta really is a delta: far fewer re-assignments than rows
        assert fresh_keys.count() < v2.count() / 5


class TestVersionedTableDiff:
    """snapshot_diff over _VersionedTable time travel: the audit query
    'what did this control-plane operation change' needs no extra
    infrastructure — any two committed versions are diffable."""

    def test_diff_between_committed_versions(self, spark, tmp_path):
        from datetime import date, datetime

        from gads_etl_spark.pipeline import StateStore
        from gads_etl_spark.pipeline.state_store import STATE_SCHEMA

        store = StateStore(spark, str(tmp_path / "state"))

        def row(day, status, run="run-a"):
            return {"source": "google_ads", "customer_id": "1",
                    "query_name": "q", "logical_date": date(2024, 1, day),
                    "status": status, "current_run_id": run,
                    "schema_version": "v1", "record_count": 5,
                    "updated_at": datetime(2024, 3, 1),
                    "error_message": None, "attempt_count": 1}

        store.upsert(spark.createDataFrame(
            [row(1, "pending"), row(2, "success")], STATE_SCHEMA))
        store.upsert(spark.createDataFrame(
            [row(1, "success", "run-b"), row(3, "pending")], STATE_SCHEMA))
        v1, v2 = store._table.history()[-2:]

        delta = cdc.snapshot_diff(
            store._table.read_version(v1), store._table.read_version(v2),
            ["source", "customer_id", "query_name", "logical_date"],
            compare_cols=["status", "current_run_id"],
        )
        got = {r["logical_date"].day: r["change"] for r in delta.collect()}
        assert got == {1: "changed", 3: "added"}  # day 2 untouched


class TestUniqueKeyGuard:
    def test_duplicate_keys_fail_loudly_when_asserted(self, spark):
        old = _mk(spark, [(1, "a", 1), (1, "b", 2)])  # dup key in old
        new = _mk(spark, [(1, "a", 1)])
        with pytest.raises(ValueError, match="old snapshot has duplicate keys"):
            cdc.snapshot_diff(old, new, ["k"], assert_unique_keys=True)
        with pytest.raises(ValueError, match="new snapshot has duplicate keys"):
            cdc.snapshot_diff(new, old, ["k"], assert_unique_keys=True)

    def test_unique_inputs_pass_guard(self, snapshots):
        old, new = snapshots
        got = _classes(cdc.snapshot_diff(old, new, ["k"],
                                         assert_unique_keys=True))
        assert got == TestSnapshotDiff.EXPECT
