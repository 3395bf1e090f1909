"""Skew-salting equivalence + raw-zone backend factory tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.operators.skew import (
    SALT_COL,
    salted_join,
    two_phase_sessionize,
)
from gads_etl_spark.pipeline.raw_sink import create_raw_zone


@pytest.fixture
def skewed_pair(spark):
    # 90% of fact rows hit key 1 — the pathological hot key.
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return fact, dim


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, skewed_pair):
        fact, dim = skewed_pair
        plain = fact.join(dim, ["k"]).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        salted = salted_join(fact, dim, ["k"]).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_left_join_preserves_unmatched(self, spark, skewed_pair):
        fact, _ = skewed_pair
        dim_partial = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("w"))
        plain = fact.join(dim_partial, ["k"], "left")
        salted = salted_join(fact, dim_partial, ["k"], how="left")
        assert plain.count() == salted.count()
        assert (plain.where(F.col("w").isNull()).count()
                == salted.where(F.col("w").isNull()).count())

    def test_hot_key_spreads_over_salts(self, skewed_pair):
        fact, _ = skewed_pair
        from gads_etl_spark.operators.skew import salt_skewed_side

        spread = (
            salt_skewed_side(fact, 16).where(F.col("k") == 1)
            .select(SALT_COL).distinct().count()
        )
        assert spread == 16


class TestSelectiveSaltedJoin:
    def _hot(self, spark):
        return spark.createDataFrame([(1,)], "k long")

    def test_inner_equals_plain_join(self, spark, skewed_pair):
        from gads_etl_spark.operators.skew import selective_salted_join

        fact, dim = skewed_pair
        plain = fact.join(dim, ["k"]).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
            F.sum("w").alias("sw"))
        sel = selective_salted_join(
            fact, dim, "k", self._hot(spark)).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"),
            F.sum("w").alias("sw"))
        assert sorted(map(tuple, plain.collect())) == \
            sorted(map(tuple, sel.collect()))

    def test_left_join_preserves_unmatched(self, spark, skewed_pair):
        from gads_etl_spark.operators.skew import selective_salted_join

        fact, _ = skewed_pair
        dim_partial = spark.range(5).select(
            F.col("id").alias("k"), F.lit(1).alias("w"))
        plain = fact.join(dim_partial, ["k"], "left")
        sel = selective_salted_join(
            fact, dim_partial, "k", self._hot(spark), how="left")
        assert plain.count() == sel.count()
        assert (plain.where(F.col("w").isNull()).count()
                == sel.where(F.col("w").isNull()).count())

    def test_replication_is_selective(self, spark, skewed_pair):
        # The whole point vs salted_join: build rows replicate n_salts×
        # ONLY for hot keys — cold keys pay one row each.
        from gads_etl_spark.operators.skew import selective_salted_join

        fact, dim = skewed_pair
        n = 16
        sel = selective_salted_join(fact, dim, "k", self._hot(spark),
                                    n_salts=n)
        # Recover the build-side replication from the operator's own
        # construction: hot probe rows must spread across all n salts …
        from gads_etl_spark.operators.skew import SALT_COL  # noqa: F401
        hot_out = sel.where(F.col("k") == 1)
        cold_out = sel.where(F.col("k") != 1)
        plain = fact.join(dim, ["k"])
        assert hot_out.count() == plain.where(F.col("k") == 1).count()
        assert cold_out.count() == plain.where(F.col("k") != 1).count()

    def test_empty_hot_set_degenerates_to_plain_join(self, spark, skewed_pair):
        from gads_etl_spark.operators.skew import selective_salted_join

        fact, dim = skewed_pair
        empty = spark.createDataFrame([], "k long")
        sel = selective_salted_join(fact, dim, "k", empty)
        assert sel.count() == fact.join(dim, ["k"]).count()


def _single_shuffle_sessions(events, gap="30 minutes"):
    """The one-shuffle reference plan (same shape as ev_sessionization)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def _canon(df):
    return sorted(
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in df.collect()
    )


class TestTwoPhaseSessionize:
    """two_phase_sessionize must equal the single-shuffle session_window
    plan on every boundary shape a day-bucket split can produce."""

    def test_matches_on_fixture_events(self, spark):
        from gads_etl_spark.catalog import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        got = two_phase_sessionize(ev)
        assert _canon(got) == _canon(_single_shuffle_sessions(ev))

    def test_midnight_crossing_session_merges(self, spark):
        ev = spark.createDataFrame(
            [(1, "2024-01-01 23:50:00"), (1, "2024-01-02 00:05:00"),
             (1, "2024-01-02 00:20:00"),
             # same user, separate session later that day
             (1, "2024-01-02 12:00:00")],
            "user_id long, ts_s string",
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        got = _canon(two_phase_sessionize(ev))
        assert got == _canon(_single_shuffle_sessions(ev))
        # the midnight-crossing events are ONE session of 3 events
        assert (1, "2024-01-01 23:50:00", "2024-01-02 00:50:00", 3) in got

    def test_multi_day_chain_merges_transitively(self, spark):
        # An event every 20 minutes for 3 days: one continuous session
        # split across 3 buckets in phase 1, re-joined through the
        # running-sum chain in phase 2.
        ev = spark.range(3 * 72).select(
            F.lit(7).alias("user_id"),
            (F.lit("2024-03-01 00:00:00").cast("timestamp")
             + F.make_interval(mins=(F.col("id") * 20).cast("int"))).alias("ts"),
        )
        got = _canon(two_phase_sessionize(ev))
        assert got == _canon(_single_shuffle_sessions(ev))
        assert len(got) == 1 and got[0][3] == 3 * 72

    def test_exact_gap_boundary(self, spark):
        # Events exactly `gap` apart belong to ONE session (session_window
        # closes only when the gap is strictly exceeded); 31 minutes splits.
        ev = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:30:00"),
             (2, "2024-01-01 10:00:00"), (2, "2024-01-01 10:31:00")],
            "user_id long, ts_s string",
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        got = _canon(two_phase_sessionize(ev))
        assert got == _canon(_single_shuffle_sessions(ev))
        assert sum(1 for g in got if g[0] == 1) == 1
        assert sum(1 for g in got if g[0] == 2) == 2

    def test_stagewise_funnel_matches_window_formulation(self, spark):
        # The skew-hardened funnel must agree with the one-shuffle window
        # funnel row-for-row (both also share a DuckDB oracle).
        from gads_etl_spark.queries import REGISTRY

        def canon(name):
            rows = REGISTRY[name].fn(spark, "/root/testdata/sf0.001").collect()
            return sorted((str(r.cohort_date), r.n_signed_up, r.n_viewed,
                           r.n_purchased) for r in rows)

        assert canon("ev_funnel_cohorts") == canon("ev_funnel_cohorts_stagewise")

    def test_phase1_exchange_carries_bucket(self, spark):
        # The scale claim: phase 1's shuffle key is (user, bucket), not
        # user alone — visible in the plan as hashpartitioning on both.
        ev = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00")], "user_id long, ts_s string",
        ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
        plan = two_phase_sessionize(ev)._jdf.queryExecution().toString()
        assert "__bucket" in plan


class TestRawZoneFactory:
    def test_env_config_selects_backend(self, spark, tmp_path, monkeypatch):
        monkeypatch.setenv("GADS_ETL_RAW_ROOT", f"file://{tmp_path}/zone")
        monkeypatch.setenv("GADS_ETL_RAW_FORMAT", "parquet")
        zone = create_raw_zone(spark)
        assert zone.root == f"file://{tmp_path}/zone"
        assert zone.data_format == "parquet"

    def test_explicit_args_win(self, spark, tmp_path):
        zone = create_raw_zone(spark, root=str(tmp_path / "z"), data_format="json")
        assert zone.data_format == "json"

    def test_bad_format_rejected(self, spark):
        with pytest.raises(ValueError):
            create_raw_zone(spark, root="/tmp/x", data_format="csv")

    @pytest.mark.parametrize("fmt", ["parquet", "orc"])
    def test_columnar_format_full_lifecycle(self, spark, tmp_path, fmt):
        """Columnar payload formats (both built into stock Spark) support
        the same write → seal → refuse → read → read_all lifecycle as
        JSONL; partition columns still come back via hive discovery."""
        from datetime import date

        from gads_etl_spark.pipeline import PartitionKey
        from gads_etl_spark.pipeline.raw_sink import SealedPartitionError

        zone = create_raw_zone(spark, root=str(tmp_path / fmt), data_format=fmt)
        key = PartitionKey("google_ads", "123", "campaign_stats", date(2024, 1, 1))
        df = spark.range(7).select(
            F.col("id").alias("campaign_id"), (F.col("id") * 3).alias("clicks"))
        meta = zone.write_partition(df, key, "run-a")
        assert meta["record_count"] == 7
        with pytest.raises(SealedPartitionError):
            zone.write_partition(df, key, "run-a")
        back = zone.read_partition(key, "run-a")
        assert sorted((r.campaign_id, r.clicks) for r in back.collect()) == [
            (i, i * 3) for i in range(7)
        ]
        everything = zone.read_all()
        assert everything.count() == 7
        assert {"source", "customer_id", "query_name", "logical_date", "run_id"} <= set(
            everything.columns
        )


class TestHeavyHitters:
    def test_matches_exact_groupby(self, spark):
        from gads_etl_spark.operators.skew import heavy_hitters

        # 1 hot key (40%), 1 warm (20%), rest spread thin.
        rows = [("hot",)] * 400 + [("warm",)] * 200 + [(f"k{i}",) for i in range(400)]
        df = spark.createDataFrame(rows, "k string").repartition(8)
        got = {r.k: r.n for r in heavy_hitters(df, "k", support=0.1).collect()}
        assert got == {"hot": 400, "warm": 200}

    def test_exactness_vs_full_aggregate(self, spark):
        """Sketch-then-confirm must equal the brute-force answer: every
        key above support (no false negatives from freqItems' superset
        guarantee) and none at-or-below (exact confirm)."""
        from gads_etl_spark.operators.skew import heavy_hitters

        rows = [(f"k{i % 37}",) for i in range(1110)]  # ragged counts
        df = spark.createDataFrame(rows, "k string").repartition(5)
        support = 0.027
        exact = {
            r.k: r.n
            for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > support * 1110).collect()
        }
        got = {r.k: r.n for r in heavy_hitters(df, "k", support=support).collect()}
        assert got == exact and exact  # non-trivial case

    def test_share_and_validation(self, spark):
        from gads_etl_spark.operators.skew import heavy_hitters

        df = spark.createDataFrame([("a",)] * 10, "k string")
        r = heavy_hitters(df, "k", support=0.5).collect()[0]
        assert r.share == 1.0
        with pytest.raises(ValueError):
            heavy_hitters(df, "k", support=0.0)
