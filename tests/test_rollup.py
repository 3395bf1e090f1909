"""Convergence properties of incremental rollup maintenance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gads_etl_spark.operators.rollup import (
    hourly_rollup,
    merge_additive,
    refresh_buckets,
)


def _events(spark, n=500):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=7 * i), i % 13,
         ["click", "view", "purchase"][i % 3], round(0.25 * (i % 40), 2))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double")


def _canon(df):
    return sorted(tuple(r) for r in
                  df.select("bucket_start", "event_type", "n_events", "cents").collect())


class TestAdditiveMerge:
    def test_any_split_converges_to_full_recompute(self, spark):
        ev = _events(spark)
        full = hourly_rollup(ev)
        # Three different splits, including an out-of-order (late) one.
        for pred in [F.col("event_id") < 250,
                     F.col("event_id") % 2 == 0,
                     F.col("event_id") >= 400]:
            prior = hourly_rollup(ev.where(pred))
            merged = merge_additive(prior, ev.where(~pred))
            assert _canon(merged) == _canon(full), pred

    def test_iterated_batches_converge(self, spark):
        ev = _events(spark)
        full = hourly_rollup(ev)
        acc = hourly_rollup(ev.where(F.col("event_id") < 100))
        for lo, hi in [(100, 300), (300, 450), (450, 10**9)]:
            acc = merge_additive(
                acc, ev.where((F.col("event_id") >= lo) & (F.col("event_id") < hi)))
        assert _canon(acc) == _canon(full)


class TestRefreshBuckets:
    def test_refresh_replaces_only_named_buckets(self, spark):
        ev = _events(spark)
        # Prior rollup built from a corrupted source (values doubled).
        corrupted = ev.withColumn("value", F.col("value") * 2)
        prior = hourly_rollup(corrupted)
        # Refresh the first 3 hours from the true source.
        buckets = (ev.select(F.date_trunc("hour", "ts").alias("bucket_start"))
                   .distinct().orderBy("bucket_start").limit(3))
        fixed = refresh_buckets(ev, prior, buckets)
        truth = {t[:2]: t for t in _canon(hourly_rollup(ev))}
        bad = {t[:2]: t for t in _canon(prior)}
        refreshed = {r["bucket_start"] for r in buckets.collect()}
        for key, row in {t[:2]: t for t in _canon(fixed)}.items():
            assert row == (truth[key] if key[0] in refreshed else bad[key])

    def test_refresh_everything_equals_full(self, spark):
        ev = _events(spark)
        prior = hourly_rollup(ev.where(F.lit(False)))  # empty prior
        buckets = ev.select(F.date_trunc("hour", "ts").alias("bucket_start")).distinct()
        assert _canon(refresh_buckets(ev, prior, buckets)) == _canon(hourly_rollup(ev))


class TestSketchDistinctRollup:
    """Mergeable HLL rollup: union of per-bucket sketches must estimate
    identically to a direct sketch of the raw rows (register identity),
    under any layout, and under incremental append."""

    def _events(self, spark):
        return spark.range(5_000).select(
            (F.col("id") % 7).alias("g"),
            (F.col("id") % 10).alias("day"),
            F.pmod(F.hash("id"), F.lit(400)).alias("user_id"),
        )

    def test_merged_equals_direct_any_layout(self, spark):
        from gads_etl_spark.operators.rollup import (
            merge_sketch_rollup, sketch_distinct_rollup)

        ev = self._events(spark)
        daily = sketch_distinct_rollup(ev, "user_id", ["g", "day"])
        merged = {r["g"]: r["distinct_est"] for r in
                  merge_sketch_rollup(daily, ["g"]).collect()}
        relaid = sketch_distinct_rollup(
            ev.repartition(13, "user_id"), "user_id", ["g", "day"])
        merged2 = {r["g"]: r["distinct_est"] for r in
                   merge_sketch_rollup(relaid, ["g"]).collect()}
        direct = {r["g"]: r["d"] for r in ev.groupBy("g").agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14)))
            .cast("long").alias("d")).collect()}
        # direct-equality holds HERE because 400 distincts keep every
        # sketch in sparse-exact mode; in estimation mode a direct
        # sketch's HIP estimator diverges from the union's composite
        # estimator (round-12 sf1 find) — the scale-stable invariant is
        # route/layout invariance, tested below at large cardinality.
        assert merged == merged2 == direct

    def test_merge_route_invariant_at_large_cardinality(self, spark):
        """Past sparse mode (30k distincts >> 16384 registers' exact
        range) the union estimate is a pure function of the merged
        registers: day→g directly and day→(g, week)→g must estimate
        identically, and both stay within the 5% bound — while equality
        with a directly-updated (HIP-estimated) sketch is NOT required
        and does not generally hold."""
        from gads_etl_spark.operators.rollup import (
            merge_sketch_rollup, sketch_distinct_rollup,
            union_sketch_rollup)

        ev = spark.range(600_000).select(
            (F.col("id") % 2).alias("g"),
            (F.col("id") % 10).alias("day"),
            ((F.col("id") % 10) / 7).cast("int").alias("week"),
            F.pmod(F.hash("id"), F.lit(30_000)).alias("user_id"),
        )
        daily = sketch_distinct_rollup(ev, "user_id", ["g", "week", "day"])
        a = {r["g"]: r["distinct_est"] for r in
             merge_sketch_rollup(daily, ["g"]).collect()}
        b = {r["g"]: r["distinct_est"] for r in merge_sketch_rollup(
            union_sketch_rollup(daily, ["g", "week"]), ["g"]).collect()}
        exact = {r["g"]: r["e"] for r in ev.groupBy("g").agg(
            F.count_distinct("user_id").alias("e")).collect()}
        assert a == b
        for g in exact:
            assert abs(a[g] - exact[g]) <= 0.05 * exact[g]

    def test_incremental_append_equals_recompute(self, spark):
        from gads_etl_spark.operators.rollup import (
            merge_sketch_rollup, sketch_distinct_rollup)

        ev = self._events(spark)
        old = ev.where(F.col("day") < 8)
        new = ev.where(F.col("day") >= 8)
        # rollup maintained incrementally: old buckets untouched, new
        # day's sketches appended, then merged
        incr = sketch_distinct_rollup(old, "user_id", ["g", "day"]).unionByName(
            sketch_distinct_rollup(new, "user_id", ["g", "day"]))
        a = {r["g"]: r["distinct_est"] for r in
             merge_sketch_rollup(incr, ["g"]).collect()}
        b = {r["g"]: r["distinct_est"] for r in merge_sketch_rollup(
            sketch_distinct_rollup(ev, "user_id", ["g", "day"]), ["g"]).collect()}
        assert a == b

    def test_estimate_accuracy(self, spark):
        from gads_etl_spark.operators.rollup import (
            merge_sketch_rollup, sketch_distinct_rollup)

        ev = self._events(spark)
        est = {r["g"]: r["distinct_est"] for r in merge_sketch_rollup(
            sketch_distinct_rollup(ev, "user_id", ["g", "day"]), ["g"]).collect()}
        exact = {r["g"]: r["e"] for r in ev.groupBy("g").agg(
            F.count_distinct("user_id").alias("e")).collect()}
        for g in exact:
            assert abs(est[g] - exact[g]) <= 0.05 * exact[g]
