"""Unit tests for operators/timeseries.py (resample_daily, trend_fit)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _daily(spark, rows):
    return spark.createDataFrame(
        [(k, dt.date.fromisoformat(d), v) for k, d, v in rows],
        "key INT, day DATE, v LONG")


class TestResampleDaily:
    def test_holes_interpolate_linearly(self, spark):
        from gads_etl_spark.operators.timeseries import resample_daily

        daily = _daily(spark, [
            (1, "2024-01-01", 100),
            (1, "2024-01-04", 400),   # 2-day hole: 200, 300
        ])
        out = {r["day"].isoformat(): r for r in
               resample_daily(daily, "key", "day", "v").collect()}
        assert len(out) == 4
        assert out["2024-01-01"]["observed"] and out["2024-01-01"]["filled"] == 100.0
        assert not out["2024-01-02"]["observed"] and out["2024-01-02"]["filled"] == 200.0
        assert out["2024-01-03"]["filled"] == 300.0
        assert out["2024-01-04"]["observed"] and out["2024-01-04"]["filled"] == 400.0

    def test_fractional_interpolation_rounds_to_6(self, spark):
        from gads_etl_spark.operators.timeseries import resample_daily

        daily = _daily(spark, [(1, "2024-01-01", 0), (1, "2024-01-04", 1)])
        out = {r["day"].isoformat(): r["filled"] for r in
               resample_daily(daily, "key", "day", "v").collect()}
        assert out["2024-01-02"] == round(1 / 3, 6)
        assert out["2024-01-03"] == round(2 / 3, 6)

    def test_span_is_per_key_no_extrapolation(self, spark):
        from gads_etl_spark.operators.timeseries import resample_daily

        daily = _daily(spark, [
            (1, "2024-01-01", 5), (1, "2024-01-03", 7),
            (2, "2024-02-10", 9),                       # singleton key
        ])
        rows = resample_daily(daily, "key", "day", "v").collect()
        k1 = sorted(r["day"] for r in rows if r["key"] == 1)
        k2 = [r for r in rows if r["key"] == 2]
        assert k1[0] == dt.date(2024, 1, 1) and k1[-1] == dt.date(2024, 1, 3)
        assert len(k2) == 1 and k2[0]["observed"] and k2[0]["filled"] == 9.0

    def test_boundary_days_always_observed(self, spark):
        from gads_etl_spark.operators.timeseries import resample_daily

        daily = _daily(spark, [(1, "2024-03-05", 1), (1, "2024-03-09", 2),
                               (1, "2024-03-07", 3)])
        rows = sorted(resample_daily(daily, "key", "day", "v").collect(),
                      key=lambda r: r["day"])
        assert rows[0]["observed"] and rows[-1]["observed"]
        assert len(rows) == 5


class TestTrendFit:
    def test_recovers_exact_line(self, spark):
        from gads_etl_spark.operators.timeseries import trend_fit

        pts = spark.createDataFrame(
            [("a", x, 3 * x + 7) for x in range(10)],
            "g STRING, x LONG, y LONG")
        row = trend_fit(pts, "x", "y", ["g"]).collect()[0]
        assert row["n_points"] == 10
        assert row["slope"] == 3.0 and row["intercept"] == 7.0

    def test_groups_fit_independently(self, spark):
        from gads_etl_spark.operators.timeseries import trend_fit

        pts = spark.createDataFrame(
            [("up", x, 2 * x) for x in range(5)]
            + [("down", x, 100 - 5 * x) for x in range(5)],
            "g STRING, x LONG, y LONG")
        out = {r["g"]: r for r in trend_fit(pts, "x", "y", ["g"]).collect()}
        assert out["up"]["slope"] == 2.0 and out["up"]["intercept"] == 0.0
        assert out["down"]["slope"] == -5.0 and out["down"]["intercept"] == 100.0

    def test_degenerate_x_yields_null(self, spark):
        from gads_etl_spark.operators.timeseries import trend_fit

        pts = spark.createDataFrame(
            [("flat", 4, 1), ("flat", 4, 9)], "g STRING, x LONG, y LONG")
        row = trend_fit(pts, "x", "y", ["g"]).collect()[0]
        assert row["slope"] is None and row["intercept"] is None

    def test_partitioning_invariant(self, spark):
        """The fit is exact-integer, so any partition layout gives the
        bit-identical answer (the reason this isn't regr_slope)."""
        from gads_etl_spark.operators.timeseries import trend_fit

        pts = spark.createDataFrame(
            [("a", x, (x * 17) % 23 + x) for x in range(200)],
            "g STRING, x LONG, y LONG")
        one = trend_fit(pts.coalesce(1), "x", "y", ["g"]).collect()[0]
        many = trend_fit(pts.repartition(13), "x", "y", ["g"]).collect()[0]
        assert one == many
