"""Time-series operators: calendar resampling with interpolation, and
per-group OLS trend fitting from exact integer sums.

Not in the reference (its time handling is per-partition date fencing,
reference src/gads_etl/pipeline.py:38-78); both are standard analytic
surface for any engine fed by daily-partitioned fact data — gap-filled
series for dashboards/anomaly baselines, trend slopes for forecasting.

Design rules for 100 TB:
- **Gap-fill generates per key, never globally.** The calendar is
  ``sequence(min_day, max_day)`` *per key*, exploded from the per-key
  aggregate — output is Σ_k span(k) rows, and the generation runs where
  the key's aggregate already lives (one shuffle on the key for the
  daily rollup; the window fill reuses that partitioning). No driver
  loop, no global date dimension joined to every key.
- **Interpolation is two ordered window passes** (last-non-null looking
  back, first-non-null looking forward) — linear in rows, no self-join,
  no range join.
- **Trend fitting never ships points.** OLS needs only (n, Σx, Σy,
  Σxy, Σx²) per group — five exact integer partial aggregates that
  map-side combine; the closed-form division happens once per GROUP,
  not per row. Sums are decimal(38,0) so a trillion-row group cannot
  overflow; the final cast to double is exact while the Gram numbers
  stay below 2^53 (holds through sf1 here by ~100×; beyond that,
  compare the decimal forms directly — see SCALING.md round 7 on
  decimal→double cast ulps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_daily(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Gap-fill a per-(key, day) integer series onto each key's full
    [min(day), max(day)] calendar with linear interpolation.

    Input must be pre-aggregated: at most one row per (key, day), with
    ``value_col`` an exact integer (quantized units per repo
    convention). Output has one row per key per calendar day:

    - ``observed`` — whether the day had a real row,
    - ``filled`` — the observed value as a double, or the linear
      interpolation ``prev + (next - prev) * gap_pos / gap_len``
      rounded to 6 decimals between the two nearest observed anchors.

    Boundary days are always observed (the span is [min, max] of the
    key's own data), so interpolation never extrapolates and the two
    anchors always exist for every generated hole.
    """
    daily = df.select(
        F.col(key_col).alias("key"),
        F.col(day_col).cast("date").alias("day"),
        F.col(value_col).cast("long").alias("v"),
    )
    span = daily.groupBy("key").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(
        "key",
        F.explode(F.sequence("d0", "d1",
                             F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    grid = cal.join(daily, ["key", "day"], "left")
    back = (Window.partitionBy("key").orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0))
    fwd = (Window.partitionBy("key").orderBy("day")
           .rowsBetween(0, Window.unboundedFollowing))
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    g = grid.select(
        "key", "day", "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(back).alias("pd"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(fwd).alias("nd"),
    )
    interp = (
        F.col("pv").cast("double")
        + (F.col("nv") - F.col("pv")).cast("double")
        * F.datediff("day", "pd")
        / F.datediff("nd", "pd")
    )
    return g.select(
        "key", "day",
        F.col("v").isNotNull().alias("observed"),
        F.round(F.when(F.col("v").isNotNull(), F.col("v").cast("double"))
                .otherwise(interp), 6).alias("filled"),
    )


def trend_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str],
) -> DataFrame:
    """Per-group ordinary-least-squares line fit from exact integer sums.

    ``x_col`` and ``y_col`` must be exact integers (an index and a
    quantized measure). Returns one row per group with ``n_points``
    plus ``slope`` and ``intercept`` (round 6), computed closed-form:

        slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        intercept = (ΣyΣx² − ΣxΣxy) / (nΣx² − (Σx)²)

    The five sums are exact decimals (order-independent, overflow-proof),
    so both Gram numerators/denominator are exact; the one float
    division per group makes the result reproducible bit-for-bit across
    engines and partitionings. Groups with a degenerate x (all points
    on one x, denominator 0) return NULL slope/intercept.

    This is deliberately NOT ``regr_slope`` — the built-in accumulates
    in doubles, so its last bits depend on partition merge order.
    """
    x = F.col(x_col).cast("decimal(38,0)")
    y = F.col(y_col).cast("decimal(38,0)")
    sums = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    s_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    i_num = (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
    nz = den.cast("double")
    return sums.select(
        *group_cols,
        F.col("n").cast("long").alias("n_points"),
        F.round(F.when(nz != 0.0, s_num.cast("double") / nz), 6)
        .alias("slope"),
        F.round(F.when(nz != 0.0, i_num.cast("double") / nz), 6)
        .alias("intercept"),
    )
