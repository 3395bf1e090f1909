"""Temporal join operators Spark lacks as built-ins: as-of join, interval join.

Neither exists in the reference (its time logic is per-partition date fencing,
reference src/gads_etl/pipeline.py:38-78); both are table stakes for an
event-data training pipeline (attribution, feature backfill, burst analysis).

Design rules for 100 TB:
- **No range-join explosion.** A naive ``l JOIN r ON l.ts >= r.ts`` is a
  cross product per key. The as-of join is instead a *union + ordered
  window fill*: tag both sides, sort once on (key, ts), carry the latest
  right payload forward with ``last(ignorenulls)``. One shuffle, linear
  output, no BroadcastNestedLoopJoin anywhere in the plan.
- **Interval joins bucket first.** Intervals explode to the fixed-width
  time buckets they cover; events carry their own bucket; the join is an
  equi-join on bucket with the precise range predicate as a residual
  filter. Shuffle is on bucket keys, pair count is bounded by bucket
  occupancy, not |events| × |intervals|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    prefix: str = "r_",
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    largest ``right_ts <= left_ts`` for the same ``on`` key (ties allowed
    at equality, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``).

    Implementation is union + window, not a range join: both sides are
    tagged and unioned, then a single window pass per key carries the most
    recent right payload forward. Right rows sort *before* left rows at
    equal timestamps so an exactly-simultaneous right row matches.

    Unmatched left rows keep NULL payload columns (left-outer semantics).
    Right value columns appear as ``{prefix}{col}``. With ``tolerance``
    (an INTERVAL string, e.g. ``'1 hour'``), matches staler than
    ``left_ts - tolerance`` are nulled out — same cost, the bound applies
    as a post-fill filter.

    **Contract: the right side must have at most one row per
    (``on``, ``right_ts``).** At a timestamp tie the carried payload is
    whichever duplicate the window happened to order last, so duplicate
    (key, ts) right rows make the result nondeterministic. Pre-aggregate
    the right side to enforce it (as ev_asof_attribution and the property
    test do) — same rule DuckDB/pandas ``ASOF JOIN`` callers follow.
    """
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(F.col(right_ts).alias(right_ts),
                       *[F.col(c) for c in rcols])
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ev_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("_ev_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        *[F.col(c) for c in left.columns if c != on],
    )
    # unionByName fills the left-only columns with NULL on the right side.
    tagged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ev_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    if tolerance is not None:
        fresh = F.col(f"_match.{right_ts}") >= (
            F.col("_ev_ts") - F.expr(f"INTERVAL {tolerance}")
        )
        filled = filled.withColumn(
            "_match", F.when(fresh, F.col("_match")).otherwise(F.lit(None))
        )
    out = filled.where(F.col("_side") == 1).select(
        F.col(on),
        *[F.col(c) for c in left.columns if c != on],
        F.col(f"_match.{right_ts}").alias(f"{prefix}{right_ts}"),
        *[F.col(f"_match.{c}").alias(f"{prefix}{c}") for c in rcols],
    )
    return out


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "hour",
) -> DataFrame:
    """Join events to the intervals containing them (inclusive bounds),
    without an equality key — the pure range-join case.

    Each interval is exploded to the sequence of fixed-width time buckets
    it overlaps; each event computes its single bucket; the join is then
    an equi-join on the bucket with ``start <= ts <= end`` as a residual
    filter. An event's bucket matches each interval at most once (an
    interval lists every covered bucket exactly once), so no dedup pass
    is needed. Pick ``bucket`` ~ median interval width: shuffle keys stay
    dense and the residual filter discards little. ``bucket`` is a
    date_trunc unit (``hour`` or ``day``).
    """
    if bucket not in ("hour", "day"):
        raise ValueError(f"bucket must be 'hour' or 'day', got {bucket!r}")
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start_col)),
                F.date_trunc(bucket, F.col(end_col)),
                F.expr(f"INTERVAL 1 {bucket}"),
            )
        ),
    )
    ev = events.withColumn("_bucket", F.date_trunc(bucket, F.col(ts_col)))
    return (
        ev.join(iv, "_bucket")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_bucket")
    )


def scd2_history(
    changelog: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a changelog.

    Collapses consecutive rows with the same ``attr_col`` value per key
    (gaps-and-islands), then emits one row per run with
    ``valid_from`` / ``valid_to`` (null = still current), ``is_current``,
    and ``n_events`` (rows collapsed into the run). The reference keeps
    only latest-state (reference src/gads_etl/state_store.py — point
    lookups, no history); SCD2 is the warehouse-side complement.

    One shuffle at 100 TB: the change-flag window, the running-sum
    window, the per-run aggregate, and the valid_to lead are ALL keyed by
    ``key_col`` (aggregate keys are a superset), so Catalyst plans a
    single hashpartitioning Exchange on ``key_col`` and sorts within
    partitions. State is bounded by rows-per-key, never all-pairs.
    ``tiebreak_col`` must make (ts, tiebreak) unique per key or run
    membership is nondeterministic.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # Null-safe change detection: `lag != col` is NULL (→ no change) when
    # either side is NULL, which would merge NULL-valued rows into the
    # previous run and emit duplicate (key, _version) groups. eqNullSafe
    # treats NULL as a regular value (matching the oracle's IS DISTINCT
    # FROM); the first row per key (lag = NULL) starts its own run either
    # way — version numbering starts at 0 when the first attr is NULL,
    # which only shifts the internal counter, never run membership.
    chg = F.when(
        ~F.col(attr_col).eqNullSafe(F.lag(attr_col).over(w)), 1
    ).otherwise(0)
    versioned = changelog.withColumn(
        "_version", F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = versioned.groupBy(key_col, "_version", attr_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy(key_col).orderBy("_version")
    return runs.select(
        key_col,
        attr_col,
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )
