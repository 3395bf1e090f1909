"""Hypertable-style rollup maintenance: incremental continuous aggregates.

A 100 TB event store cannot re-aggregate history every time a batch of
(possibly late) events lands. Two maintenance strategies, both standard:

- **Additive merge** (``merge_additive``): for decomposable aggregates
  (count, sum — anything associative over disjoint inputs), aggregate
  only the delta batch and fold it into the prior rollup with one
  union + re-aggregate. Cost scales with |delta buckets|, not history.
  The delta's rows combine map-side, so the shuffle is |affected
  groups| — late data works for free because addition commutes.
- **Replace-by-bucket** (``refresh_buckets``): for non-decomposable
  aggregates (distinct counts, percentiles) recompute *only the affected
  buckets* from the source with a pushed-down bucket filter and swap
  them in with an anti-join — the reference's replace-by-partition
  authority semantic (reference src/gads_etl/warehouse/loader.py:92-107)
  applied to aggregate maintenance.

Correctness contract (tested): any split of the input into delta batches,
applied in any order, converges to exactly the full-recompute rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame, keys: tuple[str, ...] = ("event_type",),
                  ts_col: str = "ts", bucket: str = "hour") -> DataFrame:
    """Base continuous aggregate: per (bucket, *keys) counts and exact
    cent sums (integer micro-money — order-independent, see SCALING.md)."""
    return (
        events.groupBy(
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"), *keys
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )


def merge_additive(prior: DataFrame, delta_events: DataFrame,
                   keys: tuple[str, ...] = ("event_type",),
                   ts_col: str = "ts", bucket: str = "hour") -> DataFrame:
    """Fold a batch of new/late events into an existing rollup.

    ``aggregate(delta) ∪ prior → re-aggregate``: counts and sums add, so
    the union collapses with one shuffle of the affected groups. Never
    touches source history.
    """
    delta = hourly_rollup(delta_events, keys, ts_col, bucket)
    return (
        prior.unionByName(delta)
        .groupBy("bucket_start", *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("cents").alias("cents"),
        )
    )


def refresh_buckets(source: DataFrame, prior: DataFrame,
                    buckets: DataFrame,
                    keys: tuple[str, ...] = ("event_type",),
                    ts_col: str = "ts", bucket: str = "hour") -> DataFrame:
    """Replace whole buckets of the rollup from source truth.

    ``buckets`` is a one-column (``bucket_start``) DataFrame naming the
    buckets to rebuild. The source scan filters to those buckets (the
    predicate pushes to the file scan; with a time-partitioned lake this
    is partition pruning), the prior rollup drops them via anti-join, and
    the recomputed rows union in. Use when the aggregate doesn't
    decompose (distinct users, percentiles) or when correcting data.
    """
    b = buckets.select(F.col("bucket_start").alias("_refresh"))
    scoped = source.join(
        F.broadcast(b),
        F.date_trunc(bucket, F.col(ts_col)) == F.col("_refresh"),
    ).drop("_refresh")
    rebuilt = hourly_rollup(scoped, keys, ts_col, bucket)
    kept = prior.join(
        F.broadcast(b), prior.bucket_start == b._refresh, "left_anti"
    )
    return kept.unionByName(rebuilt)


def sketch_distinct_rollup(events: DataFrame, value_col: str,
                           bucket_cols: list[str], lgk: int = 14) -> DataFrame:
    """Per-bucket mergeable distinct-count sketches (Datasketches HLL,
    binary column) — the pre-aggregation COUNT(DISTINCT) cannot give
    you: plain distinct counts don't add across days, sketches union.
    Store one sketch per (bucket) alongside the additive counters; any
    later grouping (month, quarter, all-time) derives distinct users by
    unioning sketches instead of re-scanning events.
    """
    return events.groupBy(*bucket_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def merge_sketch_rollup(rollup: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union per-bucket sketches up to a coarser grouping and estimate.

    HLL registers are element-wise maxima, so union is associative,
    commutative, and idempotent: the merged REGISTERS are identical to
    a direct sketch of the raw events, under any partition layout and
    any merge route (day→type directly, or day→week→type) — the rollup
    loses nothing vs the full rescan, at sketch-sized I/O.

    Estimator caveat (found at the 10x tier, round 12): identical
    registers do NOT imply identical *estimates* against a
    directly-updated sketch. Datasketches HLL applies the HIP
    (historical inverse probability) estimator to a sketch built by
    direct updates, but a union result cannot carry HIP state and falls
    back to the composite estimator — equal only while sketches are in
    sparse-exact mode (small cardinalities). Both estimates stay within
    the published error bounds; the scale-stable invariant — pinned in
    tests and in the ev_distinct_sketch_rollup certificate — is that
    ANY union route over the same buckets estimates identically,
    because the estimate is a pure function of the merged registers.
    """
    return rollup.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"), F.lit(False)))
        .cast("long").alias("distinct_est"),
        F.sum("n_events").cast("long").alias("n_events"),
    )


def union_sketch_rollup(rollup: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union per-bucket sketches to a coarser grouping, KEEPING the
    merged sketch (no estimate yet) — the intermediate step of a
    multi-level rollup hierarchy (day → week → month → all-time): each
    level re-merges the previous level's sketches instead of the raw
    events, and only the level a query reads gets estimated."""
    return rollup.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col("sketch"), F.lit(False)).alias("sketch"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
