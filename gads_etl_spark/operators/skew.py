"""Skew mitigation: salted joins for hot keys.

First line of defense is AQE's skew-join splitting (enabled in
session.py), which handles *moderately* skewed sort-merge joins by
splitting oversized partitions at runtime. Salting is the explicit
fallback for pathological single-key hotspots (one customer = 30% of
rows): the skewed side spreads each hot key over ``n_salts`` synthetic
sub-keys, the other side is replicated n_salts×, and the join key becomes
(key, salt) — the hot key's rows land on n_salts reducers instead of one.

Cost model: replicating the build side n_salts× is only worth it when it
is small relative to the skew win — exactly the dimension-table case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SALT_COL = "__salt"


def salt_skewed_side(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Add a deterministic salt derived from the whole row (content hash
    mod n_salts): stable across retries, uniform within a hot key."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return df.withColumn(SALT_COL, salt.cast("int"))


def replicate_other_side(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Replicate each row once per salt value (explode of a literal
    range — no shuffle, the blow-up happens map-side)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))


def salted_join(skewed: DataFrame, other: DataFrame, on: list[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated; result equals ``skewed.join(other, on, how)`` for
    inner/left joins on unique ``other`` keys, with the hot key's work
    spread across ``n_salts`` tasks."""
    left = salt_skewed_side(skewed, n_salts)
    right = replicate_other_side(other, n_salts)
    return left.join(right, [*on, SALT_COL], how).drop(SALT_COL)


def selective_salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    hot_keys: DataFrame,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Salted equi-join that replicates the build side ONLY for hot keys.

    ``salted_join`` replicates the whole build side n_salts× — fine for
    a small dimension, waste at 100 TB when 99.99% of keys are cold and
    only a handful are pathological. Here ``hot_keys`` (one column
    ``on`` — typically the exact output of ``heavy_hitters``, the
    sketch-then-confirm hot-key detector) drives a two-regime plan:

    - probe side: rows whose key is hot get a content-derived salt in
      ``[0, n_salts)``; cold rows get salt 0. The hot tag comes from a
      broadcast LEFT join against the (tiny by construction) hot set —
      the probe side never shuffles for tagging.
    - build side: hot rows explode into all ``n_salts`` salts; cold rows
      carry the single salt 0. Replication cost is n_salts × |hot| rows,
      not n_salts × |build|.

    The join key becomes ``(on, salt)``: a hot key's probe rows spread
    over ``n_salts`` reducers while every cold key pays nothing. Result
    equals ``skewed.join(other, [on], how)`` for inner/left joins on
    unique build keys — asserted against the plain join in tests, on
    data with planted hot keys.
    """
    hot = F.broadcast(
        hot_keys.select(F.col(on)).distinct().withColumn("__hot", F.lit(1)))
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    left = (
        skewed.join(hot, on, "left")
        .withColumn(SALT_COL,
                    F.when(F.col("__hot").isNotNull(), salt)
                    .otherwise(F.lit(0)).cast("int"))
        .drop("__hot")
    )
    right = (
        other.join(hot, on, "left")
        .withColumn(
            SALT_COL,
            F.explode(
                F.when(F.col("__hot").isNotNull(),
                       F.sequence(F.lit(0), F.lit(n_salts - 1)))
                .otherwise(F.array(F.lit(0)))))
        .withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
        .drop("__hot")
    )
    return left.join(right, [on, SALT_COL], how).drop(SALT_COL)


def two_phase_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    bucket: str = "day",
    user_col: str = "user_id",
    ts_col: str = "ts",
    cents: Column | None = None,
) -> DataFrame:
    """Skew-hardened sessionization: identical output to a single
    ``session_window`` pass, without any task owning a whole hot user.

    The one-shuffle formulation partitions by ``user_col`` alone, and AQE's
    skew splitting does NOT split window/session partitions — so one
    power-law user (bot traffic) makes a single straggler task sort and
    sessionize that user's entire event history. This variant:

    - **Phase 1** sessionizes within ``(user, date_trunc(bucket, ts))`` —
      the exchange key carries the time bucket, so a hot user's events
      spread across as many tasks as there are buckets.
    - **Phase 2** merges boundary sessions with a gaps-and-islands pass
      over the *session-level* rows, partitioned by user only. Safe at any
      skew because inactivity gaps bound the rows per (user, bucket): with
      a 30-minute gap a user can open at most 48 sessions per day, so even
      a year-long bot trace is ≤ ~17.5k session rows — versus unbounded
      event rows in the one-shuffle plan.

    Merge rule: Spark's session end is ``last_event + gap``, so two
    consecutive local sessions belong together iff ``next.start <=
    prev.end`` — exactly the inactivity-gap rule. Chains spanning many
    buckets merge transitively through the running sum. Phase 2 never
    merges two sessions from the same bucket (their gap exceeds ``gap`` by
    construction), so running it over all local sessions is correct.

    Equivalence with the one-shuffle plan is asserted in
    tests/test_skew_and_factory.py, including midnight-crossing and
    multi-day chains.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if cents is not None:
        aggs.append(F.sum(cents).alias("__cents"))
    local = (
        events.withColumn("__bucket", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy(
            F.session_window(ts_col, gap).alias("w"),
            F.col(user_col), F.col("__bucket"),
        )
        .agg(*aggs)
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *(["n_events", "__cents"] if cents is not None else ["n_events"]),
        )
    )
    w = Window.partitionBy(user_col).orderBy("session_start", "session_end")
    prev_end = F.lag("session_end").over(w)
    is_new = F.when(
        prev_end.isNull() | (F.col("session_start") > prev_end), 1
    ).otherwise(0)
    chained = local.withColumn(
        "__sid",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    out_aggs = [
        F.min("session_start").alias("session_start"),
        F.max("session_end").alias("session_end"),
        F.sum("n_events").alias("n_events"),
    ]
    if cents is not None:
        out_aggs.append(F.sum("__cents").alias("__cents"))
    return chained.groupBy(user_col, "__sid").agg(*out_aggs).drop("__sid")


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    support: float = 0.001,
) -> DataFrame:
    """Exact heavy hitters (keys with frequency > ``support`` * N) found
    via the sketch-then-confirm pattern.

    Phase 1 — candidates: ``df.stat.freqItems`` (Karp/Shenker/Papadimitriou
    counting, single map-side pass, at most ``1/support`` candidates held
    per task). The sketch GUARANTEES a superset: every key above the
    support threshold is returned, possibly with false positives — so the
    second phase can make the result exact without a full groupBy of the
    100 TB keyspace.

    Phase 2 — confirm: exact counts for the candidate keys only (the
    candidate list is bounded by 1/support, so the filter broadcasts and
    the aggregate's hash table is candidate-sized, not keyspace-sized),
    kept where count > support * N.

    Detecting heavy hitters is the precursor to the mitigations in this
    module: the output feeds ``salted_join`` (which keys need salting) or
    an AQE skew-join audit. Returns (key, n, share) ordered nowhere —
    callers sort.
    """
    if not 0.0 < support < 1.0:
        raise ValueError(f"support must be in (0, 1), got {support}")
    candidates = [
        r for r in df.stat.freqItems([key_col], support).collect()[0][0]
        if r is not None
    ]
    total = df.count()
    threshold = support * total
    return (
        df.where(F.col(key_col).isin(candidates))
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > F.lit(threshold))
        .withColumn("share", F.col("n").cast("double") / F.lit(float(total)))
    )
