"""Event-time window queries over the events fixture.

The reference is batch-only (SURVEY.md §2.9) — these queries expose the
streaming-shaped surface on batch data: tumbling / sliding / session
windows via ``window()`` / ``session_window()``, JSON prop extraction, and
exact top-k. The identical expressions run under Structured Streaming
(readStream + watermark) — see gads_etl_spark.streaming.

Float discipline: ``value`` is 2-decimal money → summed as BIGINT cents
(order-independent, engine-exact), reported as DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gads_etl_spark.catalog import load_table
from gads_etl_spark.queries.registry import register

#: value is 2-decimal; cents are exact in BIGINT.
_CENTS = "CAST(round(value * 100) AS BIGINT)"


def _cents() -> F.Column:
    return F.round(F.col("value") * 100).cast("long")


@register(
    "ev_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum({_CENTS}) AS DOUBLE) / 100 AS value_sum,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "window", "streaming-shaped"),
)
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type — the canonical
    streaming aggregation, expressed with ``window()`` so the same plan
    runs under readStream + watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents()).cast("double") / 100).alias("value_sum"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "value_sum", "n_users")
    )


@register(
    "ev_sliding_windows",
    oracle=f"""
    WITH assigned AS (
        SELECT date_trunc('hour', ts)
               + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 0 MINUTE END AS w0, *
        FROM events
    ), expanded AS (
        SELECT w0 AS window_start, * FROM assigned
        UNION ALL
        SELECT w0 - INTERVAL 30 MINUTE AS window_start, * FROM assigned
    )
    SELECT window_start, count(*) AS n_events,
           CAST(sum({_CENTS}) AS DOUBLE) / 100 AS value_sum
    FROM expanded GROUP BY 1
    """,
    tags=("events", "window", "streaming-shaped"),
)
def ev_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes: each event lands in
    exactly two overlapping windows. The oracle materializes the two
    window assignments explicitly; Spark's ``window(ts, '1 hour',
    '30 minutes')`` does the same expansion internally."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents()).cast("double") / 100).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "value_sum")
    )


@register(
    "ev_sessionization",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, {_CENTS} AS cents,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        -- event_id tiebreak: without it, tied timestamps crossing a
        -- session boundary are split across the two sessions by
        -- whatever order the engine visits ties in (session_window
        -- groups by ts VALUE, so all tied events land together)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT *, sum(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(sum(cents) AS DOUBLE) / 100 AS value_sum
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("events", "window", "session", "streaming-shaped"),
)
def ev_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap per user via
    ``session_window()`` (window.end = last event + gap). The oracle states
    the same semantics as a gaps-and-islands window computation — the two
    formulations agreeing is the correctness check on Spark's native
    session assignment."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents()).cast("double") / 100).alias("value_sum"),
        )
        .select(
            "user_id", F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"), "n_events", "value_sum",
        )
    )


@register(
    "ev_sessionization_twophase",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, {_CENTS} AS cents,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        -- event_id tiebreak: without it, tied timestamps crossing a
        -- session boundary are split across the two sessions by
        -- whatever order the engine visits ties in (session_window
        -- groups by ts VALUE, so all tied events land together)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT *, sum(is_start) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(sum(cents) AS DOUBLE) / 100 AS value_sum
    FROM sessions GROUP BY user_id, session_id
    """,
    tags=("events", "window", "session", "skew"),
)
def ev_sessionization_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened sessionization (operators/skew.py::two_phase_sessionize):
    pre-sessionize within (user, day) so no task owns a hot user's whole
    history, then merge boundary sessions. Same oracle as
    ev_sessionization — the two plans must agree row-for-row."""
    from gads_etl_spark.operators.skew import two_phase_sessionize

    ev = load_table(spark, sf_dir, "events")
    return two_phase_sessionize(ev, gap="30 minutes", cents=_cents()).select(
        "user_id", "session_start", "session_end", "n_events",
        (F.col("__cents").cast("double") / 100).alias("value_sum"),
    )


@register(
    "ev_json_props",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE) / count(*) AS k_avg,
           min(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
           max(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
    FROM events GROUP BY event_type
    """,
    tags=("events", "json"),
)
def ev_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (P11-shaped: from_json/get_json_object) +
    grouped integer stats over the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("k_sum"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("k_avg"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@register(
    "ev_top_users",
    oracle=f"""
    SELECT user_id, CAST(sum({_CENTS}) AS DOUBLE) / 100 AS total_value,
           count(*) AS n_events
    FROM events GROUP BY user_id
    ORDER BY sum({_CENTS}) DESC, user_id
    LIMIT 10
    """,
    tags=("events", "topk"),
)
def ev_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by exact total value (cent-sum ranking, user_id
    tiebreak → deterministic LIMIT across engines)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.sum(_cents()).alias("_cents"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        agg.orderBy(F.desc("_cents"), F.asc("user_id"))
        .limit(10)
        .select("user_id", (F.col("_cents").cast("double") / 100).alias("total_value"),
                "n_events")
    )


@register(
    "ev_hot_user_enrichment",
    oracle=f"""
    WITH p AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_user_events
        FROM events GROUP BY user_id
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(p.n_user_events) AS BIGINT) AS weight_sum,
           CAST(sum({_CENTS}) AS DOUBLE) / 100 AS value_sum
    FROM events e JOIN p USING (user_id)
    GROUP BY event_type
    """,
    tags=("events", "skew", "join"),
)
def ev_hot_user_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-side enrichment join under key skew: exact hot-user
    detection feeding ``selective_salted_join``, which spreads ONLY the
    hot keys over salts — build-side replication is n_salts × |hot|
    rows, not n_salts × |build| as blanket salting would pay. The
    oracle is the plain join: salting must be invisible in the result.
    At 100 TB this is the standard events⋈profile enrichment where one
    bot user would otherwise pin a reducer.

    The hot set derives from ``profile`` — the exact per-user counts
    this query must aggregate ANYWAY as its build side — instead of a
    separate ``heavy_hitters`` sketch-then-confirm pass (round-16,
    guide §2.4/§1.2): the sketch+confirm+count trio cost two eager
    driver actions plus a third full events scan per execution, to
    recompute counts the build side already holds. ``heavy_hitters``
    remains the right tool when no exact per-key aggregate exists
    (``ev_heavy_hitters``); here it was three redundant passes. The
    profile is lazily checkpoint-materialized once (it must materialize
    as the join build side regardless) and feeds the build side, the
    hot set, and the total — events is scanned exactly twice per run
    (probe + profile), with zero eager jobs. The hot threshold
    (count > support·total) is the same rule sketch-then-confirm
    enforced, so the detected set — and a fortiori the salted join's
    result, which is hot-set-invariant — is unchanged."""
    from gads_etl_spark.operators.skew import selective_salted_join

    support = 0.0008
    ev = load_table(spark, sf_dir, "events")
    profile = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_user_events")
    ).localCheckpoint(eager=False)
    total = profile.agg(
        F.sum("n_user_events").cast("double").alias("_total"))
    hot = (
        profile.crossJoin(F.broadcast(total))
        .where(F.col("n_user_events") > F.lit(support) * F.col("_total"))
        .select("user_id")
    )
    joined = selective_salted_join(
        ev.select("user_id", "event_type", "value"), profile, "user_id", hot)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("n_user_events").cast("long").alias("weight_sum"),
        (F.sum(_cents()).cast("double") / 100).alias("value_sum"),
    )


@register(
    "ev_dedup_latest",
    oracle="""
    SELECT user_id, event_type, event_id, ts FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("events", "dedup", "window"),
)
def ev_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the latest event per (user, type) — the streaming-state dedup
    shape (same window form as U3 authority selection)."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


@register(
    "ev_asof_attribution",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, max(value) AS view_value
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts,
           v.ts AS view_ts,
           CAST(date_diff('microsecond', v.ts, p.ts) AS BIGINT) AS wait_us,
           CAST(round(v.view_value * 100) AS BIGINT) AS view_cents
    FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    tags=("events", "asof", "join"),
)
def ev_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attributed to the user's latest prior view.

    Spark has no ASOF JOIN; the scalable form is union + ordered window
    fill (operators/temporal.py:asof_join) — one shuffle on user_id,
    linear output, instead of the per-key range cross-product a naive
    ``p.ts >= v.ts`` join plans as. Views pre-dedup to one row per
    (user, ts) so tie-breaking is deterministic in both engines.
    """
    from gads_etl_spark.operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    j = asof_join(purchases, views, on="user_id")
    return j.select(
        "event_id", "user_id", "ts",
        F.col("r_ts").alias("view_ts"),
        (F.unix_micros("ts") - F.unix_micros("r_ts")).alias("wait_us"),
        F.round(F.col("r_view_value") * 100).cast("bigint").alias("view_cents"),
    )


@register(
    "ev_error_bursts",
    oracle=f"""
    WITH bursts AS (
        SELECT min(ts) AS start_ts, max(ts) AS end_ts
        FROM events WHERE event_type = 'error'
        GROUP BY date_trunc('hour', ts) HAVING count(*) >= 6
    )
    SELECT b.start_ts, b.end_ts, count(*) AS n_events,
           count(DISTINCT e.user_id) AS n_users,
           CAST(sum({_CENTS}) AS BIGINT) AS total_cents
    FROM events e JOIN bursts b ON e.ts >= b.start_ts AND e.ts <= b.end_ts
    GROUP BY b.start_ts, b.end_ts
    ORDER BY b.start_ts
    """,
    tags=("events", "interval", "join"),
)
def ev_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: all traffic inside error-burst windows.

    Bursts are irregular intervals (first..last error in hours with ≥6
    errors); joining events into them has no equality key. The scale-safe
    plan (operators/temporal.py:interval_join) buckets both sides by hour
    and equi-joins on the bucket with the precise range as a residual
    filter — shuffle on dense bucket keys, never |events| × |intervals|.
    """
    from gads_etl_spark.operators.temporal import interval_join

    ev = load_table(spark, sf_dir, "events")
    bursts = (
        ev.where(F.col("event_type") == "error")
        .groupBy(F.date_trunc("hour", "ts").alias("_h"))
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("_n"),
        )
        .where(F.col("_n") >= 6)
        .select("start_ts", "end_ts")
    )
    return (
        interval_join(ev, bursts, ts_col="ts", start_col="start_ts",
                      end_col="end_ts", bucket="hour")
        .groupBy("start_ts", "end_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_cents()).alias("total_cents"),
        )
        .orderBy("start_ts")
    )


@register(
    "ev_rollup_incremental",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS bucket_start, event_type,
           count(*) AS n_events,
           CAST(sum({_CENTS}) AS BIGINT) AS cents
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY bucket_start, event_type
    """,
    tags=("events", "rollup", "incremental"),
)
def ev_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance: the rollup is built from the
    first two-thirds of the month, then the remaining (``late``) events
    fold in via additive merge — and the result must equal the full
    recompute (the oracle). Incremental cost scales with the delta's
    buckets, never with history (operators/rollup.py).
    """
    from gads_etl_spark.operators import rollup as R

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-21").cast("timestamp")
    prior = R.hourly_rollup(ev.where(F.col("ts") < cutoff))
    merged = R.merge_additive(prior, ev.where(F.col("ts") >= cutoff))
    return merged.orderBy("bucket_start", "event_type")


@register(
    "ev_view_purchase_attribution",
    oracle="""
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
           v.event_id AS view_id, v.ts AS view_ts,
           p.value AS amount
    FROM events p
    JOIN events v
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    tags=("events", "streaming", "join"),
)
def ev_view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase attribution: every purchase joined to the same
    user's views in the preceding 30 minutes — the SAME function that
    runs as a watermarked stream-stream join in streaming/jobs.py,
    executed here in batch mode (one API, both execution modes; stream ==
    batch is asserted in tests/test_streaming.py). The time-bound
    predicate is what makes the streaming form's state finite.
    """
    from gads_etl_spark.streaming.jobs import stream_stream_attribution

    ev = load_table(spark, sf_dir, "events")
    out = stream_stream_attribution(
        ev.where(F.col("event_type") == "view"),
        ev.where(F.col("event_type") == "purchase"),
    )
    return out.select(
        F.col("p_user").alias("user_id"), "purchase_id", "purchase_ts",
        "view_id", "view_ts", "amount",
    )


@register(
    "ev_funnel_cohorts",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS t1
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST(CAST(s1.t1 AS DATE) AS TIMESTAMP) AS cohort_date,
           CAST(count(*) AS BIGINT) AS n_signed_up,
           CAST(count(s2.t2) AS BIGINT) AS n_viewed,
           CAST(count(s3.t3) AS BIGINT) AS n_purchased
    FROM s1
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    WHERE s1.t1 IS NOT NULL
    GROUP BY 1
    """,
    tags=("events", "window", "funnel"),
)
def ev_funnel_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → first view after it → first purchase after
    that) cohorted by signup date. Expressed as three chained conditional
    window-mins over ONE partitionBy(user_id) — Catalyst plans a single
    Exchange for all three Window nodes, and the per-user fold that
    follows reuses the same partitioning, so the whole funnel costs one
    shuffle on user_id plus one tiny shuffle on cohort_date. The oracle
    writes the identical semantics as three joined aggregation CTEs.
    Strict `>` step ordering keeps tie handling engine-identical.

    At 100 TB: window-over-user beats the oracle's 3x self-join shape —
    events shuffle once, and skewed power users stay a single partition's
    problem (AQE skew split applies) instead of a join blowup.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    typed = ev.select("user_id", "ts", "event_type")
    staged = (
        typed
        .withColumn("t1", F.min(F.when(F.col("event_type") == "signup",
                                       F.col("ts"))).over(w))
        .withColumn("t2", F.min(F.when((F.col("event_type") == "view")
                                       & (F.col("ts") > F.col("t1")),
                                       F.col("ts"))).over(w))
        .withColumn("t3", F.min(F.when((F.col("event_type") == "purchase")
                                       & (F.col("ts") > F.col("t2")),
                                       F.col("ts"))).over(w))
    )
    per_user = (
        staged.groupBy("user_id")
        .agg(F.first("t1").alias("t1"), F.first("t2").alias("t2"),
             F.first("t3").alias("t3"))
        .where(F.col("t1").isNotNull())
    )
    return (
        per_user.groupBy(F.to_date("t1").cast("timestamp").alias("cohort_date"))
        .agg(F.count(F.lit(1)).alias("n_signed_up"),
             F.count("t2").alias("n_viewed"),
             F.count("t3").alias("n_purchased"))
    )


@register(
    "ev_funnel_cohorts_stagewise",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) FILTER (WHERE event_type = 'signup') AS t1
      FROM events GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'view' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST(CAST(s1.t1 AS DATE) AS TIMESTAMP) AS cohort_date,
           CAST(count(*) AS BIGINT) AS n_signed_up,
           CAST(count(s2.t2) AS BIGINT) AS n_viewed,
           CAST(count(s3.t3) AS BIGINT) AS n_purchased
    FROM s1
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
    WHERE s1.t1 IS NOT NULL
    GROUP BY 1
    """,
    tags=("events", "funnel", "skew"),
)
def ev_funnel_cohorts_stagewise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened funnel twin of ev_funnel_cohorts (same oracle).

    The window formulation shuffles EVERY event once on user_id and a
    bot-grade hot user lands whole in one window task (AQE skew splitting
    does not apply to window exchanges — it spills, slowly). This variant
    computes each stage as filter → aggregate/join:

    - t1: groupBy over ONLY signup events — partial aggregation combines
      a hot user map-side, so the shuffle carries one row per (user,
      input partition), immune to event-volume skew.
    - t2/t3: each joins ONLY that stage's events against the previous
      stage's per-user scalar — shuffle joins, where AQE skew splitting
      DOES apply, carrying just the stage subset.

    Trade-off: k filtered scans+shuffles instead of one full shuffle.
    Wins when stage events are sparse relative to total volume (the
    typical funnel: signups ≪ views ≪ all events) or when user skew is
    pathological; the window form wins when stages cover most events and
    skew is mild. Both are registered so the planner choice is explicit.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    per_user = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return (
        per_user.groupBy(F.to_date("t1").cast("timestamp").alias("cohort_date"))
        .agg(F.count(F.lit(1)).alias("n_signed_up"),
             F.count("t2").alias("n_viewed"),
             F.count("t3").alias("n_purchased"))
    )


@register(
    "ev_scd2_history",
    oracle="""
    WITH ord AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), ver AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version
      FROM ord
    ), runs AS (
      SELECT user_id, version, event_type,
             MIN(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
      FROM ver GROUP BY user_id, version, event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER wv AS valid_to,
           lead(valid_from) OVER wv IS NULL AS is_current,
           n_events
    FROM runs
    WINDOW wv AS (PARTITION BY user_id ORDER BY version)
    """,
    tags=("events", "scd2", "window"),
)
def ev_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD history of each user's event_type: consecutive
    same-type runs collapse to one row with [valid_from, valid_to)
    validity and an is_current flag. (event_id tiebreaks equal
    timestamps, making run membership deterministic.)

    Single hashpartitioning(user_id) Exchange for all four keyed steps —
    asserted by the plan gate in tests/test_plan_quality.py.
    """
    from gads_etl_spark.operators.temporal import scd2_history

    ev = load_table(spark, sf_dir, "events")
    return scd2_history(
        ev, key_col="user_id", attr_col="event_type",
        ts_col="ts", tiebreak_col="event_id",
    )


@register(
    "ev_heavy_hitters",
    oracle="""
    WITH tot AS (SELECT count(*) AS total FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           round(count(*) / (SELECT CAST(total AS DOUBLE) FROM tot), 6) AS share
    FROM events GROUP BY user_id
    HAVING count(*) > 0.0008 * (SELECT total FROM tot)
    """,
    tags=("events", "skew", "sketch"),
)
def ev_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key detection via the sketch-then-confirm pattern: freqItems
    (single-pass, bounded state) proposes a guaranteed SUPERSET of the
    keys above the support threshold; an exact count over the candidate
    keys alone confirms — so the answer is exact without ever hash-
    aggregating the full 100 TB keyspace. The result is what feeds the
    skew mitigations (salted joins, AQE skew audit).
    """
    from gads_etl_spark.operators.skew import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    hh = heavy_hitters(ev, "user_id", support=0.0008)
    return hh.select("user_id", F.col("n").cast("long").alias("n"),
                     F.round("share", 6).alias("share"))


@register(
    "ev_distinct_sketch_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(*) AS BIGINT) AS n_events,
           true AS est_within_5pct,
           true AS merge_route_invariant
    FROM events GROUP BY event_type
    """,
    tags=("events", "rollup", "approx-agg"),
)
def ev_distinct_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-user rollup: per-day Datasketches HLL sketches
    unioned up to event_type (operators/rollup.py::sketch_distinct_rollup
    / merge_sketch_rollup) — the incremental form COUNT(DISTINCT) cannot
    take, since distinct counts don't add across days but sketch
    registers max-merge losslessly.

    Certificate oracle in the op_approx_distinct style: exact counts
    are value-checked outright; the sketch estimate must sit within 5%
    of exact, and merging by two DIFFERENT routes — day→type directly
    vs day→(type, week)→type — must estimate identically (union is
    associative on registers, and the estimate is a pure function of
    the merged registers). The earlier certificate compared against a
    directly-updated sketch and was scale-fragile: a direct sketch
    carries the HIP estimator, which a union result cannot, so the two
    estimates coincide only in sparse-exact mode — true at sf0.01,
    false at the 10x tier's 15k distincts (round-12 find). Route
    invariance is the property a rollup hierarchy actually relies on,
    and it holds at every scale.
    """
    from gads_etl_spark.operators.rollup import (
        merge_sketch_rollup,
        sketch_distinct_rollup,
        union_sketch_rollup,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = sketch_distinct_rollup(
        ev.withColumn("day", F.to_date("ts"))
        .withColumn("week", F.weekofyear("ts")),
        "user_id", ["event_type", "week", "day"])
    merged = merge_sketch_rollup(daily, ["event_type"]).select(
        "event_type", "distinct_est")
    via_week = merge_sketch_rollup(
        union_sketch_rollup(daily, ["event_type", "week"]),
        ["event_type"]).select(
        "event_type", F.col("distinct_est").alias("week_route_est"))
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("long").alias("exact_users"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    return merged.join(via_week, "event_type").join(exact, "event_type").select(
        "event_type", "exact_users", "n_events",
        (F.abs(F.col("distinct_est") - F.col("exact_users"))
         <= 0.05 * F.col("exact_users")).alias("est_within_5pct"),
        (F.col("distinct_est") == F.col("week_route_est"))
        .alias("merge_route_invariant"),
    )


@register(
    "ev_rate_anomalies",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), stats AS (
        SELECT event_type, h, c,
               CAST(count(*) OVER w AS BIGINT) AS n,
               CAST(sum(c) OVER w AS BIGINT) AS s,
               CAST(sum(c * c) OVER w AS BIGINT) AS ss
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, CAST(h AS TIMESTAMP) AS hour, c AS n_events,
           s AS trailing_sum, n AS trailing_hours
    FROM stats
    WHERE n >= 12 AND (n * c - s) * (n * c - s) > 9 * (n * ss - s * s)
    """,
    tags=("events", "window", "anomaly"),
)
def ev_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate spike detection with EXACT arithmetic: an hour is
    anomalous when its count sits more than 3 trailing-window standard
    deviations from the trailing-24h mean — but the z-test is stated
    cross-multiplied in integers, (n·c − s)² > 9·(n·ss − s²), so no
    division, no sqrt, no float: both engines agree bit-for-bit, and
    the result is layout-invariant by construction.

    Scale shape: one groupBy to hourly counts (map-side partial), one
    bounded ROWS window per event_type. Overflow note: the squared terms
    need |n·c| < ~3·10⁹ to stay in BIGINT — per-(type, hour) counts
    beyond that (extreme even at 100 TB) call for pre-scaling counts or
    narrower buckets, which changes no semantics.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = (Window.partitionBy("event_type").orderBy("h")
         .rowsBetween(-24, -1))
    stats = hourly.select(
        "event_type", "h", "c",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("c").over(w).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("ss"),
    )
    lhs = (F.col("n") * F.col("c") - F.col("s"))
    rhs = F.lit(9) * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    return stats.where((F.col("n") >= 12) & (lhs * lhs > rhs)).select(
        "event_type", F.col("h").alias("hour"), F.col("c").alias("n_events"),
        F.col("s").alias("trailing_sum"), F.col("n").alias("trailing_hours"),
    )


@register(
    "ev_cohort_retention",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), firsts AS (
        SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY f.cohort_day, day_offset
    """,
    tags=("events", "agg", "cohort"),
)
def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each subsequent active day — the product-analytics staple.

    Scale shape: two aggregates on user_id (distinct activity days, then
    first day) share a partitioning, the join is user-keyed, and the
    final rollup groups on (cohort, offset) — bounded by days², not
    users. All integer/date arithmetic, bit-identical engines.
    """
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(firsts, "user_id")
        .groupBy("cohort_day",
                 F.datediff(F.col("day"), F.col("cohort_day"))
                 .cast("long").alias("day_offset"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .withColumn("cohort_day", F.col("cohort_day").cast("timestamp"))
    )


@register(
    "ev_gap_histogram",
    oracle="""
    WITH gaps AS (
        SELECT event_type,
               CAST(floor(epoch(ts) - epoch(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap_s
        FROM events
    )
    SELECT event_type,
           CAST(floor(gap_s / 600) AS BIGINT) AS gap_bucket_10min,
           CAST(count(*) AS BIGINT) AS n_gaps
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type, gap_bucket_10min
    """,
    tags=("events", "window", "agg"),
)
def ev_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap distribution per event type: seconds between a
    user's consecutive events, bucketed to 10-minute bins — the input
    to choosing a sessionization gap empirically rather than by folklore.

    One ``partitionBy(user_id)`` window (the same exchange every
    session-family query pays), integer epoch arithmetic, then a
    map-side-combining rollup bounded by types × buckets. The (ts,
    event_id) ordering tiebreak keeps lag deterministic under
    simultaneous events.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts carries sub-second precision: subtract fractional epoch seconds,
    # then FLOOR explicitly on both engines (DuckDB's double->BIGINT cast
    # rounds where Spark's truncates — floor sidesteps both conventions)
    gaps = ev.select(
        "event_type",
        F.floor(F.col("ts").cast("double")
                - F.lag(F.col("ts").cast("double")).over(w))
        .cast("long").alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return gaps.groupBy(
        "event_type",
        F.floor(F.col("gap_s") / 600).cast("long").alias("gap_bucket_10min"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_gaps"))


@register(
    "ev_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), t AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n_transitions,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT from_type, to_type, n_transitions, n_users,
           round(CAST(n_transitions AS DOUBLE) /
                 sum(n_transitions) OVER (PARTITION BY from_type),
                 6) AS p_next
    FROM t
    """,
    tags=("events", "paths", "agg"),
)
def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-path transition matrix: for each consecutive event pair per
    user (ordered by ts with the event_id tiebreak), count (from_type →
    to_type) transitions, the distinct users making them, and the
    row-normalized next-step probability — the first-order Markov view
    of product flows that funnel queries hard-code and this one derives.

    One ``partitionBy(user_id)`` window (the session-family exchange),
    then a rollup bounded by |types|² — 25 rows here at any corpus
    size; the probability normalization is a window over that bounded
    rollup, not over events. Exact-integer counts divide at the end, so
    the rounded probabilities agree bit-for-bit with the oracle.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    t = seq.groupBy(
        F.col("prev_type").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    row = Window.partitionBy("from_type")
    return t.select(
        "from_type", "to_type", "n_transitions", "n_users",
        F.round(F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(row), 6).alias("p_next"),
    )


@register(
    "ev_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS p2
      FROM events
    )
    SELECT p2 || ' > ' || p1 || ' > ' || event_type AS path,
           CAST(count(*) AS BIGINT) AS n_paths,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE p2 IS NOT NULL
    GROUP BY 1
    ORDER BY n_paths DESC, path ASC
    LIMIT 20
    """,
    tags=("events", "paths", "topk"),
)
def ev_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user paths (consecutive event-type trigrams
    per user, ts + event_id ordered) by frequency — the path-mining
    companion to the transition matrix: where the matrix shows
    one-step dynamics, this surfaces the actual journeys.

    Same single user-keyed window exchange; the rollup is bounded by
    |types|³ and the top-k is a TakeOrdered over that bounded set with
    a deterministic (count desc, path asc) tiebreak.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(F.col("p2").isNotNull())
    return (
        seq.select(
            F.concat_ws(" > ", "p2", "p1", "event_type").alias("path"),
            "user_id",
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"),
             F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(20)
    )
