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
        SELECT user_id, ts, {_CENTS} AS cents,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT *, sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
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
