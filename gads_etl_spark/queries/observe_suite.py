"""Observability aggregations A1–A8 + top-k O3/O4 as registered queries.

The reference computes these with single-threaded Python loops over state
rows (src/gads_etl/cli.py:255-490); here each is a distributed DataFrame
aggregation over the deterministic state fixture, oracle-checked. These are
tiny control-table queries — one shuffle of |groups| each; the same code
runs unchanged at 10M partitions.

Parity map (reference src/gads_etl/cli.py):
- A1 count-by-status + zero-fill      → cli.py:266-274,293-296
- A2 per-group min/max date           → cli.py:268,275-281,298-301
- A3 min/max/avg attempts (null→0)    → cli.py:282-291,303-306
- A4 attempt histogram buckets        → cli.py:439-456
- A5 classified conditional counts    → cli.py:415-433
- A6 argmin/argmax by updated_at      → cli.py:326-336,476-488
- A7 freshness per group              → cli.py:350-365
- A8 date-gap detection               → cli.py:381-398
- O3 top-k failed by attempts         → cli.py:308-318
- O4 hot partitions, failed-first     → cli.py:458-467
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gads_etl_spark.queries import fixtures as fx
from gads_etl_spark.queries.registry import register

_KEY_SQL = "source, customer_id, query_name, CAST(logical_date AS TIMESTAMP) AS logical_date"


def _key_cols():
    return [
        F.col("source"), F.col("customer_id"), F.col("query_name"),
        F.col("logical_date").cast("timestamp").alias("logical_date"),
    ]


@register(
    "obs_status_counts",
    oracle=fx.oracle("""
    SELECT d.status, coalesce(c.n, 0) AS n_partitions
    FROM (VALUES ('pending'), ('success'), ('failed')) AS d(status)
    LEFT JOIN (SELECT status, count(*) AS n FROM state GROUP BY status) c
      ON d.status = c.status
    """),
    tags=("observe", "agg", "A1"),
)
def obs_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: count-by-status with zero-fill of the three statuses — counts
    join a status dimension so absent statuses still report 0
    (reference initializes the dict with all three, cli.py:267)."""
    state = fx.synthetic_state(spark, sf_dir)
    dim = spark.createDataFrame([("pending",), ("success",), ("failed",)], ["status"])
    counts = state.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    return (
        dim.join(counts, "status", "left")
        .select("status", F.coalesce(F.col("n"), F.lit(0)).alias("n_partitions"))
    )


@register(
    "obs_date_ranges",
    oracle=fx.oracle("""
    SELECT source, query_name,
           CAST(min(logical_date) AS TIMESTAMP) AS min_date,
           CAST(max(logical_date) AS TIMESTAMP) AS max_date,
           count(*) AS n_partitions
    FROM state GROUP BY source, query_name
    """),
    tags=("observe", "agg", "A2"),
)
def obs_date_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: per (source, query_name) logical-date coverage range."""
    state = fx.synthetic_state(spark, sf_dir)
    return state.groupBy("source", "query_name").agg(
        F.min("logical_date").cast("timestamp").alias("min_date"),
        F.max("logical_date").cast("timestamp").alias("max_date"),
        F.count(F.lit(1)).alias("n_partitions"),
    )


@register(
    "obs_attempt_stats",
    oracle=fx.oracle("""
    SELECT min(coalesce(attempt_count, 0)) AS attempt_min,
           max(coalesce(attempt_count, 0)) AS attempt_max,
           CAST(sum(coalesce(attempt_count, 0)) AS DOUBLE) / count(*) AS attempt_avg
    FROM state
    """),
    tags=("observe", "agg", "A3"),
)
def obs_attempt_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: min/max/avg attempt_count with null→0 (reference treats a NULL
    attempt as 0, cli.py:282)."""
    state = fx.synthetic_state(spark, sf_dir)
    a = F.coalesce(F.col("attempt_count"), F.lit(0))
    return state.agg(
        F.min(a).alias("attempt_min"),
        F.max(a).alias("attempt_max"),
        (F.sum(a).cast("double") / F.count(F.lit(1))).alias("attempt_avg"),
    )


_BUCKET_SQL = """CASE WHEN coalesce(attempt_count, 0) <= 2 THEN '1-2'
                      WHEN coalesce(attempt_count, 0) <= 5 THEN '3-5'
                      WHEN coalesce(attempt_count, 0) <= 10 THEN '6-10'
                      ELSE '10+' END"""


@register(
    "obs_attempt_histogram",
    oracle=fx.oracle(f"""
    SELECT d.bucket, coalesce(c.n, 0) AS n_partitions
    FROM (VALUES ('1-2'), ('3-5'), ('6-10'), ('10+')) AS d(bucket)
    LEFT JOIN (
        SELECT {_BUCKET_SQL} AS bucket, count(*) AS n FROM state GROUP BY 1
    ) c ON d.bucket = c.bucket
    """),
    tags=("observe", "agg", "A4"),
)
def obs_attempt_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: attempt-count histogram into the reference's fixed buckets
    1-2 / 3-5 / 6-10 / 10+ (cli.py:439-456), zero-filled."""
    state = fx.synthetic_state(spark, sf_dir)
    a = F.coalesce(F.col("attempt_count"), F.lit(0))
    bucket = (
        F.when(a <= 2, "1-2").when(a <= 5, "3-5").when(a <= 10, "6-10").otherwise("10+")
    )
    dim = spark.createDataFrame([("1-2",), ("3-5",), ("6-10",), ("10+",)], ["bucket"])
    counts = state.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))
    return dim.join(counts, "bucket", "left").select(
        "bucket", F.coalesce(F.col("n"), F.lit(0)).alias("n_partitions")
    )


@register(
    "obs_retry_overview",
    oracle=fx.oracle("""
    SELECT count(*) AS total,
           count(CASE WHEN status = 'failed' THEN 1 END) AS failed,
           count(CASE WHEN status = 'failed'
                       AND contains(coalesce(error_message, ''), '[terminal]')
                      THEN 1 END) AS terminal,
           count(CASE WHEN status = 'failed'
                       AND NOT contains(coalesce(error_message, ''), '[terminal]')
                      THEN 1 END) AS retryable_failed
    FROM state
    """),
    tags=("observe", "agg", "A5"),
)
def obs_retry_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: total / failed / terminal / retryable-failed in one conditional
    aggregation pass (count(CASE WHEN ...)) — reference cli.py:415-433."""
    state = fx.synthetic_state(spark, sf_dir)
    failed = F.col("status") == "failed"
    terminal = F.coalesce(F.col("error_message"), F.lit("")).contains("[terminal]")
    return state.agg(
        F.count(F.lit(1)).alias("total"),
        F.count(F.when(failed, 1)).alias("failed"),
        F.count(F.when(failed & terminal, 1)).alias("terminal"),
        F.count(F.when(failed & ~terminal, 1)).alias("retryable_failed"),
    )


@register(
    "obs_failed_extremes",
    oracle=fx.oracle("""
    SELECT min_by(customer_id, updated_at) AS oldest_customer_id,
           min_by(query_name, updated_at) AS oldest_query_name,
           CAST(min_by(logical_date, updated_at) AS TIMESTAMP) AS oldest_logical_date,
           min(updated_at) AS oldest_updated_at,
           max_by(customer_id, updated_at) AS newest_customer_id,
           max_by(query_name, updated_at) AS newest_query_name,
           CAST(max_by(logical_date, updated_at) AS TIMESTAMP) AS newest_logical_date,
           max(updated_at) AS newest_updated_at
    FROM state WHERE status = 'failed'
    """),
    tags=("observe", "agg", "A6"),
)
def obs_failed_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: argmin/argmax — oldest and newest failed partition by updated_at
    via min_by/max_by (reference scans for min/max rows, cli.py:326-336,
    476-488). updated_at is unique per partition, so this is deterministic.
    """
    state = fx.synthetic_state(spark, sf_dir).where(F.col("status") == "failed")
    u = F.col("updated_at")
    return state.agg(
        F.min_by("customer_id", u).alias("oldest_customer_id"),
        F.min_by("query_name", u).alias("oldest_query_name"),
        F.min_by("logical_date", u).cast("timestamp").alias("oldest_logical_date"),
        F.min(u).alias("oldest_updated_at"),
        F.max_by("customer_id", u).alias("newest_customer_id"),
        F.max_by("query_name", u).alias("newest_query_name"),
        F.max_by("logical_date", u).cast("timestamp").alias("newest_logical_date"),
        F.max(u).alias("newest_updated_at"),
    )


@register(
    "obs_freshness",
    oracle=fx.oracle(f"""
    SELECT source, query_name,
           CAST(min(logical_date) AS TIMESTAMP) AS earliest,
           CAST(max(logical_date) AS TIMESTAMP) AS latest,
           CAST(date_diff('day', max(logical_date), DATE '{fx.FIXED_TODAY}') AS BIGINT) AS lag_days,
           count(DISTINCT logical_date) AS total_successful_partitions
    FROM state WHERE status = 'success'
    GROUP BY source, query_name
    """),
    tags=("observe", "agg", "A7"),
)
def obs_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: freshness per (source, query_name): earliest/latest success date,
    lag vs a fixed 'today' (pinned for determinism), distinct success dates
    (reference cli.py:350-365; countDistinct ↔ the per-group date set A10).
    """
    state = fx.synthetic_state(spark, sf_dir).where(F.col("status") == "success")
    return state.groupBy("source", "query_name").agg(
        F.min("logical_date").cast("timestamp").alias("earliest"),
        F.max("logical_date").cast("timestamp").alias("latest"),
        F.datediff(F.lit(fx.FIXED_TODAY).cast("date"), F.max("logical_date"))
        .cast("long").alias("lag_days"),
        F.countDistinct("logical_date").alias("total_successful_partitions"),
    )


@register(
    "obs_date_gaps",
    oracle=fx.oracle("""
    SELECT source, customer_id, query_name,
           CAST(prev_date + 1 AS TIMESTAMP) AS gap_start,
           CAST(logical_date - 1 AS TIMESTAMP) AS gap_end,
           date_diff('day', prev_date, logical_date) - 1 AS gap_days
    FROM (
        SELECT source, customer_id, query_name, logical_date,
               lag(logical_date) OVER (PARTITION BY source, customer_id, query_name
                                       ORDER BY logical_date) AS prev_date
        FROM state WHERE status = 'success'
    )
    WHERE prev_date IS NOT NULL AND date_diff('day', prev_date, logical_date) > 1
    """),
    tags=("observe", "window", "calendar", "A8"),
)
def obs_date_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: missing-date runs between min and max success date per
    (source, customer_id, query_name) — reference _find_date_gaps
    (cli.py:381-398) walks the calendar in Python; here the full window
    machinery: sequence → explode the per-group calendar, anti-join
    observed dates, then lag() run-coalescing (a date starts a new gap run
    unless it extends the previous missing day).

    The oracle states the same result non-procedurally: consecutive
    observed dates more than one day apart bracket exactly one gap run.
    """
    success = (
        fx.synthetic_state(spark, sf_dir)
        .where(F.col("status") == "success")
        .select("source", "customer_id", "query_name", "logical_date")
    )
    keys = ["source", "customer_id", "query_name"]
    # Per-group calendar: one row per day between min and max observed date.
    calendar = (
        success.groupBy(*keys)
        .agg(F.min("logical_date").alias("d0"), F.max("logical_date").alias("d1"))
        .select(*keys, F.explode(F.sequence("d0", "d1")).alias("logical_date"))
    )
    missing = calendar.join(success, [*keys, "logical_date"], "left_anti")
    # Run-coalescing: a missing day that doesn't directly follow another
    # missing day starts a new gap run; gap_id = running sum of starts.
    w = Window.partitionBy(*keys).orderBy("logical_date")
    runs = (
        missing
        .withColumn("prev_missing", F.lag("logical_date").over(w))
        .withColumn(
            "is_start",
            F.when(
                F.col("prev_missing").isNull()
                | (F.datediff("logical_date", F.col("prev_missing")) > 1),
                1,
            ).otherwise(0),
        )
        .withColumn("gap_id", F.sum("is_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ))
    )
    return (
        runs.groupBy(*keys, "gap_id")
        .agg(
            F.min("logical_date").cast("timestamp").alias("gap_start"),
            F.max("logical_date").cast("timestamp").alias("gap_end"),
            F.count(F.lit(1)).alias("gap_days"),
        )
        .drop("gap_id")
    )


@register(
    "obs_top_failed",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, coalesce(attempt_count, 0) AS attempts, updated_at
    FROM state WHERE status = 'failed'
    ORDER BY coalesce(attempt_count, 0) DESC, customer_id, query_name, logical_date
    LIMIT 10
    """),
    tags=("observe", "topk", "O3"),
)
def obs_top_failed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: top-10 failed partitions by attempts with the reference's full
    deterministic tiebreak (-attempts, customer_id, query_name, date) —
    cli.py:308-318. The key is unique, so LIMIT is engine-independent."""
    state = fx.synthetic_state(spark, sf_dir).where(F.col("status") == "failed")
    attempts = F.coalesce(F.col("attempt_count"), F.lit(0))
    return (
        state.select(*_key_cols(), attempts.alias("attempts"), F.col("updated_at"))
        .orderBy(F.desc("attempts"), "customer_id", "query_name", "logical_date")
        .limit(10)
    )


@register(
    "obs_hot_partitions",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, coalesce(attempt_count, 0) AS attempts, status, updated_at
    FROM state
    ORDER BY coalesce(attempt_count, 0) DESC,
             CASE WHEN status = 'failed' THEN 0 ELSE 1 END,
             customer_id, query_name, logical_date
    LIMIT 10
    """),
    tags=("observe", "topk", "O4"),
)
def obs_hot_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: hot partitions by attempts with failed-first tiebreak
    (reference sorts on `status != "failed"`, cli.py:458-467)."""
    state = fx.synthetic_state(spark, sf_dir)
    attempts = F.coalesce(F.col("attempt_count"), F.lit(0))
    failed_first = F.when(F.col("status") == "failed", 0).otherwise(1)
    return (
        state.select(
            *_key_cols(), attempts.alias("attempts"), F.col("status"), F.col("updated_at")
        )
        .orderBy(F.desc("attempts"), failed_first, "customer_id", "query_name", "logical_date")
        .limit(10)
    )
