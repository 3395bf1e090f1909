"""Pipeline-semantics queries: the reference's signature dataflow operators.

Each query runs the *production* pipeline primitives (loader classify,
anti-join demotion, window authority dedup, MERGE upsert, implicit-pending
anti-join, backfill calendar, retry/terminal transitions, backoff filter)
over the deterministic control-plane fixture (queries.fixtures), checked
against a DuckDB oracle computing the same thing from the same parquet.

Reference parity map:
- J1 reconcile classify  → src/gads_etl/warehouse/loader.py:51-91
- J2 demotion            → src/gads_etl/warehouse/loader.py:92-107
- U3 authority dedup     → src/gads_etl/validator.py:59-71,118-121
- M1 merge upsert        → src/gads_etl/state_store.py:123-163
- P7 implicit pending    → docs/state_store_contract.md:14
- M7/J3 backfill plan    → src/gads_etl/cli.py:580-664
- M5 retry plan          → src/gads_etl/cli.py:138-232
- M6 mark-terminal       → src/gads_etl/cli.py:493-577,667-674
- §2.8 backoff filter    → docs/retry_daemon.md:13-24
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gads_etl_spark.pipeline.keys import LOGICAL_KEY
from gads_etl_spark.pipeline.loader import classify_targets, demotion_targets
from gads_etl_spark.pipeline.state_store import merge_upsert
from gads_etl_spark.queries import fixtures as fx
from gads_etl_spark.queries.registry import register

def _key_cols():
    return [
        F.col("source"), F.col("customer_id"), F.col("query_name"),
        F.col("logical_date").cast("timestamp").alias("logical_date"),
    ]


_KEY_SQL = "source, customer_id, query_name, CAST(logical_date AS TIMESTAMP) AS logical_date"


@register(
    "pq_reconcile_classify",
    oracle=fx.oracle("""
    SELECT s.source, s.customer_id, s.query_name,
           CAST(s.logical_date AS TIMESTAMP) AS logical_date,
           s.current_run_id, p.run_id AS pointer_run_id,
           CASE WHEN p.run_id IS NULL THEN 'load'
                WHEN p.run_id <> s.current_run_id THEN 'replace'
                ELSE 'noop' END AS action
    FROM state s LEFT JOIN pointers p
      ON s.source = p.source AND s.customer_id = p.customer_id
     AND s.query_name = p.query_name AND s.logical_date = p.logical_date
    WHERE s.status = 'success' AND s.current_run_id IS NOT NULL
    """),
    tags=("pipeline", "join", "J1"),
)
def pq_reconcile_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: LEFT-join classify success states vs pointers → load/replace/noop.

    Runs the production ``classify_targets`` (one join, no per-key lookups —
    reference loops a pointer lookup per state row, loader.py:72-77).
    """
    state = fx.synthetic_state(spark, sf_dir)
    pointers = fx.synthetic_pointers(spark, sf_dir)
    out = classify_targets(state.where(F.col("status") == "success"), pointers)
    return out.select(*_key_cols(), "current_run_id", "pointer_run_id", "action")


@register(
    "pq_demotions",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, run_id, schema_version
    FROM pointers p
    WHERE NOT EXISTS (
        SELECT 1 FROM state s
        WHERE s.status = 'success' AND s.current_run_id IS NOT NULL
          AND s.source = p.source AND s.customer_id = p.customer_id
          AND s.query_name = p.query_name AND s.logical_date = p.logical_date
    )
    """),
    tags=("pipeline", "antijoin", "J2"),
)
def pq_demotions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: pointers with no successful state → demote (anti-join)."""
    state = fx.synthetic_state(spark, sf_dir)
    pointers = fx.synthetic_pointers(spark, sf_dir)
    out = demotion_targets(state.where(F.col("status") == "success"), pointers)
    return out.select(*_key_cols(), "run_id", "schema_version")


@register(
    "pq_authority_dedup",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, run_id, record_count, n_runs
    FROM (
        SELECT *,
               row_number() OVER (PARTITION BY source, customer_id, query_name, logical_date
                                  ORDER BY run_id DESC) AS rn,
               count(*) OVER (PARTITION BY source, customer_id, query_name, logical_date) AS n_runs
        FROM attempts
    )
    WHERE rn = 1
    """),
    tags=("pipeline", "window", "dedup", "U3"),
)
def pq_authority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: last-writer-wins authority — one run per logical partition via
    ``row_number() over (key ORDER BY run_id DESC)``. run_ids are ISO-ms
    timestamps in the reference, so lexicographic == chronological
    (validator.py:118-121). One shuffle on the key; scales to any history.
    """
    attempts = fx.synthetic_attempts(spark, sf_dir)
    w = Window.partitionBy(*LOGICAL_KEY).orderBy(F.desc("run_id"))
    wc = Window.partitionBy(*LOGICAL_KEY)
    return (
        attempts
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_runs", F.count(F.lit(1)).over(wc))
        .where(F.col("rn") == 1)
        .select(*_key_cols(), "run_id", "record_count", "n_runs")
    )


_STATE_COLS = ("source", "customer_id", "query_name", "logical_date", "status",
               "current_run_id", "schema_version", "record_count", "updated_at",
               "error_message", "attempt_count", "pid")


@register(
    "pq_merge_upsert",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, status, current_run_id, schema_version, record_count,
           updated_at, error_message, attempt_count
    FROM (
        SELECT *, row_number() OVER (PARTITION BY source, customer_id, query_name, logical_date
                                     ORDER BY prio) AS rn
        FROM (
            SELECT {', '.join(_STATE_COLS)}, 1 AS prio FROM state
            UNION ALL
            SELECT source, customer_id, query_name, logical_date,
                   'failed' AS status, current_run_id, schema_version, record_count,
                   TIMESTAMP '{fx.FIXED_NOW}' AS updated_at,
                   'revalidation failed' AS error_message,
                   coalesce(attempt_count, 0) + 1 AS attempt_count, pid, 0 AS prio
            FROM state WHERE status = 'success' AND pid % 9 = 0
        )
    )
    WHERE rn = 1
    """),
    tags=("pipeline", "merge", "M1"),
)
def pq_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: MERGE a batch of updates into the ledger — updates win per key.

    Runs the production ``merge_upsert`` (union + row_number, one shuffle,
    no driver loop — the Spark form of INSERT..ON CONFLICT DO UPDATE,
    reference state_store.py:123-163).
    """
    state = fx.synthetic_state(spark, sf_dir)
    updates = state.where((F.col("status") == "success") & (F.col("pid") % 9 == 0)).select(
        "source", "customer_id", "query_name", "logical_date",
        F.lit("failed").alias("status"),
        "current_run_id", "schema_version", "record_count",
        F.lit(fx.FIXED_NOW).cast("timestamp").alias("updated_at"),
        F.lit("revalidation failed").alias("error_message"),
        (F.coalesce(F.col("attempt_count"), F.lit(0)) + 1).alias("attempt_count"),
        "pid",
    )
    merged = merge_upsert(state, updates, LOGICAL_KEY)
    return merged.select(
        *_key_cols(), "status", "current_run_id", "schema_version",
        "record_count", "updated_at", "error_message", "attempt_count",
    )


@register(
    "pq_implicit_pending",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL} FROM (
        SELECT 'google_ads' AS source,
               CAST(pid % 20 AS VARCHAR) AS customer_id,
               CASE WHEN pid % 2 = 0 THEN 'campaign_stats' ELSE 'ad_group_stats' END AS query_name,
               DATE '2024-01-01' + CAST(pid // 20 AS INT) AS logical_date
        FROM ({fx.PIDS_SQL})
    ) u
    WHERE NOT EXISTS (
        SELECT 1 FROM state s
        WHERE s.source = u.source AND s.customer_id = u.customer_id
          AND s.query_name = u.query_name AND s.logical_date = u.logical_date
    )
    """),
    tags=("pipeline", "antijoin", "P7"),
)
def pq_implicit_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: absence of a state row = implicit pending — anti-join the
    expected-partition universe against the ledger
    (docs/state_store_contract.md:14)."""
    universe = fx._with_key(fx.pids(spark, sf_dir))
    state = fx.synthetic_state(spark, sf_dir)
    missing = universe.join(state.select(*LOGICAL_KEY), list(LOGICAL_KEY), "left_anti")
    return missing.select(*_key_cols())


@register(
    "pq_backfill_plan",
    oracle=fx.oracle(f"""
    SELECT '3' AS customer_id, 'ad_group_stats' AS query_name,
           CAST(d AS TIMESTAMP) AS logical_date, 'enqueue' AS action
    FROM generate_series(DATE '2024-01-01', DATE '2024-02-19', INTERVAL 1 DAY) AS t(d)
    WHERE NOT EXISTS (
        SELECT 1 FROM state s
        WHERE s.customer_id = '3' AND s.query_name = 'ad_group_stats'
          AND s.logical_date = CAST(d AS DATE)
    )
    """),
    tags=("pipeline", "calendar", "M7"),
)
def pq_backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7/J3: backfill enqueue plan — calendar ``sequence`` + ``explode``
    anti-joined against existing state; only missing dates are enqueued
    (reference cli.py:603-655 loops per date + point lookup; here one job).
    """
    state = fx.synthetic_state(spark, sf_dir)
    calendar = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-02-19").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("logical_date")
    )
    existing = state.where(
        (F.col("customer_id") == "3") & (F.col("query_name") == "ad_group_stats")
    ).select("logical_date")
    plan = calendar.join(existing, "logical_date", "left_anti")
    return plan.select(
        F.lit("3").alias("customer_id"),
        F.lit("ad_group_stats").alias("query_name"),
        F.col("logical_date").cast("timestamp").alias("logical_date"),
        F.lit("enqueue").alias("action"),
    )


@register(
    "pq_retry_plan",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, attempt_count, error_message
    FROM state
    WHERE status = 'failed'
      AND NOT contains(coalesce(error_message, ''), '[terminal]')
      AND logical_date >= DATE '2024-01-10' AND logical_date <= DATE '2024-02-10'
    """),
    tags=("pipeline", "filter", "M5"),
)
def pq_retry_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: retry requeue plan — failed, non-terminal, date-windowed
    (reference cli.py:158-184: status filter + [terminal] substring guard
    P6 + since/until range P4)."""
    state = fx.synthetic_state(spark, sf_dir)
    return state.where(
        (F.col("status") == "failed")
        & ~F.coalesce(F.col("error_message"), F.lit("")).contains("[terminal]")
        & (F.col("logical_date") >= F.lit("2024-01-10").cast("date"))
        & (F.col("logical_date") <= F.lit("2024-02-10").cast("date"))
    ).select(*_key_cols(), "attempt_count", "error_message")


@register(
    "pq_mark_terminal",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, error_message,
           CASE WHEN contains(coalesce(error_message, ''), '[terminal]') THEN error_message
                WHEN coalesce(error_message, '') <> '' THEN '[terminal] ' || error_message
                ELSE '[terminal]' END AS new_error_message
    FROM state WHERE status = 'failed'
    """),
    tags=("pipeline", "string", "M6"),
)
def pq_mark_terminal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: mark-terminal message transform, idempotent — already-terminal
    messages pass through unchanged (reference cli.py:667-674)."""
    state = fx.synthetic_state(spark, sf_dir)
    base = F.coalesce(F.col("error_message"), F.lit(""))
    return state.where(F.col("status") == "failed").select(
        *_key_cols(), "error_message",
        F.when(base.contains("[terminal]"), F.col("error_message"))
        .when(base != "", F.concat(F.lit("[terminal] "), F.col("error_message")))
        .otherwise(F.lit("[terminal]"))
        .alias("new_error_message"),
    )


@register(
    "pq_retry_backoff",
    oracle=fx.oracle(f"""
    SELECT {_KEY_SQL}, attempt_count,
           CAST(least(300 * pow(2, coalesce(attempt_count, 1) - 1), 21600) AS DOUBLE) AS backoff_sec
    FROM state
    WHERE status = 'failed'
      AND epoch(TIMESTAMP '2024-03-01 08:00:00' - updated_at)
          >= least(300 * pow(2, coalesce(attempt_count, 1) - 1), 21600)
    """),
    tags=("pipeline", "filter", "backoff"),
)
def pq_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8: retry-daemon backoff eligibility — delay = 5 min ×
    2^(attempt−1) capped at 6 h; eligible when now − updated_at ≥ delay
    (docs/retry_daemon.md:13-24). Pure DataFrame filter, no state machine.
    """
    state = fx.synthetic_state(spark, sf_dir)
    backoff = F.least(
        F.lit(300.0) * F.pow(F.lit(2.0), F.coalesce(F.col("attempt_count"), F.lit(1)) - 1),
        F.lit(21600.0),
    )
    now = F.lit("2024-03-01 08:00:00").cast("timestamp")
    elapsed = now.cast("double") - F.col("updated_at").cast("double")
    return state.where((F.col("status") == "failed") & (elapsed >= backoff)).select(
        *_key_cols(), "attempt_count", backoff.cast("double").alias("backoff_sec"),
    )
