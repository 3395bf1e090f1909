"""Deterministic control-plane fixtures derived from the ``orders`` table.

The pipeline/observability suites need a PartitionState ledger and a
warehouse-pointer table to query (reference src/gads_etl/state_store.py:44-57,
warehouse/pointer_store.py:8-18). The driver fixtures don't ship one, so we
*derive* both deterministically from ``orders``: every engine (Spark and the
DuckDB oracle) computes the identical tables from the identical parquet, so
every control-plane query is hash-checkable.

Derivation (shared spec — keep the Spark builders and the SQL CTEs in
lockstep):

- ``pid`` = distinct ``o_orderkey % 1000`` → 1000 logical partitions at
  every scale factor (orderkeys are dense from 0).
- Logical key: ``customer_id = pid % 20``, ``logical_date = 2024-01-01 +
  pid // 20 days`` (50 dates), ``query_name`` = campaign_stats for even
  customers else ad_group_stats; ``(customer_id, logical_date)`` is
  injective (pid = 20*days + customer).
- A state row exists iff ``pid % 11 != 0`` — absence = implicit pending
  (reference docs/state_store_contract.md:14).
- ``status`` from ``pid % 7``: 0 → pending, 1-4 → success, 5/6 → failed.
  (7 is coprime to 20, so success dates per customer have gaps — feeds A8.)
- ``attempt_count = NULLIF(pid % 13, 0)`` (nulls exercise the null→0 rules).
- ``current_run_id``: NULL for pending, NULL for failed pids divisible by
  5, else ``run-<lpad(pid % 97)>``.
- ``error_message``: failed only; pids divisible by 4 carry the
  ``[terminal]`` marker (reference cli.py:181,418-420).
- ``updated_at = 2024-03-01 00:00:00 + pid minutes``.
- Pointers (m = pid % 10): published success partitions at m∈{3,4} point at
  a stale run (→ replace), m∈{5,6,7} at the current run (→ no-op); other
  success pids have no pointer (→ load). Non-success/absent pids with
  m∈{2,9} have a dangling pointer (→ demote).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gads_etl_spark.catalog import load_table

#: Fixed "now" for anything time-relative, so results are reproducible.
FIXED_TODAY = "2024-06-01"
FIXED_NOW = "2024-03-02 00:00:00"

# ---------------------------------------------------------------------------
# DuckDB CTE fragments (compose into oracle SQL as WITH state AS (...), ...)
# ---------------------------------------------------------------------------

PIDS_SQL = "SELECT DISTINCT o_orderkey % 1000 AS pid FROM orders"

_KEY_SQL = """
    'google_ads' AS source,
    CAST(pid % 20 AS VARCHAR) AS customer_id,
    CASE WHEN pid % 2 = 0 THEN 'campaign_stats' ELSE 'ad_group_stats' END AS query_name,
    DATE '2024-01-01' + CAST(pid // 20 AS INT) AS logical_date
"""

STATE_SQL = f"""
SELECT
    {_KEY_SQL},
    CASE WHEN pid % 7 = 0 THEN 'pending'
         WHEN pid % 7 <= 4 THEN 'success'
         ELSE 'failed' END AS status,
    CASE WHEN pid % 7 = 0 THEN NULL
         WHEN pid % 7 >= 5 AND pid % 5 = 0 THEN NULL
         ELSE 'run-' || lpad(CAST(pid % 97 AS VARCHAR), 3, '0') END AS current_run_id,
    'v' || CAST(1 + pid % 2 AS VARCHAR) AS schema_version,
    CASE WHEN pid % 7 BETWEEN 1 AND 4 THEN (pid * 37) % 1000 ELSE NULL END AS record_count,
    TIMESTAMP '2024-03-01 00:00:00' + INTERVAL (pid) MINUTE AS updated_at,
    CASE WHEN pid % 7 >= 5 THEN
        (CASE WHEN pid % 4 = 0 THEN '[terminal] ' ELSE '' END) || 'error pid ' || CAST(pid AS VARCHAR)
    ELSE NULL END AS error_message,
    NULLIF(pid % 13, 0) AS attempt_count,
    pid
FROM ({PIDS_SQL})
WHERE pid % 11 <> 0
"""

POINTER_SQL = f"""
SELECT
    {_KEY_SQL},
    CASE WHEN pid % 11 <> 0 AND pid % 7 BETWEEN 1 AND 4 AND pid % 10 IN (5, 6, 7)
             THEN 'run-' || lpad(CAST(pid % 97 AS VARCHAR), 3, '0')
         ELSE 'run-old-' || lpad(CAST(pid % 89 AS VARCHAR), 3, '0') END AS run_id,
    'v1' AS schema_version,
    TIMESTAMP '2024-02-15 00:00:00' + INTERVAL (pid) MINUTE AS loaded_at,
    pid
FROM ({PIDS_SQL})
WHERE (pid % 11 <> 0 AND pid % 7 BETWEEN 1 AND 4 AND pid % 10 IN (3, 4, 5, 6, 7))
   OR ((pid % 11 = 0 OR pid % 7 = 0 OR pid % 7 >= 5) AND pid % 10 IN (2, 9))
"""

#: Multi-attempt history: pid gets attempts 0..pid%3, run_id suffixed per
#: attempt — drives the U3 authority-dedup (last-writer-wins) query.
ATTEMPTS_SQL = f"""
SELECT
    {_KEY_SQL},
    'run-' || lpad(CAST(pid % 97 AS VARCHAR), 3, '0') || '-' || CAST(att AS VARCHAR) AS run_id,
    (pid * 31 + att * 7) % 1000 AS record_count,
    pid
FROM (SELECT pid, unnest(generate_series(0, pid % 3)) AS att FROM ({PIDS_SQL}))
"""


def _with_oracle_tables(body: str) -> str:
    """Wrap a SELECT body with the fixture CTEs."""
    return (
        f"WITH state AS ({STATE_SQL}),\n"
        f"pointers AS ({POINTER_SQL}),\n"
        f"attempts AS ({ATTEMPTS_SQL})\n{body}"
    )


oracle = _with_oracle_tables

# ---------------------------------------------------------------------------
# Spark builders (DataFrame API, same spec)
# ---------------------------------------------------------------------------


def pids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .select((F.col("o_orderkey") % 1000).alias("pid"))
        .distinct()
    )


def _with_key(df: DataFrame) -> DataFrame:
    pid = F.col("pid")
    return df.select(
        F.lit("google_ads").alias("source"),
        (pid % 20).cast("string").alias("customer_id"),
        F.when(pid % 2 == 0, "campaign_stats").otherwise("ad_group_stats").alias("query_name"),
        F.date_add(F.lit("2024-01-01").cast("date"), (pid / F.lit(20)).cast("int")).alias("logical_date"),
        pid,
    )


def _run_id(pid: F.Column, modulus: int = 97, prefix: str = "run-") -> F.Column:
    return F.concat(F.lit(prefix), F.lpad((pid % modulus).cast("string"), 3, "0"))


def synthetic_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived PartitionState ledger (see module docstring spec)."""
    pid = F.col("pid")
    s = pid % 7
    base = _with_key(pids(spark, sf_dir).where(pid % 11 != 0))
    return base.select(
        "source", "customer_id", "query_name", "logical_date",
        F.when(s == 0, "pending").when(s <= 4, "success").otherwise("failed").alias("status"),
        F.when(s == 0, F.lit(None).cast("string"))
        .when((s >= 5) & (pid % 5 == 0), F.lit(None).cast("string"))
        .otherwise(_run_id(pid)).alias("current_run_id"),
        F.concat(F.lit("v"), (F.lit(1) + pid % 2).cast("string")).alias("schema_version"),
        F.when(s.between(1, 4), (pid * 37) % 1000).cast("long").alias("record_count"),
        (F.lit("2024-03-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=pid.cast("int"))).alias("updated_at"),
        F.when(
            s >= 5,
            F.concat(
                F.when(pid % 4 == 0, F.lit("[terminal] ")).otherwise(F.lit("")),
                F.lit("error pid "), pid.cast("string"),
            ),
        ).alias("error_message"),
        F.nullif(pid % 13, F.lit(0)).alias("attempt_count"),
        "pid",
    )


def synthetic_pointers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived warehouse-pointer table (see module docstring spec)."""
    pid = F.col("pid")
    s = pid % 7
    m = pid % 10
    present = (
        ((pid % 11 != 0) & s.between(1, 4) & m.isin(3, 4, 5, 6, 7))
        | (((pid % 11 == 0) | (s == 0) | (s >= 5)) & m.isin(2, 9))
    )
    base = _with_key(pids(spark, sf_dir).where(present))
    pid2 = F.col("pid")
    current = (pid2 % 11 != 0) & (pid2 % 7).between(1, 4) & (pid2 % 10).isin(5, 6, 7)
    return base.select(
        "source", "customer_id", "query_name", "logical_date",
        F.when(current, _run_id(pid2)).otherwise(_run_id(pid2, 89, "run-old-")).alias("run_id"),
        F.lit("v1").alias("schema_version"),
        (F.lit("2024-02-15 00:00:00").cast("timestamp")
         + F.make_interval(mins=pid2.cast("int"))).alias("loaded_at"),
        "pid",
    )


def synthetic_attempts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-run attempt history per logical partition (for U3 dedup)."""
    pid, att = F.col("pid"), F.col("att")
    exploded = pids(spark, sf_dir).select(
        pid, F.explode(F.sequence(F.lit(0), (pid % 3).cast("int"))).alias("att")
    )
    return exploded.select(
        F.lit("google_ads").alias("source"),
        (pid % 20).cast("string").alias("customer_id"),
        F.when(pid % 2 == 0, "campaign_stats").otherwise("ad_group_stats").alias("query_name"),
        F.date_add(F.lit("2024-01-01").cast("date"), (pid / F.lit(20)).cast("int")).alias("logical_date"),
        F.concat(_run_id(pid), F.lit("-"), att.cast("string")).alias("run_id"),
        ((pid * 31 + att * 7) % 1000).alias("record_count"),
        "pid",
    )
