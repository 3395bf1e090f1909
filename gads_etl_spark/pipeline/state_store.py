"""PartitionState ledger: tri-state control table with MERGE semantics.

Contract parity (reference src/gads_etl/state_store.py:44-57,
docs/state_store_contract.md):

- One row per logical partition; status ∈ {pending, success, failed};
  *absence of a row means implicit pending* (contract line 14) — callers
  anti-join an expected-partition universe to find implicit pendings.
- Upsert = ``INSERT ... ON CONFLICT DO UPDATE`` (state_store.py:123-163);
  here a MERGE: union current+updates, keep the update row per key.
- Single-writer discipline (only validators/control-plane write —
  docs/state_store_contract.md:32-33), preserved as a documented invariant.

Storage is a versioned parquet table with an atomically-swapped CURRENT
pointer — the same metadata-last publish trick as the raw zone, applied to
a control table. This is deliberately Delta-shaped: on a cluster with Delta
available, ``MERGE INTO`` replaces ``_commit`` one-for-one. The table is
tiny relative to data (one row per logical partition: ~10M rows at 100 TB),
so a full rewrite per merge batch is cheap and the swap is atomic.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from gads_etl_spark.pipeline.keys import LOGICAL_KEY

STATE_SCHEMA = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("customer_id", T.StringType(), False),
    T.StructField("query_name", T.StringType(), False),
    T.StructField("logical_date", T.DateType(), False),
    T.StructField("status", T.StringType(), False),
    T.StructField("current_run_id", T.StringType(), True),
    T.StructField("schema_version", T.StringType(), True),
    T.StructField("record_count", T.LongType(), True),
    T.StructField("updated_at", T.TimestampType(), False),
    T.StructField("error_message", T.StringType(), True),
    T.StructField("attempt_count", T.IntegerType(), True),
])

VALID_STATUSES = ("pending", "success", "failed")


def merge_upsert(current: DataFrame, updates: DataFrame,
                 key_cols: tuple[str, ...]) -> DataFrame:
    """Relational MERGE: updates win over current on key collision.

    Implemented as union + row_number over (key ORDER BY priority) — one
    shuffle on the key, no driver-side loop, scales to any table size.
    """
    cur = current.withColumn("_prio", F.lit(1))
    upd = updates.select(*current.columns).withColumn("_prio", F.lit(0))
    w = Window.partitionBy(*key_cols).orderBy("_prio")
    return (
        cur.unionByName(upd)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_prio", "_rn")
    )


class _VersionedTable:
    """Parquet table versions + atomic CURRENT pointer (single-writer)."""

    def __init__(self, spark: SparkSession, root: str, schema: T.StructType):
        self.spark = spark
        self.root = root.rstrip("/")
        self.schema = schema
        os.makedirs(self.root, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "CURRENT")

    def _current_version(self) -> str | None:
        try:
            with open(self._pointer) as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def read(self) -> DataFrame:
        v = self._current_version()
        if v is None:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.schema(self.schema).parquet(os.path.join(self.root, v))

    def commit(self, df: DataFrame) -> None:
        """Write a new version dir, then atomically swap the pointer.

        Readers see either the old or the new version — never a partial
        table (the control-plane analogue of the metadata-last seal).
        Old versions stay on disk until ``vacuum`` — free time travel
        for audits of control-table transitions.
        """
        version = f"v_{uuid.uuid4().hex[:12]}"
        df.select([f.name for f in self.schema.fields]).coalesce(1).write.parquet(
            os.path.join(self.root, version)
        )
        self._log_version(version)
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, self._pointer)

    @property
    def _log(self) -> str:
        return os.path.join(self.root, "VERSIONS")

    def _log_version(self, version: str) -> None:
        with open(self._log, "a") as f:
            f.write(version + "\n")

    def history(self) -> list[str]:
        """Committed versions, oldest first."""
        try:
            with open(self._log) as f:
                return [v for v in f.read().splitlines() if v]
        except FileNotFoundError:
            return []

    def read_version(self, version: str) -> DataFrame:
        """Time travel: read a specific committed version."""
        if version not in self.history():
            raise KeyError(f"unknown version {version!r}")
        return self.spark.read.schema(self.schema).parquet(
            os.path.join(self.root, version)
        )

    def vacuum(self, keep: int = 5) -> int:
        """Drop all but the newest ``keep`` versions (never the current).
        Returns the number of versions removed."""
        import shutil

        hist = self.history()
        current = self._current_version()
        drop = [v for v in hist[:-keep] if v != current] if len(hist) > keep else []
        for v in drop:
            shutil.rmtree(os.path.join(self.root, v), ignore_errors=True)
        remaining = [v for v in hist if v not in drop]
        tmp = self._log + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(remaining) + "\n")
        os.replace(tmp, self._log)
        return len(drop)


class StateStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self._table = _VersionedTable(spark, root, STATE_SCHEMA)

    def read(self) -> DataFrame:
        return self._table.read()

    def upsert(self, updates: DataFrame) -> None:
        """MERGE updates into the ledger (M1 — state_store.py:123-163)."""
        bad = updates.where(~F.col("status").isin(*VALID_STATUSES)).limit(1).count()
        if bad:
            raise ValueError(f"status must be one of {VALID_STATUSES}")
        self._table.commit(merge_upsert(self.read(), updates, LOGICAL_KEY))

    def commit(self, full_state: DataFrame) -> None:
        """Replace the whole ledger (control-plane bulk transitions)."""
        self._table.commit(full_state)

    def get(self, key) -> dict | None:
        """Composite-key point lookup (P5 — state_store.py:61-73)."""
        rows = (
            self.read()
            .where(
                (F.col("source") == key.source)
                & (F.col("customer_id") == key.customer_id)
                & (F.col("query_name") == key.query_name)
                & (F.col("logical_date") == F.lit(key.logical_date))
            )
            .collect()
        )
        return rows[0].asDict() if rows else None

    def list_states(
        self,
        status: str | None = None,
        customer_id: str | None = None,
        query_name: str | None = None,
        since=None,
        until=None,
        limit: int | None = None,
    ) -> DataFrame:
        """Filtered listing, newest first (P3/P4/O1/O2 —
        state_store.py:75-121: dynamic WHERE + ORDER BY updated_at DESC)."""
        df = self.read()
        if status is not None:
            df = df.where(F.col("status") == status)
        if customer_id is not None:
            df = df.where(F.col("customer_id") == customer_id)
        if query_name is not None:
            df = df.where(F.col("query_name") == query_name)
        if since is not None:
            df = df.where(F.col("logical_date") >= F.lit(since))
        if until is not None:
            df = df.where(F.col("logical_date") <= F.lit(until))
        df = df.orderBy(F.desc("updated_at"))
        if limit is not None:
            df = df.limit(limit)
        return df
