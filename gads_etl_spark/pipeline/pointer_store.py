"""Warehouse pointers: which run_id of each logical partition is published.

Contract parity (reference src/gads_etl/warehouse/pointer_store.py:8-18,
50-66): one row per logical key; upsert on publish, delete on demotion.
The pointer swap is the consumer-visible atomic publish point
(docs/warehouse_semantics.md:18-25,62).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gads_etl_spark.pipeline.keys import LOGICAL_KEY
from gads_etl_spark.pipeline.state_store import _VersionedTable

POINTER_SCHEMA = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("customer_id", T.StringType(), False),
    T.StructField("query_name", T.StringType(), False),
    T.StructField("logical_date", T.DateType(), False),
    T.StructField("run_id", T.StringType(), False),
    T.StructField("schema_version", T.StringType(), False),
    T.StructField("loaded_at", T.TimestampType(), False),
])


class PointerStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self._table = _VersionedTable(spark, root, POINTER_SCHEMA,
                                      key_cols=LOGICAL_KEY)

    def read(self) -> DataFrame:
        return self._table.read()

    def upsert(self, updates: DataFrame) -> None:
        """Publish/replace pointers (M2 — pointer_store.py:107-135).
        Bucketed MERGE: untouched buckets carry over by reference."""
        self._table.merge(updates)

    def delete(self, keys: DataFrame) -> None:
        """Demote: drop pointers whose key appears in ``keys`` (M2 delete —
        pointer_store.py:137-156). Anti-join rewrite confined to the
        buckets containing the demoted keys; no row-at-a-time."""
        self._table.delete_keys(keys)

    def get(self, key) -> dict | None:
        # Bucket-pruned like StateStore.get: reads one bucket, not the
        # whole pointer table (see state_store.read_bucket_for).
        rows = (
            self._table.read_bucket_for(
                (key.source, key.customer_id, key.query_name,
                 key.logical_date))
            .where(
                (F.col("source") == key.source)
                & (F.col("customer_id") == key.customer_id)
                & (F.col("query_name") == key.query_name)
                & (F.col("logical_date") == F.lit(key.logical_date))
            )
            .collect()
        )
        return rows[0].asDict() if rows else None
