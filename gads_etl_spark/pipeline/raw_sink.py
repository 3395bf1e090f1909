"""Raw zone: immutable, hive-partitioned attempt storage with a manifest seal.

Contract parity (reference docs/raw_sink_contract.md, raw_sink_local.py,
raw_sink_object.py):

- One directory per ``(logical key, run_id)`` holding the payload; the
  partition becomes *visible and immutable* only when its manifest row
  exists (metadata-last seal — reference docs/storage_realism.md:35-40,
  raw_sink_local.py:44-48).
- Writing or sealing an already-sealed partition raises (overwrite refusal —
  reference raw_sink_local.py:34-36, docs/raw_sink_contract.md:48-51).
- run_id discovery goes through the manifest table, never a recursive
  directory listing — at 100 TB, listing a prefix with millions of objects
  is the classic S3 anti-pattern; a parquet manifest scan is one task
  (reference's delimiter-listing S8, raw_sink_object.py:72-88, upgraded).

Scale notes: payload is written by executors with Spark's committer (task
temp → rename), so partial attempts are never visible even before the seal
check. The manifest is an append-only parquet directory — each seal appends
one tiny file; readers aggregate with last-writer-wins. Works on any Hadoop
filesystem (file://, s3a://, ...).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gads_etl_spark.pipeline.keys import LOGICAL_KEY, PartitionKey

MANIFEST_SCHEMA = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("customer_id", T.StringType(), False),
    T.StructField("query_name", T.StringType(), False),
    T.StructField("logical_date", T.DateType(), False),
    T.StructField("run_id", T.StringType(), False),
    T.StructField("extracted_at", T.TimestampType(), False),
    T.StructField("schema_version", T.StringType(), False),
    T.StructField("record_count", T.LongType(), False),
    T.StructField("api_version", T.StringType(), True),
    T.StructField("query_signature", T.StringType(), True),
])


class SealedPartitionError(RuntimeError):
    """Raised on any attempt to mutate a sealed (manifested) partition."""


class RawZone:
    def __init__(self, spark: SparkSession, root: str, data_format: str = "json"):
        self.spark = spark
        self.root = root.rstrip("/")
        self.data_format = data_format
        self._manifest_dir = f"{self.root}/_manifest"

    # -- manifest ---------------------------------------------------------

    def manifest(self) -> DataFrame:
        """All sealed partitions. Empty DataFrame if nothing sealed yet."""
        try:
            return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self._manifest_dir)
        except Exception:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def is_sealed(self, key: PartitionKey, run_id: str) -> bool:
        m = self.manifest()
        return (
            m.where(
                (F.col("source") == key.source)
                & (F.col("customer_id") == key.customer_id)
                & (F.col("query_name") == key.query_name)
                & (F.col("logical_date") == F.lit(key.logical_date))
                & (F.col("run_id") == run_id)
            ).limit(1).count()
            > 0
        )

    # -- write path -------------------------------------------------------

    def partition_path(self, key: PartitionKey, run_id: str) -> str:
        return f"{self.root}/{key.relative_path()}/run_id={run_id}"

    def write_partition(
        self,
        df: DataFrame,
        key: PartitionKey,
        run_id: str,
        schema_version: str = "v1",
        api_version: str | None = None,
        query_signature: str | None = None,
    ) -> dict:
        """Write payload then seal with a manifest row (metadata-last).

        Returns the manifest row as a dict (incl. record_count, used by the
        validator's count check A9).
        """
        if self.is_sealed(key, run_id):
            raise SealedPartitionError(
                f"partition {key} run_id={run_id} is sealed; raw partitions are immutable"
            )
        path = self.partition_path(key, run_id)
        record_count = df.count()
        writer = df.write.mode("errorifexists")
        if self.data_format == "json":
            writer.json(path)
        else:
            writer.parquet(path)
        meta = {
            "source": key.source,
            "customer_id": key.customer_id,
            "query_name": key.query_name,
            "logical_date": key.logical_date,
            "run_id": run_id,
            "extracted_at": datetime.now(timezone.utc).replace(tzinfo=None),
            "schema_version": schema_version,
            "record_count": record_count,
            "api_version": api_version,
            "query_signature": query_signature,
        }
        self.seal(meta)
        return meta

    def seal(self, meta: dict) -> None:
        """Append the manifest row — the atomic publish point of a partition."""
        row_df = self.spark.createDataFrame([meta], MANIFEST_SCHEMA)
        row_df.coalesce(1).write.mode("append").parquet(self._manifest_dir)

    # -- read path --------------------------------------------------------

    def read_partition(self, key: PartitionKey, run_id: str,
                       schema: T.StructType | None = None) -> DataFrame:
        if not self.is_sealed(key, run_id):
            raise FileNotFoundError(
                f"partition {key} run_id={run_id} has no manifest row (unsealed ⇒ invisible)"
            )
        path = self.partition_path(key, run_id)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        if self.data_format == "json":
            return reader.option("mode", "FAILFAST").json(path)
        return reader.parquet(path)

    def list_run_ids(self, key: PartitionKey) -> list[str]:
        """Sorted run_ids of a logical partition, from the manifest (S8)."""
        rows = (
            self.manifest()
            .where(
                (F.col("source") == key.source)
                & (F.col("customer_id") == key.customer_id)
                & (F.col("query_name") == key.query_name)
                & (F.col("logical_date") == F.lit(key.logical_date))
            )
            .select(F.sort_array(F.collect_set("run_id")).alias("run_ids"))
            .collect()
        )
        return rows[0]["run_ids"] if rows else []

    def run_id_index(self) -> DataFrame:
        """Per logical key: sorted run_id set (distributed version of S8)."""
        return (
            self.manifest()
            .groupBy(*LOGICAL_KEY)
            .agg(F.sort_array(F.collect_set("run_id")).alias("run_ids"))
        )
