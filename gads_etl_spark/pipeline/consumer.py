"""Consumer read path: pointer-governed visibility + per-partition preview.

Contract parity (reference docs/consumer_contract.md:9-17,
consumer_preview.py): consumers NEVER scan the raw zone blindly — the
published pointer set defines exactly which ``(logical key, run_id)``
directories are visible; everything else (unsealed attempts, superseded
runs, failed partitions) does not exist for a reader.

Scale shape: one hive-discovery scan of the raw zone semi-joined against
the pointer table on (key, run_id) — partition pruning eliminates
non-published directories before any payload bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gads_etl_spark.pipeline.keys import LOGICAL_KEY
from gads_etl_spark.pipeline.pointer_store import PointerStore
from gads_etl_spark.pipeline.raw_sink import RawZone


def read_published(raw: RawZone, pointers: PointerStore) -> DataFrame:
    """All consumer-visible rows: zone ⋉ published pointers.

    The semi-join filters rows, not directories — Spark does not apply
    dynamic partition pruning to this shape (measured), so over the RAW
    zone superseded run_id directories are still *read* before being
    discarded. That is why the scale read path is the CURATED zone: it
    stages only published runs (curated_sink.materialize_plan), so the
    same semi-join there touches no superseded data, and the pointer
    check is a cheap consistency guard rather than the filter doing the
    heavy lifting. Reading raw through this function is correct at any
    scale, just not I/O-minimal when many superseded runs exist.
    """
    published = pointers.read().select(*LOGICAL_KEY, "run_id")
    return raw.read_all().join(
        F.broadcast(published), [*LOGICAL_KEY, "run_id"], "left_semi"
    )


def preview(raw: RawZone, pointers: PointerStore, sample_rows: int = 5,
            order_col: str | None = None) -> DataFrame:
    """O6: first N rows of each published partition.

    The reference takes storage-order heads (consumer_preview.py:39-42)
    but declares row order unstable (spec.md:41); distributed preview
    therefore orders by an explicit surrogate (``order_col``, else a
    deterministic per-partition file/offset surrogate) and takes
    ``row_number() <= N`` per logical partition.
    """
    df = read_published(raw, pointers)
    surrogate = F.col(order_col) if order_col else F.monotonically_increasing_id()
    w = Window.partitionBy(*LOGICAL_KEY, "run_id").orderBy(surrogate)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= sample_rows)
        .drop("_rn")
    )
