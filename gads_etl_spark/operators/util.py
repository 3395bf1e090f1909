"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Spread an under-partitioned input across the cluster — and ONLY then.

    The local fixtures arrive as one compact parquet file, which would run
    a CPU-bound expansion stage (shingling, hashing, pair scoring) in a
    single task; repartitioning fixes that. But a blanket
    ``repartition(defaultParallelism)`` is wrong at scale: a 100 TB scan
    already yields ~maxPartitionBytes-sized splits, and the unconditional
    version shuffles the entire input to gain nothing. So shuffle only
    when the incoming partition count is below the cluster's parallelism.

    The partition-count probe is driver-side plan inspection (no job).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
