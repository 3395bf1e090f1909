"""Data-layout operators: bucketed tables and range layout for scan locality.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Bucketing
pays that shuffle once at write time: both tables hash-partitioned into
the same number of buckets on the join key, sorted within buckets, so
every later join/aggregation on that key plans with **zero Exchange** —
Catalyst proves the children's output partitioning satisfies the join's
requirement. This is the batch analogue of the reference's fixed
partition layout (raw partitions keyed by the logical key,
reference docs/raw_sink_contract.md:4-13): choose the layout once,
every downstream read benefits.

Rules of thumb encoded here:
- bucket count ≈ total size / healthy task size (128-512 MB); must match
  on both sides of a co-located join.
- ``sortBy`` the bucket key so merge-join needs no per-task sort.
- range layout (``repartitionByRange`` + ``sortWithinPartitions``) is the
  alternative when reads filter by range (dates): min/max footer stats
  then prune whole files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "errorifexists",
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted managed parquet table.

    Joins and aggregations between tables bucketed on the same key with
    the same ``n_buckets`` plan without any Exchange (see
    tests/test_layout.py for the plan proof).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sort = cols if sort_cols is None else (
        [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, cols[0], *cols[1:])
        .sortBy(sort[0], *sort[1:])
        .format("parquet")
        .saveAsTable(table)
    )


def write_range_layout(
    df: DataFrame,
    path: str,
    range_cols: list[str] | str,
    n_files: int,
    mode: str = "errorifexists",
) -> None:
    """Persist ``df`` as parquet range-clustered on ``range_cols``.

    Each output file covers a narrow value range, so parquet footer
    min/max stats let later range filters skip whole files — the poor
    man's clustered index, and the right layout when the hot predicate
    is a range (dates, ids) rather than an equi-join key.
    """
    cols = [range_cols] if isinstance(range_cols, str) else list(range_cols)
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)
