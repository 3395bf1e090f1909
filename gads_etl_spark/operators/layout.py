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


def zorder_code(a, b, bits: int = 16):
    """Morton (Z-order) code: interleave the low ``bits`` of two
    non-negative integer columns — bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1. Pure JVM bit arithmetic (one expression tree,
    codegen'd)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("long")
               * F.lit(1 << (2 * i)).cast("long"))
            + (F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long")
               * F.lit(1 << (2 * i + 1)).cast("long"))
        )
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
    mode: str = "errorifexists",
) -> None:
    """Persist ``df`` parquet clustered on the Z-order curve of TWO
    columns — multi-dimensional file skipping.

    Range layout gives perfect pruning on one column and none on any
    other; the Morton curve's locality means each output file covers a
    bounded rectangle in (a, b) space, so footer min/max stats prune
    files for predicates on EITHER column (at ~sqrt efficiency each,
    instead of 1.0/0.0). The right layout when two independent
    predicates are both hot — e.g. (customer_id, date) lookups.

    Columns are linearly scaled to ``bits``-bit grid cells from their
    min/max (one tiny aggregation). Uniform-ish keys scale well; heavily
    skewed keys should be rank-bucketized (approxQuantile) first.
    """
    from pyspark.sql import functions as F

    lo_hi = df.agg(
        F.min(col_a).alias("a_lo"), F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"), F.max(col_b).alias("b_hi"),
    ).collect()[0]
    cells = (1 << bits) - 1

    def scaled(col, lo, hi):
        span = max(hi - lo, 1)
        return F.floor(
            (F.col(col).cast("double") - F.lit(float(lo))) * cells / span
        ).cast("long")

    z = zorder_code(scaled(col_a, lo_hi["a_lo"], lo_hi["a_hi"]),
                    scaled(col_b, lo_hi["b_lo"], lo_hi["b_hi"]), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def compact_small_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_bytes: int = 128 << 20,
) -> int:
    """Rewrite a parquet directory into ``ceil(total_bytes /
    target_bytes)`` files at ``out_path``; returns the output file count.

    Small-file sprawl is the steady-state failure mode of incremental
    sinks (the reference's per-day seal — raw_sink_contract.md — lands
    one file per partition per run): at 100 TB a scan's task count and
    the namenode/listing load are both per-file, so periodic compaction
    is what keeps read amplification flat. File sizes come from the
    Hadoop FileSystem API, so the same code sizes local disk, HDFS, or
    object stores. ``coalesce`` (not ``repartition``) merges partitions
    without a shuffle — output files pack input splits, which is exactly
    right for already-uniform parquet; use a shuffle only if inputs are
    pathologically skewed.
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    total = 0
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            total += f.getLen()
    n = max(1, -(-total // target_bytes))
    spark.read.parquet(path).coalesce(n).write.mode("errorifexists").parquet(out_path)
    out = jvm.org.apache.hadoop.fs.Path(out_path)
    oit = fs.listFiles(out, True)
    count = 0
    while oit.hasNext():
        if oit.next().getPath().getName().endswith(".parquet"):
            count += 1
    return count
