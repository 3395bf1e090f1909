"""Trace pagerank() internals via settrace-free monkeypatching: wrap the
expensive py4j-touching methods with timers to see where the wall goes.
"""
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(4 * int(cpus)))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false").getOrCreate())
li = spark.read.parquet(f"{sf}/lineitem.parquet")
pairs = (
    li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    .select(F.explode("ps").alias("src"), "ps")
    .select("src", F.explode("ps").alias("dst"))
    .where(F.col("src") != F.col("dst"))
    .groupBy("src", "dst")
    .agg(F.count(F.lit(1)).cast("long").alias("w"))
)

from pyspark.sql import DataFrame  # noqa: E402

_orig_ckpt = DataFrame.localCheckpoint
_orig_collect = DataFrame.collect


def timed_ckpt(self, *a, **k):
    t = time.time()
    out = _orig_ckpt(self, *a, **k)
    print(f"    localCheckpoint: {time.time()-t:.2f}s", flush=True)
    return out


def timed_collect(self, *a, **k):
    t = time.time()
    out = _orig_collect(self, *a, **k)
    print(f"    collect: {time.time()-t:.2f}s", flush=True)
    return out


DataFrame.localCheckpoint = timed_ckpt
DataFrame.collect = timed_collect

import pyspark.sql.readwriter as rw  # noqa: E402

_orig_parquet = rw.DataFrameWriter.parquet


def timed_parquet(self, *a, **k):
    t = time.time()
    out = _orig_parquet(self, *a, **k)
    print(f"    writer.parquet: {time.time()-t:.2f}s", flush=True)
    return out


rw.DataFrameWriter.parquet = timed_parquet

from gads_etl_spark.operators.graph import pagerank  # noqa: E402

for run in range(3):
    t = time.time()
    out = pagerank(pairs, weight="w", iterations=8)
    print("  [call returned]", flush=True)
    out.write.format("noop").mode("overwrite").save()
    print(f"run{run} total: {time.time()-t:.2f}s", flush=True)
