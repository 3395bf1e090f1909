"""Compare small-path pagerank loop shapes at sf0.1, whole-loop timing.

A) current: e localCheckpointed (partitioning lost), shuffle_hash join
B) broadcast rank side
C) e persisted (window partitioning preserved), shuffle_hash join
D) checkpoint-first (skip staged parquet write entirely)
Each shape runs 3x; median printed. Also verifies identical results.
"""
import os
import statistics
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(4 * cpus))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false").getOrCreate())
sc = spark.sparkContext
li = spark.read.parquet(f"{sf}/lineitem.parquet")
pairs = (
    li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    .select(F.explode("ps").alias("src"), "ps")
    .select("src", F.explode("ps").alias("dst"))
    .where(F.col("src") != F.col("dst"))
    .groupBy("src", "dst")
    .agg(F.count(F.lit(1)).cast("long").alias("w"))
)
scale, damp, iters = 1_000_000_000_000, 85, 8
mul = "(pr_scaled * w) div outw"


def run_loop(e, n, join_mode):
    teleport = ((100 - damp) * scale) // (100 * n)
    r = e.select("src").distinct().select(
        F.col("src").alias("node"),
        F.lit(scale // n).cast("long").alias("pr_scaled"))
    for i in range(iters):
        rj = F.broadcast(r) if join_mode == "bcast" else r.hint("shuffle_hash")
        contrib = (e.join(rj, e.src == r.node)
                   .select(F.col("dst").alias("node"),
                           F.expr(f"CAST({mul} AS BIGINT)").alias("c")))
        r = contrib.groupBy("node").agg(
            F.expr(f"CAST({teleport} + ({damp} * sum(c)) div 100 AS BIGINT)"
                   ).alias("pr_scaled"))
        if (i + 1) % 3 == 0 and i + 1 < iters:
            r = r.localCheckpoint()
    r.select("node", "pr_scaled").write.format("noop").mode("overwrite").save()
    return r


def fingerprint(r):
    return r.agg(F.sum(F.xxhash64("node", "pr_scaled").cast("decimal(38,0)"))
                 .alias("s")).collect()[0]["s"]


import shutil
import tempfile

prev = spark.conf.get("spark.sql.shuffle.partitions")
results = {}
fps = {}
for shape in ["A_ckpt_shuffle", "B_ckpt_bcast", "C_persist_shuffle",
              "D_ckptfirst_shuffle", "E_ckptfirst_bcast"]:
    walls = []
    for rep in range(3):
        t0 = time.time()
        w = F.col("w").cast("long")
        e0 = pairs.select("src", "dst", w.alias("w"))
        stage_dir = None
        persisted = None
        if shape.startswith(("A", "B", "C")):
            stage_dir = tempfile.mkdtemp(prefix="exp_pr_")
            e0.write.mode("overwrite").option("compression", "zstd").parquet(stage_dir)
            staged = spark.read.schema(e0.schema).parquet(stage_dir)
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
            ew = staged.withColumn("outw", F.sum("w").over(Window.partitionBy("src")))
            if shape.startswith("C"):
                persisted = ew.persist()
                persisted.count()
                e = persisted
            else:
                e = ew.localCheckpoint()
        else:
            # checkpoint-first: materialize derivation straight to blocks
            spark.conf.set("spark.sql.shuffle.partitions", str(cpus))
            e = e0.withColumn(
                "outw", F.sum("w").over(Window.partitionBy("src"))
            ).localCheckpoint()
            info = [i for i in sc._jsc.sc().getRDDStorageInfo()]
            if rep == 0:
                tot = sum(i.memSize() + i.diskSize() for i in info)
                print(f"  {shape} block bytes: {tot}", flush=True)
        stats = e.agg(F.countDistinct("src").alias("n"),
                      F.max("w").alias("wm")).collect()[0]
        r = run_loop(e, stats["n"], "bcast" if "bcast" in shape else "sh")
        if rep == 0:
            fps[shape] = fingerprint(r)
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if persisted is not None:
            persisted.unpersist()
        if stage_dir:
            shutil.rmtree(stage_dir, ignore_errors=True)
        walls.append(time.time() - t0)
    results[shape] = walls
    print(f"{shape}: {[f'{x:.2f}' for x in walls]} median {statistics.median(walls):.2f}", flush=True)
print("fingerprints:", fps, flush=True)
print("all equal:", len(set(fps.values())) == 1, flush=True)
