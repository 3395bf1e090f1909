"""Phase-instrument pagerank's small path at sf0.1 (fresh session).

Times: pair derivation + staged write, outw window + checkpoint, stats
probe, initial ranks, then each iteration's action boundary (forced with
a noop-count on the checkpoint cadence only — mirroring the real loop's
lazy structure would hide per-iteration cost, so we instead time the
whole loop and the final materialization separately).
"""
import os
import sys
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
t0 = time.time()
li = spark.read.parquet(f"{sf}/lineitem.parquet")
pairs = (
    li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    .select(F.explode("ps").alias("src"), "ps")
    .select("src", F.explode("ps").alias("dst"))
    .where(F.col("src") != F.col("dst"))
    .groupBy("src", "dst")
    .agg(F.count(F.lit(1)).cast("long").alias("w"))
)
from gads_etl_spark.operators.graph import pagerank  # noqa: E402

# whole-call wall, twice (warm fs cache on 2nd)
for run in range(3):
    t = time.time()
    out = pagerank(pairs, weight="w", iterations=8)
    n = out.write.format("noop").mode("overwrite").save()
    print(f"run{run} total: {time.time()-t:.2f}s", flush=True)

# phase decomposition (manual replication of the small path)
import shutil
import tempfile

from pyspark.sql.window import Window

t = time.time()
stage_dir = tempfile.mkdtemp(prefix="exp_pr_stage_")
w = F.col("w").cast("long")
e0 = pairs.select(F.col("src"), F.col("dst"), w.alias("w"))
e0.write.mode("overwrite").option("compression", "zstd").parquet(stage_dir)
print(f"phase1 staged write: {time.time()-t:.2f}s", flush=True)
staged_bytes = sum(e.stat().st_size for e in os.scandir(stage_dir) if e.is_file())
print(f"staged_bytes: {staged_bytes}", flush=True)
staged = spark.read.schema(e0.schema).parquet(stage_dir)
t = time.time()
prev = spark.conf.get("spark.sql.shuffle.partitions")
spark.conf.set("spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism))
e = staged.withColumn("outw", F.sum("w").over(Window.partitionBy("src"))).localCheckpoint()
print(f"phase2 outw window+ckpt: {time.time()-t:.2f}s", flush=True)
t = time.time()
stats = e.agg(F.countDistinct("src").alias("n"), F.max("w").alias("wm")).collect()[0]
print(f"stats probe: {time.time()-t:.2f}s  n={stats['n']} wm={stats['wm']}", flush=True)
n, wmax = stats["n"], stats["wm"]
scale, damping_pct = 1_000_000_000_000, 85
mul = "(pr_scaled * w) div outw"
teleport = ((100 - damping_pct) * scale) // (100 * n)
t = time.time()
r = e.select("src").distinct().select(
    F.col("src").alias("node"), F.lit(scale // n).cast("long").alias("pr_scaled"))
for i in range(8):
    ti = time.time()
    contrib = (e.join(r.hint("shuffle_hash"), e.src == r.node)
               .select(F.col("dst").alias("node"),
                       F.expr(f"CAST({mul} AS BIGINT)").alias("c")))
    r = contrib.groupBy("node").agg(
        F.expr(f"CAST({teleport} + (85 * sum(c)) div 100 AS BIGINT)").alias("pr_scaled"))
    if (i + 1) % 3 == 0 and i + 1 < 8:
        r = r.localCheckpoint()
        print(f"  iter{i+1} (ckpt): {time.time()-ti:.2f}s", flush=True)
t = time.time()
r.select("node", "pr_scaled").write.format("noop").mode("overwrite").save()
print(f"loop+final action: {time.time()-t:.2f}s", flush=True)
spark.conf.set("spark.sql.shuffle.partitions", prev)
shutil.rmtree(stage_dir, ignore_errors=True)

# variant: broadcast the rank side each iteration
t = time.time()
r = e.select("src").distinct().select(
    F.col("node") if False else F.col("src").alias("node"),
    F.lit(scale // n).cast("long").alias("pr_scaled"))
spark.conf.set("spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism))
for i in range(8):
    contrib = (e.join(F.broadcast(r), e.src == r.node)
               .select(F.col("dst").alias("node"),
                       F.expr(f"CAST({mul} AS BIGINT)").alias("c")))
    r = contrib.groupBy("node").agg(
        F.expr(f"CAST({teleport} + (85 * sum(c)) div 100 AS BIGINT)").alias("pr_scaled"))
    if (i + 1) % 3 == 0 and i + 1 < 8:
        r = r.localCheckpoint()
t = time.time()
r.select("node", "pr_scaled").write.format("noop").mode("overwrite").save()
print(f"BROADCAST loop+final action: {time.time()-t:.2f}s", flush=True)
spark.conf.set("spark.sql.shuffle.partitions", prev)
