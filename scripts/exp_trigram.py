"""Root-cause experiment for ext_trigram_typicality's 15.36x sf1->sf10
bench ratio (round-13 verdict task 4: the one unexplained above-linear
row under the noop-action protocol).

Hypothesis under test: the eager ``localCheckpoint`` of the trigram
relation (~1.6B rows of (doc_id, 3-char gram) at sf10) is the
inflection. localCheckpoint stores DESERIALIZED rows
(MEMORY_AND_DISK), so the materialized set is ~50x the size of the
compressed parquet input; at sf1 (~160M rows) it marginally fits the
31g heap, at sf10 it evicts/spills and GC-thrashes — a memory-cliff
super-linearity, not a plan-shape one. The alternative the original
docstring rejected ("two full corpus explodes would double the
dominant cost") is re-measured honestly: the explode is a pipelined
map stage feeding partial aggregates on both consumers, so recompute
costs 2x CPU of one scan stage but ZERO materialization.

Variants (each measured in its own fresh child JVM, 1 warmup +
median-of-3, noop-sink action — the bench protocol):

- checkpoint : the registered plan (localCheckpoint eager)
- recompute  : no materialization; the trigram explode runs twice
               (once into the frequent-set aggregate, once into the
               probe side of the broadcast join)
- disk_kryo  : persist(StorageLevel.DISK_ONLY) — serialized spill,
               bounded memory, one explode

Usage:
  python scripts/exp_trigram.py                 # orchestrate all
  python scripts/exp_trigram.py --child V DIR   # one variant (internal)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

VARIANTS = ("checkpoint", "recompute", "disk_kryo")


def build(spark, sf_dir: str, variant: str):
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from gads_etl_spark.catalog import load_table
    from gads_etl_spark.operators.util import spread

    docs = load_table(spark, sf_dir, "documents")
    tri = spread(docs.select("doc_id", "text")).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, greatest(length(text) - 2, 0)),"
            " i -> substring(lower(text), i, 3))"
        ))).alias("g"),
    )
    if variant == "checkpoint":
        tri = tri.localCheckpoint(eager=True)
    elif variant == "disk_kryo":
        tri = tri.persist(StorageLevel.DISK_ONLY)
    # recompute: leave tri lazy; both consumers re-derive it.
    freq = (
        tri.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 50).select("g", F.lit(1).alias("_f"))
    )
    return (
        tri.join(F.broadcast(freq), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.count("_f").cast("long").alias("n_typical"),
        )
    )


def child(variant: str, sf_dir: str) -> None:
    from gads_etl_spark.session import get_session

    spark = get_session("exp-trigram", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    import gc

    walls = []
    for _ in range(4):  # 1 warmup + 3 measured
        df = build(spark, sf_dir, variant)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
        # A persisted/checkpointed intermediate must not survive into
        # the next iteration (4 accumulated 1.6B-row checkpoints would
        # measure memory pressure the real bench — one query per run —
        # never sees). Drop the reference, then force both GCs so the
        # ContextCleaner unpersists before the next build.
        del df
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
    print(json.dumps({
        "variant": variant, "sf_dir": sf_dir,
        "warmup": round(walls[0], 4),
        "runs": [round(w, 4) for w in walls[1:]],
        "median": round(statistics.median(walls[1:]), 4),
    }))
    spark.stop()


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], sys.argv[i + 2])
        return
    # Variant subset as args (default: recompute only — the committed
    # BENCH_sf10.json row IS the checkpoint baseline at both tiers,
    # same fresh-JVM noop median-of-3 protocol, so re-measuring it
    # buys nothing the artifact doesn't already say).
    variants = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "recompute"]
    tiers = {
        "sf1": os.path.join(HERE, ".localdata", "sf1"),
        "sf10": os.path.join(HERE, ".localdata", "sf10"),
    }
    out: dict[str, dict] = {}
    for tier, sf_dir in tiers.items():
        for v in variants:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 v, sf_dir],
                capture_output=True, text=True)
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")), None)
            rec = json.loads(line) if line else {
                "error": (r.stderr or "")[-1500:]}
            out.setdefault(v, {})[tier] = rec
            print(f"# {v} @ {tier}: "
                  f"{rec.get('median', rec.get('error'))}", file=sys.stderr)
    for v, tiers_r in out.items():
        m1 = tiers_r.get("sf1", {}).get("median")
        m10 = tiers_r.get("sf10", {}).get("median")
        if m1 and m10:
            tiers_r["ratio_sf10_over_sf1"] = round(m10 / m1, 2)
    path = "/tmp/exp_trigram.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
