"""Diagnostic third-decade measurement for ext_pagerank.

The committed BENCH_sf100.json records the honest engine-default
outcome: the probe DIES of disk — the operator's DISK_ONLY edge
persist is ~2.4B rows x 32B (src, dst, w, outw) ~ 77 GB uncompressed,
over this host's ~60 GB free ("No space left on device" during
localCheckpoint, round 14; round 13's cut run hit the same wall with a
20 GB orphaned blockmgr dir making it worse). That is a HARNESS disk
ceiling, not a plan defect — on a cluster the persist is spread over
aggregate executor disk — but it leaves the iterative-shuffle scale
shape unmeasured at 1000x.

This script measures it under the one knob a disk-tight single node
would actually flip: ``spark.rdd.compress=true`` (LZ4 on serialized
persist blocks; integer edge tuples compress ~4-6x, bringing the
persist inside the ceiling at the cost of decode CPU on each of the 8
per-iteration re-reads). ONE warmup-less run — a 20+ minute execution
amortizes JVM warmup into noise, and the median-of-3 protocol would
cost an hour for a number that is explicitly labeled diagnostic and
never merged into BENCH_sf100.json.

Writes /tmp/exp_pagerank_sf100.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def child() -> None:
    from gads_etl_spark.queries import REGISTRY
    from gads_etl_spark.session import get_session

    spark = get_session("exp-pagerank-sf100", cpus=32, extra_conf={
        "spark.rdd.compress": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY["ext_pagerank"].fn(
        spark, os.path.join(HERE, ".localdata", "sf100"))
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(json.dumps({"query": "ext_pagerank", "sf": 100.0,
                      "wall": round(wall, 2),
                      "conf": {"spark.rdd.compress": "true"},
                      "runs": "single run, no warmup (diagnostic)"}))
    spark.stop()


def main() -> None:
    if "--child" in sys.argv:
        child()
        return
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        capture_output=True, text=True)
    line = next((ln for ln in r.stdout.splitlines()
                 if ln.startswith("{")), None)
    rec = json.loads(line) if line else {"error": (r.stderr or "")[-2000:]}
    with open("/tmp/exp_pagerank_sf100.json", "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
