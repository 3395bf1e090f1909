"""Diagnostic for the two above-linear sf100 ratios in
BENCH_sf100.json (round-13 verdict task 1: q18_large_orders 11.37x and
ext_block_pack 10.41x for 10x data, against the artifact's own <=10
bar).

Hypothesis: both are hash/sort memory inflections from the LOCAL
harness's fixed ``spark.sql.shuffle.partitions = 32`` (sized to cores),
not plan defects. q18's first aggregate shuffles ~150M l_orderkey
groups into 32 partitions — ~4.7M groups per concurrent hash map; at
sf10 the 32 maps fit execution memory, at sf100 they cross the spill
threshold and the aggregate goes sort-based (disk). block_pack's
per-shard window sort crosses the same boundary marginally. On a real
cluster this knob is sized to the data (AQE coalesces the excess), so
the right local confirmation is: re-measure with more initial shuffle
partitions and watch the super-linearity disappear.

Measures each (query, shuffle-partitions) cell in its own fresh child
JVM, 1 warmup + median-of-3 noop-sink — the bench protocol. Writes
/tmp/exp_sf100_agg.json; numbers are DIAGNOSTIC (cited in SCALING.md's
sf100 section, not merged into BENCH_sf100.json, whose rows stay the
32-partition engine defaults).

Usage:
  python scripts/exp_sf100_agg.py                  # orchestrate
  python scripts/exp_sf100_agg.py --child Q NPART  # internal
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

SF100 = os.path.join(HERE, ".localdata", "sf100")
#: (query, shuffle-partition counts to measure). 32 is the engine
#: default (the committed BENCH_sf100.json condition); 128 shrinks each
#: concurrent per-partition hash/sort working set 4x. ext_fuzzy_passjoin
#: joined the list after its probe landed at 534.7s (20.4x for 10x data,
#: ~19 GB of temp_local spill observed) — same suspected inflection,
#: biggest cell, so only the 128 treatment runs (the 32 baseline IS the
#: probe's committed number).
CELLS = (
    ("q18_large_orders", (32, 128)),
    ("ext_block_pack", (32, 128)),
    ("ext_fuzzy_passjoin", (128,)),
)


def child(name: str, nparts: int) -> None:
    from gads_etl_spark.queries import REGISTRY
    from gads_etl_spark.session import get_session

    spark = get_session("exp-sf100-agg", cpus=32, extra_conf={
        "spark.sql.shuffle.partitions": str(nparts)})
    spark.sparkContext.setLogLevel("ERROR")
    walls = []
    for _ in range(4):  # 1 warmup + 3 measured
        df = REGISTRY[name].fn(spark, SF100)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    print(json.dumps({
        "query": name, "shuffle_partitions": nparts,
        "warmup": round(walls[0], 4),
        "runs": [round(w, 4) for w in walls[1:]],
        "median": round(statistics.median(walls[1:]), 4),
    }))
    spark.stop()


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        child(sys.argv[i + 1], int(sys.argv[i + 2]))
        return
    out: dict[str, dict] = {}
    for name, nparts in CELLS:
        for np_ in nparts:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 name, str(np_)],
                capture_output=True, text=True)
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith("{")), None)
            rec = json.loads(line) if line else {
                "error": (r.stderr or "")[-1500:]}
            out.setdefault(name, {})[str(np_)] = rec
            print(f"# {name} @ {np_} parts: "
                  f"{rec.get('median', rec.get('error'))}", file=sys.stderr)
    with open("/tmp/exp_sf100_agg.json", "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
