"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: Headline set: relational + operator + extension coverage. Kept explicit so
#: bench timing is stable as the registry grows.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_regional_revenue",
    "q06_forecast_revenue",
    "q18_large_orders",
]


def main() -> None:
    from gads_etl_spark.session import get_session
    from gads_etl_spark.queries import REGISTRY

    spark = get_session("gads-etl-spark-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in REGISTRY]
    extra = os.environ.get("SPARK_GRAFT_BENCH_EXTRA")
    if extra:
        names += [n for n in extra.split(",") if n in REGISTRY and n not in names]

    # Warm the JVM + parquet footers once so timings measure the queries.
    REGISTRY[names[0]].fn(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
