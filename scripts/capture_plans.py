"""Capture explain("formatted") snapshots for named queries into
plans/<tag>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence (the judge reads these files instead of running Spark).

Usage: python scripts/capture_plans.py --tag r16 --suffix before name...
       python scripts/capture_plans.py --tag r16 --suffix after  name...
Env:   SPARK_GRAFT_PLAN_SF (default /root/testdata/sf0.1 — plans are
       captured at the BENCH tier so size-dependent AQE/broadcast
       choices match what the bench actually runs).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from gads_etl_spark.queries import REGISTRY
    from gads_etl_spark.session import get_session

    sf = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_session("plan-capture", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in args.names:
        if name not in REGISTRY:
            print(f"!! unknown query {name}", file=sys.stderr)
            rc = 2
            continue
        try:
            df = REGISTRY[name].fn(spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 — snapshot best-effort
            plan = f"PLAN CAPTURE FAILED: {type(exc).__name__}: {exc}\n"
            rc = 1
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain(formatted) at {sf} "
                     f"[{args.suffix}]\n\n")
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
