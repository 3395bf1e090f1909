"""Per-query process-isolated re-bench of the heaviest sf0.1 extras
(round-13 verdict stretch task 6).

Under the noop-sink action the sf0.1 extras sweep is dominated by a
handful of heavy operators (pagerank, winnow, the IVF-PQ ladder,
simhash, passjoin). The driver's headline run measures them inside one
long-lived JVM (~160 measurements deep), which inflates late queries
1.5-2x (measured r11); this script gives each name its own fresh child
JVM under the standard 1-warmup + median-of-3 protocol — the clean
within-protocol regression baseline for future rounds.

Writes BENCH_isolated_r14.json at the repo root.

Usage: python scripts/bench_isolated.py [name ...]
       (default: the top names by r13 sf0.1 wall)
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(HERE, "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

#: Top of the sf0.1 extras sweep by wall (BENCH_tiers.json, round 13).
DEFAULT_NAMES = [
    "ext_pagerank",
    "ext_winnow_fingerprint",
    "ext_knn_ivfpq_res",
    "ext_knn_ivfpq",
    "ext_fuzzy_passjoin",
    "ext_simhash_radius",
    "ext_cluster_dedup",
    "ext_cluster_best_dedup",
    "ext_knn_pq",
    "ext_knn_ivf",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_NAMES
    queries: dict[str, float] = {}
    errors: dict[str, str] = {}
    runs = None
    for name in names:
        body = bench._bench_tier(bench.SF_DIR, only=[name])
        if body is None:
            errors[name] = "bench child died"
        else:
            runs = runs or body.get("runs")
            queries.update(body["queries"])
            errors.update(body["errors"])
        print(f"# {name}: {queries.get(name, errors.get(name))}",
              file=sys.stderr)
        doc = {
            "metric": "isolated_extras_wall",
            "unit": "sec",
            "note": "each query in its OWN fresh child JVM at sf0.1 "
                    "(SPARK_GRAFT_SF_DIR), 1 warmup + median-of-3, "
                    "noop-sink action — the isolation any single "
                    "re-measurement would use; the regression baseline "
                    "for the heavy extras, free of long-lived-JVM "
                    "inflation (r11: ~1.5-2x on late queries).",
            "queries": queries,
            "errors": errors,
            "runs": runs,
            "sf": 0.1,
        }
        with open(os.path.join(HERE, "BENCH_isolated_r14.json"), "w") as fh:
            fh.write(json.dumps(doc) + "\n")
    print(json.dumps(doc))
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
