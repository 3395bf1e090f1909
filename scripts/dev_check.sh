#!/usr/bin/env bash
# Repo integrity gate (reference scripts/dev_check.sh, motivated by
# docs/repo_integrity_failures.md): compile, import every module, drive
# the CLI help, then run the fast checks. Exits non-zero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compileall"
python -m compileall -q gads_etl_spark tests scripts bench.py __spark_entry__.py

echo "== import graph"
python - <<'EOF'
import importlib
mods = [
    "gads_etl_spark.session", "gads_etl_spark.catalog", "gads_etl_spark.oracle",
    "gads_etl_spark.cli", "gads_etl_spark.pipeline", "gads_etl_spark.operators",
    "gads_etl_spark.queries", "gads_etl_spark.streaming",
    "gads_etl_spark.sources",
    "gads_etl_spark.functions.numeric",
]
for m in mods:
    importlib.import_module(m)
print(f"{len(mods)} modules import cleanly")
import gads_etl_spark.queries as q
n_oracle = sum(1 for x in q.REGISTRY.values() if x.oracle)
print(f"registry: {len(q.REGISTRY)} queries ({n_oracle} oracle-checked)")
assert len(q.REGISTRY) >= 70 and n_oracle >= 60
EOF

echo "== CLI help"
python -m gads_etl_spark.cli --help >/dev/null 2>&1 || python gads_etl_spark/cli.py --help >/dev/null

echo "== driver contract"
python - <<'EOF'
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", "__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
qs, osql = mod.queries(), mod.oracle_sql()
assert set(osql) <= set(qs) and callable(mod.entry)
print(f"driver contract OK: {len(qs)} queries, {len(osql)} oracles")
EOF

if [[ "${1:-}" == "--full" ]]; then
    echo "== pytest"
    python -m pytest tests/ -q
    echo "== oracle parity (writes CORRECTNESS_full.json — commit it)"
    python scripts/check_queries.py --json CORRECTNESS_full.json
fi
if [[ "${1:-}" == "--window" ]]; then
    # Rotating 50-name oracle slice (round-16): covers the registry
    # names the driver's fixed alphabetical window never reaches.
    # Usage: dev_check.sh --window 16  -> CORRECTNESS_window_r16.json
    rn="${2:?--window needs a round number}"
    echo "== rotating oracle window r${rn} (writes CORRECTNESS_window_r${rn}.json — commit it)"
    python scripts/check_queries.py --window "r${rn}" --json "CORRECTNESS_window_r${rn}.json"
fi
if [[ "${1:-}" == "--bench" ]]; then
    echo "== isolated-extras drift gate (writes BENCH_isolated_r<N>.json — commit it)"
    # Re-measures the top-10 heavy extras in fresh child JVMs and fails
    # on >1.5x drift vs the newest committed BENCH_isolated_r*.json.
    # Run on a QUIET host — a concurrent CPU load shifts the medians.
    python scripts/bench_isolated.py
fi
echo "dev_check OK"
