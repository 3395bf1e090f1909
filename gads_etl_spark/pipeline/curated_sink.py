"""Curated zone: staged columnar copies published by pointer swap.

Contract parity (reference src/gads_etl/warehouse/curated_sink.py:35-74,
docs/warehouse_semantics.md:18-25):

- Staging writes curated data under ``(logical key, run_id)`` exactly like
  the raw zone (same seal contract, re-finalize refused) — but columnar
  parquet, because the curated zone is the analytics read path.
- Staging is invisible: consumers resolve through pointers, and the
  pointer swap happens only after the staged partition is sealed
  (stage → swap → read, never a mixed run_id — warehouse_semantics:39-43).

``materialize_plan`` is the data half of warehouse loading the reference
leaves as a placeholder (loader.py:33): copy every load/replace target
raw → curated before ``WarehouseLoader`` publishes its pointers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from gads_etl_spark.pipeline.keys import PartitionKey
from gads_etl_spark.pipeline.raw_sink import RawZone


class CuratedZone(RawZone):
    """A RawZone fixed to parquet — identical seal/immutability contract,
    columnar storage (the raw zone is row-shaped JSONL like the
    reference; curated is the columnar analytics copy)."""

    def __init__(self, spark, root: str):
        super().__init__(spark, root, data_format="parquet")


def stage_partition(
    curated: CuratedZone,
    df: DataFrame,
    key: PartitionKey,
    run_id: str,
    schema_version: str = "v1",
    checks: list | None = None,
) -> dict:
    """Stage one curated partition (write + metadata-last seal).

    ``checks`` (operators/dq.py constraints) gate the PAYLOAD the way
    count validation gates the ledger: they run before any byte is
    written, so a constraint violation stages nothing — no unsealed
    debris, no pointer ever observes the bad partition. The check cost
    is one extra pass over the partition (row checks batch into one
    aggregate), paid only where a gate was requested.
    """
    if checks:
        from gads_etl_spark.operators import dq

        dq.assert_checks(df, checks)
    return curated.write_partition(df, key, run_id, schema_version=schema_version)


def materialize_plan(raw: RawZone, curated: CuratedZone, plan,
                     checks: list | None = None) -> int:
    """Copy every load/replace target raw → curated (idempotent: already-
    staged (key, run_id) partitions are skipped — reruns converge).

    Returns the number of partitions staged. Each copy is one columnar
    rewrite of one partition directory; targets are independent, so on a
    cluster these parallelize across the scheduler queue. ``checks``
    apply per partition (see ``stage_partition``); the first violating
    partition aborts the materialization with nothing staged for it,
    while partitions already staged remain (idempotent rerun semantics —
    fix the data, rerun, only the missing targets restage).
    """
    targets = plan.load.unionByName(plan.replace).collect()
    staged = 0
    for t in targets:
        key = PartitionKey(t["source"], t["customer_id"], t["query_name"],
                          t["logical_date"])
        run_id = t["current_run_id"]
        if curated.is_sealed(key, run_id):
            continue
        df = raw.read_partition(key, run_id)
        stage_partition(curated, df, key, run_id,
                        schema_version=t["schema_version"] or "v1",
                        checks=checks)
        staged += 1
    return staged
