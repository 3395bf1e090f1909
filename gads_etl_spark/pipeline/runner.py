"""Daily pipeline runner: the reference's `gads-etl daily` end to end.

Orchestrates (reference src/gads_etl/pipeline.py:138-185, cli.py:40-45):

1. one ``run_id`` per execution (fences every write),
2. the planned (query × customer) extractions for the target date
   (``plan_daily_runs``) against a source DataFrame per entity,
3. ONE batch validation job for all extracted partitions (the reference
   validates per-partition; see validator.py scale notes),
4. warehouse reconcile → stage curated copies → publish pointers.

Per-run failures are contained per partition (partial-failure
accounting, docs/control_plane.md:39-43): an extraction error marks that
partition failed in the run report and the rest proceed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import DataFrame, SparkSession

from gads_etl_spark.pipeline.config import PipelineConfig, plan_daily_runs
from gads_etl_spark.pipeline.curated_sink import CuratedZone, materialize_plan
from gads_etl_spark.pipeline.extract import extract_partition
from gads_etl_spark.pipeline.keys import PartitionKey, new_run_id
from gads_etl_spark.pipeline.loader import WarehouseLoader
from gads_etl_spark.pipeline.pointer_store import PointerStore
from gads_etl_spark.pipeline.raw_sink import RawZone
from gads_etl_spark.pipeline.state_store import StateStore
from gads_etl_spark.pipeline.validator import validate_batch


@dataclass
class RunReport:
    run_id: str
    extracted: list[PartitionKey] = field(default_factory=list)
    extract_errors: dict[PartitionKey, str] = field(default_factory=dict)
    validated_success: int = 0
    validated_failed: int = 0
    staged: int = 0
    published: dict[str, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return not self.extract_errors and self.validated_failed == 0


def run_daily(
    spark: SparkSession,
    config: PipelineConfig,
    sources: dict[str, DataFrame],
    raw: RawZone,
    states: StateStore,
    pointers: PointerStore,
    target_date: date,
    curated: CuratedZone | None = None,
    run_id: str | None = None,
    dq_checks: list | None = None,
    lookback_days: int | None = None,
) -> RunReport:
    """One daily sync: extract → validate (one batch) → load → publish.

    ``sources`` maps query entity → source DataFrame (the fixture stand-in
    for the live connector; a real deployment plugs a DataSource here).
    ``dq_checks`` (operators/dq.py constraints) gate each curated staging
    copy — a violating partition stages nothing and fails the run loudly.
    ``lookback_days`` overrides the config's daily lookback — the
    reference's catch-up mode is exactly a daily sync with the lookback
    widened to the catch-up window (pipeline.py:179-185), so
    ``run_daily(..., lookback_days=window)`` IS historical_catch_up.
    """
    report = RunReport(run_id=run_id or new_run_id())
    runs = plan_daily_runs(config, target_date, lookback_days=lookback_days)

    for r in runs:
        qdef = config.query(r.query_name)
        key = PartitionKey(config.source, r.customer_id, r.query_name, r.logical_date)
        try:
            source = sources[qdef.entity]
            extract_partition(source, raw, qdef, key, report.run_id)
            report.extracted.append(key)
        except Exception as exc:  # partial-failure accounting per partition
            report.extract_errors[key] = str(exc)

    if report.extracted:
        requests = spark.createDataFrame(
            [{**k.as_dict(), "run_id": report.run_id, "schema_version": "v1"}
             for k in report.extracted]
        )
        outcome = validate_batch(raw, states, requests)
        counts = {r["status"]: r["n"] for r in
                  outcome.groupBy("status").count().withColumnRenamed("count", "n").collect()}
        report.validated_success = counts.get("success", 0)
        report.validated_failed = counts.get("failed", 0)

    loader = WarehouseLoader(states, pointers)
    if curated is not None:
        report.staged = materialize_plan(raw, curated, loader.reconcile(),
                                         checks=dq_checks)
    plan = loader.run()
    report.published = plan.counts()
    return report
