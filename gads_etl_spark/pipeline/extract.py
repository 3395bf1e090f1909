"""Extraction job: config-driven nested flatten + provenance + raw write.

Contract parity (reference src/gads_etl/pipeline.py):

- P1 nested-path projection (pipeline.py:99-105): config lists dot-paths
  (``campaign.id``); each flattens to snake_case (``campaign_id``). A
  missing path fails the job (AnalysisException ↔ the reference's
  AttributeError crash, spec.md:42 — schema drift is fail-fast).
- S2 pushdown (pipeline.py:92-97): the only filter is
  ``date_column BETWEEN start AND end`` plus the projection — both reach
  the source scan via Catalyst (PushedFilters / ReadSchema), exactly what
  the reference pushes into GAQL.
- P2 provenance (pipeline.py:106): ``__query_name`` literal on every row.
- The write goes through RawZone (payload, then metadata-last seal).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gads_etl_spark.pipeline.keys import PartitionKey
from gads_etl_spark.pipeline.raw_sink import RawZone


@dataclass(frozen=True)
class QueryDefinition:
    """Declarative query spec (reference config.py:16-20 / YAML)."""

    name: str
    entity: str
    date_column: str
    fields: tuple[str, ...]

    def flat_name(self, field: str) -> str:
        return field.replace(".", "_")


def flatten_projection(df: DataFrame, qdef: QueryDefinition,
                       start: date, end: date) -> DataFrame:
    """P1+S2: select the configured dot-paths as snake_case columns,
    filtered to the date window. Declarative → Catalyst prunes nested
    fields and pushes the date predicate into the scan."""
    cols = [F.col(f).alias(qdef.flat_name(f)) for f in qdef.fields]
    return (
        df.where(F.col(qdef.date_column).between(F.lit(start), F.lit(end)))
        .select(*cols)
        .withColumn("__query_name", F.lit(qdef.name))
    )


def extract_partition(
    source: DataFrame,
    raw: RawZone,
    qdef: QueryDefinition,
    key: PartitionKey,
    run_id: str,
    schema_version: str = "v1",
) -> dict:
    """One extraction attempt for one logical partition (reference
    pipeline.py:38-78): flatten + filter to the partition's logical_date,
    write payload, seal metadata-last. Returns the manifest row."""
    day = flatten_projection(source, qdef, key.logical_date, key.logical_date)
    return raw.write_partition(
        day, key, run_id,
        schema_version=schema_version,
        query_signature=f"SELECT {', '.join(qdef.fields)} FROM {qdef.entity}",
    )
