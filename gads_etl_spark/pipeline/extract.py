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
from datetime import date, datetime, timezone

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


def extract_day_bulk(
    source: DataFrame,
    raw: RawZone,
    qdef: QueryDefinition,
    customer_col: str,
    logical_date: date,
    run_id: str,
    source_name: str = "google_ads",
    schema_version: str = "v1",
) -> list[dict]:
    """Extract EVERY customer's partition for one day in ONE Spark job.

    The reference (and ``extract_partition``) writes one partition per
    call — one job per (query, customer); at 10k customers that is 10k
    driver round-trips. Here the flattened day is written once with
    ``partitionBy`` over the five layout columns (identical hive
    directory layout, one job, tasks fan out per customer), record
    counts come from ONE re-read of the committed files (write-then-count
    discipline), and the seals land via one ``seal_many`` batch.

    Returns the manifest rows, one per customer present in the source.
    """
    from pyspark.sql import functions as F

    from gads_etl_spark.pipeline.raw_sink import SealedPartitionError

    # Refuse BEFORE writing (overwrite refusal, S6): one manifest lookup
    # for the whole (query, date, run) batch.
    already = (
        raw.manifest()
        .where((F.col("run_id") == run_id) & (F.col("query_name") == qdef.name)
               & (F.col("logical_date") == F.lit(logical_date)))
        .limit(1).count()
    )
    if already:
        raise SealedPartitionError(
            f"bulk extraction for {qdef.name}/{logical_date} run_id={run_id} "
            "is already sealed; raw partitions are immutable"
        )

    flat = flatten_projection(source, qdef, logical_date, logical_date)
    partitioned = flat.select(
        "*",
        F.lit(source_name).alias("source"),
        F.col(customer_col).cast("string").alias("customer_id"),
        F.lit(qdef.name).alias("query_name"),
        F.lit(logical_date.isoformat()).alias("logical_date"),
        F.lit(run_id).alias("run_id"),
    )
    writer = partitioned.write.mode("append").partitionBy(
        "source", "customer_id", "query_name", "logical_date", "run_id"
    )
    if raw.data_format == "json":
        writer.json(raw.root)
    else:
        writer.parquet(raw.root)

    counts = (
        raw.read_all()
        .where((F.col("run_id") == run_id) & (F.col("query_name") == qdef.name)
               & (F.col("logical_date") == F.lit(logical_date)))
        .groupBy("customer_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    extracted_at = datetime.now(timezone.utc).replace(tzinfo=None)
    metas = [
        {
            "source": source_name, "customer_id": r["customer_id"],
            "query_name": qdef.name, "logical_date": logical_date,
            "run_id": run_id, "extracted_at": extracted_at,
            "schema_version": schema_version, "record_count": r["n"],
            "api_version": None,
            "query_signature": f"SELECT {', '.join(qdef.fields)} FROM {qdef.entity}",
        }
        for r in sorted(counts, key=lambda r: r["customer_id"])
    ]
    if metas:
        raw.seal_many(metas)
    return metas
