"""Schema-evolution read path across mixed schema_version partitions.

Reference contract (docs/raw_sink_contract.md:62-65,
docs/warehouse_semantics.md:50-57): the raw zone stores ``schema_version``
per partition so a long-lived deployment can evolve the payload schema
while old sealed partitions stay immutable. The read-side contract this
file pins:

- **Additive evolution is free**: partitions written under v1 (no
  ``conversions`` column) and v2 (adds a nullable ``conversions``) read
  through ONE unified (v2) schema — v1 rows surface the new column as
  null, exactly like parquet/JSON mergeSchema semantics, with no rewrite
  of sealed data.
- **Incompatible evolution still fails fast**: a partition whose column
  changed TYPE (not merely got added) must raise under the consumer's
  FAILFAST read, never silently coerce to nulls — the silent-null path is
  how a type change corrupts a warehouse unnoticed.
"""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gads_etl_spark.pipeline import PartitionKey, RawZone

V1_SCHEMA = T.StructType([
    T.StructField("campaign_id", T.LongType(), False),
    T.StructField("clicks", T.LongType(), False),
])
#: v2 = v1 + one NULLABLE column (the only evolution the contract allows
#: without a version-gated migration).
V2_SCHEMA = T.StructType([
    T.StructField("campaign_id", T.LongType(), False),
    T.StructField("clicks", T.LongType(), False),
    T.StructField("conversions", T.LongType(), True),
])

K_V1 = PartitionKey("google_ads", "1", "campaign_stats", date(2024, 1, 1))
K_V2 = PartitionKey("google_ads", "1", "campaign_stats", date(2024, 1, 2))
K_BAD = PartitionKey("google_ads", "1", "campaign_stats", date(2024, 1, 3))


@pytest.fixture
def mixed_zone(spark, tmp_path):
    zone = RawZone(spark, str(tmp_path / "raw"))
    v1 = spark.range(3).select(
        F.col("id").alias("campaign_id"), (F.col("id") * 10).alias("clicks"))
    zone.write_partition(v1, K_V1, "run-a", schema_version="v1")
    v2 = spark.range(3).select(
        F.col("id").alias("campaign_id"), (F.col("id") * 10).alias("clicks"),
        (F.col("id") + 100).alias("conversions"))
    zone.write_partition(v2, K_V2, "run-a", schema_version="v2")
    return zone


class TestAdditiveEvolution:
    def test_manifest_records_version_mix(self, spark, mixed_zone):
        versions = {
            (str(r.logical_date), r.schema_version)
            for r in mixed_zone.manifest().collect()
        }
        assert versions == {("2024-01-01", "v1"), ("2024-01-02", "v2")}

    def test_single_partition_reads_under_unified_schema(self, spark, mixed_zone):
        old = mixed_zone.read_partition(K_V1, "run-a", schema=V2_SCHEMA)
        rows = old.orderBy("campaign_id").collect()
        assert [r.conversions for r in rows] == [None, None, None]
        assert [r.clicks for r in rows] == [0, 10, 20]

    def test_read_all_unifies_both_vintages(self, spark, mixed_zone):
        df = mixed_zone.read_all(schema=V2_SCHEMA)
        # Hive partition columns still discovered alongside the payload.
        assert {"logical_date", "run_id"} <= set(df.columns)
        got = {
            (str(r.logical_date), r.campaign_id): r.conversions
            for r in df.collect()
        }
        assert len(got) == 6
        assert all(v is None for (d, _), v in got.items() if d == "2024-01-01")
        assert all(v is not None for (d, _), v in got.items() if d == "2024-01-02")

    def test_aggregates_treat_missing_as_null_not_zero(self, spark, mixed_zone):
        # sum() skips nulls: mixed-vintage aggregation must not invent
        # zeros for pre-v2 partitions.
        row = (
            mixed_zone.read_all(schema=V2_SCHEMA)
            .agg(F.sum("conversions").alias("s"),
                 F.count("conversions").alias("n_present"))
            .collect()[0]
        )
        assert row.s == 100 + 101 + 102
        assert row.n_present == 3


class TestIncompatibleEvolution:
    def test_type_change_fails_fast(self, spark, tmp_path):
        zone = RawZone(spark, str(tmp_path / "raw"))
        # A partition whose `clicks` became a non-numeric STRING — an
        # incompatible vintage, not an additive one.
        bad = spark.createDataFrame(
            [(1, "a lot"), (2, "few")], "campaign_id long, clicks string")
        zone.write_partition(bad, K_BAD, "run-a", schema_version="v3-broken")
        with pytest.raises(Exception) as exc:
            zone.read_partition(K_BAD, "run-a", schema=V2_SCHEMA).collect()
        assert "FAILFAST" in str(exc.value) or "Malformed" in str(exc.value)
