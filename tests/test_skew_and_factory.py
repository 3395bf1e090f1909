"""Skew-salting equivalence + raw-zone backend factory tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.operators.skew import SALT_COL, salted_join
from gads_etl_spark.pipeline.raw_sink import create_raw_zone


@pytest.fixture
def skewed_pair(spark):
    # 90% of fact rows hit key 1 — the pathological hot key.
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    return fact, dim


class TestSaltedJoin:
    def test_inner_equals_plain_join(self, skewed_pair):
        fact, dim = skewed_pair
        plain = fact.join(dim, ["k"]).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        salted = salted_join(fact, dim, ["k"]).groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    def test_left_join_preserves_unmatched(self, spark, skewed_pair):
        fact, _ = skewed_pair
        dim_partial = spark.range(5).select(F.col("id").alias("k"), F.lit(1).alias("w"))
        plain = fact.join(dim_partial, ["k"], "left")
        salted = salted_join(fact, dim_partial, ["k"], how="left")
        assert plain.count() == salted.count()
        assert (plain.where(F.col("w").isNull()).count()
                == salted.where(F.col("w").isNull()).count())

    def test_hot_key_spreads_over_salts(self, skewed_pair):
        fact, _ = skewed_pair
        from gads_etl_spark.operators.skew import salt_skewed_side

        spread = (
            salt_skewed_side(fact, 16).where(F.col("k") == 1)
            .select(SALT_COL).distinct().count()
        )
        assert spread == 16


class TestRawZoneFactory:
    def test_env_config_selects_backend(self, spark, tmp_path, monkeypatch):
        monkeypatch.setenv("GADS_ETL_RAW_ROOT", f"file://{tmp_path}/zone")
        monkeypatch.setenv("GADS_ETL_RAW_FORMAT", "parquet")
        zone = create_raw_zone(spark)
        assert zone.root == f"file://{tmp_path}/zone"
        assert zone.data_format == "parquet"

    def test_explicit_args_win(self, spark, tmp_path):
        zone = create_raw_zone(spark, root=str(tmp_path / "z"), data_format="json")
        assert zone.data_format == "json"

    def test_bad_format_rejected(self, spark):
        with pytest.raises(ValueError):
            create_raw_zone(spark, root="/tmp/x", data_format="csv")
