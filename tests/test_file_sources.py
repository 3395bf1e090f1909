"""JSONL/CSV quarantine readers and Observation-backed write metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gads_etl_spark.pipeline.metrics import observed, write_with_count
from gads_etl_spark.sources.files import read_csv, read_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


class TestJsonlQuarantine:
    def _write(self, tmp_path, lines):
        p = tmp_path / "in.jsonl"
        p.write_text("\n".join(lines) + "\n")
        return str(p)

    def test_good_and_bad_split_exactly(self, spark, tmp_path):
        path = self._write(
            tmp_path,
            [
                '{"id": 1, "name": "a", "score": 0.5}',
                "this is not json",
                '{"id": 2, "name": "b", "score": 1.5}',
                '{"id": 3, "broken',
            ],
        )
        good, bad = read_jsonl(spark, path, SCHEMA)
        assert good.schema == SCHEMA
        assert {(r.id, r.name, r.score) for r in good.collect()} == {
            (1, "a", 0.5),
            (2, "b", 1.5),
        }
        assert {r.raw_line for r in bad.collect()} == {
            "this is not json",
            '{"id": 3, "broken',
        }

    def test_clean_input_quarantines_nothing(self, spark, tmp_path):
        path = self._write(tmp_path, ['{"id": 1, "name": "a", "score": 0.5}'])
        good, bad = read_jsonl(spark, path, SCHEMA)
        assert good.count() == 1
        assert bad.count() == 0

    def test_missing_fields_are_null_not_corrupt(self, spark, tmp_path):
        # Valid JSON with absent fields is schema-relaxed (nulls), not
        # quarantined — quarantine is for unparseable lines only.
        path = self._write(tmp_path, ['{"id": 9}'])
        good, bad = read_jsonl(spark, path, SCHEMA)
        row = good.collect()[0]
        assert (row.id, row.name, row.score) == (9, None, None)
        assert bad.count() == 0


class TestCsvQuarantine:
    def test_type_violation_is_quarantined(self, spark, tmp_path):
        p = tmp_path / "in.csv"
        p.write_text("id,name,score\n1,a,0.5\nnot_a_number,b,2.0\n3,c,0.25\n")
        good, bad = read_csv(spark, str(p), SCHEMA)
        assert {r.id for r in good.collect()} == {1, 3}
        assert [r.raw_line for r in bad.collect()] == ["not_a_number,b,2.0"]


class TestObservedMetrics:
    def test_observed_counts_on_action(self, spark):
        df = spark.range(100).select("id", (F.col("id") % 10).alias("m"))
        inst, obs = observed(
            df,
            "probe",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("m").alias("m_sum"),
        )
        inst.write.format("noop").mode("overwrite").save()
        assert obs.get == {"n_rows": 100, "m_sum": 450}

    def test_write_with_count_matches_files(self, spark, tmp_path):
        out = str(tmp_path / "out")
        n = write_with_count(spark.range(1234).toDF("id"), out)
        assert n == 1234
        assert spark.read.parquet(out).count() == 1234

    def test_write_with_count_refuses_overwrite(self, spark, tmp_path):
        out = str(tmp_path / "out")
        write_with_count(spark.range(5).toDF("id"), out)
        with pytest.raises(Exception):
            write_with_count(spark.range(5).toDF("id"), out)
