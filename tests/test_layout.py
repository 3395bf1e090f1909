"""Plan proofs for the data-layout operators: bucketed co-located joins
eliminate the Exchange; range layout produces range-disjoint files."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.operators.layout import (
    table_exists,
    write_bucketed,
    write_range_layout,
    write_zorder_layout,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def bucketed_pair(spark):
    """Two small fact tables bucketed on the same key/count."""
    suffix = uuid.uuid4().hex[:8]
    a_name, b_name = f"orders_b_{suffix}", f"lines_b_{suffix}"
    a = spark.range(0, 10_000).select(
        F.col("id").alias("orderkey"),
        (F.col("id") % 7).alias("status"),
    )
    b = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("orderkey"),
        (F.col("id") * 2).alias("amount"),
    )
    write_bucketed(a, a_name, "orderkey", 8)
    write_bucketed(b, b_name, "orderkey", 8)
    yield a_name, b_name
    spark.sql(f"DROP TABLE IF EXISTS {a_name}")
    spark.sql(f"DROP TABLE IF EXISTS {b_name}")


class TestBucketedJoin:
    def test_join_plans_without_exchange(self, spark, bucketed_pair):
        # hint("merge"): at test size the planner would broadcast (tiny
        # side beats bucket-merge — also correct); at fact-fact scale it
        # picks sort-merge itself and the bucket layout must satisfy the
        # join's partitioning requirement with no Exchange of any kind.
        a_name, b_name = bucketed_pair
        joined = spark.table(a_name).hint("merge").join(
            spark.table(b_name), "orderkey")
        joined.count()  # materialize through AQE
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 30_000

    def test_groupby_on_bucket_key_without_exchange(self, spark, bucketed_pair):
        a_name, _ = bucketed_pair
        agg = spark.table(a_name).groupBy("orderkey").agg(F.count("*").alias("n"))
        agg.count()
        assert "Exchange" not in _plan(agg)

    def test_nonbucketed_join_does_exchange(self, spark, bucketed_pair):
        # Control: the same join without the layout shuffles at least one side.
        a_name, _ = bucketed_pair
        plain = spark.range(0, 30_000).select(
            (F.col("id") % 10_000).alias("orderkey"))
        joined = spark.table(a_name).join(plain, "orderkey")
        joined.count()
        assert "Exchange" in _plan(joined)

    def test_exists_helper(self, spark, bucketed_pair):
        a_name, _ = bucketed_pair
        assert table_exists(spark, a_name)
        assert not table_exists(spark, "no_such_table_anywhere")


class TestRangeLayout:
    def test_files_are_range_disjoint(self, spark, tmp_path):
        path = str(tmp_path / "ranged")
        df = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
        write_range_layout(df, path, "k", n_files=5)
        got = spark.read.parquet(path)
        assert got.count() == 50_000
        # Each physical file's [min, max] must not overlap any other's.
        import pyarrow.parquet as pq
        import glob
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                mins.append(st.min); maxs.append(st.max)
            spans.append((min(mins), max(maxs)))
        spans.sort()
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, spans

    def test_range_filter_prunes_files(self, spark, tmp_path):
        path = str(tmp_path / "ranged2")
        df = spark.range(0, 50_000).select(F.col("id").alias("k"))
        write_range_layout(df, path, "k", n_files=5)
        narrow = spark.read.parquet(path).where(F.col("k") < 100)
        assert narrow.count() == 100


class TestZOrderLayout:
    @staticmethod
    def _file_spans(path, col_idx):
        import glob

        import pyarrow.parquet as pq

        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min); maxs.append(st.max)
            spans.append(max(maxs) - min(mins))
        return spans

    def test_both_dimensions_bounded(self, spark, tmp_path):
        # 256×256 uniform grid. Z-order files must cover a bounded
        # rectangle in BOTH x and y; a 1-D range layout on x leaves y
        # unbounded (full span in every file) — the control.
        n = 256
        df = spark.range(n * n).select(
            (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y"))
        zpath, rpath = str(tmp_path / "zord"), str(tmp_path / "rng")
        write_zorder_layout(df, zpath, "x", "y", n_files=16)
        write_range_layout(df, rpath, "x", n_files=16)

        x_idx, y_idx = 0, 1  # column order preserved by the writers
        z_x = self._file_spans(zpath, x_idx)
        z_y = self._file_spans(zpath, y_idx)
        r_y = self._file_spans(rpath, y_idx)
        full = n - 1
        # Control: range-on-x files span all of y.
        assert sum(r_y) / len(r_y) >= 0.95 * full
        # Z-order: 16 files ≈ 4×4 quadrants → each file ≈ 1/4 span per
        # dimension; allow slack for files straddling quadrant seams.
        assert sum(z_x) / len(z_x) <= 0.6 * full, z_x
        assert sum(z_y) / len(z_y) <= 0.6 * full, z_y

    def test_rows_and_values_preserved(self, spark, tmp_path):
        df = spark.range(10_000).select(
            (F.col("id") % 100).alias("x"), (F.col("id") / 100).cast("long").alias("y"),
            F.col("id").alias("payload"))
        path = str(tmp_path / "z2")
        write_zorder_layout(df, path, "x", "y", n_files=8)
        got = spark.read.parquet(path)
        assert got.count() == 10_000
        assert got.agg(F.sum("payload")).collect()[0][0] == sum(range(10_000))

    def test_zorder_code_interleaves(self, spark):
        from gads_etl_spark.operators.layout import zorder_code

        df = spark.createDataFrame([(3, 5)], "a long, b long").select(
            zorder_code(F.col("a"), F.col("b"), bits=4).alias("z"))
        # a=0b0011, b=0b0101 → z bits: b3 a3 b2 a2 b1 a1 b0 a0
        #  = 0 0 1 0 0 1 1 1 = 0b00100111 = 39
        assert df.collect()[0]["z"] == 39


class TestCompaction:
    """compact_small_files: sprawl in, right-sized files out, rows exact."""

    def _sprawl(self, spark, tmp_path, n_files=32):
        src = str(tmp_path / "sprawl")
        df = spark.range(20_000).withColumn("v", F.col("id") * 2)
        df.repartition(n_files).write.parquet(src)
        return src, df

    def _parquet_files(self, tmp_path, sub):
        return list((tmp_path / sub).glob("*.parquet"))

    def test_compacts_to_size_target(self, spark, tmp_path):
        from gads_etl_spark.operators.layout import compact_small_files

        src, df = self._sprawl(spark, tmp_path)
        assert len(self._parquet_files(tmp_path, "sprawl")) == 32
        total = sum(p.stat().st_size for p in self._parquet_files(tmp_path, "sprawl"))
        out = str(tmp_path / "compacted")
        # target = half the payload → exactly 2 output files
        n = compact_small_files(spark, src, out, target_bytes=(total + 1) // 2)
        assert n == 2
        assert len(self._parquet_files(tmp_path, "compacted")) == 2

    def test_rows_and_values_preserved(self, spark, tmp_path):
        from gads_etl_spark.operators.layout import compact_small_files

        src, df = self._sprawl(spark, tmp_path)
        out = str(tmp_path / "compacted")
        compact_small_files(spark, src, out, target_bytes=1 << 40)
        got = spark.read.parquet(out)
        assert got.count() == 20_000
        assert got.join(df, ["id", "v"], "left_anti").count() == 0

    def test_refuses_overwrite(self, spark, tmp_path):
        from gads_etl_spark.operators.layout import compact_small_files

        src, _ = self._sprawl(spark, tmp_path, n_files=4)
        out = str(tmp_path / "compacted")
        compact_small_files(spark, src, out, target_bytes=1 << 40)
        with pytest.raises(Exception):
            compact_small_files(spark, src, out, target_bytes=1 << 40)
