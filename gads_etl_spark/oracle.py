"""Local replica of the driver's DuckDB-oracle correctness check.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB (fixture parquet pre-registered as views),
then compares row count + schema + order-insensitive value hash. This module
reproduces that check so regressions are caught in ``tests/`` before a round
ends. Comparison is exact (no float tolerance): queries are written so that
both engines produce bit-identical values (see functions.numeric).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from gads_etl_spark.catalog import TABLES, table_path


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_value(v: Any) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly; bit-identical doubles match.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every value canonicalized, rows sorted."""
    cols = sorted(df.columns)
    out = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def compare(spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str,
            name: str = "?") -> None:
    """Raise AssertionError with a diff summary if results differ."""
    actual = spark_df.toPandas()
    expected = con.execute(sql).fetchdf()
    a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
    assert a_cols == e_cols, f"{name}: column mismatch spark={a_cols} duckdb={e_cols}"
    assert len(actual) == len(expected), (
        f"{name}: row count spark={len(actual)} duckdb={len(expected)}"
    )
    a_rows, e_rows = canonical_rows(actual), canonical_rows(expected)
    if a_rows != e_rows:
        diffs = [(a, e) for a, e in zip(a_rows, e_rows) if a != e][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs duckdb): {diffs}"
        )


def run_query(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    from gads_etl_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, sf_dir)
