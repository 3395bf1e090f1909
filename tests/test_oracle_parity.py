"""Differential test: every registered query with an oracle must hash-match
DuckDB on the same parquet fixtures — a local replica of the driver's
correctness gate (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from gads_etl_spark.oracle import compare
from gads_etl_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE

_WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
_ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, oracle_con, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_ORACLE)
    compare(df, oracle_con, q.oracle, name=name)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_outputs_are_scalar_columns(spark, name):
    """Registered query outputs must be scalar-typed: array/map/struct
    columns round-trip through toPandas as numpy arrays or Python lists
    depending on the session's Arrow conf, so the driver's repr-based
    value compare would become conf-dependent. Sequence-valued results
    join to strings at the query layer (operators still return real
    arrays)."""
    from pyspark.sql import types as T

    df = REGISTRY[name].fn(spark, SF_ORACLE)  # analysis only, no execution
    complex_cols = [
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not complex_cols, (
        f"{name} emits non-scalar columns {complex_cols}; join them to "
        "strings at the query layer")
