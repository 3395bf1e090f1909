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


def test_trigram_typicality_non_ascii_case_mapping(spark, tmp_path):
    """ADVICE r16: the let-bound trigram pass must keep its position
    bound on length(text), mirroring the oracle's generate_series(1,
    greatest(length(text)-2, 0)) — NOT length(lower(text)), which
    differs when a character's case-mapping changes codepoint count
    (U+0130 'İ' lowercases to 'i' + U+0307 in Java, 1 → 2 codepoints).
    ASCII fixtures mask the distinction; this fixture does not: with
    the bound on length(lower(text)), 'İstanbul' emits 7 distinct grams
    against the oracle's 6 and 'xİyİz' 5 against 3. (Gram CONTENT for
    'İ' can never agree — DuckDB lowercases it to plain 'i' — but the
    query outputs only per-doc counts, which agree whenever each
    engine's own grams are pairwise distinct, as here.)"""
    import duckdb
    from pyspark.sql import functions as F

    rows = [
        (1, "İstanbul"),           # len 8, Java lower() len 9
        (2, "xİyİz"),              # len 5, Java lower() len 7
        (3, "plain ascii text"),
        (4, "ß sharp s stays 1"),  # lower() is identity here
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("lang", F.lit("xx")).withColumn("source", F.lit("t")) \
        .toPandas().to_parquet(f"{sf}/documents.parquet", index=False)
    q = REGISTRY["ext_trigram_typicality"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    compare(q.fn(spark, sf), con, q.oracle, name="trigram_non_ascii")
    con.close()
