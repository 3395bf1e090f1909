"""Schema-enforced JSONL / CSV file sources with corrupt-record quarantine.

The reference ingests API rows and writes JSON it alone produced, so it can
afford FAILFAST everywhere (reference src/gads_etl/raw_sink_local.py — its
own seal is the only writer). A general pipeline also ingests files *other*
systems wrote; there the right posture is PERMISSIVE-with-quarantine: keep
every parseable row, capture every malformed line verbatim in a side
channel, and let the caller decide whether the bad fraction is fatal
(the validator's record-count contract covers the rest).

Scale notes:
- An explicit schema is mandatory: schema inference is a full extra pass
  over 100 TB before the real read even starts.
- The quarantine split is two filters over one cached scan — Spark
  disallows referencing only the internal corrupt column on the raw
  relation (SPARK-21610), and caching also keeps the split consistent
  under speculative re-execution.
- JSONL and CSV split by line, so both parallelize per 128 MB file split
  like parquet; `multiLine` JSON would serialize whole files and is
  deliberately not exposed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _quarantine_read(
    reader, schema: T.StructType, fmt: str, path: str
) -> tuple[DataFrame, DataFrame]:
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        reader.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .format(fmt)
        .load(path)
    )
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read line-delimited JSON → ``(good, quarantined)``.

    ``good`` has exactly ``schema``; ``quarantined`` is one ``raw_line``
    string column holding each malformed input line verbatim.
    """
    return _quarantine_read(spark.read, schema, "json", path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV → ``(good, quarantined)`` under an enforced schema.

    A row whose field fails to cast to the declared type is quarantined,
    not silently nulled — the difference between PERMISSIVE alone and
    PERMISSIVE with the corrupt column.
    """
    reader = spark.read.option("header", header).option("sep", sep)
    return _quarantine_read(reader, schema, "csv", path)
