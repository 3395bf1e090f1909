"""Custom Spark data sources (Python DataSource API, Spark 4).

The fixture-parquet catalog (gads_etl_spark.catalog) covers the
correctness harness; this package holds the *connector* surface — the
Spark-native replacement for the reference's per-customer API client
loop (one InputPartition per customer×day, filter-pushdown partition
pruning).
"""

from gads_etl_spark.sources.ads_source import AdsFixtureDataSource  # noqa: F401
from gads_etl_spark.sources.files import read_csv, read_jsonl  # noqa: F401
