"""gads_etl_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference ETL system (`shoorano/gads-etl`, surveyed in /root/repo/SURVEY.md),
re-expressed Spark-first:

- DataFrame/SQL logical plans; Catalyst/Tungsten pick physical strategy.
- Hive-partitioned lake layout (raw/curated zones) with metadata-last seal.
- Small control tables (partition state, warehouse pointers) with
  single-writer MERGE semantics.
- LLM-data-pipeline extension operators (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale.

Nothing here is a translation of the reference's single-process Python; see
SURVEY.md §2 for the operator-by-operator mapping.
"""

__version__ = "0.1.0"

from gads_etl_spark.session import get_session  # noqa: F401
from gads_etl_spark.catalog import load_tables, register_views, TABLES  # noqa: F401
