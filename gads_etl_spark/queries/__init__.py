"""Query registry: every judge-checkable query/operator in one place.

Each registered query is a pair:
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
  - an optional DuckDB oracle SQL string over the same fixture tables
    (omitted only for genuinely non-SQL-expressible operators; the driver
    then records a weaker rows-only check).

Column names are aliased identically on both sides — the correctness harness
sorts columns by name and hashes values, so names must match exactly.
"""

from gads_etl_spark.queries.registry import REGISTRY, RegisteredQuery, register  # noqa: F401

# Import suites for their registration side effects.
from gads_etl_spark.queries import relational  # noqa: F401,E402
from gads_etl_spark.queries import operator_suite  # noqa: F401,E402
from gads_etl_spark.queries import observe_suite  # noqa: F401,E402
from gads_etl_spark.queries import extension_suite  # noqa: F401,E402
from gads_etl_spark.queries import events_suite  # noqa: F401,E402
from gads_etl_spark.queries import pipeline_suite  # noqa: F401,E402
from gads_etl_spark.queries import analytics_suite  # noqa: F401,E402
