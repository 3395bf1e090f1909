"""Lake pipeline: raw zone → validation/state ledger → warehouse publish.

Rebuilds the reference's dataflow contracts (SURVEY.md §2.1, §2.7, §3) on
Spark primitives:

- ``raw_sink``     — hive-partitioned immutable raw partitions, manifest
                     table as the metadata-last seal (reference
                     docs/raw_sink_contract.md, docs/storage_realism.md:35-40)
- ``state_store``  — PartitionState ledger with single-writer MERGE
                     semantics (reference src/gads_etl/state_store.py)
- ``pointer_store``— warehouse pointers: which run_id is published
                     (reference src/gads_etl/warehouse/pointer_store.py)
- ``validator``    — count validation + last-writer-wins authority
                     (reference src/gads_etl/validator.py)
- ``loader``       — reconcile → publish → demote
                     (reference src/gads_etl/warehouse/loader.py)
- ``control_plane``— retry / mark-terminal / backfill with safety rails
                     (reference src/gads_etl/cli.py)
"""

from gads_etl_spark.pipeline.keys import LOGICAL_KEY, PartitionKey  # noqa: F401
from gads_etl_spark.pipeline.raw_sink import RawZone  # noqa: F401
from gads_etl_spark.pipeline.state_store import StateStore, STATE_SCHEMA  # noqa: F401
from gads_etl_spark.pipeline.pointer_store import PointerStore  # noqa: F401
from gads_etl_spark.pipeline.validator import validate_batch, validate_partition  # noqa: F401
from gads_etl_spark.pipeline.loader import ReconciliationPlan, WarehouseLoader  # noqa: F401
from gads_etl_spark.pipeline.metrics import observed, write_with_count  # noqa: F401
from gads_etl_spark.pipeline.control_plane import (  # noqa: F401
    ControlPlane,
    PlanResult,
    ThresholdExceededError,
    UnfilteredMutationError,
)
