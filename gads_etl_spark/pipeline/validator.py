"""Validation + authority selection: the state machine's only success path.

Contract parity (reference src/gads_etl/validator.py):

- Count check (A9, validator.py:43-52): re-read the sealed partition, compare
  ``count()`` against the manifest's ``record_count``; mismatch ⇒ failed.
- Success transition with authority retention (M3, validator.py:56-86,
  118-121): if the ledger already holds a *newer* run_id (lexicographically
  greater — run_ids are ISO-ms timestamps so lexicographic == chronological),
  the existing authority is retained; the attempt still counts.
- Failure transition (M4, validator.py:88-104): keep previous authority and
  record_count, record the error, increment attempts.
- Attempt counting (M8, validator.py:83,101): +1 per validation attempt,
  monotone, never reset.
"""

from __future__ import annotations

from datetime import datetime, timezone

from gads_etl_spark.pipeline.keys import PartitionKey
from gads_etl_spark.pipeline.raw_sink import RawZone
from gads_etl_spark.pipeline.state_store import StateStore


def _now():
    return datetime.now(timezone.utc).replace(tzinfo=None)


def validate_partition(
    raw: RawZone,
    states: StateStore,
    key: PartitionKey,
    run_id: str,
    schema_version: str = "v1",
) -> dict:
    """Validate one sealed raw partition and MERGE the outcome into state.

    Returns the new state row as a dict.
    """
    prev = states.get(key)
    attempt = (prev.get("attempt_count") or 0) + 1 if prev else 1

    try:
        # Point lookup on the manifest (broadcast-size table).
        import pyspark.sql.functions as F

        m = raw.manifest().where(
            (F.col("source") == key.source)
            & (F.col("customer_id") == key.customer_id)
            & (F.col("query_name") == key.query_name)
            & (F.col("logical_date") == F.lit(key.logical_date))
            & (F.col("run_id") == run_id)
        ).collect()
        if not m:
            raise FileNotFoundError(f"no manifest row for {key} run_id={run_id}")
        expected = m[0]["record_count"]
        actual = raw.read_partition(key, run_id).count()
        if actual != expected:
            raise ValueError(
                f"record_count mismatch: payload={actual} metadata={expected}"
            )
        ok, error = True, None
    except Exception as exc:  # validation failure → failed transition
        ok, error = False, str(exc)

    if ok:
        if prev and prev.get("current_run_id") and prev["current_run_id"] > run_id:
            # M3: an older attempt finished last — keep the newer authority.
            current_run_id = prev["current_run_id"]
            record_count = prev.get("record_count")
        else:
            current_run_id = run_id
            record_count = expected
        row = {
            **key.as_dict(),
            "status": "success",
            "current_run_id": current_run_id,
            "schema_version": schema_version,
            "record_count": record_count,
            "updated_at": _now(),
            "error_message": None,
            "attempt_count": attempt,
        }
    else:
        row = {
            **key.as_dict(),
            "status": "failed",
            "current_run_id": prev.get("current_run_id") if prev else None,
            "schema_version": prev.get("schema_version") if prev else None,
            "record_count": prev.get("record_count") if prev else None,
            "updated_at": _now(),
            "error_message": error,
            "attempt_count": attempt,
        }

    from gads_etl_spark.pipeline.state_store import STATE_SCHEMA

    states.upsert(raw.spark.createDataFrame([row], STATE_SCHEMA))
    return row
