"""Logical partition key — the unit of idempotency, retry and visibility.

Reference: docs/state_store_contract.md:6-14 — every raw/curated partition,
state row and warehouse pointer is keyed by
``(source, customer_id, query_name, logical_date)``; ``run_id`` fences
individual attempts (reference src/gads_etl/run_context.py:8-26).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import date, datetime, timezone

LOGICAL_KEY = ("source", "customer_id", "query_name", "logical_date")


@dataclass(frozen=True)
class PartitionKey:
    source: str
    customer_id: str
    query_name: str
    logical_date: date

    def as_dict(self) -> dict:
        return {
            "source": self.source,
            "customer_id": self.customer_id,
            "query_name": self.query_name,
            "logical_date": self.logical_date,
        }

    def relative_path(self) -> str:
        """Hive-style directory path (reference docs/raw_sink_contract.md:15-27)."""
        return (
            f"source={self.source}/customer_id={self.customer_id}/"
            f"query_name={self.query_name}/logical_date={self.logical_date.isoformat()}"
        )


def new_run_id(now: datetime | None = None) -> str:
    """ISO-8601 UTC millisecond run_id; lexicographic order == time order.

    Reference: src/gads_etl/run_context.py:8-14 (ms precision, ``Z`` suffix,
    compared lexicographically by the validator at validator.py:118-121).
    """
    now = now or datetime.now(timezone.utc)
    return now.strftime("%Y-%m-%dT%H:%M:%S.") + f"{now.microsecond // 1000:03d}Z"
