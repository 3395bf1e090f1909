"""Warehouse loader golden scenarios.

Ports the reference's reconciliation scenario tests
(reference tests/unit/warehouse/test_loader.py:51-201): load / replace /
no-op / demote / combined publish, driven through real StateStore +
PointerStore tables on disk.
"""

from __future__ import annotations

from datetime import date, datetime

import pytest

from gads_etl_spark.pipeline import (
    PointerStore,
    StateStore,
    WarehouseLoader,
)
from gads_etl_spark.pipeline.state_store import STATE_SCHEMA
from gads_etl_spark.pipeline.pointer_store import POINTER_SCHEMA

NOW = datetime(2024, 3, 1, 12, 0, 0)


def _success_state(run_id: str, logical_date: date = date(2024, 1, 1),
                   status: str = "success") -> dict:
    return {
        "source": "google_ads",
        "customer_id": "123",
        "query_name": "campaign_stats",
        "logical_date": logical_date,
        "status": status,
        "current_run_id": run_id,
        "schema_version": "v1",
        "record_count": 10,
        "updated_at": NOW,
        "error_message": None,
        "attempt_count": 1,
    }


def _pointer(run_id: str, logical_date: date = date(2024, 1, 1)) -> dict:
    return {
        "source": "google_ads",
        "customer_id": "123",
        "query_name": "campaign_stats",
        "logical_date": logical_date,
        "run_id": run_id,
        "schema_version": "v1",
        "loaded_at": NOW,
    }


@pytest.fixture
def stores(spark, tmp_path):
    states = StateStore(spark, str(tmp_path / "state"))
    pointers = PointerStore(spark, str(tmp_path / "pointers"))
    return states, pointers


def _seed(spark, states, pointers, state_rows=(), pointer_rows=()):
    if state_rows:
        states.upsert(spark.createDataFrame(list(state_rows), STATE_SCHEMA))
    if pointer_rows:
        pointers.upsert(spark.createDataFrame(list(pointer_rows), POINTER_SCHEMA))


def test_reconcile_load_target(spark, stores):
    states, pointers = stores
    _seed(spark, states, pointers, state_rows=[_success_state("run-load")])

    plan = WarehouseLoader(states, pointers).reconcile()

    load = plan.load.collect()
    assert len(load) == 1
    assert load[0]["current_run_id"] == "run-load"
    assert plan.replace.count() == 0
    assert plan.demote.count() == 0


def test_reconcile_replace_target(spark, stores):
    states, pointers = stores
    _seed(spark, states, pointers,
          state_rows=[_success_state("run-new")],
          pointer_rows=[_pointer("run-old")])

    plan = WarehouseLoader(states, pointers).reconcile()

    replace = plan.replace.collect()
    assert len(replace) == 1
    assert replace[0]["current_run_id"] == "run-new"
    assert plan.load.count() == 0
    assert plan.demote.count() == 0


def test_reconcile_noop(spark, stores):
    states, pointers = stores
    _seed(spark, states, pointers,
          state_rows=[_success_state("run-same")],
          pointer_rows=[_pointer("run-same")])

    plan = WarehouseLoader(states, pointers).reconcile()

    assert plan.counts() == {"load": 0, "replace": 0, "demote": 0}


def test_reconcile_demote(spark, stores):
    states, pointers = stores
    _seed(spark, states, pointers, pointer_rows=[_pointer("stale-run")])

    plan = WarehouseLoader(states, pointers).reconcile()

    demote = plan.demote.collect()
    assert len(demote) == 1
    assert demote[0]["run_id"] == "stale-run"
    assert plan.load.count() == 0
    assert plan.replace.count() == 0


def test_failed_state_does_not_publish(spark, stores):
    """Only status=success states participate; a failed state with a
    surviving pointer causes demotion (consumer contract: only success is
    visible — reference docs/consumer_contract.md:12-17)."""
    states, pointers = stores
    _seed(spark, states, pointers,
          state_rows=[_success_state("run-x", status="failed")],
          pointer_rows=[_pointer("run-x")])

    plan = WarehouseLoader(states, pointers).reconcile()

    assert plan.load.count() == 0
    assert plan.replace.count() == 0
    assert plan.demote.count() == 1


def test_null_run_id_skipped(spark, stores):
    """Success state without current_run_id is skipped (reference
    loader.py:61-63)."""
    states, pointers = stores
    _seed(spark, states, pointers, state_rows=[_success_state(None)])

    plan = WarehouseLoader(states, pointers).reconcile()

    assert plan.counts() == {"load": 0, "replace": 0, "demote": 0}


def test_publish_updates_and_demotes(spark, stores):
    """Combined run: one load, one replace, one demotion — end state of the
    pointer table matches reference test_publish_updates_and_demotes."""
    states, pointers = stores
    _seed(
        spark, states, pointers,
        state_rows=[
            _success_state("run-load", logical_date=date(2024, 1, 1)),
            _success_state("run-new", logical_date=date(2024, 1, 2)),
        ],
        pointer_rows=[
            _pointer("run-old", logical_date=date(2024, 1, 2)),
            _pointer("obsolete-run", logical_date=date(2024, 1, 3)),
        ],
    )

    plan = WarehouseLoader(states, pointers).run()

    assert plan.counts() == {"load": 1, "replace": 1, "demote": 1}

    final = {
        r["logical_date"]: r["run_id"] for r in pointers.read().collect()
    }
    assert final == {
        date(2024, 1, 1): "run-load",
        date(2024, 1, 2): "run-new",
    }


def test_run_is_idempotent(spark, stores):
    """Re-running reconciliation after publish is a no-op (rerun safety —
    reference docs/warehouse_semantics.md:27-31)."""
    states, pointers = stores
    _seed(spark, states, pointers, state_rows=[_success_state("run-a")])

    loader = WarehouseLoader(states, pointers)
    loader.run()
    second = loader.run()

    assert second.counts() == {"load": 0, "replace": 0, "demote": 0}
    assert pointers.read().count() == 1
