"""Plan-shape regression gate: pinned exchange/join-operator counts for
representative queries at sf0.01.

test_plan_quality.py asserts qualitative properties (pushdown, codegen,
join kinds); this file pins the QUANTITY of expensive operators so a
refactor that silently adds a shuffle or flips a broadcast join into a
sort-merge join fails a test instead of a benchmark eyeball. Counts are
taken from the initial physical plan (deterministic for fixed data and
conf — AQE runtime re-plans don't change what Catalyst initially emits).
"""

from __future__ import annotations

import re

import pytest

from gads_etl_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"

#: name -> (hash exchanges, broadcast hash joins, sort-merge joins)
EXPECTED = {
    "q01_pricing_summary": (1, 0, 0),
    "q03_shipping_priority": (1, 2, 0),
    "q05_regional_revenue": (3, 4, 1),
    "q06_forecast_revenue": (0, 0, 0),
    "q18_large_orders": (1, 2, 0),
    "ext_exact_dedup": (1, 0, 0),
    "ext_snapshot_diff": (2, 0, 1),   # full outer: SMJ, fingerprint-width
    "ev_sessionization": (1, 0, 0),   # one user_id exchange
    "ext_decontaminate": (3, 1, 0),   # broadcast eval grams; agg exchanges
    "ext_encode_docs": (1, 1, 0),     # broadcast vocab, one re-assembly
}

FORBIDDEN = ("BroadcastNestedLoopJoin", "CartesianProduct")


def _shape(spark, name):
    plan = REGISTRY[name].fn(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    return (
        len(re.findall("Exchange hashpartitioning", plan)),
        len(re.findall("BroadcastHashJoin", plan)),
        len(re.findall("SortMergeJoin", plan)),
        [f for f in FORBIDDEN if f in plan],
    )


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_plan_shape_pinned(spark, name):
    ex, bhj, smj, bad = _shape(spark, name)
    assert not bad, f"{name} plans a {bad[0]}"
    assert (ex, bhj, smj) == EXPECTED[name], (
        f"{name} plan shape changed: exchanges={ex} broadcast={bhj} "
        f"sortmerge={smj}, expected {EXPECTED[name]} — if intentional, "
        "update EXPECTED with a justification")
