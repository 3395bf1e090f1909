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
    # r16: (4,3,0) → (3,3,0) — the hot set now derives from the profile
    # aggregate the query builds anyway (its exchange was already
    # counted) instead of a separate sketch-then-confirm pass, dropping
    # the confirm scan's aggregation exchange; events is scanned twice
    # per run (probe + profile), down from five scans + two eager jobs.
    "ev_hot_user_enrichment": (3, 3, 0),
    # r16: (4,2,1) → (4,1,1) — the BM25 leg's separate doc-length scan
    # + |corpus|-row broadcast join folded into the tf tokenize pass
    # (dl rides the tf aggregate as a grouping column).
    "ext_hybrid_search": (4, 1, 1),
    "ext_temperature_mix": (4, 2, 0),  # stats broadcast; scan predicate
    # r10: +2 ex / +2 bhj over r9's (5, 3, 0) — the term semi-join that
    # replaced the driver-collected IN literal: q.distinct() is one tiny
    # exchange + LeftSemi broadcast, duplicated because the tf subtree
    # feeds both the score and the df branch. r16: (7,5,0) → (7,4,0) —
    # the separate doc-length scan + |corpus|-row broadcast join folded
    # into the tf tokenize pass (dl rides the tf aggregate as a
    # grouping column); the two tf subtrees stay deliberately
    # NON-identical (see bm25_scores_multi — forcing exchange reuse
    # measured 3-5x slower by serializing the branches).
    "ext_bm25_multi": (7, 4, 0),
    "ext_knn_ivfpq_res": (2, 3, 0),   # cell equi-join; corpus never shuffles wide
    "op_trend_fit": (2, 2, 0),        # monthly rollup + nation fit; dims broadcast
    "op_resample_interpolate": (2, 1, 0),  # daily rollup + key window; grid join broadcast
    "ext_epoch_shuffle": (1, 0, 0),   # one shard exchange, in-shard sort only
}

FORBIDDEN = ("BroadcastNestedLoopJoin", "CartesianProduct")

#: Queries whose plan legitimately carries BroadcastNestedLoopJoin(s):
#: crossJoins against an explicitly broadcast SINGLE-ROW side (the
#: query vector / the corpus-totals row) — a deliberate scalar fan-out,
#: not an accidental cross product. ev_hot_user_enrichment carries two
#: instances of the same one-row totals attachment (the hot-set subtree
#: feeds both sides of the salted join, duplicating its scalar
#: crossJoin). CartesianProduct stays forbidden everywhere.
ALLOWED_BNLJ = {"ext_hybrid_search", "ext_temperature_mix",
                "ev_hot_user_enrichment"}


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
    if name in ALLOWED_BNLJ:
        bad = [f for f in bad if f != "BroadcastNestedLoopJoin"]
    assert not bad, f"{name} plans a {bad[0]}"
    assert (ex, bhj, smj) == EXPECTED[name], (
        f"{name} plan shape changed: exchanges={ex} broadcast={bhj} "
        f"sortmerge={smj}, expected {EXPECTED[name]} — if intentional, "
        "update EXPECTED with a justification")
