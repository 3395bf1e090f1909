"""Unit tests for the temporal joins and connected components.

The registered queries (ev_asof_attribution, ev_error_bursts,
ext_dup_clusters, ext_cluster_dedup) oracle-check these operators on the
fixtures; the sf0.01 documents graph only has short chains, so the
multi-hop / edge-case semantics are pinned here on synthetic frames.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gads_etl_spark.operators.graph import cluster_survivors, connected_components
from gads_etl_spark.operators.temporal import asof_join, interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:00:00"), "a"),
             (1, _ts("2024-01-01 12:00:00"), "b"),
             (2, _ts("2024-01-01 09:00:00"), "c"),
             (3, _ts("2024-01-01 10:00:00"), "d")],
            "user_id long, ts timestamp, tag string",
        )
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01 09:30:00"), 10.0),
             (1, _ts("2024-01-01 11:00:00"), 20.0),
             (2, _ts("2024-01-01 09:00:00"), 30.0),   # exactly simultaneous
             (2, _ts("2024-01-01 09:30:00"), 40.0)],  # after the left row
            "user_id long, ts timestamp, v double",
        )
        return left, right

    def test_backward_match_and_null(self, spark):
        left, right = self._frames(spark)
        out = {r["tag"]: r for r in asof_join(left, right, on="user_id").collect()}
        assert out["a"]["r_v"] == 10.0       # latest of the priors
        assert out["b"]["r_v"] == 20.0       # picks the newer one
        assert out["c"]["r_v"] == 30.0       # equality counts as prior
        assert out["d"]["r_v"] is None       # key with no right rows
        assert out["d"]["r_ts"] is None

    def test_left_row_count_preserved(self, spark):
        left, right = self._frames(spark)
        assert asof_join(left, right, on="user_id").count() == left.count()

    def test_no_nested_loop_join_in_plan(self, spark):
        left, right = self._frames(spark)
        plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestIntervalJoin:
    def test_multi_bucket_interval_no_duplicates(self, spark):
        # One interval spanning 3 hour-buckets; events in/out/boundary.
        intervals = spark.createDataFrame(
            [( _ts("2024-01-01 10:30:00"), _ts("2024-01-01 12:30:00"), "w1")],
            "start_ts timestamp, end_ts timestamp, name string",
        )
        events = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:29:59")),   # before start, same bucket
             (2, _ts("2024-01-01 10:30:00")),   # inclusive start
             (3, _ts("2024-01-01 11:15:00")),   # interior, middle bucket
             (4, _ts("2024-01-01 12:30:00")),   # inclusive end
             (5, _ts("2024-01-01 12:31:00"))],  # after end, same bucket
            "event_id long, ts timestamp",
        )
        got = sorted(r["event_id"] for r in interval_join(events, intervals).collect())
        assert got == [2, 3, 4]  # exactly once each — no per-bucket dup

    def test_overlapping_intervals_multiply(self, spark):
        intervals = spark.createDataFrame(
            [(_ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00"), "a"),
             (_ts("2024-01-01 10:30:00"), _ts("2024-01-01 11:30:00"), "b")],
            "start_ts timestamp, end_ts timestamp, name string",
        )
        events = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:45:00"))], "event_id long, ts timestamp",
        )
        names = sorted(r["name"] for r in interval_join(events, intervals).collect())
        assert names == ["a", "b"]


class TestConnectedComponents:
    def test_chain_collapses_to_one_component(self, spark):
        # Diameter-4 chain: min-label needs several propagation rounds.
        edges = spark.createDataFrame(
            [(2, 3), (3, 4), (4, 5), (5, 6)], "src long, dst long",
        )
        comp = {r["node"]: r["component"]
                for r in connected_components(edges).collect()}
        assert comp == {2: 2, 3: 2, 4: 2, 5: 2, 6: 2}

    def test_deep_chain_converges_in_log_rounds(self, spark):
        # A single 2000-node chain has diameter 2000: plain min-label
        # propagation could never converge within max_iter=25, but the
        # pointer-jumping (path-halving) step collapses chains
        # exponentially, so ~log2(2000) ~= 11 rounds suffice.
        edges = spark.range(0, 1999, 1, 4).selectExpr(
            "id AS src", "id + 1 AS dst")
        comps = connected_components(edges, max_iter=25)
        assert comps.select("component").distinct().count() == 1
        assert comps.agg({"component": "max"}).collect()[0][0] == 0
        assert comps.count() == 2000

    def test_separate_components_stay_separate(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)],
            "src long, dst long",
        )
        comp = {r["node"]: r["component"]
                for r in connected_components(edges).collect()}
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[10] == comp[11] == 10
        assert comp[20] == comp[21] == comp[22] == 20

    def test_edge_direction_irrelevant(self, spark):
        a = spark.createDataFrame([(5, 1), (1, 9)], "src long, dst long")
        b = spark.createDataFrame([(1, 5), (9, 1)], "src long, dst long")
        ca = sorted(map(tuple, connected_components(a).collect()))
        cb = sorted(map(tuple, connected_components(b).collect()))
        assert ca == cb == [(1, 1), (5, 1), (9, 1)]

    def test_driver_and_distributed_paths_agree(self, spark):
        # r16: small graphs resolve by driver-side union-find; the gate
        # must be invisible — both paths produce the identical (node,
        # component) relation on a seeded multi-component graph with
        # chains, cycles, and isolated pairs.
        import random

        rng = random.Random(42)
        rows = [(rng.randrange(0, 60), rng.randrange(0, 60))
                for _ in range(120)] + [(100, 101), (200, 201), (201, 202)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        fast = sorted(map(tuple, connected_components(edges).collect()))
        slow = sorted(map(tuple, connected_components(
            edges, driver_max_edges=0).collect()))
        assert fast == slow and len(fast) > 0

    def test_null_endpoint_falls_back_to_distributed(self, spark):
        # A NULL endpoint must not crash the union-find; the distributed
        # loop stays the arbiter of out-of-contract input.
        edges = spark.createDataFrame(
            [(1, 2), (None, 3)], "src long, dst long")
        out = connected_components(edges).collect()
        assert {r["node"] for r in out if r["node"] is not None} >= {1, 2}

    def test_string_node_ids_diameter_gt_one(self, spark):
        # The convergence fingerprint must be type-agnostic: a numeric
        # cast of string ids yields NULL, which would fake instant
        # convergence and freeze a chain after one propagation round.
        edges = spark.createDataFrame(
            [("e", "d"), ("d", "c"), ("c", "b"), ("b", "a")],
            "src string, dst string",
        )
        comp = {r["node"]: r["component"]
                for r in connected_components(edges).collect()}
        assert comp == {k: "a" for k in "abcde"}

    def test_cluster_survivors(self, spark):
        docs = spark.createDataFrame(
            [(1, "x"), (2, "x"), (3, "x"), (7, "y")], "doc_id long, text string",
        )
        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        comps = connected_components(edges)
        kept = sorted(r["doc_id"]
                      for r in cluster_survivors(docs, comps).collect())
        assert kept == [1, 7]  # cluster canonical + untouched singleton


class TestEdgeCases:
    def test_asof_tolerance_nulls_stale_matches(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 12:00:00"), "recent"),
             (2, _ts("2024-01-01 12:00:00"), "stale")],
            "user_id long, ts timestamp, tag string",
        )
        right = spark.createDataFrame(
            [(1, _ts("2024-01-01 11:30:00"), 1.0),    # 30 min old — keeps
             (2, _ts("2024-01-01 09:00:00"), 2.0)],   # 3 h old — nulled
            "user_id long, ts timestamp, v double",
        )
        out = {r["tag"]: r for r in
               asof_join(left, right, on="user_id", tolerance="1 hour").collect()}
        assert out["recent"]["r_v"] == 1.0
        assert out["stale"]["r_v"] is None and out["stale"]["r_ts"] is None

    def test_asof_empty_right(self, spark):
        left = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:00:00"), "a")],
            "user_id long, ts timestamp, tag string")
        right = spark.createDataFrame([], "user_id long, ts timestamp, v double")
        rows = asof_join(left, right, on="user_id").collect()
        assert len(rows) == 1 and rows[0]["r_v"] is None

    def test_interval_join_no_intervals(self, spark):
        events = spark.createDataFrame(
            [(1, _ts("2024-01-01 10:00:00"))], "event_id long, ts timestamp")
        intervals = spark.createDataFrame(
            [], "start_ts timestamp, end_ts timestamp, name string")
        assert interval_join(events, intervals).count() == 0

    def test_components_empty_edges(self, spark):
        edges = spark.createDataFrame([], "src long, dst long")
        assert connected_components(edges).count() == 0

    def test_components_self_loop(self, spark):
        edges = spark.createDataFrame([(5, 5), (1, 2)], "src long, dst long")
        comp = {r["node"]: r["component"]
                for r in connected_components(edges).collect()}
        assert comp[5] == 5 and comp[1] == comp[2] == 1


class TestScd2History:
    """scd2_history: gaps-and-islands edge cases on synthetic changelogs."""

    def _hist(self, spark, rows):
        from gads_etl_spark.operators.temporal import scd2_history

        df = spark.createDataFrame(
            rows, "k long, ts timestamp, eid long, v string"
        )
        return {
            (r.k, r.v, r.valid_from, r.valid_to, r.is_current, r.n_events)
            for r in scd2_history(df, "k", "v", "ts", "eid").collect()
        }

    def test_runs_collapse_and_reopen(self, spark):
        # a,a,b,a → three runs: the value returning later opens a NEW
        # run (Type-2 history), never merges with the first.
        t = [_ts(f"2024-01-01 0{i}:00:00") for i in range(4)]
        got = self._hist(
            spark,
            [(1, t[0], 0, "a"), (1, t[1], 1, "a"),
             (1, t[2], 2, "b"), (1, t[3], 3, "a")],
        )
        assert got == {
            (1, "a", t[0], t[2], False, 2),
            (1, "b", t[2], t[3], False, 1),
            (1, "a", t[3], None, True, 1),
        }

    def test_validity_ranges_tile_per_key(self, spark):
        # valid_to of run i == valid_from of run i+1; exactly one
        # current row per key; no gaps and no overlaps.
        t = [_ts(f"2024-01-01 0{i}:00:00") for i in range(6)]
        rows = [(1, t[i], i, v) for i, v in enumerate("aabba")] + [
            (2, t[5], 5, "z")
        ]
        got = sorted(self._hist(spark, rows))
        per_key = {}
        for k, v, vf, vt, cur, n in got:
            per_key.setdefault(k, []).append((vf, vt, cur))
        for k, runs in per_key.items():
            runs.sort()
            assert sum(1 for _, vt, cur in runs if cur) == 1
            for (f0, t0, _), (f1, _, _) in zip(runs, runs[1:]):
                assert t0 == f1
            assert runs[-1][1] is None

    def test_equal_ts_tiebreak_is_deterministic(self, spark):
        # Two rows at the identical timestamp: eid orders them, so the
        # run sequence is a(2 events) → b, not a/b/a.
        t0 = _ts("2024-01-01 00:00:00")
        t1 = _ts("2024-01-01 01:00:00")
        got = self._hist(
            spark,
            [(1, t0, 1, "a"), (1, t0, 0, "a"), (1, t1, 2, "b")],
        )
        assert got == {
            (1, "a", t0, t1, False, 2),
            (1, "b", t1, None, True, 1),
        }

    def test_single_row_key_is_current(self, spark):
        t0 = _ts("2024-01-01 00:00:00")
        got = self._hist(spark, [(7, t0, 0, "only")])
        assert got == {(7, "only", t0, None, True, 1)}


class TestClusterSurvivorsBy:
    def test_best_member_kept_not_min_id(self, spark):
        from gads_etl_spark.operators.graph import cluster_survivors_by

        docs = spark.createDataFrame(
            [(1, 10), (2, 99), (3, 99), (7, 5), (9, 42)],
            "doc_id long, quality long")
        # cluster {1,2,3}; 7 and 9 unpaired
        comps = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1)], "node long, component long")
        got = sorted(
            r["doc_id"] for r in cluster_survivors_by(
                docs, comps, [F.desc("quality"), F.asc("doc_id")]).collect())
        # best = doc 2 (quality 99, lower id than 3); min-id policy
        # would have kept doc 1
        assert got == [2, 7, 9]

    def test_unpaired_rows_bypass_ranking(self, spark):
        from gads_etl_spark.operators.graph import cluster_survivors_by

        docs = spark.createDataFrame(
            [(i, i * 2) for i in range(20)], "doc_id long, quality long")
        comps = spark.createDataFrame([], "node long, component long")
        out = cluster_survivors_by(
            docs, comps, [F.desc("quality"), F.asc("doc_id")])
        assert out.count() == 20  # nothing clustered → nothing dropped


class TestPagerank:
    def _pr(self, spark, edges, **kw):
        from gads_etl_spark.operators.graph import pagerank

        e = spark.createDataFrame(edges, "src INT, dst INT, w LONG")
        return {r["node"]: r["pr_scaled"]
                for r in pagerank(e, weight="w", **kw).collect()}

    def test_symmetric_pair_splits_mass_evenly(self, spark):
        pr = self._pr(spark, [(1, 2, 1), (2, 1, 1)])
        assert pr[1] == pr[2]
        assert abs(pr[1] + pr[2] - 1_000_000_000_000) < 100

    def test_cycle_is_uniform(self, spark):
        n = 6
        edges = [(i, (i + 1) % n, 1) for i in range(n)] + \
                [((i + 1) % n, i, 1) for i in range(n)]
        pr = self._pr(spark, edges)
        assert len(set(pr.values())) == 1

    def test_hub_outranks_leaves(self, spark):
        # star: hub 0 <-> leaves 1..5 (symmetrized)
        edges = [(0, i, 1) for i in range(1, 6)] + \
                [(i, 0, 1) for i in range(1, 6)]
        pr = self._pr(spark, edges)
        assert all(pr[0] > pr[i] for i in range(1, 6))
        assert len({pr[i] for i in range(1, 6)}) == 1  # leaves tie exactly

    def test_edge_weight_steers_rank(self, spark):
        # triangle, but 1<->2 carries 10x the weight of edges touching 3
        edges = [(1, 2, 10), (2, 1, 10), (1, 3, 1), (3, 1, 1),
                 (2, 3, 1), (3, 2, 1)]
        pr = self._pr(spark, edges)
        assert pr[1] == pr[2] > pr[3]

    def test_mass_conserved_within_rounding(self, spark):
        edges = [(a, b, (a * 7 + b) % 5 + 1)
                 for a in range(20) for b in range(20) if a != b and (a + b) % 3 == 0]
        edges += [(b, a, w) for a, b, w in edges]
        pr = self._pr(spark, list(set(edges)))
        total = sum(pr.values())
        # floor-division dust only: <= ~2 units per node per step
        assert 0 < 1_000_000_000_000 - total < 40 * len(pr)

    def test_partitioning_invariant(self, spark):
        from gads_etl_spark.operators.graph import pagerank

        edges = [(a, (a * 13) % 50, 1 + a % 3) for a in range(50)]
        edges += [(b, a, w) for a, b, w in edges]
        e = spark.createDataFrame(sorted(set(edges)), "src INT, dst INT, w LONG")
        one = {r["node"]: r["pr_scaled"]
               for r in pagerank(e.coalesce(1), weight="w").collect()}
        many = {r["node"]: r["pr_scaled"]
                for r in pagerank(e.repartition(17), weight="w").collect()}
        assert one == many

    def test_empty_graph(self, spark):
        from gads_etl_spark.operators.graph import pagerank

        e = spark.createDataFrame([], "src INT, dst INT, w LONG")
        assert pagerank(e, weight="w").count() == 0
