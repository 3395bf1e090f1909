"""Property-based tests (hypothesis) for the subtle single-purpose
semantics: MERGE last-writer-wins, terminal-marker idempotency, run_id
ordering. Each property is checked against a plain-Python model.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gads_etl_spark.pipeline.control_plane import TERMINAL_MARKER, terminal_message
from gads_etl_spark.pipeline.keys import new_run_id
from gads_etl_spark.pipeline.state_store import merge_upsert

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.integers(min_value=0, max_value=1_000_000)
SLOW = settings(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


class TestMergeUpsertProperty:
    @SLOW
    @given(
        current=st.lists(st.tuples(KEYS, VALS), max_size=12),
        updates=st.lists(st.tuples(KEYS, VALS), max_size=12),
    )
    def test_matches_dict_model(self, spark, current, updates):
        """merge_upsert == dict.update with update-priority, for any
        key/value multiset (duplicate update keys: exactly one survives).
        """
        model = {}
        for k, v in current:
            model[k] = ("cur", k, v)
        surviving_update_keys = {k for k, _ in updates}
        cur_df = spark.createDataFrame(
            [(k, v) for k, v in {k: (k, v) for k, v in current}.values()],
            "k INT, v INT",
        ) if current else spark.createDataFrame([], "k INT, v INT")
        upd_df = spark.createDataFrame(updates, "k INT, v INT") \
            if updates else spark.createDataFrame([], "k INT, v INT")

        # Model: dedupe current by key (last wins is irrelevant — inputs
        # deduped above), then any update key overrides.
        cur_unique = {k: v for k, v in {k: (k, v) for k, v in current}.values()}
        merged = merge_upsert(cur_df, upd_df, ("k",)).collect()

        got_keys = {r.k for r in merged}
        assert got_keys == set(cur_unique) | surviving_update_keys
        upd_by_key = {}
        for k, v in updates:
            upd_by_key.setdefault(k, set()).add(v)
        for r in merged:
            if r.k in upd_by_key:
                assert r.v in upd_by_key[r.k]  # an update row won
            else:
                assert r.v == cur_unique[r.k]  # untouched current row


class TestBucketedTableModel:
    """Model-based check of the bucketed versioned table: any sequence of
    merges / deletes / vacuums must leave the table equal to a plain dict
    applying the same operations — across bucket boundaries, carry-over
    chains, and data-dir garbage collection."""

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(ops=st.lists(
        st.one_of(
            st.tuples(st.just("merge"),
                      st.dictionaries(KEYS, VALS, min_size=1, max_size=6)),
            st.tuples(st.just("delete"),
                      st.sets(KEYS, min_size=1, max_size=4)),
            st.tuples(st.just("commit"),
                      st.dictionaries(KEYS, VALS, max_size=6)),
            st.tuples(st.just("vacuum"), st.just(None)),
        ),
        min_size=1, max_size=6,
    ))
    def test_matches_dict_model(self, spark, ops):
        """Any interleaving of merge / delete / full-replace commit /
        vacuum must leave (a) read() equal to the dict model, and
        (b) EVERY surviving version time-travelling to the exact model
        snapshot recorded when it committed — including versions whose
        buckets are carry-over references into vacuumed-away commits'
        data dirs."""
        import tempfile

        from pyspark.sql import types as T

        from gads_etl_spark.pipeline.state_store import _VersionedTable

        schema = T.StructType([
            T.StructField("k", T.IntegerType(), False),
            T.StructField("v", T.IntegerType(), False),
        ])
        table = _VersionedTable(
            spark, tempfile.mkdtemp(prefix="vt-model-"), schema,
            key_cols=("k",), n_buckets=4,  # small → heavy bucket reuse
        )
        model: dict[int, int] = {}
        snapshots: dict[str, dict[int, int]] = {}

        def record():
            snapshots[table._current_version()] = dict(model)

        for op, arg in ops:
            if op == "merge":
                table.merge(spark.createDataFrame(
                    list(arg.items()), schema))
                model.update(arg)
                record()
            elif op == "delete":
                table.delete_keys(spark.createDataFrame(
                    [(k, 0) for k in arg], schema))
                for k in arg:
                    model.pop(k, None)
                if table._current_version() is not None:
                    record()  # delete on an empty table commits nothing
            elif op == "commit":
                table.commit(spark.createDataFrame(
                    list(arg.items()), schema) if arg
                    else spark.createDataFrame([], schema))
                model = dict(arg)
                record()
            else:
                table.vacuum(keep=2)
        got = {r.k: r.v for r in table.read().collect()}
        assert got == model
        # Time-travel consistency for every surviving version.
        for v in table.history():
            assert v in snapshots, f"unrecorded version {v} in history"
            travelled = {r.k: r.v for r in table.read_version(v).collect()}
            assert travelled == snapshots[v], f"time travel diverged at {v}"


class TestTerminalMessageProperty:
    @SLOW
    @given(msgs=st.lists(
        st.one_of(st.none(), st.text(
            alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs")),
            max_size=40,
        )),
        min_size=1, max_size=20,
    ))
    def test_idempotent_and_marking(self, spark, msgs):
        """f(f(x)) == f(x), and f(x) always contains the marker; an
        already-terminal message passes through unchanged."""
        df = spark.createDataFrame([(m,) for m in msgs], "e STRING")
        once = df.select(terminal_message(F.col("e")).alias("e"))
        twice = once.select(terminal_message(F.col("e")).alias("e"))
        a = [r.e for r in once.collect()]
        b = [r.e for r in twice.collect()]
        assert sorted(a) == sorted(b)
        assert all(TERMINAL_MARKER in x for x in a)
        for m, out in zip(msgs, [r.e for r in once.collect()]):
            if m and TERMINAL_MARKER in m:
                assert out == m


class TestRunIdProperty:
    @given(st.lists(
        st.datetimes(min_value=datetime(2000, 1, 1), max_value=datetime(2099, 1, 1))
        .map(lambda d: d.replace(tzinfo=timezone.utc)),
        min_size=2, max_size=50,
    ))
    @settings(max_examples=200, deadline=None)
    def test_lexicographic_equals_chronological(self, times):
        """The whole authority design hinges on this: run_id string order
        == timestamp order (at ms resolution)."""
        ms = [t.replace(microsecond=(t.microsecond // 1000) * 1000) for t in times]
        ids = [new_run_id(t) for t in ms]
        assert sorted(ids) == [new_run_id(t) for t in sorted(ms)]


class TestAsofJoinProperty:
    @SLOW
    @given(
        left=st.lists(st.tuples(KEYS, st.integers(0, 50)), min_size=1, max_size=15),
        right=st.lists(st.tuples(KEYS, st.integers(0, 50), VALS), max_size=15),
    )
    def test_matches_quadratic_model(self, spark, left, right):
        """asof_join == the O(n²) definition: for each left row, the right
        row with max ts ≤ left.ts on the same key (None if no such row),
        for any key/timestamp multiset including ties."""
        import datetime as dt

        from gads_etl_spark.operators.temporal import asof_join

        base = dt.datetime(2024, 1, 1)
        # Dedup right to one row per (key, ts) — the documented contract
        # (pre-aggregate the right side), keeping the max payload.
        rdict = {}
        for k, ts, v in right:
            rdict[(k, ts)] = max(v, rdict.get((k, ts), v))
        rrows = [(k, base + dt.timedelta(seconds=ts), v)
                 for (k, ts), v in rdict.items()]
        lrows = [(i, k, base + dt.timedelta(seconds=ts))
                 for i, (k, ts) in enumerate(left)]

        ldf = spark.createDataFrame(lrows, "row_id long, user_id int, ts timestamp")
        rdf = spark.createDataFrame(rrows, "user_id int, ts timestamp, v long") \
            if rrows else spark.createDataFrame([], "user_id int, ts timestamp, v long")

        got = {r["row_id"]: (r["r_ts"], r["r_v"])
               for r in asof_join(ldf, rdf, on="user_id").collect()}

        for row_id, k, lts in lrows:
            cands = [(ts, v) for (kk, ts2), v in rdict.items()
                     for ts in [base + dt.timedelta(seconds=ts2)]
                     if kk == k and ts <= lts]
            expect = max(cands) if cands else (None, None)
            assert got[row_id] == expect, (row_id, got[row_id], expect)


class TestScd2Property:
    @SLOW
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),      # key
                st.integers(min_value=0, max_value=20),     # ts (seconds)
                st.sampled_from(["a", "b", "c", None]),     # value (incl. NULL)
            ),
            min_size=1, max_size=25,
        )
    )
    def test_matches_python_runs_model(self, spark, rows):
        """scd2_history == a sequential gaps-and-islands fold per key,
        for any changelog (duplicate timestamps tie-broken by eid),
        including NULL attribute values: the Python model's `==` is
        null-safe (None == None), so this pins the eqNullSafe change
        flag — `lag != col` silently merges NULL rows into the previous
        run."""
        from datetime import datetime, timezone

        from gads_etl_spark.operators.temporal import scd2_history

        data = [
            (k, datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None), i, v)
            for i, (k, ts, v) in enumerate(rows)
        ]
        # pure-python model: per key, order by (ts, eid), collapse runs
        model = set()
        bykey: dict = {}
        for k, ts, eid, v in sorted(data, key=lambda r: (r[0], r[1], r[2])):
            bykey.setdefault(k, []).append((ts, v))
        for k, seq in bykey.items():
            runs = []
            for ts, v in seq:
                if runs and runs[-1][0] == v:
                    runs[-1][2] += 1
                else:
                    runs.append([v, ts, 1])
            for i, (v, vf, n) in enumerate(runs):
                vt = runs[i + 1][1] if i + 1 < len(runs) else None
                model.add((k, v, vf, vt, vt is None, n))

        df = spark.createDataFrame(data, "k long, ts timestamp, eid long, v string")
        got = {
            (r.k, r.v, r.valid_from, r.valid_to, r.is_current, r.n_events)
            for r in scd2_history(df, "k", "v", "ts", "eid").collect()
        }
        assert got == model


class TestBlockPackProperty:
    """block_pack vs a plain-Python model: concatenate each shard's docs
    in id order, cut into B-sized blocks — outputs must be identical for
    ANY corpus shape (empty docs, giant docs, ragged shards)."""

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),          # shard
                st.lists(st.integers(min_value=0, max_value=99),
                         max_size=17),                          # token_ids
            ),
            max_size=14,
        ),
        block=st.integers(min_value=1, max_value=7),
    )
    def test_matches_python_model(self, spark, docs, block):
        from gads_etl_spark.operators.sampling import block_pack

        rows = [(int(s), int(i), [int(t) for t in ids])
                for i, (s, ids) in enumerate(docs)]
        # model: per shard, concat in doc_id order, slice into blocks
        streams = {}
        for s, i, ids in sorted(rows, key=lambda r: r[1]):
            streams.setdefault(s, []).extend(ids)
        expect = {}
        for s, stream in streams.items():
            for b in range(0, (len(stream) + block - 1) // block):
                expect[(s, b)] = stream[b * block:(b + 1) * block]
        df = spark.createDataFrame(
            rows, "shard long, doc_id long, token_ids array<long>")
        got = {(r["shard"], r["block_id"]): list(r["token_ids"])
               for r in block_pack(df, block, "shard").collect()}
        assert got == expect


class TestSnapshotDiffProperty:
    """snapshot_diff vs a dict model, fingerprint and exact paths both —
    random key overlaps, random value collisions, nulls included."""

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        old=st.dictionaries(KEYS, st.one_of(st.none(), VALS), max_size=10),
        new=st.dictionaries(KEYS, st.one_of(st.none(), VALS), max_size=10),
        fingerprint=st.booleans(),
    )
    def test_matches_dict_model(self, spark, old, new, fingerprint):
        from gads_etl_spark.operators.cdc import snapshot_diff

        expect = {}
        for k in set(old) | set(new):
            if k not in new:
                expect[k] = "removed"
            elif k not in old:
                expect[k] = "added"
            elif old[k] != new[k]:
                expect[k] = "changed"
        df_old = spark.createDataFrame(
            [(k, v) for k, v in old.items()] or [(None, None)], "k int, v int"
        ).where(F.col("k").isNotNull())
        df_new = spark.createDataFrame(
            [(k, v) for k, v in new.items()] or [(None, None)], "k int, v int"
        ).where(F.col("k").isNotNull())
        got = {r["k"]: r["change"]
               for r in snapshot_diff(df_old, df_new, ["k"],
                                      fingerprint=fingerprint).collect()}
        assert got == expect
