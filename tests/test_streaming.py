"""Structured Streaming tests: batch results are the oracle for streams.

Events are split across multiple JSON files (one micro-batch each), run
through the streaming jobs into memory sinks, and compared against the
same logic executed in plain batch — plus a state-persistence check for
the applyInPandasWithState counter.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.streaming.jobs import (
    EVENTS_SCHEMA,
    read_events_stream,
    stateful_user_counters,
    tumbling_counts_stream,
)


def _write_event_files(tmp_path, spark):
    """Three files → three deterministic micro-batches."""
    rows = [
        # (event_id, ts, user_id, event_type, value)
        (1, "2024-01-01 00:05:00", 1, "click", 1.50),
        (2, "2024-01-01 00:10:00", 1, "view", 2.25),
        (3, "2024-01-01 00:55:00", 2, "click", 4.00),
        (4, "2024-01-01 01:05:00", 1, "click", 8.00),
        (5, "2024-01-01 01:20:00", 2, "view", 0.75),
        (6, "2024-01-01 02:10:00", 1, "click", 3.00),
    ]
    files = [rows[:3], rows[3:5], rows[5:]]
    src = tmp_path / "stream-src"
    src.mkdir()
    for i, batch in enumerate(files):
        with open(src / f"batch-{i}.json", "w") as f:
            for e in batch:
                f.write(json.dumps({
                    "event_id": e[0], "ts": e[1], "user_id": e[2],
                    "event_type": e[3], "value": e[4], "props": "{}",
                }) + "\n")
    batch_df = spark.read.schema(EVENTS_SCHEMA).json(str(src))
    return str(src), batch_df


def _run_stream(df, name, mode):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.processAllAvailable()
    q.stop()


class TestContinuousValidation:
    def test_sealed_partitions_validate_via_stream(self, spark, tmp_path):
        from datetime import date

        from pyspark.sql import functions as F

        from gads_etl_spark.pipeline import PartitionKey, RawZone, StateStore
        from gads_etl_spark.streaming.jobs import continuous_validation

        raw = RawZone(spark, str(tmp_path / "raw"))
        states = StateStore(spark, str(tmp_path / "state"))
        keys = [PartitionKey("google_ads", str(c), "campaign_stats", date(2024, 1, 1))
                for c in range(3)]
        for k in keys:
            raw.write_partition(
                spark.range(4).select(F.col("id").alias("campaign_id")), k, "run-a")

        q = continuous_validation(raw, states, str(tmp_path / "ckpt"))
        q.awaitTermination(120)

        rows = states.read().collect()
        assert len(rows) == 3
        assert all(r.status == "success" and r.current_run_id == "run-a" for r in rows)

        # New seals after a restart are picked up exactly once (checkpoint).
        k2 = PartitionKey("google_ads", "9", "campaign_stats", date(2024, 1, 2))
        raw.write_partition(
            spark.range(2).select(F.col("id").alias("campaign_id")), k2, "run-b")
        q2 = continuous_validation(raw, states, str(tmp_path / "ckpt"))
        q2.awaitTermination(120)
        rows = {(r.customer_id, r.status, r.attempt_count) for r in states.read().collect()}
        assert ("9", "success", 1) in rows
        # Previously validated partitions were NOT revalidated.
        assert all(a == 1 for (_, _, a) in rows)


class TestContinuousPublish:
    """Streaming curated publish: validate → stage → pointer swap per
    micro-batch, replay-safe — a killed-mid-publish batch re-delivers and
    converges with no mixed run_ids and no double-publish."""

    @staticmethod
    def _zones(spark, tmp_path):
        from gads_etl_spark.pipeline import PointerStore, RawZone, StateStore
        from gads_etl_spark.pipeline.curated_sink import CuratedZone

        # Same non-local-scheme witness as test_object_store_parity: the
        # whole publish pipeline runs against a viewfs:// root.
        mount = f"pubstream-{tmp_path.name.lower()}"
        hc = spark.sparkContext._jsc.hadoopConfiguration()
        hc.set(f"fs.viewfs.mounttable.{mount}.link./zone", f"file://{tmp_path}")
        root = f"viewfs://{mount}/zone"
        return (RawZone(spark, f"{root}/raw"),
                StateStore(spark, f"{root}/state"),
                PointerStore(spark, f"{root}/pointers"),
                CuratedZone(spark, f"{root}/curated"),
                str(tmp_path / "ckpt"))

    def test_publish_end_to_end_then_replace(self, spark, tmp_path):
        from datetime import date

        from gads_etl_spark.pipeline import PartitionKey
        from gads_etl_spark.pipeline.consumer import read_published
        from gads_etl_spark.streaming.jobs import continuous_publish

        raw, states, pointers, curated, ckpt = self._zones(spark, tmp_path)
        key = PartitionKey("google_ads", "1", "campaign_stats", date(2024, 1, 1))
        raw.write_partition(
            spark.range(4).select(F.col("id").alias("campaign_id")), key, "run-a")

        q = continuous_publish(raw, states, pointers, curated, ckpt)
        q.awaitTermination(120)

        assert pointers.get(key)["run_id"] == "run-a"
        vis = read_published(curated, pointers)
        assert vis.count() == 4
        assert {r.run_id for r in vis.select("run_id").distinct().collect()} == {"run-a"}

        # A later, larger run replaces atomically via the pointer swap.
        raw.write_partition(
            spark.range(6).select(F.col("id").alias("campaign_id")), key, "run-b")
        q2 = continuous_publish(raw, states, pointers, curated, ckpt)
        q2.awaitTermination(120)
        assert pointers.get(key)["run_id"] == "run-b"
        vis = read_published(curated, pointers)
        assert vis.count() == 6
        assert {r.run_id for r in vis.select("run_id").distinct().collect()} == {"run-b"}

    def test_kill_between_stage_and_swap_replays_cleanly(
            self, spark, tmp_path, monkeypatch):
        from datetime import date

        from gads_etl_spark.pipeline import PartitionKey
        from gads_etl_spark.pipeline.consumer import read_published
        from gads_etl_spark.pipeline.loader import WarehouseLoader
        from gads_etl_spark.streaming.jobs import continuous_publish

        raw, states, pointers, curated, ckpt = self._zones(spark, tmp_path)
        key = PartitionKey("google_ads", "1", "campaign_stats", date(2024, 1, 1))
        raw.write_partition(
            spark.range(4).select(F.col("id").alias("campaign_id")), key, "run-a")
        q = continuous_publish(raw, states, pointers, curated, ckpt)
        q.awaitTermination(120)
        assert pointers.get(key)["run_id"] == "run-a"

        # run-b seals; the publishing batch dies AFTER staging the
        # curated copy but BEFORE the pointer swap.
        raw.write_partition(
            spark.range(6).select(F.col("id").alias("campaign_id")), key, "run-b")

        def crash(self, plan=None):
            raise RuntimeError("injected crash before pointer swap")

        monkeypatch.setattr(WarehouseLoader, "run", crash)
        q2 = continuous_publish(raw, states, pointers, curated, ckpt)
        with pytest.raises(Exception, match="injected crash"):
            q2.awaitTermination(120)
            raise RuntimeError(q2.exception() or "stream ended without error")
        monkeypatch.undo()

        # Mid-crash state: run-b is staged but INVISIBLE — consumers
        # resolve through pointers, which still name run-a only.
        assert curated.is_sealed(key, "run-b")  # the stage half happened
        assert pointers.get(key)["run_id"] == "run-a"
        vis = read_published(curated, pointers)
        assert {r.run_id for r in vis.select("run_id").distinct().collect()} == {"run-a"}
        assert vis.count() == 4  # never a mix of run-a and run-b rows

        # Restart from the same checkpoint: the failed batch re-delivers,
        # staging skips the already-sealed copy, the swap completes.
        q3 = continuous_publish(raw, states, pointers, curated, ckpt)
        q3.awaitTermination(120)
        assert pointers.get(key)["run_id"] == "run-b"
        ptr_rows = pointers.read().collect()
        assert len(ptr_rows) == 1  # no double-publish: one pointer per key
        vis = read_published(curated, pointers)
        assert vis.count() == 6
        assert {r.run_id for r in vis.select("run_id").distinct().collect()} == {"run-b"}


class TestStreaming:
    def test_tumbling_counts_match_batch(self, spark, tmp_path):
        src, batch_df = _write_event_files(tmp_path, spark)
        stream = read_events_stream(spark, src)
        _run_stream(tumbling_counts_stream(stream), "t_tumbling", "complete")

        got = {
            (str(r.window_start), r.event_type): (r.n_events, r.value_sum)
            for r in spark.table("t_tumbling").collect()
        }
        expected = {
            (str(r.window_start), r.event_type): (r.n_events, r.value_sum)
            for r in tumbling_counts_stream(batch_df).collect()
        }
        assert got == expected and len(got) == 5

    def test_stateful_counters_accumulate_across_batches(self, spark, tmp_path):
        src, batch_df = _write_event_files(tmp_path, spark)
        stream = read_events_stream(spark, src)
        _run_stream(stateful_user_counters(stream), "t_counters", "update")

        # Memory sink in update mode appends every state emission; the
        # LAST emission per user must equal the batch totals, and earlier
        # emissions prove state persisted across micro-batches.
        rows = spark.sql(
            "SELECT * FROM t_counters"
        ).collect()
        final = {}
        for r in rows:
            final[r.user_id] = (r.n_events, r.total_value)
        batch_totals = {
            r.user_id: (r.cnt, r.total)
            for r in batch_df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("cnt"),
                (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100)
                .alias("total"),
            ).collect()
        }
        assert final == batch_totals
        emissions_user1 = [r for r in rows if r.user_id == 1]
        assert len(emissions_user1) >= 2  # updated in more than one batch
        assert final[1] == (4, 14.75)

    def test_stateful_transitions_chain_across_batches(self, spark, tmp_path):
        from gads_etl_spark.streaming.jobs import stateful_transitions

        src, batch_df = _write_event_files(tmp_path, spark)
        stream = read_events_stream(spark, src)
        _run_stream(stateful_transitions(stream), "t_transitions", "append")

        got = sorted(
            (r.user_id, r.from_type, r.to_type)
            for r in spark.sql("SELECT * FROM t_transitions").collect()
        )
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        want = sorted(
            (r.user_id, r.prev, r.event_type)
            for r in batch_df.select(
                "user_id", "event_type",
                F.lag("event_type").over(w).alias("prev"),
            ).where(F.col("prev").isNotNull()).collect()
        )
        assert got == want and len(want) == 4
        # The fixture's batch boundaries split every user's event run, so
        # at least one transition per user must CHAIN across micro-batches
        # (user 1: view@b1 -> click@b2; user 2: click@b1 -> view@b2) —
        # only carried state can produce those rows in append mode.
        assert (1, "view", "click") in got
        assert (2, "click", "view") in got

    def test_out_of_order_transitions_match_batch_oracle(self, spark, tmp_path):
        # A feed that interleaves out of event-time order ACROSS batches
        # (the 00:30 view arrives a micro-batch after the 01:00 buy).
        # The watermark-buffered kernel must chain in EVENT-TIME order —
        # the batch lag() oracle — where the in-order kernel provably
        # chains in arrival order and diverges.
        from gads_etl_spark.streaming.jobs import (
            stateful_transitions,
            stateful_transitions_ooo,
        )

        rows = [
            (1, "2024-01-01 00:05:00", 1, "click", 1.0),
            (2, "2024-01-01 01:00:00", 1, "buy", 1.0),
            (3, "2024-01-01 00:30:00", 1, "view", 1.0),   # late, in-window
            (4, "2024-01-01 05:00:00", 2, "click", 1.0),  # advances watermark
        ]
        import os
        import time

        src = tmp_path / "ooo-src"
        src.mkdir()
        now = time.time()
        for i, batch in enumerate([rows[:2], rows[2:3], rows[3:]]):
            p = src / f"batch-{i}.json"
            with open(p, "w") as f:
                for e in batch:
                    f.write(json.dumps({
                        "event_id": e[0], "ts": e[1], "user_id": e[2],
                        "event_type": e[3], "value": e[4], "props": "{}",
                    }) + "\n")
            # Distinct mtimes pin the file source's batch ORDER — the
            # whole point is that batch-1 (the late view) is read before
            # batch-2 advances the watermark.
            os.utime(p, (now + i * 10, now + i * 10))

        _run_stream(stateful_transitions_ooo(
            read_events_stream(spark, str(src)), delay="1 hour"),
            "t_ooo", "append")
        got = sorted((r.user_id, r.from_type, r.to_type)
                     for r in spark.table("t_ooo").collect())
        # Final watermark = 05:00 − 1h = 04:00 > every user-1 event, so
        # the full event-time chain emits; user 2's 05:00 event is still
        # immature (buffered, no transition).
        assert got == [(1, "click", "view"), (1, "view", "buy")]

        # Cross-check against the batch lag() oracle over the matured
        # prefix (ts < final watermark).
        from pyspark.sql.window import Window

        mature = spark.createDataFrame(
            [r for r in rows if r[1] < "2024-01-01 04:00:00"],
            "event_id long, ts string, user_id long, event_type string, value double")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        want = sorted(
            (r.user_id, r.prev, r.event_type)
            for r in mature.select(
                "user_id", "event_type",
                F.lag("event_type").over(w).alias("prev"))
            .where(F.col("prev").isNotNull()).collect())
        assert got == want

        # The in-order kernel on the same feed chains in ARRIVAL order —
        # demonstrably NOT the oracle (this is the case the ooo variant
        # exists for).
        _run_stream(stateful_transitions(read_events_stream(spark, str(src))),
                    "t_inorder", "append")
        got_inorder = sorted((r.user_id, r.from_type, r.to_type)
                             for r in spark.table("t_inorder").collect())
        assert (1, "click", "buy") in got_inorder
        assert got_inorder != want

    def _idle_ttl_feed(self, tmp_path):
        # user 1: click@10:00 then buy@11:20 — an 80-minute idle gap.
        # user 2 ("nav"): steady events that advance the watermark
        # through and past user 1's gap.
        batches = [
            [(1, "2024-01-01 10:00:00", 1, "click"),
             (100, "2024-01-01 10:00:00", 2, "nav")],
            [(101, "2024-01-01 10:10:00", 2, "nav")],
            [(102, "2024-01-01 10:20:00", 2, "nav")],
            [(103, "2024-01-01 11:00:00", 2, "nav")],
            [(104, "2024-01-01 11:10:00", 2, "nav")],
            [(2, "2024-01-01 11:20:00", 1, "buy"),
             (105, "2024-01-01 11:20:00", 2, "nav")],
            [(106, "2024-01-01 11:40:00", 2, "nav")],
            [(107, "2024-01-01 11:50:00", 2, "nav")],
        ]
        import time as _time

        src = tmp_path / "ttl-src"
        src.mkdir()
        now = _time.time()
        for i, batch in enumerate(batches):
            p = src / f"batch-{i}.json"
            with open(p, "w") as f:
                for eid, ts, uid, ety in batch:
                    f.write(json.dumps({
                        "event_id": eid, "ts": ts, "user_id": uid,
                        "event_type": ety, "value": 1.0, "props": "{}",
                    }) + "\n")
            os.utime(p, (now + i * 10, now + i * 10))
        return str(src)

    def test_idle_ttl_evicts_state_and_loses_only_gap_transition(
            self, spark, tmp_path):
        """Opt-in idle_ttl bounds state to TTL-active keys: user 1 goes
        idle for 80 min of event time; with a 30-minute TTL their state
        (last_type='click') is evicted before the 11:20 buy arrives, so
        exactly the gap-spanning click->buy transition is lost AND the
        key is gone from the state store. The identical feed with the
        default (no TTL) keeps the key and emits the transition."""
        from gads_etl_spark.streaming.jobs import (
            inspect_stream_state,
            stateful_transitions_ooo,
        )

        src = self._idle_ttl_feed(tmp_path)

        ck_ttl = str(tmp_path / "ck-ttl")
        q = (stateful_transitions_ooo(
                read_events_stream(spark, src), delay="1 minute",
                idle_ttl="30 minutes")
             .writeStream.format("memory").queryName("t_ttl")
             .option("checkpointLocation", ck_ttl)
             .outputMode("append").trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()
        got_ttl = sorted((r.user_id, r.from_type, r.to_type)
                         for r in spark.table("t_ttl").collect())
        assert (1, "click", "buy") not in got_ttl  # gap transition lost
        # user 2's within-TTL chain is untouched by eviction
        assert (2, "nav", "nav") in got_ttl
        # and the idle key's state row is actually GONE from the store:
        # batch 3 (11:00 nav) leaves wm=10:19 < the 10:39 TTL timer, so
        # user 1's state survives it; batch 4 (11:10 nav) advances
        # wm to 10:59 ≥ the timer and the eviction fires. (The buy in
        # batch 5 then re-creates user 1's state fresh — which is why
        # the END state still has both keys and the time-travel view is
        # the only place eviction is directly observable.)
        def keys_at(b):
            return {r["key"]["user_id"] for r in
                    inspect_stream_state(spark, ck_ttl, batch_id=b).collect()}

        assert keys_at(3) == {1, 2}
        assert keys_at(4) == {2}

        # default (no TTL): same feed keeps last_type across the gap and
        # the 11:20 buy chains — the documented retention contract.
        _run_stream(stateful_transitions_ooo(
            read_events_stream(spark, src), delay="1 minute"),
            "t_nottl", "append")
        got_nottl = sorted((r.user_id, r.from_type, r.to_type)
                           for r in spark.table("t_nottl").collect())
        assert (1, "click", "buy") in got_nottl
        # TTL changes ONLY the gap-spanning rows — everything else equal
        assert [t for t in got_nottl if t != (1, "click", "buy")] == got_ttl

    @pytest.mark.skipif(
        not os.path.exists("/root/testdata/sf0.1/events.parquet"),
        reason="sf0.1 tier fixture not present on this host")
    def test_out_of_order_at_tier_100k_events_match_batch_oracle(
            self, spark, tmp_path):
        # The watermark-contract argument, demonstrated at four orders
        # of magnitude more data than the handcrafted 3-user feed: the
        # FULL sf0.1 events fixture (100k events, 1500 users, 30 days)
        # replayed with a deterministic per-event arrival jitter in
        # [0, 29 min) — ~43% of adjacent arrivals are event-time
        # inversions — through 10 micro-batches under a 30-minute
        # watermark delay. Jitter bound D < delay W guarantees no drop:
        # an event's watermark at arrival is <= ts + D - W < ts.
        import os as _os
        import time as _time

        import numpy as np

        from gads_etl_spark.streaming.jobs import stateful_transitions_ooo

        pdf = (spark.read.parquet("/root/testdata/sf0.1/events.parquet")
               .select("event_id", "ts", "user_id", "event_type", "value",
                       "props").toPandas())
        jit = (pdf["event_id"].to_numpy() * np.int64(2654435761)) % 1740
        pdf["arrival"] = pdf["ts"] + np.array(jit, dtype="timedelta64[s]")
        pdf = pdf.sort_values("arrival", kind="mergesort").reset_index(
            drop=True)

        src = tmp_path / "ooo-tier-src"
        src.mkdir()
        now = _time.time()
        for i, idx in enumerate(np.array_split(pdf.index, 10)):
            sub = pdf.loc[idx]
            p = src / f"batch-{i:02d}.json"
            with open(p, "w") as f:
                for eid, ts, uid, ety, val, props in zip(
                        sub.event_id, sub.ts, sub.user_id, sub.event_type,
                        sub.value, sub.props):
                    f.write(json.dumps({
                        "event_id": int(eid),
                        "ts": ts.strftime("%Y-%m-%d %H:%M:%S.%f"),
                        "user_id": int(uid), "event_type": ety,
                        "value": float(val), "props": props}) + "\n")
            _os.utime(p, (now + i * 10, now + i * 10))

        _run_stream(stateful_transitions_ooo(
            read_events_stream(spark, str(src)), delay="30 minutes"),
            "t_ooo_tier", "append")
        got = spark.table("t_ooo_tier").groupBy(
            "user_id", "from_type", "to_type").count().toPandas()
        got_d = {(int(r.user_id), r.from_type, r.to_type): int(r["count"])
                 for _, r in got.iterrows()}

        # Batch lag() oracle over the matured prefix. Maturity and tie
        # order both live in the kernel's units — ms-floored event time
        # vs (final watermark = ms-floored max ts − delay).
        pdf["ts_ms"] = pdf["ts"].to_numpy().astype(
            "datetime64[ms]").astype("int64")
        wm = int(pdf["ts_ms"].max()) - 30 * 60 * 1000
        mat = pdf[pdf.ts_ms < wm].sort_values(
            ["user_id", "ts_ms", "event_id"], kind="mergesort")
        prev = mat.groupby("user_id")["event_type"].shift()
        pairs = mat.assign(from_type=prev)[prev.notna()]
        want = pairs.groupby(["user_id", "from_type", "event_type"]).size()
        want_d = {(int(u), f, t): int(c) for (u, f, t), c in want.items()}
        assert sum(got_d.values()) > 90_000
        assert got_d == want_d

        # State-size bound: the terminal buffer is EXACTLY the immature
        # tail (ts >= wm) — per-user emitted == matured − 1 accounts for
        # every event, so nothing matured is retained and nothing
        # immature leaked out early. The fixture's tail window holds ≤ a
        # handful of events per user (delay window ≪ per-user cadence).
        per_user_emitted = got.groupby("user_id")["count"].sum()
        for u, n in mat.groupby("user_id").size().items():
            assert int(per_user_emitted.get(u, 0)) == max(0, int(n) - 1), u

    def test_transform_with_state_matches_legacy_processor(self, spark, tmp_path):
        # The Spark 4 transformWithState processor must produce the same
        # final per-user totals as the applyInPandasWithState kernel (and
        # therefore as batch). Its Python runner imports google.protobuf
        # (pyspark/sql/streaming/proto/StateMessage_pb2.py, generated by
        # protoc 6.33.0) before any state traffic flows.
        #
        # ENVIRONMENT LIMITATION, verified exhaustively in this container:
        # - no protobuf distribution in site-packages (pip install is
        #   unavailable by policy);
        # - gcloud's appengine-vendored google.protobuf is 6.32.0 — below
        #   the 6.33.0 gencode floor ValidateProtobufRuntimeVersion
        #   enforces — and ships without well-known-type gencode (no
        #   any_pb2), so path-injecting it fails on import;
        # - gcloud's cloudsdk.google.protobuf copy (4.23.2) is rewritten
        #   to absolute `cloudsdk.` imports and would need a sys.modules
        #   aliasing shim PLUS fails the same runtime-version floor.
        # On any cluster with `protobuf>=6.33` installed this test runs
        # as-is; until then the TWS twin's parity is UNVERIFIED here and
        # this skip is the explicit record of that fact.
        # Round-12 re-attempt: `pip download 'protobuf>=6.33'` fails at
        # DNS resolution (no network route to any index) and no wheel is
        # cached on disk — a venv-local install is not possible in this
        # container either.
        pytest.importorskip(
            "google.protobuf",
            reason=(
                "UNVERIFIED CODE PATH: transformWithStateInPandas needs "
                "protobuf>=6.33 (StateMessage_pb2 gencode floor); this "
                "container has none and the gcloud-vendored copies are "
                "too old/incomplete — see test comment for the audit"
            ),
        )
        from gads_etl_spark.streaming.jobs import stateful_user_counters_tws

        src, batch_df = _write_event_files(tmp_path, spark)
        stream = read_events_stream(spark, src)
        _run_stream(stateful_user_counters_tws(stream), "t_counters_tws", "update")

        final = {}
        for r in spark.table("t_counters_tws").collect():
            final[r.user_id] = (r.n_events, r.total_value)
        batch_totals = {
            r.user_id: (r.cnt, r.total)
            for r in batch_df.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("cnt"),
                (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100)
                .alias("total"),
            ).collect()
        }
        assert final == batch_totals
        assert final[1] == (4, 14.75)


class TestRocksDBStateStore:
    """Stateful streaming must run on the RocksDB state store provider —
    the default HDFS-backed provider keeps all state in executor memory,
    which is the first thing to OOM at production event volume. Every
    other stream==batch test in this file already executes under RocksDB
    (the provider is a session default); these tests pin that fact."""

    def test_provider_is_session_default(self, spark):
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        ).endswith("RocksDBStateStoreProvider")
        assert spark.conf.get(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled"
        ) == "true"

    def test_stateful_query_reports_rocksdb_metrics(self, spark, tmp_path):
        # The proof the provider actually engaged: a stateful query's
        # progress carries rocksdb* custom metrics (the HDFS-backed
        # provider reports loadedMapCacheHitCount instead).
        src, _ = _write_event_files(tmp_path, spark)
        stream = read_events_stream(spark, src)
        q = (tumbling_counts_stream(stream).writeStream.format("memory")
             .queryName("t_rocksdb_probe").outputMode("complete")
             .trigger(availableNow=True).start())
        q.processAllAvailable()
        progress = q.lastProgress
        q.stop()
        metrics = progress["stateOperators"][0]["customMetrics"]
        assert any(k.startswith("rocksdb") for k in metrics)


class TestDedupStream:
    def test_replayed_ids_dropped_across_batches(self, spark, tmp_path):
        from gads_etl_spark.streaming.jobs import dedup_stream

        src = tmp_path / "dup-src"
        src.mkdir()
        rows = [
            [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:06:00")],
            [(2, "2024-01-01 00:06:00"), (3, "2024-01-01 00:07:00")],  # replay id 2
            [(1, "2024-01-01 00:05:00"), (4, "2024-01-01 00:08:00")],  # replay id 1
        ]
        for i, batch in enumerate(rows):
            with open(src / f"b{i}.json", "w") as f:
                for eid, ts in batch:
                    f.write(json.dumps({
                        "event_id": eid, "ts": ts, "user_id": 1,
                        "event_type": "click", "value": 1.0, "props": "{}",
                    }) + "\n")

        stream = read_events_stream(spark, str(src))
        _run_stream(dedup_stream(stream, watermark="10 minutes"),
                    "t_dedup", "append")
        got = sorted(r.event_id for r in spark.table("t_dedup").collect())
        assert got == [1, 2, 3, 4]


class TestDocsDedupStream:
    def test_stream_matches_batch_index_hits(self, spark, tmp_path):
        # Streaming ingestion dedup == batch incremental dedup: the same
        # (new_id, match_id) set must fall out whether documents arrive
        # as micro-batches or as one batch — the guarantee that lets an
        # ingestion pipeline switch between the two paths freely.
        from gads_etl_spark.catalog import load_table
        from gads_etl_spark.operators import dedup as D
        from gads_etl_spark.streaming.jobs import DOCS_SCHEMA, dedup_docs_stream

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        corpus = docs.where(F.col("doc_id") % 3 != 0)
        # Arriving batch: the held-out third, plus 3 exact copies of
        # corpus docs (guaranteed index hits in every band).
        copies = corpus.orderBy("doc_id").limit(3).withColumn(
            "doc_id", F.col("doc_id") + 700000)
        arriving = docs.where(F.col("doc_id") % 3 == 0).unionByName(copies)
        index = D.minhash_band_keys(corpus).localCheckpoint()

        src = tmp_path / "docs-src"
        src.mkdir()
        lines = arriving.toJSON().collect()
        half = max(1, len(lines) // 2)
        (src / "b0.json").write_text("\n".join(lines[:half]) + "\n")
        (src / "b1.json").write_text("\n".join(lines[half:]) + "\n")

        stream = (spark.readStream.schema(DOCS_SCHEMA)
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        _run_stream(dedup_docs_stream(stream, index), "t_docdedup", "append")

        got = {(r.new_id, r.match_id)
               for r in spark.table("t_docdedup").collect()}
        expected = {
            (r.new_id, r.match_id)
            for r in D.incremental_minhash_candidates(arriving, index)
            .where(F.col("match_origin") == "index").collect()
        }
        assert got == expected
        # the planted copies must be among the hits
        planted = {(r.doc_id + 700000, r.doc_id)
                   for r in corpus.orderBy("doc_id").limit(3).collect()}
        assert planted <= got

    def test_checkpointed_restart_is_exactly_once(self, spark, tmp_path):
        # Docs arriving before and after a restart are each processed
        # exactly once: total emitted rows (band-collision multiplicity
        # included) must equal the one-shot batch join's row count — a
        # replayed micro-batch would inflate it deterministically.
        from gads_etl_spark.catalog import load_table
        from gads_etl_spark.operators import dedup as D
        from gads_etl_spark.streaming.jobs import DOCS_SCHEMA, dedup_docs_stream

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        corpus = docs.where(F.col("doc_id") % 3 != 0)
        copies = corpus.orderBy("doc_id").limit(4).withColumn(
            "doc_id", F.col("doc_id") + 800000)
        index = D.minhash_band_keys(corpus).localCheckpoint()

        src, out, ckpt = (tmp_path / d for d in ("src", "out", "ckpt"))
        src.mkdir()
        lines = copies.toJSON().collect()

        def run_once():
            stream = (spark.readStream.schema(DOCS_SCHEMA)
                      .option("maxFilesPerTrigger", 1).json(str(src)))
            q = (dedup_docs_stream(stream, index).writeStream
                 .format("parquet").option("path", str(out))
                 .option("checkpointLocation", str(ckpt))
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)

        (src / "b0.json").write_text("\n".join(lines[:2]) + "\n")
        run_once()
        (src / "b1.json").write_text("\n".join(lines[2:]) + "\n")
        run_once()  # restart from checkpoint; b0 must not replay

        got = spark.read.parquet(str(out))
        expected_rows = (
            D.minhash_band_keys_stateless(copies)
            .join(index.select(F.col("doc_id").alias("match_id"),
                               "band", "band_key"), ["band", "band_key"])
            .count()
        )
        assert got.count() == expected_rows
        assert {(r.new_id - 800000, r.match_id) for r in got.collect()} >= {
            (r.doc_id, r.doc_id) for r in corpus.orderBy("doc_id").limit(4).collect()
        }


class TestStreamStaticJoin:
    def test_enrichment_matches_batch_join(self, spark, tmp_path):
        from gads_etl_spark.streaming.jobs import stream_static_enrich

        src, batch_df = _write_event_files(tmp_path, spark)
        dim = spark.createDataFrame(
            [("click", "engagement"), ("view", "impression")],
            "event_type string, category string",
        )
        stream = read_events_stream(spark, src)
        _run_stream(stream_static_enrich(stream, dim), "t_enrich", "append")

        got = sorted((r.event_id, r.category)
                     for r in spark.table("t_enrich").collect())
        expected = sorted((r.event_id, r.category)
                          for r in stream_static_enrich(batch_df, dim).collect())
        assert got == expected and len(got) == 6
        assert all(c in ("engagement", "impression") for _, c in got)


class TestStreamStreamJoin:
    def test_stream_equals_batch_attribution(self, spark, tmp_path):
        import json as _json

        from gads_etl_spark.streaming.jobs import stream_stream_attribution

        rows = [
            # view then purchase inside 30min → attributed
            (10, "2024-01-01 00:05:00", 1, "view", 0.0),
            (11, "2024-01-01 00:20:00", 1, "purchase", 9.99),
            # purchase 40min after the view → outside the bound
            (12, "2024-01-01 01:00:00", 2, "view", 0.0),
            (13, "2024-01-01 01:40:00", 2, "purchase", 5.00),
            # different users, same timing → never joined
            (14, "2024-01-01 02:00:00", 3, "view", 0.0),
            (15, "2024-01-01 02:10:00", 4, "purchase", 1.00),
            # two views before one purchase → both attributions emit
            (16, "2024-01-01 03:00:00", 5, "view", 0.0),
            (17, "2024-01-01 03:10:00", 5, "view", 0.0),
            (18, "2024-01-01 03:20:00", 5, "purchase", 2.50),
        ]
        src = tmp_path / "ss-src"
        src.mkdir()
        # Two micro-batch files split mid-pair: the join must buffer the
        # 03:00 views until the purchase arrives in the next batch.
        for i, batch in enumerate([rows[:7], rows[7:]]):
            with open(src / f"b{i}.json", "w") as f:
                for e in batch:
                    f.write(_json.dumps({
                        "event_id": e[0], "ts": e[1], "user_id": e[2],
                        "event_type": e[3], "value": e[4], "props": "{}",
                    }) + "\n")

        stream = read_events_stream(spark, str(src))
        joined = stream_stream_attribution(
            stream.where(F.col("event_type") == "view"),
            stream.where(F.col("event_type") == "purchase"),
        )
        _run_stream(joined, "ss_attr", "append")
        got = sorted(
            (r.purchase_id, r.view_id)
            for r in spark.table("ss_attr").collect()
        )
        # Batch oracle: same join in plain batch mode.
        batch = spark.read.schema(EVENTS_SCHEMA).json(str(src))
        expected_df = stream_stream_attribution(
            batch.where(F.col("event_type") == "view"),
            batch.where(F.col("event_type") == "purchase"),
        )
        expected = sorted((r.purchase_id, r.view_id) for r in expected_df.collect())
        assert got == expected
        assert got == [(11, 10), (18, 16), (18, 17)]


class TestContinuousDQ:
    """Streaming DQ metrics: per-micro-batch violation counts summed
    across the stream must equal one batch run over the same data
    (row-level checks are sum-decomposable by construction)."""

    def test_stream_metrics_sum_to_batch(self, spark, tmp_path):
        from gads_etl_spark.operators import dq
        from gads_etl_spark.streaming.jobs import continuous_dq

        src, batch_df = _write_event_files(tmp_path, spark)
        checks = [
            dq.not_null("user_id"),
            dq.in_set("event_type", ("click",)),       # views violate
            dq.in_range("value", 0.0, 3.0),            # 4.0 and 8.0 violate
        ]
        stream = read_events_stream(spark, src)
        metrics_dir = str(tmp_path / "dq-metrics")
        q = continuous_dq(stream, checks, str(tmp_path / "dq-ckpt"), metrics_dir)
        q.awaitTermination(120)

        metrics = spark.read.parquet(metrics_dir)
        assert metrics.select("batch_id").distinct().count() >= 1
        summed = {
            r["check"]: r["total"]
            for r in metrics.groupBy("check")
            .agg(F.sum("n_violations").alias("total")).collect()
        }
        batch = {
            r["check"]: r["n_violations"]
            for r in dq.run_checks(batch_df, checks).collect()
        }
        assert summed == batch
        assert batch["in_set(event_type)"] == 2 and batch["in_range(value)"] == 2


class TestSketchRollupStream:
    def test_streamed_rollup_estimates_match_batch(self, spark, tmp_path):
        """Per-micro-batch sketch fragments, merged on read, must give
        the SAME estimates as one batch pass — buckets split across
        micro-batches included (max-merge is associative)."""
        from gads_etl_spark.operators.rollup import (
            merge_sketch_rollup, sketch_distinct_rollup)
        from gads_etl_spark.streaming.jobs import sketch_rollup_stream

        src, batch_df = _write_event_files(tmp_path, spark)
        stream = read_events_stream(spark, src)
        rollup_dir = str(tmp_path / "sketch-rollup")
        q = sketch_rollup_stream(stream, str(tmp_path / "sk-ckpt"), rollup_dir)
        q.awaitTermination(120)

        fragments = spark.read.parquet(rollup_dir)
        # hour 00 arrives across two micro-batches → more fragments than
        # (type, bucket) groups, or at minimum the merge must still agree
        streamed = {
            (r["event_type"], str(r["bucket"])): r["distinct_est"]
            for r in merge_sketch_rollup(
                fragments, ["event_type", "bucket"]).collect()
        }
        direct = {
            (r["event_type"], str(r["bucket"])): r["distinct_est"]
            for r in merge_sketch_rollup(
                sketch_distinct_rollup(
                    batch_df.withColumn("bucket", F.window("ts", "1 hour")["start"]),
                    "user_id", ["event_type", "bucket"]),
                ["event_type", "bucket"]).collect()
        }
        assert streamed == direct and len(streamed) >= 4


class TestLateDataDiscipline:
    def test_late_rows_dropped_and_counted(self, spark, tmp_path):
        """Watermark contract, observable: an event arriving well after
        the watermark passed its window is (a) absent from the appended
        aggregate and (b) COUNTED in numRowsDroppedByWatermark — late
        data is dropped loudly, never silently folded in or lost.
        (Empirically the late filter allows one extra watermark-delay of
        slack beyond the reported watermark before dropping, hence the
        two on-time batches between the window and the straggler.)"""
        import json as _json
        import time as _time

        from gads_etl_spark.streaming.jobs import tumbling_counts_stream

        src = tmp_path / "late-src"
        src.mkdir()

        def write(name, rows):
            with open(src / name, "w") as f:
                for i, (ts, v) in enumerate(rows):
                    f.write(_json.dumps({
                        "event_id": hash((name, i)) % 10**9, "ts": ts,
                        "user_id": 1, "event_type": "click", "value": v,
                        "props": "{}"}) + "\n")
            _time.sleep(1.1)  # distinct mtimes → deterministic file order

        write("f0.json", [("2024-01-01 01:00:00", 1.0),
                          ("2024-01-01 02:00:00", 1.0)])
        write("f1.json", [("2024-01-01 03:00:00", 1.0)])
        # watermark when f2 processes: 02:30 → the 00:00 window is far
        # behind even the slack bound → its straggler must drop
        write("f2.json", [("2024-01-01 00:10:00", 99.0),
                          ("2024-01-01 04:00:00", 1.0)])

        stream = read_events_stream(spark, str(src))
        out = tumbling_counts_stream(stream, watermark="30 minutes")
        q = (out.writeStream.format("memory").queryName("t_late")
             .outputMode("append").trigger(availableNow=True).start())
        q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0]["numRowsDroppedByWatermark"]
            for p in (_json.loads(x.json) for x in q.recentProgress)
            if p["stateOperators"]
        )
        q.stop()

        rows = spark.table("t_late").collect()
        starts = {str(r["window_start"]) for r in rows}
        assert "2024-01-01 00:00:00" not in starts  # late window absent
        assert not any(r["value_sum"] == 99.0 for r in rows)
        assert dropped == 1


class TestStateInspection:
    def _ordered_files(self, tmp_path):
        """Three files with distinct mtimes → deterministic batch order."""
        import json as _json
        import time as _time

        src = tmp_path / "st-src"
        src.mkdir()
        batches = [
            [(1, "2024-01-01 00:05:00"), (2, "2024-01-01 00:12:00"),
             (3, "2024-01-01 00:55:00")],
            [(4, "2024-01-01 01:05:00"), (5, "2024-01-01 01:20:00")],
            [(6, "2024-01-01 02:10:00")],
        ]
        for i, rows in enumerate(batches):
            with open(src / f"f{i}.json", "w") as f:
                for eid, ts in rows:
                    f.write(_json.dumps({
                        "event_id": eid, "ts": ts, "user_id": 1,
                        "event_type": "click", "value": 1.0,
                        "props": "{}"}) + "\n")
            _time.sleep(1.1)
        return str(src)

    def _run_dedup(self, spark, src, ck):
        from gads_etl_spark.streaming.jobs import dedup_stream

        q = (dedup_stream(read_events_stream(spark, src), watermark="1 hour")
             .writeStream.format("memory").queryName("t_state_q")
             .option("checkpointLocation", ck)
             .outputMode("append").trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()

    def test_dedup_state_visible_and_evicted(self, spark, tmp_path):
        """The statestore source must expose the dedup keys offline,
        eviction must have removed watermark-expired keys, and every
        surviving key's expiry must still be ahead of the final
        watermark (the invariant, stated without pinning Spark's exact
        boundary comparison)."""
        from gads_etl_spark.streaming.jobs import (
            inspect_stream_state, state_partition_profile)

        src = self._ordered_files(tmp_path)
        ck = str(tmp_path / "st-ck")
        self._run_dedup(spark, src, ck)

        state = inspect_stream_state(spark, ck)
        rows = state.collect()
        keys = {r["key"]["event_id"] for r in rows}
        assert keys < {1, 2, 3, 4, 5, 6} and keys  # some evicted, some live
        assert 1 not in keys  # earliest key is long past the watermark
        # final watermark = 02:10 − 1h = 01:10 → every survivor's expiry
        # must be at or after it
        wm_micros = 1704071400000000  # 2024-01-01T01:10:00Z in micros
        assert all(r["value"]["expiresAtMicros"] >= wm_micros for r in rows)
        profile = state_partition_profile(state)
        assert profile.agg(F.sum("n_state_rows")).collect()[0][0] == len(keys)

    def test_time_travel_to_earlier_batch(self, spark, tmp_path):
        """batchId time travel: state after batch 0 is exactly the first
        file's keys (no watermark has evicted anything yet)."""
        from gads_etl_spark.streaming.jobs import inspect_stream_state

        src = self._ordered_files(tmp_path)
        ck = str(tmp_path / "tt-ck")
        self._run_dedup(spark, src, ck)
        early = {r["key"]["event_id"]
                 for r in inspect_stream_state(spark, ck, batch_id=0).collect()}
        assert early == {1, 2, 3}


class TestSketchRollupReplay:
    def test_replayed_fragment_write_is_idempotent(self, spark, tmp_path):
        """Crash-replay of a committed micro-batch reruns foreachBatch
        with the same batch_id and payload; the per-batch overwrite must
        leave the rollup byte-for-byte equivalent. Sketch estimates were
        always replay-safe (max-merge); the additive n_events counter is
        only safe because the fragment replaces itself instead of
        appending a double-counting copy."""
        from gads_etl_spark.operators.rollup import merge_sketch_rollup
        from gads_etl_spark.streaming.jobs import write_rollup_fragment

        _, batch_df = _write_event_files(tmp_path, spark)
        rollup_dir = str(tmp_path / "replay-rollup")
        b0 = batch_df.where(F.col("event_id").isin(1, 2, 3))
        b1 = batch_df.where(F.col("event_id").isin(4, 5, 6))
        write_rollup_fragment(b0, 0, rollup_dir)
        write_rollup_fragment(b1, 1, rollup_dir)

        def snapshot():
            frags = spark.read.parquet(rollup_dir)
            return sorted(
                (r["event_type"], str(r["bucket"]), r["distinct_est"], r["n_events"])
                for r in merge_sketch_rollup(
                    frags, ["event_type", "bucket"]).collect())

        before = snapshot()
        assert sum(n for *_, n in before) == 6
        write_rollup_fragment(b0, 0, rollup_dir)  # the replay
        assert snapshot() == before  # no double count, no register drift


class TestVocabStream:
    def test_streamed_vocab_extends_with_stable_ids(self, spark, tmp_path):
        """Stream batches into the versioned vocab table: ids assigned in
        an earlier batch never change, the final token set equals a
        batch rebuild's, and time travel shows the growth history."""
        import json as _json
        import time as _time

        from gads_etl_spark.pipeline.state_store import _VersionedTable
        from gads_etl_spark.streaming.jobs import vocab_stream

        src = tmp_path / "vb-src"
        src.mkdir()
        batches = [
            [(1, "alpha beta alpha"), (2, "beta gamma")],
            [(3, "alpha delta")],          # delta is new
            [(4, "epsilon epsilon beta")], # epsilon is new
        ]
        for i, rows in enumerate(batches):
            with open(src / f"f{i}.json", "w") as f:
                for did, text in rows:
                    f.write(_json.dumps({"doc_id": did, "text": text}) + "\n")
            _time.sleep(1.1)

        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", 1).json(str(src)))
        root = str(tmp_path / "vocab-table")
        q = vocab_stream(stream, str(tmp_path / "vb-ck"), root)
        q.awaitTermination(180)

        from pyspark.sql import types as T
        schema = T.StructType([
            T.StructField("token", T.StringType(), False),
            T.StructField("token_id", T.LongType(), False),
            T.StructField("n_docs", T.LongType(), True),
            T.StructField("n_occurrences", T.LongType(), True),
        ])
        table = _VersionedTable(spark, root, schema)
        final = {r["token"]: r["token_id"] for r in table.read().collect()}
        assert set(final) == {"alpha", "beta", "gamma", "delta", "epsilon"}
        assert sorted(final.values()) == list(range(5))  # dense, no gaps
        # id stability: versions only ever ADD mappings, never change them
        history = table.history()
        assert len(history) == 3
        prev: dict = {}
        for v in history:
            snap = {r["token"]: r["token_id"]
                    for r in table.read_version(v).collect()}
            assert all(snap[t] == i for t, i in prev.items())
            assert len(snap) >= len(prev)
            prev = snap
