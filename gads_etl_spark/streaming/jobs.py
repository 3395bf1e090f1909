"""Streaming jobs over the events schema.

Each job takes a (possibly streaming) DataFrame and returns the
transformed (streaming) DataFrame — callers attach sources and sinks, so
the identical logic is testable in batch and runs under readStream.

EXPERIMENTAL: ``stateful_user_counters_tws`` (the
``transformWithStateInPandas`` twin) has never executed in this
environment — its Python runner needs ``protobuf>=6.33``, which this
container cannot provide (the skip message at
tests/test_streaming.py documents the full audit). Every other job here
is exercised end-to-end; treat the tws twin as shipped-but-unverified
until its parity test has run on a protobuf-equipped cluster. The
``applyInPandasWithState`` twin (``stateful_user_counters``) is the
tested surface and emits the same totals by construction (shared
``_accumulate_counters``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of event JSON files (one micro-batch per file by
    default — deterministic batch boundaries for tests)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def tumbling_counts_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour counts per event_type with a late-data watermark.

    The watermark bounds state: a window closes (and its state is freed)
    once the event-time high-water mark passes window.end + watermark —
    mandatory for unbounded streams.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100).cast("long")).cast("double") / 100)
            .alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "value_sum")
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Session windows per user under a watermark — Spark merges/extends
    session state across micro-batches until the watermark seals it."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def continuous_validation(raw, states, checkpoint_dir: str):
    """Continuous control plane: stream the manifest, validate each newly
    sealed partition as it lands.

    The manifest directory is an append-only parquet file stream — every
    seal batch becomes a micro-batch of validation *requests*, executed
    through the same ``validate_batch`` as the batch path (one count scan
    + one ledger MERGE per micro-batch). ``foreachBatch`` is the right
    shape because state commits are single-writer.

    Returns the (unstarted query's) StreamingQuery handle; callers stop it.
    """
    from gads_etl_spark.pipeline.raw_sink import MANIFEST_SCHEMA
    from gads_etl_spark.pipeline.validator import validate_batch

    manifest_stream = (
        raw.spark.readStream.schema(MANIFEST_SCHEMA)
        .parquet(raw._manifest_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        requests = batch_df.select(
            "source", "customer_id", "query_name", "logical_date",
            "run_id", "schema_version",
        )
        if requests.limit(1).count():
            validate_batch(raw, states, requests)

    return (
        manifest_stream.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def continuous_publish(raw, states, pointers, curated, checkpoint_dir: str,
                       dq_checks: list | None = None):
    """Streaming warehouse publish: validate → stage → pointer swap per
    micro-batch of newly sealed raw partitions — the full batch pipeline
    (``runner.run_daily`` steps 3-4) driven by the manifest stream
    instead of a scheduler tick.

    Replay safety (a crashed/re-delivered micro-batch converges, never
    corrupts): every step is idempotent on (logical key, run_id) —
    validation re-derives the same outcome from the same sealed bytes
    and MERGEs it; staging skips already-sealed curated partitions
    (``materialize_plan``); the pointer swap upserts the same run_id.
    A crash BETWEEN stage and swap leaves a staged-but-unpublished
    partition that consumers cannot see (they resolve through pointers
    only), and the restarted batch republishes it — consumers observe
    the old run_id until the swap, the new one after, never a mix
    (docs/warehouse_semantics.md:39-43 parity, now also under streaming
    delivery).

    Returns the started StreamingQuery handle; callers stop it.
    """
    from gads_etl_spark.pipeline.curated_sink import materialize_plan
    from gads_etl_spark.pipeline.loader import WarehouseLoader
    from gads_etl_spark.pipeline.raw_sink import MANIFEST_SCHEMA
    from gads_etl_spark.pipeline.validator import validate_batch

    manifest_stream = (
        raw.spark.readStream.schema(MANIFEST_SCHEMA)
        .parquet(raw._manifest_dir)
    )

    def process(batch_df, batch_id: int) -> None:
        requests = batch_df.select(
            "source", "customer_id", "query_name", "logical_date",
            "run_id", "schema_version",
        )
        if not requests.limit(1).count():
            return
        validate_batch(raw, states, requests)
        loader = WarehouseLoader(states, pointers)
        # ONE reconcile snapshot drives both staging and the swap, so the
        # pointers published are exactly the partitions just staged.
        plan = loader.reconcile()
        materialize_plan(raw, curated, plan, checks=dq_checks)
        loader.run(plan)

    return (
        manifest_stream.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_COUNTER_STATE = "n LONG, total_cents LONG"
_COUNTER_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("total_value", T.DoubleType()),
])


def _accumulate_counters(
    n: int, cents: int, pdfs: Iterator[pd.DataFrame]
) -> tuple[int, int]:
    """Shared accumulation policy for BOTH stateful processors: exact
    integer-cent totals so stream and batch agree bit-for-bit. Keeping it
    in one place is what makes the legacy/TWS parity contract enforceable."""
    for pdf in pdfs:
        n += len(pdf)
        cents += int(round(float(pdf["value"].sum()) * 100))
    return n, cents


def _emit_counters(key, n: int, cents: int) -> pd.DataFrame:
    return pd.DataFrame({
        "user_id": [key[0]], "n_events": [n], "total_value": [cents / 100],
    })


def _update_counters(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: running per-user event count + exact cent total.

    State is one (n, total_cents) pair per user, updated per micro-batch —
    the custom-stateful-operator shape (applyInPandasWithState) for logic
    windowed aggregation can't express.
    """
    n, cents = state.get if state.exists else (0, 0)
    n, cents = _accumulate_counters(n, cents, pdfs)
    state.update((n, cents))
    yield _emit_counters(key, n, cents)


def stateful_user_counters(events: DataFrame) -> DataFrame:
    """Per-user running counters via ``applyInPandasWithState``
    (update output mode; no timeout — counters live for the run)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_counters,
            outputStructType=_COUNTER_OUT,
            stateStructType=_COUNTER_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TRANSITION_STATE = "last_type STRING"
_TRANSITION_OUT = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("from_type", T.StringType()),
    T.StructField("to_type", T.StringType()),
])


def _update_transitions(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful kernel: per-user event-type transition chaining.

    State is ONE value per user — the type of the last event seen — and
    each micro-batch emits a (from_type, to_type) row per consecutive
    pair, chaining ACROSS batch boundaries through the state. This is
    the last-value-carry shape (the streaming twin of a batch lag()
    window) that windowed aggregation cannot express.

    Ordering contract: rows within a batch are sorted by (ts, event_id)
    here; across batches the chain is correct when ingestion is
    event-time ordered per user (the log-shipping case the file source
    models). For feeds that interleave out of order ACROSS batches, use
    ``stateful_transitions_ooo`` — the watermark-buffered variant; the
    batch ev_transition_matrix is the oracle either way.
    """
    last = state.get[0] if state.exists else None
    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        yield pd.DataFrame({"user_id": [], "from_type": [], "to_type": []})
        return
    rows = pd.concat(frames).sort_values(["ts", "event_id"])
    out_from: list[str] = []
    out_to: list[str] = []
    for et in rows["event_type"]:
        if last is not None:
            out_from.append(last)
            out_to.append(et)
        last = et
    state.update((last,))
    yield pd.DataFrame({
        "user_id": [key[0]] * len(out_from),
        "from_type": out_from,
        "to_type": out_to,
    })


def stateful_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transitions via ``applyInPandasWithState``
    (append output mode — each transition is emitted exactly once; the
    one-row state lives for the run). Feed the result to a grouped count
    for the streaming transition matrix; the batch
    ``ev_transition_matrix`` query is the equivalence oracle."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=_TRANSITION_OUT,
            stateStructType=_TRANSITION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_TRANSITION_OOO_STATE = T.StructType([
    T.StructField("last_type", T.StringType()),
    T.StructField("buf_ts_ms", T.ArrayType(T.LongType())),
    T.StructField("buf_eid", T.ArrayType(T.LongType())),
    T.StructField("buf_type", T.ArrayType(T.StringType())),
])


def _parse_duration_ms(s: str) -> int:
    """'90 seconds' / '30 minutes' / '2 hours' / '1 day' → milliseconds
    (the same phrase grammar ``withWatermark`` accepts for its delay)."""
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s*(millisecond|second|minute|hour|day)s?\s*", s)
    if not m:
        raise ValueError(f"cannot parse duration {s!r}")
    unit_ms = {"millisecond": 1, "second": 1000, "minute": 60_000,
               "hour": 3_600_000, "day": 86_400_000}[m.group(2)]
    return int(m.group(1)) * unit_ms


def _make_transitions_ooo_kernel(ttl_ms: int | None):
    """Build the OOO transition kernel, optionally with idle-TTL state
    eviction (``ttl_ms``). A factory rather than a kernel parameter
    because ``applyInPandasWithState`` takes a bare (key, pdfs, state)
    callable — the TTL rides in the closure."""

    def _update_transitions_ooo(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        return _transitions_ooo_impl(key, pdfs, state, ttl_ms)

    return _update_transitions_ooo


def _transitions_ooo_impl(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Out-of-order-tolerant transition kernel: buffer above the
    watermark, chain below it.

    Arriving events land in a per-user state buffer; each invocation
    drains the prefix with ``ts < watermark`` in (ts, event_id) order
    and chains transitions through ``last_type`` exactly like the
    in-order kernel. Correctness leans on Spark's watermark contract:
    a row with event time below the watermark is dropped before it
    reaches the operator, so once the watermark passes an event's
    timestamp no EARLIER event can still arrive — the drained prefix is
    final. Events within the allowed delay may arrive in any order
    across micro-batches and still chain in event-time order; state per
    user is one string plus the bounded still-immature buffer (≤ the
    delay window's events, the same bound every watermarked stateful op
    carries).

    With ``ttl_ms`` set (opt-in via ``stateful_transitions_ooo``'s
    ``idle_ttl``): whenever a key's buffer drains empty, an event-time
    timer is armed at watermark + ttl; if it fires with no new input
    and nothing buffered, the key's state — including ``last_type`` —
    is removed. The next event for that user then starts a fresh chain,
    so exactly the gap-spanning transition (pre-idle last → next event)
    is lost; every within-TTL transition is unaffected. This is the
    explicit opt-in form of the retention trade the no-TTL contract
    documents below.
    """
    wm = state.getCurrentWatermarkMs()
    if state.exists:
        last, ts_b, eid_b, ety_b = state.get
        ts_b, eid_b, ety_b = list(ts_b), list(eid_b), list(ety_b)
    else:
        last, ts_b, eid_b, ety_b = None, [], [], []
    frames = [pdf for pdf in pdfs if len(pdf)]
    if (ttl_ms is not None and state.hasTimedOut and not frames
            and not ts_b):
        # Idle eviction: the only timer armed on an EMPTY buffer is the
        # TTL timer (the drain timer is armed only when events are
        # buffered), so this firing means the key saw no input for a
        # full TTL of event time.
        state.remove()
        yield pd.DataFrame({"user_id": [], "from_type": [], "to_type": []})
        return
    if frames:
        rows = pd.concat(frames)
        # → epoch millis, the watermark's unit. Explicit datetime64[ms]
        # cast: the Arrow bridge may hand back [us] or [ns] resolution
        # depending on the pandas version, so int64-then-divide is wrong.
        ts_b += [int(v) for v in
                 rows["ts"].to_numpy().astype("datetime64[ms]").astype("int64")]
        eid_b += [int(v) for v in rows["event_id"]]
        ety_b += [str(v) for v in rows["event_type"]]
    out_from: list[str] = []
    out_to: list[str] = []
    keep: list[int] = []
    for i in sorted(range(len(ts_b)), key=lambda j: (ts_b[j], eid_b[j])):
        if ts_b[i] < wm:
            if last is not None:
                out_from.append(last)
                out_to.append(ety_b[i])
            last = ety_b[i]
        else:
            keep.append(i)
    state.update((last,
                  [ts_b[i] for i in keep],
                  [eid_b[i] for i in keep],
                  [ety_b[i] for i in keep]))
    if keep:
        # Re-arm an event-time timeout at the earliest immature event:
        # a group is only re-invoked on new input OR a fired timeout, so
        # without this the final watermark advance (the no-data batch)
        # would never drain the buffer. Must be strictly above the
        # current watermark.
        state.setTimeoutTimestamp(max(min(ts_b[i] for i in keep), wm + 1))
    elif ttl_ms is not None:
        # Buffer just drained empty: arm the idle-eviction timer. Any
        # new input before it fires re-enters here and pushes it out.
        state.setTimeoutTimestamp(wm + ttl_ms)
    yield pd.DataFrame({
        "user_id": [key[0]] * len(out_from),
        "from_type": out_from,
        "to_type": out_to,
    })


def stateful_transitions_ooo(events: DataFrame,
                             delay: str = "30 minutes",
                             idle_ttl: str | None = None) -> DataFrame:
    """Per-user transitions tolerant of cross-batch out-of-order arrival
    within ``delay``: ``withWatermark`` bounds the reorder window (and
    drops later-than-that stragglers at the source), the kernel buffers
    immature events in state and emits each transition exactly once when
    its destination event's timestamp falls below the advancing
    watermark. Matches the batch lag() oracle (``ev_transition_matrix``)
    over the matured prefix wherever the in-order kernel would chain in
    arrival order and diverge.

    **State retention:** with the default ``idle_ttl=None``, per-key
    state is never removed. The buffer
    arrays drain to empty once the watermark passes (bounded by the
    delay window at all times), but ``last_type`` + three empty arrays
    persist per user forever — chaining across arbitrarily long gaps
    REQUIRES remembering the last event, so this is inherent to the
    semantics, not a leak: total state is O(distinct users ever seen),
    the same bound as the in-order kernel and as any keyed
    running-aggregate. Deployments with high-cardinality transient keys
    (e.g. anonymous session ids) should key by a durable id — or opt in
    to the explicit trade with ``idle_ttl`` (e.g. ``"7 days"`` of EVENT
    time): a key idle longer than the TTL is evicted via the same
    event-time-timer plumbing the drain path uses, bounding state to
    the keys active within a TTL window. An evicted user's next event
    starts a fresh chain, so exactly the gap-spanning transitions are
    lost — the eviction is opt-in precisely because a dropped
    ``last_type`` changes answers."""
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_transitions_ooo_kernel(
                _parse_duration_ms(idle_ttl) if idle_ttl else None),
            outputStructType=_TRANSITION_OUT,
            stateStructType=_TRANSITION_OOO_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


class _RunningCounters(StatefulProcessor):
    """transformWithState processor: same running (n, total_cents) per
    user as ``_update_counters``, on the Spark 4 stateful API — typed
    state handles (value/list/map), optional TTL, and timers the legacy
    ``applyInPandasWithState`` lacks. State here is one ValueState tuple;
    arithmetic stays in integer cents so stream and batch agree exactly.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counters = handle.getValueState("counters", _COUNTER_STATE)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, cents = self._counters.get() if self._counters.exists() else (0, 0)
        n, cents = _accumulate_counters(n, cents, rows)
        self._counters.update((n, cents))
        yield _emit_counters(key, n, cents)

    def close(self) -> None:
        pass


def stateful_user_counters_tws(events: DataFrame) -> DataFrame:
    """EXPERIMENTAL — per-user running counters via
    ``transformWithStateInPandas``, the modern twin of
    ``stateful_user_counters``; both must emit the same final totals
    (parity test in tests/test_streaming.py). The test SKIPS in this
    container (protobuf>=6.33 unavailable — see the module docstring),
    so this function has never executed here: prefer
    ``stateful_user_counters`` until the parity test has run on your
    cluster."""
    return events.groupBy("user_id").transformWithStateInPandas(
        _RunningCounters(),
        outputStructType=_COUNTER_OUT,
        outputMode="Update",
        timeMode="None",
    )


DOCS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def dedup_docs_stream(docs: DataFrame, index: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      num_hashes: int = 32, bands: int = 8) -> DataFrame:
    """Ingestion-time near-duplicate detection on a document STREAM.

    Each arriving document's MinHash band keys are computed map-side
    (``minhash_band_keys_stateless`` — no aggregation, so the query stays
    in append mode with ZERO stream state) and equi-joined against the
    static corpus band index (stream-static join: the index is re-read
    per micro-batch if its files changed, broadcast when small). Emits
    ``(new_id, match_id)`` append rows — the streaming twin of
    ``incremental_minhash_candidates``'s index path, same band keys
    bit-for-bit.

    Multiplicity caveat: a pair colliding in k bands emits k rows;
    exact-once pair emission would need stateful dedup
    (``dropDuplicatesWithinWatermark`` when the stream carries event
    time). Consumers treating the output as a set — the normal use — are
    unaffected.
    """
    from gads_etl_spark.operators.dedup import minhash_band_keys_stateless

    keys = minhash_band_keys_stateless(
        docs, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, bands=bands,
    )
    return keys.join(
        index.select(F.col(id_col).alias("match_id"), "band", "band_key"),
        ["band", "band_key"],
    ).select(F.col(id_col).alias("new_id"), "match_id")


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event feed from an at-least-once source: drop replayed
    event_ids, with state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` keeps one state row per key only
    until the event-time watermark passes it — the unbounded-state trap
    of plain ``dropDuplicates(key)`` on an infinite stream is the reason
    this operator exists. Replays later than the watermark are the
    upstream contract's problem (same late-data bound as every other
    stateful op here).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame,
                         on: str = "event_type") -> DataFrame:
    """Enrich a stream against a static dimension snapshot.

    Stream-static joins re-plan the static side per micro-batch (it is
    re-read if the underlying files changed) and broadcast it when small —
    no stream-side state at all, unlike stream-stream joins. The standard
    shape for decorating events with slowly-changing reference data.
    """
    return events.join(F.broadcast(dim), on, "left")


def stream_stream_attribution(
    views: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream join: attribute each purchase to the
    same user's preceding view within ``window``.

    Both sides carry watermarks and the join predicate bounds purchase
    time to [view.ts, view.ts + window], so Spark can size state: a
    buffered view is dropped once the purchase-side watermark passes
    view.ts + window — without the time bound the state grows forever
    (the stream-stream trap). Inner join: emitted as soon as both sides
    arrive; late rows beyond the watermark are dropped on ingestion.
    """
    v = (
        views.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("amount"),
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {window}")),
    ).select("p_user", "purchase_id", "purchase_ts", "view_id", "view_ts", "amount")


def continuous_dq(stream_df: DataFrame, checks: list, checkpoint_dir: str,
                  metrics_dir: str):
    """Continuous data-quality monitoring: run a dq.py constraint suite
    on every micro-batch and append (batch_id, check, n_violations) to a
    parquet metrics sink — the streaming twin of the batch gate, with
    RECORD-not-refuse semantics (a stream cannot un-ingest a bad batch;
    it alarms on the metric instead, and the batch gate at the curated
    sink still refuses publication).

    Cost per micro-batch is the same as batch: all row-level checks fuse
    into one aggregate over the batch; unique/referential checks add
    their single-shuffle jobs scoped to the batch. ``foreachBatch``
    keeps the metric write transactional with the batch id, so a
    restarted query re-emits, never skips, a batch's metrics.

    Returns the (started) StreamingQuery handle; callers stop it.
    """
    from gads_etl_spark.operators import dq

    def process(batch_df, batch_id: int) -> None:
        (
            dq.run_checks(batch_df, checks)
            .coalesce(1)  # one row per check — metrics are tiny
            # batch_id-keyed overwrite: a crash-replayed batch replaces
            # its own metric rows instead of appending duplicates that
            # would double-count any sum over the metrics table
            .write.mode("overwrite").parquet(f"{metrics_dir}/batch_id={batch_id}")
        )

    return (
        stream_df.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def write_rollup_fragment(batch_df: DataFrame, batch_id: int,
                          rollup_dir: str, bucket: str = "1 hour") -> None:
    """One micro-batch's sketch fragments, written into a per-batch
    subdirectory with OVERWRITE — the replay-safety half of the design.
    Sketch union is idempotent under duplicate fragments, but the
    additive ``n_events`` counter is NOT, so a replayed foreachBatch
    (crash between write and checkpoint commit) must replace its own
    fragment rather than append a double-counting copy. batch_id keys
    the directory; reruns of the same batch converge."""
    from gads_etl_spark.operators.rollup import sketch_distinct_rollup

    frag = sketch_distinct_rollup(
        batch_df.withColumn("bucket", F.window("ts", bucket)["start"]),
        "user_id", ["event_type", "bucket"],
    )
    frag.write.mode("overwrite").parquet(f"{rollup_dir}/batch_id={batch_id}")


def sketch_rollup_stream(events: DataFrame, checkpoint_dir: str,
                         rollup_dir: str, bucket: str = "1 hour"):
    """Continuously maintain the mergeable distinct-user rollup: each
    micro-batch writes its per-(event_type, bucket) HLL sketches into
    its own ``batch_id=`` fragment directory; readers union sketches at
    query time (rollup.merge_sketch_rollup), so a bucket split across
    micro-batches still estimates register-identically to a batch
    rebuild, and a REPLAYED batch overwrites its own fragment instead of
    double-counting (see ``write_rollup_fragment``).

    Returns the (started) StreamingQuery handle.
    """

    def process(batch_df, batch_id: int) -> None:
        write_rollup_fragment(batch_df, batch_id, rollup_dir, bucket)

    return (
        events.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def inspect_stream_state(spark: SparkSession, checkpoint_dir: str,
                         batch_id: int | None = None) -> DataFrame:
    """Offline view of a streaming query's keyed state (Spark 4
    ``statestore`` data source over the checkpoint) — the observability
    answer to "why is my state store growing": inspect surviving keys,
    expiry timestamps, and per-partition state row counts WITHOUT
    touching the running query. Pass ``batch_id`` to time-travel to an
    earlier committed micro-batch's state.

    At 100 TB event scale this is how you audit watermark eviction
    (dedup keys must disappear once expired) and find skewed state
    partitions (group by partition_id) before they OOM an executor.
    """
    reader = spark.read.format("statestore")
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    return reader.load(checkpoint_dir)


def state_partition_profile(state: DataFrame) -> DataFrame:
    """State rows per store partition — the skew probe for streaming
    state (one hot grouping key family ⇒ one fat partition)."""
    return state.groupBy("partition_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_state_rows"))


def vocab_stream(docs: DataFrame, checkpoint_dir: str, table_root: str,
                 min_count: int = 1):
    """Maintain a token vocabulary from a document stream: each
    micro-batch extends the versioned vocab table (`_VersionedTable` —
    atomic CURRENT swap, time travel per batch) with the batch's
    genuinely new tokens via ``vocab.extend_vocab``.

    Semantics are EXTENSION, not global re-ranking: ids are stable
    forever (the property an embedding table needs), so a streamed
    vocabulary reaches the same token SET as a batch rebuild while its
    id order reflects arrival, not global frequency — re-rank offline
    with ``build_vocab`` when global frequency order matters. Counters
    (n_docs/n_occurrences) are first-seen-batch counts, not running
    totals; single-writer discipline applies like every control table.

    Returns the (started) StreamingQuery handle.
    """
    from pyspark.sql import types as T

    from gads_etl_spark.operators.vocab import extend_vocab
    from gads_etl_spark.pipeline.state_store import _VersionedTable

    schema = T.StructType([
        T.StructField("token", T.StringType(), False),
        T.StructField("token_id", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), True),
        T.StructField("n_occurrences", T.LongType(), True),
    ])

    def process(batch_df, batch_id: int) -> None:
        table = _VersionedTable(batch_df.sparkSession, table_root, schema)
        current = table.read()
        extended = extend_vocab(current, batch_df, min_count=min_count)
        # localCheckpoint: the commit re-executes its input when writing;
        # extend_vocab's dense-rank stage must not resample boundaries.
        table.commit(extended.localCheckpoint(eager=True))

    return (
        docs.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
