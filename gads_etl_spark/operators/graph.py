"""Distributed connected components for duplicate-cluster resolution.

Candidate-pair generators (MinHash-LSH bands, blocked Jaccard —
operators/dedup.py) emit *edges*; collapsing edges into duplicate
clusters so one canonical document survives per cluster is a connected
components problem. Not in the reference (its dedup unit is the
single-partition authority rule); required for an LLM-corpus pipeline
where near-dup groups are chains (A~B, B~C, but A!~C).

Scale design:
- Min-label propagation: every node repeatedly adopts the smallest
  component id among itself and its neighbors. Each round is one
  shuffle-join + one groupBy-min — all JVM-side, no driver data.
- Rounds needed = graph diameter. Near-dup clusters are small and dense
  (diameter a handful), so this converges in a few rounds; ``max_iter``
  guards pathological chains.
- ``localCheckpoint`` truncates the lineage each round so the plan
  doesn't grow exponentially across iterations (the classic iterative-
  algorithm failure mode on Spark).
- Convergence is detected by a fingerprint of the labeling
  (``sum(xxhash64(node, component))``) collected as an ``Observation``
  on the SAME job that checkpoints the round's labels — zero extra
  actions per round. xxhash64 is type-agnostic, so string node ids
  fingerprint correctly (a numeric cast would NULL them out and fake
  instant convergence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def _driver_components(e0: DataFrame) -> DataFrame | None:
    """Exact min-label components computed driver-side by union-find —
    the small-graph fast path of :func:`connected_components`.

    Returns the identical (node, component) relation the distributed
    min-label loop converges to: component = minimum node id reachable,
    one row per node appearing in any edge. Union-find with path
    compression tracks the set minimum directly, so the fixpoint is
    computed in O(E α(E)) driver time instead of diameter-many
    shuffle-join rounds — on a post-blocking dup graph (hundreds of
    edges) the distributed loop's ~6 job round-trips and per-round
    checkpoints were ~2s of pure scheduling against milliseconds of
    actual work (measured sf0.1; the same pattern as pagerank's
    small-input gate and the driver-side IVF Lloyd fit). Returns None
    when any edge endpoint is NULL — the distributed loop has
    well-defined (if degenerate) null semantics and stays the arbiter
    of out-of-contract input.
    """
    rows = e0.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row[0], row[1]
        if a is None or b is None:
            return None
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # Union by MIN label: the smaller id becomes the root, so
            # every root IS its set's component id — Python's ``<`` on
            # int and str matches Spark's ordering (UTF-8 binary
            # comparison is code-point order, which preserves ``min``).
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    spark = e0.sparkSession
    out = sorted((n, find(n)) for n in parent)
    node_t = e0.schema.fields[0].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType([StructField("node", node_t, True),
                         StructField("component", node_t, True)])
    return spark.createDataFrame(out, schema)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint: bool = True,
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """Resolve undirected edges to components; returns (node, component)
    where ``component`` is the minimum node id reachable from ``node``.

    Only nodes that appear in at least one edge are returned (singletons
    never entered the candidate-pair set to begin with).

    Graphs at or below ``driver_max_edges`` edges (measured by the count
    the partition sizing below pays anyway, on the already-checkpointed
    edge list — no extra pass) are resolved by driver-side union-find
    (:func:`_driver_components`): bit-identical result, none of the
    per-round scheduling cost that dominates small graphs. A 200k-edge
    collect is ~10 MB — far under any driver budget — while graphs past
    the gate (the 100x-tier dup graph ran 240M edges) keep the
    shuffle-join loop below, whose per-round cost is what actually
    scales. ``driver_max_edges=0`` forces the distributed loop.
    """
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if checkpoint:
        # Materialize the upstream plan (often an expensive candidate-pair
        # computation) exactly once, BEFORE symmetrizing — the union below
        # references its input twice, and checkpointing after the union
        # would execute the pair generation twice.
        e0 = e0.localCheckpoint()
    n_edges = e0.count()
    if checkpoint and n_edges <= driver_max_edges:
        out = _driver_components(e0)
        if out is not None:
            return out
    e = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # Partition proportionally to the graph, not the session default: a
    # post-blocking dup graph is usually tiny and per-round scheduling
    # overhead dominates if every round shuffles into 32+ partitions.
    n_parts = max(1, min(e.sparkSession.sparkContext.defaultParallelism,
                         n_edges // 50_000 + 1))
    e = e.repartition(n_parts, "b")
    if checkpoint:
        e = e.localCheckpoint()
    # Fused first round (round-17, guide §2.4): the identity labeling
    # (node -> node) followed by round 1's join+union+groupBy computes
    # min(self, neighbors) — but against identity labels that join is
    # the edge list itself, so the same relation is ONE groupBy over the
    # symmetrized edges: min over least(a, b) per a = min(a, min of its
    # neighbors). One exchange replaces the init distinct + the first
    # round's join + union + aggregate (and the loop's fixpoint check
    # now fires one round earlier). NULL semantics match the old round
    # 1 exactly: least() skips a NULL endpoint the join would not have
    # matched, and a NULL node group aggregates its neighbors' labels
    # the same way min() did.
    labels = (
        e.groupBy(F.col("a").alias("node"))
        .agg(F.min(F.least("a", "b")).alias("component"))
    )

    # Fingerprint of the labeling: sum of a per-row hash of (node,
    # component). Any label change flips at least one row's hash, so
    # round-over-round equality ⇔ fixpoint (modulo a ~2⁻⁶⁴ collision).
    # Type-agnostic — works for string node ids where a numeric sum
    # would cast to NULL and stop the loop after one round. The decimal
    # cast applies to the HASH (always long), never the id, and makes
    # the sum overflow-proof under ANSI mode.
    _fp = F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("fp")

    prev_fp = ()  # sentinel unequal to any fingerprint (incl. None)
    if checkpoint:
        # Checkpoint the fused round-1 labels (the loop checkpointed
        # every round's product before the fusion, so this is the same
        # per-round lifecycle) and seed the fixpoint check with its
        # fingerprint: a diameter-1 graph now converges after ONE loop
        # round instead of two.
        obs0 = Observation()
        labels = labels.observe(obs0, _fp).localCheckpoint()
        prev_fp = obs0.get["fp"]
    for i in range(max_iter):
        neighbor = (
            # shuffle_hash pin: same rationale as pagerank below — both
            # sides are localCheckpoint-ed relations whose size ESTIMATE
            # is inherited from the plan they replaced, so the static
            # planner must never be allowed to pick the edge list as a
            # broadcast build side. Build on the |V|-row label side,
            # per-partition — scale-safe at any |V|.
            e.join(labels.hint("shuffle_hash"), e.b == labels.node)
            .select(F.col("a").alias("node"), "component")
        )
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        if i >= 1:
            # Pointer jumping (path halving): follow each node's label
            # to ITS label and adopt the smaller — chains collapse
            # exponentially, so convergence is O(log diameter) rounds
            # instead of O(diameter). Safe because a label is always a
            # reachable node id, so the jump target's label is reachable
            # too and monotonicity (labels only decrease) holds. Engaged
            # only from overall round 3 (the fused init above IS round
            # 1, so loop index 1 = round 3): shallow graphs (real
            # near-dup clusters, diameter ≲ 4) converge before paying
            # the extra self-join; anything still moving by round 3 is
            # chain-shaped and needs the exponential collapse.
            parent = labels.select(F.col("node").alias("p_node"),
                                   F.col("component").alias("p_comp"))
            labels = (
                labels.join(parent.hint("shuffle_hash"),
                            labels.component == parent.p_node, "left")
                .select("node",
                        F.least("component", F.coalesce("p_comp", "component"))
                        .alias("component"))
            )
        if checkpoint:
            # Piggyback the fingerprint on the checkpoint job: observe()
            # adds a CollectMetrics node that the (eager) localCheckpoint
            # action evaluates, so convergence detection costs no extra
            # job — one action per round total.
            obs = Observation()
            labels = labels.observe(obs, _fp).localCheckpoint()
            fp = obs.get["fp"]
        else:
            fp = labels.agg(_fp).collect()[0][0]
        if fp == prev_fp:
            break
        prev_fp = fp
    return labels


def cluster_survivors(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per duplicate cluster (the minimum id — i.e. the
    component representative) plus every row never seen in a pair.

    A left join against the component map: rows with no component are
    unique documents; rows whose id equals their component id are the
    cluster canonicals; all other cluster members drop.
    """
    comp = components.select(
        F.col("node").alias(id_col), F.col("component")
    )
    return (
        df.join(comp, id_col, "left")
        .where(F.col("component").isNull() | (F.col(id_col) == F.col("component")))
        .drop("component")
    )


def cluster_survivors_by(
    df: DataFrame,
    components: DataFrame,
    order_cols: list,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the best row per duplicate cluster by an explicit ranking
    (e.g. longest text, highest quality score) instead of the arbitrary
    min-id canonical — dedup should keep the most valuable copy.

    ``order_cols`` must be a deterministic total order within a cluster
    (include the id as the final tiebreak). One join + one window pass:
    unpaired rows rank inside their own singleton window partition
    (group key falls back to their id, disambiguated from genuine
    component values by the membership flag), so no task ever windows
    more than one cluster — never the whole unpaired population.
    """
    from pyspark.sql.window import Window

    comp = components.select(F.col("node").alias(id_col), F.col("component"))
    tagged = df.join(comp, id_col, "left")
    member = F.col("component").isNotNull()
    w = Window.partitionBy(
        member, F.coalesce(F.col("component"), F.col(id_col))
    ).orderBy(*order_cols)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "component")
    )


def _gc_nudge(spark, pause: float = 2.0) -> None:
    """Reclaim shuffle files whose RDDs just became unreachable.
    Iterative operators produce shuffle garbage faster than the
    ContextCleaner's 30-minute periodic fallback GC reclaims it — at
    the 1000x tier that difference filled the disk
    (DIAG_pagerank_sf100.json). Three steps, all required:
    Python gc first (superseded DataFrames hold py4j handles that pin
    the JVM-side plans — JVM GC alone cannot free them), then a JVM GC
    (the ContextCleaner acts on weak-reference clearance), then a
    BOUNDED wait for the cleaner to drain (it deletes asynchronously;
    back-to-back heavy jobs otherwise stack their shuffle footprints).

    The wait is a poll, not a blind sleep (round-16; the round-15
    unconditional ``time.sleep(2)`` put ~12s of fixed wall on every
    pagerank call): every 0.25s read the size of the ContextCleaner's
    tracked-reference set via reflection and stop as soon as it is
    stable across two polls — i.e. the queued cleanups have drained.
    An idle cleaner exits in one step (~0.25s); an actively-deleting
    one gets up to ``pause`` seconds, the round-15 bound under which
    the sf100 runs survived. Reflection failure (cleaner disabled,
    field renamed) falls back to sleeping out the bound. Best-effort:
    a missing py4j gateway is not an error."""
    import gc
    import time

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
        if pause <= 0:
            return
        deadline = time.monotonic() + pause
        try:
            cleaner = spark.sparkContext._jsc.sc().cleaner().get()
            buf = None
            for fld in cleaner.getClass().getDeclaredFields():
                if "referenceBuffer" in fld.getName():
                    fld.setAccessible(True)
                    buf = fld.get(cleaner)
                    break
            if buf is None:
                raise LookupError("referenceBuffer not found")
            prev = -1
            while time.monotonic() < deadline:
                time.sleep(0.25)
                size = buf.size()
                if size == prev:
                    break
                prev = size
        except Exception:  # noqa: BLE001 — reflection is best-effort
            time.sleep(max(0.0, deadline - time.monotonic()))
    except Exception:  # noqa: BLE001 — py4j access is optional
        pass


#: Session-local marker: a spill-path pagerank ran earlier, so the next
#: run's phase-1 write may land on top of its tail shuffle files and
#: should start with a reclamation nudge. Never set by small graphs —
#: their runs neither need the pre-nudge nor should pay for it.
_SPILL_SEEN = False


def _input_bytes(df: DataFrame, stop_above: int) -> int | None:
    """On-disk byte count of the plan's input files (Hadoop FS API, so
    any scheme works), early-exiting once the running total passes
    ``stop_above`` — big inputs answer after a handful of stats. Costs
    zero Spark jobs: ``inputFiles()`` is a plan traversal and each stat
    is a namenode/inode round-trip. Returns None when the plan has no
    file inputs (in-memory or RDD-backed relations) or a stat fails;
    callers MUST treat None as "unknown", never as "small"."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        sc = df.sparkSession.sparkContext
        jvm = sc._jvm
        hconf = sc._jsc.hadoopConfiguration()
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
            if total > stop_above:
                return total
        return total
    except Exception:  # noqa: BLE001 — heuristic probe, never fatal
        return None


def _block_store_bytes(spark) -> int:
    """Total bytes (memory + disk) currently held by the block store
    for cached/checkpointed RDDs. Best-effort (0 on failure); used as a
    before/after DELTA around one materialization, so concurrent cache
    churn can skew it — acceptable for a safety guard that only needs
    order-of-magnitude truth."""
    try:
        return sum(i.memSize() + i.diskSize()
                   for i in spark.sparkContext._jsc.sc().getRDDStorageInfo())
    except Exception:  # noqa: BLE001
        return 0


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 8,
    damping_pct: int = 85,
    scale: int = 1_000_000_000_000,
    checkpoint: bool = True,
    checkpoint_every: int = 3,
    edge_storage: "StorageLevel | None" = None,
    spill_dir: str | None = None,
    spill_threshold_bytes: int = 256 * 1024 * 1024,
    small_input_gate_bytes: int | None = None,
    broadcast_rank_nodes: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank by fixed-iteration power method, computed
    entirely in scaled integers so the result is exact and engine- and
    partitioning-independent.

    Returns (node, pr_scaled): integer ranks that sum to ≈ ``scale``
    (floor-division dust aside). Rank mass at iteration k+1:

        pr'(v) = (100-d)·S div (100·N)  +  d · Σ_{u→v} c(u,v) div 100
        c(u,v) = pr(u)·w(u,v) div outw(u)

    with S = ``scale``, d = ``damping_pct``, N = |nodes|, all divisions
    integral. Both engines of the correctness harness floor the same
    way on positives, so 8 iterations stay bit-identical — no float
    summation-order drift, the classic reason iterative graph oracles
    "almost" match.

    **Contract:** callers pass a symmetrized graph (every node appears
    as both src and dst — true for co-occurrence graphs by
    construction). Nodes outside the edge set never enter; dangling
    mass therefore cannot exist, which is what makes the integer
    formulation closed. Out-of-contract (asymmetric) inputs degrade
    predictably rather than silently reshaping the result set: pure
    sinks (inbound only) are RETAINED with the mass they receive (the
    outw re-attach is a left join; their never-redistributed mass
    leaks, the classic dangling-node artifact), while pure sources
    (outbound only) drop after one iteration since nothing sends to
    them. The returned rows are exactly the dst-side nodes — the same
    row set the reference oracle's final ``SELECT`` produces.

    Scale design (the CC notes above apply too):
    - Out-weights: on the SPILL path, a |V|-sized aggregate carried on
      the RANK side (node, pr_scaled, outw) — they key by src exactly
      like the rank, so the iteration join gets them for free and the
      edge relation stays three narrow columns. (Round 14 attached
      outw to the edges via a window — a full |E| src-partitioned
      exchange whose shuffle alone wrote ~45 GB at the 1000x tier
      before the edge spill could start; see DIAG_pagerank_sf100.json.)
      On the gated SMALL path the trade inverts: the window exchange
      is megabytes, while the rank-side shape costs a second |V|-vs-|V|
      join per iteration — ~2× the per-iteration stage count, which at
      small scale IS the wall. Small graphs therefore attach outw to
      the edges and iterate with a single join, the round-13 shape.
    - Per-edge contribution pr·w can pass int64 on a hot edge at
      planet scale (pr ≤ S, w a co-occurrence count). The multiply
      runs in plain longs — inside whole-stage codegen, ~2× cheaper
      than decimal — whenever the OBSERVED max(w)·S < 2^62, falling
      back to decimal(38,0) above that. Both paths are exact integer
      math, so the choice cannot change a single output bit.
    - Σ contributions into a node is ≤ S *by mass conservation*
      (Σ_v in(v) ≤ Σ_u pr(u) ≈ S regardless of graph size), so the
      aggregation side never needs widening — the overflow analysis
      is data-size-independent, not fixture luck.
    - One shuffle per iteration: the rank side (|V| rows) is pinned to
      the BUILD side of a shuffle-hash join — per-partition build is
      |V|/partitions rows, scale-safe at any |V|, and the edge side can
      never be picked for a broadcast build. The pin matters because a
      checkpointed/re-read relation can carry a SIZE ESTIMATE far from
      its true cost (measured: 24M materialized edge rows reporting
      24 MB), so from iteration ~2 — once the rank subtree's estimate
      outgrows that figure — the static planner would otherwise build
      a broadcast hash table out of the EDGE LIST and OOM the driver
      (observed at the 10× tier). The groupBy(dst) is the iteration's
      real exchange. ``localCheckpoint`` truncates rank lineage every
      ``checkpoint_every`` iterations rather than every round: a
      checkpoint is an eager materialization (a full action + cache
      write), so per-round checkpointing pays iterations× scheduling
      round-trips while the lineage it guards against is only ~3 joins
      deep at cadence 3 — bounded either way, ~2.5× fewer actions.
    - PROVABLY-SMALL inputs skip the measurement entirely (round-16):
      when the edge derivation's input FILES total at most
      ``small_input_gate_bytes`` (default ``spill_threshold_bytes``/2
      — measured edge derivations emit ~input-sized edge files, so the
      2x margin absorbs the ratio), the derivation + out-weights
      materialize straight to the block store with ONE localCheckpoint
      and no parquet round-trip — the staged write existed only as the
      size measurement, and ``inputFiles()`` + FS stats answer it for
      zero Spark jobs. A post-checkpoint block-store delta guard
      (> 10x threshold ⇒ a tiny input exploded quadratically) converts
      to the measured spill path by staging FROM the blocks — one
      scan, no derivation recompute. Unknown inputs (in-memory
      relations, stat failures) are never treated as small. On the
      single-join path the rank side is additionally BROADCAST each
      iteration when the measured |V| ≤ ``broadcast_rank_nodes``: a
      checkpointed edge relation has no Catalyst partitioning, so the
      shuffle-hash form re-exchanges all |E| rows every iteration,
      while the broadcast form moves only |V| rank rows and the
      groupBy(dst) output (measured sf0.1 whole-operator: 8.9s
      round-15 shape → 4.7s).
    - Otherwise the loop-invariant edge relation is materialized ONCE
      to flat zstd parquet, and what happens next is SIZE-GATED on the
      actual staged bytes (round-16; round 15 ran the full spill
      machinery unconditionally, putting ~38s of fixed cost on a
      2,000-node graph). The flat write is both the materialization
      AND the measurement: plan-time size estimates on checkpointed
      relations are off by orders of magnitude (24M rows reporting
      24 MB), but the staged file's on-disk byte count is ground truth
      and costs one pass — the minimum any materialization pays.
      * Below ``spill_threshold_bytes`` (default 256 MB ≈ ~2.5 GB of
        block-store rows, comfortably inside any executor tier): read
        the staged file back, attach outw to the EDGES via a window
        (one small exchange), and ``localCheckpoint`` — the round-13
        in-memory, single-join-per-iteration shape. No bucketed
        rewrite, no GC nudges, no table. The iterations also run at
        cores-many shuffle partitions instead of the session's
        4×-cores default (conf set around the loop and restored in the
        finally; the result is eagerly materialized first so no lazy
        job escapes the narrow setting): the 4× default buys spill-
        cliff headroom on 600M-row shuffles, which under this gate
        cannot exist, while per-iteration scheduling overhead scales
        with partition count — measured 8.85s vs 5.15s at sf0.1.
        NOTE: the conf toggle makes the small path non-reentrant for
        CONCURRENT queries planned in the same session during the
        ~seconds the loop runs; batch pipelines and the bench protocol
        run queries sequentially.
      * At or above the threshold (or whenever ``spill_dir`` is
        given): rewrite as a src-BUCKETED, zstd parquet table (dropped
        on return) and re-scan per iteration. Two measured wins over a
        DISK_ONLY ``localCheckpoint`` (DIAG_pagerank_sf100.json):
        footprint (block-store rows are ~32 B/edge — ~77 GB at the
        1000× tier, exceeded the host disk; bucket-sorted parquet is
        ~10× smaller) and per-iteration shuffle (the bucketed scan is
        hash-partitioned on src in the planner's eyes, so the edge
        side of the iteration join NEVER re-exchanges — only the |V|
        rank side moves; an unbucketed scan re-shuffled all |E| rows
        every iteration, ~25 GB a round at sf100). A cluster
        deployment does the same thing: loop-invariant state
        checkpoints to the lake as a bucketed/clustered table, not to
        executor block managers.
      GC nudges (shuffle-file reclamation between the phases and at
      checkpoint cadence) run ONLY on the spill path — they exist to
      keep a disk-bound run alive, and are pure overhead on a graph
      whose shuffles are megabytes. The spill lifecycle is wrapped in
      try/finally: a failure mid-run (OOM, disk-full — the very modes
      the spill targets) drops the managed table and the staging
      directory instead of leaking multi-GB files into the warehouse.
      ``edge_storage`` opts back into the in-JVM persist for provably-
      small graphs; ``spill_dir`` makes the spill an EXTERNAL table at
      a caller-owned path (kept on return) whose name is DETERMINISTIC
      in the path (``gads_pr_edges_<sha1(spill_dir)[:10]>``) — a prior
      registration at the same path is dropped and re-created, so
      repeated calls never accumulate dangling catalog entries.
    """
    import shutil

    global _SPILL_SEEN
    w = (F.col(weight) if weight else F.lit(1)).cast("long")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    spark = edges.sparkSession
    _spill_tmp = None   # managed spill table to drop (normal + finally)
    stage_dir = None    # phase-1 staging dir to remove (normal + finally)
    spilled = False     # big-graph spill path engaged this run
    single_join = False  # small/persisted graph: outw rides the edges
    _conf_prev = None   # shuffle.partitions to restore (small path)
    _SP_KEY = "spark.sql.shuffle.partitions"
    try:
        if checkpoint and edge_storage is not None:
            # Opt-in in-JVM persist: callers whose graph provably fits
            # may pass MEMORY_AND_DISK (or DISK_ONLY for the round-14
            # behavior) to skip the parquet round-trip below. On-heap
            # caching couples the operator's memory footprint to |E| —
            # at the 100x tier (240M edges) the cached rows crowded the
            # unified pool until hash aggregation could not get a page
            # (AGGREGATE_OUT_OF_MEMORY) — a toy-tier knob, not the
            # default. Round-14 shape throughout: outw on the edge
            # rows, one join per iteration.
            from pyspark.sql.window import Window

            e = e.withColumn(
                "outw", F.sum("w").over(Window.partitionBy("src"))
            ).localCheckpoint(storageLevel=edge_storage)
            single_join = True
        elif checkpoint:
            import hashlib
            import os
            import tempfile
            import uuid

            from pyspark.sql.window import Window

            nb = int(spark.conf.get("spark.sql.shuffle.partitions", "128"))
            staged = None
            staged_bytes = None
            # Pre-gate (round-16): when the edge derivation's INPUT
            # files are provably tiny, skip the staged parquet
            # round-trip outright and materialize derivation + outw
            # straight to the block store — the staged write existed
            # only as the size measurement, and for a sub-128 MB input
            # the answer is known before asking (measured edge
            # derivations emit ~input-sized edge files; the gate sits
            # 2x under the spill threshold to absorb that ratio).
            # ``inputFiles`` + FS stats cost no Spark job; None
            # (in-memory relations, stat failure) means UNKNOWN and
            # falls through to the write-first measurement below — the
            # conservative path, identical to round-15 behavior.
            if spill_dir is None:
                gate = (small_input_gate_bytes
                        if small_input_gate_bytes is not None
                        else spill_threshold_bytes // 2)
                ib = _input_bytes(edges, gate)
                if ib is not None and ib <= gate:
                    _conf_prev = spark.conf.get(_SP_KEY, None)
                    spark.conf.set(
                        _SP_KEY,
                        str(spark.sparkContext.defaultParallelism))
                    blocks_before = _block_store_bytes(spark)
                    e = e.withColumn(
                        "outw", F.sum("w").over(Window.partitionBy("src"))
                    ).localCheckpoint()
                    blocks_delta = _block_store_bytes(spark) - blocks_before
                    if blocks_delta > 10 * spill_threshold_bytes:
                        # Guard: a tiny input exploded into a huge edge
                        # set (quadratic derivation). Convert to the
                        # measured path — the staged write now reads
                        # FROM the blocks (one scan, no derivation
                        # recompute), and the block copy is released to
                        # the ContextCleaner once ``e`` is reassigned.
                        stage_dir = tempfile.mkdtemp(
                            prefix="gads_pr_stage_")
                        (e.select("src", "dst", "w").write
                         .mode("overwrite").option("compression", "zstd")
                         .parquet(stage_dir))
                        if _conf_prev is not None:
                            spark.conf.set(_SP_KEY, _conf_prev)
                        _conf_prev = None
                    else:
                        single_join = True
            if not single_join and stage_dir is None:
                # Phase 1: flush the edge DERIVATION to flat zstd
                # parquet. A caller's derivation is often multiple
                # exchanges deep (the co-purchase graph: groupBy order +
                # explode + groupBy pair ≈ 35 GB of shuffle at the 1000x
                # tier); flushing it first bounds the live shuffle
                # chain, and the staged file's byte count is the
                # ground-truth size measurement the spill gate below
                # needs (plan estimates on checkpointed relations are
                # off by orders of magnitude).
                stage_dir = tempfile.mkdtemp(prefix="gads_pr_stage_")
                if _SPILL_SEEN:
                    # Start clean ONLY when a previous spill-path run in
                    # this session may have left tail shuffles (a bench
                    # loop, a sweep) — measured: run 2 of a back-to-back
                    # sf100 bench died on run 1's unreclaimed files. On
                    # a session that has only run small graphs this is
                    # pure fixed cost, so it is gated on the flag.
                    _gc_nudge(spark)
                (e.write.mode("overwrite").option("compression", "zstd")
                 .parquet(stage_dir))
            if not single_join:
                staged_bytes = sum(
                    ent.stat().st_size for ent in os.scandir(stage_dir)
                    if ent.is_file())
                # Explicit schema: a zero-edge graph writes no part
                # files, and a schema-less read of the bare dir fails
                # inference.
                staged = spark.read.schema(
                    "src " + dict(e.dtypes)["src"] + ", dst "
                    + dict(e.dtypes)["dst"] + ", w long"
                ).parquet(stage_dir)
            if single_join:
                pass
            elif staged_bytes < spill_threshold_bytes and spill_dir is None:
                # SMALL graph: the round-13 in-memory, single-join
                # shape. ~256 MB of parquet is ~2.5 GB of block-store
                # rows — inside any executor tier — so the bucketed
                # rewrite, the catalog table, and every GC nudge would
                # be pure fixed cost here (measured: they put 38s on a
                # 2,000-node graph). Iterations run at cores-many
                # shuffle partitions (restored in the finally): the
                # session's 4×-cores default buys spill-cliff headroom
                # on 600M-row shuffles, impossible under this gate,
                # while per-iteration scheduling overhead scales with
                # partition count (measured sf0.1: 8.85s → 5.15s).
                from pyspark.sql.window import Window

                _conf_prev = spark.conf.get(_SP_KEY, None)
                spark.conf.set(
                    _SP_KEY, str(spark.sparkContext.defaultParallelism))
                e = staged.withColumn(
                    "outw", F.sum("w").over(Window.partitionBy("src"))
                ).localCheckpoint()
                single_join = True
                shutil.rmtree(stage_dir, ignore_errors=True)
                stage_dir = None
            else:
                # BIG graph (or caller-owned external spill): phase 2 —
                # rewrite as a src-bucketed table and re-scan per
                # iteration. Keeping the two phases in separate jobs
                # matters: in a single job the derivation's shuffles
                # and the bucketing's |E| exchange are live TOGETHER
                # until the write finishes — measured ~52 GB against a
                # 62 GB-free disk, the fourth recorded sf100 death. The
                # nudge between them reclaims the derivation's files
                # before the bucketing exchange starts. The one-time
                # repartition(src) clusters the buckets (without it
                # bucketBy writes tasks x buckets small files).
                spilled = True
                _SPILL_SEEN = True
                _gc_nudge(spark)
                if spill_dir is not None:
                    # Deterministic name per external path: repeated
                    # calls re-register the SAME table instead of
                    # accumulating dangling catalog entries over
                    # overwritten files (round-16, advisor finding).
                    digest = hashlib.sha1(
                        os.path.abspath(spill_dir).encode()).hexdigest()
                    name = f"gads_pr_edges_{digest[:10]}"
                    spark.sql(f"DROP TABLE IF EXISTS {name}")
                else:
                    name = f"gads_pr_edges_{uuid.uuid4().hex[:10]}"
                writer = (staged.repartition(nb, "src")
                          .sortWithinPartitions("src", "dst")
                          .write.mode("overwrite")
                          .option("compression", "zstd")
                          .bucketBy(nb, "src").sortBy("src", "dst"))
                if spill_dir is not None:
                    writer = writer.option("path", spill_dir)
                writer.saveAsTable(name)
                _gc_nudge(spark)
                shutil.rmtree(stage_dir, ignore_errors=True)
                stage_dir = None
                e = spark.table(name)
                if spill_dir is None:
                    _spill_tmp = name  # managed: dropped on return
        if single_join:
            # outw already rides the (materialized) edge rows; the
            # stats probe is one pass over the small/persisted edges.
            stats = e.agg(F.countDistinct("src").alias("n"),
                          F.max("w").alias("wm")).collect()[0]
        else:
            # SPILL path / no-checkpoint: out-weights are a |V|-sized
            # AGGREGATE attached to the RANK side, not a window over
            # the edge list (the round-14 shape). The window
            # materialized outw onto all |E| rows through a full
            # src-partitioned exchange — at the 1000x tier that
            # exchange alone wrote ~45 GB of shuffle before the spill
            # could even start (the second recorded sf100 death). As an
            # aggregate it is one map-side-combined shuffle emitting
            # |V| rows, and the iteration join needs outw exactly where
            # pr_scaled already travels: keyed by src. The ranks
            # relation simply carries (node, pr_scaled, outw). max(w)
            # rides the same aggregate so the overflow probe below
            # reads |V| rows, not |E| (round-16; previously a second
            # full edge scan).
            outw = e.groupBy("src").agg(F.sum("w").alias("outw"),
                                        F.max("w").alias("_wm"))
            if checkpoint:
                # |V|-sized, loop-invariant: eager-materialize once so
                # neither the iterations nor the stats probe below
                # recompute the aggregate.
                outw = outw.localCheckpoint()
            stats = outw.agg(F.max("_wm").alias("wm"),
                             F.count(F.lit(1)).alias("n")).collect()[0]
        wmax, n = stats["wm"], stats["n"]
        if n == 0:
            # Built from `edges`, not `e`: the empty result must not
            # keep a lineage into the spill table the finally block is
            # about to drop.
            return edges.select(F.col(src).alias("node"),
                                F.lit(0).cast("long").alias("pr_scaled")
                                ).where(F.lit(False))
        mul = ("(pr_scaled * w) div outw" if wmax * scale < (1 << 62)
               else "(CAST(pr_scaled AS DECIMAL(38,0)) * w) div outw")
        teleport = ((100 - damping_pct) * scale) // (100 * n)
        if single_join:
            r = e.select("src").distinct().select(
                F.col("src").alias("node"),
                F.lit(scale // n).cast("long").alias("pr_scaled"))
        else:
            outw_n = outw.select(F.col("src").alias("node"), "outw")
            r = outw_n.select(
                "node", F.lit(scale // n).cast("long").alias("pr_scaled"),
                "outw")
        # Broadcast the rank side when |V| is provably small (round-16,
        # single-join path only): the checkpointed edge relation loses
        # its Catalyst partitioning, so the shuffle-hash form must
        # RE-EXCHANGE all |E| rows every iteration — 8 dead shuffles of
        # a loop-invariant relation. Broadcasting the |V|-row rank
        # relation instead moves zero edge bytes; each iteration's only
        # exchange is the groupBy(dst) partial-agg output (measured
        # sf0.1: 5.25s → 4.74s whole-operator; the gain grows with
        # |E|/|V|). Gated on the measured n — never a size estimate —
        # and never on the spill path, where outw rides the rank side
        # and |V| itself can be cluster-sized.
        bcast_rank = single_join and n <= broadcast_rank_nodes
        for i in range(iterations):
            contrib = (
                e.join(F.broadcast(r) if bcast_rank
                       else r.hint("shuffle_hash"), e.src == r.node)
                .select(F.col("dst").alias("node"),
                        F.expr(f"CAST({mul} AS BIGINT)").alias("c"))
            )
            ranks = contrib.groupBy("node").agg(
                F.expr(f"CAST({teleport} + ({damping_pct} * sum(c)) div "
                       "100 AS BIGINT)").alias("pr_scaled"))
            if single_join:
                # outw lives on the edge rows: the aggregate IS the
                # iteration's result, sinks included (they are dst
                # nodes). One join + one exchange per round.
                r = ranks
            else:
                # Re-attach the loop-invariant out-weights: |V| vs |V|,
                # both hash-partitioned on node (the groupBy above,
                # outw's own aggregate), so this is cheap; shuffle_hash
                # pin for the same reason as the big join — no size-
                # estimate-driven broadcast of a relation that grows
                # with the graph. LEFT join (round-16, advisor
                # finding): under the symmetrized contract every ranked
                # node has out-edges and this is exactly the inner
                # join, but an out-of-contract pure sink must stay in
                # the result with the mass it received — its NULL outw
                # is never read, because a sink never matches e.src in
                # the next iteration's join. Bonus: the LAST
                # iteration's re-attach feeds only the (node,
                # pr_scaled) projection, so Catalyst eliminates it
                # outright (left outer on unique, unreferenced keys).
                r = ranks.join(outw_n.hint("shuffle_hash"), "node",
                               "left")
            if checkpoint and (i + 1) % max(1, checkpoint_every) == 0 \
                    and i + 1 < iterations:
                r = r.localCheckpoint()
                if spilled:
                    # Each truncation makes the previous rounds'
                    # shuffle files unreachable (~8-12 GB of
                    # contribution shuffle per iteration at the sf100
                    # tier) — reclaim them now. Small graphs skip the
                    # nudge: their per-iteration garbage is megabytes
                    # and the ContextCleaner's own cadence handles it.
                    _gc_nudge(spark)
        r = r.select("node", "pr_scaled")
        if _spill_tmp or _conf_prev is not None:
            # Sever the result's lineage (eager |V|-sized
            # materialization) BEFORE the finally block acts: the
            # spill path's table is about to be dropped (a lazy plan
            # reading a dropped table's files would fail at the
            # caller's action), and the small path's narrowed
            # shuffle-partition setting is about to be restored (a lazy
            # plan would otherwise run its iterations under the wide
            # session default the narrowing exists to avoid).
            r = r.localCheckpoint()
        return r
    finally:
        if _conf_prev is not None:
            try:
                spark.conf.set(_SP_KEY, _conf_prev)
            except Exception:  # noqa: BLE001 — session may be dead
                pass
        if stage_dir is not None:
            shutil.rmtree(stage_dir, ignore_errors=True)
        if _spill_tmp:
            # Normal return and failure alike: the managed spill table
            # must never outlive the call (a crash mid-iteration used
            # to leak a multi-GB table into the warehouse).
            try:
                spark.sql(f"DROP TABLE IF EXISTS {_spill_tmp}")
            except Exception:  # noqa: BLE001 — session may be dead
                pass
        if spilled:
            # End-of-run nudge: the tail iterations' shuffles are dead
            # now; a caller looping pagerank (or a bench's repeated
            # executions) must not start its next run on top of them.
            _gc_nudge(spark)
