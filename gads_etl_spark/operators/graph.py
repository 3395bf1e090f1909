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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint: bool = True,
) -> DataFrame:
    """Resolve undirected edges to components; returns (node, component)
    where ``component`` is the minimum node id reachable from ``node``.

    Only nodes that appear in at least one edge are returned (singletons
    never entered the candidate-pair set to begin with).
    """
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if checkpoint:
        # Materialize the upstream plan (often an expensive candidate-pair
        # computation) exactly once, BEFORE symmetrizing — the union below
        # references its input twice, and checkpointing after the union
        # would execute the pair generation twice.
        e0 = e0.localCheckpoint()
    e = e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # Partition proportionally to the graph, not the session default: a
    # post-blocking dup graph is usually tiny and per-round scheduling
    # overhead dominates if every round shuffles into 32+ partitions.
    n_parts = max(1, min(e.sparkSession.sparkContext.defaultParallelism,
                         e0.count() // 50_000 + 1))
    e = e.repartition(n_parts, "b")
    if checkpoint:
        e = e.localCheckpoint()
    labels = (
        e.select(F.col("a").alias("node")).distinct()
        .withColumn("component", F.col("node"))
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
        if i >= 2:
            # Pointer jumping (path halving): follow each node's label
            # to ITS label and adopt the smaller — chains collapse
            # exponentially, so convergence is O(log diameter) rounds
            # instead of O(diameter). Safe because a label is always a
            # reachable node id, so the jump target's label is reachable
            # too and monotonicity (labels only decrease) holds. Engaged
            # only from round 3: shallow graphs (real near-dup clusters,
            # diameter ≲ 4) converge before paying the extra self-join;
            # anything still moving by round 3 is chain-shaped and needs
            # the exponential collapse.
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


def _gc_nudge(spark) -> None:
    """Reclaim shuffle files whose RDDs just became unreachable.
    Iterative operators produce shuffle garbage faster than the
    ContextCleaner's 30-minute periodic fallback GC reclaims it — at
    the 1000x tier that difference filled the disk
    (DIAG_pagerank_sf100.json). Three steps, all required:
    Python gc first (superseded DataFrames hold py4j handles that pin
    the JVM-side plans — JVM GC alone cannot free them), then a JVM GC
    (the ContextCleaner acts on weak-reference clearance), then a short
    pause (the cleaner deletes asynchronously; back-to-back heavy jobs
    otherwise stack their shuffle footprints). Best-effort: a missing
    py4j gateway is not an error."""
    import gc
    import time

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
        time.sleep(2)
    except Exception:  # noqa: BLE001 — py4j access is optional
        pass


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
    formulation closed.

    Scale design (the CC notes above apply too):
    - Out-weights are a |V|-sized aggregate carried on the RANK side
      (node, pr_scaled, outw) — they key by src exactly like the rank,
      so the iteration join gets them for free and the edge relation
      stays three narrow columns. (Round 14 attached outw to the edges
      via a window — a full |E| src-partitioned exchange whose shuffle
      alone wrote ~45 GB at the 1000x tier before the edge spill could
      start; see DIAG_pagerank_sf100.json.)
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
    - The loop-invariant edge relation is materialized ONCE into a
      src-BUCKETED, zstd-compressed parquet table (dropped on return)
      and re-scanned per iteration — the round-15 default. Two measured
      wins over the round-14 DISK_ONLY ``localCheckpoint``: footprint
      (block-store rows are ~32 B/edge — ~77 GB at the 1000× tier,
      exceeded the host disk; bucket-sorted parquet is ~10× smaller)
      and per-iteration shuffle (the bucketed scan is hash-partitioned
      on src in the planner's eyes, so the edge side of the iteration
      join NEVER re-exchanges — only the |V| rank side moves; an
      unbucketed scan re-shuffled all |E| rows every iteration, ~25 GB
      a round at sf100). A cluster deployment does the same thing:
      loop-invariant state checkpoints to the lake as a bucketed/
      clustered table, not to executor block managers. ``edge_storage``
      opts back into the in-JVM persist for provably-small graphs;
      ``spill_dir`` makes the spill an EXTERNAL table at a caller-owned
      path (kept on return).
    """
    w = (F.col(weight) if weight else F.lit(1)).cast("long")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"),
                     w.alias("w"))
    _spill_tmp = None
    if checkpoint and edge_storage is not None:
        # Opt-in in-JVM persist: callers whose graph provably fits may
        # pass MEMORY_AND_DISK (or DISK_ONLY for the round-14 behavior)
        # to skip the parquet round-trip below. On-heap caching couples
        # the operator's memory footprint to |E| — at the 100x tier
        # (240M edges) the cached rows crowded the unified pool until
        # hash aggregation could not get a page (AGGREGATE_OUT_OF_MEMORY)
        # — so this is a toy-tier constant-buying knob, not the default.
        e = e.localCheckpoint(storageLevel=edge_storage)
    elif checkpoint:
        # Default (round 15): spill the materialized edge list to a
        # BUCKETED (by src), zstd-compressed parquet table and re-scan
        # it per iteration, instead of a DISK_ONLY localCheckpoint.
        # Two measured reasons (DIAG_pagerank_sf100.json):
        # - Footprint: block-store rows serialize at ~32 B/edge (the
        #   sf100 2.4B-edge persist needed ~77 GB and died on a
        #   60 GB-free disk); parquet dictionary/RLE+zstd on bucket-
        #   sorted longs stores the same relation ~10x smaller.
        # - Per-iteration shuffle: the iteration join distributes on
        #   src, and a plain parquet scan has unknown partitioning, so
        #   EVERY iteration would re-exchange all |E| rows (~25 GB of
        #   shuffle write per iteration at sf100 — the third recorded
        #   disk death). A bucketed scan IS hash-partitioned on src in
        #   the eyes of the planner: the edge side of the join never
        #   exchanges again; only the |V|-sized rank side moves.
        # This is also exactly the cluster deployment shape: an
        # iterative job checkpoints its loop-invariant relation to the
        # lake as a bucketed/clustered table, not to executor block
        # managers. The one-time repartition(src) below replaces the
        # round-14 window's |E| exchange one-for-one (without it,
        # bucketBy writes tasks x buckets small files).
        import shutil
        import tempfile
        import uuid

        spark = edges.sparkSession
        nb = int(spark.conf.get("spark.sql.shuffle.partitions", "128"))
        _spill_tmp = f"gads_pr_edges_{uuid.uuid4().hex[:10]}"
        # TWO phases, one live shuffle chain at a time. A caller's edge
        # derivation is often multiple exchanges deep (the co-purchase
        # graph: groupBy order + explode + groupBy pair ≈ 35 GB of
        # shuffle at the 1000x tier), and the bucketing clustering is
        # another |E| exchange; in a single job ALL of those shuffle
        # files are live together until the write finishes — measured
        # ~52 GB against a 62 GB-free disk, the fourth recorded sf100
        # death. Phase 1 flushes the derivation to plain parquet, a GC
        # nudge reclaims its shuffles; phase 2 reads that flat file, so
        # its only live shuffle is the one repartition(src) that
        # clusters the buckets (without it bucketBy writes
        # tasks x buckets small files).
        stage_dir = tempfile.mkdtemp(prefix="gads_pr_stage_")
        # Start clean: a PREVIOUS pagerank run's tail shuffles (a bench
        # loop, a hyperparameter sweep) must be reclaimed before this
        # run's derivation stacks its own on top — measured: run 2 of a
        # back-to-back sf100 bench died on run 1's unreclaimed files.
        _gc_nudge(spark)
        (e.write.mode("overwrite").option("compression", "zstd")
         .parquet(stage_dir))
        _gc_nudge(spark)
        # Explicit schema: a zero-edge graph writes no part files, and
        # a schema-less read of the bare directory would fail inference.
        staged = spark.read.schema(e.schema).parquet(stage_dir)
        writer = (staged.repartition(nb, "src")
                  .sortWithinPartitions("src", "dst")
                  .write.mode("overwrite").option("compression", "zstd")
                  .bucketBy(nb, "src").sortBy("src", "dst"))
        if spill_dir is not None:
            writer = writer.option("path", spill_dir)  # external table
        writer.saveAsTable(_spill_tmp)
        _gc_nudge(spark)
        shutil.rmtree(stage_dir, ignore_errors=True)
        e = spark.table(_spill_tmp)
        if spill_dir is not None:
            _spill_tmp = None  # caller owns the external table; keep it
    # Out-weights are a |V|-sized AGGREGATE attached to the RANK side,
    # not a window over the edge list (the round-14 shape). The window
    # materialized outw onto all |E| rows through a full src-partitioned
    # exchange — at the 1000x tier that exchange alone wrote ~45 GB of
    # shuffle before the spill could even start (the second recorded
    # sf100 death, DIAG_pagerank_sf100.json). As an aggregate it is one
    # map-side-combined shuffle emitting |V| rows, and the iteration
    # join needs outw exactly where pr_scaled already travels: keyed by
    # src. The ranks relation simply carries (node, pr_scaled, outw).
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    if checkpoint:
        # |V|-sized, loop-invariant: eager-materialize once so neither
        # the 8 iterations nor n/r0 below recompute the aggregate.
        outw = outw.localCheckpoint()
    wmax = e.agg(F.max("w").alias("wm")).collect()[0]["wm"]
    n = outw.count()
    if n == 0:
        if _spill_tmp:
            edges.sparkSession.sql(f"DROP TABLE IF EXISTS {_spill_tmp}")
        # Built from `edges`, not `e`: the empty result must not keep a
        # lineage into the just-dropped spill table.
        return edges.select(F.col(src).alias("node"),
                            F.lit(0).cast("long").alias("pr_scaled")
                            ).where(F.lit(False))
    mul = ("(pr_scaled * w) div outw" if wmax * scale < (1 << 62)
           else "(CAST(pr_scaled AS DECIMAL(38,0)) * w) div outw")
    teleport = ((100 - damping_pct) * scale) // (100 * n)
    outw_n = outw.select(F.col("src").alias("node"), "outw")
    r = outw_n.select(
        "node", F.lit(scale // n).cast("long").alias("pr_scaled"), "outw")
    for i in range(iterations):
        contrib = (
            e.join(r.hint("shuffle_hash"), e.src == r.node)
            .select(F.col("dst").alias("node"),
                    F.expr(f"CAST({mul} AS BIGINT)").alias("c"))
        )
        ranks = contrib.groupBy("node").agg(
            F.expr(f"CAST({teleport} + ({damping_pct} * sum(c)) div 100"
                   " AS BIGINT)").alias("pr_scaled"))
        # Re-attach the loop-invariant out-weights: |V| vs |V|, both
        # hash-partitioned on node (the groupBy above, outw's own
        # aggregate), so this is cheap; shuffle_hash pin for the same
        # reason as the big join — no size-estimate-driven broadcast of
        # a relation that grows with the graph.
        r = ranks.join(outw_n.hint("shuffle_hash"), "node")
        if checkpoint and (i + 1) % max(1, checkpoint_every) == 0 \
                and i + 1 < iterations:
            r = r.localCheckpoint()
            # Each truncation makes the previous rounds' shuffle files
            # unreachable (~8-12 GB of contribution shuffle per
            # iteration at the sf100 tier) — reclaim them now.
            _gc_nudge(edges.sparkSession)
    r = r.select("node", "pr_scaled")
    if _spill_tmp:
        # Sever the result's lineage from the spill table (eager |V|-
        # sized materialization), then reclaim the disk immediately —
        # callers act on `r` after return, and a lazy plan reading a
        # dropped table's files would fail there.
        r = r.localCheckpoint()
        edges.sparkSession.sql(f"DROP TABLE IF EXISTS {_spill_tmp}")
        # End-of-run nudge: the tail iterations' shuffles are dead now;
        # a caller looping pagerank (or a bench's repeated executions)
        # must not start its next run on top of them.
        _gc_nudge(edges.sparkSession)
    return r
