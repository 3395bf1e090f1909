"""Deterministic corpus sampling, splitting, and sequence packing.

Training-data pipelines need *reproducible* sampling: the same document
must land in the same split on every run, on any cluster size, under any
partitioning — which rules out ``df.sample`` (seed + partitioning
dependent) for anything that feeds a published dataset. The standard
trick is content hashing: hash a stable id, compare against a threshold.

Everything here is JVM-side expression work (md5 + string compare — no
UDFs, no shuffle for the sampling itself) and engine-portable, so the
DuckDB oracle states the identical expression.

Granularity: thresholds quantize to 16^4 = 65536 buckets on the first
four hex chars of the hash — plenty for split ratios, and it keeps the
comparison a short string compare instead of 128-bit arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Hex-prefix width used for thresholding (4 chars = 65536 buckets).
_WIDTH = 4
_BUCKETS = 16 ** _WIDTH


def _hash_prefix(id_col: str, salt: str) -> Column:
    """First 4 hex chars of md5(salt || id) — uniform in [0, 16^4)."""
    return F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, _WIDTH)


def _threshold(rate: float) -> str:
    """Hex threshold such that P(prefix < threshold) ≈ rate."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"  # 'g' sorts after every hex char, so prefix < 'g' always
    return format(int(rate * _BUCKETS), f"0{_WIDTH}x")


def deterministic_sample(df: DataFrame, id_col: str, rate: float,
                         salt: str = "sample") -> DataFrame:
    """Keep ≈``rate`` of rows, chosen by content hash of ``id_col``.

    Scale properties: no shuffle, no state, no seed bookkeeping; the
    predicate sits right above the scan so column pruning and partition
    pruning still apply, and re-runs (or incremental extensions of the
    corpus) keep prior membership decisions stable.
    """
    return df.where(_hash_prefix(id_col, salt) < F.lit(_threshold(rate)))


def train_val_test_split(df: DataFrame, id_col: str,
                         train: float = 0.8, val: float = 0.1,
                         salt: str = "split") -> DataFrame:
    """Assign a stable ``split`` column ('train' / 'val' / 'test').

    Boundaries are hash-range cuts: [0, train) → train, [train,
    train+val) → val, rest → test. A document's split never changes as
    the corpus grows — the property random splits lack.
    """
    if train + val >= 1.0:
        raise ValueError("train + val must leave room for test")
    p = _hash_prefix(id_col, salt)
    return df.withColumn(
        "split",
        F.when(p < F.lit(_threshold(train)), "train")
        .when(p < F.lit(_threshold(train + val)), "val")
        .otherwise("test"),
    )


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           rates: dict[str, float], default_rate: float = 0.0,
                           salt: str = "strata") -> DataFrame:
    """Per-stratum deterministic sampling — e.g. downsample boilerplate
    sources hard, keep rare high-quality sources whole, in one pass.

    Expressed as a CASE over hash thresholds: still scan-adjacent, still
    shuffle-free, unlike ``sampleBy`` reproducible across runs/layouts.
    """
    p = _hash_prefix(id_col, salt)
    cond = None
    for stratum, rate in sorted(rates.items()):
        this = (F.col(strata_col) == stratum) & (p < F.lit(_threshold(rate)))
        cond = this if cond is None else cond | this
    others = ~F.col(strata_col).isin(*rates.keys()) if rates else F.lit(True)
    cond = cond | (others & (p < F.lit(_threshold(default_rate))))
    return df.where(cond)


def pack_sequences(df: DataFrame, token_col: str, budget: int,
                   partition_col: str, order_col: str) -> DataFrame:
    """Assign documents to fixed-budget training bins (sequence packing).

    Greedy packing is inherently sequential; the distributed form is
    *cumulative binning*: within each ``partition_col`` group, documents
    in ``order_col`` order get ``bin_id = floor(exclusive_cumsum(tokens)
    / budget)`` — every bin holds consecutive documents totalling ≈
    ``budget`` tokens (the last doc may straddle). One shuffle on the
    partition key; bins never span partitions, so packing parallelizes
    across however many groups exist.

    Documents longer than ``budget`` get a bin to themselves (their
    cumsum jump skips whole bins) — truncation/chunking is a separate
    upstream concern.
    """
    from pyspark.sql.window import Window

    w = (Window.partitionBy(partition_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_excl = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("bin_id", F.floor(cum_excl / F.lit(budget)))


def block_pack(encoded: DataFrame, block_size: int,
               shard_col: str, id_col: str = "doc_id",
               ids_col: str = "token_ids") -> DataFrame:
    """GPT-style contiguous block packing: within each shard, concatenate
    documents' token-id sequences in ``id_col`` order and cut the stream
    into consecutive ``block_size`` blocks — documents SPLIT across block
    boundaries (unlike ``pack_sequences``, which keeps documents whole).
    Returns (shard, block_id, token_ids, n_tokens); every block is full
    except each shard's last.

    Scale shape: global concatenation is inherently sequential, so the
    stream is per-shard — the caller picks the shard expression (hash of
    doc_id for balance) and n_shards sets the parallelism, exactly like
    real tokenizer pipelines write N independent training shards. One
    exchange on the shard key drives the exclusive-cumsum window; block
    slicing is pure expression arithmetic (explode over the spanned
    block range + slice of the overlap); re-assembly is a second
    exchange on (shard, block) with map-side array_sort — no window over
    anything bigger than a shard, no Python in the plan.
    """
    from pyspark.sql.window import Window

    b = F.lit(block_size)
    w = (Window.partitionBy(shard_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    df = (
        encoded.withColumn("_len", F.size(ids_col).cast("long"))
        .where(F.col("_len") > 0)
        .withColumn("_start", F.coalesce(F.sum("_len").over(w), F.lit(0)))
    )
    first = F.floor(F.col("_start") / b)
    last = F.floor((F.col("_start") + F.col("_len") - 1) / b)
    spans = df.withColumn("block_id", F.explode(F.sequence(first, last)))
    lo = F.greatest(F.col("_start"), F.col("block_id") * b)
    hi = F.least(F.col("_start") + F.col("_len"), (F.col("block_id") + 1) * b)
    frags = spans.select(
        shard_col, "block_id",
        lo.alias("_lo"),
        F.slice(
            F.col(ids_col),
            (lo - F.col("_start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("_frag"),
    )
    return (
        frags.groupBy(shard_col, "block_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("_lo").alias("o"),
                                                         F.col("_frag").alias("f")))),
                    lambda s: s["f"],
                )
            ).alias(ids_col)
        )
        .withColumn("n_tokens", F.size(ids_col).cast("long"))
    )


def pps_sample(df: DataFrame, expected_n: int, weight_col: str,
               id_col: str, salt: str = "pps") -> DataFrame:
    """Poisson probability-proportional-to-size sampling: row i is kept
    independently with p_i = min(1, expected_n · w_i / ΣW) — the
    quality- or length-weighted subsample a curation pass wants, with
    E[|sample|] = expected_n (exactly expected_n when no p_i caps at 1).

    Same determinism contract as the uniform hash sampler, extended to
    weights WITHOUT transcendental math: the inclusion test is
    ``md5_prefix_48bit(id) < floor(p_i · 2⁴⁸)`` compared as hex strings,
    and p_i is two IEEE-exact double ops (multiply, divide) both engines
    round identically — no ln/pow whose libm rounding could diverge
    between JVM and C. ΣW is one aggregate reduced to a driver scalar
    (the only job besides the scan-level filter); membership is
    layout-invariant and stable under corpus growth that keeps ΣW fixed.
    Null or non-positive weights are never sampled.
    """
    total = df.agg(F.sum(F.col(weight_col)).cast("double")).collect()[0][0]
    if not total or total <= 0:
        raise ValueError(f"sum({weight_col}) must be positive, got {total}")
    # null → 0 BEFORE the clamp (least/greatest skip nulls, so a null
    # weight would otherwise clamp to p=1); clamp below at 0 because a
    # negative p floors to a negative threshold whose two's-complement
    # hex compares above every md5 prefix
    w = F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0))
    p = F.greatest(F.lit(0.0), F.least(
        F.lit(1.0), F.lit(float(expected_n)) * w / F.lit(float(total))))
    t = F.floor(p * F.lit(float(2 ** 48))).cast("bigint")
    h = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 12)
    keep = (p >= 1.0) | (h < F.lower(F.lpad(F.hex(t), 12, "0")))
    return df.where(keep).withColumn("inclusion_p", p)


def balanced_sample(df: DataFrame, group_col: str, n_per_group: int,
                    id_col: str, salt: str = "balance") -> DataFrame:
    """Deterministic equal-n per group (class-balanced downsampling):
    keep the first ``n_per_group`` rows of each group in content-hash
    order — no RNG, layout-invariant, stable under reruns, and groups
    smaller than the target keep everything (no oversampling here;
    upsampling is a different, weight-aware concern).

    One exchange on the group key; the per-group window ranks at most
    the group's rows, and Spark's WindowGroupLimit pushes the rank-k
    cutoff below the sort at scale (same plan shape the ANN top-k gates
    pin). Hash order, not ts/id order, so the kept subset is an unbiased
    draw rather than "the earliest rows".
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def _mixture_thresholds(stats: DataFrame, source_col: str,
                        target_frac_pct: int) -> DataFrame:
    """Per-source hex-bucket thresholds from per-source counts ``_n_s``.

    The numerator B·pct·N·w_s reaches ≈5e19 already at one 1e9-row
    source (and ≈6.5e30 at N=1e16 rows), past int64's 9.2e18 — under
    non-ANSI bigint arithmetic it would wrap silently and the largest
    source would get a negative/garbage threshold, i.e. be dropped from
    the sample. Both sides therefore compute in decimal(38,0) (exact to
    1e38; max realistic magnitude ≈6.5e30) before the integral ``div``,
    which returns bigint. Split out of ``temperature_mixture_sample`` so
    the overflow regime is unit-testable with synthetic counts.
    """
    stats = stats.withColumn(
        "_w_s", F.floor(F.sqrt(F.col("_n_s").cast("double"))).cast("long"))
    totals = stats.agg(
        F.sum("_n_s").alias("_n"), F.sum("_w_s").alias("_w"))
    return (
        stats.crossJoin(F.broadcast(totals))
        .withColumn(
            "threshold",
            F.least(
                F.expr(
                    f"(cast({_BUCKETS * int(target_frac_pct)} as decimal(38,0))"
                    " * _n * _w_s) div "
                    "(cast(100 as decimal(38,0)) * _w * _n_s)"),
                F.lit(_BUCKETS - 1).cast("long"),
            ))
    )


def temperature_mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_frac_pct: int = 25,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-balanced mixture sampling across sources (α = 0.5).

    The standard data-mixing move for multi-source training corpora
    (multilingual sampling à la XLM-R/mT5, public method): draw source
    ``s`` with probability ∝ n_s^α instead of ∝ n_s, so giant sources
    stop drowning small ones while tiny sources aren't flattened to
    uniform. α = 0.5 is realized EXACTLY in integers — the source
    weight is ``floor(sqrt(n_s))`` (sqrt is IEEE-correctly-rounded, so
    the floor is engine-identical; no pow(), whose rounding is not
    portable) — and the within-source keep-rate for a target of
    ``target_frac_pct``% of the corpus is the integer division

        T_s = (B · target_frac_pct · N · w_s) DIV (100 · W · n_s)

    hex-bucket threshold (B = 16⁴ buckets, W = Σ w_s, N = Σ n_s; capped
    at B−1), compared against the md5 hash-prefix of the id — the same
    deterministic-membership discipline as ``deterministic_sample``:
    pure function of content, stable under re-runs, partition layout,
    and corpus growth.

    Fully relational — per-source stats are one tiny aggregate joined
    back (broadcast), corpus totals one single-row cross join; the keep
    predicate evaluates on the scan. No driver-side collect, so the
    same plan runs at 100 TB.

    Returns the sampled rows with the per-source ``threshold`` attached
    (useful for auditing the realized mixture).
    """
    stats = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_s"))
    thresholds = _mixture_thresholds(stats, source_col, target_frac_pct) \
        .select(source_col, "threshold")
    return (
        df.join(F.broadcast(thresholds), source_col)
        .where(_hash_prefix(id_col, salt)
               < F.format_string(f"%0{_WIDTH}x", F.col("threshold")))
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    n_shards: int = 16,
) -> DataFrame:
    """Seeded pseudo-random shard + position assignment for a training
    epoch — the "global shuffle" a trainer wants, without a global sort.

    Every row gets, as a pure function of (epoch, id):

    - ``shard`` ∈ [0, n_shards): the first hex digit(s) of
      md5('epoch<k>:' || id) — scan-local, no shuffle to decide;
    - ``pos``: the row's rank *within its shard*, ordering by the
      longer hash prefix with the id as final tiebreak.

    Reading shards in index order, each shard in ``pos`` order, yields
    a deterministic permutation of the corpus that is
    indistinguishable-from-random w.r.t. any content attribute, and
    re-deriving it is reproducible across runs, partition layouts, and
    cluster sizes. Changing ``epoch`` re-permutes everything.

    Scale design: the only exchange is hashpartitioning on ``shard``
    and the only sort is *within* a shard (``pos`` is a window
    row_number per shard) — n_shards-way parallel, never a single
    global ordering. Writers then emit one file per shard,
    ``partitionBy("shard")``-style; at 100 TB pick n_shards ≈ the
    write parallelism you want (a power of 16 keeps the digit-prefix
    mapping exactly uniform; other values are rejected rather than
    silently skewed).

    ``n_shards`` must be 16^k for k ≤ 4 so shards map to whole hex
    prefixes (exact equal-probability cells, portable to any engine
    with md5 — no hex→int conversion needed).
    """
    import math

    k = round(math.log(n_shards, 16))
    if 16 ** k != n_shards or not 1 <= k <= _WIDTH:
        raise ValueError(
            f"n_shards must be 16^k for 1 <= k <= {_WIDTH}, got {n_shards}")
    h = F.md5(F.concat(F.lit(f"epoch{epoch}:"),
                       F.col(id_col).cast("string")))
    from pyspark.sql.window import Window

    shard = F.substring(h, 1, k)
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.withColumn("h", F.substring(h, 1, 8))
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        # The 8-hex tiebreak prefix is internal — the contract is the
        # input columns plus (shard, pos) only; a caller's
        # partitionBy("shard") write must not persist it.
        .drop("h")
    )


def write_epoch_shards(
    df: DataFrame,
    id_col: str,
    epoch: int,
    out_dir: str,
    n_shards: int = 16,
    mode: str = "error",
) -> None:
    """Materialize one training epoch as shard-partitioned parquet —
    the consumer half of :func:`epoch_shuffle`'s contract: a trainer
    reads ``shard=<s>/`` directories in index order and streams each
    file start-to-end to see the epoch's global pseudo-random
    permutation in ``pos`` order, with no sort at read time.

    Layout guarantee (tested against the parquet files themselves, not
    the plan): every shard directory holds rows strictly increasing in
    ``pos``. This costs NO exchange beyond epoch_shuffle's own single
    hashpartitioning(shard): the rank window already leaves each Spark
    partition sorted by (shard, tiebreak-hash, id) — which IS
    (shard, pos) order — and a whole shard lands in exactly one task
    (same key, same partition), so the partitionBy writer streams each
    shard's rows into its file already ordered. The explicit
    sortWithinPartitions below just pins that invariant in the plan
    (Catalyst drops the SortExec when child ordering already satisfies
    it) so a future epoch_shuffle refactor cannot silently break the
    on-disk contract.

    At 100 TB: n_shards ≈ desired write/read parallelism (16^k cells
    stay exactly uniform), each shard one task's sequential write —
    no global sort, no driver involvement, and re-running the same
    (epoch, corpus) overwrites to an identical layout.
    """
    (
        epoch_shuffle(df, id_col, epoch, n_shards)
        .sortWithinPartitions("shard", "pos")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(out_dir)
    )


def read_epoch_shards(out_dir: str, columns: list[str] | None = None,
                      batch_rows: int = 65536):
    """The trainer half of the epoch contract: iterate an epoch written
    by :func:`write_epoch_shards` as Arrow record batches in the
    epoch's global permutation order — shards in index order, each
    shard's file streamed start-to-end — VERIFYING the on-disk ordering
    from parquet footers as it goes, without Spark and without a sort.

    Order verification is metadata-only: every row group's ``pos``
    min/max statistics must be disjoint and increasing (within and
    across a shard's files), so a layout broken by a writer regression
    or a post-hoc rewrite fails loudly at read time instead of
    silently de-randomizing the training order. Costs one footer read
    per file; the row data itself streams batch-by-batch
    (``batch_rows`` caps trainer memory; ``columns`` prunes payload
    columns — ``pos`` need not be among them, the check uses footers
    only).

    Yields ``(shard, pyarrow.RecordBatch)`` pairs so a multi-host
    trainer can also shard-split the stream (host i takes shards
    i mod n) while each host still sees its shards in-order.
    """
    import os

    import pyarrow.parquet as pq

    shard_dirs = sorted(
        d for d in os.listdir(out_dir)
        if d.startswith("shard=")
        and os.path.isdir(os.path.join(out_dir, d)))
    if not shard_dirs:
        raise FileNotFoundError(
            f"{out_dir}: no shard=*/ directories — not an epoch layout "
            "written by write_epoch_shards")
    for sd in shard_dirs:
        shard = sd.split("=", 1)[1]
        files = sorted(
            f for f in os.listdir(os.path.join(out_dir, sd))
            if f.endswith(".parquet"))
        prev_max = 0  # pos is 1-based within each shard
        for fname in files:
            path = os.path.join(out_dir, sd, fname)
            pf = pq.ParquetFile(path)
            names = pf.schema_arrow.names
            if "pos" not in names:
                raise ValueError(f"{path}: no 'pos' column — not an "
                                 "epoch shard file")
            pos_idx = names.index("pos")
            md = pf.metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(pos_idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        f"{path} row group {rg}: no pos min/max "
                        "statistics — cannot certify epoch order")
                if st.min != prev_max + 1:
                    raise ValueError(
                        f"{path} row group {rg}: pos starts at "
                        f"{st.min}, expected {prev_max + 1} — shard "
                        f"{shard} is not in epoch order (rewritten or "
                        "corrupted layout?)")
                prev_max = st.max
            yield from ((shard, b) for b in
                        pf.iter_batches(batch_size=batch_rows,
                                        columns=columns))
