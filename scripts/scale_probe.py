"""Scale probe: run the round-3 operators on amplified synthetic data.

Not a pytest (minutes, not seconds) — this is the measured evidence
behind SCALING.md's 100 TB claims. Synthesizes millions of rows in-JVM
(spark.range + hash arithmetic; no Python row generation), times each
operator, and sanity-checks the output invariants.

Usage: python scripts/scale_probe.py [probe ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import re
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def probe_asof(spark):
    """5M purchases as-of-joined to 5M views over 100k users."""
    from gads_etl_spark.operators.temporal import asof_join

    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    left = spark.range(5_000_000).select(
        (F.col("id") % 100_000).alias("user_id"),
        (base + F.make_interval(secs=(F.col("id") % 2_592_000).cast("double"))).alias("ts"),
        F.col("id").alias("event_id"),
    )
    right = spark.range(5_000_000).select(
        (F.col("id") % 100_000).alias("user_id"),
        (base + F.make_interval(secs=((F.col("id") * 7) % 2_592_000).cast("double"))).alias("ts"),
        (F.col("id") % 1000).alias("v"),
    )
    t0 = time.perf_counter()
    out = asof_join(left, right, on="user_id")
    n = out.count()
    dt = time.perf_counter() - t0
    assert n == 5_000_000, n
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    return f"asof_join 5M⋈5M over 100k keys: {dt:.1f}s, rows preserved, no NL join"


def probe_components(spark):
    """1M-edge graph: 100k chains of depth 10 (worst-case propagation)."""
    from gads_etl_spark.operators.graph import connected_components

    edges = (
        spark.range(1_000_000)
        .where(F.col("id") % 10 != 9)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    t0 = time.perf_counter()
    comps = connected_components(edges, max_iter=15)
    n_nodes = comps.count()
    n_comps = comps.select("component").distinct().count()
    dt = time.perf_counter() - t0
    assert n_comps == 100_000, n_comps
    return f"connected_components 900k edges / 100k chains depth-10: {dt:.1f}s, {n_comps} components"


def probe_deep_chain(spark):
    """One 200k-node chain (diameter 200k): converges only because of
    the pointer-jumping step — plain min-label would need 200k rounds."""
    from gads_etl_spark.operators.graph import connected_components

    edges = spark.range(200_000 - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    t0 = time.perf_counter()
    comps = connected_components(edges, max_iter=40)
    n_comps = comps.select("component").distinct().count()
    dt = time.perf_counter() - t0
    assert n_comps == 1, n_comps
    return (f"connected_components single 200k-deep chain: {dt:.1f}s, "
            f"1 component (pointer jumping: ~log2(200k)≈18 rounds, "
            f"min-label alone would need 200k)")


def probe_sampling(spark):
    """Deterministic sample + split over 20M ids."""
    from gads_etl_spark.operators.sampling import (
        deterministic_sample,
        train_val_test_split,
    )

    ids = spark.range(20_000_000).withColumnRenamed("id", "doc_id")
    t0 = time.perf_counter()
    n = deterministic_sample(ids, "doc_id", 0.1).count()
    dt1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    splits = (train_val_test_split(ids, "doc_id").groupBy("split").count().collect())
    dt2 = time.perf_counter() - t0
    rate = n / 20_000_000
    assert 0.099 < rate < 0.101, rate
    total = sum(r["count"] for r in splits)
    assert total == 20_000_000
    return (f"hash sample 20M rows: {dt1:.1f}s (rate {rate:.4f}); "
            f"3-way split: {dt2:.1f}s")


def probe_interval(spark):
    """5M events against 50k bursty intervals via bucketed range join."""
    from gads_etl_spark.operators.temporal import interval_join

    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    events = spark.range(5_000_000).select(
        F.col("id").alias("event_id"),
        (base + F.make_interval(secs=(F.col("id") % 8_640_000).cast("double") / 3.333)).alias("ts"),
    )
    # 50k intervals of ~10 min scattered over the month
    intervals = spark.range(50_000).select(
        (base + F.make_interval(secs=((F.col("id") * 51.84) % 2_592_000))).alias("start_ts"),
    ).withColumn("end_ts", F.col("start_ts") + F.make_interval(mins=F.lit(10.0)))
    t0 = time.perf_counter()
    out = interval_join(events, intervals)
    n = out.count()
    dt = time.perf_counter() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    return f"interval_join 5M events × 50k intervals: {dt:.1f}s, {n} hits, no cartesian"


def probe_packing(spark):
    """Pack 10M docs into token bins across 1000 groups."""
    from gads_etl_spark.operators.sampling import pack_sequences

    docs = spark.range(10_000_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 1000).cast("string").alias("grp"),
        ((F.col("id") * 37) % 900 + 100).alias("n_tokens"),
    )
    t0 = time.perf_counter()
    out = pack_sequences(docs, "n_tokens", budget=8192,
                         partition_col="grp", order_col="doc_id")
    n_bins = out.select("grp", "bin_id").distinct().count()
    dt = time.perf_counter() - t0
    return f"pack_sequences 10M docs / 1000 groups: {dt:.1f}s, {n_bins} bins"


def probe_skew(spark):
    """10M-row fact with a 50%-hot key joined to a 100k-row dim: AQE skew
    split + salted join both beat/match the naive shuffle join."""
    import pyspark.sql.functions as F

    from gads_etl_spark.operators.skew import salted_join

    fact = spark.range(10_000_000).select(
        F.when(F.col("id") % 2 == 0, 7).otherwise(F.col("id") % 100_000).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr"))

    t0 = time.perf_counter()
    n_plain = fact.join(dim, "k").count()
    dt_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_salt = salted_join(fact, dim, on=["k"]).count()
    dt_salt = time.perf_counter() - t0
    assert n_plain == n_salt == 10_000_000
    return (f"skew join 10M rows (50% one key) ⋈ 100k dim: "
            f"AQE-skew {dt_plain:.1f}s vs salted {dt_salt:.1f}s, equal results")


def _synth_docs(spark, n, vocab=1000, doc_len=50):
    """n synthetic docs: deterministic pseudo-random token sequences,
    built JVM-side (no Python row generation)."""
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"), ((F.xxhash64(F.col("id"), F.lit(j)) % vocab + vocab) % vocab).cast("string")
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 20).cast("string")).alias("source"),
        F.concat_ws(" ", *[word(j) for j in range(doc_len)]).alias("text"),
    )


def probe_tfidf_zipf(spark):
    """TF-IDF cosine prefix join on a ZIPFIAN corpus — the realistic
    counterpart to the sf1 fixture's tail-less negative result
    (SCALING.md): with a 1/r vocabulary the prefix terms are rare by
    construction, so the candidate join stays linear. 100k vs 200k docs
    measured back-to-back for the scaling ratio."""
    from gads_etl_spark.operators.dedup import tfidf_cosine_pairs

    def corpus(n, vocab, doc_len=60):
        # Zipf(1) via inverse CDF: u~U[0,1) -> rank = floor(exp(u*ln V)),
        # P(rank=r) ~ 1/(r ln V). All JVM-side expressions.
        m = 1 << 24

        def tok(j):
            u = (((F.xxhash64(F.col("id"), F.lit(j)) % m) + m) % m
                 ).cast("double") / m
            import math
            rank = F.floor(F.exp(u * math.log(float(vocab)))).cast("long")
            return F.concat(F.lit("w"), rank.cast("string"))

        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[tok(j) for j in range(doc_len)]).alias("text"),
        )
        copies = docs.where(F.col("doc_id") < 1000).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        return docs.unionByName(copies).localCheckpoint(eager=True)

    out = []
    times = []
    # vocab grows WITH the corpus (Heaps' law: new documents bring new
    # words) — holding vocab fixed while doubling docs doubles every
    # term's df and makes ANY exact similarity join quadratic, which is
    # the tail-less-fixture result again, not a property of the join.
    for n in (100_000, 200_000):
        docs = corpus(n, vocab=n)
        t0 = time.perf_counter()
        # budget waived: this probe exists to MEASURE the quadratic
        pairs = tfidf_cosine_pairs(docs, threshold=0.6, id_col="doc_id",
                                   candidate_budget=None)
        got = pairs.count()
        dt = time.perf_counter() - t0
        times.append(dt)
        # every planted copy must pair with its source at cos 1.0
        planted = pairs.where(
            (F.col("b_id") - F.col("a_id") == 10_000_000)
            & (F.col("cos_sim") == 1.0)).count()
        assert planted == 1000, planted
        out.append(f"{n // 1000}k docs: {dt:.1f}s, {got} pairs")
    ratio = times[1] / times[0]
    assert ratio < 3.0, f"2x data scaled {ratio:.1f}x — not linear"
    return ("tfidf_cosine on Zipf corpus (Heaps vocab ~ n): "
            + "; ".join(out) + f"; 2x data -> {ratio:.2f}x wall")


def probe_quality(spark):
    """Corpus-quality passes at millions-of-docs scale: redaction (pure
    scan), decontamination (broadcast probe), repetition stats (two-level
    agg), domain mixing (one agg + broadcast rates)."""
    from gads_etl_spark.operators.quality import (
        mix_to_budget, ngram_contamination, redact_pii, repetition_stats,
    )

    docs = _synth_docs(spark, 2_000_000).localCheckpoint()

    t0 = time.perf_counter()
    n_red = redact_pii(docs).where(~F.col("pii_found")).count()
    dt_red = time.perf_counter() - t0
    assert n_red == 2_000_000  # synthetic tokens contain no PII shapes

    eval_df = _synth_docs(spark, 10_000).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "source", "text")
    t0 = time.perf_counter()
    out = ngram_contamination(docs, eval_df, n=8)
    n_cont = out.count()
    dt_cont = time.perf_counter() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan  # train side must not shuffle to join

    t0 = time.perf_counter()
    n_rep = repetition_stats(docs).where(F.col("dup_word_frac") > 0.5).count()
    dt_rep = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_mix = mix_to_budget(
        docs, weights_micro={"s0": 300_000, "s1": 200_000},
        budget_pct=30, default_weight_micro=25_000,
    ).count()
    dt_mix = time.perf_counter() - t0
    assert 0 < n_mix < 2_000_000

    return (f"quality passes over 2M docs (50 tokens each): "
            f"redact {dt_red:.1f}s | decontaminate-vs-10k-evals {dt_cont:.1f}s "
            f"({n_cont} hits, broadcast probe) | repetition {dt_rep:.1f}s "
            f"({n_rep} flagged) | domain-mix {dt_mix:.1f}s ({n_mix} kept)")


def probe_scd2(spark):
    """10M-row changelog over 200k keys -> Type-2 history, one Exchange."""
    from gads_etl_spark.operators.temporal import scd2_history

    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    log = spark.range(10_000_000).select(
        (F.col("id") % 200_000).alias("k"),
        (base + F.make_interval(secs=(F.col("id") / 200_000).cast("double"))).alias("ts"),
        F.col("id").alias("eid"),
        ((F.col("id") * 2654435761) % 5).cast("string").alias("v"),
    )
    t0 = time.perf_counter()
    out = scd2_history(log, "k", "v", "ts", "eid")
    n = out.count()
    dt = time.perf_counter() - t0
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_ex == 1, plan
    return f"scd2_history 10M rows/200k keys: {dt:.1f}s, {n} runs, 1 Exchange"


def probe_compact(spark):
    """256-file sprawl of a 5M-row table compacted to a size target."""
    import shutil
    import tempfile

    from gads_etl_spark.operators.layout import compact_small_files

    d = tempfile.mkdtemp(prefix="compact_probe_")
    try:
        src_p, out_p = f"{d}/sprawl", f"{d}/compacted"
        spark.range(5_000_000).select(
            "id", (F.col("id") * 2).alias("v")
        ).repartition(256).write.parquet(src_p)
        t0 = time.perf_counter()
        n_files = compact_small_files(spark, src_p, out_p, target_bytes=16 << 20)
        dt = time.perf_counter() - t0
        n = spark.read.parquet(out_p).count()
        assert n == 5_000_000, n
        return f"compact 256 files -> {n_files} @16MB target: {dt:.1f}s, rows exact"
    finally:
        shutil.rmtree(d, ignore_errors=True)


def probe_snapshot_diff(spark):
    """10M-key snapshots diffed with constant-width shuffle payload."""
    from gads_etl_spark.operators.cdc import snapshot_diff

    old = spark.range(10_000_000).select(
        F.col("id").alias("k"),
        F.sha1(F.col("id").cast("string")).alias("payload"),
    )
    # arithmetic edits: drop 1/97, revise 1/89 of survivors, add 1/101
    new = old.where(F.col("k") % 97 != 0).select(
        "k",
        F.when(F.col("k") % 89 == 0, F.concat(F.col("payload"), F.lit("!")))
        .otherwise(F.col("payload")).alias("payload"),
    ).unionByName(
        old.where(F.col("k") % 101 == 0)
        .select((F.col("k") + 100_000_000).alias("k"), "payload")
    )
    t0 = time.perf_counter()
    out = snapshot_diff(old, new, ["k"], compare_cols=["payload"])
    counts = {r["change"]: r["n"] for r in
              out.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()}
    dt = time.perf_counter() - t0
    assert counts["removed"] == 10_000_000 // 97 + 1, counts
    assert counts["added"] == 10_000_000 // 101 + 1, counts
    return (f"snapshot_diff 10M vs 10M keys: {dt:.1f}s, "
            f"{sum(counts.values())} delta rows, classification exact")


def probe_vocab(spark):
    """1M docs x 20 tokens -> 50k-token vocabulary, ids without a
    single-partition window."""
    from gads_etl_spark.operators.vocab import assign_dense_ranks, token_counts

    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda j: F.concat(F.lit("t"), F.pmod(
                F.hash(F.col("id") * 23 + j), F.lit(50_000)))
        )).alias("text"),
    )
    t0 = time.perf_counter()
    counts = token_counts(docs)
    ranked = assign_dense_ranks(
        counts, [F.desc("n_occurrences"), F.asc("token")], id_name="token_id")
    stats = ranked.agg(
        F.count(F.lit(1)).alias("v"),
        F.min("token_id").alias("lo"), F.max("token_id").alias("hi"),
        F.count_distinct("token_id").alias("d")).collect()[0]
    dt = time.perf_counter() - t0
    assert stats["lo"] == 0 and stats["hi"] == stats["v"] - 1 == stats["d"] - 1
    return (f"build_vocab 20M tokens -> {stats['v']} vocab: {dt:.1f}s, "
            "ids dense 0..V-1, no single-partition window")


def probe_block_pack(spark):
    """2M pre-encoded docs packed into 2048-token blocks over 64 shards."""
    from gads_etl_spark.operators.sampling import block_pack

    enc = spark.range(2_000_000).select(
        (F.col("id") % 64).alias("shard"),
        F.col("id").alias("doc_id"),
        F.sequence(F.lit(0), F.pmod(F.hash("id"), F.lit(37)) + 1).alias("token_ids"),
    )
    total_tokens = enc.agg(F.sum(F.size("token_ids"))).collect()[0][0]
    t0 = time.perf_counter()
    out = block_pack(enc, 2048, "shard")
    got = out.agg(F.count(F.lit(1)).alias("blocks"),
                  F.sum("n_tokens").alias("toks")).collect()[0]
    dt = time.perf_counter() - t0
    assert got["toks"] == total_tokens, (got["toks"], total_tokens)
    return (f"block_pack {total_tokens} tokens -> {got['blocks']} x2048 blocks "
            f"over 64 shards: {dt:.1f}s, token conservation exact")


def probe_aqe_skew(spark):
    """Prove the AQE skew-split claim: a 90%-hot-key sort-merge join must
    re-plan with SortMergeJoin(skew=true), splitting the hot partition.

    Thresholds are lowered (and broadcast disabled) because at probe
    scale every partition is megabytes — production keeps stock
    thresholds, where the same mechanism engages at executor-hurting
    sizes. The result filter involves BOTH join sides so it cannot push
    below the join (a pushed filter would empty the plan entirely)."""
    CONFS = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    }
    saved = {k: spark.conf.get(k, None) for k in CONFS}
    try:
        for k, v in CONFS.items():
            spark.conf.set(k, v)
        fact = spark.range(5_000_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.sha1(F.col("id").cast("string")).alias("pad"))
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.sha1(F.col("id").cast("string")).alias("w"))
        out = fact.join(dim, "k").where(F.length(F.concat("pad", "w")) > 1000)
        t0 = time.perf_counter()
        rows = out.collect()
        dt = time.perf_counter() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert not rows  # sha1+sha1 is 80 chars; the filter keeps nothing
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, "AQE did not split the hot key"
        assert "skewed" in plan
        return (f"AQE skew join 5M rows, 90% one key: {dt:.1f}s, "
                "SortMergeJoin(skew=true) + skewed AQEShuffleRead in final plan")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def probe_simhash_radius(spark):
    """1M docs through signature + pigeonhole chunk join; 1k planted
    copies must all surface at hamming 0."""
    from gads_etl_spark.operators.dedup import simhash_radius_pairs

    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(
            F.sequence(F.lit(1), F.lit(20)),
            lambda j: F.concat(F.lit("w"), F.pmod(
                F.hash(F.col("id") * 31 + j), F.lit(40_000)))
        )).alias("text"),
    )
    copies = docs.where(F.col("doc_id") < 1_000).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    t0 = time.perf_counter()
    pairs = simhash_radius_pairs(docs.unionByName(copies), radius=3)
    planted = pairs.where(
        (F.col("b_id") - F.col("a_id") == 10_000_000)
        & (F.col("hamming") == 0)).count()
    dt = time.perf_counter() - t0
    assert planted == 1_000, planted
    return (f"simhash_radius 1M docs + 1k copies, radius 3: {dt:.1f}s, "
            "all 1000 planted pairs recovered at hamming 0")


def probe_state_ledger(spark):
    """Fleet-sized control ledger (round-12): 10M logical partitions in
    a 64-bucket versioned table — turns the O(|Δ| + |table|/n_buckets)
    MERGE claim and the bucket-pruned point lookup from argued to
    measured, and verifies untouched-bucket byte-identity at size."""
    import hashlib
    import shutil
    import tempfile
    from datetime import date, datetime
    from pathlib import Path

    from gads_etl_spark.pipeline.keys import LOGICAL_KEY
    from gads_etl_spark.pipeline.state_store import (
        STATE_SCHEMA, _VersionedTable)

    root = tempfile.mkdtemp(prefix="ledger_probe_")
    n, n_buckets = 10_000_000, 64
    t = _VersionedTable(spark, root, STATE_SCHEMA, key_cols=LOGICAL_KEY,
                        n_buckets=n_buckets)

    # id -> (id%5, (id//5)%10000, (id//50000)%200) is a bijection on
    # [0, 10M): exactly 10M unique logical keys, no Python row gen.
    def _rows(ids, status_expr):
        return ids.select(
            F.concat(F.lit("src"), (F.col("id") % 5).cast("string")
                     ).alias("source"),
            F.concat(F.lit("c"), ((F.col("id") / 5).cast("long") % 10000)
                     .cast("string")).alias("customer_id"),
            F.concat(F.lit("q"), ((F.col("id") / 50000).cast("long") % 200)
                     .cast("string")).alias("query_name"),
            F.lit(date(2024, 1, 1)).alias("logical_date"),
            status_expr.alias("status"),
            F.lit("run-1").alias("current_run_id"),
            F.lit("v1").alias("schema_version"),
            F.col("id").alias("record_count"),
            F.lit(datetime(2024, 3, 1)).cast("timestamp").alias("updated_at"),
            F.lit(None).cast("string").alias("error_message"),
            F.lit(1).alias("attempt_count"),
        )

    tri = (F.when(F.col("id") % 3 == 0, "pending")
           .when(F.col("id") % 3 == 1, "success").otherwise("failed"))
    t0 = time.perf_counter()
    t.commit(_rows(spark.range(n), tri))
    t_commit = time.perf_counter() - t0

    # Point lookup: full-scan filter vs the bucket-pruned path.
    # id = 123456 -> (123456 % 5, (123456//5) % 10000, (123456//50000) % 200)
    key = ("src1", "c4691", "q2", date(2024, 1, 1))
    preds = lambda df: df.where(  # noqa: E731
        (F.col("source") == key[0]) & (F.col("customer_id") == key[1])
        & (F.col("query_name") == key[2])
        & (F.col("logical_date") == F.lit(key[3])))
    t0 = time.perf_counter()
    full_hit = preds(t.read()).collect()
    t_scan_lookup = time.perf_counter() - t0
    t0 = time.perf_counter()
    pruned_hit = preds(t.read_bucket_for(key)).collect()
    t_pruned_lookup = time.perf_counter() - t0
    assert len(full_hit) == len(pruned_hit) == 1
    assert full_hit[0] == pruned_hit[0]

    # 1%-of-keys MERGE: 100k random-hashing keys touch all 64 buckets —
    # the documented worst case (rewrite ~= |table| when Δ >> n_buckets).
    upd_bulk = _rows(spark.range(n).where(F.col("id") % 100 == 0),
                     F.lit("success"))
    t0 = time.perf_counter()
    t.merge(upd_bulk)
    t_merge_bulk = time.perf_counter() - t0

    # Contract-size batch: 3 keys touch <=3 of 64 buckets — the
    # O(|Δ| + |table|/n_buckets) case. Snapshot untouched-bucket bytes
    # first so byte-identity is verified at size, not just by path.
    parent = t._current_manifest()
    small_ids = spark.range(3)
    touched = t._touched_buckets(_rows(small_ids, F.lit("x")))
    untouched = [b for b in map(str, range(n_buckets))
                 if b in parent["buckets"] and int(b) not in touched][:3]

    def _dir_digest(path):
        h = hashlib.sha256()
        for p in sorted(Path(path).rglob("*")):
            if p.is_file():
                h.update(p.name.encode())
                h.update(p.read_bytes())
        return h.hexdigest()

    before = {b: _dir_digest(parent["buckets"][b]) for b in untouched}
    t0 = time.perf_counter()
    t.merge(_rows(small_ids, F.lit("failed")))
    t_merge_small = time.perf_counter() - t0
    after_manifest = t._current_manifest()
    for b in untouched:
        assert after_manifest["buckets"][b] == parent["buckets"][b], (
            f"untouched bucket {b} was rewritten")
        assert _dir_digest(after_manifest["buckets"][b]) == before[b], (
            f"untouched bucket {b} bytes changed")
    assert sorted(map(int, (set(after_manifest["buckets"])
                            - {b for b in parent["buckets"]
                               if after_manifest["buckets"][b]
                               == parent["buckets"][b]}))) == touched

    n_now = t.read().count()
    assert n_now == n, n_now
    n_success = t.read().where(F.col("status") == "success").count()

    # Time travel: the pre-merge version is still a complete table.
    v1 = t.history()[0]
    t0 = time.perf_counter()
    n_v1 = t.read_version(v1).count()
    t_travel = time.perf_counter() - t0
    assert n_v1 == n

    t0 = time.perf_counter()
    dropped = t.vacuum(keep=1, retention_ms=0)
    t_vacuum = time.perf_counter() - t0
    assert dropped == 2 and t.read().count() == n
    shutil.rmtree(root)
    return (
        f"state_ledger 10M rows / {n_buckets} buckets: commit {t_commit:.1f}s; "
        f"lookup full-scan {t_scan_lookup:.2f}s vs bucket-pruned "
        f"{t_pruned_lookup:.2f}s ({t_scan_lookup / t_pruned_lookup:.1f}x); "
        f"MERGE 100k keys (all buckets) {t_merge_bulk:.1f}s vs 3 keys "
        f"({len(touched)} buckets) {t_merge_small:.1f}s "
        f"({t_merge_bulk / t_merge_small:.1f}x); time-travel count "
        f"{t_travel:.1f}s; vacuum {t_vacuum:.1f}s; untouched buckets "
        f"byte-identical; {n_success} success rows post-merge"
    )


PROBES = {
    "asof": probe_asof,
    "components": probe_components,
    "deep_chain": probe_deep_chain,
    "sampling": probe_sampling,
    "interval": probe_interval,
    "packing": probe_packing,
    "skew": probe_skew,
    "quality": probe_quality,
    "scd2": probe_scd2,
    "compact": probe_compact,
    "snapshot_diff": probe_snapshot_diff,
    "vocab": probe_vocab,
    "block_pack": probe_block_pack,
    "aqe_skew": probe_aqe_skew,
    "simhash_radius": probe_simhash_radius,
    "tfidf_zipf": probe_tfidf_zipf,
    "state_ledger": probe_state_ledger,
}


def main() -> int:
    from gads_etl_spark.session import get_session

    spark = get_session("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        print(PROBES[name](spark), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
