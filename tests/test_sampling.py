"""Unit tests for deterministic sampling / splitting / packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from gads_etl_spark.operators.sampling import (
    deterministic_sample,
    pack_sequences,
    stratified_hash_sample,
    train_val_test_split,
)


def _ids(spark, n=2000, parts=4):
    return spark.range(0, n, 1, parts).withColumnRenamed("id", "doc_id")


class TestDeterministicSample:
    def test_rate_within_tolerance(self, spark):
        n = deterministic_sample(_ids(spark), "doc_id", 0.25).count()
        assert 0.20 * 2000 < n < 0.30 * 2000

    def test_partitioning_invariant(self, spark):
        # Same ids, wildly different physical layout → identical members.
        a = deterministic_sample(_ids(spark, parts=1), "doc_id", 0.3)
        b = deterministic_sample(_ids(spark, parts=13), "doc_id", 0.3)
        assert sorted(r[0] for r in a.collect()) == sorted(r[0] for r in b.collect())

    def test_monotone_in_rate(self, spark):
        # A 10% sample is a subset of the 30% sample (hash-range nesting).
        small = {r[0] for r in deterministic_sample(_ids(spark), "doc_id", 0.1).collect()}
        big = {r[0] for r in deterministic_sample(_ids(spark), "doc_id", 0.3).collect()}
        assert small <= big

    def test_rate_one_keeps_everything(self, spark):
        assert deterministic_sample(_ids(spark), "doc_id", 1.0).count() == 2000

    def test_rate_zero_keeps_nothing(self, spark):
        assert deterministic_sample(_ids(spark), "doc_id", 0.0).count() == 0


class TestSplit:
    def test_exclusive_and_exhaustive(self, spark):
        out = train_val_test_split(_ids(spark), "doc_id")
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 2000
        assert 0.74 < counts["train"] / 2000 < 0.86
        assert counts["val"] > 0 and counts["test"] > 0

    def test_membership_stable_under_corpus_growth(self, spark):
        # Adding rows never moves an existing row between splits.
        before = {r["doc_id"]: r["split"]
                  for r in train_val_test_split(_ids(spark, 500), "doc_id").collect()}
        after = {r["doc_id"]: r["split"]
                 for r in train_val_test_split(_ids(spark, 2000), "doc_id").collect()}
        assert all(after[k] == v for k, v in before.items())


class TestStratified:
    def test_rates_per_stratum(self, spark):
        df = _ids(spark, 3000).withColumn(
            "src", F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string"))
        )
        out = stratified_hash_sample(df, "doc_id", "src",
                                     rates={"s0": 1.0, "s1": 0.5}, default_rate=0.0)
        counts = {r["src"]: r["n"] for r in
                  out.groupBy("src").agg(F.count("*").alias("n")).collect()}
        assert counts["s0"] == 1000           # kept whole
        assert 400 < counts["s1"] < 600       # ≈ half
        assert "s2" not in counts             # default 0 → dropped


class TestPacking:
    def test_bins_respect_budget(self, spark):
        # 40 docs of 300 tokens, one group → budget 1000 fits 3-4 per bin;
        # consecutive ids share bins, totals never exceed budget + one doc.
        df = (spark.range(40).withColumnRenamed("id", "doc_id")
              .withColumn("grp", F.lit("g"))
              .withColumn("n_tokens", F.lit(300)))
        out = pack_sequences(df, "n_tokens", budget=1000,
                             partition_col="grp", order_col="doc_id")
        bins = (out.groupBy("bin_id").agg(F.sum("n_tokens").alias("tok"),
                                          F.count("*").alias("n")).collect())
        for r in bins:
            assert r["tok"] <= 1000 + 300     # last doc may straddle
        assert sum(r["n"] for r in bins) == 40

    def test_oversized_doc_gets_own_jump(self, spark):
        df = spark.createDataFrame(
            [("g", 1, 100), ("g", 2, 5000), ("g", 3, 100)],
            "grp string, doc_id long, n_tokens long",
        )
        out = {r["doc_id"]: r["bin_id"] for r in
               pack_sequences(df, "n_tokens", 1000, "grp", "doc_id").collect()}
        assert out[1] == 0 and out[2] == 0    # starts in bin 0
        assert out[3] == 5                    # cumsum jumped past bins 1-4

    def test_bins_never_span_partitions(self, spark):
        df = (spark.range(100).withColumnRenamed("id", "doc_id")
              .withColumn("grp", (F.col("doc_id") % 4).cast("string"))
              .withColumn("n_tokens", F.lit(250)))
        out = pack_sequences(df, "n_tokens", 1000, "grp", "doc_id")
        per = (out.groupBy("grp", "bin_id").agg(F.count("*").alias("n"))
               .groupBy("grp").agg(F.max("n").alias("mx")).collect())
        for r in per:
            assert r["mx"] <= 4               # 4 × 250 = budget


class TestBlockPack:
    """GPT-style contiguous packing: documents split across block
    boundaries; per shard, every block is full except the last."""

    def _pack(self, spark, rows, block_size=4):
        from gads_etl_spark.operators.sampling import block_pack

        df = spark.createDataFrame(
            rows, "shard long, doc_id long, token_ids array<long>")
        return {
            (r["shard"], r["block_id"]): r["token_ids"]
            for r in block_pack(df, block_size, "shard").collect()
        }

    def test_straddle_and_order(self, spark):
        got = self._pack(spark, [
            (0, 1, [1, 2, 3]),
            (0, 2, [4, 5, 6]),      # 4,5 finish block 0; 6 starts block 1
            (0, 3, [7]),
        ])
        assert got == {(0, 0): [1, 2, 3, 4], (0, 1): [5, 6, 7]}

    def test_giant_doc_spans_many_blocks(self, spark):
        got = self._pack(spark, [(0, 1, list(range(10)))], block_size=3)
        assert got == {(0, 0): [0, 1, 2], (0, 1): [3, 4, 5],
                       (0, 2): [6, 7, 8], (0, 3): [9]}

    def test_shards_independent(self, spark):
        got = self._pack(spark, [
            (0, 1, [1, 2]), (1, 2, [9, 9, 9, 9, 9]),
        ])
        assert got == {(0, 0): [1, 2], (1, 0): [9, 9, 9, 9],
                       (1, 1): [9]}

    def test_empty_docs_dropped(self, spark):
        got = self._pack(spark, [(0, 1, []), (0, 2, [5])])
        assert got == {(0, 0): [5]}

    def test_all_blocks_full_except_last(self, spark):
        from gads_etl_spark.operators.sampling import block_pack

        rows = [(int(i % 3), int(i), [int(i)] * int(1 + i % 7))
                for i in range(60)]
        df = spark.createDataFrame(
            rows, "shard long, doc_id long, token_ids array<long>")
        out = block_pack(df, 16, "shard").collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(
                (r["block_id"], r["n_tokens"]))
        for shard, blocks in by_shard.items():
            blocks.sort()
            ids = [b for b, _ in blocks]
            assert ids == list(range(len(ids)))     # contiguous block ids
            assert all(n == 16 for _, n in blocks[:-1])
            assert 1 <= blocks[-1][1] <= 16
        # token conservation: nothing lost or duplicated
        assert sum(n for bs in by_shard.values() for _, n in bs) == \
            sum(len(r[2]) for r in rows)


class TestPpsSample:
    def _df(self, spark):
        rows = [(i, 1 + (i * 7) % 50) for i in range(400)]
        return spark.createDataFrame(rows, "id long, w long")

    def test_matches_python_model_exactly(self, spark):
        """Inclusion is pure md5/integer arithmetic — a Python replica
        must agree row for row, not just in expectation."""
        import hashlib

        from gads_etl_spark.operators.sampling import pps_sample

        df = self._df(spark)
        rows = [(r["id"], r["w"]) for r in df.collect()]
        total = float(sum(w for _, w in rows))
        expect = set()
        for i, w in rows:
            p = min(1.0, 100.0 * float(w) / total)
            t = int(p * float(2 ** 48))
            h = hashlib.md5(f"pps{i}".encode()).hexdigest()[:12]
            if p >= 1.0 or h < format(t, "012x"):
                expect.add(i)
        got = {r["id"] for r in pps_sample(df, 100, "w", "id").collect()}
        assert got == expect

    def test_expected_size_in_band(self, spark):
        from gads_etl_spark.operators.sampling import pps_sample

        n = pps_sample(self._df(spark), 100, "w", "id").count()
        # E=100, sd=sqrt(sum p(1-p)) < 10 → ±40 is a >4σ band
        assert 60 <= n <= 140

    def test_cap_branch_always_includes(self, spark):
        from gads_etl_spark.operators.sampling import pps_sample

        df = spark.createDataFrame(
            [(1, 1_000_000), (2, 1), (3, 1)], "id long, w long")
        got = pps_sample(df, 2, "w", "id")
        rows = {r["id"]: r["inclusion_p"] for r in got.collect()}
        assert rows.get(1) == 1.0  # dominant weight capped and kept

    def test_nonpositive_weights_excluded(self, spark):
        from gads_etl_spark.operators.sampling import pps_sample

        df = spark.createDataFrame(
            [(1, 100), (2, 0), (3, -5), (4, None)], "id long, w long")
        got = {r["id"] for r in pps_sample(df, 1, "w", "id").collect()}
        assert got <= {1}

    def test_layout_invariance(self, spark):
        from gads_etl_spark.operators.sampling import pps_sample

        df = self._df(spark)
        a = {r["id"] for r in pps_sample(df, 80, "w", "id").collect()}
        b = {r["id"] for r in
             pps_sample(df.repartition(17, "id"), 80, "w", "id").collect()}
        assert a == b

    def test_zero_total_raises(self, spark):
        import pytest as _pytest

        from gads_etl_spark.operators.sampling import pps_sample

        df = spark.createDataFrame([(1, 0)], "id long, w long")
        with _pytest.raises(ValueError, match="must be positive"):
            pps_sample(df, 10, "w", "id")


class TestBalancedSample:
    def test_equal_n_and_small_groups_whole(self, spark):
        from gads_etl_spark.operators.sampling import balanced_sample

        rows = ([(i, "big") for i in range(100)]
                + [(1000 + i, "small") for i in range(5)])
        df = spark.createDataFrame(rows, "id long, cls string")
        out = balanced_sample(df, "cls", 20, "id")
        sizes = {r["cls"]: r["n"] for r in
                 out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert sizes == {"big": 20, "small": 5}

    def test_layout_invariant_membership(self, spark):
        from gads_etl_spark.operators.sampling import balanced_sample

        df = spark.createDataFrame(
            [(i, f"c{i % 3}") for i in range(90)], "id long, cls string")
        a = {r["id"] for r in balanced_sample(df, "cls", 10, "id").collect()}
        b = {r["id"] for r in balanced_sample(
            df.repartition(11, "id"), "cls", 10, "id").collect()}
        assert a == b and len(a) == 30

    def test_hash_order_not_id_order(self, spark):
        from gads_etl_spark.operators.sampling import balanced_sample

        df = spark.createDataFrame(
            [(i, "x") for i in range(200)], "id long, cls string")
        kept = sorted(r["id"] for r in balanced_sample(df, "cls", 30, "id").collect())
        assert kept != list(range(30))  # an unbiased draw, not the head


class TestTemperatureMixture:
    def _corpus(self, spark):
        # Pathologically imbalanced: 9000 'big' vs 90 'small' docs.
        rows = [(i, "big") for i in range(9000)] + \
               [(i + 9000, "small") for i in range(90)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_thresholds_are_exact_integers(self, spark):
        from gads_etl_spark.operators.sampling import (
            temperature_mixture_sample)

        df = self._corpus(spark)
        th = {r.source: r.threshold for r in
              temperature_mixture_sample(df, target_frac_pct=25)
              .select("source", "threshold").distinct().collect()}
        # Hand-derived: w_big=isqrt(9000)=94, w_small=isqrt(90)=9,
        # N=9090, W=103; T_s = (65536*25*N*w_s) // (100*W*n_s).
        assert th["big"] == (65536 * 25 * 9090 * 94) // (100 * 103 * 9000)
        # The small source's raw rate exceeds 1 (α=0.5 wants MORE of it
        # than it has) → clamped to the max expressible bucket.
        assert (65536 * 25 * 9090 * 9) // (100 * 103 * 90) > 65535
        assert th["small"] == 65535

    def test_alpha_half_rebalances_toward_small_sources(self, spark):
        from gads_etl_spark.operators.sampling import (
            temperature_mixture_sample)

        df = self._corpus(spark)
        got = {r.source: r.n for r in
               temperature_mixture_sample(df, target_frac_pct=25)
               .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
        # Proportional sampling would keep 25% of each (2250 / 22.5);
        # α=0.5 keeps the small source at a ~10× higher RATE than the
        # big one (sqrt compression: rate ∝ w_s/n_s ∝ 1/sqrt(n_s)).
        rate_big, rate_small = got["big"] / 9000, got["small"] / 90
        assert rate_small > 4 * rate_big
        # ... while total stays near the 25% target.
        total = got["big"] + got["small"]
        assert abs(total - 0.25 * 9090) < 0.05 * 9090

    def test_thresholds_survive_planet_scale_counts(self, spark):
        # Regression: the threshold numerator B·pct·N·w_s is ≈5.2e19 for
        # a single 1e9-row source — past int64 — and ≈2e33 at a 1e15-row
        # corpus. The old bigint expression wrapped silently (non-ANSI),
        # handing the LARGEST source a negative threshold, i.e. dropping
        # it from the mixture. decimal(38,0) arithmetic must reproduce
        # Python's exact big-int result at any realistic magnitude.
        import math

        from gads_etl_spark.operators.sampling import _mixture_thresholds

        counts = {"web": 10**15, "code": 3 * 10**9, "books": 5 * 10**6,
                  "wiki": 70_000}
        stats = spark.createDataFrame(
            [(s, n) for s, n in counts.items()], "source string, _n_s long")
        got = {r.source: r.threshold for r in
               _mixture_thresholds(stats, "source", 25).collect()}
        w = {s: math.isqrt(n) for s, n in counts.items()}
        n_tot, w_tot = sum(counts.values()), sum(w.values())
        for s, n_s in counts.items():
            expect = min((65536 * 25 * n_tot * w[s]) // (100 * w_tot * n_s),
                         65535)
            assert got[s] == expect, s
        # The giant source's threshold is small but POSITIVE (sampled,
        # not wrapped away), and smaller sources get larger thresholds.
        assert 0 < got["web"] < got["code"] <= got["books"] <= 65535

    def test_membership_is_deterministic_and_layout_invariant(self, spark):
        from gads_etl_spark.operators.sampling import (
            temperature_mixture_sample)

        df = self._corpus(spark)
        a = sorted(r.doc_id for r in
                   temperature_mixture_sample(df).select("doc_id").collect())
        b = sorted(r.doc_id for r in
                   temperature_mixture_sample(df.repartition(13))
                   .select("doc_id").collect())
        assert a == b and len(a) > 0


class TestEpochShuffle:
    def _docs(self, spark, n=300):
        return spark.range(n).withColumnRenamed("id", "doc_id")

    def test_every_row_assigned_positions_contiguous(self, spark):
        from gads_etl_spark.operators.sampling import epoch_shuffle

        out = epoch_shuffle(self._docs(spark), "doc_id", epoch=1).collect()
        assert len(out) == 300
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    def test_epoch_changes_permutation_membership_not(self, spark):
        from gads_etl_spark.operators.sampling import epoch_shuffle

        docs = self._docs(spark)
        e1 = {r["doc_id"]: (r["shard"], r["pos"])
              for r in epoch_shuffle(docs, "doc_id", epoch=1).collect()}
        e2 = {r["doc_id"]: (r["shard"], r["pos"])
              for r in epoch_shuffle(docs, "doc_id", epoch=2).collect()}
        assert set(e1) == set(e2)
        assert sum(e1[d] != e2[d] for d in e1) > 250  # nearly all move

    def test_deterministic_under_repartition(self, spark):
        from gads_etl_spark.operators.sampling import epoch_shuffle

        docs = self._docs(spark)
        a = sorted(map(tuple, epoch_shuffle(docs.coalesce(1), "doc_id", 3)
                       .collect()))
        b = sorted(map(tuple, epoch_shuffle(docs.repartition(11), "doc_id", 3)
                       .collect()))
        assert a == b

    def test_output_schema_is_input_plus_shard_pos(self, spark):
        # Contract: no internal columns leak (the 8-hex tiebreak
        # prefix stays inside the operator).
        from gads_etl_spark.operators.sampling import epoch_shuffle

        out = epoch_shuffle(self._docs(spark, 10), "doc_id", epoch=1)
        assert out.columns == ["doc_id", "shard", "pos"]

    def test_shards_reasonably_balanced(self, spark):
        from gads_etl_spark.operators.sampling import epoch_shuffle

        out = epoch_shuffle(self._docs(spark, 1600), "doc_id", 5,
                            n_shards=16).groupBy("shard").count().collect()
        sizes = [r["count"] for r in out]
        assert len(sizes) == 16
        assert max(sizes) < 3 * min(sizes)

    def test_rejects_non_power_of_16(self, spark):
        import pytest as _pytest

        from gads_etl_spark.operators.sampling import epoch_shuffle

        for bad in (0, 8, 24, 16 ** 5):
            with _pytest.raises(ValueError):
                epoch_shuffle(self._docs(spark, 1), "doc_id", 1, n_shards=bad)


class TestWriteEpochShards:
    def test_on_disk_layout_each_shard_file_pos_ordered(self, spark, tmp_path):
        # The trainer-facing contract, checked against the parquet FILES
        # (pyarrow, no Spark read): one shard=<s>/ dir per hex shard,
        # each file's pos column strictly increasing start-to-end, and
        # the union of shards is exactly the input corpus.
        import pyarrow.parquet as pq

        from gads_etl_spark.operators.sampling import (epoch_shuffle,
                                                       write_epoch_shards)

        docs = spark.range(1200).withColumnRenamed("id", "doc_id") \
            .repartition(7)
        out = str(tmp_path / "epoch1")
        write_epoch_shards(docs, "doc_id", epoch=1, out_dir=out)

        shard_dirs = sorted(p for p in (tmp_path / "epoch1").iterdir()
                            if p.name.startswith("shard="))
        assert len(shard_dirs) == 16
        seen_ids = []
        for sd in shard_dirs:
            files = sorted(sd.glob("*.parquet"))
            # a whole shard lands in one task -> one file per shard
            assert len(files) == 1, sd.name
            t = pq.read_table(files[0])
            pos = t.column("pos").to_pylist()
            assert pos == sorted(pos) and len(set(pos)) == len(pos), sd.name
            assert pos[0] == 1 and pos[-1] == len(pos), sd.name
            seen_ids += t.column("doc_id").to_pylist()
        assert sorted(seen_ids) == list(range(1200))

        # Reading shards in order replays exactly epoch_shuffle's
        # permutation (the write changed layout, never assignment).
        expect = {(r["shard"], r["pos"]): r["doc_id"]
                  for r in epoch_shuffle(docs, "doc_id", 1).collect()}
        got = {}
        for sd in shard_dirs:
            s = sd.name.split("=", 1)[1]
            t = pq.read_table(next(iter(sd.glob("*.parquet"))))
            for i, d in zip(t.column("pos").to_pylist(),
                            t.column("doc_id").to_pylist()):
                got[(s, i)] = d
        assert got == expect

    def test_read_epoch_shards_round_trip(self, spark, tmp_path):
        """write → read closes the trainer loop: concatenating the
        reader's batches (shards in index order, each in-order) must
        replay exactly epoch_shuffle's global permutation."""
        from gads_etl_spark.operators.sampling import (epoch_shuffle,
                                                       read_epoch_shards,
                                                       write_epoch_shards)

        docs = spark.range(1200).withColumnRenamed("id", "doc_id") \
            .repartition(5)
        out = str(tmp_path / "epoch3")
        write_epoch_shards(docs, "doc_id", epoch=3, out_dir=out)

        got = []
        for shard, batch in read_epoch_shards(out, batch_rows=100):
            ids = batch.column("doc_id").to_pylist()
            got += [(shard, i) for i in ids]
        want = [(r["shard"], r["doc_id"])
                for r in epoch_shuffle(docs, "doc_id", 3)
                .orderBy("shard", "pos").collect()]
        assert got == want

        # column pruning: pos need not be read for the order check
        only_ids = [i for _, b in read_epoch_shards(out, columns=["doc_id"])
                    for i in b.column("doc_id").to_pylist()]
        assert only_ids == [i for _, i in got]

    def test_read_epoch_shards_rejects_disordered_layout(self, tmp_path):
        """A shard file NOT in pos order (e.g. rewritten by a generic
        compactor) must fail the footer check, not silently de-randomize
        the epoch."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pytest as _pytest

        from gads_etl_spark.operators.sampling import read_epoch_shards

        sd = tmp_path / "bad" / "shard=0"
        sd.mkdir(parents=True)
        t = pa.table({"doc_id": [3, 1, 2], "pos": [3, 1, 2]})
        pq.write_table(t, sd / "part-0.parquet", row_group_size=1)
        with _pytest.raises(ValueError, match="not in epoch order"):
            list(read_epoch_shards(str(tmp_path / "bad")))

    def test_write_plan_adds_no_exchange_beyond_shard_partitioning(
            self, spark):
        # sortWithinPartitions is belt-and-braces: the rank window's
        # (shard, h, id) sort already satisfies it, so the plan keeps
        # exactly ONE exchange (hashpartitioning on shard).
        from gads_etl_spark.operators.sampling import epoch_shuffle

        df = (epoch_shuffle(spark.range(100)
                            .withColumnRenamed("id", "doc_id"),
                            "doc_id", 2)
              .sortWithinPartitions("shard", "pos"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
