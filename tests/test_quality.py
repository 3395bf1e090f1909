"""Unit tests for corpus-quality operators (PII redaction,
decontamination, repetition metrics, budget-constrained domain mixing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gads_etl_spark.operators.quality import (
    mix_to_budget,
    ngram_contamination,
    redact_pii,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRedactPii:
    def test_each_pattern_redacts(self, spark):
        rows = [
            (1, "write to alice.smith+x@corp.example.org today"),
            (2, "call 415-555-1234 or 415.555.9876"),
            (3, "ssn is 123-45-6789 ok"),
            (4, "server at 192.168.1.250 down"),
            (5, "nothing sensitive here"),
        ]
        got = {r["doc_id"]: r for r in redact_pii(_docs(spark, rows)).collect()}
        assert got[1]["clean_text"] == "write to [EMAIL] today"
        assert got[1]["n_email"] == 1 and got[1]["pii_found"]
        assert got[2]["clean_text"] == "call [PHONE] or [PHONE]"
        assert got[2]["n_phone"] == 2
        assert got[3]["clean_text"] == "ssn is [SSN] ok"
        assert got[4]["clean_text"] == "server at [IP] down"
        assert got[5]["clean_text"] == rows[4][1]
        assert not got[5]["pii_found"]
        assert got[5]["n_email"] == got[5]["n_phone"] == 0

    def test_phone_not_double_counted_as_ssn(self, spark):
        # 3-3-4 must be consumed by the phone pattern, leaving no 3-2-4 hit.
        rows = [(1, "a 650-555-0000 b 111-22-3333 c")]
        r = redact_pii(_docs(spark, rows)).collect()[0]
        assert r["n_phone"] == 1 and r["n_ssn"] == 1
        assert r["clean_text"] == "a [PHONE] b [SSN] c"


class TestNgramContamination:
    def test_exact_copy_flagged(self, spark):
        eval_df = _docs(spark, [(100, "a b c d e f g h i j")])
        train = _docs(spark, [
            (1, "a b c d e f g h i j"),     # exact copy → max overlap
            (2, "a b c d e f x y z w"),     # shares leading 8-gram? no (needs 8 contiguous)
            (3, "p q r s t u v w x y"),     # disjoint
        ])
        got = {r["doc_id"]: r["n_overlap"]
               for r in ngram_contamination(train, eval_df, n=8).collect()}
        assert got[1] == 3  # 10 tokens → 3 distinct 8-grams
        assert 2 not in got and 3 not in got

    def test_partial_window_overlap(self, spark):
        eval_df = _docs(spark, [(100, "a b c d e")])
        train = _docs(spark, [(1, "z a b c d e z"), (2, "a b c x d e")])
        got = {r["doc_id"]: r["n_overlap"]
               for r in ngram_contamination(train, eval_df, n=4).collect()}
        assert got[1] == 2  # "a b c d" and "b c d e"
        assert 2 not in got


class TestRepetitionStats:
    def test_repetitive_vs_diverse(self, spark):
        rows = [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
        ]
        got = {r["doc_id"]: r for r in repetition_stats(_docs(spark, rows)).collect()}
        assert got[1]["dup_word_frac"] > 0.8
        assert got[1]["top_2gram_frac"] == 1.0  # all 2-grams are "spam spam"
        assert got[2]["dup_word_frac"] == 0.0
        assert abs(got[2]["top_2gram_frac"] - 0.2) < 1e-12  # 1 of 5 distinct
        assert got[1]["n_2grams"] == 5 and got[1]["top_2gram_count"] == 5

    def test_single_token_doc(self, spark):
        got = repetition_stats(_docs(spark, [(1, "solo")])).collect()[0]
        assert got["n_2grams"] == 0
        assert got["top_2gram_frac"] is None
        assert got["dup_word_frac"] == 0.0


class TestMixToBudget:
    def _corpus(self, spark, n=4000):
        # 4 sources, 10 tokens per doc, n/4 docs each.
        return (
            spark.range(0, n, 1, 8)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
                F.lit("w w w w w w w w w w").alias("text"),
            )
        )

    def test_rates_and_budget(self, spark):
        df = self._corpus(spark)
        kept = mix_to_budget(
            df, weights_micro={"src0": 500_000, "src1": 250_000},
            budget_pct=40, default_weight_micro=100_000,
        )
        rates = {r["source"]: r["rate_micro"]
                 for r in kept.select("source", "rate_micro").distinct().collect()}
        # budget = 40% of 40k tokens = 16k; src0 = 50% of budget = 8k tokens
        # over a 10k-token stratum → rate 0.8; src1 → 0.4; default → 0.16.
        assert rates["src0"] == 800_000
        assert rates["src1"] == 400_000
        assert rates["src2"] == rates["src3"] == 160_000
        counts = {r["source"]: r["n"]
                  for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["src0"] - 800) < 80
        assert abs(counts["src1"] - 400) < 60
        assert abs(counts["src2"] - 160) < 50

    def test_oversubscribed_clamps_to_all(self, spark):
        df = self._corpus(spark, n=400)
        kept = mix_to_budget(
            df, weights_micro={"src0": 1_000_000}, budget_pct=100,
            default_weight_micro=0,
        )
        by_src = {r["source"]: r["n"]
                  for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # src0 asks for 100% of a 100% budget → rate clamps to 1e6, keeps all.
        assert by_src["src0"] == 100
        assert set(by_src) == {"src0"}  # zero-weight sources drop entirely

    def test_deterministic_across_layouts(self, spark):
        a = mix_to_budget(self._corpus(spark).repartition(1),
                          weights_micro={"src0": 400_000}, budget_pct=30,
                          default_weight_micro=50_000)
        b = mix_to_budget(self._corpus(spark).repartition(17),
                          weights_micro={"src0": 400_000}, budget_pct=30,
                          default_weight_micro=50_000)
        assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == \
               sorted(r["doc_id"] for r in b.select("doc_id").collect())


class TestRedactionProperties:
    def test_redaction_is_idempotent(self, spark):
        # Placeholders contain no digits or '@', so a second pass can
        # never re-match: redact(redact(x)) == redact(x). This is the
        # property that makes the pass safe to re-run over a partially
        # cleaned corpus (reruns, backfills).
        import random

        rng = random.Random(7)
        pieces = ["foo", "a@b.co", "555-123-4567", "1.2.3.4", "987-65-4321",
                  "x" * 5, "bar baz", "9.9.9.9", "no-pii-here", "42"]
        rows = [
            (i, " ".join(rng.choice(pieces) for _ in range(rng.randint(1, 12))))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        once = redact_pii(df).select("doc_id", F.col("clean_text").alias("text"))
        twice = redact_pii(once)
        changed = twice.where(F.col("clean_text") != F.col("text")).count()
        assert changed == 0
        # And the first pass did redact something in this corpus.
        assert redact_pii(df).where(F.col("pii_found")).count() > 0
