"""Vocabulary building: dense rank assignment must be bit-identical to
the single-window formulation at ANY partitioning, including degenerate
layouts (more range partitions than vocabulary rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gads_etl_spark.operators import vocab


@pytest.fixture(scope="module")
def docs(spark):
    # heavy ties: tokens drawn from a small alphabet with skewed counts
    rows = []
    words = ["the", "of", "and", "model", "data", "spark", "scale",
             "zz", "aa", "mm"]
    for i in range(300):
        text = " ".join(words[(i + j) % (2 + i % 9)] for j in range(12))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _window_reference(counts_df):
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return {
        r["token"]: r["tid"]
        for r in counts_df.withColumn(
            "tid", (F.row_number().over(w) - 1).cast("long")).collect()
    }


class TestDenseRanks:
    @pytest.mark.parametrize("n_parts", [2, 7, 64])
    def test_matches_single_window_at_any_width(self, docs, n_parts):
        counts = vocab.token_counts(docs)
        expect = _window_reference(counts)
        got = {
            r["token"]: r["token_id"]
            for r in vocab.build_vocab(docs, n_parts=n_parts).collect()
        }
        assert got == expect  # 64 parts ≫ |V| exercises empty partitions

    def test_ids_dense_and_frequency_ordered(self, docs):
        rows = sorted(
            vocab.build_vocab(docs).collect(), key=lambda r: r["token_id"])
        assert [r["token_id"] for r in rows] == list(range(len(rows)))
        occ = [r["n_occurrences"] for r in rows]
        assert occ == sorted(occ, reverse=True)

    def test_input_layout_invariance(self, docs):
        a = {(r["token"], r["token_id"])
             for r in vocab.build_vocab(docs, n_parts=5).collect()}
        b = {(r["token"], r["token_id"])
             for r in vocab.build_vocab(
                 docs.repartition(13, "doc_id"), n_parts=5).collect()}
        assert a == b

    def test_min_count_cut(self, spark):
        df = spark.createDataFrame(
            [(1, "a a a b b c")], "doc_id long, text string")
        got = {r["token"]: (r["token_id"], r["n_occurrences"])
               for r in vocab.build_vocab(df, min_count=2).collect()}
        assert got == {"a": (0, 3), "b": (1, 2)}

    def test_no_single_partition_window_in_plan(self, docs):
        plan = vocab.build_vocab(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan  # ids come from mapInPandas, not a window


class TestEncodeDocs:
    def test_order_preserved_and_oov(self, spark):
        docs = spark.createDataFrame(
            [(1, "b a b zz a"), (2, "a")], "doc_id long, text string")
        voc = spark.createDataFrame(
            [("a", 0), ("b", 1)], "token string, token_id long")
        got = {r["doc_id"]: r["token_ids"]
               for r in vocab.encode_docs(docs, voc).collect()}
        assert got == {1: [1, 0, 1, -1, 0], 2: [0]}  # zz → unk -1

    def test_custom_unk_id(self, spark):
        docs = spark.createDataFrame([(1, "q")], "doc_id long, text string")
        voc = spark.createDataFrame([("a", 0)], "token string, token_id long")
        [r] = vocab.encode_docs(docs, voc, unk_id=99).collect()
        assert r["token_ids"] == [99]

    def test_vocab_join_broadcasts(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        voc = spark.createDataFrame([("a", 0)], "token string, token_id long")
        plan = vocab.encode_docs(docs, voc)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_roundtrip_with_built_vocab(self, docs):
        voc = vocab.build_vocab(docs)
        enc = vocab.encode_docs(docs, voc)
        id2tok = {r["token_id"]: r["token"] for r in voc.collect()}
        sample = enc.where(F.col("doc_id") == 7).collect()[0]["token_ids"]
        original = docs.where(F.col("doc_id") == 7).collect()[0]["text"].split()
        decoded = [id2tok[t] for t in sample]
        assert decoded == original  # min_count=1 vocab: lossless roundtrip


def test_token_counts_without_doc_counts(spark):
    df = spark.createDataFrame([(1, "a a b"), (2, "a")],
                               "doc_id long, text string")
    slim = vocab.token_counts(df, with_doc_counts=False)
    assert slim.columns == ["token", "n_occurrences"]
    got = {r["token"]: r["n_occurrences"] for r in slim.collect()}
    assert got == {"a": 3, "b": 1}
    plan = slim._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # no distinct-agg expansion in slim mode


class TestExtendVocab:
    def test_existing_ids_stable_new_ids_appended(self, spark, docs):
        base = vocab.build_vocab(docs, min_count=2)
        old_ids = {r["token"]: r["token_id"] for r in base.collect()}
        new_docs = spark.createDataFrame(
            [(1000, "zzfresh zzfresh zzfresh aanew aanew the the")],
            "doc_id long, text string")
        ext = vocab.extend_vocab(base, new_docs, min_count=2)
        got = {r["token"]: r["token_id"] for r in ext.collect()}
        # every old token keeps its id exactly
        assert all(got[t] == i for t, i in old_ids.items())
        # new tokens appended at the tail, frequency-ranked among themselves
        v = len(old_ids)
        assert got["zzfresh"] == v and got["aanew"] == v + 1
        # known token 'the' did NOT get a duplicate entry
        assert ext.groupBy("token").count().where("count > 1").count() == 0

    def test_extension_reduces_oov_without_changing_old_encoding(self, spark, docs):
        base = vocab.build_vocab(docs, min_count=2)
        new_docs = spark.createDataFrame(
            [(1000, "qqword qqword")], "doc_id long, text string")
        ext = vocab.extend_vocab(base, new_docs, min_count=2)
        enc_before = {r["doc_id"]: list(r["token_ids"]) for r in
                      vocab.encode_docs(docs, base).collect()}
        enc_after = {r["doc_id"]: list(r["token_ids"]) for r in
                     vocab.encode_docs(docs, ext).collect()}
        assert enc_before == enc_after  # old corpus encoding untouched
        [r] = vocab.encode_docs(new_docs, ext).collect()
        assert -1 not in r["token_ids"]  # delta no longer OOV

    def test_empty_delta_is_identity(self, spark, docs):
        base = vocab.build_vocab(docs, min_count=2)
        empty = spark.createDataFrame([], "doc_id long, text string")
        ext = vocab.extend_vocab(base, empty)
        assert sorted(map(tuple, ext.collect())) == \
            sorted(map(tuple, base.collect()))
