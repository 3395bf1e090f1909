"""Config-declared curation: YAML parsing, step equivalence to the raw
operators, and the one-pass Observation funnel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gads_etl_spark.pipeline.curation import (
    CurationConfigError,
    CurationStep,
    load_curation_config,
    run_curation,
)

YAML_OK = """
curation:
  steps:
    - kind: exact_dedup
    - kind: lang_filter
      allowed: [en, es]
    - kind: length_range
      min_chars: 8
    - kind: split
      train: 0.8
      val: 0.1
"""


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(200):
        lang = ["en", "es", "zh", "de"][i % 4]
        text = f"document body number {i % 50} with shared tail"  # 4× dups
        if i % 17 == 0:
            text = "tiny"  # falls to the length filter
        rows.append((i, text, lang))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestConfig:
    def test_parse_ok(self):
        steps = load_curation_config(YAML_OK)
        assert [s.kind for s in steps] == [
            "exact_dedup", "lang_filter", "length_range", "split"]
        assert steps[1].params == {"allowed": ["en", "es"]}

    @pytest.mark.parametrize("bad,msg", [
        ("curation: {}", "must declare"),
        ("curation:\n  steps:\n    - allowed: [en]", "needs a 'kind'"),
        ("curation:\n  steps:\n    - kind: nope", "unknown kind"),
    ])
    def test_parse_errors(self, bad, msg):
        with pytest.raises(CurationConfigError, match=msg):
            load_curation_config(bad)

    def test_bad_params_surface_as_config_error(self, docs):
        with pytest.raises(CurationConfigError, match="lang_filter"):
            run_curation(docs, [CurationStep("lang_filter", {"wrong": 1})])


class TestRun:
    def test_matches_manual_chain(self, docs):
        from gads_etl_spark.operators.dedup import exact_dedup
        from gads_etl_spark.operators.sampling import train_val_test_split

        steps = load_curation_config(YAML_OK)
        got = run_curation(docs, steps, observe=False).df
        manual = exact_dedup(docs).drop("content_hash", "n_copies")
        manual = manual.where(F.col("lang").isin("en", "es"))
        manual = manual.where(F.length("text").between(8, 1 << 31))
        manual = train_val_test_split(manual, "doc_id", train=0.8, val=0.1)
        assert sorted(map(tuple, got.collect())) == \
            sorted(map(tuple, manual.collect()))

    def test_funnel_counts_in_one_action(self, docs):
        steps = load_curation_config(YAML_OK)
        result = run_curation(docs, steps)
        n_out = result.df.count()  # the ONE materializing action
        funnel = result.funnel()
        assert [f["step"] for f in funnel] == [
            "input", "0:exact_dedup", "1:lang_filter",
            "2:length_range", "3:split"]
        rows = [f["rows_out"] for f in funnel]
        assert rows[0] == 200
        assert rows == sorted(rows, reverse=True)  # monotone funnel
        assert rows[-1] == n_out
        # and each stage count equals an independent recompute
        independent = run_curation(
            docs, steps[:2], observe=False).df.count()
        assert rows[2] == independent

    def test_split_step_does_not_drop(self, docs):
        steps = [CurationStep("split", {"train": 0.7, "val": 0.2})]
        result = run_curation(docs, steps)
        out = result.df
        assert out.count() == 200
        assert set(r["split"] for r in out.select("split").distinct().collect()) \
            <= {"train", "val", "test"}


def test_funnel_query_matches_observation_funnel(spark):
    """The oracle-checked audit query and the one-pass Observation
    funnel must report identical stage counts over the same steps."""
    from gads_etl_spark.catalog import load_table
    from gads_etl_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    audit = {r["step"]: r["rows_out"]
             for r in REGISTRY["ext_curation_funnel"].fn(spark, sf).collect()}
    docs = load_table(spark, sf, "documents")
    steps = load_curation_config(
        "curation:\n  steps:\n"
        "    - kind: exact_dedup\n"
        "    - kind: lang_filter\n      allowed: [en, es]\n"
        "    - kind: length_range\n      min_chars: 100\n")
    result = run_curation(docs, steps)
    result.df.count()
    observed = {f["step"]: f["rows_out"] for f in result.funnel()}
    assert observed == audit


def test_sampling_step_kinds(spark):
    from gads_etl_spark.operators.sampling import balanced_sample, pps_sample

    rows = [(i, f"text {i}", ["en", "zh"][i % 2], 50 + i) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    steps = load_curation_config(
        "curation:\n  steps:\n"
        "    - kind: pps_sample\n      expected_n: 40\n"
        "    - kind: balanced_sample\n      group_col: lang\n      n_per_group: 10\n")
    got = run_curation(docs, steps, observe=False).df
    manual = pps_sample(docs, 40, "n_chars", "doc_id").drop("inclusion_p")
    manual = balanced_sample(manual, "lang", 10, "doc_id")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, manual.collect()))
    sizes = {r["lang"]: r["n"] for r in
             got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= 10 for n in sizes.values()) and sizes


def test_decontaminate_step(spark, tmp_path):
    eval_path = str(tmp_path / "benchmark")
    spark.createDataFrame(
        [(1, "the secret benchmark question about spark internals here today")],
        "qid long, text string").write.parquet(eval_path)
    docs = spark.createDataFrame(
        [(1, "the secret benchmark question about spark internals here today and more"),
         (2, "a perfectly clean training document with enough words to pass by")],
        "doc_id long, text string")
    steps = load_curation_config(
        f"curation:\n  steps:\n"
        f"    - kind: decontaminate\n      eval_path: {eval_path}\n      n: 8\n")
    out = run_curation(docs, steps, observe=False).df
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_runtime_typeerror_inside_step_is_not_a_config_error(docs, monkeypatch):
    # A TypeError raised by the operator BODY is a bug, not bad YAML —
    # it must propagate as TypeError so the real stack is visible.
    from gads_etl_spark.pipeline import curation as cur

    def broken_step(df):
        raise TypeError("unsupported operand deep inside the operator")

    monkeypatch.setitem(cur.STEP_KINDS, "broken", broken_step)
    with pytest.raises(TypeError, match="deep inside"):
        run_curation(docs, [CurationStep("broken")])
    # ...while bad params still surface as the friendly config error.
    with pytest.raises(CurationConfigError, match="broken"):
        run_curation(docs, [CurationStep("broken", {"no_such": 1})])
