"""Config-declared corpus curation: the extraction pipeline's YAML
discipline (`pipeline/config.py`, mirroring the reference's declarative
query definitions) applied to the training-data side.

A curation run is a LIST OF STEPS (dedup, language filter, length band,
quality floor, PII redaction, deterministic sampling, split assignment)
declared in YAML and folded into ONE lazy DataFrame chain — Catalyst
fuses the filters and hash predicates, so ten declared steps do not mean
ten passes. Per-step row counts come from Spark ``Observation``s
attached at each stage boundary: the funnel (rows in → rows out per
step) is measured DURING the single materializing action, not by
running ``count()`` per step — at 100 TB that is the difference between
one pass and len(steps) passes (same trick as
``pipeline/metrics.py::write_with_count``).

Each step kind delegates to the already-tested operator; this module
adds only declaration, validation, and observation plumbing.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class CurationConfigError(ValueError):
    """Unknown step kind or invalid step parameters."""


@dataclass(frozen=True)
class CurationStep:
    kind: str
    params: dict = field(default_factory=dict)


def _step_exact_dedup(df: DataFrame) -> DataFrame:
    from gads_etl_spark.operators import dedup as D

    added = {"content_hash", "n_copies"} - set(df.columns)
    return D.exact_dedup(df).drop(*added)


def _step_lang_filter(df: DataFrame, allowed: list[str]) -> DataFrame:
    return df.where(F.col("lang").isin(*allowed))


def _step_length_range(df: DataFrame, min_chars: int = 0,
                       max_chars: int = 1 << 31) -> DataFrame:
    n = F.length(F.col("text"))
    return df.where(n.between(F.lit(min_chars), F.lit(max_chars)))


def _step_quality_min(df: DataFrame, min_distinct_ratio: float) -> DataFrame:
    from gads_etl_spark.operators.dedup import tokens

    t = tokens(F.col("text"))
    ratio = F.size(F.array_distinct(t)) / F.greatest(F.size(t), F.lit(1))
    return df.where(ratio >= F.lit(min_distinct_ratio))


def _step_pii_redact(df: DataFrame) -> DataFrame:
    from gads_etl_spark.operators.quality import redact_pii

    return redact_pii(df, "text")


def _step_sample(df: DataFrame, rate: float, salt: str = "sample") -> DataFrame:
    from gads_etl_spark.operators.sampling import deterministic_sample

    return deterministic_sample(df, "doc_id", rate, salt=salt)


def _step_split(df: DataFrame, train: float = 0.8, val: float = 0.1) -> DataFrame:
    from gads_etl_spark.operators.sampling import train_val_test_split

    return train_val_test_split(df, "doc_id", train=train, val=val)


def _step_pps_sample(df: DataFrame, expected_n: int,
                     weight_col: str = "n_chars") -> DataFrame:
    # NOTE: pps_sample reduces ΣW to a driver scalar when the step is
    # BUILT, which executes the upstream chain once beyond the main
    # pass — the one step kind that isn't purely lazy. Place it early
    # (or pre-compute weights) when the upstream chain is expensive.
    from gads_etl_spark.operators.sampling import pps_sample

    return pps_sample(df, expected_n, weight_col, "doc_id").drop("inclusion_p")


def _step_balanced_sample(df: DataFrame, group_col: str,
                          n_per_group: int) -> DataFrame:
    from gads_etl_spark.operators.sampling import balanced_sample

    return balanced_sample(df, group_col, n_per_group, "doc_id")


def _step_decontaminate(df: DataFrame, eval_path: str, n: int = 8) -> DataFrame:
    """Drop docs sharing any word n-gram with the eval set at
    ``eval_path`` (parquet with a ``text`` column). The eval grams
    broadcast; the corpus side never shuffles for this step."""
    from gads_etl_spark.operators.quality import ngram_contamination

    eval_df = df.sparkSession.read.parquet(eval_path)
    contaminated = ngram_contamination(df, eval_df, n=n).select("doc_id")
    return df.join(contaminated, "doc_id", "left_anti")


STEP_KINDS = {
    "exact_dedup": _step_exact_dedup,
    "lang_filter": _step_lang_filter,
    "length_range": _step_length_range,
    "quality_min": _step_quality_min,
    "pii_redact": _step_pii_redact,
    "decontaminate": _step_decontaminate,
    "sample": _step_sample,
    "split": _step_split,
    "pps_sample": _step_pps_sample,
    "balanced_sample": _step_balanced_sample,
}


def load_curation_config(text: str) -> list[CurationStep]:
    """Parse and validate a ``curation: {steps: [...]}`` YAML document."""
    doc = yaml.safe_load(text) or {}
    raw = (doc.get("curation") or {}).get("steps")
    if not raw:
        raise CurationConfigError("config must declare curation.steps")
    steps = []
    for i, entry in enumerate(raw):
        if not isinstance(entry, dict) or "kind" not in entry:
            raise CurationConfigError(f"step {i}: each step needs a 'kind'")
        kind = entry["kind"]
        if kind not in STEP_KINDS:
            raise CurationConfigError(
                f"step {i}: unknown kind {kind!r} "
                f"(supported: {sorted(STEP_KINDS)})")
        params = {k: v for k, v in entry.items() if k != "kind"}
        steps.append(CurationStep(kind, params))
    return steps


@dataclass
class CurationResult:
    df: DataFrame
    observations: list[tuple[str, Observation]]

    def funnel(self) -> list[dict]:
        """Per-step surviving row counts — valid only AFTER an action on
        ``df`` (observations record during execution; see module
        docstring for why this is one pass, not len(steps))."""
        return [{"step": name, "rows_out": int(obs.get["n"])}
                for name, obs in self.observations]


def run_curation(docs: DataFrame, steps: list[CurationStep],
                 observe: bool = True) -> CurationResult:
    """Fold the declared steps into one lazy plan; with ``observe``,
    attach a row-count Observation after every step."""
    df = docs
    observations: list[tuple[str, Observation]] = []
    # Observations are auto-named (UUID): a fixed name would collide when
    # two runs share a session — notably a run whose plan never executes
    # (config error, abandoned result) leaves its named listener behind.
    if observe:
        obs0 = Observation()
        df = df.observe(obs0, F.count(F.lit(1)).alias("n"))
        observations.append(("input", obs0))
    import inspect

    for i, step in enumerate(steps):
        fn = STEP_KINDS[step.kind]
        # Validate params against the step signature BEFORE calling, so a
        # genuine TypeError raised inside the operator body propagates as
        # the bug it is instead of being misreported as a config error.
        try:
            inspect.signature(fn).bind(df, **step.params)
        except TypeError as exc:
            raise CurationConfigError(f"step {i} ({step.kind}): {exc}") from exc
        df = fn(df, **step.params)
        if observe:
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
            observations.append((f"{i}:{step.kind}", obs))
    return CurationResult(df, observations)
