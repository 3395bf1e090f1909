"""Inline job metrics via Spark ``Observation`` — counts for free.

The reference re-reads what it wrote to validate record counts
(reference src/gads_etl/validator.py — a second full pass). Spark's
``Observation`` attaches accumulator-backed aggregates to the plan
itself: metrics are collected ON THE SAME PASS as the action, so a
100 TB write gets its row count, null count, and value sum at zero
extra scans. The trade: observed metrics describe the plan's single
execution — attach them at the point whose one action you measure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach ``metrics`` (aggregate Columns) to ``df``'s next action.

    Returns the instrumented frame and the Observation; read
    ``observation.get`` AFTER an action has run the frame. Default
    metric when none given: ``count(*) AS n_rows``.
    """
    obs = Observation(name)
    if not metrics:
        metrics = (F.count(F.lit(1)).alias("n_rows"),)
    return df.observe(obs, *metrics), obs


def write_with_count(df: DataFrame, path: str, fmt: str = "parquet") -> int:
    """Write ``df`` and return the row count of what was written —
    measured on the write pass itself, not a re-read and not a separate
    ``df.count()`` that would re-execute a nondeterministic plan into a
    different answer than the files hold (the round-1 sealed-manifest
    hazard: count-then-write can disagree with the payload).
    """
    inst, obs = observed(df, f"write:{path}")
    inst.write.format(fmt).mode("errorifexists").save(path)
    return int(obs.get["n_rows"])
