"""Declarative pipeline config: YAML → typed query definitions + run plan.

Contract parity (reference src/gads_etl/config.py:16-106,
config/google_apis.yaml):

- Query definitions are data (name/entity/date_column/fields), validated
  at load time; missing keys fail fast like the reference's Pydantic
  models.
- ``${VAR}`` / ``${VAR:-default}`` env interpolation (P12 — reference
  resolves via dotenv; here a regex pass over scalar values).
- Customer ids accept a comma-separated string (reference
  config.py:31-36).
- ``plan_daily_runs`` reproduces sync_daily's work-list semantics
  (reference pipeline.py:164-178): one (query × customer) extraction per
  run targeting ``target_date``, with the GAQL date window
  ``[target - lookback, target]``. The plan is returned as data so a
  scheduler can fan it out — the reference executes it in a Python loop.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from datetime import date, timedelta

import yaml

from gads_etl_spark.pipeline.extract import QueryDefinition

_ENV_RE = re.compile(r"\$\{(?P<name>[A-Za-z_][A-Za-z0-9_]*)(?::-(?P<default>[^}]*))?\}")


def interpolate_env(value: str) -> str:
    """``${VAR}`` / ``${VAR:-default}`` substitution (P12)."""

    def sub(m: re.Match) -> str:
        got = os.environ.get(m.group("name"))
        if got is not None:
            return got
        if m.group("default") is not None:
            return m.group("default")
        raise KeyError(f"environment variable {m.group('name')!r} is not set "
                       "and has no default")

    return _ENV_RE.sub(sub, value)


def _walk(node):
    if isinstance(node, str):
        return interpolate_env(node)
    if isinstance(node, dict):
        return {k: _walk(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_walk(v) for v in node]
    return node


@dataclass(frozen=True)
class PipelineConfig:
    source: str
    customer_ids: tuple[str, ...]
    queries: tuple[QueryDefinition, ...]
    lookback_days_daily: int = 2
    catch_up_window_days: int = 30

    def query(self, name: str) -> QueryDefinition:
        for q in self.queries:
            if q.name == name:
                return q
        raise KeyError(f"unknown query {name!r}")


def parse_customer_ids(raw) -> tuple[str, ...]:
    """Comma-separated string or list → normalized id tuple."""
    if isinstance(raw, str):
        parts = [p.strip() for p in raw.split(",")]
    else:
        parts = [str(p).strip() for p in raw]
    ids = tuple(p.replace("-", "") for p in parts if p)
    if not ids:
        raise ValueError("customer_ids must contain at least one id")
    return ids


def load_config(text: str) -> PipelineConfig:
    """Parse + validate a YAML config document (fail-fast on missing
    keys, like the reference's Pydantic load)."""
    doc = _walk(yaml.safe_load(text))
    try:
        queries = tuple(
            QueryDefinition(
                name=q["name"], entity=q["entity"],
                date_column=q["date_column"], fields=tuple(q["fields"]),
            )
            for q in doc["queries"]
        )
        return PipelineConfig(
            source=doc.get("source", "google_ads"),
            customer_ids=parse_customer_ids(doc["customer_ids"]),
            queries=queries,
            lookback_days_daily=int(doc.get("lookback_days_daily", 2)),
            catch_up_window_days=int(doc.get("catch_up_window_days", 30)),
        )
    except KeyError as exc:
        raise ValueError(f"config missing required key: {exc}") from exc


def load_config_file(path: str) -> PipelineConfig:
    with open(path) as f:
        return load_config(f.read())


@dataclass(frozen=True)
class ExtractionRun:
    """One planned extraction attempt (reference pipeline.py:170-178)."""

    query_name: str
    customer_id: str
    logical_date: date
    window_start: date
    window_end: date


def plan_daily_runs(
    config: PipelineConfig,
    target_date: date,
    lookback_days: int | None = None,
) -> list[ExtractionRun]:
    """sync_daily's work list: queries × customers for ``target_date``
    with the pushdown window ``[target − lookback, target]``."""
    lookback = lookback_days if lookback_days is not None else config.lookback_days_daily
    start = target_date - timedelta(days=lookback)
    return [
        ExtractionRun(
            query_name=q.name, customer_id=c, logical_date=target_date,
            window_start=start, window_end=target_date,
        )
        for q in config.queries
        for c in config.customer_ids
    ]


def plan_catch_up_runs(config: PipelineConfig, end: date,
                       days: int | None = None) -> list[ExtractionRun]:
    """historical_catch_up (reference pipeline.py:180-185): a daily plan
    whose lookback covers the whole catch-up window; ``days`` omitted →
    config ``catch_up_window_days`` (reference defaults the same way,
    `window = days or config.metadata.catch_up_window_days`)."""
    return plan_daily_runs(
        config, end, lookback_days=days or config.catch_up_window_days)
