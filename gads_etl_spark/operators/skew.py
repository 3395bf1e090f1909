"""Skew mitigation: salted joins for hot keys.

First line of defense is AQE's skew-join splitting (enabled in
session.py), which handles *moderately* skewed sort-merge joins by
splitting oversized partitions at runtime. Salting is the explicit
fallback for pathological single-key hotspots (one customer = 30% of
rows): the skewed side spreads each hot key over ``n_salts`` synthetic
sub-keys, the other side is replicated n_salts×, and the join key becomes
(key, salt) — the hot key's rows land on n_salts reducers instead of one.

Cost model: replicating the build side n_salts× is only worth it when it
is small relative to the skew win — exactly the dimension-table case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_skewed_side(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Add a deterministic salt derived from the whole row (content hash
    mod n_salts): stable across retries, uniform within a hot key."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    return df.withColumn(SALT_COL, salt.cast("int"))


def replicate_other_side(df: DataFrame, n_salts: int = 16) -> DataFrame:
    """Replicate each row once per salt value (explode of a literal
    range — no shuffle, the blow-up happens map-side)."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))


def salted_join(skewed: DataFrame, other: DataFrame, on: list[str],
                how: str = "inner", n_salts: int = 16) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated; result equals ``skewed.join(other, on, how)`` for
    inner/left joins on unique ``other`` keys, with the hot key's work
    spread across ``n_salts`` tasks."""
    left = salt_skewed_side(skewed, n_salts)
    right = replicate_other_side(other, n_salts)
    return left.join(right, [*on, SALT_COL], how).drop(SALT_COL)
