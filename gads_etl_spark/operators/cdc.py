"""Snapshot diffing (CDC): classify rows across two corpus versions.

A 100 TB corpus is rebuilt incrementally — crawl N+1 against crawl N,
curated-zone version v+1 against v (the ``_VersionedTable`` time-travel
read makes any two committed versions diffable). Downstream consumers
(index refresh, re-embedding, re-tokenization) want the *delta*, not the
full table: which keys appeared, which vanished, which changed content.

Scale shape — the whole point of the design:

- Each side is projected to ``key + xxhash64(compared columns)`` BEFORE
  the join, so the shuffle carries a constant ~16-byte payload per row no
  matter how wide the documents are. Diffing two 100 TB snapshots moves
  2 × |keys| × ~24 bytes through the exchange, not 200 TB of text.
- The classification join is a plain full-outer sort-merge on the key;
  with both snapshots written via ``layout.write_bucketed`` on the key it
  degrades to a zero-Exchange zip of co-located buckets.
- ``changed`` compares the 64-bit content fingerprints. A hash collision
  (2⁻⁶⁴ per colliding pair) would misclassify a changed row as unchanged
  — the standard CDC trade accepted by every fingerprint-based differ;
  pass ``fingerprint=False`` to compare values directly (wide shuffle,
  exact) when the row payload is already narrow.
- Unchanged rows are dropped by default: at corpus scale the delta is
  orders of magnitude smaller than the table, and emitting "unchanged"
  for 99% of 10¹⁰ keys is itself a scale bug.

No reference counterpart (the reference's ledger records load state, not
content diffs); this is the training-data-pipeline extension mandate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change"

_OLD_FP = "__old_fp"
_NEW_FP = "__new_fp"


def _common_compare_cols(old: DataFrame, new: DataFrame,
                         key_cols: list[str]) -> list[str]:
    shared = [c for c in old.columns if c in set(new.columns)]
    return [c for c in shared if c not in set(key_cols)]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    fingerprint: bool = True,
    include_unchanged: bool = False,
    assert_unique_keys: bool = False,
) -> DataFrame:
    """Diff two snapshots by key; emit one row per key whose membership
    or compared content differs, labelled ``change`` ∈ {'added',
    'removed', 'changed'} (+ 'unchanged' when ``include_unchanged``).

    PRECONDITION: ``key_cols`` uniquely identify a row within each
    snapshot. Duplicate keys fan out in the full-outer join and yield
    multiple (possibly contradictory) change rows per key, which
    ``apply_diff`` would then silently drop or duplicate. Pass
    ``assert_unique_keys=True`` to fail loudly instead (one extra
    count-distinct aggregate per side before the diff).

    ``compare_cols`` defaults to every non-key column present in BOTH
    frames. With ``fingerprint=True`` (default) each side shuffles only
    ``key + xxhash64(compare_cols)``; with ``fingerprint=False`` the
    compared values travel through the join and the comparison is exact
    null-safe inequality per column.
    """
    compare_cols = (list(compare_cols) if compare_cols is not None
                    else _common_compare_cols(old, new, key_cols))
    if not compare_cols:
        raise ValueError("no columns to compare (pass compare_cols)")
    if assert_unique_keys:
        for side, df in (("old", old), ("new", new)):
            dup = (df.groupBy(*key_cols).count()
                   .where(F.col("count") > 1).limit(1).count())
            if dup:
                raise ValueError(
                    f"snapshot_diff: {side} snapshot has duplicate keys on "
                    f"{key_cols}; the diff is undefined per key")

    if fingerprint:
        # xxhash64 over the compared columns; nulls are hashed distinctly
        # from empty values by seeding with a presence bitmap column.
        presence = F.concat(*[
            F.when(F.col(c).isNull(), F.lit("0")).otherwise(F.lit("1"))
            for c in compare_cols
        ])
        fp = F.xxhash64(presence, *[F.col(c) for c in compare_cols])
        left = old.select(*key_cols, fp.alias(_OLD_FP), F.lit(1).alias("__in_old"))
        right = new.select(*key_cols, fp.alias(_NEW_FP), F.lit(1).alias("__in_new"))
        differs = F.col(_OLD_FP) != F.col(_NEW_FP)
    else:
        left = old.select(
            *key_cols, *[F.col(c).alias(f"__old_{c}") for c in compare_cols],
            F.lit(1).alias("__in_old"),
        )
        right = new.select(
            *key_cols, *[F.col(c).alias(f"__new_{c}") for c in compare_cols],
            F.lit(1).alias("__in_new"),
        )
        differs = reduce(
            lambda acc, c: acc | ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}")),
            compare_cols, F.lit(False),
        )

    joined = left.join(right, on=key_cols, how="full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.withColumn(CHANGE_COL, change).select(*key_cols, CHANGE_COL)
    if not include_unchanged:
        out = out.where(F.col(CHANGE_COL) != "unchanged")
    return out


def apply_diff(base: DataFrame, delta: DataFrame, new: DataFrame,
               key_cols: list[str]) -> DataFrame:
    """Reconstruct the new snapshot from (base, diff, new-side rows):
    drop removed/changed keys from base, take added/changed rows from
    ``new``. Round-trip property: ``apply_diff(old, snapshot_diff(old,
    new, k), new, k) ≡ new`` — the invariant the tests pin.
    """
    dead = delta.where(F.col(CHANGE_COL).isin("removed", "changed")).select(*key_cols)
    incoming_keys = delta.where(F.col(CHANGE_COL).isin("added", "changed")).select(*key_cols)
    kept = base.join(dead, key_cols, "left_anti")
    incoming = new.join(incoming_keys, key_cols, "left_semi")
    return kept.unionByName(incoming)
