"""Amplify the sf0.1 fixture to a larger scale tier for bench scaling runs.

The driver's fixture generator is not in this repo (TESTDATA.md: the
parquet under /root/testdata is driver-generated, read-only), so the sf1
tier is derived from sf0.1 by a DETERMINISTIC x``factor`` amplification
that preserves each table's statistical structure while keeping every
workload honest at the larger scale:

- TPC-H tables: ``factor`` key-shifted copies; all FK relationships
  (orders->customer, lineitem->orders/part/supplier) shift consistently,
  so join selectivities and group cardinalities scale like real TPC-H
  (region/nation stay fixed, as TPC-H dimensions do at every SF).
- events: key-shifted copies — 10x users, identical per-user activity
  shape (sessionization/funnel state per user stays constant-size) —
  PLUS two planted heavy users shared by every copy: a fixed ~0.3% and
  ~0.1% of each copy's events (selected by ``event_id mod 1000``, so
  the same logical events in every copy) are reassigned to two user ids
  outside all copies' key ranges. Uniform 10x user dilution would
  otherwise push every user below `ev_heavy_hitters`' 0.0008 support
  (the r7 tier answered 0 rows — correct but evidentially empty); the
  plants keep one solidly-heavy and one just-above-support key at EVERY
  factor, and give sessionization/window paths a genuinely hot key.
- documents: every copy (including copy 0) is rewritten token-wise into
  a Heaps-law-shaped vocabulary. Each token's class is a deterministic
  hash of its TRIGRAM CONTEXT (the two preceding words + itself), so
  identical base texts rewrite identically (the 8 planted exact-dup
  groups survive verbatim) and shared regions of near-dup texts rewrite
  identically except at edit boundaries (near-dup structure survives):
  * head (~35% of occurrences): the base word, UNsuffixed — shared
    across all copies; its df grows with the corpus and stays above the
    10% max-df stopword cut at every tier, like real stopwords.
  * mid (~35%): ``w_r{i}_m{k}``, k in 0..9 — copy-local mid-frequency
    vocabulary (df ~ hundreds), the Zipf middle.
  * tail (~30%): ``w_r{i}_h{t}``, t = trigram hash — copy-local RARE
    vocabulary (thousands of types per copy, df ~ 1-10), the Heaps tail
    the r7 tier lacked. The tail is what makes prefix-filtered
    similarity joins behave like real text: the rarest terms carry
    short postings, so candidates stay corpus-linear instead of the
    tail-less 1.9B-row candidate join SCALING.md documents.
  Cross-copy similarity stays at background level (a shared word
  trigram needs 3 consecutive head-class tokens, ~4% of positions), so
  there is still no artificial factor²-duplicate blowup; the source
  column keeps its ``_r{i}`` suffix so blocked operators still see
  ``factor``x more bounded-size blocks. n_chars is recomputed. Run with
  ``--factor 1`` to emit the same-distribution baseline tier
  (``.localdata/sf0.1h``) that sf1 scaling ratios for document/event
  queries should be measured against.
- embeddings: copy i rotates each vector left by ``7*i mod dim``
  positions — norms and coordinate distributions are preserved, while
  cross-copy cosines fall to the natural background level (no planted
  exact duplicates). Past dim copies a per-wrap sign mask (orthogonal,
  runtime-certified pairwise Hamming 16..dim-16) keeps every wrap
  distinct.

Family budgets (round 13): p_name letter bijections extend past the 312
affine maps by composing with powers of a fixed permutation, and
embedding wraps past 2 draw SplitMix64 sign masks — BOTH families are
certified at runtime (distinctness, bounded letter agreement, bounded
mask Hamming) for the requested factor, so ``--factor 1000`` (the sf100
tier, ~16 GB) generates with the same no-silent-collision guarantee the
SystemExit caps used to provide. Copies below the old caps regenerate
bit-identically. Factors > 100 write in 100-copy chunks (append) so
Catalyst never plans a 1000-way union.

Zero randomness anywhere: re-running the script reproduces the fixture
byte-for-byte modulo parquet encoding nondeterminism.

Usage:
    python scripts/gen_scale_fixture.py [--factor 10] \
        [--src /root/testdata/sf0.1] [--dst .localdata/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

AZ = "abcdefghijklmnopqrstuvwxyz"
#: A fixed non-affine letter permutation (keyboard order). Composing the
#: 312 affine ciphers with powers of this map extends the p_name
#: bijection family far past 312 (``_letter_perm``); the family's
#: fitness is CHECKED at runtime, never assumed.
PI = "qwertyuiopasdfghjklzxcvbnm"


def _letter_perm(i: int) -> str:
    """The i-th letter bijection for p_name copies: affine cipher
    j -> (a*j + b) mod 26 (312 distinct maps — the round-10 family,
    bit-identical for i < 312 so existing tiers regenerate exactly),
    composed with PI^(i // 312) beyond that. Any bijection on the
    alphabet preserves every unit edit cost, so within-copy Levenshtein
    structure is preserved EXACTLY at any i."""
    a_mul = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25][(i % 312) // 26]
    perm = "".join(AZ[(a_mul * j + i % 26) % 26] for j in range(26))
    pi_map = {a: b for a, b in zip(AZ, PI)}
    for _ in range(i // 312):
        perm = "".join(pi_map[ch] for ch in perm)
    return perm


def _check_letter_perms(factor: int) -> list[str]:
    """Certify the p_name bijection family for this factor: all maps
    pairwise distinct AND no two maps agree on more than 8 of 26
    letters. Distinctness alone is not enough — two bijections agreeing
    on 20 letters would leave names spelled from those letters
    byte-identical across the two copies, re-planting the cross-copy
    exact twins the rotation wrap bug created at factor 100 (round 10).
    Affine pairs agree on <= 1 letter; the PI-composed pairs are
    certified here by enumeration, so a bad PI choice fails the run
    instead of silently poisoning the fixture."""
    perms = [_letter_perm(i) for i in range(factor)]
    if len(set(perms)) != factor:
        raise SystemExit(f"letter-bijection family collides at factor "
                         f"{factor}")
    worst = 0
    for x in range(len(perms)):
        for y in range(x + 1, len(perms)):
            agree = sum(a == b for a, b in zip(perms[x], perms[y]))
            worst = max(worst, agree)
            if agree > 8:
                raise SystemExit(
                    f"letter bijections {x} and {y} agree on {agree}/26 "
                    "letters — cross-copy name collisions likely; pick a "
                    "different PI")
    print(f"letter-perm family ok: {factor} distinct maps, "
          f"max pairwise agreement {worst}/26")
    return perms


def _splitmix64(x: int) -> int:
    """SplitMix64 (public domain, Steele et al.) — the deterministic
    bit source for embedding sign masks beyond the second wrap."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _sign_masks(n_wraps: int, dim: int) -> list[list[int]]:
    """Per-wrap sign masks for embedding copies: wrap 0 = identity and
    wrap 1 = negate-odd (bit-identical to the round-10 scheme, so
    factor <= 2*dim regenerates exactly); wraps >= 2 draw bits from
    SplitMix64. Every mask pair must differ in 16..(dim-16) positions:
    two copies sharing a rotation have twin cosine (dim - 2h)/dim where
    h is the mask Hamming distance, so the bound caps |twin cosine| at
    0.5 — below the fixture's ~0.6 natural background. Checked, not
    assumed."""
    masks = [[1] * dim, [(-1 if j % 2 == 1 else 1) for j in range(dim)]]
    k = 2
    salt = 0
    while len(masks) < n_wraps:
        bits = []
        while len(bits) < dim:
            w = _splitmix64(k * 1_000_003 + salt)
            bits.extend((w >> b) & 1 for b in range(64))
        cand = [(-1 if b else 1) for b in bits[:dim]]
        lo, hi = 16, dim - 16
        if all(lo <= sum(a != b for a, b in zip(cand, m)) <= hi
               for m in masks):
            masks.append(cand)
            k += 1
            salt = 0
        else:
            salt += 1  # deterministic retry; same inputs -> same masks
            if salt > 1000:
                raise SystemExit("sign-mask search stuck — widen bounds")
    return masks[:n_wraps]


TPCH_KEY_SHIFTS = {
    # table -> {column: key-space stride source table}
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}

#: Where each stride column lives.
STRIDE_TABLE = {
    "c_custkey": "customer", "s_suppkey": "supplier",
    "p_partkey": "part", "o_orderkey": "orders",
    "event_id": "events", "user_id": "events",
    "doc_id": "documents", "vec_id": "embeddings",
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--factor", type=int, default=10)
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--dst", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1"))
    p.add_argument("--only", default=None,
                   help="comma-separated table subset — resume a partial "
                        "run (e.g. --only embeddings) without re-deriving "
                        "the tables that already wrote")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def wanted(name: str) -> bool:
        return only is None or name in only

    from gads_etl_spark.session import get_session

    spark = get_session("gen-scale-fixture")
    spark.sparkContext.setLogLevel("ERROR")

    tables = {t: spark.read.parquet(f"{args.src}/{t}.parquet")
              for t in ["region", "nation", "customer", "supplier", "part",
                        "orders", "lineitem", "events", "documents",
                        "embeddings"]}

    # Key-space strides: one past the max of each shiftable key.
    strides: dict[str, int] = {}
    for col, tbl in STRIDE_TABLE.items():
        strides[col] = tables[tbl].agg(
            F.max(col).cast("long")).collect()[0][0] + 1

    def write(name: str, df: DataFrame) -> None:
        if not wanted(name):
            return
        path = f"{args.dst}/{name}.parquet"
        df.write.mode("overwrite").parquet(path)
        print(f"wrote {path}: {spark.read.parquet(path).count()} rows")

    def write_copies(name: str, df: DataFrame, transform,
                     chunk: int = 100) -> None:
        """Write ``factor`` transformed copies, at most ``chunk`` unioned
        per job: a 1000-way union of per-copy expression trees (the doc
        rewrite alone is ~40 nodes per copy) chokes Catalyst planning,
        while 100-way unions are the measured-fine sf10 shape. Chunks
        append to the same dir; factors <= chunk take the identical
        single overwrite job as before."""
        if not wanted(name):
            return
        path = f"{args.dst}/{name}.parquet"
        mode = "overwrite"
        for lo in range(0, args.factor, chunk):
            out = None
            for i in range(lo, min(lo + chunk, args.factor)):
                c = transform(df, i)
                out = c if out is None else out.unionByName(c)
            out.write.mode(mode).parquet(path)
            mode = "append"
        print(f"wrote {path}: {spark.read.parquet(path).count()} rows")

    # Fixed dimensions: pass through unchanged.
    for name in ["region", "nation"]:
        write(name, tables[name])

    # Certify the p_name bijection family up front (distinct + low
    # pairwise agreement — see _check_letter_perms); fails loudly
    # instead of generating a poisoned fixture.
    letter_perms = _check_letter_perms(args.factor)

    # Heavy-hitter plants: constant user ids beyond every copy's range.
    heavy_solid = args.factor * strides["user_id"] + 1   # ~0.3% share
    heavy_marginal = args.factor * strides["user_id"] + 2  # ~0.1% share

    for name, shifts in TPCH_KEY_SHIFTS.items():
        def shift(df, i, name=name, shifts=shifts):
            out = df
            if name == "events":
                # Mark by the ORIGINAL event_id (pre-shift) so every
                # copy reassigns the same logical events; mod 1000 keys
                # 1,2,3 -> solid hitter (0.3%), key 0 -> marginal (0.1%,
                # just above ev_heavy_hitters' 0.0008 support).
                out = out.withColumn(
                    "_hh", F.pmod(F.col("event_id"), F.lit(1000)))
            for col, stride_col in shifts.items():
                out = out.withColumn(
                    col, F.col(col) + F.lit(i * strides[stride_col]))
            if name == "events":
                # Reassign AFTER the key shift: planted ids are fixed
                # points shared by every copy, outside all shifted ranges.
                out = out.withColumn(
                    "user_id",
                    F.when(F.col("_hh").isin(1, 2, 3), F.lit(heavy_solid))
                    .when(F.col("_hh") == 0, F.lit(heavy_marginal))
                    .otherwise(F.col("user_id"))).drop("_hh")
            if name == "part" and i > 0:
                # Copies must not clone p_name: fuzzy matching would see
                # every part 10x duplicated and its OUTPUT would grow
                # quadratically with the factor. Copy i maps letters
                # through rot-i (a char bijection): within-copy
                # Levenshtein distances are preserved EXACTLY (a
                # bijection on the alphabet preserves every unit edit
                # cost), lengths and word shapes are unchanged, and
                # cross-copy names share no content — the same
                # disjoint-vocabulary growth model the documents table
                # uses, i.e. new entities arrive rather than old ones
                # mutating. Suffix schemes were tried and rejected:
                # constant-length suffixes leave every cross-copy
                # same-base pair a Levenshtein-rejected candidate, and
                # any shared constant suffix creates degenerate
                # identical tail SEGMENTS that poison segment-indexed
                # methods (measured: PassJoin 49s at sf1 from ~7k-row
                # segment buckets). Note the rotation deliberately does
                # NOT separate name lengths across copies — fixed
                # (type, brand) blocks keep filling linearly, which is
                # the honest scaling behavior of categorical blocking.
                # Affine cipher j -> (a*j + b) mod 26 instead of bare
                # rotation: rotations alone wrap at factor 26 (az[i:] +
                # az[:i] degenerates to the IDENTITY for i >= 26), which
                # made copies 26/52/78 of a factor-100 run byte-identical
                # to copy 0 and blew the fuzzy-match candidate stream up
                # quadratically. 312 affine maps; past those,
                # _letter_perm composes with powers of the fixed PI
                # permutation (factor 1000 for the sf100 tier), and the
                # whole family is certified distinct with <= 8/26
                # pairwise letter agreement at startup. For i < 312 the
                # map is bit-identical to the round-10 affine family, so
                # existing tiers regenerate identically; any char
                # bijection preserves every unit edit cost.
                out = out.withColumn(
                    "p_name", F.translate("p_name", AZ, letter_perms[i]))
            return out
        write_copies(name, tables[name], shift)

    def doc_copy(df, i):
        toks = F.split(F.col("text"), " ")

        def rewrite(w, p):
            # Class + rare id derive from the TRIGRAM ending at p, never
            # from doc_id: identical base texts rewrite identically
            # (exact dups survive) and shared regions of near-dup texts
            # rewrite identically except at edit boundaries. F.get is
            # 0-based and null-safe out of range (F.hash accepts nulls).
            prev2, prev1 = F.get(toks, p - 2), F.get(toks, p - 1)
            cls = F.pmod(F.hash(prev2, prev1, w, F.lit(11)), F.lit(100))
            mid = F.pmod(F.hash(prev2, prev1, w, F.lit(17)), F.lit(10))
            rare = F.pmod(F.hash(prev2, prev1, w, F.lit(13)), F.lit(100000))
            return (
                F.when(cls < 35, w)  # shared stopword-like head
                .when(cls < 70, F.concat(  # copy-local mid-frequency zone
                    w, F.lit(f"_r{i}_m"), mid.cast("string")))
                .otherwise(F.concat(  # copy-local Heaps tail, df ~ 1-10
                    w, F.lit(f"_r{i}_h"), rare.cast("string")))
            )

        text = F.array_join(F.transform(toks, rewrite), " ")
        return df.select(
            (F.col("doc_id") + F.lit(i * strides["doc_id"])).alias("doc_id"),
            text.alias("text"),
            F.col("lang"),
            F.concat(F.col("source"), F.lit(f"_r{i}")).alias("source"),
            F.length(text).cast("long").alias("n_chars"),
        )
    write_copies("documents", tables["documents"], doc_copy)

    dim = len(tables["embeddings"].select("embedding").first()[0])
    # Per-wrap sign masks (wrap = i // dim): wrap 0 identity, wrap 1 the
    # legacy negate-odd, wraps >= 2 SplitMix64-derived — every pair
    # certified 16..dim-16 apart in Hamming distance so same-rotation
    # cross-wrap twins cap at |cosine| 0.5, below the fixture's ~0.6
    # natural background (see _sign_masks). Each mask is an orthogonal
    # transform: every within-copy norm and cosine is preserved EXACTLY.
    # Wraps 0/1 regenerate existing tiers bit-identically.
    n_wraps = (args.factor - 1) // dim + 1
    masks = _sign_masks(n_wraps, dim)

    def emb_copy(df, i):
        if i == 0:
            return df
        # Rotation wraps at i = dim (7 coprime to dim, so offsets repeat
        # exactly every dim copies): a factor-100 run on dim=64 vectors
        # gave copies i and i+64 IDENTICAL arrays — 36% of the tier with
        # planted exact cross-copy twins (round 10). The per-wrap sign
        # mask breaks the repetition at every wrap.
        r = (7 * i) % dim
        rotated = F.concat(
            F.slice(F.col("embedding"), r + 1, dim - r),
            F.slice(F.col("embedding"), 1, r),
        )
        wrap = i // dim
        if wrap == 1:
            # Keep the exact legacy expression for the second wrap so
            # the sf10 tier regenerates bit-identically.
            rotated = F.transform(
                rotated,
                lambda v, j: F.when(j % 2 == 1, -v).otherwise(v))
        elif wrap >= 2:
            neg = [j for j, m in enumerate(masks[wrap]) if m == -1]

            # Close over ``neg`` with a nested def, NOT a default arg:
            # F.transform derives the HOF's arity from the callable's
            # parameter count, so ``lambda v, j, neg=neg`` builds an
            # (invalid) 3-arg lambda — INVALID_LAMBDA_FUNCTION_CALL.
            def _mask(v, j):
                return F.when(j.isin(neg), -v).otherwise(v)

            rotated = F.transform(rotated, _mask)
        return df.select(
            (F.col("vec_id") + F.lit(i * strides["vec_id"])).alias("vec_id"),
            rotated.alias("embedding"),
            F.col("label"),
        )
    write_copies("embeddings", tables["embeddings"], emb_copy)

    spark.stop()


if __name__ == "__main__":
    main()
