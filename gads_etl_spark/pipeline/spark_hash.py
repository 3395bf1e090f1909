"""Driver-side Murmur3 matching Spark's ``F.hash(...)`` for literal keys.

``_VersionedTable.read_bucket_for`` prunes a point lookup to one bucket by
evaluating ``pmod(hash(key...), n_buckets)``. Evaluating that through the
engine costs a full Spark job (``spark.range(1)...collect()``) per lookup —
noise inside a 2.4s batch lookup, but a scheduler round trip on every
``get()`` if the control plane ever serves interactive traffic (round-12
verdict nit). This module computes the identical value in pure Python for
the key types the control tables actually use, with the engine expression
kept as the fallback for anything not covered.

Exactness contract: Spark's hash expression is Murmur3_x86_32 with seed 42,
one column at a time, the previous column's hash becoming the next column's
seed, nulls leaving the seed untouched
(spark/sql/catalyst/expressions/hash.scala, Murmur3_x86_32.java — public
Apache source). Per-type encodings implemented here:

- int / short / byte / boolean  -> hashInt(value)
- long                          -> hashLong(value)
- date                          -> hashInt(days since 1970-01-01)
- string                        -> hashUnsafeBytes(UTF-8 bytes): the 4-byte
  little-endian aligned prefix word-by-word, then each remaining byte
  SIGN-EXTENDED and mixed as its own int (Spark's tail differs from
  canonical Murmur3 here — per-byte mixK1/mixH1, not a tail accumulator).

Timestamps, floats, decimals, binary, and nested types are deliberately
NOT implemented (timestamp literals pass through session-timezone
conversion that this module must not re-guess); ``bucket_for`` returns
None for them and the caller uses the engine path. A property test
(tests/test_control_plane.py, the spark_hash block) pins every
implemented type against the engine expression over randomized keys.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import types as T

_MASK = 0xFFFFFFFF
_EPOCH = _dt.date(1970, 1, 1)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _hash_int(value: int, seed: int) -> int:
    return _fmix(_mix_h1(seed & _MASK, _mix_k1(value & _MASK)), 4)


def _hash_long(value: int, seed: int) -> int:
    low = value & _MASK
    high = (value >> 32) & _MASK
    h1 = _mix_h1(seed & _MASK, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, 8)


def _hash_bytes(data: bytes, seed: int) -> int:
    h1 = seed & _MASK
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i:i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, len(data)):
        b = data[i]
        if b >= 128:  # Java bytes are signed; sign-extend before mixing
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _fmix(h1, len(data))


def _to_signed32(x: int) -> int:
    x &= _MASK
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_literals(values: tuple, dtypes: tuple) -> int | None:
    """``F.hash(lit(v1).cast(t1), lit(v2).cast(t2), ...)`` as a signed
    32-bit int, or None when any (value, type) pair is outside the
    implemented subset — the caller must then evaluate engine-side."""
    h = 42
    for v, t in zip(values, dtypes):
        if v is None:
            continue  # null input leaves the running seed unchanged
        if isinstance(t, T.StringType) and isinstance(v, str):
            h = _hash_bytes(v.encode("utf-8"), h)
        elif isinstance(t, (T.IntegerType, T.ShortType, T.ByteType)) \
                and isinstance(v, int):
            h = _hash_int(v, h)
        elif isinstance(t, T.LongType) and isinstance(v, int):
            h = _hash_long(v, h)
        elif isinstance(t, T.BooleanType) and isinstance(v, bool):
            h = _hash_int(1 if v else 0, h)
        elif isinstance(t, T.DateType):
            if isinstance(v, str):
                # Only the canonical yyyy-MM-dd form, where Spark's
                # string->date cast and fromisoformat provably agree;
                # looser spellings ('2024-1-1', '20240101') fall back to
                # the engine rather than risk a divergent parse.
                if len(v) != 10 or v[4] != "-" or v[7] != "-":
                    return None
                try:
                    v = _dt.date.fromisoformat(v)
                except ValueError:
                    return None
            if isinstance(v, _dt.datetime) or not isinstance(v, _dt.date):
                return None
            h = _hash_int((v - _EPOCH).days, h)
        else:
            return None
    return _to_signed32(h)


def bucket_for(values: tuple, dtypes: tuple, n_buckets: int) -> int | None:
    """``pmod(hash(...), n_buckets)`` driver-side, or None when the key
    falls outside the implemented type subset."""
    h = hash_literals(values, dtypes)
    if h is None:
        return None
    return h % n_buckets  # Python % of a positive modulus == Spark pmod
