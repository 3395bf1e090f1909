"""Multimodal columns: opaque binary payloads + typed metadata + decode UDFs.

Pattern for image/audio/video at 100 TB: the payload travels as a
``binary`` column next to typed metadata; decode / feature-extraction runs
as Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects. The media libraries are not available in this container, so
the *decode kernel* is a clearly-marked deterministic stub — the Spark
plumbing (schema, batching, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("features", T.ArrayType(T.DoubleType()), False),
])


def as_binary_payload(df: DataFrame, id_col: str = "doc_id",
                      content_col: str = "text") -> DataFrame:
    """Model content as an opaque binary payload with typed metadata —
    the layout an image/audio column would use (payload + byte_len + sha).
    """
    payload = F.col(content_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _decode_stub(payload: bytes) -> list[float]:
    """STUB decode kernel — deterministic fake features.

    A real deployment would decode the media here (PIL / torchaudio /
    pyav); those libraries are not in this container. The fake is a
    byte-histogram moment vector: deterministic, content-sensitive, and
    shaped exactly like a real feature extractor's output.
    """
    if not payload:
        return [0.0] * FEATURE_DIM
    n = len(payload)
    buckets = [0] * FEATURE_DIM
    for b in payload:
        buckets[b % FEATURE_DIM] += 1
    return [round(c / n, 6) for c in buckets]


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.LongType(), False),
    T.StructField("frame", T.BinaryType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
])


def _frame_stub(payload: bytes, idx: int, size: int) -> bytes:
    """STUB frame decoder — a real one would seek/decode with pyav.
    Deterministic slice standing in for one decoded+resized frame."""
    start = (idx * size) % max(len(payload), 1)
    chunk = payload[start:start + size]
    return bytes(chunk) + b"\x00" * (size - len(chunk))


def sample_frames(payloads: DataFrame, every_nth: int = 4,
                  max_frames: int = 3, height: int = 8, width: int = 8) -> DataFrame:
    """Frame sampling + resize plumbing: one payload row explodes into N
    fixed-size frame rows via mapInPandas (the 1→N multimodal shape —
    video → sampled frames, audio → windows). Decode/resize kernels are
    stubs; the schema, Arrow batching, and fan-out are real.
    """
    frame_bytes = height * width

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [],
                   "height": [], "width": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = min(max_frames, max(len(payload) // (every_nth * frame_bytes), 1))
                for i in range(n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i * every_nth)
                    out["frame"].append(_frame_stub(payload, i * every_nth, frame_bytes))
                    out["height"].append(height)
                    out["width"].append(width)
            yield pd.DataFrame(out)

    return payloads.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def decode_features(payloads: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (doc_id, payload) batches.

    Each batch is one pandas DataFrame per Arrow chunk — the executor
    decodes thousands of payloads per Python call instead of one, which is
    the only viable shape for binary decode at scale.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "features": pdf["payload"].map(_decode_stub),
            })

    return payloads.select("doc_id", "payload").mapInPandas(decode, DECODED_SCHEMA)
