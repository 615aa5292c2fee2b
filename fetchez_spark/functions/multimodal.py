"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested -- schema, ``mapInPandas``
batch shape, partitioning -- while the actual codec step is stubbed
(image/audio libraries are not in this container).  Swap ``_decode_stub``
for PIL/soundfile/ffmpeg in a real deployment; nothing else changes.

Pattern: binary payloads stay in executor memory as Arrow buffers end to
end; per-batch (not per-row) Python via ``mapInPandas``; metadata columns
(width/height/duration/...) become ordinary pruned/pushed-down columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    list(MEDIA_SCHEMA.fields)
    + [
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

REAL_CODECS_AVAILABLE = False  # no PIL/ffmpeg in this container


def _decode_stub(kind: str, payload: bytes | None) -> dict:
    """Deterministic fake decode. Replace with a real codec.

    Raises for unknown kinds the way a real decoder would."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    if payload is None:
        return {"width": None, "height": None, "n_frames": None}
    h = len(payload)
    if kind == "image":
        return {"width": (h % 64) + 1, "height": (h % 48) + 1, "n_frames": 1}
    if kind == "video":
        return {"width": (h % 64) + 1, "height": (h % 48) + 1, "n_frames": (h % 30) + 1}
    return {"width": None, "height": None, "n_frames": None}


def decode_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary media columns."""
    import hashlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_stub(k, p) for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            pdf = pdf.copy()
            pdf["byte_len"] = [len(p) if p is not None else 0 for p in pdf["payload"]]
            pdf["checksum"] = [
                hashlib.md5(p).hexdigest() if p is not None else None for p in pdf["payload"]
            ]
            pdf["width"] = pd.array([m["width"] for m in meta], dtype="Int32")
            pdf["height"] = pd.array([m["height"] for m in meta], dtype="Int32")
            pdf["n_frames"] = pd.array([m["n_frames"] for m in meta], dtype="Int32")
            yield pdf

    return df.mapInPandas(fn, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    The frame extraction itself is the stubbed codec; the explode shape
    (one media row -> n frame rows, provenance retained) mirrors the
    reference's unzip flatMap (/root/reference/src/fetchez/hooks/builtins/
    file_ops/unzip.py:57-113)."""
    decoded = decode_metadata(df)
    return decoded.select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("n_frames"), F.lit(1)) - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
