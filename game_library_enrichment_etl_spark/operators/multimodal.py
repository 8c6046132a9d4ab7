"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators over ``mapInPandas`` (per-partition batch streaming — the
right shape for 100 TB: no driver collect, bounded memory per batch).

The actual media codecs are NOT in this container, so the decode kernels
are STUBBED with a clearly-marked deterministic fake (byte-arithmetic) —
the Spark-side plumbing (schema, partitioning, UDF signature, Arrow batch
shape) is real and tested. Swap ``_fake_decode`` for PIL/ffmpeg in a real
deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

REAL_DECODER_AVAILABLE = False  # no PIL/ffmpeg in this container


def _fake_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decode: pretends the byte length
    encodes dimensions and the first 32 bytes are an 8-dim feature vector.
    STUB — replace with a real codec; raises if asked for real decoding."""
    n = len(blob)
    width = 64 + (n % 577)
    height = 64 + ((n * 31) % 433)
    head = np.frombuffer(blob[:32].ljust(32, b"\0"), dtype=np.uint8).astype(np.float32)
    feats = head.reshape(8, 4).mean(axis=1) / 255.0
    return width, height, [float(round(x, 6)) for x in feats]


def decode_binary_column(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", real: bool = False
) -> DataFrame:
    """mapInPandas decode stage: (id, blob) -> (id, n_bytes, width, height,
    features[8]). Arrow-batched; one pandas frame per partition batch."""
    if real and not REAL_DECODER_AVAILABLE:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg — not available in this "
            "container; run with real=False for the deterministic stub"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            decoded = [
                (None, None, None) if b is None else _fake_decode(bytes(b)) for b in blobs
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [0 if b is None else len(bytes(b)) for b in blobs],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return df.select(df[id_col], df[blob_col]).mapInPandas(op, DECODE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", every: int = 1024
) -> DataFrame:
    """Video-style frame sampling stub: emit one 'frame' (byte slice) per
    ``every`` bytes — exercises the 1-to-N mapInPandas fan-out shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                bb = bytes(b)
                for f, off in enumerate(range(0, len(bb), every)):
                    ids.append(int(i))
                    idxs.append(f)
                    frames.append(bb[off : off + every])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.select(df[id_col], df[blob_col]).mapInPandas(op, FRAME_SAMPLE_SCHEMA)
