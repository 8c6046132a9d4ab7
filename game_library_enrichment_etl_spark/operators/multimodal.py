"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators over ``mapInPandas`` (per-partition batch streaming — the
right shape for 100 TB: no driver collect, bounded memory per batch).

Decoding levels:
- ``parse_image_header`` — a REAL pure-Python container-format parser for
  PNG / GIF / JPEG / BMP headers (from the public format specs): true
  width/height + codec name, no external libs. This is what the decode
  stage uses whenever the blob is an actual image.
- ``_fake_decode`` — the clearly-marked deterministic fallback for blobs
  that are not parseable images (the synthetic testdata), so the pipeline
  shape stays exercised end-to-end.
- full pixel decode (``real=True``) needs PIL/ffmpeg, absent in this
  container -> NotImplementedError by design.
"""

from __future__ import annotations

import struct
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

# optional-import seam for real pixel decode: PIL is absent in this
# container, so the flag gates the real path at runtime instead of
# hardcoding the environment's limitation into the API
try:  # pragma: no cover - depends on environment
    from PIL import Image as _PIL_Image

    REAL_DECODER_AVAILABLE = True
except ImportError:
    _PIL_Image = None
    REAL_DECODER_AVAILABLE = False


def _real_decode_one(bb: bytes) -> tuple:
    """Pixel decode via PIL (only reachable when REAL_DECODER_AVAILABLE):
    true dimensions + an 8-dim feature = mean of 8 horizontal luminance
    bands (deterministic; no resampling randomness)."""
    import io

    img = _PIL_Image.open(io.BytesIO(bb))
    w, h = img.size
    lum = np.asarray(img.convert("L"), dtype=np.float32) / 255.0
    bands = np.array_split(lum, 8, axis=0)
    feats = [float(round(float(b.mean()) if b.size else 0.0, 6)) for b in bands]
    return (w, h, feats)


def parse_image_header(blob: bytes) -> tuple[str, int, int] | None:
    """Parse (codec, width, height) from real image container headers.

    Pure-Python readers for the public container formats:
    - PNG:  8-byte signature, then the IHDR chunk holds BE width/height
    - GIF:  'GIF87a'/'GIF89a' signature, then LE logical screen w/h
    - BMP:  'BM' + BITMAPINFOHEADER LE width/height at offsets 18/22
    - JPEG: scan segment markers to the first SOFn frame header (BE h, w)

    Returns None when the blob is not a recognized image — callers fall
    back to the deterministic stub so non-image payloads keep flowing.
    """
    if blob is None or len(blob) < 16:
        return None
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR" and len(blob) >= 24:
        w, h = struct.unpack(">II", blob[16:24])
        return ("png", w, h)
    if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
        w, h = struct.unpack("<HH", blob[6:10])
        return ("gif", w, h)
    if blob[:2] == b"BM" and len(blob) >= 26:
        w, h = struct.unpack("<ii", blob[18:26])
        return ("bmp", w, abs(h))  # negative height = top-down rows
    if blob[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to a frame header
        i = 2
        n = len(blob)
        while i + 2 <= n:
            if blob[i] != 0xFF:
                return None
            # runs of 0xFF are legal fill/padding before a marker byte
            while i + 1 < n and blob[i + 1] == 0xFF:
                i += 1
            if i + 2 > n:
                return None
            marker = blob[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-payload
                i += 2
                continue
            if marker == 0xD9:  # EOI: end of stream, no frame header found
                return None
            if i + 4 > n:
                return None
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            # SOF0..SOF15 except DHT(C4)/DAC(CC)/RST: frame header with dims
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None


def _fake_decode(blob: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for decoding NON-image blobs: pretends the
    byte length encodes dimensions and the first 32 bytes are an 8-dim
    feature vector. STUB by design — real images never reach it (the
    header parser above handles them)."""
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

    def _decode_one(b) -> tuple:
        if b is None:
            return (None, None, None)
        bb = bytes(b)
        hdr = parse_image_header(bb)
        if real and hdr is not None:
            # a blob whose container header parses can still have a
            # truncated/corrupt body; a PIL raise inside mapInPandas would
            # fail the whole stage, so fall back to the header-based stub
            # row like every other malformed input
            try:
                return _real_decode_one(bb)
            except Exception:
                pass
        if hdr is not None:  # real container format: true dimensions
            _, w, h = hdr
            head = np.frombuffer(bb[:32].ljust(32, b"\0"), dtype=np.uint8).astype(np.float32)
            feats = head.reshape(8, 4).mean(axis=1) / 255.0
            return (w, h, [float(round(x, 6)) for x in feats])
        return _fake_decode(bb)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            decoded = [_decode_one(b) for b in blobs]
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
