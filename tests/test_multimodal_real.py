"""Pure-Python PNG pixel decode (operators/multimodal.decode_png_pure) —
VERDICT r4 next #6: the real-decode path had zero CI coverage because it
gated on PIL, absent in this container. Now it executes everywhere; these
tests encode tiny PNGs with an INDEPENDENT in-test encoder (spec-side:
chunk framing + per-row filters applied forward) and assert the decoder
reconstructs the exact pixels through every filter type and color type,
that luminance matches the ITU-R 601-2 integer formula, that the Spark
mapInPandas stage carries the real features end-to-end, and (where PIL
exists) that the pure decoder agrees with Pillow bit-for-bit.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from game_library_enrichment_etl_spark.operators import multimodal as MM


# ------------------------------------------------------- in-test PNG encoder
def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_rows(px: np.ndarray, channels: int, filters: list[int]) -> bytes:
    """Apply PNG filters FORWARD (the encoder direction) row by row —
    independent arithmetic from the decoder's unfiltering."""
    h, w = px.shape[0], px.shape[1]
    stride = w * channels
    flat = px.reshape(h, stride).astype(np.int16)
    out = bytearray()
    bpp = channels
    for r in range(h):
        ft = filters[r % len(filters)]
        cur = flat[r]
        prev = flat[r - 1] if r else np.zeros(stride, dtype=np.int16)
        enc = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(cur[x]) - pred) & 0xFF
        out.append(ft)
        out += enc.astype(np.uint8).tobytes()
    return bytes(out)


def _png_encode(
    px: np.ndarray, color_type: int, filters: list[int] | None = None,
    plte: np.ndarray | None = None,
) -> bytes:
    """Minimal spec-conformant PNG writer for 8-bit non-interlaced images.
    ``px``: HxW (ct 0/3), HxWx2 (ct 4), HxWx3 (ct 2), HxWx4 (ct 6)."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    if px.ndim == 2:
        px = px[:, :, None]
    assert px.shape[2] == channels
    h, w = px.shape[0], px.shape[1]
    raw = _filter_rows(px, channels, filters or [0])
    out = b"\x89PNG\r\n\x1a\n"
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
    if color_type == 3:
        out += _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return out


def _rng_px(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def _luma(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[:, :, k].astype(np.uint32) for k in range(3))
    return (((r * 19595 + g * 38470 + b * 7471) + 0x8000) >> 16).astype(np.uint8)


# ------------------------------------------------------------- decoder unit
def test_grey_roundtrip_every_filter():
    px = _rng_px((11, 7), 1)
    for ft in (0, 1, 2, 3, 4):
        got = MM.decode_png_pure(_png_encode(px, 0, filters=[ft]))
        np.testing.assert_array_equal(got, px)


def test_rgb_roundtrip_mixed_filters_luma():
    px = _rng_px((16, 9, 3), 2)
    blob = _png_encode(px, 2, filters=[0, 1, 2, 3, 4])  # cycle all filters
    np.testing.assert_array_equal(MM.decode_png_pure(blob), _luma(px))


def test_rgba_alpha_ignored():
    px = _rng_px((6, 6, 4), 3)
    got = MM.decode_png_pure(_png_encode(px, 6, filters=[4, 2]))
    np.testing.assert_array_equal(got, _luma(px[:, :, :3]))


def test_grey_alpha_uses_grey_channel():
    px = _rng_px((5, 8, 2), 4)
    got = MM.decode_png_pure(_png_encode(px, 4, filters=[1, 3]))
    np.testing.assert_array_equal(got, px[:, :, 0])


def test_palette_roundtrip():
    plte = _rng_px((16, 3), 5)
    idx = _rng_px((9, 9), 6) % 16
    got = MM.decode_png_pure(_png_encode(idx, 3, filters=[2, 4], plte=plte))
    np.testing.assert_array_equal(got, _luma(plte[idx]))


def test_unsupported_and_corrupt_raise():
    px = _rng_px((4, 4), 7)
    blob = bytearray(_png_encode(px, 0))
    blob[24] = 16  # bit depth 16 (IHDR depth byte)
    with pytest.raises(ValueError):
        MM.decode_png_pure(bytes(blob))
    good = _png_encode(px, 0)
    with pytest.raises(Exception):  # corrupt IDAT: zlib error or ValueError
        MM.decode_png_pure(good[:40] + b"\x00" * (len(good) - 40))
    with pytest.raises(ValueError):
        MM.decode_png_pure(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


@pytest.mark.skipif(not MM.REAL_DECODER_AVAILABLE, reason="PIL not installed")
def test_pure_decoder_matches_pil():
    import io

    from PIL import Image

    px = _rng_px((13, 10, 3), 8)
    blob = _png_encode(px, 2, filters=[0, 1, 2, 3, 4])
    pil = np.asarray(Image.open(io.BytesIO(blob)).convert("L"), dtype=np.uint8)
    np.testing.assert_array_equal(MM.decode_png_pure(blob), pil)


# ------------------------------------------------------- Spark stage (e2e)
def test_decode_stage_real_features_end_to_end(spark):
    """The mapInPandas stage with real=True: a valid PNG yields TRUE
    dimensions + band features computed from actual pixels (checked
    against an independent numpy computation); a corrupt-body PNG falls
    back to the header stub row (header dims, byte-head features); a
    non-image blob takes the fake-decode path. No raise anywhere."""
    px = _rng_px((32, 16), 9)
    good = _png_encode(px, 0, filters=[4, 1, 3])
    # valid signature + IHDR, garbage body
    corrupt = good[:33] + _chunk(b"IDAT", b"garbage") + _chunk(b"IEND", b"")
    rows = pd.DataFrame(
        {"doc_id": [1, 2, 3], "blob": [good, corrupt, b"not an image at all"]}
    )
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = (
        MM.decode_binary_column(df, real=True)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # real decode: true dims + luminance-band features
    assert (int(out.loc[0, "width"]), int(out.loc[0, "height"])) == (16, 32)
    want = [
        float(b.mean()) / 255.0
        for b in np.array_split(px.astype(np.float64), 8, axis=0)
    ]
    got = [float(x) for x in out.loc[0, "features"]]
    assert max(abs(a - b) for a, b in zip(got, want)) < 1e-4
    # corrupt body: header dims survive, stub features, no raise
    assert (int(out.loc[1, "width"]), int(out.loc[1, "height"])) == (16, 32)
    assert len(out.loc[1, "features"]) == 8
    # non-image: fake-decode path
    assert int(out.loc[2, "width"]) == 64 + (len(b"not an image at all") % 577)
