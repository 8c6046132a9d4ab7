"""Real image-container header parsing (pure Python, public format specs)
feeding the mapInPandas decode stage — upgrades the r1 fake-only stub."""

from __future__ import annotations

import struct

import pytest

from game_library_enrichment_etl_spark.operators.multimodal import (
    decode_binary_column,
    parse_image_header,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\0" * 8


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\0" * 16


def _bmp(w: int, h: int) -> bytes:
    header = b"BM" + b"\0" * 16 + struct.pack("<ii", w, h)
    return header + b"\0" * 16


def _jpeg(w: int, h: int) -> bytes:
    # SOI, APP0 (JFIF), DQT (dummy), SOF0 with dims, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\0" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\0\0"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def test_parse_headers_true_dimensions():
    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200)
    assert parse_image_header(_bmp(800, 600)) == ("bmp", 800, 600)
    assert parse_image_header(_bmp(800, -600)) == ("bmp", 800, 600)  # top-down BMP
    assert parse_image_header(_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    # non-images fall through to the stub path
    assert parse_image_header(b"plain bytes, definitely not an image....") is None
    assert parse_image_header(b"\xff\xd8 truncated") is None
    assert parse_image_header(None) is None


def test_decode_stage_uses_real_headers(spark):
    rows = [
        (1, bytearray(_png(12, 34))),
        (2, bytearray(_jpeg(56, 78))),
        (3, bytearray(b"not an image " * 8)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    out = {r["doc_id"]: r for r in decode_binary_column(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (12, 34)
    assert (out[2]["width"], out[2]["height"]) == (56, 78)
    # non-image: deterministic stub dims (function of byte length)
    assert out[3]["width"] is not None and out[3]["n_bytes"] == 104
    assert out[4]["width"] is None and out[4]["n_bytes"] == 0
    assert len(out[1]["features"]) == 8


def test_real_decode_failure_falls_back(spark, monkeypatch):
    """ADVICE r3 low #4: with the real decoder enabled, a raise inside the
    pixel decode (corrupt body — or, in this PIL-less container, the
    missing import itself) must fall back to the header-based stub row
    instead of failing the whole mapInPandas stage. The driver-side gate
    is monkeypatched open; the executor-side _real_decode_one then raises
    for real, exercising the try/except fallback end-to-end."""
    import game_library_enrichment_etl_spark.operators.multimodal as mm

    monkeypatch.setattr(mm, "REAL_DECODER_AVAILABLE", True)
    df = spark.createDataFrame(
        [(1, bytearray(_png(12, 34)))], "doc_id bigint, blob binary"
    )
    out = decode_binary_column(df, real=True).collect()[0]
    # header dims survive; the stage did not fail
    assert (out["width"], out["height"]) == (12, 34)
    assert len(out["features"]) == 8


@pytest.mark.skipif(
    not __import__(
        "game_library_enrichment_etl_spark.operators.multimodal",
        fromlist=["REAL_DECODER_AVAILABLE"],
    ).REAL_DECODER_AVAILABLE,
    reason="PIL not installed in this container",
)
def test_real_decode_true_pixels(spark):
    """Where PIL exists, the real path must decode true dimensions (the
    container lacks PIL, so this is coverage for richer environments)."""
    df = spark.createDataFrame(
        [(1, bytearray(_png(12, 34)))], "doc_id bigint, blob binary"
    )
    out = decode_binary_column(df, real=True).collect()[0]
    assert (out["width"], out["height"]) == (12, 34)
