"""Pure-stdlib PNG decode kernel: real pixels through zlib + unfiltering.

The encoder below is test-only and independent of the decoder: it builds
spec-conformant PNGs (struct + zlib) applying a chosen scanline filter,
so every filter type (None/Sub/Up/Average/Paeth) is exercised against
pixel ground truth.
"""

import struct
import zlib

import pytest

from grower_spark.operators.multimodal import _png_one


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if pa <= pb and pa <= pc else b if pb <= pc else c


def encode_png(pixels, channels: int, filter_type: int = 0) -> bytes:
    """pixels: list of rows, each row a flat list of channel bytes."""
    height = len(pixels)
    width = len(pixels[0]) // channels
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    raw = bytearray()
    prev = [0] * (width * channels)
    for row in pixels:
        raw.append(filter_type)
        for i, v in enumerate(row):
            left = row[i - channels] if i >= channels else 0
            up = prev[i]
            ul = prev[i - channels] if i >= channels else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) // 2,
                4: _paeth(left, up, ul),
            }[filter_type]
            raw.append((v - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


GRADIENT_RGB = [
    [(x * 37 + y * 11 + c * 5) % 256 for x in range(5) for c in range(3)]
    for y in range(4)
]


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_rgb_all_filters(filter_type):
    png = encode_png(GRADIENT_RGB, 3, filter_type)
    w, h, ch, luma, dec = _png_one(png)
    assert (w, h, ch, dec) == (5, 4, 3, "png")
    expect = sum(
        0.299 * row[x] + 0.587 * row[x + 1] + 0.114 * row[x + 2]
        for row in GRADIENT_RGB
        for x in range(0, 15, 3)
    ) / 20
    assert abs(luma - expect) < 1e-9


def test_png_grey_and_rgba():
    grey = [[(x * 50) % 256 for x in range(4)] for _ in range(2)]
    w, h, ch, luma, _ = _png_one(encode_png(grey, 1, 2))
    assert (w, h, ch) == (4, 2, 1)
    assert abs(luma - sum(grey[0]) / 4) < 1e-9

    rgba = [[10, 20, 30, 255, 40, 50, 60, 128] for _ in range(3)]
    w, h, ch, luma, _ = _png_one(encode_png(rgba, 4, 4))
    assert (w, h, ch) == (2, 3, 4)
    expect = (0.299 * 10 + 0.587 * 20 + 0.114 * 30
              + 0.299 * 40 + 0.587 * 50 + 0.114 * 60) / 2
    assert abs(luma - expect) < 1e-9


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        _png_one(b"JFIF not a png")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError):
        _png_one(bad)


def test_auto_decoder_uses_png_kernel_in_spark(spark):
    """auto mode: PNG payloads get the real kernel, others the stub —
    through the actual mapInPandas plumbing."""
    from grower_spark.operators.multimodal import DECODED_SCHEMA, _decode_batch
    import pandas as pd

    png = encode_png(GRADIENT_RGB, 3, 4)
    src = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"plain text bytes"))],
        "doc_id long, media_bytes binary",
    )
    out = src.mapInPandas(
        lambda it: (_decode_batch(b, "auto") for b in it), DECODED_SCHEMA
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].decoder == "png"
    assert (by_id[1].width, by_id[1].height, by_id[1].n_channels) == (5, 4, 3)
    assert by_id[2].decoder == "stub"
