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


def _make_wav(rate=16000, nch=1, width=2, n=1000, amp=10000):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(width)
        w.setframerate(rate)
        samples = [int(amp * math.sin(2 * math.pi * 440 * i / rate)) for i in range(n)]
        if width == 2:
            data = b"".join(struct.pack("<h", s) for s in samples for _ in range(nch))
        else:
            data = bytes(((s >> 8) + 128) & 0xFF for s in samples for _ in range(nch))
        w.writeframes(data)
    return buf.getvalue()


def test_wav_kernel_features():
    import math

    from grower_spark.operators.multimodal import _wav_one

    rate, nch, nframes, dur_ms, rms_milli, dec = _wav_one(_make_wav())
    assert (rate, nch, nframes, dec) == (16000, 1, 1000, "wav")
    assert dur_ms == 62  # 1000 frames / 16 kHz
    # a 10000-amplitude sine's RMS ~ 10000/sqrt(2)/32768 ~ 0.2158
    assert abs(rms_milli - round(10000 / math.sqrt(2) / 32768 * 1000)) <= 2


def test_decode_audio_auto_routes_by_magic(spark):
    from grower_spark.operators.multimodal import decode_audio

    src = spark.createDataFrame(
        [(1, bytearray(_make_wav(nch=2))), (2, bytearray(b"not audio at all"))],
        "doc_id long, media_bytes binary",
    )
    out = {r.doc_id: r for r in decode_audio(src).collect()}
    assert out[1].decoder == "wav" and out[1].n_channels == 2
    assert out[2].decoder == "stub"


def test_jpeg_and_gif_meta_kernels():
    import struct

    from grower_spark.operators.multimodal import _gif_meta_one, _jpeg_meta_one

    # minimal JPEG: SOI + APP0 + a progressive SOF2 frame header
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
    sof = b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 480, 640, 3) + bytes(2)
    jpeg = b"\xff\xd8" + app0 + sof
    assert _jpeg_meta_one(jpeg) == (640, 480, 3, None, "jpeg-meta")

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + bytes(3)
    assert _gif_meta_one(gif) == (320, 200, 3, None, "gif-meta")

    import pytest as _pytest
    with _pytest.raises(ValueError):
        _jpeg_meta_one(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_auto_decoder_routes_jpeg_gif(spark):
    import math
    import struct

    from grower_spark.operators.multimodal import DECODED_SCHEMA, _decode_batch

    sof = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 2, 3, 1) + bytes(2)
    jpeg = b"\xff\xd8" + sof
    gif = b"GIF87a" + struct.pack("<HH", 7, 5) + bytes(3)
    src = spark.createDataFrame(
        [(1, bytearray(jpeg)), (2, bytearray(gif))],
        "doc_id long, media_bytes binary",
    )
    out = {r.doc_id: r for r in src.mapInPandas(
        lambda it: (_decode_batch(b, "auto") for b in it), DECODED_SCHEMA
    ).collect()}
    assert (out[1].width, out[1].height, out[1].decoder) == (3, 2, "jpeg-meta")
    assert out[1].mean_luma is None or math.isnan(out[1].mean_luma)
    assert (out[2].width, out[2].height, out[2].decoder) == (7, 5, "gif-meta")


def _box(btype: bytes, payload: bytes) -> bytes:
    import struct
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _make_mp4(duration_s=7, timescale=1000, w=640, h=360, version=0):
    import struct

    # tkhd width offset per ISO-BMFF: fullbox(4) + times/id/dur
    # (20 v0 / 32 v1) + reserved+layer+volume(16) + matrix(36)
    if version == 1:
        mvhd = bytes([1, 0, 0, 0]) + bytes(16) + struct.pack(
            ">IQ", timescale, duration_s * timescale
        ) + bytes(80)
        tkhd_head = bytes([1, 0, 0, 0]) + bytes(88 - 4)
    else:
        mvhd = bytes(4) + bytes(8) + struct.pack(
            ">II", timescale, duration_s * timescale
        ) + bytes(80)
        tkhd_head = bytes(4) + bytes(76 - 4)
    tkhd = tkhd_head + struct.pack(">II", w << 16, h << 16)
    trak = _box(b"trak", _box(b"tkhd", tkhd))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + trak)
    ftyp = _box(b"ftyp", b"isom" + bytes(8))
    return ftyp + moov


def test_mp4_meta_kernel():
    from grower_spark.operators.multimodal import _mp4_meta_one

    assert _mp4_meta_one(_make_mp4()) == (7000, 640, 360, 1, "mp4-meta")
    assert _mp4_meta_one(_make_mp4(duration_s=3, timescale=90000, w=1920,
                                   h=1080, version=1)) == (
        3000, 1920, 1080, 1, "mp4-meta"
    )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        _mp4_meta_one(b"RIFF1234WEBP")


def test_video_meta_auto_routes(spark):
    from grower_spark.operators.multimodal import video_meta

    src = spark.createDataFrame(
        [(1, bytearray(_make_mp4())), (2, bytearray(b"x" * 90))],
        "doc_id long, media_bytes binary",
    )
    out = {r.doc_id: r for r in video_meta(src).collect()}
    assert (out[1].duration_ms, out[1].width, out[1].height, out[1].decoder) == (
        7000, 640, 360, "mp4-meta"
    )
    assert out[2].decoder == "stub"


def test_auto_mode_degrades_corrupt_media_to_stub():
    """Corpus-scale rule: one bad file must never abort the job — auto
    mode stubs anything the real kernels reject."""
    from grower_spark.operators.multimodal import _decode_batch
    import pandas as pd

    png = encode_png(GRADIENT_RGB, 3, 0)
    truncated = png[: len(png) // 2]
    batch = pd.DataFrame({"doc_id": [1, 2], "media_bytes": [truncated, b"\xff\xd8\xff\xd9"]})
    out = _decode_batch(batch, "auto")
    assert list(out["decoder"]) == ["stub", "stub"]
    # pinned decoder stays strict
    import pytest as _pytest
    with _pytest.raises(Exception):
        _decode_batch(pd.DataFrame({"doc_id": [1], "media_bytes": [truncated]}), "png")


def test_jpeg_fill_bytes_before_marker():
    import struct

    from grower_spark.operators.multimodal import _jpeg_meta_one

    sof = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 10, 20, 3) + bytes(2)
    jpeg = b"\xff\xd8" + b"\xff\xff\xff" + sof  # spec-permitted fill bytes
    assert _jpeg_meta_one(jpeg) == (20, 10, 3, None, "jpeg-meta")


def test_magic_decoder_routes_and_rejects(spark):
    """The pinned 'magic' route dispatches PNG/JPEG/GIF to the real
    stdlib kernels by magic bytes and REJECTS anything else (unlike
    'auto', which stubs unknowns) — env-independent by construction."""
    import pyspark.sql.functions as F
    import pytest

    from grower_spark.operators.multimodal import decode_images, synthesize_media

    docs = spark.createDataFrame(
        [(i,) for i in range(6)], "doc_id long"
    )
    media = (
        synthesize_media(docs.where(F.col("doc_id") < 2), "png")
        .unionByName(
            synthesize_media(
                docs.where((F.col("doc_id") >= 2) & (F.col("doc_id") < 4)), "jpeg"
            )
        )
        .unionByName(synthesize_media(docs.where(F.col("doc_id") >= 4), "gif"))
    )
    rows = {r["doc_id"]: r["decoder"]
            for r in decode_images(media, decoder="magic").collect()}
    assert rows == {0: "png", 1: "png", 2: "jpeg-meta", 3: "jpeg-meta",
                    4: "gif-meta", 5: "gif-meta"}
    # non-media bytes under 'magic' must FAIL the task, not silently stub
    junk = spark.createDataFrame([(9, bytearray(b"plain text"))],
                                 "doc_id long, media_bytes binary")
    with pytest.raises(Exception, match="magic decoder|PythonException"):
        decode_images(junk, decoder="magic").collect()


def test_auto_decoder_never_fails_on_arbitrary_bytes(spark):
    """Corpus-scale rule: one corrupt file must never abort the job —
    decode_images(decoder='auto') degrades anything unparseable to the
    deterministic stub, including byte strings that START like real
    formats but are truncated/corrupt."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from grower_spark.operators.multimodal import _PNG_MAGIC, decode_images

    payload = st.one_of(
        st.binary(min_size=0, max_size=64),
        st.binary(min_size=0, max_size=48).map(lambda b: _PNG_MAGIC + b),
        st.binary(min_size=0, max_size=48).map(lambda b: b"\xff\xd8" + b),
        st.binary(min_size=0, max_size=48).map(lambda b: b"GIF89a" + b),
    )

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(payload, min_size=1, max_size=8))
    def check(blobs):
        df = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in enumerate(blobs)],
            "doc_id long, media_bytes binary",
        )
        rows = decode_images(df, decoder="auto").collect()
        assert len(rows) == len(blobs)
        assert all(r["decoder"] in ("stub", "png", "jpeg-meta", "gif-meta")
                   for r in rows)

    check()
