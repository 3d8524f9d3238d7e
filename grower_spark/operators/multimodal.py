"""Multimodal column plumbing: media as opaque binary + typed metadata.

Design for 100TB media corpora: image/audio/video bytes live in a
``binary`` column (or a pointer column to object storage) beside typed
metadata; per-item decode/feature work runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

The container has no image/audio codec libraries; the decode kernels
degrade honestly: PIL when importable, REAL pure-stdlib decoders for the
formats the stdlib can handle — PNG (zlib inflate + full scanline
unfiltering, `_png_one`) and PCM WAV (`wave` module, `_wav_one`) — and a
deterministic byte-statistics stub for everything else.  The Spark-side
plumbing (schema, batch shape, partitioning) is identical across all
paths.  Oracle-checked callers pin ``decoder="stub"`` so results can't
drift with the environment.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql import types as T


def attach_binary(df: DataFrame, text_col: str = "text",
                  out_col: str = "media_bytes") -> DataFrame:
    """Stand-in media payload: utf-8 bytes of a text column as ``binary``.

    In a real corpus this column comes from the source (parquet binary /
    object-store fetch); the operators below don't care which.
    """
    return df.withColumn(out_col, F.col(text_col).cast("binary"))


def binary_meta(df: DataFrame, bin_col: str = "media_bytes") -> DataFrame:
    """Typed metadata over opaque bytes — JVM-side only (no decode):
    byte length, sha256, and a magic-prefix hex for format sniffing."""
    return (
        df.withColumn("byte_len", F.length(F.col(bin_col)))
        .withColumn("sha256_hex", F.sha2(F.col(bin_col), 256))
        .withColumn("magic_hex", F.hex(F.substring(F.col(bin_col), 1, 4)))
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("mean_luma", T.FloatType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _stub_one(b: bytes):
    # Deterministic fake: dimensions/luma from byte statistics.
    n = len(b)
    s = sum(b[:256])
    return ((s % 1024) + 1, (n % 1024) + 1, 3, float((s + n) % 256), "stub")


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# (n_channels, luma weights) per supported IHDR color type, 8-bit only
_PNG_COLOR_TYPES = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_one(b: bytes):
    """Pure-stdlib PNG decode (zlib + struct): 8-bit depth, color types
    greyscale/RGB/grey+alpha/RGBA, non-interlaced — the common case a
    training corpus's thumbnails actually are.  Real pixels, real
    unfiltering (all five PNG filter types), no external codec: this is
    the honest middle ground between the PIL path (env-absent) and the
    deterministic stub.  Raises ValueError on anything else so callers
    fall through explicitly rather than get fake numbers."""
    import struct
    import zlib

    if not b.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, width, height, channels, idat = len(_PNG_MAGIC), 0, 0, 0, []
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack_from(">I", b, pos), b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0 or color not in _PNG_COLOR_TYPES:
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            channels = _PNG_COLOR_TYPES[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    prev = bytearray(stride)
    total_luma = 0.0
    n_px = width * height
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pred = a if pa <= pb and pa <= pc else prev[i] if pb <= pc else c
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        for x in range(0, stride, channels):
            if channels >= 3:
                total_luma += (
                    0.299 * line[x] + 0.587 * line[x + 1] + 0.114 * line[x + 2]
                )
            else:  # grey / grey+alpha
                total_luma += line[x]
        prev = line
    return width, height, channels, float(total_luma / max(n_px, 1)), "png"


def _jpeg_meta_one(b: bytes):
    """JPEG dimensions/channels from the SOF marker — pure stdlib, no
    pixel decode (that genuinely needs a DCT codec), so ``mean_luma`` is
    None: real metadata honestly separated from unavailable content."""
    import struct

    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (spec-permitted)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            pos += 2
            continue
        if marker in (0xD9, 0xDA):
            # EOI, or SOS (entropy-coded data follows — marker scanning
            # is invalid past it); SOF precedes SOS in any decodable file
            break
        (seg_len,) = struct.unpack_from(">H", b, pos + 2)
        # SOF0..SOF15 except DHT(C4)/DAC(CC)/JPG(C8) carry the frame header
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", b, pos + 4)
            return int(width), int(height), int(ncomp), None, "jpeg-meta"
        pos += 2 + seg_len
    raise ValueError("JPEG SOF marker not found")


def _gif_meta_one(b: bytes):
    """GIF logical-screen dimensions from the fixed header (stdlib)."""
    import struct

    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack_from("<HH", b, 6)
    return int(width), int(height), 3, None, "gif-meta"


def _pil_one_factory():  # pragma: no cover - PIL absent in this container
    import io

    import numpy as np
    from PIL import Image

    def one(b: bytes):
        img = Image.open(io.BytesIO(b))
        w, h = img.size
        gray = img.convert("L")
        return w, h, len(img.getbands()), float(np.asarray(gray).mean()), "pil"

    return one


def _decode_batch(batch: pd.DataFrame, decoder: str = "auto") -> pd.DataFrame:
    """Decode kernel for one Arrow batch.

    ``decoder`` selects the kernel explicitly: ``"pil"`` requires the real
    library (ImportError otherwise), ``"stub"`` always uses the
    deterministic fake, ``"auto"`` tries PIL and falls back.  Callers whose
    output is checked against a fixed oracle must pin ``"stub"`` so results
    don't silently change if a codec library appears in the environment.
    """
    if decoder == "stub":
        one = _stub_one
    elif decoder == "png":
        one = _png_one
    elif decoder == "magic":
        # pinned, env-independent: route by magic bytes among the REAL
        # stdlib kernels only (PNG pixels, JPEG/GIF header metadata) and
        # raise on anything else — unlike "auto", this can never change
        # behavior if a codec library appears, so oracle-checked rows
        # over mixed real formats pin this.
        def one(b: bytes):
            if b.startswith(_PNG_MAGIC):
                return _png_one(b)
            if b[:2] == b"\xff\xd8":
                return _jpeg_meta_one(b)
            if b[:6] in (b"GIF87a", b"GIF89a"):
                return _gif_meta_one(b)
            raise ValueError("magic decoder: unrecognized format")
    elif decoder == "pil":  # pragma: no cover
        one = _pil_one_factory()
    elif decoder == "auto":
        try:  # pragma: no cover
            one = _pil_one_factory()
        except ImportError:
            # no codec library: REAL decode for PNG, REAL metadata for
            # JPEG/GIF (dimensions need no codec; luma stays None),
            # deterministic stub for everything else.  A corrupt or
            # unsupported variant (palette/16-bit PNG, truncated stream)
            # degrades to the stub instead of failing the task: at corpus
            # scale one bad file must never abort the job — pin the
            # specific decoder to get strict errors instead.
            def one(b: bytes):
                try:
                    if b.startswith(_PNG_MAGIC):
                        return _png_one(b)
                    if b[:2] == b"\xff\xd8":
                        return _jpeg_meta_one(b)
                    if b[:6] in (b"GIF87a", b"GIF89a"):
                        return _gif_meta_one(b)
                except Exception:
                    pass
                return _stub_one(b)
    else:
        raise ValueError(f"unknown decoder {decoder!r} (want auto|stub|png|pil)")

    rows = [one(bytes(b)) for b in batch["media_bytes"]]
    out = pd.DataFrame(
        rows, columns=["width", "height", "n_channels", "mean_luma", "decoder"]
    )
    out.insert(0, "doc_id", batch["doc_id"].values)
    out["mean_luma"] = out["mean_luma"].astype("float32")
    return out


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_off_bytes", T.LongType()),
        T.StructField("frame_sha8", T.StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n_bytes: int = 64,
                  max_frames: int = 8, id_col: str = "doc_id",
                  bin_col: str = "media_bytes") -> DataFrame:
    """Video-style frame sampling plumbing: 1:N expansion through
    mapInPandas (each input row yields up to ``max_frames`` frame rows).

    The real kernel would seek keyframes with a video lib; absent codecs,
    frames are byte-stride samples with a content hash — the Spark-side
    shape (schema, batching, fan-out) is what's exercised."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("media_bytes"))

    def run(batches):
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["media_bytes"]):
                data = bytes(payload)
                for i in range(min(max_frames, max(len(data) // every_n_bytes, 1))):
                    off = i * every_n_bytes
                    chunk = data[off : off + every_n_bytes]
                    rows.append(
                        (int(doc_id), i, off, hashlib.sha256(chunk).hexdigest()[:8])
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_off_bytes", "frame_sha8"]
            )

    return src.mapInPandas(run, FRAME_SCHEMA)


HIST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("hist16", T.ArrayType(T.IntegerType())),
        T.StructField("entropy_milli", T.LongType()),
    ]
)


def byte_histogram(df: DataFrame, id_col: str = "doc_id",
                   bin_col: str = "media_bytes",
                   prefix_bytes: int = 256) -> DataFrame:
    """REAL feature-extraction kernel (no codec needed): 16-bin histogram
    of the high nibble of the first ``prefix_bytes`` payload bytes, plus a
    milli-bits Shannon entropy — the magic-sniffing / compressibility
    signal a media-ingest pipeline computes before deciding to decode.

    Arrow-batched ``mapInPandas`` with numpy ``bincount`` per row; only
    (id, bytes) cross the Python boundary, output is 1:1.  Entropy is
    returned as an integer (floor of millibits) so results are
    engine-exact for the oracle."""
    import math

    import numpy as np

    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("media_bytes"))

    def run(batches):
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["media_bytes"]):
                data = bytes(payload)[:prefix_bytes]
                arr = np.frombuffer(data, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype("int64")
                n = int(hist.sum())
                # scalar libc math in bin order (not numpy's vectorized
                # log): DuckDB's log2 is the same libm call, so the oracle
                # reproduces the double result bit-for-bit
                ent = 0.0
                for k in hist.tolist():
                    if k:
                        p = k / n
                        ent -= p * math.log2(p)
                rows.append(
                    (int(doc_id), n, hist.astype("int32").tolist(),
                     math.floor(ent * 1000))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "hist16", "entropy_milli"]
            )

    return src.mapInPandas(run, HIST_SCHEMA)


FUSED_SCHEMA = T.StructType(
    list(DECODED_SCHEMA) + [f for f in HIST_SCHEMA if f.name != "doc_id"]
)


def multimodal_features(df: DataFrame, id_col: str = "doc_id",
                        bin_col: str = "media_bytes",
                        decoder: str = "auto",
                        prefix_bytes: int = 256) -> DataFrame:
    """The 100 TB production path: decode metadata AND byte-histogram
    features in ONE ``mapInPandas`` pass — the media bytes cross the
    Arrow boundary once instead of once per kernel, and there is no
    doc_id re-join of derivations of the same scan.

    Output == ``decode_images(df, decoder) JOIN byte_histogram(df)`` on
    ``doc_id`` (pytest-pinned); the separate kernels stay exported because
    the driver oracle checks each one's plumbing independently."""
    import math

    import numpy as np

    if decoder not in ("auto", "stub", "png", "pil"):
        raise ValueError(f"unknown decoder {decoder!r} (want auto|stub|png|pil)")
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("media_bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = _decode_batch(batch, decoder)
            n_bytes, hists, ents = [], [], []
            for payload in batch["media_bytes"]:
                data = bytes(payload)[:prefix_bytes]
                arr = np.frombuffer(data, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype("int64")
                n = int(hist.sum())
                ent = 0.0
                for k in hist.tolist():
                    if k:
                        p = k / n
                        ent -= p * math.log2(p)
                n_bytes.append(n)
                hists.append(hist.astype("int32").tolist())
                ents.append(math.floor(ent * 1000))
            out["n_bytes"] = n_bytes
            out["hist16"] = hists
            out["entropy_milli"] = ents
            yield out

    return src.mapInPandas(run, FUSED_SCHEMA)


def decode_images(df: DataFrame, id_col: str = "doc_id",
                  bin_col: str = "media_bytes",
                  decoder: str = "auto",
                  synth_kind=None) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, bytes) partitions.

    Only the two needed columns enter the Python worker (column pruning by
    explicit select), and output rows stay 1:1 with input — the shape a
    real resize/feature-extract kernel would use.  ``decoder`` pins the
    kernel (see ``_decode_batch``); oracle-checked callers pass ``"stub"``.

    ``synth_kind`` (a ``synthesize_media`` kind, or a callable
    ``doc_id -> kind``) fuses synthesis and decode into ONE Python pass:
    only ids enter the worker and the payload bytes never cross the JVM
    boundary — the chained synthesize->decode composition paid a second
    mapInPandas stage (~0.3-0.5 s fixed at sf0.1) to ship bytes out of
    Python and straight back in.  Decoded rows are identical.
    """
    if decoder not in ("auto", "stub", "png", "magic", "pil"):
        raise ValueError(
            f"unknown decoder {decoder!r} (want auto|stub|png|magic|pil)"
        )
    if synth_kind is not None:
        make = _synth_maker(synth_kind)
        src = df.select(F.col(id_col).cast("long").alias("doc_id"))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                yield _decode_batch(
                    pd.DataFrame({
                        "doc_id": batch["doc_id"].values,
                        "media_bytes": [
                            make(int(i)) for i in batch["doc_id"]
                        ],
                    }),
                    decoder,
                )

        return src.mapInPandas(run, DECODED_SCHEMA)
    src = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("media_bytes"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch, decoder)

    return src.mapInPandas(run, DECODED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_milli", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _wav_one(b: bytes):
    """Real audio decode for PCM WAV via the stdlib ``wave`` module:
    format metadata plus RMS amplitude (scaled to milli-units of full
    scale, integer-exact).  8/16/32-bit integer PCM; anything else (float
    PCM, compressed formats) raises so callers fall through explicitly."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(b)) as w:
        nch = w.getnchannels()
        rate = w.getframerate()
        nframes = w.getnframes()
        width = w.getsampwidth()
        frames = w.readframes(nframes)
    if width == 1:  # unsigned 8-bit
        samples = [s - 128 for s in frames]
        full = 128.0
    elif width == 2:
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
        full = 32768.0
    elif width == 4:
        samples = struct.unpack(f"<{len(frames) // 4}i", frames)
        full = 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    n = len(samples)
    rms = (sum(s * s for s in samples) / n) ** 0.5 / full if n else 0.0
    duration_ms = int(nframes * 1000 // rate) if rate else 0
    return rate, nch, nframes, duration_ms, int(round(rms * 1000)), "wav"


def _audio_stub_one(b: bytes):
    n = len(b)
    s = sum(b[:256])
    return (8000 + s % 40000, 1 + n % 2, n, (n * 1000) // 8000, s % 1000, "stub")


def decode_audio(df: DataFrame, id_col: str = "doc_id",
                 bin_col: str = "media_bytes",
                 decoder: str = "auto",
                 synth_kind=None) -> DataFrame:
    """Audio feature extraction over opaque bytes: Arrow-batched
    mapInPandas, same plumbing contract as the image path.  ``"wav"``
    pins the real stdlib PCM kernel, ``"stub"`` the deterministic fake;
    ``"auto"`` routes RIFF/WAVE payloads to the real kernel and the rest
    to the stub.  WAV needs no external codec — the honest real-decode
    counterpart to the PNG kernel."""
    if decoder not in ("auto", "wav", "stub"):
        raise ValueError(f"unknown decoder {decoder!r} (want auto|wav|stub)")
    if synth_kind is not None:  # fused synth+decode (see decode_images)
        make = _synth_maker(synth_kind)
        src = df.select(F.col(id_col).cast("long").alias("doc_id"))
    else:
        make = None
        src = df.select(
            F.col(id_col).alias("doc_id"), F.col(bin_col).alias("media_bytes")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            payloads = (
                [make(int(i)) for i in batch["doc_id"]]
                if make is not None else batch["media_bytes"]
            )
            for doc_id, payload in zip(batch["doc_id"], payloads):
                b = bytes(payload)
                if decoder == "wav":
                    rec = _wav_one(b)  # pinned: strict errors
                elif decoder == "auto" and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    try:  # corrupt/float-PCM WAV degrades to stub, not a
                        rec = _wav_one(b)  # task failure (corpus-scale rule)
                    except Exception:
                        rec = _audio_stub_one(b)
                else:
                    rec = _audio_stub_one(b)
                rows.append((int(doc_id),) + rec)
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_channels", "n_frames",
                         "duration_ms", "rms_milli", "decoder"],
            )

    return src.mapInPandas(run, AUDIO_SCHEMA)


VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _mp4_meta_one(b: bytes):
    """MP4/ISO-BMFF container metadata — pure struct box walking, no
    codec: duration from ``moov/mvhd`` (timescale-normalized), visual
    dimensions from the first non-degenerate ``tkhd`` (16.16 fixed
    point), track count.  Raises on non-MP4 so auto callers fall
    through."""
    import struct

    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an MP4")

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack_from(">I", b, pos)
            btype = b[pos + 4:pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack_from(">Q", b, pos + 8)
                body = pos + 16
            elif size == 0:  # to end of enclosing box
                size = hi - pos
            if size < 8 or pos + size > hi:
                raise ValueError("malformed MP4 box")
            yield btype, body, pos + size
            pos += size

    duration_ms, width, height, n_tracks = 0, 0, 0, 0
    for btype, body, end in walk(0, len(b)):
        if btype != b"moov":
            continue
        for ctype, cbody, cend in walk(body, end):
            if ctype == b"mvhd":
                version = b[cbody]
                if version == 1:
                    timescale, duration = struct.unpack_from(">IQ", b, cbody + 20)
                else:
                    timescale, duration = struct.unpack_from(">II", b, cbody + 12)
                if timescale:
                    duration_ms = int(duration * 1000 // timescale)
            elif ctype == b"trak":
                n_tracks += 1
                for ttype, tbody, _tend in walk(cbody, cend):
                    if ttype == b"tkhd" and not (width or height):
                        version = b[tbody]
                        # width sits after fullbox(4) + times/id/dur
                        # (20 v0 / 32 v1) + reserved+layer+volume (16) +
                        # matrix (36): offset 76 (v0) / 88 (v1)
                        off = tbody + (88 if version == 1 else 76)
                        w_fp, h_fp = struct.unpack_from(">II", b, off)
                        if w_fp and h_fp:
                            width, height = w_fp >> 16, h_fp >> 16
    return duration_ms, width, height, n_tracks, "mp4-meta"


def _video_stub_one(b: bytes):
    n = len(b)
    s = sum(b[:256])
    return ((n * 1000) // 30, (s % 1920) + 1, (n % 1080) + 1, 1, "stub")


def video_meta(df: DataFrame, id_col: str = "doc_id",
               bin_col: str = "media_bytes",
               decoder: str = "auto",
               synth_kind=None) -> DataFrame:
    """Video container metadata over opaque bytes (mapInPandas): real
    MP4 box parsing when the payload is ISO-BMFF, deterministic stub
    otherwise — completing the image/audio/video honest-kernel family.
    Frame extraction genuinely needs a codec; see sample_frames for the
    byte-stride plumbing stand-in."""
    if decoder not in ("auto", "mp4", "stub"):
        raise ValueError(f"unknown decoder {decoder!r} (want auto|mp4|stub)")
    if synth_kind is not None:  # fused synth+decode (see decode_images)
        make = _synth_maker(synth_kind)
        src = df.select(F.col(id_col).cast("long").alias("doc_id"))
    else:
        make = None
        src = df.select(
            F.col(id_col).alias("doc_id"), F.col(bin_col).alias("media_bytes")
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            payloads = (
                [make(int(i)) for i in batch["doc_id"]]
                if make is not None else batch["media_bytes"]
            )
            for doc_id, payload in zip(batch["doc_id"], payloads):
                b = bytes(payload)
                if decoder == "mp4":
                    rec = _mp4_meta_one(b)  # pinned: strict errors
                elif decoder == "auto" and len(b) >= 8 and b[4:8] == b"ftyp":
                    try:  # malformed boxes degrade to stub, not a task
                        rec = _mp4_meta_one(b)  # failure (corpus-scale rule)
                    except Exception:
                        rec = _video_stub_one(b)
                else:
                    rec = _video_stub_one(b)
                rows.append((int(doc_id),) + rec)
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "duration_ms", "width", "height",
                         "n_tracks", "decoder"],
            )

    return src.mapInPandas(run, VIDEO_SCHEMA)


# --- deterministic media synthesis (fixture generators) -------------------
#
# The container ships no image/audio ENCODER libraries either, so driver
# rows that exercise the REAL decode kernels (`_png_one`, `_wav_one`)
# synthesize their inputs from table columns with pure-stdlib encoders.
# Every pixel/sample is an integer formula of (doc_id, position), which
# makes the decoded statistics (mean luma, RMS) derivable in ANSI SQL —
# the oracle never needs to decode bytes, it recomputes the formula.


def synth_png_bytes(doc_id: int) -> bytes:
    """Grayscale 8-bit PNG whose pixels are a formula of ``doc_id``:
    ``w = doc_id % 8 + 4``, ``h = (doc_id * 7) % 8 + 4``,
    ``pixel[k] = (doc_id * 31 + k * 17) % 256`` in row-major order.
    Scanline ``y`` is encoded with filter type ``y % 5``, so a full decode
    exercises ALL FIVE PNG filter reconstructions (None/Sub/Up/Average/
    Paeth) — unfiltering is exact, so the decoded pixels equal the
    formula regardless of which filter encoded each line."""
    import struct
    import zlib

    w = int(doc_id) % 8 + 4
    h = (int(doc_id) * 7) % 8 + 4
    px = [(int(doc_id) * 31 + k * 17) % 256 for k in range(w * h)]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    raw = bytearray()
    prev = bytes(w)  # raw (unfiltered) previous scanline
    for y in range(h):
        line = bytes(px[y * w:(y + 1) * w])
        ftype = y % 5
        raw.append(ftype)
        if ftype == 0:
            raw += line
        elif ftype == 1:  # Sub (channels=1 -> left neighbor at i-1)
            raw += bytes((line[i] - (line[i - 1] if i else 0)) & 0xFF
                         for i in range(w))
        elif ftype == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(w))
        elif ftype == 3:  # Average
            raw += bytes(
                (line[i] - ((line[i - 1] if i else 0) + prev[i]) // 2) & 0xFF
                for i in range(w)
            )
        else:  # Paeth
            out = bytearray()
            for i in range(w):
                a = line[i - 1] if i else 0
                b_ = prev[i]
                c = prev[i - 1] if i else 0
                p = a + b_ - c
                pa, pb, pc = abs(p - a), abs(p - b_), abs(p - c)
                pred = a if pa <= pb and pa <= pc else b_ if pb <= pc else c
                out.append((line[i] - pred) & 0xFF)
            raw += out
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit greyscale
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def synth_wav_bytes(doc_id: int) -> bytes:
    """16-bit mono PCM WAV at 8 kHz whose samples are a formula of
    ``doc_id``: ``n = doc_id % 40 + 5`` frames,
    ``sample[k] = (doc_id * 131 + k * 977) % 65536 - 32768``."""
    import io
    import struct
    import wave

    n = int(doc_id) % 40 + 5
    samples = [(int(doc_id) * 131 + k * 977) % 65536 - 32768 for k in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{n}h", *samples))
    return buf.getvalue()


def _synth_maker(kind):
    """Resolve a synthesis kind — a maker name, or a callable mapping
    doc_id -> maker name (per-row format mixes) — to ``id -> bytes``."""
    if callable(kind):
        return lambda i: _MAKERS[kind(i)](i)
    if kind not in _MAKERS:
        raise ValueError(
            f"unknown media kind {kind!r} (want png|wav|jpeg|gif|mp4)"
        )
    return _MAKERS[kind]


def synthesize_media(df: DataFrame, kind: str,
                     id_col: str = "doc_id") -> DataFrame:
    """Attach synthesized media bytes (``media_bytes``) derived from the id
    column — the binary-column fixture for driver rows and tests that
    exercise the real decode kernels.  Pure map-side (mapInPandas, no
    shuffle); at corpus scale the same shape holds for any
    column-to-binary render kernel.

    When the bytes exist only to be decoded right away, pass
    ``synth_kind`` to the decode operator instead: synthesis and decode
    then run in ONE Python pass and the payload never round-trips
    JVM -> Python -> JVM -> Python (each extra chained mapInPandas stage
    measured ~0.3-0.5 s of fixed cost at sf0.1)."""
    make = _synth_maker(kind)
    src = df.select(F.col(id_col).cast("long").alias("doc_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].values,
                    "media_bytes": [make(int(i)) for i in batch["doc_id"]],
                }
            )

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("media_bytes", T.BinaryType())]
    )
    return src.mapInPandas(run, schema)


def synth_jpeg_bytes(doc_id: int) -> bytes:
    """Minimal JPEG header stream whose SOF0 frame dimensions are a
    formula of ``doc_id``: ``w = doc_id % 200 + 16``,
    ``h = (doc_id * 13) % 200 + 16``, 3 components.  Header-only (no
    entropy data) — exactly what `_jpeg_meta_one` parses."""
    import struct

    w = int(doc_id) % 200 + 16
    h = (int(doc_id) * 13) % 200 + 16
    ncomp = 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        struct.pack(">BBB", i + 1, 0x11, 0) for i in range(ncomp)
    )
    return (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xd9")


def synth_gif_bytes(doc_id: int) -> bytes:
    """GIF89a header with logical-screen dimensions from ``doc_id``:
    ``w = doc_id % 300 + 1``, ``h = (doc_id * 7) % 300 + 1``."""
    import struct

    w = int(doc_id) % 300 + 1
    h = (int(doc_id) * 7) % 300 + 1
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def synth_mp4_bytes(doc_id: int) -> bytes:
    """Minimal ISO-BMFF container from ``doc_id`` formulas: mvhd v0 with
    timescale 1000 and duration ``doc_id % 5000 + 1000`` (so duration_ms
    == duration), one trak whose tkhd carries ``w = doc_id % 640 + 16``,
    ``h = (doc_id * 3) % 480 + 16`` in 16.16 fixed point."""
    import struct

    dur = int(doc_id) % 5000 + 1000
    w = int(doc_id) % 640 + 16
    h = (int(doc_id) * 3) % 480 + 16

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd = box(b"mvhd", b"\x00\x00\x00\x00"      # version 0 + flags
               + struct.pack(">II", 0, 0)          # ctime, mtime
               + struct.pack(">II", 1000, dur))    # timescale, duration
    tkhd = box(b"tkhd", b"\x00\x00\x00\x00"      # version 0 + flags
               + bytes(20 + 16 + 36)               # times/id/dur + resv + matrix
               + struct.pack(">II", w << 16, h << 16))
    trak = box(b"trak", tkhd)
    return box(b"ftyp", b"isom\x00\x00\x02\x00isom") + box(b"moov", mvhd + trak)


# maker registry for synthesize_media / the decode operators' fused
# synth_kind path (defined after the makers themselves)
_MAKERS = {
    "png": synth_png_bytes,
    "wav": synth_wav_bytes,
    "jpeg": synth_jpeg_bytes,
    "gif": synth_gif_bytes,
    "mp4": synth_mp4_bytes,
}
