"""HTTP/2 frame layer + HPACK subset + the gRPC FileBuf transport.

The HPACK decoder is validated against RFC 7541 Appendix C's
non-Huffman test vectors (C.1 integers, C.2 literal forms, the full
C.3 request sequence with dynamic-table state) — real spec bytes, not
self-referential round-trips.  The transport tests then run the
reference's CreateDataStreamer RPC shape end-to-end over localhost h2c:
client-streaming Requests -> spool files -> the filebuf reader, with
real flow control (>64 KiB to force WINDOW_UPDATE grants)."""

from __future__ import annotations

import os
import time

import pytest

from grower_spark.sources.http2 import (
    CONNECTION_PREFACE,
    FLAG_ACK,
    FLAG_END_HEADERS,
    FLAG_END_STREAM,
    FRAME_SETTINGS,
    FRAME_HEADERS,
    FrameReader,
    HpackDecoder,
    HpackEncoder,
    HpackError,
    STATIC_TABLE,
    hpack_decode_int,
    hpack_encode_int,
    pack_frame,
    unpack_frame_header,
    unpack_settings,
    pack_settings,
)
from grower_spark.sources.grpch2 import GrpcSpoolServer, GrpcStreamClient
from grower_spark.sources.filebuf import read_frames


# --------------------------------------------------------------------------
# HPACK primitives vs RFC 7541 Appendix C
# --------------------------------------------------------------------------


def test_rfc7541_c1_integers():
    # C.1.1: 10, 5-bit prefix
    assert hpack_encode_int(10, 5) == bytes([0b01010])
    assert hpack_decode_int(bytes([0b01010]), 0, 5) == (10, 1)
    # C.1.2: 1337, 5-bit prefix -> 1f 9a 0a
    assert hpack_encode_int(1337, 5) == bytes([0x1F, 0x9A, 0x0A])
    assert hpack_decode_int(bytes([0x1F, 0x9A, 0x0A]), 0, 5) == (1337, 3)
    # C.1.3: 42, 8-bit prefix
    assert hpack_encode_int(42, 8) == bytes([0x2A])
    assert hpack_decode_int(bytes([0x2A]), 0, 8) == (42, 1)


def test_rfc7541_c2_literals():
    # C.2.1 literal with incremental indexing, new name
    block = bytes.fromhex(
        "400a637573746f6d2d6b65790d637573746f6d2d686561646572"
    )
    d = HpackDecoder()
    assert d.decode(block) == [("custom-key", "custom-header")]
    assert list(d.table.entries) == [("custom-key", "custom-header")]
    assert d.table.size == 55
    # C.2.2 literal without indexing, indexed name (:path)
    block = bytes.fromhex("040c2f73616d706c652f70617468")
    d = HpackDecoder()
    assert d.decode(block) == [(":path", "/sample/path")]
    assert not d.table.entries
    # C.2.3 literal never indexed
    block = bytes.fromhex("100870617373776f726406736563726574")
    d = HpackDecoder()
    assert d.decode(block) == [("password", "secret")]
    assert not d.table.entries
    # C.2.4 indexed field (:method GET = static 2)
    d = HpackDecoder()
    assert d.decode(bytes([0x82])) == [(":method", "GET")]


def test_rfc7541_c3_request_sequence():
    """Three requests on one connection, raw literals — pins dynamic
    table insertion order, indexed references to dynamic entries, and
    eviction-free growth exactly as the RFC walks it."""
    d = HpackDecoder()
    r1 = bytes.fromhex(
        "828684410f7777772e6578616d706c652e636f6d"
    )
    assert d.decode(r1) == [
        (":method", "GET"), (":scheme", "http"), (":path", "/"),
        (":authority", "www.example.com"),
    ]
    assert list(d.table.entries) == [(":authority", "www.example.com")]
    assert d.table.size == 57
    r2 = bytes.fromhex("828684be58086e6f2d6361636865")
    assert d.decode(r2) == [
        (":method", "GET"), (":scheme", "http"), (":path", "/"),
        (":authority", "www.example.com"), ("cache-control", "no-cache"),
    ]
    assert list(d.table.entries) == [
        ("cache-control", "no-cache"), (":authority", "www.example.com"),
    ]
    assert d.table.size == 110
    r3 = bytes.fromhex(
        "828785bf400a637573746f6d2d6b65790c637573746f6d2d76616c7565"
    )
    assert d.decode(r3) == [
        (":method", "GET"), (":scheme", "https"), (":path", "/index.html"),
        (":authority", "www.example.com"), ("custom-key", "custom-value"),
    ]
    assert list(d.table.entries) == [
        ("custom-key", "custom-value"),
        ("cache-control", "no-cache"),
        (":authority", "www.example.com"),
    ]
    assert d.table.size == 164


# --------------------------------------------------------------------------
# RFC 7541 Appendix B Huffman code (r12 verdict item 4)
# --------------------------------------------------------------------------

# the spec's own Huffman-coded string literals from Appendix C.4 / C.6 —
# real RFC bytes, covering a-z, A-Z (cookie + date vectors), 0-9 and
# the common punctuation.  Transcription errors in the 257-symbol table
# are exactly what these pin.
_HUFFMAN_VECTORS = [
    ("www.example.com", "f1e3c2e5f23a6ba0ab90f4ff"),          # C.4.1
    ("no-cache", "a8eb10649cbf"),                              # C.4.2
    ("custom-key", "25a849e95ba97d7f"),                        # C.4.3
    ("custom-value", "25a849e95bb8e8b4bf"),                    # C.4.3
    ("302", "6402"),                                           # C.6.1
    ("private", "aec3771a4b"),                                 # C.6.1
    ("Mon, 21 Oct 2013 20:13:21 GMT",
     "d07abe941054d444a8200595040b8166e082a62d1bff"),          # C.6.1
    ("https://www.example.com",
     "9d29ad171863c78f0b97c8e9ae82ae43d3"),                    # C.6.1
    ("307", "640eff"),                                         # C.6.2
    ("Mon, 21 Oct 2013 20:13:22 GMT",
     "d07abe941054d444a8200595040b8166e084a62d1bff"),          # C.6.3
    ("gzip", "9bd9ab"),                                        # C.6.3
    ("foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1",
     "94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270f"
     "b5291f9587316065c003ed4ee5b1063d5007"),                  # C.6.3
]


def test_huffman_appendix_c_vectors_both_directions():
    from grower_spark.sources.http2 import huffman_decode, huffman_encode

    for text, hexcode in _HUFFMAN_VECTORS:
        assert huffman_decode(bytes.fromhex(hexcode)) == text.encode()
        assert huffman_encode(text.encode()).hex() == hexcode


def test_huffman_table_structure():
    """The table must be a COMPLETE canonical prefix code: Kraft sum
    exactly 1, and codes sorted by length are consecutive (each code is
    previous+1 left-justified).  Together with the Appendix C vectors
    this pins the table to the RFC's: the structure admits exactly one
    code per length assignment, and the vectors pin the symbol order."""
    from fractions import Fraction

    from grower_spark.sources.http2 import HUFFMAN_CODES

    assert len(HUFFMAN_CODES) == 257
    assert sum(Fraction(1, 2 ** bits) for _, bits in HUFFMAN_CODES) == 1
    ordered = sorted(
        (bits, code) for code, bits in HUFFMAN_CODES
    )
    prev_bits, prev_code = ordered[0]
    assert prev_code == 0 and prev_bits == 5
    for bits, code in ordered[1:]:
        assert code == (prev_code + 1) << (bits - prev_bits), (bits, code)
        prev_bits, prev_code = bits, code


def test_huffman_roundtrip_all_bytes_and_padding_rules():
    from grower_spark.sources.http2 import huffman_decode, huffman_encode

    allb = bytes(range(256))
    assert huffman_decode(huffman_encode(allb)) == allb
    assert huffman_decode(b"") == b""
    # RFC 7541 §5.2 error cases: padding > 7 bits; padding not EOS bits
    with pytest.raises(HpackError, match="padding"):
        huffman_decode(b"\xff\xff")  # 16 bits of EOS prefix = >7 pad
    with pytest.raises(HpackError, match="padding"):
        # '0' is code 0b00000 (5 bits); 3 zero pad bits are not EOS
        huffman_decode(bytes([0b00000000]))


def test_huffman_literal_decodes_in_header_block():
    """The H=1 path through the real decoder: a header block whose name
    and value are Huffman-coded (as third-party gRPC stacks send) —
    this raised HpackError before r13."""
    from grower_spark.sources.http2 import huffman_encode

    def lit(b: bytes) -> bytes:
        return hpack_encode_int(len(b), 7, 0x80) + b

    name = huffman_encode(b"content-type")
    value = huffman_encode(b"application/grpc")
    block = bytes([0x00]) + lit(name) + lit(value)
    assert HpackDecoder().decode(block) == [
        ("content-type", "application/grpc")
    ]


def test_static_table_shape():
    assert len(STATIC_TABLE) == 61
    assert STATIC_TABLE[0] == (":authority", "")
    assert STATIC_TABLE[1] == (":method", "GET")
    assert STATIC_TABLE[60] == ("www-authenticate", "")


def test_encoder_decoder_symmetry_with_dynamic_table():
    enc = HpackEncoder()
    dec = HpackDecoder()
    h1 = [(":method", "POST"), (":path", "/x"), ("grpc-status", "0")]
    assert dec.decode(enc.encode(h1)) == h1
    # second block: the custom entries must now be INDEXED refs into
    # both sides' dynamic tables and still decode identically
    b2 = enc.encode(h1)
    assert len(b2) < 10  # all three resolve to indexes now
    assert dec.decode(b2) == h1


def test_table_size_update_and_eviction():
    d = HpackDecoder()
    d.decode(bytes.fromhex("400a637573746f6d2d6b65790d637573746f6d2d686561646572"))
    assert d.table.size == 55
    # dynamic table size update to 0 evicts everything (001xxxxx)
    assert d.decode(bytes([0x20])) == []
    assert d.table.size == 0 and not d.table.entries


def test_frame_header_roundtrip():
    f = pack_frame(0x1, 0x5, 31, b"abc")
    length, ftype, flags, sid = unpack_frame_header(f[:9])
    assert (length, ftype, flags, sid) == (3, 0x1, 0x5, 31)
    assert f[9:] == b"abc"
    s = pack_settings({0x4: 1 << 20, 0x5: 16384})
    _, t2, fl2, sid2 = unpack_frame_header(s[:9])
    assert (t2, fl2, sid2) == (0x4, 0, 0)
    assert unpack_settings(s[9:]) == {0x4: 1 << 20, 0x5: 16384}


def test_hpack_roundtrip_property():
    """Randomized encoder->decoder symmetry: any header list (static
    names, custom names, repeated entries, values that fill and evict
    the dynamic table) must round-trip across a sequence of blocks on
    one connection."""
    import random

    rng = random.Random(1207)
    names = [n for n, _ in STATIC_TABLE[:20]] + [
        f"x-custom-{i}" for i in range(10)
    ]
    enc, dec = HpackEncoder(max_table_size=512), HpackDecoder(max_table_size=512)
    for _ in range(50):
        headers = [
            (rng.choice(names), "v" * rng.randint(0, 60))
            for _ in range(rng.randint(1, 12))
        ]
        assert dec.decode(enc.encode(headers)) == headers
        assert dec.table.size <= 512 and enc.table.size <= 512
        assert list(dec.table.entries) == list(enc.table.entries)


def test_hpack_int_roundtrip_property():
    import random

    rng = random.Random(7)
    for _ in range(300):
        prefix = rng.randint(1, 8)
        v = rng.choice([0, 1, rng.randint(0, 1 << 30), (1 << prefix) - 1,
                        (1 << prefix) - 2])
        data = hpack_encode_int(v, prefix)
        got, pos = hpack_decode_int(data, 0, prefix)
        assert (got, pos) == (v, len(data))


# --------------------------------------------------------------------------
# gRPC FileBuf transport e2e
# --------------------------------------------------------------------------


def _spool_lines(spool_dir: str) -> list[str]:
    out = []
    if not os.path.isdir(spool_dir):  # created lazily on first flush
        return out
    for name in sorted(os.listdir(spool_dir)):
        if name.endswith(".fbuf"):
            out.extend(read_frames(os.path.join(spool_dir, name)))
    return out


def test_grpc_stream_e2e(tmp_path):
    """The reference RPC shape end-to-end: client-streaming Requests over
    real h2c frames -> decoded -> spooled -> filebuf frames, with the
    SendAndClose(Response{}) reply (grpc-status 0 in trailers)."""
    spool = str(tmp_path / "spool")
    with GrpcSpoolServer(spool, flush_interval=0.05) as srv:
        with GrpcStreamClient("127.0.0.1", srv.port) as c:
            c.send([f"line {i}" for i in range(500)])
            c.send(["tail"])
            assert c.finish() == 0
        deadline = time.time() + 5
        while srv.n_received < 501 and time.time() < deadline:
            time.sleep(0.02)
        srv._flush()
        assert srv.n_streams == 1
        assert _spool_lines(spool) == [f"line {i}" for i in range(500)] + ["tail"]


def test_grpc_flow_control_past_default_window(tmp_path):
    """>64 KiB of messages: the client MUST stall on the 65535-byte
    default windows until the server's WINDOW_UPDATE grants arrive — this
    passes only if both sides actually implement flow control."""
    spool = str(tmp_path / "spool")
    big = "x" * 1000
    n = 200  # ~200 KB >> 65535
    with GrpcSpoolServer(spool, flush_interval=0.05) as srv:
        with GrpcStreamClient("127.0.0.1", srv.port) as c:
            c.send([f"{i}:{big}" for i in range(n)])
            assert c.finish() == 0
        deadline = time.time() + 5
        while srv.n_received < n and time.time() < deadline:
            time.sleep(0.02)
        srv._flush()
        lines = _spool_lines(spool)
        assert len(lines) == n
        assert lines[0].startswith("0:") and lines[-1].startswith(f"{n-1}:")


def test_grpc_two_sequential_streams_one_spool(tmp_path):
    spool = str(tmp_path / "spool")
    with GrpcSpoolServer(spool, flush_interval=0.05) as srv:
        for batch in (["a", "b"], ["c"]):
            with GrpcStreamClient("127.0.0.1", srv.port) as c:
                c.send(batch)
                assert c.finish() == 0
        deadline = time.time() + 5
        while srv.n_received < 3 and time.time() < deadline:
            time.sleep(0.02)
        srv._flush()
        assert sorted(_spool_lines(spool)) == ["a", "b", "c"]
        assert srv.n_streams == 2


def test_server_continuation_and_padded_frames(tmp_path):
    """Hand-crafted frames exercising receive paths the in-repo client
    never emits: a header block split across HEADERS+CONTINUATION, and a
    PADDED DATA frame — both must land the line and complete the RPC."""
    import socket as _socket
    import struct as _struct

    from grower_spark.sources.http2 import (
        CONNECTION_PREFACE,
        FLAG_END_STREAM,
        FLAG_PADDED,
        FRAME_CONTINUATION,
        FRAME_DATA,
        FRAME_SETTINGS,
        FLAG_ACK,
    )
    from grower_spark.sources.grpch2 import GRPC_PATH
    from grower_spark.sources.protowire import encode_grpc_message

    spool = str(tmp_path / "spool")
    with GrpcSpoolServer(spool, flush_interval=0.05) as srv:
        sock = _socket.create_connection(("127.0.0.1", srv.port))
        sock.sendall(CONNECTION_PREFACE)
        sock.sendall(pack_settings({}))
        reader = FrameReader(sock)
        ftype, flags, _, payload = reader.read_frame()
        assert ftype == FRAME_SETTINGS and not flags & FLAG_ACK
        sock.sendall(pack_frame(FRAME_SETTINGS, FLAG_ACK, 0, b""))
        # header block split mid-bytes across HEADERS + CONTINUATION
        block = HpackEncoder().encode([
            (":method", "POST"), (":scheme", "http"),
            (":path", GRPC_PATH), ("content-type", "application/grpc"),
        ])
        cut = len(block) // 2
        sock.sendall(pack_frame(FRAME_HEADERS, 0, 1, block[:cut]))
        sock.sendall(
            pack_frame(FRAME_CONTINUATION, FLAG_END_HEADERS, 1, block[cut:])
        )
        # PADDED DATA frame: pad-length byte + payload + 3 pad bytes
        msg = encode_grpc_message("padded-line")
        padded = bytes([3]) + msg + b"\x00\x00\x00"
        sock.sendall(
            pack_frame(FRAME_DATA, FLAG_PADDED | FLAG_END_STREAM, 1, padded)
        )
        # drain server frames until trailers carry grpc-status
        dec = HpackDecoder()
        status = None
        while status is None:
            ftype, flags, sid, payload = reader.read_frame()
            if ftype == FRAME_HEADERS:
                for n, v in dec.decode(payload):
                    if n == "grpc-status":
                        status = int(v)
        assert status == 0
        sock.close()
        deadline = time.time() + 5
        while time.time() < deadline and _spool_lines(spool) != ["padded-line"]:
            time.sleep(0.02)
        assert _spool_lines(spool) == ["padded-line"]


def test_cli_filegrpc_e2e(tmp_path):
    """`cli filegrpc` starts the endpoint, prints the bound port, spools
    a client's stream, and reports counts on SIGTERM — the reference's
    cmd/filegrpc daemon shape."""
    import re
    import signal
    import subprocess
    import sys

    spool = str(tmp_path / "spool")
    proc = subprocess.Popen(
        [sys.executable, "-m", "grower_spark.cli", "filegrpc",
         "--spool-dir", spool, "--port", "0", "--flush-interval", "0.05"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        line = proc.stdout.readline()
        m = re.search(r"grpc-h2c: [\d.]+:(\d+)", line)
        assert m, line
        port = int(m.group(1))
        with GrpcStreamClient("127.0.0.1", port) as c:
            c.send(["alpha", "beta"])
            assert c.finish() == 0
        deadline = time.time() + 5
        while time.time() < deadline and sorted(_spool_lines(spool)) != ["alpha", "beta"]:
            time.sleep(0.05)
        assert sorted(_spool_lines(spool)) == ["alpha", "beta"]
    finally:
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=10)
    assert "received=2 streams=1" in out, out


def test_grpc_spool_readable_by_filebuf_datasource(spark, tmp_path):
    """The consumer contract: spark.read.format('filebuf') over the
    h2c-spooled directory — the same reader the bare-TCP receiver path
    certifies, proving the transport swap is invisible downstream."""
    from grower_spark.sources.filebuf import FileBufDataSource

    spool = str(tmp_path / "spool")
    with GrpcSpoolServer(spool, flush_interval=0.05) as srv:
        with GrpcStreamClient("127.0.0.1", srv.port) as c:
            c.send([f"10.0.0.{i} GET /page{i}" for i in range(40)])
            assert c.finish() == 0
        deadline = time.time() + 5
        while srv.n_received < 40 and time.time() < deadline:
            time.sleep(0.02)
        srv._flush()
    spark.dataSource.register(FileBufDataSource)
    df = spark.read.format("filebuf").load(spool)
    rows = sorted(r["value"] for r in df.collect())
    assert rows == sorted(f"10.0.0.{i} GET /page{i}" for i in range(40))


def test_grpc_zero_message_call_gets_response(tmp_path):
    """r12 advice item 2: HEADERS carrying END_STREAM is a legal
    zero-message gRPC call — the server must answer (headers + empty
    Response + grpc-status trailers) instead of leaving the stream open
    until the peer times out."""
    import socket as _socket

    from grower_spark.sources.grpch2 import GRPC_PATH

    spool = str(tmp_path / "spool")
    with GrpcSpoolServer(spool, flush_interval=0.05) as srv:
        sock = _socket.create_connection(("127.0.0.1", srv.port), timeout=5)
        sock.sendall(CONNECTION_PREFACE)
        sock.sendall(pack_settings({}))
        reader = FrameReader(sock)
        ftype, flags, _, _ = reader.read_frame()
        assert ftype == FRAME_SETTINGS and not flags & FLAG_ACK
        sock.sendall(pack_frame(FRAME_SETTINGS, FLAG_ACK, 0, b""))
        block = HpackEncoder().encode([
            (":method", "POST"), (":scheme", "http"),
            (":path", GRPC_PATH), ("content-type", "application/grpc"),
        ])
        sock.sendall(pack_frame(
            FRAME_HEADERS, FLAG_END_HEADERS | FLAG_END_STREAM, 1, block
        ))
        dec = HpackDecoder()
        status = None
        while status is None:  # socket timeout = the pre-fix hang
            ftype, flags, sid, payload = reader.read_frame()
            if ftype == FRAME_HEADERS:
                for n, v in dec.decode(payload):
                    if n == "grpc-status":
                        status = int(v)
        assert status == 0
        sock.close()
        assert srv.n_streams == 1 and srv.n_received == 0


def test_hpack_encoder_huffman_mode_roundtrip_and_compact():
    """huffman=True emits H=1 literals a fresh decoder reads back
    exactly; compressible ASCII header values genuinely shrink, and
    per-string fallback keeps Huffman-expanding strings raw (H=0)."""
    from grower_spark.sources.http2 import (
        HpackDecoder,
        HpackEncoder,
        hpack_encode_string,
    )

    headers = [
        (":path", "/filebuf.FileBufferService/CreateDataStreamer"),
        ("content-type", "application/grpc"),
        ("x-custom-header", "www.example.com"),
    ]
    raw = HpackEncoder().encode(headers)
    huf = HpackEncoder(huffman=True).encode(headers)
    assert len(huf) < len(raw)
    assert HpackDecoder().decode(huf) == headers
    # dynamic tables stay in sync across huffman/raw mixes
    enc, dec = HpackEncoder(huffman=True), HpackDecoder()
    for _ in range(3):
        assert dec.decode(enc.encode(headers)) == headers
    # incompressible input: Huffman would expand, so the literal stays
    # raw — H bit clear
    noisy = bytes(range(128, 180)).decode("latin-1")
    lit = hpack_encode_string(noisy.encode("latin-1"), huffman=True)
    assert lit[0] & 0x80 == 0


def test_hpack_encoder_huffman_matches_spec_bytes():
    """Encode direction against RFC 7541 Appendix C: a Huffman-coded
    literal of 'www.example.com' must be exactly the spec's C.4.1
    bytes (length octet 0x8c = H-bit | 12, then the coded form)."""
    from grower_spark.sources.http2 import hpack_encode_string

    lit = hpack_encode_string("www.example.com", huffman=True)
    assert lit == bytes([0x8C]) + bytes.fromhex("f1e3c2e5f23a6ba0ab90f4ff")
    lit2 = hpack_encode_string("no-cache", huffman=True)
    assert lit2 == bytes([0x86]) + bytes.fromhex("a8eb10649cbf")
