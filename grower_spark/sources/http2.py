"""Minimal HTTP/2 (RFC 7540) frame layer + HPACK (RFC 7541) subset.

Built so the reference's gRPC stream endpoint (S7:
`protobuf/filebuf/filebuf.proto:6-15`,
`internal/services/filegrpc/server.go:80-91`) can run over a REAL
HTTP/2 socket without the `grpc` package (absent in this env — dated
probes in RESPONSES.md).  Everything here is the public RFC wire
format; the HPACK decoder is validated against RFC 7541 Appendix C's
non-Huffman test vectors in `tests/test_http2.py`.

Scope, stated plainly:

* Frames: full 9-byte header framing; DATA, HEADERS (+CONTINUATION),
  SETTINGS, PING, GOAWAY, WINDOW_UPDATE, RST_STREAM.  PADDED/PRIORITY
  flag payload adjustments are handled on receive; this code never
  sends them.
* HPACK: integer and string literal primitives, the full 61-entry
  static table, a size-bounded dynamic table on BOTH encode and decode
  sides, all five representation forms, and — closing the r12 interop
  gap — the full RFC 7541 Appendix B Huffman code on the DECODE side,
  so third-party peers that Huffman-code their headers (most gRPC
  stacks do) now parse.  The 257-symbol table is pinned three ways in
  tests: structural (prefix-free + Kraft-complete + canonically
  consecutive), the spec's own Appendix C Huffman-coded vectors, and
  all-bytes round-trip.  This repo's encoder still sends raw literals
  (the H bit is optional for senders, RFC 7541 §5.2).
* No TLS/ALPN (gRPC's h2c "prior knowledge" cleartext mode), no server
  push, no stream prioritization.
"""

from __future__ import annotations

import struct
from collections import deque
from typing import Iterable, Optional

# --- frame types (RFC 7540 §6) ---
FRAME_DATA = 0x0
FRAME_HEADERS = 0x1
FRAME_PRIORITY = 0x2
FRAME_RST_STREAM = 0x3
FRAME_SETTINGS = 0x4
FRAME_PUSH_PROMISE = 0x5
FRAME_PING = 0x6
FRAME_GOAWAY = 0x7
FRAME_WINDOW_UPDATE = 0x8
FRAME_CONTINUATION = 0x9

# --- flags ---
FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1  # SETTINGS / PING
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

# --- settings ids (RFC 7540 §6.5.2) ---
SETTINGS_HEADER_TABLE_SIZE = 0x1
SETTINGS_ENABLE_PUSH = 0x2
SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5
SETTINGS_MAX_HEADER_LIST_SIZE = 0x6

CONNECTION_PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"
DEFAULT_WINDOW = 65535
DEFAULT_MAX_FRAME = 16384


class Http2Error(RuntimeError):
    """Malformed or unsupported HTTP/2 wire data."""


class HpackError(Http2Error):
    """Malformed or unsupported HPACK header block."""


# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    if len(payload) > 0xFFFFFF:
        raise Http2Error(f"frame payload too large ({len(payload)})")
    if stream_id < 0 or stream_id > 0x7FFFFFFF:
        raise Http2Error(f"bad stream id {stream_id}")
    head = struct.pack(">I", len(payload))[1:]  # 24-bit length
    return head + bytes([ftype, flags]) + struct.pack(">I", stream_id) + payload


def unpack_frame_header(head: bytes) -> tuple[int, int, int, int]:
    """Returns (length, type, flags, stream_id)."""
    if len(head) != 9:
        raise Http2Error("short frame header")
    length = int.from_bytes(head[:3], "big")
    ftype = head[3]
    flags = head[4]
    stream_id = struct.unpack(">I", head[5:9])[0] & 0x7FFFFFFF
    return length, ftype, flags, stream_id


def pack_settings(settings: dict[int, int], ack: bool = False) -> bytes:
    payload = b"".join(
        struct.pack(">HI", k, v) for k, v in sorted(settings.items())
    )
    return pack_frame(FRAME_SETTINGS, FLAG_ACK if ack else 0, 0, payload)


def unpack_settings(payload: bytes) -> dict[int, int]:
    if len(payload) % 6:
        raise Http2Error("SETTINGS payload not a multiple of 6")
    out = {}
    for i in range(0, len(payload), 6):
        k, v = struct.unpack(">HI", payload[i:i + 6])
        out[k] = v
    return out


def strip_padding(flags: int, payload: bytes) -> bytes:
    """Remove PADDED (and HEADERS' PRIORITY) adornments on receive."""
    if flags & FLAG_PADDED:
        if not payload:
            raise Http2Error("padded frame with empty payload")
        pad = payload[0]
        payload = payload[1:]
        if pad > len(payload):
            raise Http2Error("padding exceeds payload")
        payload = payload[:len(payload) - pad]
    return payload


class FrameReader:
    """Buffered frame reader over a socket."""

    def __init__(self, sock) -> None:
        self._sock = sock
        self._buf = bytearray()

    def _fill(self, n: int) -> None:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise Http2Error("connection closed mid-frame")
            self._buf += chunk

    def _take(self, n: int) -> bytes:
        self._fill(n)
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def expect_preface(self) -> None:
        got = self._take(len(CONNECTION_PREFACE))
        if got != CONNECTION_PREFACE:
            raise Http2Error(f"bad connection preface {got[:24]!r}")

    def read_frame(self, max_frame: int = 1 << 24) -> tuple[int, int, int, bytes]:
        length, ftype, flags, stream_id = unpack_frame_header(self._take(9))
        if length > max_frame:
            raise Http2Error(f"frame of {length} bytes exceeds limit")
        return ftype, flags, stream_id, self._take(length)


# ---------------------------------------------------------------------------
# HPACK primitives (RFC 7541 §5)
# ---------------------------------------------------------------------------


def hpack_encode_int(value: int, prefix_bits: int, first_byte: int = 0) -> bytes:
    """Encode ``value`` with an N-bit prefix; ``first_byte`` carries the
    representation's pattern bits above the prefix."""
    if value < 0:
        raise HpackError("negative integer")
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([first_byte | value])
    out = bytearray([first_byte | limit])
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def hpack_decode_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    if pos >= len(data):
        raise HpackError("truncated integer")
    limit = (1 << prefix_bits) - 1
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise HpackError("truncated integer continuation")
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            return value, pos
        if shift > 63:
            raise HpackError("integer too long")


def hpack_encode_string(s: "str | bytes", huffman: bool = False) -> bytes:
    """String literal, raw (H=0, default) or Huffman-coded (H=1).

    The H bit is sender-optional (RFC 7541 §5.2); this repo's peers
    default to raw for inspectability, but ``huffman=True`` emits the
    compact form third-party stacks send — and only when it actually
    helps (the spec allows either, and a Huffman coding of random bytes
    EXPANDS; real encoders make the same shorter-of-the-two choice)."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    if huffman:
        enc = huffman_encode(b)
        if len(enc) < len(b):
            return hpack_encode_int(len(enc), 7, 0x80) + enc
    return hpack_encode_int(len(b), 7, 0x00) + b


def hpack_decode_string(data: bytes, pos: int) -> tuple[str, int]:
    if pos >= len(data):
        raise HpackError("truncated string literal")
    huffman = bool(data[pos] & 0x80)
    length, pos = hpack_decode_int(data, pos, 7)
    if pos + length > len(data):
        raise HpackError("truncated string payload")
    raw = data[pos:pos + length]
    pos += length
    if huffman:
        raw = huffman_decode(raw)
    return raw.decode("utf-8", errors="strict"), pos


# ---------------------------------------------------------------------------
# HPACK Huffman code (RFC 7541 Appendix B)
# ---------------------------------------------------------------------------
# (code, bit-length) for symbols 0..255 plus EOS (index 256).  The table
# is validated three independent ways in tests/test_http2.py:
#   1. structurally — the code is prefix-free, Kraft-complete
#      (sum 2^-len == 1) and canonically consecutive (sorted by length,
#      each left-justified code is exactly previous+1), which pins the
#      table's SHAPE to a single canonical code per length assignment;
#   2. against RFC 7541 Appendix C's Huffman-coded vectors (C.4.x /
#      C.6.x — real spec bytes covering a-z, 0-9, and the common
#      punctuation), which pins the per-symbol assignment for every
#      symbol the spec's own examples exercise;
#   3. by encode->decode round-trip over all 256 byte values.
HUFFMAN_CODES: list[tuple[int, int]] = [
    (0x1FF8, 13), (0x7FFFD8, 23), (0xFFFFFE2, 28), (0xFFFFFE3, 28),
    (0xFFFFFE4, 28), (0xFFFFFE5, 28), (0xFFFFFE6, 28), (0xFFFFFE7, 28),
    (0xFFFFFE8, 28), (0xFFFFEA, 24), (0x3FFFFFFC, 30), (0xFFFFFE9, 28),
    (0xFFFFFEA, 28), (0x3FFFFFFD, 30), (0xFFFFFEB, 28), (0xFFFFFEC, 28),
    (0xFFFFFED, 28), (0xFFFFFEE, 28), (0xFFFFFEF, 28), (0xFFFFFF0, 28),
    (0xFFFFFF1, 28), (0xFFFFFF2, 28), (0x3FFFFFFE, 30), (0xFFFFFF3, 28),
    (0xFFFFFF4, 28), (0xFFFFFF5, 28), (0xFFFFFF6, 28), (0xFFFFFF7, 28),
    (0xFFFFFF8, 28), (0xFFFFFF9, 28), (0xFFFFFFA, 28), (0xFFFFFFB, 28),
    (0x14, 6), (0x3F8, 10), (0x3F9, 10), (0xFFA, 12),
    (0x1FF9, 13), (0x15, 6), (0xF8, 8), (0x7FA, 11),
    (0x3FA, 10), (0x3FB, 10), (0xF9, 8), (0x7FB, 11),
    (0xFA, 8), (0x16, 6), (0x17, 6), (0x18, 6),
    (0x0, 5), (0x1, 5), (0x2, 5), (0x19, 6),
    (0x1A, 6), (0x1B, 6), (0x1C, 6), (0x1D, 6),
    (0x1E, 6), (0x1F, 6), (0x5C, 7), (0xFB, 8),
    (0x7FFC, 15), (0x20, 6), (0xFFB, 12), (0x3FC, 10),
    (0x1FFA, 13), (0x21, 6), (0x5D, 7), (0x5E, 7),
    (0x5F, 7), (0x60, 7), (0x61, 7), (0x62, 7),
    (0x63, 7), (0x64, 7), (0x65, 7), (0x66, 7),
    (0x67, 7), (0x68, 7), (0x69, 7), (0x6A, 7),
    (0x6B, 7), (0x6C, 7), (0x6D, 7), (0x6E, 7),
    (0x6F, 7), (0x70, 7), (0x71, 7), (0x72, 7),
    (0xFC, 8), (0x73, 7), (0xFD, 8), (0x1FFB, 13),
    (0x7FFF0, 19), (0x1FFC, 13), (0x3FFC, 14), (0x22, 6),
    (0x7FFD, 15), (0x3, 5), (0x23, 6), (0x4, 5),
    (0x24, 6), (0x5, 5), (0x25, 6), (0x26, 6),
    (0x27, 6), (0x6, 5), (0x74, 7), (0x75, 7),
    (0x28, 6), (0x29, 6), (0x2A, 6), (0x7, 5),
    (0x2B, 6), (0x76, 7), (0x2C, 6), (0x8, 5),
    (0x9, 5), (0x2D, 6), (0x77, 7), (0x78, 7),
    (0x79, 7), (0x7A, 7), (0x7B, 7), (0x7FFE, 15),
    (0x7FC, 11), (0x3FFD, 14), (0x1FFD, 13), (0xFFFFFFC, 28),
    (0xFFFE6, 20), (0x3FFFD2, 22), (0xFFFE7, 20), (0xFFFE8, 20),
    (0x3FFFD3, 22), (0x3FFFD4, 22), (0x3FFFD5, 22), (0x7FFFD9, 23),
    (0x3FFFD6, 22), (0x7FFFDA, 23), (0x7FFFDB, 23), (0x7FFFDC, 23),
    (0x7FFFDD, 23), (0x7FFFDE, 23), (0xFFFFEB, 24), (0x7FFFDF, 23),
    (0xFFFFEC, 24), (0xFFFFED, 24), (0x3FFFD7, 22), (0x7FFFE0, 23),
    (0xFFFFEE, 24), (0x7FFFE1, 23), (0x7FFFE2, 23), (0x7FFFE3, 23),
    (0x7FFFE4, 23), (0x1FFFDC, 21), (0x3FFFD8, 22), (0x7FFFE5, 23),
    (0x3FFFD9, 22), (0x7FFFE6, 23), (0x7FFFE7, 23), (0xFFFFEF, 24),
    (0x3FFFDA, 22), (0x1FFFDD, 21), (0xFFFE9, 20), (0x3FFFDB, 22),
    (0x3FFFDC, 22), (0x7FFFE8, 23), (0x7FFFE9, 23), (0x1FFFDE, 21),
    (0x7FFFEA, 23), (0x3FFFDD, 22), (0x3FFFDE, 22), (0xFFFFF0, 24),
    (0x1FFFDF, 21), (0x3FFFDF, 22), (0x7FFFEB, 23), (0x7FFFEC, 23),
    (0x1FFFE0, 21), (0x1FFFE1, 21), (0x3FFFE0, 22), (0x1FFFE2, 21),
    (0x7FFFED, 23), (0x3FFFE1, 22), (0x7FFFEE, 23), (0x7FFFEF, 23),
    (0xFFFEA, 20), (0x3FFFE2, 22), (0x3FFFE3, 22), (0x3FFFE4, 22),
    (0x7FFFF0, 23), (0x3FFFE5, 22), (0x3FFFE6, 22), (0x7FFFF1, 23),
    (0x3FFFFE0, 26), (0x3FFFFE1, 26), (0xFFFEB, 20), (0x7FFF1, 19),
    (0x3FFFE7, 22), (0x7FFFF2, 23), (0x3FFFE8, 22), (0x1FFFFEC, 25),
    (0x3FFFFE2, 26), (0x3FFFFE3, 26), (0x3FFFFE4, 26), (0x7FFFFDE, 27),
    (0x7FFFFDF, 27), (0x3FFFFE5, 26), (0xFFFFF1, 24), (0x1FFFFED, 25),
    (0x7FFF2, 19), (0x1FFFE3, 21), (0x3FFFFE6, 26), (0x7FFFFE0, 27),
    (0x7FFFFE1, 27), (0x3FFFFE7, 26), (0x7FFFFE2, 27), (0xFFFFF2, 24),
    (0x1FFFE4, 21), (0x1FFFE5, 21), (0x3FFFFE8, 26), (0x3FFFFE9, 26),
    (0xFFFFFFD, 28), (0x7FFFFE3, 27), (0x7FFFFE4, 27), (0x7FFFFE5, 27),
    (0xFFFEC, 20), (0xFFFFF3, 24), (0xFFFED, 20), (0x1FFFE6, 21),
    (0x3FFFE9, 22), (0x1FFFE7, 21), (0x1FFFE8, 21), (0x7FFFF3, 23),
    (0x3FFFEA, 22), (0x3FFFEB, 22), (0x1FFFFEE, 25), (0x1FFFFEF, 25),
    (0xFFFFF4, 24), (0xFFFFF5, 24), (0x3FFFFEA, 26), (0x7FFFF4, 23),
    (0x3FFFFEB, 26), (0x7FFFFE6, 27), (0x3FFFFEC, 26), (0x3FFFFED, 26),
    (0x7FFFFE7, 27), (0x7FFFFE8, 27), (0x7FFFFE9, 27), (0x7FFFFEA, 27),
    (0x7FFFFEB, 27), (0xFFFFFFE, 28), (0x7FFFFEC, 27), (0x7FFFFED, 27),
    (0x7FFFFEE, 27), (0x7FFFFEF, 27), (0x7FFFFF0, 27), (0x3FFFFEE, 26),
    (0x3FFFFFFF, 30),  # 256: EOS
]

_HUFFMAN_DECODE: dict[tuple[int, int], int] = {
    (code, bits): sym for sym, (code, bits) in enumerate(HUFFMAN_CODES)
}
_HUFFMAN_MIN_BITS = min(bits for _, bits in HUFFMAN_CODES)
_EOS_CODE, _EOS_BITS = HUFFMAN_CODES[256]


def huffman_encode(data: bytes) -> bytes:
    """Huffman-code ``data`` per RFC 7541 §5.2, padding the final byte
    with the most-significant bits of EOS (all-ones)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for b in data:
        code, bits = HUFFMAN_CODES[b]
        acc = (acc << bits) | code
        nbits += bits
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        pad = 8 - nbits
        out.append(((acc << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes) -> bytes:
    """Decode a Huffman-coded string literal (RFC 7541 §5.2).

    Errors per the spec: a decoded EOS symbol, padding longer than 7
    bits, or padding that is not the most-significant bits of EOS."""
    out = bytearray()
    acc = 0
    nbits = 0
    table = _HUFFMAN_DECODE
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        # greedily match: codes are <= 30 bits, so after each input byte
        # try every candidate length from shortest to current
        matched = True
        while matched and nbits >= _HUFFMAN_MIN_BITS:
            matched = False
            for bits in range(_HUFFMAN_MIN_BITS, min(nbits, 30) + 1):
                sym = table.get(((acc >> (nbits - bits)) & ((1 << bits) - 1),
                                 bits))
                if sym is not None:
                    if sym == 256:
                        raise HpackError("Huffman-coded EOS in string")
                    out.append(sym)
                    nbits -= bits
                    acc &= (1 << nbits) - 1
                    matched = True
                    break
    if nbits > 7:
        raise HpackError(f"Huffman padding of {nbits} bits exceeds 7")
    if nbits and acc != (1 << nbits) - 1:
        # the EOS code is all ones, so valid padding is all ones
        raise HpackError("Huffman padding is not the EOS prefix")
    return bytes(out)


# RFC 7541 Appendix A — the full static table, 1-based.
STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]

_ENTRY_OVERHEAD = 32  # RFC 7541 §4.1


def _entry_size(name: str, value: str) -> int:
    return len(name.encode()) + len(value.encode()) + _ENTRY_OVERHEAD


class _DynamicTable:
    """Shared dynamic-table bookkeeping for encoder and decoder sides."""

    def __init__(self, max_size: int = 4096) -> None:
        self.max_size = max_size
        self.entries: deque[tuple[str, str]] = deque()
        self.size = 0

    def add(self, name: str, value: str) -> None:
        need = _entry_size(name, value)
        while self.entries and self.size + need > self.max_size:
            en, ev = self.entries.pop()
            self.size -= _entry_size(en, ev)
        if need <= self.max_size:
            self.entries.appendleft((name, value))
            self.size += need
        # an entry larger than the table empties it (RFC 7541 §4.4)

    def resize(self, new_max: int) -> None:
        self.max_size = new_max
        while self.entries and self.size > self.max_size:
            en, ev = self.entries.pop()
            self.size -= _entry_size(en, ev)

    def lookup(self, index: int) -> tuple[str, str]:
        """1-based HPACK index across static + dynamic."""
        if index <= 0:
            raise HpackError(f"HPACK index {index} out of range")
        if index <= len(STATIC_TABLE):
            return STATIC_TABLE[index - 1]
        d = index - len(STATIC_TABLE) - 1
        if d >= len(self.entries):
            raise HpackError(f"HPACK index {index} out of range")
        return self.entries[d]


class HpackDecoder:
    def __init__(self, max_table_size: int = 4096) -> None:
        self.table = _DynamicTable(max_table_size)

    def decode(self, block: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # indexed field
                index, pos = hpack_decode_int(block, pos, 7)
                name, value = self.table.lookup(index)
                out.append((name, value))
            elif b & 0xC0 == 0x40:  # literal with incremental indexing
                index, pos = hpack_decode_int(block, pos, 6)
                name, value, pos = self._literal(block, pos, index)
                self.table.add(name, value)
                out.append((name, value))
            elif b & 0xE0 == 0x20:  # dynamic table size update
                new_max, pos = hpack_decode_int(block, pos, 5)
                self.table.resize(new_max)
            else:  # 0x00 literal no-index / 0x10 literal never-indexed
                index, pos = hpack_decode_int(block, pos, 4)
                name, value, pos = self._literal(block, pos, index)
                out.append((name, value))
        return out

    def _literal(self, block: bytes, pos: int,
                 name_index: int) -> tuple[str, str, int]:
        if name_index:
            name = self.table.lookup(name_index)[0]
        else:
            name, pos = hpack_decode_string(block, pos)
        value, pos = hpack_decode_string(block, pos)
        return name, value, pos


class HpackEncoder:
    """Symmetric encoder: indexed forms for exact static/dynamic matches,
    literal-with-incremental-indexing otherwise (so the peer's dynamic
    table fills exactly like ours).  String literals default to raw
    (H=0) for inspectability; ``huffman=True`` emits the compact H=1
    form third-party stacks expect, falling back to raw per-string when
    Huffman would not shrink it (the standard shorter-of-the-two
    choice)."""

    def __init__(self, max_table_size: int = 4096,
                 huffman: bool = False) -> None:
        self.table = _DynamicTable(max_table_size)
        self.huffman = huffman

    def encode(self, headers: Iterable[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            idx = self._find_exact(name, value)
            if idx is not None:
                out += hpack_encode_int(idx, 7, 0x80)
                continue
            name_idx = self._find_name(name) or 0
            out += hpack_encode_int(name_idx, 6, 0x40)
            if not name_idx:
                out += hpack_encode_string(name, huffman=self.huffman)
            out += hpack_encode_string(value, huffman=self.huffman)
            self.table.add(name, value)
        return bytes(out)

    def _find_exact(self, name: str, value: str) -> Optional[int]:
        for i, (n, v) in enumerate(STATIC_TABLE, start=1):
            if n == name and v == value:
                return i
        for i, (n, v) in enumerate(self.table.entries,
                                   start=len(STATIC_TABLE) + 1):
            if n == name and v == value:
                return i
        return None

    def _find_name(self, name: str) -> Optional[int]:
        for i, (n, _) in enumerate(STATIC_TABLE, start=1):
            if n == name:
                return i
        for i, (n, _) in enumerate(self.table.entries,
                                   start=len(STATIC_TABLE) + 1):
            if n == name:
                return i
        return None
