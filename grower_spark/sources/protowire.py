"""Pure-Python proto3 wire codec for the FileBuf ``Request`` message.

Reference parity: protobuf/filebuf/filebuf.proto defines the whole wire
surface of the gRPC transport —

    message Request { string data = 1; }

and internal/services/filegrpc/server.go:80-91 receives a stream of these.
The container has neither ``grpcio`` nor ``protobuf``, but this message is
simple enough that the proto3 wire format (varints + a length-delimited
string field) is hand-codable in a page of stdlib Python.  With this codec
the :class:`~grower_spark.sources.receiver.SpoolReceiver`'s ``"grpc"``
framing mode accepts the exact bytes a generated gRPC client stub would
put on the wire — the standard gRPC-over-HTTP/2 *message* framing
(1-byte compressed flag + 4-byte big-endian length, the "Length-Prefixed
Message" of the gRPC protocol spec) around a proto3-encoded ``Request`` —
so only the HTTP/2 transport itself remains out of scope (that genuinely
needs a gRPC/h2 stack).

Decoding follows proto3 semantics, not just the happy path:

- unknown fields are skipped by wire type (forward compatibility);
- repeated occurrences of a scalar field keep the LAST value;
- a missing ``data`` field decodes to proto3's default ``""``;
- truncated or malformed bytes raise ``ProtoWireError`` loudly.

No code is derived from the protobuf library; this is a from-scratch
implementation of the published wire format (developers.google.com/
protocol-buffers/docs/encoding).
"""

from __future__ import annotations

import struct
from typing import Iterator, Tuple

# proto3 wire types
_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5

_REQUEST_DATA_FIELD = 1  # filebuf.Request.data (proto3/filebuf.proto:11)

GRPC_HEADER = struct.Struct(">BI")  # compressed flag + message length


class ProtoWireError(ValueError):
    """Malformed proto3 / gRPC-frame bytes (truncated, bad wire type, ...)."""


# -- varints ------------------------------------------------------------------


def encode_varint(value: int) -> bytes:
    if value < 0:
        raise ProtoWireError(f"varint must be non-negative, got {value}")
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    """Return (value, next_pos); raises on truncation or >64-bit varints."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ProtoWireError("truncated varint")
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            # A 10th byte with payload bits above the 64-bit budget would
            # otherwise decode to a >64-bit value (e.g. b"\xff"*9 + b"\x7f"
            # -> 70 bits); canonical proto decoders reject that.
            if result >= 1 << 64:
                raise ProtoWireError("varint exceeds 64 bits")
            return result, pos
        shift += 7
        if shift >= 64:
            raise ProtoWireError("varint exceeds 64 bits")


# -- filebuf.Request ----------------------------------------------------------


def encode_request(data: str) -> bytes:
    """proto3-encode ``Request{data}``.

    proto3 convention: a string field equal to its default ("") is omitted
    entirely, producing the empty message — which is also what generated
    encoders emit.
    """
    if not data:
        return b""
    payload = data.encode("utf-8")
    tag = encode_varint(_REQUEST_DATA_FIELD << 3 | _WT_LEN)
    return tag + encode_varint(len(payload)) + payload


def decode_request(buf: bytes) -> str:
    """Decode proto3 ``Request`` bytes to its ``data`` string.

    Unknown fields are skipped per wire type; last-one-wins for repeated
    ``data``; absent ``data`` yields proto3's default ``""``.
    """
    data = ""
    pos = 0
    while pos < len(buf):
        key, pos = decode_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if field == 0:
            raise ProtoWireError("field number 0 is reserved")
        if wt == _WT_VARINT:
            value, pos = decode_varint(buf, pos)
        elif wt == _WT_I64:
            if pos + 8 > len(buf):
                raise ProtoWireError("truncated fixed64 field")
            pos += 8
        elif wt == _WT_LEN:
            size, pos = decode_varint(buf, pos)
            if pos + size > len(buf):
                raise ProtoWireError("truncated length-delimited field")
            if field == _REQUEST_DATA_FIELD:
                data = buf[pos : pos + size].decode("utf-8", errors="replace")
            pos += size
        elif wt == _WT_I32:
            if pos + 4 > len(buf):
                raise ProtoWireError("truncated fixed32 field")
            pos += 4
        else:
            raise ProtoWireError(f"unsupported wire type {wt} (field {field})")
    return data


# -- gRPC length-prefixed message framing -------------------------------------


def encode_grpc_message(data: str) -> bytes:
    """One gRPC wire message: 0x00 flag + u32 length + Request bytes."""
    msg = encode_request(data)
    return GRPC_HEADER.pack(0, len(msg)) + msg


def decode_grpc_stream(buf: bytes) -> Iterator[str]:
    """Decode a byte string of concatenated gRPC messages (for tests/tools).

    The streaming receiver decodes incrementally from the socket instead;
    this helper exists so the framing is testable without sockets.
    """
    pos = 0
    while pos < len(buf):
        if pos + GRPC_HEADER.size > len(buf):
            raise ProtoWireError("truncated gRPC message header")
        flag, size = GRPC_HEADER.unpack_from(buf, pos)
        pos += GRPC_HEADER.size
        if flag not in (0, 1):
            raise ProtoWireError(f"bad gRPC compressed flag {flag}")
        if flag == 1:
            # grpc-encoding compression is negotiated per-call; this
            # receiver never advertises one, so a compressed frame is a
            # protocol violation, not silently-droppable data.
            raise ProtoWireError("compressed gRPC message without a codec")
        if pos + size > len(buf):
            raise ProtoWireError("truncated gRPC message body")
        yield decode_request(buf[pos : pos + size])
        pos += size
