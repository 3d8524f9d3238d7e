"""proto3/gRPC wire codec (sources/protowire.py) + receiver "grpc" framing.

The filebuf.Request message (protobuf/filebuf/filebuf.proto:10-12) is the
entire wire surface of the reference's gRPC transport; these tests pin the
hand-rolled codec against bytes built independently from the published
proto3 encoding spec, then run the real socket path end to end.
"""

import socket
import struct

import pytest

from grower_spark.sources.protowire import (
    ProtoWireError,
    decode_grpc_stream,
    decode_request,
    decode_varint,
    encode_grpc_message,
    encode_request,
    encode_varint,
)
from grower_spark.sources.receiver import SpoolReceiver

from test_receiver import _spool_lines


# -- varints ------------------------------------------------------------------


@pytest.mark.parametrize(
    "value,wire",
    [
        (0, b"\x00"),
        (1, b"\x01"),
        (127, b"\x7f"),
        (128, b"\x80\x01"),
        (300, b"\xac\x02"),  # the canonical spec example
        (2**32, b"\x80\x80\x80\x80\x10"),
        (2**64 - 1, b"\xff" * 9 + b"\x01"),
    ],
)
def test_varint_roundtrip_against_spec_bytes(value, wire):
    assert encode_varint(value) == wire
    assert decode_varint(wire, 0) == (value, len(wire))


def test_varint_rejects_truncation_and_overflow():
    with pytest.raises(ProtoWireError, match="truncated"):
        decode_varint(b"\x80\x80", 0)
    with pytest.raises(ProtoWireError, match="64 bits"):
        decode_varint(b"\xff" * 10 + b"\x01", 0)
    with pytest.raises(ProtoWireError, match="non-negative"):
        encode_varint(-1)


# -- Request ------------------------------------------------------------------


def test_request_encoding_matches_hand_built_bytes():
    # field 1, wire type 2 => tag 0x0a; then length + utf-8 payload
    assert encode_request("hi") == b"\x0a\x02hi"
    assert encode_request("") == b""  # proto3 default omitted
    text = "x" * 200  # length needs a two-byte varint
    assert encode_request(text) == b"\x0a\xc8\x01" + b"x" * 200


@pytest.mark.parametrize("text", ["", "hello", "ünïcödé ✓", "x" * 5000])
def test_request_roundtrip(text):
    assert decode_request(encode_request(text)) == text


def test_decode_skips_unknown_fields_every_wire_type():
    wire = (
        b"\x10\xac\x02"  # field 2, varint 300
        + b"\x19" + b"\x00" * 8  # field 3, fixed64
        + b"\x22\x03abc"  # field 4, length-delimited
        + b"\x2d" + b"\x00" * 4  # field 5, fixed32
        + b"\x0a\x04data"  # field 1: the actual payload
    )
    assert decode_request(wire) == "data"


def test_decode_last_one_wins_and_default():
    assert decode_request(b"\x0a\x01a\x0a\x01b") == "b"
    assert decode_request(b"") == ""  # absent field -> proto3 default
    assert decode_request(b"\x10\x05") == ""  # only unknown fields


@pytest.mark.parametrize(
    "wire,msg",
    [
        (b"\x0a\x05ab", "truncated length-delimited"),
        (b"\x19\x00", "truncated fixed64"),
        (b"\x2d\x00", "truncated fixed32"),
        (b"\x0b", "unsupported wire type"),  # wt=3 (group), unsupported
        (b"\x02\x00", "field number 0"),
    ],
)
def test_decode_rejects_malformed(wire, msg):
    with pytest.raises(ProtoWireError, match=msg):
        decode_request(wire)


# -- gRPC message framing -----------------------------------------------------


def test_grpc_message_framing_bytes():
    assert encode_grpc_message("hi") == b"\x00\x00\x00\x00\x04\x0a\x02hi"
    assert list(decode_grpc_stream(b"")) == []
    buf = b"".join(encode_grpc_message(s) for s in ["a", "", "ß"])
    assert list(decode_grpc_stream(buf)) == ["a", "", "ß"]


def test_grpc_stream_rejects_compressed_and_torn():
    with pytest.raises(ProtoWireError, match="compressed"):
        list(decode_grpc_stream(b"\x01\x00\x00\x00\x00"))
    with pytest.raises(ProtoWireError, match="bad gRPC compressed flag"):
        list(decode_grpc_stream(b"\x07\x00\x00\x00\x00"))
    with pytest.raises(ProtoWireError, match="truncated gRPC message body"):
        list(decode_grpc_stream(b"\x00\x00\x00\x00\x05\x0a"))
    with pytest.raises(ProtoWireError, match="truncated gRPC message header"):
        list(decode_grpc_stream(b"\x00\x00"))


# -- receiver e2e over the real socket ---------------------------------------


def _send_grpc(port: int, lines: list[str]) -> None:
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        for line in lines:
            s.sendall(encode_grpc_message(line))


def test_receiver_grpc_framing_to_spool(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="grpc").start()
    try:
        _send_grpc(rx.tcp_port, ["alpha", "bëta", ""])
    finally:
        rx.stop()
    assert rx.n_received == 3
    assert _spool_lines(spool) == ["alpha", "bëta", ""]


def test_receiver_grpc_drops_connection_on_protocol_violation(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="grpc").start()
    try:
        with socket.create_connection(("127.0.0.1", rx.tcp_port), timeout=5) as s:
            s.sendall(encode_grpc_message("kept"))
            # compressed flag set without negotiated codec: connection drops,
            # receiver stays alive for the next client
            s.sendall(b"\x01\x00\x00\x00\x00")
            s.sendall(encode_grpc_message("after-violation"))
        _send_grpc(rx.tcp_port, ["second-client"])
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["kept", "second-client"]


def test_receiver_grpc_torn_message_at_disconnect(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="grpc").start()
    try:
        with socket.create_connection(("127.0.0.1", rx.tcp_port), timeout=5) as s:
            s.sendall(encode_grpc_message("whole"))
            s.sendall(b"\x00\x00\x00\x00\x09\x0a\x03ab")  # header says 9, body cut
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["whole"]


@pytest.mark.parametrize("framing", ["frames", "grpc"])
def test_receiver_rejects_oversize_length_prefix(tmp_path, framing):
    """ADVICE r4: the length prefix is client-controlled (u32, ~4 GiB); a
    single hostile frame must drop the connection instead of ballooning
    one readexactly — in BOTH stream framings.  gRPC's own default max
    receive size (4 MiB) is the default cap."""
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(
        spool, tcp_port=0, framing=framing, max_message_bytes=1024
    ).start()
    try:
        with socket.create_connection(("127.0.0.1", rx.tcp_port), timeout=5) as s:
            if framing == "grpc":
                s.sendall(b"\x00" + struct.pack(">I", 1 << 30))  # claims 1 GiB
            else:
                s.sendall(struct.pack(">I", 1 << 30))
            s.settimeout(5)
            assert s.recv(1) == b""  # server closed the connection
        # receiver stays alive; a compliant client still gets through
        if framing == "grpc":
            _send_grpc(rx.tcp_port, ["post-oversize"])
        else:
            with socket.create_connection(("127.0.0.1", rx.tcp_port), timeout=5) as s:
                payload = "post-oversize".encode()
                s.sendall(struct.pack(">I", len(payload)) + payload)
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["post-oversize"]


def test_receiver_accepts_frame_at_exact_cap(tmp_path):
    """Boundary: a frame of exactly max_message_bytes is legal."""
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="frames",
                       max_message_bytes=64).start()
    try:
        with socket.create_connection(("127.0.0.1", rx.tcp_port), timeout=5) as s:
            payload = b"y" * 64
            s.sendall(struct.pack(">I", len(payload)) + payload)
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["y" * 64]


# -- property-based round-trips (hypothesis) ----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip_property(value):
    wire = encode_varint(value)
    assert len(wire) <= 10
    assert decode_varint(wire, 0) == (value, len(wire))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2000))
def test_request_roundtrip_property(text):
    assert decode_request(encode_request(text)) == text


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2**64, max_value=2**70 - 1))
def test_varint_overflow_always_rejected(value):
    """ADVICE r4: a 10-byte varint whose last byte has no continuation bit
    can encode >64-bit values; the decoder must reject every one of them."""
    wire = bytearray()
    v = value
    while True:
        bits = v & 0x7F
        v >>= 7
        if v:
            wire.append(bits | 0x80)
        else:
            wire.append(bits)
            break
    if len(wire) > 10:  # >70-bit encodings already die on the shift guard
        return
    with pytest.raises(ProtoWireError, match="64 bits"):
        decode_varint(bytes(wire), 0)
