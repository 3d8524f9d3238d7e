"""Pure-Python Kafka wire codec + minimal producer (reference K2 deepening).

The production path for the Kafka sink is Spark's own connector
(``sinks/kafka.py`` wires its options; the jar is absent in this
container, documented loud-fail).  This module is the K2 counterpart of
``sources/protowire.py`` for S7: the PUBLIC wire format implemented from
the protocol spec (https://kafka.apache.org/protocol) with zero
dependencies, pinned by hand-built byte tests — so the producer framing
the reference gets from segmentio/kafka-go (kafkalog/client.go:62-98) has
a verifiable, dependency-free stand-in here.

Implemented surface:

- CRC32C (Castagnoli) — the record-batch checksum algorithm, table-based.
- Kafka protocol primitives: big-endian ints, zigzag varints, STRING /
  NULLABLE_STRING / BYTES.
- RecordBatch **v2** (magic 2) encode/decode: the current on-wire and
  on-disk record format (batch header + varint-delta records + headers).
- Produce API **v3** request encode / response decode (the first version
  carrying v2 record batches), request header v1.
- ``KafkaWireProducer``: blocking single-connection producer speaking the
  above over a socket — enough to publish log lines to one topic-partition
  with acks, as the reference's writer does per batch.

Not implemented (documented non-goals): consumer groups / Fetch (S6 reads
go through Spark's connector), compression codecs (attributes=0), SASL/TLS,
idempotent producer ids.  The point is wire-format parity, not a client
library.
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass, field
from typing import Iterable, Optional

# -- CRC32C (Castagnoli, reflected polynomial 0x82F63B78) ---------------------

_CRC32C_TABLE: list[int] = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C; spec vector: crc32c(b"123456789") == 0xE3069283."""
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# -- primitives ---------------------------------------------------------------


def zigzag_encode(value: int) -> bytes:
    """Kafka record varints: zigzag then unsigned LEB128."""
    z = (value << 1) ^ (value >> 63)
    out = bytearray()
    while True:
        bits = z & 0x7F
        z >>= 7
        if z:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise KafkaWireError("truncated varint")
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
        if shift > 63:
            raise KafkaWireError("varint exceeds 64 bits")
    return (result >> 1) ^ -(result & 1), pos


def _string(s: Optional[str]) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _bytes(b: Optional[bytes]) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class KafkaWireError(RuntimeError):
    pass


# -- RecordBatch v2 -----------------------------------------------------------


@dataclass
class Record:
    value: bytes
    key: Optional[bytes] = None
    timestamp_ms: int = 0
    headers: list[tuple[str, bytes]] = field(default_factory=list)


def _encode_record(r: Record, offset_delta: int, ts_delta: int) -> bytes:
    body = bytearray()
    body += b"\x00"  # record attributes (unused)
    body += zigzag_encode(ts_delta)
    body += zigzag_encode(offset_delta)
    if r.key is None:
        body += zigzag_encode(-1)
    else:
        body += zigzag_encode(len(r.key)) + r.key
    body += zigzag_encode(len(r.value)) + r.value
    body += zigzag_encode(len(r.headers))
    for hk, hv in r.headers:
        kb = hk.encode("utf-8")
        body += zigzag_encode(len(kb)) + kb
        body += zigzag_encode(len(hv)) + hv
    return zigzag_encode(len(body)) + bytes(body)


def encode_record_batch(records: list[Record], base_offset: int = 0) -> bytes:
    """RecordBatch v2 (magic 2): attributes 0 (no compression, CREATE_TIME),
    no producer id (-1) — the shape a non-transactional producer sends."""
    if not records:
        raise KafkaWireError("empty batch")
    base_ts = records[0].timestamp_ms
    max_ts = max(r.timestamp_ms for r in records)
    recs = b"".join(
        _encode_record(r, i, r.timestamp_ms - base_ts)
        for i, r in enumerate(records)
    )
    after_crc = (
        struct.pack(">hiqqqhii", 0, len(records) - 1, base_ts, max_ts,
                    -1, -1, -1, len(records))
        + recs
    )
    crc = crc32c(after_crc)
    after_length = struct.pack(">ibI", 0, 2, crc) + after_crc
    return struct.pack(">qi", base_offset, len(after_length)) + after_length


def decode_record_batch(buf: bytes) -> tuple[int, list[Record]]:
    """Returns (base_offset, records); verifies magic and CRC."""
    if len(buf) < 61:
        raise KafkaWireError("batch shorter than v2 header")
    base_offset, batch_len = struct.unpack_from(">qi", buf, 0)
    if len(buf) < 12 + batch_len:
        raise KafkaWireError("truncated batch")
    _epoch, magic, crc = struct.unpack_from(">ibI", buf, 12)
    if magic != 2:
        raise KafkaWireError(f"unsupported magic {magic} (want 2)")
    after_crc = buf[21:12 + batch_len]
    if crc32c(after_crc) != crc:
        raise KafkaWireError("crc mismatch")
    (_attrs, _last_delta, base_ts, _max_ts, _pid, _pepoch, _bseq,
     n) = struct.unpack_from(">hiqqqhii", after_crc, 0)
    pos = struct.calcsize(">hiqqqhii")  # 40: header between crc and records
    out = []
    for _ in range(n):
        _rlen, pos = zigzag_decode(after_crc, pos)
        pos += 1  # record attributes
        ts_delta, pos = zigzag_decode(after_crc, pos)
        off_delta, pos = zigzag_decode(after_crc, pos)  # noqa: F841
        klen, pos = zigzag_decode(after_crc, pos)
        key = None
        if klen >= 0:
            key = after_crc[pos:pos + klen]
            pos += klen
        vlen, pos = zigzag_decode(after_crc, pos)
        value = after_crc[pos:pos + vlen]
        pos += vlen
        nh, pos = zigzag_decode(after_crc, pos)
        headers = []
        for _ in range(nh):
            hklen, pos = zigzag_decode(after_crc, pos)
            hk = after_crc[pos:pos + hklen].decode("utf-8")
            pos += hklen
            hvlen, pos = zigzag_decode(after_crc, pos)
            headers.append((hk, after_crc[pos:pos + hvlen]))
            pos += hvlen
        out.append(Record(value=value, key=key,
                          timestamp_ms=base_ts + ts_delta, headers=headers))
    return base_offset, out


# -- Produce API v3 -----------------------------------------------------------

PRODUCE_API_KEY = 0
PRODUCE_API_VERSION = 3


def encode_produce_request(
    topic: str,
    partition: int,
    batch: bytes,
    correlation_id: int,
    client_id: str = "grower-spark",
    acks: int = -1,
    timeout_ms: int = 30000,
) -> bytes:
    """Size-prefixed ProduceRequest v3 (header v1) for one topic-partition."""
    header = struct.pack(">hhi", PRODUCE_API_KEY, PRODUCE_API_VERSION,
                         correlation_id) + _string(client_id)
    body = (
        _string(None)                       # transactional_id
        + struct.pack(">hi", acks, timeout_ms)
        + struct.pack(">i", 1) + _string(topic)
        + struct.pack(">i", 1) + struct.pack(">i", partition)
        + _bytes(batch)
    )
    payload = header + body
    return struct.pack(">i", len(payload)) + payload


def decode_produce_response(payload: bytes) -> tuple[int, list[tuple[str, int, int, int]]]:
    """Returns (correlation_id, [(topic, partition, error_code, base_offset)])."""
    (corr,) = struct.unpack_from(">i", payload, 0)
    pos = 4
    (n_topics,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    out = []
    for _ in range(n_topics):
        (tlen,) = struct.unpack_from(">h", payload, pos)
        pos += 2
        topic = payload[pos:pos + tlen].decode("utf-8")
        pos += tlen
        (n_parts,) = struct.unpack_from(">i", payload, pos)
        pos += 4
        for _ in range(n_parts):
            part, err, base_off, _ts = struct.unpack_from(">ihqq", payload, pos)
            pos += 22
            out.append((topic, part, err, base_off))
    return corr, out


def encode_produce_response(
    correlation_id: int, topic: str, partition: int,
    error_code: int = 0, base_offset: int = 0,
) -> bytes:
    """Size-prefixed ProduceResponse v3 — the broker side, for tests/fakes."""
    payload = (
        struct.pack(">i", correlation_id)
        + struct.pack(">i", 1) + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">ihqq", partition, error_code, base_offset, -1)
        + struct.pack(">i", 0)  # throttle_time_ms
    )
    return struct.pack(">i", len(payload)) + payload


# -- minimal producer ---------------------------------------------------------


class KafkaWireProducer:
    """Blocking single-connection producer: one Produce request per
    ``send`` call, acks awaited.  One instance per executor-partition task
    (mirrors the ClickHouse sink's client_factory pattern)."""

    def __init__(self, host: str, port: int, topic: str, partition: int = 0,
                 acks: int = -1, timeout: float = 30.0) -> None:
        self.topic = topic
        self.partition = partition
        self.acks = acks
        self._corr = 0
        self._sock = socket.create_connection((host, port), timeout=timeout)

    def send(self, values: Iterable[bytes],
             timestamp_ms: int = 0) -> int:
        """Publish one batch; returns the broker-assigned base offset."""
        records = [Record(value=v, timestamp_ms=timestamp_ms) for v in values]
        self._corr += 1
        req = encode_produce_request(
            self.topic, self.partition, encode_record_batch(records),
            correlation_id=self._corr, acks=self.acks,
        )
        self._sock.sendall(req)
        if self.acks == 0:
            return -1
        (size,) = struct.unpack(">i", self._recv_exact(4))
        corr, parts = decode_produce_response(self._recv_exact(size))
        if corr != self._corr:
            raise KafkaWireError(f"correlation mismatch {corr} != {self._corr}")
        topic, part, err, base_off = parts[0]
        if err != 0:
            raise KafkaWireError(f"broker error_code={err} for {topic}/{part}")
        return base_off

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise KafkaWireError("connection closed mid-response")
            buf += chunk
        return buf

    def close(self) -> None:
        self._sock.close()
