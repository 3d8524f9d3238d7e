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
- Fetch API **v4** request/response + ``KafkaWireConsumer`` (one
  partition per reader, caller-owned offsets) and ``kafka_to_spool``:
  drains a partition into ``.fbuf`` spool files, so the reference's
  kafkalog topology (consume -> parse -> sink, server.go:117-152) runs
  end-to-end through the same spool contract the gRPC/syslog transports
  use.  ``kafka_to_spool_multi`` drains a partition LIST with a bounded
  reader pool and per-partition resume offsets — the reference's
  ``AsyncFactor`` parallel readers (server.go:109-122).
- ListOffsets API **v1** + ``KafkaWireConsumer.query_offset``: resolves
  ``"earliest"``/``"latest"`` start positions (kafka-go
  FirstOffset/LastOffset semantics — correct on retention-truncated
  logs, where offset 0 no longer exists).
- ``OffsetCheckpoint``: atomic JSON per-partition resume offsets — the
  local stand-in for the reference's consumer-group offset commit
  (GroupID, server.go:121).
- ``KafkaSpoolPoller``: the always-on drain loop (reference kafkalog
  server lifecycle) with partial-progress offset folding on reader
  failures.
- CreateTopics API **v0** + idempotent ``create_topic`` — the reference's
  ``kafka-create-topic`` flag is a literal ``// todo`` there
  (client.go:86-88); implemented as the superset-of-TODO pattern.

Not implemented (documented non-goals): consumer groups (offset tracking
is the bridge's checkpoint; Spark's connector owns it on a real cluster),
compression codecs (attributes=0), SASL/TLS, idempotent producer ids.
The point is wire-format parity, not a client library.
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
    if result >= 1 << 64:
        # 10th byte may only carry the single remaining bit (same guard as
        # sources/protowire.py decode_varint — keep the codecs consistent).
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


def _recv_exact_from(sock, n: int) -> bytes:
    """Read exactly n bytes from a socket (shared by producer, consumer,
    and the one-shot admin calls — one place to fix partial-read
    handling)."""
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise KafkaWireError("connection closed mid-response")
        buf += chunk
    return buf


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
        return _recv_exact_from(self._sock, n)

    def close(self) -> None:
        self._sock.close()


# -- Fetch API v4 (consumer side: reference S6's read path) -------------------

FETCH_API_KEY = 1
FETCH_API_VERSION = 4


def encode_fetch_request(
    topic: str,
    partition: int,
    fetch_offset: int,
    correlation_id: int,
    client_id: str = "grower-spark",
    max_wait_ms: int = 500,
    min_bytes: int = 1,
    max_bytes: int = 1 << 20,
) -> bytes:
    """Size-prefixed FetchRequest v4 (header v1) for one topic-partition."""
    header = struct.pack(">hhi", FETCH_API_KEY, FETCH_API_VERSION,
                         correlation_id) + _string(client_id)
    body = (
        struct.pack(">iiiib", -1, max_wait_ms, min_bytes, max_bytes, 0)
        + struct.pack(">i", 1) + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">iqi", partition, fetch_offset, max_bytes)
    )
    payload = header + body
    return struct.pack(">i", len(payload)) + payload


def _decode_record_batches(buf: bytes) -> list[tuple[int, Record]]:
    """A fetch record_set may concatenate several batches; returns
    (offset, record) pairs in log order."""
    out = []
    pos = 0
    while pos + 12 <= len(buf):
        base_offset, batch_len = struct.unpack_from(">qi", buf, pos)
        end = pos + 12 + batch_len
        if end > len(buf):
            break  # torn tail batch (broker may truncate at max_bytes)
        _, records = decode_record_batch(buf[pos:end])
        out.extend((base_offset + i, r) for i, r in enumerate(records))
        pos = end
    return out


def decode_fetch_response(payload: bytes) -> tuple[int, int, int, list[tuple[int, Record]]]:
    """Returns (correlation_id, error_code, high_watermark,
    [(offset, record), ...]) for the single topic-partition requested."""
    (corr,) = struct.unpack_from(">i", payload, 0)
    pos = 8  # correlation_id + throttle_time_ms
    (n_topics,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    if n_topics != 1:
        raise KafkaWireError(f"expected 1 topic in response, got {n_topics}")
    (tlen,) = struct.unpack_from(">h", payload, pos)
    pos += 2 + tlen
    (n_parts,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    if n_parts != 1:
        raise KafkaWireError(f"expected 1 partition in response, got {n_parts}")
    _part, err, hw, _lso = struct.unpack_from(">ihqq", payload, pos)
    pos += 22
    (n_aborted,) = struct.unpack_from(">i", payload, pos)
    pos += 4 + max(n_aborted, 0) * 16  # producer_id(int64) + first_offset(int64)
    (blen,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    records = _decode_record_batches(payload[pos:pos + max(blen, 0)])
    return corr, err, hw, records


def encode_fetch_response(
    correlation_id: int,
    topic: str,
    partition: int,
    record_set: bytes,
    high_watermark: int,
    error_code: int = 0,
) -> bytes:
    """Size-prefixed FetchResponse v4 — the broker side, for tests/fakes."""
    payload = (
        struct.pack(">ii", correlation_id, 0)  # throttle_time_ms
        + struct.pack(">i", 1) + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">ihqq", partition, error_code, high_watermark, high_watermark)
        + struct.pack(">i", 0)  # aborted_transactions: empty
        + _bytes(record_set)
    )
    return struct.pack(">i", len(payload)) + payload


# -- ListOffsets API v1 (earliest/latest resolution) --------------------------

LIST_OFFSETS_API_KEY = 2
LIST_OFFSETS_API_VERSION = 1
EARLIEST_TIMESTAMP = -2  # spec sentinel: log start offset
LATEST_TIMESTAMP = -1    # spec sentinel: high watermark


def encode_list_offsets_request(
    topic: str,
    partition: int,
    timestamp: int,
    correlation_id: int,
    client_id: str = "grower-spark",
) -> bytes:
    """Size-prefixed ListOffsetsRequest v1 (header v1) for one
    topic-partition; ``timestamp`` is an epoch-ms target or one of the
    spec sentinels (-2 earliest, -1 latest)."""
    header = struct.pack(">hhi", LIST_OFFSETS_API_KEY,
                         LIST_OFFSETS_API_VERSION,
                         correlation_id) + _string(client_id)
    body = (
        struct.pack(">i", -1)               # replica_id: consumer
        + struct.pack(">i", 1) + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">iq", partition, timestamp)
    )
    payload = header + body
    return struct.pack(">i", len(payload)) + payload


def decode_list_offsets_response(payload: bytes) -> tuple[int, int, int, int]:
    """Returns (correlation_id, error_code, timestamp, offset) for the
    single topic-partition requested.  (v1 has no throttle_time field —
    that arrived in v2.)"""
    (corr,) = struct.unpack_from(">i", payload, 0)
    pos = 4
    (n_topics,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    if n_topics != 1:
        raise KafkaWireError(f"expected 1 topic in response, got {n_topics}")
    (tlen,) = struct.unpack_from(">h", payload, pos)
    pos += 2 + tlen
    (n_parts,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    if n_parts != 1:
        raise KafkaWireError(f"expected 1 partition in response, got {n_parts}")
    _part, err, ts, offset = struct.unpack_from(">ihqq", payload, pos)
    return corr, err, ts, offset


def encode_list_offsets_response(
    correlation_id: int,
    topic: str,
    partition: int,
    offset: int,
    timestamp: int = -1,
    error_code: int = 0,
) -> bytes:
    """Size-prefixed ListOffsetsResponse v1 — broker side, for tests/fakes."""
    payload = (
        struct.pack(">i", correlation_id)
        + struct.pack(">i", 1) + _string(topic)
        + struct.pack(">i", 1)
        + struct.pack(">ihqq", partition, error_code, timestamp, offset)
    )
    return struct.pack(">i", len(payload)) + payload


class KafkaWireConsumer:
    """Blocking single-partition consumer: ``poll`` fetches from an offset
    and returns ((offset, Record) pairs, high_watermark).  No consumer
    groups — offset tracking is the caller's (the spool bridge checkpoints
    it; Spark's connector owns it on a real cluster)."""

    def __init__(self, host: str, port: int, topic: str, partition: int = 0,
                 timeout: float = 30.0, max_bytes: int = 1 << 20) -> None:
        self.topic = topic
        self.partition = partition
        self.max_bytes = max_bytes
        self._corr = 0
        self._sock = socket.create_connection((host, port), timeout=timeout)

    def poll(self, offset: int) -> tuple[list[tuple[int, Record]], int]:
        self._corr += 1
        self._sock.sendall(encode_fetch_request(
            self.topic, self.partition, offset, self._corr,
            max_bytes=self.max_bytes,
        ))
        (size,) = struct.unpack(">i", self._recv_exact(4))
        corr, err, hw, records = decode_fetch_response(self._recv_exact(size))
        if corr != self._corr:
            raise KafkaWireError(f"correlation mismatch {corr} != {self._corr}")
        if err != 0:
            raise KafkaWireError(f"broker error_code={err} on fetch")
        return records, hw

    def query_offset(self, timestamp: int) -> int:
        """Resolve a timestamp (or EARLIEST_TIMESTAMP / LATEST_TIMESTAMP)
        to an offset via ListOffsets v1.  kafka-go's reader does this for
        StartOffset = FirstOffset/LastOffset; resuming from a literal 0 is
        wrong on a retention-truncated log, where the log start has moved."""
        self._corr += 1
        self._sock.sendall(encode_list_offsets_request(
            self.topic, self.partition, timestamp, self._corr,
        ))
        (size,) = struct.unpack(">i", self._recv_exact(4))
        corr, err, _ts, offset = decode_list_offsets_response(
            self._recv_exact(size)
        )
        if corr != self._corr:
            raise KafkaWireError(f"correlation mismatch {corr} != {self._corr}")
        if err != 0:
            raise KafkaWireError(f"broker error_code={err} on list_offsets")
        return offset

    _recv_exact = KafkaWireProducer._recv_exact

    def close(self) -> None:
        self._sock.close()


def kafka_to_spool(
    consumer: KafkaWireConsumer,
    spool_dir: str,
    start_offset: "int | str" = 0,
    max_polls: Optional[int] = None,
) -> int:
    """Drain a partition into ``.fbuf`` spool files (one file per
    non-empty fetch, write-then-rename) until caught up to the high
    watermark — the kafkalog ingest edge re-expressed on the spool
    contract, so ``spark.read.format("filebuf")`` (batch or streaming)
    picks the messages up exactly like the gRPC/syslog transports.

    ``start_offset`` may be a literal offset or ``"earliest"`` /
    ``"latest"``, resolved via ListOffsets v1 (kafka-go's
    FirstOffset/LastOffset semantics — a literal 0 is wrong on a
    retention-truncated log).

    Returns the next offset to fetch (resume point; persist it alongside
    the spool for at-least-once across restarts — or use
    ``OffsetCheckpoint``)."""
    import os
    import time as _time

    from grower_spark.sources.filebuf import FRAME_SUFFIX, write_frames

    os.makedirs(spool_dir, exist_ok=True)
    if start_offset == "earliest":
        start_offset = consumer.query_offset(EARLIEST_TIMESTAMP)
    elif start_offset == "latest":
        start_offset = consumer.query_offset(LATEST_TIMESTAMP)
    elif isinstance(start_offset, str):
        raise KafkaWireError(
            f"start_offset must be an int, 'earliest' or 'latest'; "
            f"got {start_offset!r}"
        )
    offset = start_offset
    polls = 0
    empty_streak = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        records, hw = consumer.poll(offset)
        if not records and offset < hw:
            # Not caught up yet the fetch returned nothing complete — a batch
            # larger than max_bytes was torn at the tail.  Grow the window and
            # retry a bounded number of times rather than busy-polling forever.
            empty_streak += 1
            consumer.max_bytes = min(consumer.max_bytes * 2, 1 << 30)
            if empty_streak >= 8:
                raise KafkaWireError(
                    f"fetch stalled at offset {offset} (high_watermark {hw}): "
                    f"8 consecutive empty polls, max_bytes={consumer.max_bytes}"
                )
            continue
        empty_streak = 0
        if records:
            offset = records[-1][0] + 1
            now_ms = int(_time.time() * 1000)
            # partition in the name: parallel per-partition drains (see
            # kafka_to_spool_multi) may land the same offset in the same
            # millisecond from the same pid
            part = consumer.partition
            final = os.path.join(
                spool_dir,
                f"{now_ms:015d}-{os.getpid():07d}-p{part:04d}-{offset:012d}{FRAME_SUFFIX}",
            )
            tmp = os.path.join(
                spool_dir, f".tmp-{os.getpid():07d}-p{part:04d}-{offset:012d}"
            )
            write_frames(tmp, [r.value.decode("utf-8", errors="replace")
                               for _, r in records])
            os.rename(tmp, final)
        if offset >= hw:
            break
    return offset


def kafka_to_spool_multi(
    host: str,
    port: int,
    topic: str,
    partitions: list[int],
    spool_dir: str,
    start_offsets: Optional[dict[int, int]] = None,
    async_factor: Optional[int] = None,
    max_polls: Optional[int] = None,
    default_start: "int | str" = 0,
) -> dict[int, int]:
    """Drain a PARTITION LIST into one ``.fbuf`` spool directory with
    per-partition resume offsets — the reference's ``AsyncFactor``
    parallel readers (internal/services/kafkalog/server.go:109-122)
    re-expressed on the spool contract.

    ``async_factor`` bounds concurrent readers (reference default: one
    per partition).  Each reader owns one connection and one partition at
    a time, so the wire protocol stays single-partition per request, as
    the reference's readers do.  Partitions absent from ``start_offsets``
    begin at ``default_start`` (an offset, or ``"earliest"``/``"latest"``
    resolved per partition via ListOffsets).  Returns
    {partition: next_offset}; persist it alongside the spool and pass it
    back as ``start_offsets`` to resume (at-least-once across restarts,
    exactly like the single-partition bridge — ``OffsetCheckpoint`` does
    the persisting).

    Reader failures propagate: the first exception is re-raised after all
    workers stop, with the successfully drained partitions' next offsets
    attached as ``exc.partial_offsets`` — callers that retry (the poller)
    MUST fold those in before re-polling, or every retry re-spools the
    healthy partitions' records as duplicates for as long as one
    partition stays broken.
    """
    import queue as _queue
    import threading as _threading

    starts = start_offsets or {}
    todo: _queue.Queue[int] = _queue.Queue()
    for p in partitions:
        todo.put(p)
    results: dict[int, int] = {}
    errors: list[BaseException] = []
    lock = _threading.Lock()

    def worker() -> None:
        while True:
            try:
                p = todo.get_nowait()
            except _queue.Empty:
                return
            try:
                consumer = KafkaWireConsumer(host, port, topic, partition=p)
                try:
                    nxt = kafka_to_spool(
                        consumer, spool_dir,
                        start_offset=starts.get(p, default_start),
                        max_polls=max_polls,
                    )
                finally:
                    consumer.close()
                with lock:
                    results[p] = nxt
            except BaseException as exc:
                with lock:
                    errors.append(exc)
                # keep draining the remaining queued partitions: with
                # async_factor < len(partitions) a worker returning here
                # would starve every partition still in the queue behind
                # one broken one (the exact starvation partial_offsets
                # exists to avoid)

    n = min(async_factor or len(partitions), len(partitions))
    threads = [_threading.Thread(target=worker, daemon=True) for _ in range(max(n, 1))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        errors[0].partial_offsets = dict(results)  # type: ignore[attr-defined]
        raise errors[0]
    return results


class OffsetCheckpoint:
    """Durable per-partition resume offsets for the spool bridge: a JSON
    file written atomically (tmp + rename, same contract as the spool
    files themselves).

    This is the faithful local stand-in for the reference's consumer-group
    offset commit (kafka.ReaderConfig.GroupID, server.go:117-122 — the
    group coordinator persists offsets broker-side; here a file beside the
    spool does).  Load-before/save-after a drain gives the same
    at-least-once semantics: a crash between spooling and saving replays
    the tail, never skips it.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def load(self) -> dict[int, int]:
        import json
        import os

        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            raw = json.load(f)
        return {int(k): int(v) for k, v in raw.items()}

    def save(self, offsets: dict[int, int]) -> None:
        import json
        import os

        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in offsets.items()}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.path)


class KafkaSpoolPoller:
    """Continuous kafkalog ingest daemon: drain the partition list into
    the spool on an interval, checkpointing offsets after every catch-up —
    the long-running counterpart of ``kafka_to_spool_multi`` (the
    reference's kafkalog server is an always-on process,
    server.go:109-152, not a one-shot drain).  Pair with
    ``spark.readStream.format("filebuf")`` exactly like ``SpoolReceiver``
    pairs for the syslog/gRPC transports.

    Transient broker failures are warn-logged and retried next interval
    (reference warn-and-continue, server.go:144-147); offsets only advance
    past records that are durably spooled, so a crash anywhere replays,
    never skips (at-least-once, same contract as the one-shot bridge).
    """

    def __init__(
        self,
        host: str,
        port: int,
        topic: str,
        partitions: list[int],
        spool_dir: str,
        checkpoint: "OffsetCheckpoint | None" = None,
        poll_interval: float = 1.0,
        async_factor: Optional[int] = None,
        default_start: "int | str" = 0,
        start_offsets: Optional[dict[int, int]] = None,
    ) -> None:
        import threading as _threading

        self.host, self.port, self.topic = host, port, topic
        self.partitions = partitions
        self.spool_dir = spool_dir
        self.checkpoint = checkpoint
        self.poll_interval = poll_interval
        self.async_factor = async_factor
        self.default_start = default_start
        # explicit start_offsets win over checkpointed values (same
        # precedence as the one-shot CLI path)
        self.offsets: dict[int, int] = {
            **(checkpoint.load() if checkpoint else {}),
            **(start_offsets or {}),
        }
        self._stop = _threading.Event()
        self._thread: "_threading.Thread | None" = None

    def _loop(self) -> None:
        import logging

        log = logging.getLogger(__name__)
        while not self._stop.is_set():
            try:
                nxt = kafka_to_spool_multi(
                    self.host, self.port, self.topic, self.partitions,
                    self.spool_dir, start_offsets=dict(self.offsets),
                    async_factor=self.async_factor,
                    default_start=self.default_start,
                )
                self.offsets.update(nxt)
                if self.checkpoint is not None:
                    self.checkpoint.save(self.offsets)
            except BaseException as exc:
                # BaseException, not Exception: the workers re-raise
                # whatever killed them (incl. MemoryError/SystemExit) —
                # an uncaught one here would kill this daemon thread
                # SILENTLY and the --follow CLI would stream an idle
                # spool forever looking healthy.
                # Fold in the partitions that DID drain before the failure:
                # without this, every retry re-fetches and re-spools their
                # records as duplicates while one partition stays broken.
                partial = getattr(exc, "partial_offsets", None)
                if partial:
                    self.offsets.update(partial)
                    if self.checkpoint is not None:
                        try:
                            self.checkpoint.save(self.offsets)
                        except OSError:
                            log.warning("offset checkpoint save failed",
                                        exc_info=True)
                if not isinstance(exc, Exception):
                    # fatal class: log LOUDLY and stop polling rather than
                    # retry into the same wall
                    log.error("kafka spool poller stopping on fatal %s",
                              type(exc).__name__, exc_info=True)
                    return
                log.warning("kafka spool poll failed; retrying in %.1fs",
                            self.poll_interval, exc_info=True)
            self._stop.wait(self.poll_interval)

    def start(self) -> "KafkaSpoolPoller":
        import threading as _threading

        self._thread = _threading.Thread(
            target=self._loop, name="kafka-spool-poller", daemon=True
        )
        self._thread.start()
        return self

    def stop(self, timeout: float = 30.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)


# -- CreateTopics API v0 (reference client's kafka-create-topic flag — a
# literal `// todo` in the reference, client.go:86-88; implemented here as
# the superset-of-TODO pattern used for gzip rotation and /metrics) ----------

CREATE_TOPICS_API_KEY = 19
CREATE_TOPICS_API_VERSION = 0
TOPIC_ALREADY_EXISTS = 36


def encode_create_topics_request(
    topic: str,
    num_partitions: int,
    replication_factor: int,
    correlation_id: int,
    client_id: str = "grower-spark",
    timeout_ms: int = 30000,
) -> bytes:
    """Size-prefixed CreateTopicsRequest v0 (header v1) for one topic,
    broker-assigned replica placement, no config overrides."""
    header = struct.pack(">hhi", CREATE_TOPICS_API_KEY,
                         CREATE_TOPICS_API_VERSION,
                         correlation_id) + _string(client_id)
    body = (
        struct.pack(">i", 1) + _string(topic)
        + struct.pack(">ih", num_partitions, replication_factor)
        + struct.pack(">i", 0)  # replica_assignments: broker decides
        + struct.pack(">i", 0)  # config_entries: defaults
        + struct.pack(">i", timeout_ms)
    )
    payload = header + body
    return struct.pack(">i", len(payload)) + payload


def decode_create_topics_response(payload: bytes) -> tuple[int, int]:
    """Returns (correlation_id, error_code) for the single topic."""
    (corr,) = struct.unpack_from(">i", payload, 0)
    pos = 4
    (n_topics,) = struct.unpack_from(">i", payload, pos)
    pos += 4
    if n_topics != 1:
        raise KafkaWireError(f"expected 1 topic in response, got {n_topics}")
    (tlen,) = struct.unpack_from(">h", payload, pos)
    pos += 2 + tlen
    (err,) = struct.unpack_from(">h", payload, pos)
    return corr, err


def encode_create_topics_response(
    correlation_id: int, topic: str, error_code: int = 0
) -> bytes:
    """Size-prefixed CreateTopicsResponse v0 — broker side, for fakes."""
    payload = (
        struct.pack(">i", correlation_id)
        + struct.pack(">i", 1) + _string(topic)
        + struct.pack(">h", error_code)
    )
    return struct.pack(">i", len(payload)) + payload


def create_topic(
    host: str,
    port: int,
    topic: str,
    num_partitions: int = 1,
    replication_factor: int = 1,
    timeout: float = 30.0,
) -> bool:
    """Create ``topic`` if absent; returns True if created, False if it
    already existed (error 36 — idempotent by design, so the publish
    CLI's --create-topic is safe to leave on)."""
    sock = socket.create_connection((host, port), timeout=timeout)
    try:
        sock.sendall(encode_create_topics_request(
            topic, num_partitions, replication_factor, correlation_id=1,
        ))
        (size,) = struct.unpack(">i", _recv_exact_from(sock, 4))
        corr, err = decode_create_topics_response(_recv_exact_from(sock, size))
        if corr != 1:
            raise KafkaWireError(f"correlation mismatch {corr} != 1")
        if err == 0:
            return True
        if err == TOPIC_ALREADY_EXISTS:
            return False
        raise KafkaWireError(f"broker error_code={err} on create_topics")
    finally:
        sock.close()
