"""SpoolReceiver e2e: socket -> spool -> filebuf DataFrame -> LogPipeline.

Closes the reference's transport daemons with real listeners (S7 filegrpc
server.go:80-91; S5 syslog.go:33-78 unixgram/UDP modes) — lines travel
through an actual socket, the receiver's write-then-rename spool
publication, the custom filebuf DataSource, and the parse pipeline.
"""

import os
import socket
import struct
import time

import pytest

from grower_spark.sources.filebuf import FileBufDataSource, read_frames
from grower_spark.sources.receiver import SpoolReceiver

from conftest import FIXTURES


def _send_frames(port: int, lines: list[str]) -> None:
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        for line in lines:
            payload = line.encode("utf-8")
            s.sendall(struct.pack(">I", len(payload)) + payload)


def _spool_lines(spool: str) -> list[str]:
    out = []
    for f in sorted(os.listdir(spool)):
        if f.endswith(".fbuf"):
            out.extend(read_frames(os.path.join(spool, f)))
    return out


def test_tcp_frames_to_spool(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="frames").start()
    try:
        _send_frames(rx.tcp_port, ["alpha", "bëta", ""])
    finally:
        rx.stop()
    assert rx.n_received == 3
    assert _spool_lines(spool) == ["alpha", "bëta", ""]
    assert not [f for f in os.listdir(spool) if f.startswith(".tmp")]


def test_tcp_lines_framing(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="lines").start()
    try:
        with socket.create_connection(("127.0.0.1", rx.tcp_port), timeout=5) as s:
            s.sendall(b"one\r\ntwo\nthree\n")
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["one", "two", "three"]


def test_flush_by_size_without_stop(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, flush_max_lines=2,
                       flush_interval=30.0).start()
    try:
        _send_frames(rx.tcp_port, ["a", "b", "c", "d", "e"])
        deadline = time.time() + 5
        while time.time() < deadline and rx.n_flushed_files < 2:
            time.sleep(0.05)
        # two full buffers published while still running (no interval flush:
        # it is set far beyond the wait)
        assert rx.n_flushed_files >= 2
        assert _spool_lines(spool)[:4] == ["a", "b", "c", "d"]
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["a", "b", "c", "d", "e"]


def test_torn_client_disconnect_drops_partial_frame(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="frames").start()
    try:
        with socket.create_connection(("127.0.0.1", rx.tcp_port), timeout=5) as s:
            payload = b"whole"
            s.sendall(struct.pack(">I", len(payload)) + payload)
            s.sendall(struct.pack(">I", 100) + b"torn")  # disconnect mid-frame
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["whole"]


def test_unix_datagram_syslog_mode(tmp_path):
    spool = str(tmp_path / "spool")
    sock_path = str(tmp_path / "syslog.sock")
    rx = SpoolReceiver(spool, datagram_path=sock_path).start()
    try:
        cl = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        try:
            for msg in [b"<190>Jul 21 00:30:43 host nginx: line one",
                        b"<190>Jul 21 00:30:44 host nginx: line two"]:
                cl.sendto(msg, sock_path)
        finally:
            cl.close()
        deadline = time.time() + 5
        while time.time() < deadline and rx.n_received < 2:
            time.sleep(0.05)
    finally:
        rx.stop()
    assert not os.path.exists(sock_path)  # cleaned up
    assert _spool_lines(spool) == [
        "<190>Jul 21 00:30:43 host nginx: line one",
        "<190>Jul 21 00:30:44 host nginx: line two",
    ]


def test_udp_datagram_mode(tmp_path):
    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, udp_port=0).start()
    try:
        cl = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            cl.sendto(b"udp line", ("127.0.0.1", rx.udp_port))
        finally:
            cl.close()
        deadline = time.time() + 5
        while time.time() < deadline and rx.n_received < 1:
            time.sleep(0.05)
    finally:
        rx.stop()
    assert _spool_lines(spool) == ["udp line"]


def test_spool_names_survive_restart_and_never_clobber(tmp_path, monkeypatch):
    """Spool names must use wall-clock epoch ms + pid (a monotonic clock
    resets at boot → a restarted receiver could silently rename over an
    unconsumed spool), and _flush must bump past an existing path rather
    than overwrite it."""
    import grower_spark.sources.receiver as rxmod

    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0)
    monkeypatch.setattr(rxmod.time, "time", lambda: 1234.567)
    rx._buf = ["first"]
    rx._flush()
    (name,) = os.listdir(spool)
    ms, pid, seq = name.rsplit(".", 1)[0].split("-")
    assert int(ms) == 1234567 and int(pid) == os.getpid() and int(seq) == 1

    # a second receiver (same dir, clock frozen, seq reset) must not
    # overwrite the first spool
    rx2 = SpoolReceiver(spool, tcp_port=0)
    first = os.path.join(spool, name)
    before = open(first, "rb").read()
    rx2._buf = ["second"]
    monkeypatch.setattr(rxmod.os, "getpid", lambda: int(pid))  # force collision
    rx2._flush()
    assert open(first, "rb").read() == before
    assert len(os.listdir(spool)) == 2


def test_no_listener_rejected(tmp_path):
    with pytest.raises(ValueError, match="no listener"):
        SpoolReceiver(str(tmp_path))
    with pytest.raises(ValueError, match="unknown framing"):
        SpoolReceiver(str(tmp_path), tcp_port=0, framing="bogus")


def test_live_receiver_feeding_running_stream(spark, tmp_path):
    """Receiver and streaming query running CONCURRENTLY: lines sent over
    the socket while the query is live must flow spool -> filebuf stream
    -> memory sink across multiple trigger cycles."""
    import time

    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="frames",
                       flush_max_lines=2, flush_interval=0.2).start()
    spark.dataSource.register(FileBufDataSource)
    q = (
        spark.readStream.format("filebuf")
        .load(spool)
        .writeStream.format("memory")
        .queryName("live_rx")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        _send_frames(rx.tcp_port, ["w1", "w2"])
        deadline = time.time() + 60
        while time.time() < deadline:
            got = {r["value"] for r in spark.sql("select * from live_rx").collect()}
            if got >= {"w1", "w2"}:
                break
            time.sleep(0.5)
        assert got >= {"w1", "w2"}, got
        # second wave while the query is still running
        _send_frames(rx.tcp_port, ["w3"])
        deadline = time.time() + 60
        while time.time() < deadline:
            got = {r["value"] for r in spark.sql("select * from live_rx").collect()}
            if "w3" in got:
                break
            time.sleep(0.5)
        assert got == {"w1", "w2", "w3"}, got
    finally:
        q.stop()
        rx.stop()


def test_socket_to_pipeline_e2e(spark, tmp_path):
    """Reference sample_test.log lines through socket -> spool ->
    format('filebuf') -> LogPipeline, asserting parsed field values."""
    from grower_spark.config import PipelineConfig
    from grower_spark.plans.pipeline import LogPipeline

    with open(os.path.join(FIXTURES, "sample_test.log")) as fh:
        lines = [ln.rstrip("\n") for ln in fh if ln.strip()]
    assert lines

    spool = str(tmp_path / "spool")
    rx = SpoolReceiver(spool, tcp_port=0, framing="frames").start()
    try:
        _send_frames(rx.tcp_port, lines)
    finally:
        rx.stop()

    cfg = PipelineConfig.from_yaml(os.path.join(FIXTURES, "sample_test.yaml"))
    # the fixture format carries an extended numeric tail the shipped log
    # lines don't have (see tests/fixtures provenance header)
    cfg.nginx.log_format = cfg.nginx.log_format.split(" $field_uint8")[0]

    spark.dataSource.register(FileBufDataSource)
    df = spark.read.format("filebuf").load(spool)
    assert df.count() == len(lines)
    parsed = LogPipeline(cfg).parse(df)
    rows = parsed.collect()
    assert len(rows) == len(lines)
    assert {r["remote_addr"] for r in rows} == {"114.119.133.192"}
    assert {r["status"] for r in rows} == {444}
