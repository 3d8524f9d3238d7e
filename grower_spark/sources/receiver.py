"""Socket-to-spool receiver: the ingest edge for the filebuf DataSource.

Reference parity: the reference runs transport daemons that accept lines
and hand them to the buffered pipeline —

- a gRPC stream server (internal/services/filegrpc/server.go:80-91 receives
  Request{data} messages; :136-166 drains a channel into the buffer), and
- a syslog daemon over TCP / UDP / unix sockets
  (internal/services/syslog/syslog.go:33-78 sets up the listeners).

In the Spark-first design the scalable handoff is files, not an in-process
channel: this receiver listens on TCP / unix-stream / UDP / unix-datagram
sockets, buffers received lines, and publishes them as length-prefixed
``*.fbuf`` spool files via write-then-rename (atomic publish), which
``sources/filebuf.py`` reads as a batch or streaming DataFrame.  The
receiver is a plain asyncio process — no external packages — so it stands
in faithfully for the gRPC endpoint (same framing, same spool contract)
without the grpc dependency this container lacks.

Stream framing modes:

- ``"frames"``: 4-byte big-endian length prefix per payload — the filebuf
  wire format (what a gRPC Request{data} stream degenerates to without
  protobuf).
- ``"grpc"``: the actual gRPC wire bytes — 1-byte compressed flag +
  4-byte big-endian length + proto3-encoded ``Request{data}``
  (``sources/protowire.py``); what a generated client stub sends, minus
  only the HTTP/2 transport.
- ``"lines"``: newline-delimited UTF-8 — TCP syslog (RFC 6587 style).

Datagram sockets (UDP / unix-datagram) are always one-message-one-line —
the reference's syslog unixgram mode that bin/send_to_syslog.sh exercises.

Usage::

    rx = SpoolReceiver(spool_dir, tcp_port=0, framing="frames")
    rx.start()                       # returns once sockets are bound
    ... clients connect to rx.tcp_port ...
    rx.stop()                        # flushes the tail spool
    df = spark.read.format("filebuf").load(spool_dir)
"""

from __future__ import annotations

import asyncio
import logging
import os
import socket
import struct
import threading
import time
from typing import Optional

from grower_spark.sources.filebuf import FRAME_SUFFIX
from grower_spark.sources.protowire import GRPC_HEADER, ProtoWireError, decode_request

log = logging.getLogger(__name__)


class SpoolReceiver:
    """Buffered socket receiver publishing ``.fbuf`` spools.

    Any combination of listeners can be enabled:

    - ``tcp_port`` (with ``tcp_host``): TCP stream, ``framing`` applies.
      Port 0 binds an ephemeral port, exposed as ``self.tcp_port``.
    - ``unix_path``: unix stream socket, ``framing`` applies.
    - ``udp_port``: UDP datagrams (one line per packet), ``self.udp_port``.
    - ``datagram_path``: unix datagram socket (one line per packet).

    Lines are buffered and flushed to ``<epoch_ms>-<pid>-<seq>.fbuf`` when
    ``flush_max_lines`` is reached or ``flush_interval`` seconds pass with
    data pending (the reference's size-or-ticker flush policy,
    internal/services/filelog/impl.go's buffer loop).  Files are written to
    a dot-prefixed temp name and renamed, so the filebuf reader never sees
    a torn file.
    """

    def __init__(
        self,
        spool_dir: str,
        *,
        tcp_host: str = "127.0.0.1",
        tcp_port: Optional[int] = None,
        unix_path: Optional[str] = None,
        udp_port: Optional[int] = None,
        datagram_path: Optional[str] = None,
        framing: str = "frames",
        flush_max_lines: int = 1000,
        flush_interval: float = 0.25,
        max_message_bytes: int = 4 * 1024 * 1024,
    ) -> None:
        if framing not in ("frames", "grpc", "lines"):
            raise ValueError(f"unknown framing {framing!r} (want frames|grpc|lines)")
        if tcp_port is None and not unix_path and udp_port is None and not datagram_path:
            raise ValueError("no listener configured")
        self.spool_dir = spool_dir
        self.tcp_host = tcp_host
        self.tcp_port = tcp_port
        self.unix_path = unix_path
        self.udp_port = udp_port
        self.datagram_path = datagram_path
        self.framing = framing
        self.flush_max_lines = flush_max_lines
        self.flush_interval = flush_interval
        # The length prefix is client-controlled (u32, up to ~4 GiB); one
        # hostile or buggy client could otherwise balloon receiver memory
        # with a single readexactly.  gRPC servers enforce a max receive
        # message size for the same reason — its default is also 4 MiB.
        self.max_message_bytes = max_message_bytes
        self.n_received = 0
        self.n_flushed_files = 0
        self._buf: list[str] = []
        self._conn_tasks: set = set()
        self._seq = 0
        self._loop: Optional[asyncio.AbstractEventLoop] = None
        self._thread: Optional[threading.Thread] = None
        self._ready = threading.Event()
        self._stop: Optional[asyncio.Event] = None
        self._startup_error: Optional[BaseException] = None

    # -- spool publication ----------------------------------------------------

    def _flush(self) -> None:
        """Publish the buffered lines as one spool file (atomic rename).

        Names are wall-clock epoch ms + pid + per-instance sequence: a
        monotonic/loop clock is process-relative (resets at boot), so after
        a restart — or with two receivers sharing a spool dir — a new file
        could collide with an existing unconsumed spool and the rename
        would silently overwrite it.  Epoch+pid makes collisions
        practically impossible; the existence check below makes even those
        loud instead of lossy.
        """
        if not self._buf:
            return
        lines, self._buf = self._buf, []
        self._seq += 1
        os.makedirs(self.spool_dir, exist_ok=True)
        now_ms = int(time.time() * 1000)
        pid = os.getpid()
        final = os.path.join(
            self.spool_dir, f"{now_ms:015d}-{pid:07d}-{self._seq:06d}{FRAME_SUFFIX}"
        )
        while os.path.exists(final):  # never clobber an unconsumed spool
            self._seq += 1
            final = os.path.join(
                self.spool_dir,
                f"{now_ms:015d}-{pid:07d}-{self._seq:06d}{FRAME_SUFFIX}",
            )
        tmp = os.path.join(self.spool_dir, f".tmp-{pid:07d}-{self._seq:06d}")
        with open(tmp, "wb") as fh:
            for line in lines:
                payload = line.encode("utf-8")
                fh.write(struct.pack(">I", len(payload)))
                fh.write(payload)
        os.rename(tmp, final)
        self.n_flushed_files += 1

    def _push(self, line: str) -> None:
        self._buf.append(line)
        self.n_received += 1
        if len(self._buf) >= self.flush_max_lines:
            self._flush()

    # -- listeners ------------------------------------------------------------

    async def _handle_stream(self, reader: asyncio.StreamReader, writer) -> None:
        task = asyncio.current_task()
        self._conn_tasks.add(task)
        try:
            if self.framing == "frames":
                while True:
                    try:
                        header = await reader.readexactly(4)
                    except asyncio.IncompleteReadError:
                        break
                    (n,) = struct.unpack(">I", header)
                    if n > self.max_message_bytes:
                        break  # oversize frame: drop the connection
                    try:
                        payload = await reader.readexactly(n)
                    except asyncio.IncompleteReadError:
                        break  # torn frame at disconnect: drop, like read_frames
                    self._push(payload.decode("utf-8", errors="replace"))
            elif self.framing == "grpc":
                while True:
                    try:
                        header = await reader.readexactly(GRPC_HEADER.size)
                    except asyncio.IncompleteReadError:
                        break
                    flag, n = GRPC_HEADER.unpack(header)
                    if flag != 0:
                        # compression was never negotiated — protocol
                        # violation; drop the connection, not the error
                        break
                    if n > self.max_message_bytes:
                        break  # oversize message: drop the connection
                    try:
                        payload = await reader.readexactly(n)
                    except asyncio.IncompleteReadError:
                        break  # torn message at disconnect: drop
                    try:
                        self._push(decode_request(payload))
                    except ProtoWireError:
                        break  # malformed protobuf: close, stay alive
            else:
                while True:
                    raw = await reader.readline()
                    if not raw:
                        break
                    self._push(raw.decode("utf-8", errors="replace").rstrip("\r\n"))
        finally:
            writer.close()
            self._conn_tasks.discard(task)

    class _DatagramProto(asyncio.DatagramProtocol):
        def __init__(self, rx: "SpoolReceiver") -> None:
            self.rx = rx

        def datagram_received(self, data: bytes, addr) -> None:
            self.rx._push(data.decode("utf-8", errors="replace").rstrip("\r\n"))

    async def _flusher(self) -> None:
        assert self._stop is not None
        while not self._stop.is_set():
            try:
                await asyncio.wait_for(self._stop.wait(), self.flush_interval)
            except asyncio.TimeoutError:
                pass
            self._flush()

    async def _main(self) -> None:
        self._stop = asyncio.Event()
        servers = []
        transports = []
        loop = asyncio.get_running_loop()
        try:
            if self.tcp_port is not None:
                srv = await asyncio.start_server(
                    self._handle_stream, self.tcp_host, self.tcp_port
                )
                self.tcp_port = srv.sockets[0].getsockname()[1]
                servers.append(srv)
            if self.unix_path:
                servers.append(
                    await asyncio.start_unix_server(self._handle_stream, self.unix_path)
                )
            if self.udp_port is not None:
                transport, _ = await loop.create_datagram_endpoint(
                    lambda: self._DatagramProto(self),
                    local_addr=(self.tcp_host, self.udp_port),
                )
                self.udp_port = transport.get_extra_info("sockname")[1]
                transports.append(transport)
            if self.datagram_path:
                sock = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
                sock.setblocking(False)
                sock.bind(self.datagram_path)
                transport, _ = await loop.create_datagram_endpoint(
                    lambda: self._DatagramProto(self), sock=sock
                )
                transports.append(transport)
        except BaseException as exc:
            self._startup_error = exc
            self._ready.set()
            raise
        self._ready.set()
        flusher = asyncio.ensure_future(self._flusher())
        await self._stop.wait()
        await flusher
        for srv in servers:
            srv.close()
            await srv.wait_closed()
        # drain in-flight connections before the tail flush (stop() racing a
        # client's final bytes otherwise loses them); cap the wait so a
        # still-connected idle client can't wedge shutdown
        if self._conn_tasks:
            await asyncio.wait(list(self._conn_tasks), timeout=5)
            for task in list(self._conn_tasks):
                task.cancel()
        for tr in transports:
            tr.close()
        await asyncio.sleep(0)  # let datagram protocol callbacks settle
        self._flush()  # tail
        if self.unix_path and os.path.exists(self.unix_path):
            os.unlink(self.unix_path)
        if self.datagram_path and os.path.exists(self.datagram_path):
            os.unlink(self.datagram_path)

    # -- lifecycle ------------------------------------------------------------

    def start(self) -> "SpoolReceiver":
        def run() -> None:
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)
            try:
                self._loop.run_until_complete(self._main())
            except BaseException:
                # Startup failures are re-raised to the caller through
                # _startup_error; anything else is a mid-run crash of the
                # receiver loop — warn instead of dying silently
                # (reference warn-everything discipline, impl.go:179-181).
                if self._startup_error is None:
                    log.warning("spool receiver loop exited abnormally",
                                exc_info=True)
            finally:
                self._loop.close()

        os.makedirs(self.spool_dir, exist_ok=True)
        self._thread = threading.Thread(target=run, name="spool-receiver", daemon=True)
        self._thread.start()
        self._ready.wait(timeout=10)
        if self._startup_error is not None:
            raise self._startup_error
        return self

    def stop(self) -> None:
        if self._loop is None or self._stop is None:
            return
        self._loop.call_soon_threadsafe(self._stop.set)
        if self._thread is not None:
            self._thread.join(timeout=10)
