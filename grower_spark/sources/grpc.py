"""gRPC stream source (reference S7: protobuf/filebuf, filegrpc/server.go).

Spark has no native gRPC source, and a single gRPC endpoint feeding one
executor is an anti-pattern at any real scale — so the topology mirrors
the reference's own: a receiver PROCESS terminates the stream and Spark
consumes its spool.  Faithful options, in preference order:

1. **The h2c gRPC endpoint** (``sources/grpch2.py``, r12): the exact
   ``FileBufferService.CreateDataStreamer`` RPC
   (`protobuf/filebuf/filebuf.proto:6-15`,
   `internal/services/filegrpc/server.go:80-91`) over REAL HTTP/2
   frames — RFC 7540 framing + an RFC 7541 HPACK subset implemented
   in-repo (no ``grpc`` package in this env; dated probes in
   RESPONSES.md) — spooling to the same ``.fbuf`` files the custom
   ``filebuf`` Python DataSource reads, batch + streaming.
   ``python -m grower_spark.cli filegrpc --spool-dir D`` runs it;
   ``GrpcStreamClient`` is the producer twin.  Interop caveat: the
   HPACK subset rejects Huffman-coded header literals loudly (in-repo
   peers never send them; most third-party gRPC stacks do — see
   ``sources/http2.py``).
2. The bare-TCP receiver (``SpoolReceiver(framing="grpc")``): the gRPC
   length-prefixed-message framing + proto3 ``Request{data}`` decode
   (``sources/protowire.py``) without the HTTP/2 envelope.
3. The reference's own KafkaLog topology with the broker as the buffer
   (``sources.kafka``).

``grpc_line_stream`` documents the contract and fails loudly; use
``spark.read/readStream.format("filebuf")`` against the receiver's spool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def grpc_line_stream(spark: SparkSession, address: str) -> DataFrame:
    raise NotImplementedError(
        "No native gRPC Spark source. Run the h2c endpoint (cli filegrpc / "
        "sources.grpch2.GrpcSpoolServer) or the bare-TCP receiver "
        "(framing='grpc') and read its spool with "
        "spark.read/readStream.format('filebuf'). See module docstring."
    )
