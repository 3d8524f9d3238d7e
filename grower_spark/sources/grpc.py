"""gRPC stream source (reference S7: protobuf/filebuf, filegrpc/server.go).

Deliberately deferred (SURVEY.md §2.1 S7): Spark has no native gRPC source,
and a single gRPC endpoint feeding one executor is an anti-pattern at any
real scale.  Faithful options, in preference order:

1. A tiny receiver process (outside Spark) appending length-prefixed
   frames to spool files consumed by the custom ``filebuf`` Python
   DataSource (``sources/filebuf.py``) — IMPLEMENTED, batch + streaming.
   With ``SpoolReceiver(framing="grpc")`` the receiver accepts the exact
   gRPC wire bytes (length-prefixed-message framing + proto3
   ``Request{data}``, hand-decoded in ``sources/protowire.py``), so the
   remaining gap vs the reference endpoint is the HTTP/2 transport alone.
2. The reference's own KafkaLog topology with the broker as the buffer
   (``sources.kafka``).
3. A DataSource wrapping a grpc client directly — the grpc package is not
   in this container (that is what HTTP/2 would need).

``grpc_line_stream`` documents the contract and fails loudly; use
``spark.read/readStream.format("filebuf")`` against the receiver's spool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def grpc_line_stream(spark: SparkSession, address: str) -> DataFrame:
    raise NotImplementedError(
        "No native gRPC source. Route the FileBuf stream through files or "
        "Kafka (sources.file / sources.kafka), or implement a Python "
        "DataSource with the grpc package installed. See module docstring."
    )
