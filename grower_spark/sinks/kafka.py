"""Kafka producer sink (reference K2: kafkalog/client.go:62-98).

The reference sends one message per log line, unkeyed, with a selectable
partition balancer (least_bytes default).  Spark's Kafka sink handles
batching/partitioning; unkeyed messages get the producer's default sticky
partitioning (≈ least_bytes in spirit), and a key column opts into hash
partitioning (≈ the reference's hash balancers).

The connector jar is absent in this container (dated probes in
``sources/kafka.py``); ``sinks/kafkawire.py`` carries a dependency-free
wire-level producer (RecordBatch v2 + Produce v3, CRC32C) as the
protocol-verified stand-in.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def kafka_writer_options(brokers: list[str] | str, topic: str) -> dict[str, str]:
    if isinstance(brokers, (list, tuple)):
        brokers = ",".join(brokers)
    return {"kafka.bootstrap.servers": brokers, "topic": topic}


def frame_for_kafka(df: DataFrame, value_col: str = "value",
                    key_col: Optional[str] = None) -> DataFrame:
    """Project to the (key, value) binary frame the Kafka sink expects."""
    cols = [F.col(value_col).cast("string").cast("binary").alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").cast("binary").alias("key"))
    return df.select(*cols)


def kafka_stream_writer(df: DataFrame, checkpoint_dir: str, **options):
    """Streaming writer builder (caller ``.start()``s); requires the
    spark-sql-kafka connector on the classpath."""
    writer = frame_for_kafka(df).writeStream.format("kafka").option(
        "checkpointLocation", checkpoint_dir
    )
    for k, v in kafka_writer_options(**options).items():
        writer = writer.option(k, v)
    return writer


def publish_lines_wire(
    df: DataFrame,
    host: str,
    port: int,
    topic: str,
    partitions: "list[int] | None" = None,
    value_col: str = "value",
    batch_size: int = 500,
    acks: int = -1,
) -> int:
    """Publish every row's ``value_col`` as one unkeyed message through the
    dependency-free wire producer — the reference kafkalog CLIENT's write
    path (client.go:92-98) driven from Spark executors.

    One producer connection per Spark partition task; topic-partitions are
    assigned round-robin by Spark partition id (the reference's
    ``round_robin`` balancer; its default ``least_bytes`` needs broker
    metadata the wire stand-in doesn't track).  With the default
    ``acks=-1`` every batch is awaited, so a task failure replays its
    partition — at-least-once, matching the connector path's semantics.
    ``acks=0`` is the reference's ``kafka-async`` fire-and-forget mode
    (kafka-go ``Async``, client.go:66): no broker errors are surfaced and
    delivery degrades to at-most-once.  Returns the number of messages
    sent (accumulator-counted in the same pass — no second scan).
    """
    parts = partitions or [0]
    sent = df.sparkSession.sparkContext.accumulator(0)

    def send(rows) -> None:
        from itertools import islice

        from pyspark import TaskContext

        from grower_spark.sinks.kafkawire import KafkaWireProducer

        it = (bytes(r["value"]) for r in rows)
        # stream in batch_size chunks: the iterator is never materialized,
        # so executor memory is O(batch_size) regardless of partition size
        first = list(islice(it, batch_size))
        if not first:
            return
        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        producer = KafkaWireProducer(
            host, port, topic, partition=parts[pid % len(parts)], acks=acks
        )
        try:
            chunk = first
            while chunk:
                producer.send(chunk)
                sent.add(len(chunk))
                chunk = list(islice(it, batch_size))
        finally:
            producer.close()

    frame_for_kafka(df, value_col=value_col).foreachPartition(send)
    return sent.value
