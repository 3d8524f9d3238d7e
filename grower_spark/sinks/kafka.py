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
    balancer: str = "round_robin",
) -> int:
    """Publish every row's ``value_col`` as one unkeyed message through the
    dependency-free wire producer — the reference kafkalog CLIENT's write
    path (client.go:92-98) driven from Spark executors.

    ``balancer`` selects the topic-partition per message, mirroring the
    reference's balancer map (opt.go:47-61):

    - ``round_robin``: one partition per Spark task, rotating by task id
      (one connection per task — the cheapest shape);
    - ``crc32``: kafka-go's ``Hash``-family keyed balancing, keyed on the
      message value via CRC32 (stable across runs and workers);
    - ``least_bytes``: the reference DEFAULT — each message goes to the
      task-locally least-loaded partition by bytes sent (kafka-go tracks
      this per writer; per-task tracking is the honest equivalent here).

    Keyed/least-bytes modes hold one open producer per target partition
    and one ``batch_size``-bounded buffer each.  With the default
    ``acks=-1`` every batch is awaited, so a task failure replays its
    partition — at-least-once, matching the connector path's semantics.
    ``acks=0`` is the reference's ``kafka-async`` fire-and-forget mode
    (kafka-go ``Async``, client.go:66): no broker errors are surfaced and
    delivery degrades to at-most-once.  Returns the number of messages
    sent (accumulator-counted in the same pass — no second scan).
    """
    if balancer not in ("round_robin", "crc32", "least_bytes"):
        raise ValueError(f"unknown balancer {balancer!r}")
    parts = partitions or [0]
    sent = df.sparkSession.sparkContext.accumulator(0)

    def send(rows) -> None:
        import zlib
        from itertools import islice

        from pyspark import TaskContext

        from grower_spark.sinks.kafkawire import KafkaWireProducer

        it = (bytes(r["value"]) for r in rows)
        if balancer == "round_robin":
            # one partition per task: single connection, streamed chunks
            first = list(islice(it, batch_size))
            if not first:
                return
            pid = TaskContext.get().partitionId() if TaskContext.get() else 0
            producer = KafkaWireProducer(
                host, port, topic,
                partition=parts[pid % len(parts)], acks=acks,
            )
            try:
                chunk = first
                while chunk:
                    producer.send(chunk)
                    sent.add(len(chunk))
                    chunk = list(islice(it, batch_size))
            finally:
                producer.close()
            return
        # keyed / least-bytes: one lazily opened producer + bounded buffer
        # per target partition; memory O(len(parts) * batch_size)
        producers: dict[int, KafkaWireProducer] = {}
        buffers: dict[int, list[bytes]] = {p: [] for p in parts}
        loads: dict[int, int] = {p: 0 for p in parts}

        def flush(p: int) -> None:
            if not buffers[p]:
                return
            if p not in producers:
                producers[p] = KafkaWireProducer(
                    host, port, topic, partition=p, acks=acks
                )
            producers[p].send(buffers[p])
            sent.add(len(buffers[p]))
            buffers[p].clear()

        try:
            for v in it:
                if balancer == "crc32":
                    p = parts[zlib.crc32(v) % len(parts)]
                else:  # least_bytes: task-local byte loads
                    p = min(parts, key=lambda q: loads[q])
                buffers[p].append(v)
                loads[p] += len(v)
                if len(buffers[p]) >= batch_size:
                    flush(p)
            for p in parts:
                flush(p)
        finally:
            for producer in producers.values():
                producer.close()

    frame_for_kafka(df, value_col=value_col).foreachPartition(send)
    return sent.value
