"""FileBuf source (reference S7) as a Spark 4 Python DataSource.

The reference's FileBuf transport is a gRPC stream of line frames
(protobuf/filebuf/filebuf.proto: Request{data string}) into an in-process
channel.  A single gRPC endpoint cannot be a scalable Spark source, so the
faithful Spark-4-native shape is: a thin receiver process appends
length-prefixed frames to spool files ("*.fbuf"), and this custom
``pyspark.sql.datasource`` reads them — batch (one partition per file) and
streaming (``SimpleDataSourceStreamReader`` with file-set offsets).

Frame format: 4-byte big-endian payload length + UTF-8 payload.  The
``write_frames`` helper is the client/receiver side (what the gRPC server
stub would call per message).

Usage::

    spark.dataSource.register(FileBufDataSource)
    df = spark.read.format("filebuf").load("/spool/dir")           # batch
    sdf = spark.readStream.format("filebuf").load("/spool/dir")    # stream
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

FRAME_SUFFIX = ".fbuf"
SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def write_frames(path: str, lines: list[str]) -> None:
    """Append length-prefixed frames (the receiver/client side)."""
    with open(path, "ab") as fh:
        for line in lines:
            payload = line.encode("utf-8")
            fh.write(struct.pack(">I", len(payload)))
            fh.write(payload)


def read_frames(path: str) -> list[str]:
    out = []
    with open(path, "rb") as fh:
        while True:
            header = fh.read(4)
            if len(header) < 4:
                break
            (n,) = struct.unpack(">I", header)
            payload = fh.read(n)
            if len(payload) < n:
                break  # torn tail frame (receiver mid-write): skip
            out.append(payload.decode("utf-8", errors="replace"))
    return out


def _spool_files(directory: str) -> list[str]:
    if not os.path.isdir(directory):
        return []
    return sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if f.endswith(FRAME_SUFFIX)
    )


@dataclass
class _FilePartition(InputPartition):
    path: str


class _FileBufBatchReader(DataSourceReader):
    def __init__(self, options):
        self.directory = options.get("path")

    def partitions(self):
        files = _spool_files(self.directory)
        # at least one partition is required: an empty spool dir gets a
        # sentinel partition that yields nothing (read(None) otherwise)
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition or not partition.path:
            return
        for line in read_frames(partition.path):
            yield (line,)


class _FileBufStreamReader(SimpleDataSourceStreamReader):
    """Streaming: the offset is the set of fully-consumed spool files.

    Receivers must write-then-rename (atomic publish) so a listed file is
    complete; a torn tail frame is skipped defensively either way.
    """

    def __init__(self, options):
        self.directory = options.get("path")

    def initialOffset(self):
        return {"consumed": []}

    def read(self, start):
        consumed = set(start.get("consumed", []))
        new_files = [p for p in _spool_files(self.directory) if p not in consumed]
        rows = [(line,) for p in new_files for line in read_frames(p)]
        end = {"consumed": sorted(consumed | set(new_files))}
        return iter(rows), end

    def readBetweenOffsets(self, start, end):
        prev = set(start.get("consumed", []))
        files = [p for p in end.get("consumed", []) if p not in prev]
        return iter((line,) for p in files for line in read_frames(p))


class FileBufDataSource(DataSource):
    @classmethod
    def name(cls):
        return "filebuf"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _FileBufBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _FileBufStreamReader(self.options)
