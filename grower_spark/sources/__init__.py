from grower_spark.sources.file import batch_lines, stream_lines
from grower_spark.sources.filebuf import FileBufDataSource, read_frames, write_frames
from grower_spark.sources.kafka import kafka_line_stream, kafka_reader_options
from grower_spark.sources.receiver import SpoolReceiver
from grower_spark.sources.rotate import Rotator, clear_backup_files, compress_backup
from grower_spark.sources.syslog import rfc3164_extract, syslog_socket_stream

__all__ = [
    "FileBufDataSource",
    "Rotator",
    "SpoolReceiver",
    "batch_lines",
    "clear_backup_files",
    "compress_backup",
    "kafka_line_stream",
    "kafka_reader_options",
    "read_frames",
    "rfc3164_extract",
    "stream_lines",
    "syslog_socket_stream",
    "write_frames",
]
