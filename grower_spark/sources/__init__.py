from grower_spark.sources.file import batch_lines, stream_lines
from grower_spark.sources.rotate import Rotator, clear_backup_files
from grower_spark.sources.syslog import rfc3164_extract, syslog_socket_stream
from grower_spark.sources.kafka import kafka_reader_options, kafka_line_stream
from grower_spark.sources.filebuf import FileBufDataSource, write_frames

__all__ = [
    "batch_lines",
    "stream_lines",
    "Rotator",
    "clear_backup_files",
    "rfc3164_extract",
    "syslog_socket_stream",
    "kafka_reader_options",
    "kafka_line_stream",
    "FileBufDataSource",
    "write_frames",
]
