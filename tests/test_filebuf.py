"""FileBuf custom Python DataSource (S7): framed spool files -> DataFrame,
batch and streaming, including the torn-tail-frame guard."""

import struct

import pyspark.sql.functions as F

from grower_spark.config import PipelineConfig
from grower_spark.plans.pipeline import LogPipeline
from grower_spark.sources.filebuf import FileBufDataSource, read_frames, write_frames

LINE = '1.2.3.4 - bob [21/Jul/2022:00:30:43 +0300] "GET / HTTP/1.1" 200'

CONFIG = PipelineConfig.from_dict(
    {
        "nginx": {
            "log_format": '$remote_addr - $remote_user [$time_local] "$request" $status',
            "log_time_format": "02/Jan/2006:15:04:05 -0700",
        },
        "scheme": {
            "logs_table": "t.fbuf",
            "columns": {"remote_addr": "remote_addr", "status": "status"},
        },
    }
)


def test_frame_roundtrip(tmp_path):
    path = str(tmp_path / "a.fbuf")
    write_frames(path, ["hello", "wörld", ""])
    assert read_frames(path) == ["hello", "wörld", ""]


def test_torn_tail_frame_skipped(tmp_path):
    path = str(tmp_path / "a.fbuf")
    write_frames(path, ["complete"])
    with open(path, "ab") as fh:  # receiver crashed mid-frame
        fh.write(struct.pack(">I", 100))
        fh.write(b"only-part")
    assert read_frames(path) == ["complete"]


def test_batch_read_through_pipeline(spark, tmp_path):
    spark.dataSource.register(FileBufDataSource)
    write_frames(str(tmp_path / "s1.fbuf"), [LINE, "garbage"])
    write_frames(str(tmp_path / "s2.fbuf"), [LINE.replace(" 200", " 404")])
    df = spark.read.format("filebuf").load(str(tmp_path))
    assert df.count() == 3
    parsed = LogPipeline(CONFIG).parse(df)
    assert sorted(r["status"] for r in parsed.collect()) == [200, 404]


def test_streaming_read_new_files_only(spark, tmp_path):
    spark.dataSource.register(FileBufDataSource)
    spool = tmp_path / "spool"
    spool.mkdir()
    write_frames(str(spool / "b1.fbuf"), ["one", "two"])

    def drain():
        # parquet sink: the memory sink cannot recover from a checkpoint
        q = (
            spark.readStream.format("filebuf")
            .load(str(spool))
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = sorted(r["value"] for r in spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == ["one", "two"]
    # new spool file between runs: only it is consumed (offsets checkpointed)
    write_frames(str(spool / "b2.fbuf"), ["three"])
    drain()
    got = sorted(r["value"] for r in spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == ["one", "three", "two"]
