from grower_spark.streaming.filelog import FileLogRunner

__all__ = ["FileLogRunner"]
