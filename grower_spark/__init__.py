"""grower_spark — a PySpark-native rebuild of the zikwall/grower ingestion engine.

The reference (read-only at /root/reference/) is a streaming nginx-access-log
ETL pipeline: log line -> regex parse -> projection/rename -> ClickHouse-typed
cast -> buffered batch insert into ClickHouse, shipped over four transports
(FileLog, SysLog, KafkaLog, FileBuf/gRPC).  This package re-expresses the same
semantics Spark-first:

- ``config``            YAML pipeline config (reference: config/config.go)
- ``plans.template``    nginx log_format -> regex compiler (pkg/nginx/template.go)
- ``plans.caster``      ClickHouse type names -> Spark cast expressions
                        (pkg/nginx/caster.go)
- ``plans.pipeline``    the compiled parse/cast DataFrame pipeline
                        (pkg/handler/handler.go)
- ``sources``           file / kafka / syslog sources (internal/services/*)
- ``sinks``             ClickHouse / Kafka / files sinks + dead-letter
- ``streaming``         Structured Streaming runners (FileLog parity)
- ``operators``         scale path beyond the reference: dedup, similarity
                        search, text analysis, multimodal plumbing
- ``functions``         scalar function surface (reference README.md:27-37 TODOs)

Everything is declarative DataFrame construction; Catalyst handles
optimization.  No RDDs, no driver-side row loops.
"""

__version__ = "0.2.0"

# Convenience top-level surface (submodule imports stay the canonical path;
# these are lazy so importing grower_spark never drags in pyspark eagerly
# for tooling that only wants __version__).
_LAZY = {
    "PipelineConfig": ("grower_spark.config", "PipelineConfig"),
    "LogPipeline": ("grower_spark.plans.pipeline", "LogPipeline"),
    "LogFormat": ("grower_spark.plans.template", "LogFormat"),
    "get_spark": ("grower_spark.session", "get_spark"),
    "FileLogRunner": ("grower_spark.streaming.filelog", "FileLogRunner"),
}


def __getattr__(name):
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module_name), attr)
