"""JSON log path (P3): the reference stubbed ParseJSON (template.go:39-41);
this engine implements it with identical drop/cast semantics."""

import datetime

import pytest

from grower_spark.config import PipelineConfig
from grower_spark.plans.pipeline import LogPipeline

CONFIG = PipelineConfig.from_dict(
    {
        "nginx": {
            "log_type": "json",
            "log_format": "",
            "log_time_format": "02/Jan/2006:15:04:05 -0700",
            "log_custom_casts_enable": True,
            "log_custom_casts": {"custom_field": "Int32"},
        },
        "scheme": {
            "logs_table": "t.json_log",
            "columns": {
                "remote_addr": "remote_addr",
                "remote_user": "remote_user",
                "time_local": "time_local",
                "status": "status",
                "custom_field": "custom_field",
            },
        },
    }
)

GOOD = (
    '{"remote_addr": "1.2.3.4", "remote_user": "-", '
    '"time_local": "21/Jul/2022:00:30:43 +0300", "status": "200", '
    '"custom_field": "7", "extra_ignored": "x"}'
)
BAD_JSON = '{"remote_addr": '
MISSING_KEY = '{"remote_addr": "1.2.3.4", "remote_user": "u", "time_local": "21/Jul/2022:00:30:43 +0300", "status": "200"}'
BAD_CAST = GOOD.replace('"200"', '"nope"')


def test_json_parse_golden(spark):
    df = spark.createDataFrame([(GOOD,)], ["value"])
    rows = LogPipeline(CONFIG).parse(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["remote_addr"] == "1.2.3.4"
    assert r["remote_user"] == ""  # hyphen scrub applies in json mode too
    assert r["time_local"] == datetime.datetime(2022, 7, 20, 21, 30, 43)
    assert r["status"] == 200
    assert r["custom_field"] == 7


@pytest.mark.parametrize("line", [BAD_JSON, MISSING_KEY, BAD_CAST])
def test_json_drops(spark, line):
    df = spark.createDataFrame([(GOOD,), (line,)], ["value"])
    good, bad = LogPipeline(CONFIG).parse_with_deadletter(df)
    assert good.count() == 1
    assert [r["line"] for r in bad.collect()] == [line]
