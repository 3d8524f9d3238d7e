"""Format->regex compiler unit tests (reference: pkg/nginx/template.go)."""

import os
import re

from grower_spark.config import PipelineConfig
from grower_spark.plans.template import GROUP_SEP, LogFormat

from conftest import FIXTURES

# The reference's golden line `caseOne` (pkg/nginx/template_test.go:16).
SAMPLE_LINE = (
    '114.119.133.192 - - [21/Jul/2022:00:30:43 +0300] '
    '"GET /sito/wp-includes/wlwmanifest.xml HTTP/1.1" 444 9 100000.14 '
    '"GET" "-" "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 '
    '(KHTML, like Gecko) Chrome/78.0.3904.108 Safari/537.36" ON 10 '
    '<2022-07-21T00:30:43> 8 16 32 64 | 11 22 33 44 | 1000 2000 | '
    '1234567890_abcdefg | 2022-07-21'
)


def fixture_config() -> PipelineConfig:
    return PipelineConfig.from_yaml(os.path.join(FIXTURES, "sample_test.yaml"))


def test_compile_basic():
    lf = LogFormat.compile('$remote_addr - $remote_user [$time_local] "$request"')
    assert lf.var_names == ["remote_addr", "remote_user", "time_local", "request"]
    m = re.match(lf.pattern, '1.2.3.4 - alice [21/Jul/2022:00:30:43 +0300] "GET / HTTP/1.1"')
    assert m
    assert m.group(1) == "1.2.3.4"
    assert m.group(2) == "alice"
    assert m.group(3) == "21/Jul/2022:00:30:43 +0300"
    assert m.group(4) == "GET / HTTP/1.1"


def test_trailing_var_and_prefix_match():
    # Anchored at start only: trailing junk after the format is ignored.
    lf = LogFormat.compile("$a $b")
    m = re.match(lf.pattern, "x y and more stuff")
    assert m and m.group(1) == "x" and m.group(2) == "y"


def test_non_match_returns_none():
    lf = LogFormat.compile('[$t] "$r"')
    assert re.match(lf.pattern, "no brackets here") is None


def test_fixture_format_parses_sample_line():
    cfg = fixture_config()
    lf = LogFormat.compile(cfg.nginx.log_format)
    m = re.match(lf.pattern, SAMPLE_LINE)
    assert m, lf.pattern
    fields = dict(zip(lf.var_names, m.groups()))
    assert fields["remote_addr"] == "114.119.133.192"
    assert fields["remote_user"] == "-"
    assert fields["time_local"] == "21/Jul/2022:00:30:43 +0300"
    assert fields["request"] == "GET /sito/wp-includes/wlwmanifest.xml HTTP/1.1"
    assert fields["status"] == "444"
    assert fields["bytes_sent"] == "9"
    assert fields["request_time"] == "100000.14"
    assert fields["http_referer"] == "-"
    assert fields["https"] == "ON"
    assert fields["custom_field"] == "10"
    assert fields["custom_time_field"] == "2022-07-21T00:30:43"
    assert fields["field_uint8"] == "8"
    assert fields["field_uint64"] == "64"
    assert fields["field_f32"] == "1000"
    assert fields["field_fixed_string"] == "1234567890_abcdefg"
    assert fields["field_date"] == "2022-07-21"


def test_fixture_log_line_matches_repo_fixture():
    with open(os.path.join(FIXTURES, "sample_test.log"), encoding="utf-8") as fh:
        line = fh.readline().rstrip("\n")
    cfg = fixture_config()
    lf = LogFormat.compile(cfg.nginx.log_format)
    # sample_test.log carries only the first 13 nginx fields + custom_field
    # + custom_time_field; the extended numeric tail exists only in the
    # golden test fixture line, so the full format does NOT match it.
    short_fmt = cfg.nginx.log_format.split(" $field_uint8")[0]
    assert re.match(LogFormat.compile(short_fmt).pattern, line)


def test_replacement_single_pass_equivalence():
    lf = LogFormat.compile('$a - $b "$c"')
    line = 'one - two "three four"'
    replaced = re.sub(lf.full_line_pattern(), lf.replacement().replace("$", "\\"), line)
    assert replaced.split(GROUP_SEP) == ["one", "two", "three four"]


def test_concatenated_vars_first_greedy():
    # $a$b with delimiter ' ': reference semantics -> $a greedy, $b empty.
    lf = LogFormat.compile("$a$b rest")
    m = re.match(lf.pattern, "xyz rest")
    assert m and m.group(1) == "xyz" and m.group(2) == ""
