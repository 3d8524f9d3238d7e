"""Property-based tests for the log_format compiler (SURVEY.md §7 risk 1:
Go-regex vs Java-regex portability).

Strategy: generate random formats (variables separated by random delimiter
literals) and random field values that avoid their neighboring delimiters —
the same well-formedness contract nginx itself needs — then assert the
compiled pattern round-trips the values, in Python re and (sampled, one
Spark job) in Java regex."""

import random
import re
import string

from hypothesis import given, settings, strategies as st

from grower_spark.plans.template import GROUP_SEP, LogFormat

DELIM_CHARS = ' []"|<>:,;/#'
VALUE_CHARS = string.ascii_letters + string.digits + ".-+_"


@st.composite
def format_and_values(draw):
    n_vars = draw(st.integers(min_value=1, max_value=8))
    parts = []
    values = {}
    lead = draw(st.sampled_from(["", "pre ", "# "]))
    fmt = lead
    for i in range(n_vars):
        var = f"f{i}"
        fmt += f"${var}"
        if i < n_vars - 1:
            delim = draw(st.text(alphabet=DELIM_CHARS, min_size=1, max_size=3))
            # a var directly followed by a var-name char would change the
            # variable name; delimiters here never start with [A-Za-z0-9_]
            fmt += delim
            parts.append(delim)
        else:
            parts.append(" ")  # trailing delimiter class is space
    for i, delim in enumerate(parts):
        var = f"f{i}"
        banned = delim[0]
        value = draw(st.text(alphabet=VALUE_CHARS, min_size=0, max_size=12))
        value = value.replace(banned, "")
        values[var] = value
    return fmt, values


def render(fmt: str, values: dict) -> str:
    out = fmt
    for var, value in sorted(values.items(), key=lambda kv: -len(kv[0])):
        out = out.replace(f"${var}", value)
    return out


@settings(max_examples=200, deadline=None)
@given(format_and_values())
def test_roundtrip_python_re(case):
    fmt, values = case
    lf = LogFormat.compile(fmt)
    line = render(fmt, values)
    m = re.match(lf.pattern, line)
    assert m, (fmt, line, lf.pattern)
    for var in lf.var_names:
        assert m.group(lf.group_index(var)) == values[var], (fmt, line)


@settings(max_examples=200, deadline=None)
@given(format_and_values(), st.text(alphabet=VALUE_CHARS + DELIM_CHARS, max_size=30))
def test_single_pass_replacement_equivalent(case, junk):
    """The regexp_replace+split single-pass form extracts the same groups
    the direct match does — including with trailing junk (prefix match)."""
    fmt, values = case
    lf = LogFormat.compile(fmt)
    line = render(fmt, values)
    m = re.match(lf.pattern, line + junk) if re.match(lf.pattern, line) else None
    replaced = re.sub(
        lf.full_line_pattern(),
        lf.replacement().replace("$", "\\"),
        line + junk,
        count=1,
    )
    if m and GROUP_SEP not in line + junk:
        assert replaced.split(GROUP_SEP) == list(m.groups()), (fmt, line, junk)


def test_java_regex_parity_sampled(spark):
    """Java (Spark) and Python re agree on 60 seeded random format/line
    pairs — one Spark job total."""
    rng = random.Random(42)
    cases = []
    for _ in range(60):
        n = rng.randint(1, 6)
        fmt_parts = []
        values = []
        for i in range(n):
            fmt_parts.append(f"$f{i}")
            delim = "".join(rng.choices(DELIM_CHARS, k=rng.randint(1, 2)))
            if i < n - 1:
                fmt_parts.append(delim)
        fmt = "".join(fmt_parts)
        lf = LogFormat.compile(fmt)
        vals = {}
        # values must avoid each var's delimiter class (nginx contract)
        toks = re.findall(r"\(\[\^(\\?.)\]\*\)", lf.pattern)
        for i, cls in enumerate(toks):
            ch = cls[-1]
            v = "".join(rng.choices(VALUE_CHARS, k=rng.randint(0, 10))).replace(ch, "")
            vals[f"f{i}"] = v
        line = render(fmt, vals)
        m = re.match(lf.pattern, line)
        py_groups = list(m.groups()) if m else None
        cases.append((lf.pattern, lf.full_line_pattern(), lf.replacement(), line, py_groups))

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(p, fp, rep, line) for p, fp, rep, line, _ in cases],
        ["pattern", "full_pattern", "repl", "line"],
    )
    rows = df.select(
        F.expr("regexp_replace(line, full_pattern, repl)").alias("replaced"),
        F.expr("line rlike pattern").alias("matched"),
        "line",
    ).collect()
    for (pattern, _, _, line, py_groups), row in zip(cases, rows):
        assert row["matched"] == (py_groups is not None), (pattern, line)
        if py_groups is not None and GROUP_SEP not in line:
            assert row["replaced"].split(GROUP_SEP) == py_groups, (pattern, line)
