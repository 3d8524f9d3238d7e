"""PII detection/redaction (operators/pii.py)."""

import re

import pytest

from grower_spark.operators.pii import PII_PATTERNS, pii_signals, redact_pii


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "mail me at a.b+c@example.co.uk or root@10.0.0.1 thanks"),
        (2, "server 192.168.1.255 and 8.8.8.8 up"),
        (3, "ssn 123-45-6789 phone +1-555-0100 alt 44-555-1234"),
        (4, "clean text with no identifiers at all"),
        (5, ""),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_per_class(spark, df):
    out = {r.doc_id: r for r in pii_signals(df).collect()}
    # root@10.0.0.1 is NOT an email (no alphabetic TLD) — it counts as ipv4
    assert out[1].n_email == 1
    assert out[1].n_ipv4 == 1
    assert out[2].n_ipv4 == 2 and out[2].n_email == 0
    assert out[3].n_ssn == 1 and out[3].n_phone == 2
    assert out[4].n_pii == 0
    assert out[5].n_pii == 0
    assert out[6].n_pii is None  # null text propagates null, not a crash


def test_redaction_tokens_and_order(spark, df):
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert out[1].text_redacted == "mail me at [EMAIL] or root@[IPV4] thanks"
    assert out[2].text_redacted == "server [IPV4] and [IPV4] up"
    assert out[3].text_redacted == "ssn [SSN] phone [PHONE] alt [PHONE]"
    assert out[4].text_redacted == out[4].text
    assert out[6].text_redacted is None


def test_patterns_are_re2_and_python_compatible():
    # every pattern must compile under Python re (a proxy for RE2-safety:
    # no lookarounds/backrefs are used) and agree with the JVM on a probe
    probes = {
        "email": ("x a_b%9@m.example.org y", 1),
        "ipv4": ("1.2.3.4 and 999.999.999.999 and 1.2.3", 2),
        "ssn": ("078-05-1120", 1),
        "phone": ("+44-555-0199 123-456-7890", 2),
    }
    for name, pat in PII_PATTERNS.items():
        text, expect = probes[name]
        assert len(re.findall(pat, text)) == expect, name


def test_redacted_text_has_no_remaining_matches(spark, df):
    out = redact_pii(df)
    sig = pii_signals(out, "text_redacted")
    rows = sig.where("n_pii > 0").collect()
    assert rows == []
