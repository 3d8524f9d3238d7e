"""Round-10 operators: Gopher rules (incl. the line rules the synthetic
fixture can't exercise), Misra-Gries heavy hitters (exactness + the
bounded-state reduction), temporal split leakage (brute-force parity),
and fertility stats."""

import pyspark.sql.functions as F
import pytest


def test_gopher_rules_flags(spark):
    from grower_spark.operators.text import gopher_rules

    good = (
        "the quick brown fox jumps over the lazy dog and it runs far "
        "to the river bank every single morning with great joy"
    )
    rows = [
        (1, good),
        (2, "short text"),                      # < 5 words
        (3, "#### #### #### the of is it and"),  # symbol-heavy
        (4, "aaaaaaaaaaaaaaaaaaaa " * 6 + "the of"),  # mean word len > 10
        (5, "- one\n- two\n- three\n- four\nthe of is it plain line"),
        (6, "line one...\nline two...\nthe of is it and so on here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert out[1]["gopher_pass"] == 1
    assert out[2]["ok_word_count"] is False and out[2]["gopher_pass"] == 0
    assert out[3]["ok_symbol_ratio"] is False
    assert out[4]["ok_mean_word_len"] is False
    # 4 of 5 lines are bullets -> 8000 bp, passes the 9000 default but
    # the signal is measured
    assert out[5]["bullet_line_bp"] == 8000
    # 2 of 3 lines end with ellipsis -> 6666 bp > 3000 default
    assert out[6]["ellipsis_line_bp"] == 6666
    assert out[6]["ok_ellipsis_lines"] is False


def test_mg_heavy_hitters_exact_and_bounded(spark):
    from grower_spark.operators.sketch import mg_heavy_hitters

    # 40 docs: token "hot" appears once per doc (share 40/440 ~ 9%),
    # everything else unique
    rows = [
        (i, "hot " + " ".join(f"u{i}x{j}" for j in range(10)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["token"]: (r["n_occurrences"], r["share_bp"])
        for r in mg_heavy_hitters(df, threshold_permille=50, k=64).collect()
    }
    # exact: hot = 40 of 440 tokens = 909 bp; nothing else reaches 5%
    assert got == {"hot": (40, 909)}
    # the result must equal the naive exact computation on a denser case
    dense = spark.createDataFrame(
        [(i, " ".join(f"t{j % 7}" for j in range(i % 13 + 1)))
         for i in range(200)],
        "doc_id long, text string",
    )
    naive = (
        dense.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token").count()
    )
    total = dense.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    want = {
        r["token"]: r["count"] for r in naive.collect()
        if r["count"] * 1000 >= 50 * total
    }
    got2 = {
        r["token"]: r["n_occurrences"]
        for r in mg_heavy_hitters(dense, threshold_permille=50, k=64).collect()
    }
    assert got2 == want and want  # non-vacuous

    with pytest.raises(ValueError, match="k \\* threshold_permille"):
        mg_heavy_hitters(df, threshold_permille=1, k=100)
    with pytest.raises(ValueError, match="threshold_permille"):
        mg_heavy_hitters(df, threshold_permille=0, k=100)


def test_time_split_leakage_brute_force(spark):
    from grower_spark.operators.sampling import time_split_leakage

    rows = []
    for u in range(20):
        for j in range(u % 5 + 1):
            rows.append((u, "2024-01-%02d 12:00:00" % (j * 6 + 1)))
    df = spark.createDataFrame(rows, ["user_id", "ts_str"]).select(
        "user_id", F.col("ts_str").cast("timestamp").alias("ts")
    )
    got = time_split_leakage(df, train_permille=500).collect()[0]
    import datetime

    ts = [
        (u, datetime.datetime.fromisoformat(s).timestamp() * 1_000_000)
        for u, s in rows
    ]
    lo, hi = min(t for _, t in ts), max(t for _, t in ts)
    cut = lo + ((hi - lo) * 500) // 1000
    train = [(u, t) for u, t in ts if t < cut]
    test = [(u, t) for u, t in ts if t >= cut]
    tr_u, te_u = {u for u, _ in train}, {u for u, _ in test}
    assert got["n_train_events"] == len(train)
    assert got["n_test_events"] == len(test)
    assert got["n_train_users"] == len(tr_u)
    assert got["n_test_users"] == len(te_u)
    assert got["n_leaked_users"] == len(tr_u & te_u)
    assert got["n_leaked_users"] > 0  # non-vacuous
    assert got["leaked_bp"] == (len(tr_u & te_u) * 10000) // len(tr_u)


def test_fertility_stats_exact(spark):
    from grower_spark.operators.text import fertility_stats

    df = spark.createDataFrame(
        [
            (1, "en", "one two three"),
            (2, "en", "four five"),
            (3, "de", "einszweidreivier"),
            (4, "de", None),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r["lang"]: r for r in fertility_stats(df).collect()}
    # en: 2 docs, 5 tokens -> 250 tokens/doc x100; chars 22 -> 440 c/t
    assert out["en"]["n_docs"] == 2 and out["en"]["n_tokens"] == 5
    assert out["en"]["tokens_per_doc_x100"] == 250
    assert out["en"]["chars_per_token_x100"] == (22 * 100) // 5
    # de: the NULL-text doc is excluded
    assert out["de"]["n_docs"] == 1 and out["de"]["n_tokens"] == 1


def test_prefix_dedup_groups_and_keep(spark):
    from grower_spark.operators.dedup import prefix_dedup

    head = "dear valued customer thank you for your purchase"
    rows = [
        (1, head + " of widget alpha and more unique tail one"),
        (2, head + " of gadget beta with a different unique tail"),
        (3, "completely unrelated document about rivers and mountains"),
        (4, head + " of gizmo gamma third member of the template"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in prefix_dedup(df, n_tokens=8).collect()}
    assert out[1]["n_same_prefix"] == 3 and out[1]["keep"] == 1
    assert out[2]["n_same_prefix"] == 3 and out[2]["keep"] == 0
    assert out[4]["keep"] == 0
    assert out[3]["n_same_prefix"] == 1 and out[3]["keep"] == 1
    # group identity: same hash for the templated docs, different for 3
    assert out[1]["prefix_h60"] == out[2]["prefix_h60"]
    assert out[1]["prefix_h60"] != out[3]["prefix_h60"]

    import pytest

    with pytest.raises(ValueError, match="n_tokens"):
        prefix_dedup(df, n_tokens=0)


def test_fineweb_filters_multiline_signals(spark):
    from grower_spark.operators.text import fineweb_filters

    rows = [
        (1, "First sentence here. Second one too! A third?\n"
            "First sentence here. Second one too! A third?\n"
            "a line without terminal punctuation"),
        (2, "lorem ipsum dolor sit amet { code: true }"),
        (3, "THE 42 BIG 7 numbers 99 and CAPS"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in fineweb_filters(df).collect()}
    # doc 1: 3 lines, one duplicated -> 1/3 dup lines; 2/3 end in punct
    assert out[1]["dup_line_bp"] == 3333
    assert out[1]["terminal_punct_line_bp"] == 6666
    assert out[1]["n_sentences"] == 7  # 3+3 + the trailing line fragment
    # doc 2: the C4 verbatim flags
    assert out[2]["has_lorem"] == 1 and out[2]["has_curly"] == 1
    assert out[1]["has_lorem"] == 0 and out[1]["has_curly"] == 0
    # doc 3: 8 tokens, 3 numeric (42, 7, 99), 3 all-caps >= 2 chars
    assert out[3]["numeric_word_bp"] == 3750
    assert out[3]["upper_word_bp"] == 3750


def test_rate_fano_exact(spark):
    from grower_spark.operators.anomaly import rate_fano

    # type "a": counts [1, 3] over two minutes -> n=2 sum=4 sumsq=10
    # fano_x100 = floor(100*(2*10 - 16)/(2*4)) = floor(400/8) = 50
    rows = [
        ("a", "2024-01-01 10:00:10"),
        ("a", "2024-01-01 10:01:05"),
        ("a", "2024-01-01 10:01:20"),
        ("a", "2024-01-01 10:01:40"),
        # type "b": perfectly steady [2, 2] -> variance 0 -> fano 0
        ("b", "2024-01-01 10:00:01"),
        ("b", "2024-01-01 10:00:02"),
        ("b", "2024-01-01 10:01:01"),
        ("b", "2024-01-01 10:01:02"),
    ]
    df = spark.createDataFrame(rows, ["event_type", "ts_str"]).select(
        "event_type", F.col("ts_str").cast("timestamp").alias("ts")
    )
    out = {r["event_type"]: r for r in rate_fano(df).collect()}
    assert out["a"]["n_buckets"] == 2 and out["a"]["n_events"] == 4
    assert out["a"]["fano_x100"] == 50
    assert out["b"]["fano_x100"] == 0

    with pytest.raises(ValueError, match="bucket_secs"):
        rate_fano(df, bucket_secs=0)
