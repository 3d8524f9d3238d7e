"""End-to-end corpus construction: quality -> decontaminate -> dedup ->
sample -> pack, with auditable drop reasons."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tools.corpus_build import build_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "bank where it drinks cool water every single morning"
)


def _distinct_doc(i: int) -> str:
    # stopword-rich, length-ok, alpha-ok, and sharing no 3-gram with any
    # other doc (the content words are all doc-unique)
    w = [f"w{i}x{k}" for k in range(12)]
    return (
        f"the {w[0]} and {w[1]} of {w[2]} is {w[3]} it {w[4]} that {w[5]} "
        f"in {w[6]} you {w[7]} to {w[8]} a {w[9]} {w[10]} {w[11]}"
    )


@pytest.fixture(scope="module")
def raw_docs(spark):
    rows = [
        # healthy docs: unique content words, no shared shingles
        *[(i, _distinct_doc(i)) for i in range(10)],
        # low quality: short, no stopwords, no alpha -> fails 3 of 4 checks
        (100, "#### 1234 !!!!"),
        # repetitive: one token is 60% of the doc
        (101, " ".join(["spam"] * 30 + ["the quick brown fox jumps over it".split()[i % 7] for i in range(20)])),
        # exact duplicate pair: 201 drops, 200 keeps
        (200, GOOD + " duplicate payload"),
        (201, GOOD + " duplicate payload"),
        # contaminated: contains the benchmark 8-gram verbatim
        (300, "prefix words " + "alpha beta gamma delta epsilon zeta eta theta" + " suffix words and the end of it all comes here now"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(9000, "alpha beta gamma delta epsilon zeta eta theta")],
        ["doc_id", "text"],
    )


def test_full_corpus_build(spark, raw_docs, bench_docs):
    corpus, drops, report = build_corpus(
        spark, raw_docs, bench_docs,
        min_quality=2, max_top_word_bp=4000, decontam_n=8,
        sample_permille=1000, max_tokens=64,
    )
    reasons = {r["doc_id"]: r["reason"] for r in drops.collect()}
    assert reasons[100] == "quality"
    assert reasons[101] == "repetition"
    assert reasons[300] == "contaminated"
    assert reasons[201] == "exact"
    kept = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert 200 in kept and 201 not in kept
    assert kept.isdisjoint(reasons)
    # every kept doc has a pack and the budget holds
    assert corpus.where(F.col("pack_id").isNull()).count() == 0
    over = (
        corpus.where(~F.col("oversize"))
        .groupBy("pack_id").agg(F.sum("pack_n_tokens").alias("t"))
        .where(F.col("t") > 64)
    )
    assert over.count() == 0
    assert report["input"] == raw_docs.count()
    assert report["kept"] == len(kept)
    assert report["dropped_quality"] == 1
    assert report["dropped_contaminated"] == 1


def test_sampling_stage_reproducible(spark, raw_docs):
    a = build_corpus(spark, raw_docs, None, sample_permille=500, max_tokens=64)
    b = build_corpus(spark, raw_docs.repartition(5), None, sample_permille=500,
                     max_tokens=64)
    ka = sorted(r["doc_id"] for r in a[0].select("doc_id").collect())
    kb = sorted(r["doc_id"] for r in b[0].select("doc_id").collect())
    assert ka == kb
    sampled = {r["doc_id"] for r in a[1].where(F.col("reason") == "sampled-out").collect()}
    assert sampled  # at 500 permille on this set some doc is sampled out


def test_corpus_build_empty_input(spark):
    docs = spark.createDataFrame([], "doc_id: long, text: string")
    corpus, drops, report = build_corpus(spark, docs, None, max_tokens=64)
    assert report == {"input": 0, "kept": 0}
    assert corpus.count() == 0 and drops.count() == 0


def test_null_text_docs_are_audited_not_lost(spark):
    # a NULL-text doc scores NULL on every quality check; it must land in
    # drops (reason=quality), never silently vanish from both outputs
    docs = spark.createDataFrame(
        [(1, None), (2, _distinct_doc(2))], ["doc_id", "text"]
    )
    corpus, drops, report = build_corpus(spark, docs, None, min_quality=1,
                                         max_tokens=64)
    reasons = {r["doc_id"]: r["reason"] for r in drops.collect()}
    assert reasons == {1: "quality"}
    assert {r["doc_id"] for r in corpus.select("doc_id").collect()} == {2}
    assert report["kept"] == 1 and report["dropped_quality"] == 1


def test_corpus_build_with_chunking(spark, raw_docs):
    corpus, drops, report = build_corpus(
        spark, raw_docs, None, min_quality=1, chunk_tokens=8,
        chunk_overlap=2, max_tokens=24,
    )
    rows = corpus.collect()
    # chunk units: more rows than kept docs, every unit within the window
    assert len(rows) > report["kept"]
    assert all(r["n_chunk_tokens"] <= 8 for r in rows)
    assert all(r["pack_n_tokens"] <= 8 for r in rows)
    # budget holds over packs of chunks
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r["pack_id"], 0)
        per_pack[r["pack_id"]] += r["pack_n_tokens"]
    assert all(v <= 24 for v in per_pack.values())


def test_corpus_build_with_boilerplate_scrub(spark):
    boiler = "subscribe to our newsletter today"
    # bodies share no content words (else near-dup dedup would eat them)
    body = [_distinct_doc(50 + i) for i in range(3)]
    rows = [
        (0, f"{body[0]}\n\n{boiler}"),
        (1, f"{boiler}\n\n{body[1]}"),
        (2, body[2]),
        (3, boiler),  # boilerplate-only doc -> auditable drop
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus, drops, report = build_corpus(
        spark, docs, min_quality=2, max_top_word_bp=10000, para_min_df=3
    )
    reasons = {r["doc_id"]: r["reason"] for r in drops.collect()}
    assert reasons.get(3) == "boilerplate-only"
    kept = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert set(kept) == {0, 1, 2}
    for i in (0, 1, 2):
        assert boiler not in kept[i]
        assert f"w{50 + i}x0" in kept[i]
    assert report["dropped_boilerplate_only"] == 1


def test_corpus_build_perplexity_stage(spark, raw_docs):
    """With the LM stage on, the doc whose tokens the pool LM assigns
    the least mass drops as 'perplexity'; the stopword-rich docs survive.
    Stage off (default) -> no perplexity reason at all."""
    # Outlier design note: in a tiny self-fit corpus the aggregate OOV
    # bucket is CHEAP (it absorbs every one-off content word), so an
    # all-OOV doc is not the high-xent tail — rare IN-VOCAB tokens are.
    # With vocab_k=16 the vocab is ~10 stopwords plus the outlier's six
    # tf=4 gibberish tokens (one-off words all pool into cheap OOV), so
    # the outlier — every token in-vocab at p=5/N — is the strict max.
    # Repeating 6 distinct tokens 4x clears the repetition gate
    # (top_word_bp = 1667 < 4000) and quality-ok on length/mean-len/alpha.
    gibberish = " ".join(["bzqxv chjkw dlmnp fprst gvwxz hqrtk"] * 4)
    rows = raw_docs.union(
        spark.createDataFrame([(400, gibberish)], ["doc_id", "text"])
    )
    # threshold chosen between the healthy docs' xent and the outlier's:
    # measure the pool's own scores to keep the test robust to fixture edits
    from grower_spark.operators.text import fit_unigram_lm, lm_score

    _, _, report = build_corpus(
        spark, rows, None, min_quality=2, max_xent_micro=0
    )
    assert "dropped_perplexity" not in report

    # replicate the stage's own pool (post quality+repetition: 100 and 101
    # are gone) so the fitted model — and therefore the scores the
    # threshold is derived from — matches what build_corpus computes
    pool = rows.where(~F.col("doc_id").isin(100, 101))
    model = fit_unigram_lm(pool, vocab_k=16)
    scores = {r["doc_id"]: r["xent_micro"]
              for r in lm_score(pool, model).collect()}
    others_max = max(v for k, v in scores.items() if k != 400)
    assert scores[400] > others_max
    corpus, drops, report = build_corpus(
        spark, rows, None, min_quality=2, lm_vocab_k=16,
        max_xent_micro=(scores[400] + others_max) // 2,
    )
    reasons = {r["doc_id"]: r["reason"] for r in drops.collect()}
    assert reasons.get(400) == "perplexity"
    assert report["dropped_perplexity"] == 1
    assert not any(d < 100 and r == "perplexity" for d, r in reasons.items())


def test_corpus_build_adaptive_quality(spark):
    """--adaptive-quality-group: each language is cut against its OWN
    fine-score distribution — the weaker language keeps its top rows
    where the fixed floor would delete it wholesale; NULL-group docs are
    auditable quality drops."""
    rows = (
        [(i, _distinct_doc(i), "en") for i in range(8)]
        # "xx" docs: stopword-free so quality_score is LOWER across the
        # board — a fixed min_quality=3 floor would drop every one
        + [(50 + i, " ".join(f"z{i}q{k}" for k in range(14)), "xx")
           for i in range(8)]
        + [(99, None, "en")]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    corpus, drops, report = build_corpus(
        spark, docs, None,
        adaptive_quality_group="lang", adaptive_keep_permille=500,
        max_tokens=64,
    )
    kept = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    kept_xx = {d for d in kept if 50 <= d < 90}
    kept_en = {d for d in kept if d < 50}
    # both languages survive with ~half their docs (ties may over-keep)
    assert 4 <= len(kept_en) <= 8
    assert 4 <= len(kept_xx) <= 8
    reasons = {r["doc_id"]: r["reason"] for r in drops.collect()}
    assert reasons[99] == "quality"  # NULL text -> NULL fine score


def test_corpus_build_weighted_sample(spark):
    """--weighted-target-rows: the sample stage keeps ~N rows with
    inclusion proportional to n_chars, reproducibly across layouts."""
    rows = [(i, _distinct_doc(i) + " tail" * (i % 5)) for i in range(60)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    a = build_corpus(spark, docs, None, weighted_target_rows=20,
                     max_tokens=64)
    b = build_corpus(spark, docs.repartition(7), None,
                     weighted_target_rows=20, max_tokens=64)
    ka = sorted(r["doc_id"] for r in a[0].select("doc_id").collect())
    kb = sorted(r["doc_id"] for r in b[0].select("doc_id").collect())
    assert ka == kb
    assert 5 <= len(ka) <= 40  # expected 20, Poisson spread
    sampled = {r["doc_id"] for r in
               a[1].where(F.col("reason") == "sampled-out").collect()}
    assert sampled.isdisjoint(ka)
    assert a[2]["dropped_sampled_out"] == len(sampled)


def test_cli_governance_report(spark, tmp_path, capsys):
    """`cli report` bundles the governance panels into one JSON: language
    confusion, per-source robust quality, drift vs an older snapshot,
    and per-benchmark-item leakage."""
    import json

    from grower_spark.cli import main as cli_main

    docs = spark.createDataFrame(
        [(i, _distinct_doc(i), "en", "srcA" if i % 2 else "srcB")
         for i in range(12)],
        ["doc_id", "text", "lang", "source"],
    )
    p_docs = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p_docs)
    p_old = str(tmp_path / "old.parquet")
    docs.where("doc_id % 3 != 0").write.mode("overwrite").parquet(p_old)
    p_bench = str(tmp_path / "bench.parquet")
    spark.createDataFrame(
        [(900, _distinct_doc(1)), (901, "clean eval item nothing shared")],
        ["doc_id", "text"],
    ).write.mode("overwrite").parquet(p_bench)
    out = str(tmp_path / "report.json")

    rc = cli_main([
        "report", "--input", p_docs, "--old", p_old,
        "--benchmark", p_bench, "--decontam-n", "3", "--out", out,
    ])
    assert rc == 0
    rep = json.loads(open(out).read())
    assert {r["lang"] for r in rep["lang_confusion"]} == {"en"}
    assert {r["source"] for r in rep["source_quality"]} == {"srcA", "srcB"}
    assert sum(r["n_new"] for r in rep["score_drift"]) == 12
    leak = {r["bench_id"]: r for r in rep["benchmark_leakage"]}
    assert leak[900]["n_docs_hit"] >= 1   # doc 1's text is in the corpus
    assert leak[901]["n_docs_hit"] == 0
    # r10 panels: per-source dedup + gopher pass rates
    dd = {r["source"]: r for r in rep["source_dedup"]}
    assert dd["srcA"]["n_docs"] + dd["srcB"]["n_docs"] == 12
    assert all(r["n_exact_dup_docs"] == 0 for r in rep["source_dedup"])
    gp = {r["source"]: r for r in rep["source_gopher"]}
    assert set(gp) == {"srcA", "srcB"}
    assert all(0 <= r["n_pass"] <= r["n_docs"] for r in rep["source_gopher"])


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """A fragmented write (many tiny files) compacts to the footer-derived
    file count with every row accounted for."""
    from grower_spark.operators.compact import (
        compact_parquet,
        parquet_footprint,
    )

    src = str(tmp_path / "frag")
    spark.range(0, 20000).selectExpr(
        "id", "repeat('x', 100) AS pad"
    ).repartition(64).write.mode("overwrite").parquet(src)
    n_in, _, rows_in = parquet_footprint(src)
    assert n_in == 64 and rows_in == 20000

    out = str(tmp_path / "compacted")
    audit = compact_parquet(spark, src, out, target_mb=256)
    assert audit["files_out"] == 1          # ~2 MB of data, 256 MB target
    assert audit["rows"] == 20000
    got = spark.read.parquet(out).count()
    assert got == 20000


def test_compact_parquet_respects_target_size(spark, tmp_path):
    from grower_spark.operators.compact import compact_parquet

    src = str(tmp_path / "frag2")
    # incompressible pad (hash-derived) so bytes_in is real, not a run of
    # 'y' that a column codec folds to nothing
    spark.range(0, 40000).selectExpr(
        "id",
        "concat(md5(cast(id AS string)), md5(cast(id + 1 AS string)), "
        "md5(cast(id + 2 AS string)), md5(cast(id + 3 AS string))) AS pad",
    ).repartition(32).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "compacted2")
    audit = compact_parquet(spark, src, out, target_mb=1)
    # bytes_in is ~>1 MB so more than one output file, far fewer than 32
    assert 1 < audit["files_out"] < 32


def test_corpus_build_zorder_layout_skips_row_groups(spark, tmp_path):
    """--layout zorder wired into the build (VERDICT r9 item 8): the
    written corpus table's row-group min/max stats prune a selective box
    filter on BOTH layout columns, measured straight from the parquet
    footers; row count is footer-verified across the rewrite and the
    compact target sizes the file count."""
    import glob
    import os

    import pyarrow.parquet as pq

    from tools.corpus_build import write_corpus_layout

    def rg_stats(path, col):
        out = []
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            pf = pq.ParquetFile(f)
            idx = pf.schema_arrow.get_field_index(col)
            for i in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(i).column(idx).statistics
                out.append((st.min, st.max))
        return out

    def hit_fraction(stats, lo, hi):
        return sum(1 for mn, mx in stats if not (mx < lo or mn > hi)) / len(
            stats
        )

    # corpus-like rows with two decorrelated numeric read-filter columns
    # (e.g. quality milli-score and a length band) riding through the
    # build untouched
    docs = spark.range(40_000).select(
        F.col("id").alias("doc_id"),
        # per-doc-unique content words (shared shingles would dedup the
        # corpus away), stopword-rich so quality keeps them
        F.format_string(
            "the q%da and q%db of q%dc is q%dd it q%de that q%df in "
            "q%dg you q%dh to q%di",
            *([F.col("id")] * 9),
        ).alias("text"),
        (F.col("id") % 1000).alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("b"),
    )
    corpus, _drops, _report = build_corpus(
        spark, docs, None, min_quality=0, max_top_word_bp=10_000,
        max_tokens=64,
    )
    out = str(tmp_path / "zc")
    audit = write_corpus_layout(
        spark, corpus, out, layout="zorder", zorder_cols=["a", "b"],
        compact_target_mb=1,
        write_options={"parquet.block.size": 16 * 1024},
    )
    cpath = os.path.join(out, "corpus")
    assert audit["layout"] == "zorder" and audit["rows"] == 40_000
    sa, sb = rg_stats(cpath, "a"), rg_stats(cpath, "b")
    assert len(sa) > 30, "need many row groups for the measurement"
    # 5%-selective slabs prune most row groups on EITHER column
    assert hit_fraction(sa, 0, 49) < 0.5
    assert hit_fraction(sb, 0, 49) < 0.5
    # and the data is intact
    got = spark.read.parquet(cpath)
    assert got.count() == 40_000
    assert got.where((F.col("a") < 50) & (F.col("b") < 50)).count() == (
        docs.where((F.col("a") < 50) & (F.col("b") < 50)).count()
    )


def test_corpus_build_compact_layout(spark, tmp_path):
    """--compact-target-mb alone: footer-measured compaction of the
    corpus write (many input partitions -> ~target-sized files)."""
    import os

    from tools.corpus_build import write_corpus_layout

    docs = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.format_string(
            "the c%da and c%db of c%dc is c%dd it c%de that c%df in "
            "c%dg you c%dh to c%di",
            *([F.col("id")] * 9),
        ).alias("text"),
    )
    corpus, _d, _r = build_corpus(
        spark, docs, None, min_quality=0, max_top_word_bp=10_000,
        max_tokens=64,
    )
    out = str(tmp_path / "cc")
    audit = write_corpus_layout(
        spark, corpus.repartition(64), out, compact_target_mb=256
    )
    assert audit["layout"] == "compacted"
    assert audit["files_out"] == 1  # tiny table -> one target-sized file
    assert audit["rows"] == 2_000
    assert spark.read.parquet(os.path.join(out, "corpus")).count() == 2_000


def test_corpus_build_mixture_stage(spark):
    """Temperature-mixing stage: the cleaned pool is rebalanced toward
    sqrt(n_lang) — the over-represented language is cut (auditable
    mixture-cut drops), the small one repeats with epoch replicas, and
    per-language materialized counts equal the schedule's planned_rows."""
    from grower_spark.operators.sampling import mixture_plan

    rows = [
        *[(i, _distinct_doc(i), "big") for i in range(30)],
        *[(1000 + i, _distinct_doc(1000 + i), "small") for i in range(5)],
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    corpus, drops, report = build_corpus(
        spark, docs, mixture_group="lang", mixture_target_rows=40,
    )
    # plan over the same pool (all docs pass quality/dedup by fixture
    # construction) with the build's salt
    plan = {
        r["lang"]: r
        for r in mixture_plan(
            docs, "lang", 40, key_col="doc_id", salt="corpus-mix"
        ).collect()
    }
    assert plan["big"]["weight"] == 5 and plan["small"]["weight"] == 2
    got = {
        r["lang"]: r["n"]
        for r in corpus.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {
        g: p["planned_rows"] for g, p in plan.items() if p["planned_rows"] > 0
    }
    # cuts are audited: big-language docs outside the partial epoch
    cut = drops.where("reason = 'mixture-cut'").count()
    assert cut == 35 - corpus.select("doc_id").distinct().count()
    assert report["dropped_mixture_cut"] == cut
    # small language upsamples: every kept small doc appears >= 2 times
    # (2 full epochs + a 200-permille partial), with distinct unit ids
    small_counts = [
        r["n"]
        for r in corpus.where("lang = 'small'")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert small_counts and all(n >= 2 for n in small_counts)
    assert (
        corpus.where("lang = 'small'").select("_mix_id").distinct().count()
        == sum(small_counts)
    )
