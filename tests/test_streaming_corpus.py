"""Streaming legality of the corpus-construction operators: sampling,
chunking, and quality signals are stateless per-row transforms, so they
must run unchanged under Structured Streaming and agree row-for-row with
the batch result (the 100 TB deployment runs them in the ingest stream,
not as a separate batch pass)."""

from __future__ import annotations

import pyspark.sql.functions as F

from grower_spark.operators.chunking import chunk_documents
from grower_spark.operators.sampling import sample_stratified
from grower_spark.operators.text import quality_signals


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, ["doc_id", "text", "source"]).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _drain(out, tmp_path, name):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out.sparkSession.sql(f"select * from {name}")


def test_corpus_filters_streaming_equals_batch(spark, tmp_path):
    rows1 = [(i, f"the doc{i} body and some words here to score", "web")
             for i in range(0, 30)]
    rows2 = [(i, f"the doc{i} body and some words here to score", "books")
             for i in range(30, 60)]
    _write_docs(spark, str(tmp_path / "in" / "b1"), rows1)
    _write_docs(spark, str(tmp_path / "in" / "b2"), rows2)

    schema = "doc_id long, text string, source string"
    batch_df = spark.read.schema(schema).parquet(str(tmp_path / "in" / "*"))
    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )

    def pipeline(df):
        sampled = sample_stratified(
            df, "source", {"web": 400, "books": 1000}, key_col="doc_id", salt="st"
        )
        scored = quality_signals(sampled).select("doc_id", "source", "text",
                                                 "quality_score")
        return chunk_documents(scored, chunk_tokens=4, overlap_tokens=1)

    want = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in pipeline(batch_df).collect()
    }
    got_df = _drain(pipeline(stream_df), tmp_path, "corpus_stream")
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_text"]) for r in got_df.collect()
    }
    assert got == want
    # the stratified rates actually bit: books kept whole, web downsampled
    kept_web = len({d for d, _, _ in got if d < 30})
    assert 0 < kept_web < 30
    assert len({d for d, _, _ in got if d >= 30}) == 30


def test_streaming_sample_is_deterministic_across_restart(spark, tmp_path):
    """Hash sampling has no state: a NEW query over the same files (fresh
    checkpoint) selects the identical rows — the reproducibility contract
    under replay/backfill."""
    rows = [(i, f"text number {i} with the usual words", "web")
            for i in range(40)]
    _write_docs(spark, str(tmp_path / "in2" / "b1"), rows)
    schema = "doc_id long, text string, source string"

    def run(name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "in2" / "*"))
        )
        out = sample_stratified(stream, "source", {"web": 500},
                                key_col="doc_id", salt="rr")
        return {r["doc_id"] for r in _drain(out, tmp_path, name).collect()}

    assert run("sample_a") == run("sample_b")


def test_lm_scoring_streaming_equals_batch(spark, tmp_path):
    """lm_score / importance_weights are stateless per-row transforms with
    map-literal models, so the SAME fitted model must score an ingest
    stream identically to the batch pass — the deployment shape where the
    LM is fit offline on a trusted split and applied in the ingest
    pipeline."""
    from grower_spark.operators.text import (
        fit_unigram_lm,
        importance_weights,
        lm_score,
    )

    rows1 = [(i, "the quick brown fox and the lazy dog", "web")
             for i in range(0, 10)]
    rows2 = [(i, f"unseen tok{i} words beyond the vocab", "web")
             for i in range(10, 20)]
    _write_docs(spark, str(tmp_path / "lm_in" / "b1"), rows1)
    _write_docs(spark, str(tmp_path / "lm_in" / "b2"), rows2)

    schema = "doc_id long, text string, source string"
    batch_df = spark.read.schema(schema).parquet(str(tmp_path / "lm_in" / "*"))
    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "lm_in" / "*"))
    )

    target = fit_unigram_lm(batch_df.where(F.col("doc_id") < 10), vocab_k=16)
    raw = fit_unigram_lm(batch_df, vocab_k=16)

    def pipeline(df):
        return lm_score(df, target).join(
            importance_weights(df, target, raw).select("doc_id", "logw_micro"),
            "doc_id",
        )

    want = {tuple(r) for r in pipeline(batch_df).collect()}
    # the stream side keeps the join batch-free: score only (per-row ops)
    scored_stream = lm_score(stream_df, target)
    got_df = _drain(scored_stream, tmp_path, "lm_stream")
    got = {tuple(r) for r in got_df.collect()}
    want_scores = {
        (r["doc_id"], r["n_tokens"], r["nll_micro_sum"], r["xent_micro"])
        for r in lm_score(batch_df, target).collect()
    }
    assert got == want_scores and len(got) == 20
    # and the batch-side join sanity: target-split docs weigh higher
    w = {r["doc_id"]: r["logw_micro"] for r in pipeline(batch_df).collect()}
    assert min(w[d] for d in range(10)) > max(w[d] for d in range(10, 20))
    assert len(want) == 20


def test_lm_tail_filter_streaming_equals_batch(spark, tmp_path):
    """Streaming LM tail filtering (VERDICT r7 item 7): the percentile
    cutoff is fit OFFLINE (drop_perplexity_tail's threshold aggregation
    can't run inside an unbounded stream), then lm_tail_filter applies the
    scalar as a stateless per-row score+filter on the ingest stream — the
    keep set must equal the batch drop_perplexity_tail output exactly,
    including ties kept at the cutoff."""
    from grower_spark.operators.text import (
        drop_perplexity_tail,
        fit_unigram_lm,
        lm_score,
        lm_tail_filter,
        lm_xent_threshold,
    )

    rows1 = [(i, "the quick brown fox and the lazy dog", "web")
             for i in range(0, 8)]
    # strictly increasing OOV fraction -> strictly increasing xent, so
    # the 25% cutoff lands inside this tail and actually drops docs
    rows2 = [(i, ("the " * (20 - i) + f"zz{i} " * (i - 7)).strip(), "web")
             for i in range(8, 16)]
    rows3 = [(16, "the the the", "web"), (17, None, "web")]
    _write_docs(spark, str(tmp_path / "tail_in" / "b1"), rows1)
    _write_docs(spark, str(tmp_path / "tail_in" / "b2"), rows2 + rows3)

    schema = "doc_id long, text string, source string"
    batch_df = spark.read.schema(schema).parquet(str(tmp_path / "tail_in" / "*"))
    stream_df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "tail_in" / "*"))
    )

    # offline: fit on the trusted window, derive the scalar cutoff
    model = fit_unigram_lm(batch_df.where(F.col("doc_id") < 8), vocab_k=8)
    cutoff = lm_xent_threshold(lm_score(batch_df, model), drop_permille=250)

    want = {tuple(r) for r in drop_perplexity_tail(batch_df, model, 250).collect()}
    got_df = _drain(lm_tail_filter(stream_df, model, cutoff), tmp_path, "tail_stream")
    got = {tuple(r) for r in got_df.collect()}
    assert got == want and 0 < len(got) < 18
