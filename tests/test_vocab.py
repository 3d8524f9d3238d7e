"""Corpus vocabulary stats (text.vocab_topk)."""

import math

from grower_spark.operators.text import vocab_topk


def test_vocab_counts_and_order(spark):
    rows = [
        (1, "a a b c"),
        (2, "a b b"),
        (3, None),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_topk(df, k=10).collect()
    got = {r.token: (r.tf, r.doc_freq, r.idf_r4, r.rank) for r in out}
    # tf: a=3, b=3, c=2; doc_freq: a=2, b=2, c=2; n_docs (non-null) = 3
    idf_2 = round(math.log(3 / 2), 4)
    assert got["a"] == (3, 2, idf_2, 1)  # tf tie a/b -> token asc
    assert got["b"] == (3, 2, idf_2, 2)
    assert got["c"] == (2, 2, idf_2, 3)


def test_vocab_limit_is_deterministic(spark):
    rows = [(i, "t%d x" % (i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in vocab_topk(df, k=3).collect()]
    b = [tuple(r) for r in vocab_topk(df.repartition(13), k=3).collect()]
    assert a == b  # layout-independent top-k (ties broken by token)
    assert len(a) == 3 and a[0][0] == "x"


def test_vocab_no_expand_in_plan(spark):
    rows = [(1, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = vocab_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # two-phase agg, not count+count_distinct


def test_tokenize_to_ids_basic(spark):
    from grower_spark.operators.text import tokenize_to_ids

    df = spark.createDataFrame(
        [(1, "a b z a"), (2, "z z")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in tokenize_to_ids(df, [("a", 1), ("b", 2)]).collect()}
    assert out[1].ids_csv == "1,2,0,1"
    assert (out[1].n_ids, out[1].n_unk) == (4, 1)
    assert out[2].ids_csv == "0,0"
    assert (out[2].n_ids, out[2].n_unk) == (2, 2)


def test_tokenize_join_variant_matches_literal(spark):
    """The unbounded-vocab join path must reproduce the map-literal path
    bit-for-bit on the real corpus (same contract, different plan)."""
    from grower_spark.operators.text import (
        collect_vocab,
        tokenize_to_ids,
        tokenize_to_ids_join,
        vocab_topk,
    )
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    vocab = collect_vocab(docs, k=32)
    lit_rows = sorted(
        (r.doc_id, r.n_ids, r.n_unk, r.ids_csv)
        for r in tokenize_to_ids(docs, vocab).collect()
    )
    vdf = vocab_topk(docs, k=32).select("token", "rank")
    join_rows = sorted(
        (r.doc_id, r.n_ids, r.n_unk, r.ids_csv)
        for r in tokenize_to_ids_join(docs, vdf).collect()
    )
    assert lit_rows == join_rows


def test_shard_shuffle_deterministic_and_dense(spark):
    from grower_spark.operators.sampling import shard_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = shard_shuffle(df, "doc_id", 8, salt="t").collect()
    again = shard_shuffle(df, "doc_id", 8, salt="t").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))  # replay-stable
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) <= set(range(8))
    for shard, positions in by_shard.items():
        # ranks are dense 1..n within every shard
        assert sorted(positions) == list(range(1, len(positions) + 1)), shard
    # a different salt produces a different permutation
    other = shard_shuffle(df, "doc_id", 8, salt="u").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))


def test_tokenize_variants_agree_on_null_text(spark):
    """NULL text must encode to an empty sequence in BOTH variants (the
    literal path used to emit size(NULL) = -1; the join path dropped the
    row entirely)."""
    from grower_spark.operators.text import tokenize_to_ids, tokenize_to_ids_join

    df = spark.createDataFrame(
        [(1, "a b"), (2, None)], "doc_id long, text string"
    )
    lit_rows = sorted(
        (r.doc_id, r.n_ids, r.n_unk, r.ids_csv)
        for r in tokenize_to_ids(df, [("a", 1)]).collect()
    )
    vdf = spark.createDataFrame([("a", 1)], "token string, rank int")
    join_rows = sorted(
        (r.doc_id, r.n_ids, r.n_unk, r.ids_csv)
        for r in tokenize_to_ids_join(df, vdf).collect()
    )
    assert lit_rows == join_rows == [(1, 2, 1, "1,0"), (2, 0, 0, "")]


def test_unigram_lm_hand_computed(spark):
    """Add-one unigram LM against hand-computed micro-nat costs."""
    import math

    from grower_spark.operators.text import fit_unigram_lm, lm_score

    train = spark.createDataFrame(
        [(0, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    model = fit_unigram_lm(train, vocab_k=2, alpha=1.0)
    # tf: a=3 b=1 c=1 -> top2 by (tf desc, token asc) = [a, b]; N=5, V=2,
    # denom = 5 + 1*(2+1) = 8; p(a)=4/8, p(b)=2/8, c_oov=1 -> p(oov)=2/8
    nll = {t: c for t, c in model["vocab"]}
    assert nll["a"] == int(math.floor(-math.log(0.5) * 1e6)) == 693147
    assert nll["b"] == model["oov_nll_micro"] == 1386294
    assert model["n_train_tokens"] == 5

    docs = spark.createDataFrame(
        [(1, "a b d"), (3, ""), (4, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in lm_score(docs, model).collect()}
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["nll_micro_sum"] == 693147 + 1386294 + 1386294
    assert rows[1]["xent_micro"] == rows[1]["nll_micro_sum"] // 3
    # empty string is ONE empty token (split semantics) costed as OOV
    assert rows[3]["n_tokens"] == 1 and rows[3]["nll_micro_sum"] == 1386294
    # NULL text scores as an empty sequence
    assert rows[4] == {"doc_id": 4, "n_tokens": 0, "nll_micro_sum": 0,
                       "xent_micro": 0}


def test_importance_weights_sign(spark):
    """DSIR log-ratio: target-looking docs weigh positive, off-target
    docs negative, empty/NULL zero."""
    from grower_spark.operators.text import fit_unigram_lm, importance_weights

    target_train = spark.createDataFrame(
        [(0, "aa aa aa aa")], "doc_id long, text string"
    )
    raw_train = spark.createDataFrame(
        [(0, "aa aa aa aa"), (1, "bb bb bb bb"), (2, "cc cc cc cc")],
        "doc_id long, text string",
    )
    t = fit_unigram_lm(target_train, vocab_k=8, alpha=1.0)
    r = fit_unigram_lm(raw_train, vocab_k=8, alpha=1.0)
    docs = spark.createDataFrame(
        [(10, "aa aa aa"), (11, "bb bb bb"), (12, None)],
        "doc_id long, text string",
    )
    rows = {x["doc_id"]: x.asDict() for x in importance_weights(docs, t, r).collect()}
    assert rows[10]["logw_micro"] > 0          # looks like the target
    assert rows[11]["logw_micro"] < 0          # off-target
    assert rows[12] == {"doc_id": 12, "n_tokens": 0, "logw_micro": 0}


def test_bigram_lm_hand_computed(spark):
    """Add-one bigram LM against hand-computed micro-nat costs, including
    the per-context unseen floor and the uniform never-seen-context
    fallback."""
    import math

    from grower_spark.operators.text import bigram_lm_score, fit_bigram_lm

    train = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x")], "doc_id long, text string"
    )
    m = fit_bigram_lm(train, vocab_k=3, alpha=1.0)
    # tf: a=3 b=3 c=1 x=1 -> top3 (tf desc, token asc) = [a, b, c]; x -> UNK
    # train pairs: (a,b)x3, (b,a), (b,c), (b,UNK); ctx: a=3, b=3; V+1=4
    assert m["vocab"] == ["a", "b", "c"]
    assert m["bigram"][("a", "b")] == int(math.floor(-math.log(4 / 7) * 1e6))
    assert m["bigram"][("b", "c")] == int(math.floor(-math.log(2 / 7) * 1e6))
    assert m["unseen"]["a"] == int(math.floor(-math.log(1 / 7) * 1e6))
    assert m["uniform_nll_micro"] == int(math.floor(-math.log(1 / 4) * 1e6))

    docs = spark.createDataFrame(
        [(9, "a b q"), (10, "z"), (11, None), (12, "q q")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in bigram_lm_score(docs, m).collect()}
    # doc9 maps to [a b UNK]: observed (a,b) + observed (b,UNK)
    assert rows[9]["n_bigrams"] == 2
    assert rows[9]["nll_micro_sum"] == (
        m["bigram"][("a", "b")] + m["bigram"][("b", "\x01")]
    )
    # short / NULL docs: no bigrams, all-zero contract
    assert rows[10] == {"doc_id": 10, "n_bigrams": 0, "nll_micro_sum": 0,
                        "xent_micro": 0}
    assert rows[11]["n_bigrams"] == 0
    # (UNK, UNK): UNK never appeared as a context -> uniform fallback
    assert rows[12]["nll_micro_sum"] == m["uniform_nll_micro"]


def _py_unigram(train_texts, vocab_k, alpha=1.0):
    """Pure-Python twin of fit_unigram_lm's contract."""
    import math
    from collections import Counter

    toks = [t for s in train_texts if s is not None for t in s.split(" ")]
    tf = Counter(toks)
    top = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]
    denom = len(toks) + alpha * (len(top) + 1)
    nll = {t: int(math.floor(-math.log((c + alpha) / denom) * 1e6))
           for t, c in top}
    c_oov = len(toks) - sum(c for _, c in top)
    oov = int(math.floor(-math.log((c_oov + alpha) / denom) * 1e6))
    return nll, oov


def test_unigram_lm_matches_python_reference_on_random_corpora(spark):
    """Property: for random small corpora the Spark fit+score pipeline is
    integer-identical to an independent pure-Python derivation of the
    same contract (vocab ties, smoothing, floor quantization, OOV)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from grower_spark.operators.text import fit_unigram_lm, lm_score

    token = st.sampled_from(["a", "b", "c", "dd", "ee"])
    doc = st.lists(token, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(doc, min_size=1, max_size=6))
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        model = fit_unigram_lm(df, vocab_k=3, alpha=1.0)
        nll, oov = _py_unigram(texts, vocab_k=3)
        assert dict(model["vocab"]) == nll
        assert model["oov_nll_micro"] == oov
        got = {r["doc_id"]: (r["n_tokens"], r["nll_micro_sum"])
               for r in lm_score(df, model).collect()}
        for i, s in enumerate(texts):
            toks = s.split(" ")
            want = sum(nll.get(t, oov) for t in toks)
            assert got[i] == (len(toks), want), (i, s)

    check()


def test_bigram_lm_matches_python_reference_on_random_corpora(spark):
    """Property: random corpora, Spark bigram fit+score integer-identical
    to an independent pure-Python derivation (UNK mapping, per-context
    smoothing, dense-array cost routing, strict fold)."""
    import math
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from grower_spark.operators.text import (
        LM_UNK,
        bigram_lm_score,
        fit_bigram_lm,
    )

    token = st.sampled_from(["a", "b", "cc"])
    doc = st.lists(token, min_size=1, max_size=7).map(" ".join)

    def py_ref(train_texts, score_texts, vocab_k, alpha=1.0):
        toks = [t for s in train_texts for t in s.split(" ")]
        tf = Counter(toks)
        vocab = [t for t, _ in
                 sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_k]]
        vset = set(vocab)

        def m(s):
            return [t if t in vset else LM_UNK for t in s.split(" ")]

        pairs = Counter(
            p for s in train_texts for p in zip(m(s), m(s)[1:])
        )
        ctx = Counter(p for (p, _), n in pairs.items() for _ in range(n))
        v1 = len(vocab) + 1

        def nll(num, den):
            return int(math.floor(-math.log(num / den) * 1e6))

        out = []
        for s in score_texts:
            ms = m(s)
            total = 0
            for pr in zip(ms, ms[1:]):
                if pr in pairs:
                    total += nll(pairs[pr] + alpha, ctx[pr[0]] + alpha * v1)
                elif pr[0] in ctx:
                    total += nll(alpha, ctx[pr[0]] + alpha * v1)
                else:
                    total += nll(alpha, alpha * v1)
            out.append((max(len(ms) - 1, 0), total))
        return out

    @settings(max_examples=8, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(doc, min_size=1, max_size=5))
    def check(texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        model = fit_bigram_lm(df, vocab_k=2, alpha=1.0)
        got = {r["doc_id"]: (r["n_bigrams"], r["nll_micro_sum"])
               for r in bigram_lm_score(df, model).collect()}
        for i, want in enumerate(py_ref(texts, texts, vocab_k=2)):
            assert got[i] == want, (i, texts[i])

    check()


def test_perplexity_tail_drop(spark):
    """Quantile tail filter: exact discrete cutoff, ties kept, worst
    fraction dropped."""
    from grower_spark.operators.text import (
        drop_perplexity_tail,
        fit_unigram_lm,
        lm_score,
        lm_xent_threshold,
    )

    train = spark.createDataFrame(
        [(0, "a a a a b b")], "doc_id long, text string"
    )
    model = fit_unigram_lm(train, vocab_k=2)
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "a b"), (3, "b b"), (4, "z z"), (5, "z z")],
        "doc_id long, text string",
    )
    scored = lm_score(docs, model)
    # xent order: doc1 < doc2 < doc3 < doc4 == doc5 (all-OOV worst)
    cut = lm_xent_threshold(scored, drop_permille=400)
    kept = {r["doc_id"] for r in drop_perplexity_tail(docs, model, 400).collect()}
    # keep fraction 0.6 of 5 docs -> percentile_disc lands on doc3's xent;
    # the tied worst pair (4, 5) drops together
    assert kept == {1, 2, 3}
    xents = {r["doc_id"]: r["xent_micro"] for r in scored.collect()}
    assert cut == xents[3] and xents[4] == xents[5] > cut


def test_bigram_join_variant_equals_literal(spark):
    """The broadcast-join bigram scorer must be row-identical to the
    plan-literal path on the real fixture (incl. short/NULL-text zero
    rows), so swapping shapes at vocab-size crossover never changes
    results."""
    import pyspark.sql.functions as F

    from grower_spark.operators.text import (
        bigram_lm_score,
        bigram_lm_score_join,
        fit_bigram_lm,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).union(spark.createDataFrame([(99991, "x"), (99992, None)],
                                  "doc_id long, text string"))
    model = fit_bigram_lm(docs.where(F.col("doc_id") % 2 == 0), vocab_k=32)
    lit = {r["doc_id"]: tuple(r)[1:]
           for r in bigram_lm_score(docs, model).collect()}
    join = {r["doc_id"]: tuple(r)[1:]
            for r in bigram_lm_score_join(docs, model).collect()}
    assert lit == join and len(lit) == docs.count()
