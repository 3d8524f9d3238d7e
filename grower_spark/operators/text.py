"""Text analysis operators for training-data pipelines.

All per-row, JVM-side array/string expressions (no UDFs, no shuffles):
token statistics, a BPE-ish regex tokenizer count, n-gram-heuristic
language ID, quality scoring, and a 60-bit content fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from grower_spark.functions.hashing import md5_60

# Tiny per-language stopword profiles for the language-ID heuristic.  Real
# deployments swap in proper profiles; the mechanism (per-language token
# hit-rate, argmax with deterministic tie-break) is the operator.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "you", "that"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "no"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "en", "les"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "nicht"],
}

# Word-ish / number / other-symbol pieces — a cheap stand-in for a BPE
# pre-tokenizer's coarse segmentation.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS_EN = LANG_PROFILES["en"]


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def _lit_strs(vals) -> Column:
    """Literal array<string> in ONE py4j call (F.lit on a list), not a
    per-element F.lit loop — vocab-sized model literals made driver-side
    plan construction a visible per-call cost (see encode_with_fit)."""
    return F.lit(list(vals)).cast("array<string>")


def _lit_longs(vals) -> Column:
    return F.lit([int(v) for v in vals]).cast("array<long>")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds integer token statistics columns (whitespace tokenization)."""
    toks = _tokens(F.col(text_col))
    stop = _lit_strs(STOPWORDS_EN)
    return (
        df.withColumn("n_chars", F.length(text_col))
        .withColumn("n_tokens", F.size(toks))
        .withColumn(
            "sum_token_len",
            F.aggregate(F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x),
        )
        .withColumn("n_stop", F.size(F.filter(toks, lambda t: F.array_contains(stop, t))))
        .withColumn("n_distinct_tokens", F.size(F.array_distinct(toks)))
    )


def regex_token_count(df: DataFrame, text_col: str = "text",
                      pattern: str = BPE_ISH_PATTERN) -> DataFrame:
    """Adds ``n_bpe_tokens``: count of BPE-ish regex token pieces."""
    return df.withColumn(
        "n_bpe_tokens", F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0)))
    )


def language_id(df: DataFrame, text_col: str = "text",
                profiles: dict[str, list[str]] = LANG_PROFILES) -> DataFrame:
    """Adds ``lang_guess``: language whose stopword profile has the highest
    token hit count; ties break to the alphabetically-first language so the
    result is deterministic (and oracle-checkable)."""
    toks = _tokens(F.col(text_col))
    out = df
    langs = sorted(profiles)
    def _in_profile(words: list[str]):
        # factory (PySpark passes the array index to 2-arg lambdas)
        prof = _lit_strs(words)
        return lambda t: F.array_contains(prof, t)

    for lang in langs:
        out = out.withColumn(
            f"_c_{lang}", F.size(F.filter(toks, _in_profile(profiles[lang])))
        )
    best = F.greatest(*[F.col(f"_c_{lang}") for lang in langs])
    guess = F.lit(None).cast("string")
    # reverse order + when-chains: first (alphabetical) max wins
    for lang in reversed(langs):
        guess = F.when(F.col(f"_c_{lang}") == best, F.lit(lang)).otherwise(guess)
    out = out.withColumn("lang_guess", guess)
    return out.drop(*[f"_c_{lang}" for lang in langs])


def quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds quality-score signals: length band, mean token length band,
    stopword ratio band, alpha ratio — and a 0..4 integer ``quality_score``
    (sum of passed checks).  Integer/4-decimal outputs only."""
    # n_alpha materialized as a column: it feeds two outputs and would
    # otherwise re-inline the regexp_replace per use
    stats = token_stats(df, text_col).withColumn(
        "n_alpha", F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    )
    mean_len = F.col("sum_token_len") / F.greatest(F.col("n_tokens"), F.lit(1))
    stop_ratio = F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1))
    alpha_ratio = F.col("n_alpha") / F.greatest(F.col("n_chars"), F.lit(1))
    checks = [
        ((F.col("n_chars") >= 32) & (F.col("n_chars") <= 100000)).alias("ok_length"),
        ((mean_len >= 2.0) & (mean_len <= 12.0)).alias("ok_mean_token_len"),
        (stop_ratio >= 0.01).alias("ok_stop_ratio"),
        (alpha_ratio >= 0.5).alias("ok_alpha_ratio"),
    ]
    out = stats.select(
        "*",
        *checks,
        F.round(mean_len, 4).alias("mean_token_len_r4"),
        F.round(stop_ratio, 4).alias("stop_ratio_r4"),
        F.round(alpha_ratio, 4).alias("alpha_ratio_r4"),
    )
    check_names = ["ok_length", "ok_mean_token_len", "ok_stop_ratio", "ok_alpha_ratio"]
    score = F.col(check_names[0]).cast("int")
    for name in check_names[1:]:
        score = score + F.col(name).cast("int")
    return out.withColumn("quality_score", score)


def ngram_novelty(df: DataFrame, shingle_n: int = 3,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document n-gram NOVELTY: what share of a doc's distinct word
    n-grams appears in NO other document (corpus document frequency 1) —
    the inverse of boilerplate/duplication signals, used for
    novelty-weighted sampling and curriculum ordering (a doc of
    only-common grams scores 0, fully original text scores 10000).

    Plan: one corpus shuffle for gram document frequencies (grams are
    per-doc distinct via ``shingles``, so the group count IS the df),
    one gram-keyed join back (both sides gram-partitioned from the same
    exchange), one doc rollup — the substring-dedup shape, linear in
    corpus grams.  Documents shorter than ``shingle_n`` tokens
    contribute their full token join as one gram.

    Output: ``(id_col, n_grams bigint, n_unique_grams bigint,
    novelty_bp bigint)``.
    """
    from grower_spark.operators.dedup import shingles

    g = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    dfreq = g.groupBy("gram").agg(F.count(F.lit(1)).alias("_df"))
    j = g.join(dfreq, "gram")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("_df") == 1).cast("long")).cast("long")
            .alias("n_unique_grams"),
        )
        .select(
            id_col, "n_grams", "n_unique_grams",
            F.expr("(n_unique_grams * 10000) div n_grams").cast("long")
            .alias("novelty_bp"),
        )
    )


def top_terms_tfidf(df: DataFrame, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document top-k terms by TF-IDF — the classic keyword /
    topic-label extraction over a corpus, with the score kept integer
    for cross-engine stability: ``score_micro = tf * floor(ln(N / df) *
    1e6)`` (N = docs with text, df = docs containing the term; both
    engines feed ln identical doubles, the LM-oracle precedent).  Ties
    break on the term string ascending.

    Plan: one (doc, term) shuffle for term frequencies, one term shuffle
    for document frequencies (the tf frame is already (doc, term)-unique,
    so its count IS the df), a term-keyed join back, and a doc-keyed
    top-k window — linear in corpus tokens, nothing quadratic.  N is a
    bounded driver-side scalar (one count).

    Output: ``(id_col, term, tf bigint, score_micro bigint, rank int)``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    docs = df.where(F.col(text_col).isNotNull())
    n_docs = docs.count()  # bounded collect: one scalar
    tok = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    idf = tf.groupBy("term").agg(
        F.floor(
            F.log(F.lit(float(n_docs)) / F.count(F.lit(1)).cast("double"))
            * 1e6
        ).cast("long").alias("_idf_micro")
    )
    scored = tf.join(idf, "term").select(
        id_col, "term", "tf",
        (F.col("tf") * F.col("_idf_micro")).cast("long").alias("score_micro"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: how much of a document is the same
    token or bigram repeated (boilerplate, keyword stuffing, generation
    loops — the classic low-quality markers a per-row length/stopword
    score misses).

    Output per document, all exact integers (basis points via integer
    floor division, so both engines agree bit-for-bit):

    - ``n_tokens``          whitespace token count
    - ``distinct_ratio_bp`` distinct tokens / tokens * 10000
    - ``top_word_bp``       most frequent token's share * 10000
    - ``top_bigram_bp``     most frequent bigram's share * 10000

    Plan shape: per-token counts need a group-by over (doc, gram), so this
    is NOT per-row like the other text signals — it explodes tokens and
    bigrams (tagged, one explode) and aggregates twice: (doc, kind, gram)
    then (doc).  Both aggregations partial-combine map-side, so the first
    shuffle carries one row per *distinct* gram per doc (bounded by doc
    length) and the second one row per doc.  Grouping is by doc id, so
    corpus-level token skew ("the" everywhere) does NOT skew the shuffle —
    hot keys can only be as hot as the longest single document.

    NULL-text documents explode to zero rows and are absent from the
    output (no tokens -> no repetition signal to report).
    """
    toks = _tokens(F.col(text_col))
    # non-distinct bigrams (repetition needs multiplicity; dedup.shingles
    # would distinct them away).  Docs shorter than 2 tokens contribute
    # their full token join, mirroring shingles() semantics.  The split
    # is bound ONCE as a lambda variable (the dedup.shingles lesson:
    # captured outer expressions re-evaluate per element, so the old
    # slice(toks, ...) form re-split the text per bigram index).
    elems = F.flatten(
        F.transform(
            F.array(toks),  # evaluates the split exactly once
            lambda tk: F.concat(
                F.transform(
                    tk,
                    lambda t: F.struct(
                        F.lit("w").alias("kind"), t.alias("gram")
                    ),
                ),
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size(tk) - 1, F.lit(1)) - 1
                    ),
                    lambda i: F.struct(
                        F.lit("g").alias("kind"),
                        F.array_join(F.slice(tk, i + 1, 2), " ").alias(
                            "gram"
                        ),
                    ),
                ),
            ),
        )
    )
    ex = df.select(F.col(id_col), F.explode(elems).alias("e")).select(
        id_col, F.col("e.kind").alias("kind"), F.col("e.gram").alias("gram")
    )
    cnt = ex.groupBy(id_col, "kind", "gram").agg(F.count(F.lit(1)).alias("c"))
    w = F.col("kind") == "w"
    g = F.col("kind") == "g"
    agg = cnt.groupBy(id_col).agg(
        F.sum(F.when(w, F.col("c"))).alias("n_tokens"),
        F.max(F.when(w, F.col("c"))).alias("_top_w"),
        F.sum(F.when(w, F.lit(1))).alias("_n_distinct_w"),
        F.max(F.when(g, F.col("c"))).alias("_top_g"),
        F.sum(F.when(g, F.col("c"))).alias("_n_bigrams"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        F.expr("_n_distinct_w * 10000 div n_tokens").alias("distinct_ratio_bp"),
        F.expr("_top_w * 10000 div n_tokens").alias("top_word_bp"),
        F.expr("_top_g * 10000 div _n_bigrams").alias("top_bigram_bp"),
    )


def vocab_topk(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Corpus vocabulary statistics: the k most frequent tokens with
    term frequency, document frequency, and 4-decimal IDF.

    (token, tf, doc_freq, idf_r4, rank) ordered by tf desc, token asc
    (deterministic ties).

    Plan shape — the round-5 Expand lesson applied: ``count`` +
    ``count_distinct`` in ONE aggregate would plan an Expand that doubles
    the exploded input, so this aggregates twice instead: (token, doc) —
    whose shuffle carries one row per *distinct* token per doc thanks to
    map-side partial aggregation — then (token), both Expand-free.  The
    global top-k is ``orderBy().limit(k)`` (TakeOrderedAndProject:
    per-partition heads merged on one reducer — k rows, not the vocab),
    and the rank window runs on those k rows only.
    """
    toks = _tokens(F.col(text_col))
    ex = (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_doc"), F.explode(toks).alias("token"))
    )
    per_doc = ex.groupBy("token", "_doc").agg(F.count(F.lit(1)).alias("c"))
    vocab = per_doc.groupBy("token").agg(
        F.sum("c").alias("tf"), F.count(F.lit(1)).alias("doc_freq")
    )
    n_docs = df.where(F.col(text_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("_n")
    )
    top = (
        vocab.crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "tf",
            "doc_freq",
            F.round(F.log(F.col("_n") / F.col("doc_freq")), 4).alias("idf_r4"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w))


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "text_norm") -> DataFrame:
    """Dedup-canonical text form: lowercase, punctuation stripped to
    spaces, whitespace collapsed, trimmed.  Near-dup operators key on
    content, so normalizing first merges trivial variants (case, extra
    spaces, punctuation) into one cluster.  Pure JVM string ops — per-row,
    no shuffle; run it before shingling at corpus scale."""
    # one regex pass: any run of non-alphanumerics (punctuation AND
    # whitespace) becomes a single space, which is exactly
    # punct->space + collapse-whitespace composed
    c = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " ")
    return df.withColumn(out_col, F.trim(c))


def fingerprint60(df: DataFrame, text_col: str = "text",
                  out_col: str = "fp60") -> DataFrame:
    """60-bit content fingerprint of the case/whitespace-normalized text."""
    return df.withColumn(out_col, md5_60(F.lower(F.trim(F.col(text_col)))))


# Rabin-Karp-style rolling hash parameters.  M is the Mersenne prime 2^31-1
# and per-token base hashes live in 30 bits, so acc*B + h stays under 2^52 —
# exact in int64 on every engine.  (``rolling_fingerprint61`` below is the
# production-strength 61-bit variant via two-limb modmul.)
ROLL_BASE = 1000003
ROLL_MOD = (1 << 31) - 1
ROLL_PREFIX_TOKENS = 24

# 61-bit variant: M61 = 2^61-1 (Mersenne), so 2^61 ≡ 1 (mod M61) and the
# high limb of any product folds back with a plain add — no 128-bit
# arithmetic needed.  All intermediates below stay under 2^62, exact in
# int64 even with ANSI overflow checking.
ROLL_MOD61 = (1 << 61) - 1
_LIMB30 = 1 << 30
_LIMB31 = 1 << 31


def rolling_fingerprint(df: DataFrame, text_col: str = "text",
                        out_col: str = "rh31") -> DataFrame:
    """Prefix rolling hash: fold (acc*B + h(token)) mod M over the first
    ``ROLL_PREFIX_TOKENS`` tokens — the order-sensitive complement to the
    order-insensitive md5 fingerprint (equal prefixes collide, permuted
    prefixes don't)."""
    toks = F.slice(_tokens(F.col(text_col)), 1, ROLL_PREFIX_TOKENS)
    hashes = F.transform(toks, lambda t: md5_60(t).bitwiseAND(F.lit((1 << 30) - 1)))
    rolled = F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(ROLL_BASE) + h) % F.lit(ROLL_MOD),
    )
    return df.withColumn(out_col, rolled)


def _roll61_step(acc: Column, h: Column) -> Column:
    """One fold step of ``(acc * B + h) mod (2^61 - 1)`` in exact int64.

    Limb decomposition (B = ROLL_BASE < 2^20, acc < 2^61, h < 2^31):

        acc = a*2^30 + b          (b = low 30 bits, a < 2^31)
        p   = a*B                 (< 2^51)
        p   = c*2^31 + d          (d = low 31 bits, c < 2^20)
        acc*B = p*2^30 + b*B = c*2^61 + d*2^30 + b*B
              ≡ c + d*2^30 + b*B            (mod 2^61-1, since 2^61 ≡ 1)

    so acc' = (c + d*2^30 + b*B + h) % M61, every term < 2^61 and the sum
    < 2^62 — no int64 overflow.  The a and c limbs are recovered with
    subtract-then-divide by a power of two: the numerator is an exact
    multiple of the divisor and needs < 53 mantissa bits after the shift,
    so the double-typed division is exact (F.shiftright can't be used —
    it rejects lambda-bound Columns in PySpark 4).
    """
    b = acc.bitwiseAND(F.lit(_LIMB30 - 1))
    a = ((acc - b) / F.lit(_LIMB30)).cast("long")
    p = a * F.lit(ROLL_BASE)
    d = p.bitwiseAND(F.lit(_LIMB31 - 1))
    c = ((p - d) / F.lit(_LIMB31)).cast("long")
    return (c + d * F.lit(_LIMB30) + b * F.lit(ROLL_BASE) + h) % F.lit(ROLL_MOD61)


def rolling_fingerprint61(df: DataFrame, text_col: str = "text",
                          out_col: str = "rh61",
                          prefix_tokens: int = ROLL_PREFIX_TOKENS) -> DataFrame:
    """Prefix rolling hash modulo the Mersenne prime 2^61-1.

    Same fold as ``rolling_fingerprint`` but with a 61-bit state and 31-bit
    token hashes, dropping the 31-bit variant's birthday-collision ceiling
    (~2^15.5 prefixes) to ~2^30.5 — the strength a corpus-scale prefix
    fingerprint needs.  Per-row, JVM-side, no shuffle.
    """
    toks = F.slice(_tokens(F.col(text_col)), 1, prefix_tokens)
    hashes = F.transform(toks, lambda t: md5_60(t).bitwiseAND(F.lit(_LIMB31 - 1)))
    rolled = F.aggregate(hashes, F.lit(0).cast("long"), _roll61_step)
    return df.withColumn(out_col, rolled)


def collect_vocab(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", k: int = 256) -> list[tuple[str, int]]:
    """Materialize the top-k vocabulary as (token, id) pairs, id = 1..k by
    (tf desc, token asc) rank.  k is bounded by contract (a tokenizer
    vocabulary is 32k-256k entries — driver-collectable at any corpus
    size, same precedent as IVF centroids / LSH planes: the *corpus* is
    never collected, only the fitted model)."""
    rows = vocab_topk(df, id_col=id_col, text_col=text_col, k=k).select(
        "token", "rank"
    ).collect()
    return [(r.token, r.rank) for r in rows]


def tokenize_to_ids(df: DataFrame, vocab: list[tuple[str, int]],
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Encode documents to token-id sequences against a fixed vocabulary —
    the step between text cleaning and sequence packing in a training
    pipeline.  Unknown tokens map to id 0.

    The vocabulary enters the plan as a map literal, so the encode itself
    is a per-row JVM expression: zero shuffles, scan-speed, and the map
    lookup is O(1) per token.  This is the right shape up to ~256k vocab
    entries (a few MB of literal, shipped once per executor inside the
    plan); beyond that, explode + broadcast-join the vocab table and
    reassemble with collect_list over a position sort — one shuffle,
    unbounded vocab (see tests for the equivalence pin).

    Output: (id_col, n_ids, n_unk, ids_csv) — the id sequence is emitted
    as a comma-joined string so the driver contract stays flat-scalar.
    """
    vmap = F.map_from_arrays(
        _lit_strs(t for t, _ in vocab), _lit_longs(i for _, i in vocab)
    )
    # NULL text encodes to an empty sequence (not size(NULL) = -1), matching
    # the join variant's contract
    toks = F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>"))
    ids = F.transform(toks, lambda t: F.coalesce(F.element_at(vmap, t), F.lit(0).cast("long")))
    return df.select(
        id_col,
        F.size(ids).cast("long").alias("n_ids"),
        F.size(F.filter(ids, lambda i: i == 0)).cast("long").alias("n_unk"),
        F.array_join(F.transform(ids, lambda i: i.cast("string")), ",").alias("ids_csv"),
    )


def tokenize_to_ids_join(df: DataFrame, vocab_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Unbounded-vocabulary variant of tokenize_to_ids: posexplode the
    tokens, broadcast-join the (token, id) vocab table, and reassemble the
    sequence ordered by position.  One shuffle (the reassembly groupBy);
    use when the vocab is too large for a plan literal.  vocab_df must
    have columns (token, rank)."""
    # NULL-text docs posexplode to zero rows and would vanish from the
    # groupBy; route them around the join as empty sequences so both
    # variants keep every input row (equivalence test pins this)
    null_rows = df.where(F.col(text_col).isNull()).select(
        id_col,
        F.lit(0).cast("long").alias("n_ids"),
        F.lit(0).cast("long").alias("n_unk"),
        F.lit("").alias("ids_csv"),
    )
    ex = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.posexplode(_tokens(F.col(text_col))).alias("_pos", "_tok")
    )
    joined = ex.join(F.broadcast(vocab_df), ex._tok == vocab_df.token, "left").select(
        id_col,
        "_pos",
        F.coalesce(F.col("rank").cast("long"), F.lit(0).cast("long")).alias("_id"),
    )
    # aggregate ONCE, derive the three outputs from the materialized array
    # (three agg expressions would each build their own collect_list)
    agg = joined.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("_pos", "_id"))).alias("_seq")
    )
    seq = F.col("_seq")
    encoded = agg.select(
        id_col,
        F.size(seq).cast("long").alias("n_ids"),
        F.size(F.filter(seq, lambda s: s._id == 0)).cast("long").alias("n_unk"),
        F.array_join(F.transform(seq, lambda s: s._id.cast("string")), ",").alias("ids_csv"),
    )
    return encoded.unionByName(null_rows)


def fit_unigram_lm(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", vocab_k: int = 256,
                   alpha: float = 1.0) -> dict:
    """Fit an add-alpha-smoothed unigram language model on a corpus —
    the model step of CCNet-style perplexity filtering (train the LM on a
    trusted split, score the raw corpus, drop the high-perplexity tail).

    The model is bounded by contract (top ``vocab_k`` tokens + one OOV
    bucket — driver-collectable at any corpus size, the collect_vocab /
    IVF-centroid precedent); the corpus is never collected.  Probabilities
    use add-alpha smoothing over V+1 outcomes (vocab + OOV):

        p(t)   = (tf(t) + alpha)   / (N + alpha * (V + 1))
        p(oov) = (c_oov + alpha)   / (N + alpha * (V + 1))

    Per-token costs are quantized to integer micro-nats
    (``floor(-ln p * 1e6)``) so downstream per-document sums are
    order-insensitive and exact across engines — the entropy_milli /
    rms_milli precedent.

    Returns ``{"vocab": [(token, nll_micro)], "oov_nll_micro": int,
    "n_train_tokens": int}``.
    """
    import math

    top = vocab_topk(df, id_col=id_col, text_col=text_col, k=vocab_k).select(
        "token", "tf"
    ).collect()
    n_total = df.select(
        F.sum(F.size(_tokens(F.col(text_col)))).alias("n")
    ).collect()[0]["n"] or 0
    denom = n_total + alpha * (len(top) + 1)

    def nll_micro(count: float) -> int:
        return int(math.floor(-math.log((count + alpha) / denom) * 1e6))

    vocab = [(r["token"], nll_micro(r["tf"])) for r in top]
    c_oov = n_total - sum(r["tf"] for r in top)
    return {
        "vocab": vocab,
        "oov_nll_micro": nll_micro(c_oov),
        "n_train_tokens": int(n_total),
    }


def lm_score(df: DataFrame, model: dict, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Score documents under a fitted unigram LM (``fit_unigram_lm``):
    per-document token count, total negative log-likelihood, and mean
    cross-entropy, all in integer micro-nats.

    The model enters the plan as a map literal (token -> nll_micro), so
    scoring is one zero-shuffle map pass at scan speed — the
    tokenize_to_ids shape; unknown tokens cost the OOV bucket.  Integer
    sums make the result bit-stable regardless of evaluation order.
    Perplexity is ``exp(xent_micro / 1e6)`` downstream when a float is
    wanted; the operator's contract stays integer-exact.

    Output: ``(id_col, n_tokens, nll_micro_sum, xent_micro)`` with
    ``xent_micro = nll_micro_sum div n_tokens`` (0 for empty/NULL text).
    """
    nll_map = F.map_from_arrays(
        _lit_strs(t for t, _ in model["vocab"]),
        _lit_longs(c for _, c in model["vocab"]),
    )
    oov = F.lit(int(model["oov_nll_micro"])).cast("long")
    toks = F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>"))
    terms = F.transform(toks, lambda t: F.coalesce(F.element_at(nll_map, t), oov))
    total = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: acc + x)
    scored = df.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        total.alias("nll_micro_sum"),
    )
    return scored.withColumn(
        "xent_micro",
        F.when(
            F.col("n_tokens") > 0,
            F.expr("nll_micro_sum div n_tokens"),
        ).otherwise(F.lit(0)).cast("long"),
    )


def importance_weights(df: DataFrame, target_model: dict, raw_model: dict,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"): per
    document, the log-likelihood ratio between a TARGET-domain LM and a
    RAW-corpus LM —

        log w(doc) = log p_target(doc) - log p_raw(doc)
                   = nll_raw(doc) - nll_target(doc)

    positive when the document looks more like the target domain.
    Downstream, resample keeping docs with probability proportional to
    exp(log w) (or take the top tail for a deterministic pipeline).

    Both models ride the plan as map literals (bounded vocab + OOV, the
    lm_score shape), and BOTH folds run in the same zero-shuffle map
    pass — one scan, two integer accumulators.  The micro-nat contract
    makes the weight integer-exact: ``logw_micro = nll_raw_micro_sum -
    nll_target_micro_sum`` (0 for empty/NULL text).

    Output: ``(id_col, n_tokens, logw_micro)``.
    """
    def terms(model: dict):
        m = F.map_from_arrays(
            _lit_strs(t for t, _ in model["vocab"]),
            _lit_longs(c for _, c in model["vocab"]),
        )
        oov = F.lit(int(model["oov_nll_micro"])).cast("long")
        toks = F.coalesce(
            _tokens(F.col(text_col)), F.array().cast("array<string>")
        )
        return F.aggregate(
            F.transform(toks, lambda t: F.coalesce(F.element_at(m, t), oov)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    toks = F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>"))
    return df.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        (terms(raw_model) - terms(target_model)).alias("logw_micro"),
    )


# Unknown-token sentinel for the bigram LM's mapped sequences: \x01 cannot
# be produced by whitespace tokenization of normal text (and both engines
# compare it as an ordinary one-char string).
LM_UNK = "\x01"
_LM_SEP = "\x1f"


def fit_bigram_lm(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", vocab_k: int = 128,
                  alpha: float = 1.0) -> dict:
    """Fit an add-alpha bigram language model — one step closer to the
    CCNet deployment (KenLM is a 5-gram of the same construction) than
    the unigram fit, while staying bounded and engine-exact.

    Tokens outside the top ``vocab_k`` vocabulary map to ``LM_UNK``;
    bigrams are consecutive mapped pairs WITHIN a document (no BOS/EOS,
    no cross-document pairs), and

        p(c | p) = (count(p,c) + alpha) / (ctx(p) + alpha * (V + 1))

    over V+1 outcomes (vocab + UNK), where ``ctx(p)`` counts p as a
    bigram CONTEXT (occurrences excluding each doc's last token).  The
    model is bounded by contract: observed bigrams <= (V+1)^2 regardless
    of corpus size (the mapped alphabet is finite), so the count
    collection is a model fit, not a corpus collect.  Costs are integer
    micro-nats (floor(-ln p * 1e6)); an unseen (p, c) costs the per-
    context add-alpha floor, and a never-seen context costs the uniform
    ln(V+1).

    Returns ``{"vocab": [tokens], "bigram": {(p, c): nll_micro},
    "unseen": {p: nll_micro}, "uniform_nll_micro": int}``.
    """
    import math

    top = vocab_topk(df, id_col=id_col, text_col=text_col, k=vocab_k).select(
        "token"
    ).collect()
    vocab = [r["token"] for r in top]
    ident = F.map_from_arrays(_lit_strs(vocab), _lit_strs(vocab))
    toks = F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>"))
    mapped = F.transform(
        toks, lambda t: F.coalesce(F.element_at(ident, t), F.lit(LM_UNK))
    )
    n = F.size(mapped)
    pair_structs = F.zip_with(
        F.slice(mapped, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(mapped, 2, F.greatest(n - 1, F.lit(0))),
        lambda p, c: F.struct(p.alias("p"), c.alias("c")),
    )
    counts = (
        df.select(F.explode(pair_structs).alias("pr"))
        .groupBy("pr.p", "pr.c")
        .agg(F.count(F.lit(1)).alias("pc"))
        .collect()
    )
    ctx: dict[str, int] = {}
    for r in counts:
        ctx[r["p"]] = ctx.get(r["p"], 0) + r["pc"]
    v1 = len(vocab) + 1

    def nll(num: float, den: float) -> int:
        return int(math.floor(-math.log(num / den) * 1e6))

    bigram = {
        (r["p"], r["c"]): nll(r["pc"] + alpha, ctx[r["p"]] + alpha * v1)
        for r in counts
    }
    unseen = {p: nll(alpha, pn + alpha * v1) for p, pn in ctx.items()}
    return {
        "vocab": vocab,
        "bigram": bigram,
        "unseen": unseen,
        "uniform_nll_micro": nll(alpha, alpha * v1),
    }


def bigram_lm_score(df: DataFrame, model: dict, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Score documents under a fitted bigram LM: per-doc bigram count,
    total NLL, and mean cross-entropy in integer micro-nats — one
    zero-shuffle map pass.  Documents with fewer than two tokens score 0.

    Lookup shape matters here: Spark's ``element_at`` on a MAP literal
    is a linear scan per lookup, so a (p, c)-keyed cost map pays
    O(observed bigrams) string comparisons per token pair (measured
    ~4 s for 5k sf0.1 docs against a 931-entry map).  Instead, tokens
    map to vocab indices once (one V-entry scan per token, same cost as
    the unigram path) and the model ships as a DENSE (V+1)² cost ARRAY —
    ``element_at`` on an array literal is O(1) — with the per-context
    unseen floor and the uniform fallback pre-baked into unobserved
    cells.  Plan size is (V+1)² long literals: fine through
    vocab_k ≈ 256 (≈66k entries); beyond that, posexplode +
    broadcast-join the cost table instead (the tokenize_to_ids_join
    shape).

    Output: ``(id_col, n_bigrams, nll_micro_sum, xent_micro)``.
    """
    vocab = model["vocab"]
    v1 = len(vocab) + 1
    sym = [LM_UNK] + list(vocab)  # index 0 = UNK, 1..V = vocab order
    uniform = int(model["uniform_nll_micro"])
    costs = [
        model["bigram"].get(
            (sym[p], sym[c]), model["unseen"].get(sym[p], uniform)
        )
        for p in range(v1)
        for c in range(v1)
    ]
    idx_map = F.map_from_arrays(
        _lit_strs(vocab),
        F.lit(list(range(1, v1))).cast("array<int>"),
    )
    # ONE F.expr for the (V+1)² cost array: building it from 16k+ F.lit()
    # calls costs seconds of driver-side py4j round-trips before the job
    # even starts (the minhash_signature lesson applied to literals)
    cost_arr = F.expr("array(" + ",".join(f"{int(x)}L" for x in costs) + ")")
    toks = F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>"))
    mapped = F.transform(
        toks,
        lambda t: F.coalesce(F.element_at(idx_map, t), F.lit(0).cast("int")),
    )
    n = F.size(mapped)
    terms = F.zip_with(
        F.slice(mapped, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(mapped, 2, F.greatest(n - 1, F.lit(0))),
        lambda p, c: F.element_at(cost_arr, p * F.lit(v1) + c + 1),
    )
    scored = df.select(
        id_col,
        F.greatest(n - 1, F.lit(0)).cast("long").alias("n_bigrams"),
        F.aggregate(
            terms, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("nll_micro_sum"),
    )
    return scored.withColumn(
        "xent_micro",
        F.when(
            F.col("n_bigrams") > 0, F.expr("nll_micro_sum div n_bigrams")
        ).otherwise(F.lit(0)).cast("long"),
    )


def lm_xent_threshold(scored: DataFrame, drop_permille: int,
                      col: str = "xent_micro") -> int:
    """Exact discrete-percentile cutoff for LM tail filtering: the
    largest cross-entropy KEPT when dropping the worst
    ``drop_permille``/1000 of documents — ``percentile_disc`` of the
    keep fraction (SQL-standard: smallest value whose cumulative
    distribution reaches q, so ties at the cutoff are kept on both
    engines).  One aggregation returning one scalar — a model-sized
    fit, like the vocab collect."""
    if not 0 < drop_permille < 1000:
        raise ValueError("drop_permille must be in (0, 1000)")
    q = (1000 - drop_permille) / 1000
    row = scored.selectExpr(
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col}) AS t"
    ).collect()[0]
    return int(row["t"])


def lm_tail_filter(df: DataFrame, model: dict, cutoff_xent_micro: int,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """The STREAMING deployment shape of LM tail filtering: apply a
    PRE-FIT model and a PRE-COMPUTED cross-entropy cutoff as a stateless
    per-row score+filter — no aggregation, so it runs unchanged on a
    ``readStream`` DataFrame (percentile thresholds can't be computed
    inside an unbounded stream; CCNet fits them offline on a reference
    window and ships the scalar).  Batch twin:
    ``drop_perplexity_tail(df, model, p)`` ==
    ``lm_tail_filter(df, model, lm_xent_threshold(scored, p))`` —
    equivalence pinned in tests/test_streaming_corpus.py.

    Output: the scored keep set, same contract as
    ``drop_perplexity_tail``.
    """
    scored = lm_score(df, model, id_col=id_col, text_col=text_col)
    return scored.where(F.col("xent_micro") <= F.lit(int(cutoff_xent_micro)))


def drop_perplexity_tail(df: DataFrame, model: dict, drop_permille: int,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """CCNet-style tail filtering by QUANTILE rather than absolute
    threshold: score the corpus under the fitted unigram LM, find the
    exact keep cutoff, keep documents at or below it.  Two passes over
    the corpus (score+threshold agg, then score+filter — both
    zero-shuffle map passes; cache or persist the scored frame upstream
    to make it one).  Ties at the cutoff are kept.

    Output: the scored keep set ``(id_col, n_tokens, nll_micro_sum,
    xent_micro)``.
    """
    scored = lm_score(df, model, id_col=id_col, text_col=text_col)
    cutoff = lm_xent_threshold(scored, drop_permille)
    return scored.where(F.col("xent_micro") <= F.lit(cutoff))


def bigram_lm_score_join(df: DataFrame, model: dict, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Unbounded-vocabulary twin of ``bigram_lm_score`` (the
    tokenize_to_ids_join shape): when (V+1)² outgrows a plan literal
    (~vocab_k 256), the vocabulary and the dense cost table ride as
    BROADCAST DataFrames instead — posexplode_outer the tokens, map to
    indices through the vocab join, pair consecutive positions with a
    doc-keyed lag window, join the (p, c) cost table, and aggregate per
    doc.  ONE shuffle (the doc-keyed window and the per-doc aggregation
    share the doc hash-partitioning); both joins broadcast — plan-pinned
    in tests/test_plan_shapes.py.

    posexplode_OUTER keeps empty/NULL-text documents as a single
    null-token placeholder row, so every doc survives to the final
    aggregation and no spine/anti-join pass over a second copy of the
    scored subtree is needed (the first cut of this operator built the
    zero rows with a left_anti join, which recomputed the whole
    explode+window+join lineage — 3 shuffles, 5 joins, double work).
    Placeholder and first-token rows carry a NULL lag ``p``; the cost
    join is LEFT (equivalent to inner for real pairs — the cost table is
    dense over (V+1)²) so they ride through with a NULL cost and
    ``count(p)`` / ``sum(nll)`` ignore them.  At production scale the
    cost table comes from parquet — here it is built from the fitted
    model so the equivalence pin against the literal path is exact.

    Output and semantics identical to ``bigram_lm_score``
    (equivalence-pinned in tests/test_vocab.py), including zero rows for
    short/NULL-text documents.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    vocab = model["vocab"]
    v1 = len(vocab) + 1
    sym = [LM_UNK] + list(vocab)
    uniform = int(model["uniform_nll_micro"])
    vocab_df = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(vocab)], "token string, idx int"
    )
    cost_df = spark.createDataFrame(
        [
            (p, c,
             model["bigram"].get((sym[p], sym[c]),
                                 model["unseen"].get(sym[p], uniform)))
            for p in range(v1)
            for c in range(v1)
        ],
        "p int, c int, nll long",
    )
    ex = df.select(
        F.col(id_col),
        F.posexplode_outer(_tokens(F.col(text_col))).alias("_pos", "_tok"),
    )
    mapped = ex.join(F.broadcast(vocab_df), ex._tok == vocab_df.token, "left").select(
        id_col, "_pos",
        # real token -> vocab idx else 0 (UNK); placeholder row -> NULL
        F.when(
            F.col("_tok").isNotNull(), F.coalesce(F.col("idx"), F.lit(0))
        ).alias("c"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    paired = mapped.select(
        F.col(id_col), F.lag("c").over(w).alias("p"), "c"
    )
    out = (
        paired.join(F.broadcast(cost_df), ["p", "c"], "left")
        .groupBy(id_col)
        .agg(
            F.count("p").cast("long").alias("n_bigrams"),
            F.coalesce(F.sum("nll"), F.lit(0)).cast("long")
            .alias("nll_micro_sum"),
        )
    )
    return out.withColumn(
        "xent_micro",
        F.when(
            F.col("n_bigrams") > 0, F.expr("nll_micro_sum div n_bigrams")
        ).otherwise(F.lit(0)).cast("long"),
    )


# --- BM25 retrieval (r9) -----------------------------------------------------

def bm25_topk(df: DataFrame, queries: list[tuple[int, str]], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """BM25 top-k retrieval: rank documents against a bounded query set —
    the text-retrieval primitive a training-data platform needs for
    query-based corpus search, retrieval-based decontamination (find the
    documents most similar to a benchmark question), and curation
    spot-checks.  No reference counterpart (superset surface).

    Scoring is Robertson/Lucene BM25 with k1=1.2, b=0.75, pinned to the
    repo's integer-micro contract so every value is EXACT on any engine
    (no float accumulation order anywhere):

        idf_micro(t)   = floor(ln((N - df + 0.5)/(df + 0.5) + 1) * 1e6)
        score_term     = floor(idf_micro * 22 * tf * S
                               / (10*tf*S + 3*S + 9*dl*N))
        score_micro    = sum(score_term over matched terms)   -- int64

    where N = docs, S = total corpus tokens, dl = doc tokens: with
    k1=6/5, b=3/4 the classic tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    becomes the integer ratio 22*tf*S / (10*tf*S + 3*S + 9*dl*N)
    exactly.  Overflow bound: idf_micro*22*tf*S must stay under 2^63 —
    holds to ~1e9 corpus tokens with tf ≤ 1e3; past that, partition the
    corpus or drop to the double-precision variant of the ratio (the
    ranking is unaffected by the representation; only cross-engine
    hash-certification needs the integers).

    Plan shape (100 TB): the corpus NEVER shuffles at full scale — the
    token explode is filtered by a broadcast join against the bounded
    query-term set BEFORE any Exchange, so the tf rollup's shuffle
    carries only (candidate doc, query term) rows.  That tf table is
    candidate-bounded, so it is localCheckpointed once and feeds both
    the per-term df rollup and the scoring join (without the checkpoint
    Spark recomputes the subtree per consumer — measured: 3 corpus
    scans, 2 corpus-scale Exchanges in the first cut).  Document length
    rides the explode from before the filter; the (N, S) totals are one
    separate map-side pass attached as a 1-row broadcast.  Final top-k
    window partitions by qid (query-count partitions).

    Output: ``(qid, doc_id, score_micro, rank)``, ranks 1..k per query
    by (score DESC, doc_id ASC).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql import Window

    spark = df.sparkSession
    docs = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    )
    qdf = spark.createDataFrame(queries, schema="qid long, qtext string")
    qterms = qdf.select(
        "qid", F.explode(F.array_distinct(_tokens(F.col("qtext")))).alias("term")
    )
    toks_q = docs.select(
        id_col, F.size("_toks").alias("dl"),
        F.explode("_toks").alias("term"),
    ).join(F.broadcast(qterms.select("term").distinct()), "term")
    # bounded: (docs containing a query term) x (query terms) rows —
    # checkpointed so df-rollup and scoring share ONE computation
    tf = toks_q.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).localCheckpoint()
    totals = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("_toks")).cast("long").alias("sum_len"),
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    cand = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        # 1-row constant attach (same pattern as decontam's corpus stats)
        .crossJoin(F.broadcast(totals))
    )
    idf_micro = F.floor(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ) * F.lit(1_000_000.0)
    ).cast("long")
    term_score = F.expr(
        "_idf * 22L * tf * sum_len div "
        "(10L * tf * sum_len + 3L * sum_len + 9L * dl * n_docs)"
    )
    scored = cand.withColumn("_idf", idf_micro).select(
        "qid", id_col, term_score.alias("_s")
    ).groupBy("qid", id_col).agg(
        F.sum("_s").cast("long").alias("score_micro")
    )
    # candidate volume per query is corpus-linear for stop-like query
    # terms, and the rank window has only |queries| partitions — the
    # two-level scheme shared with the ANN family (r14) bounds the
    # final window's reducer input at shuffle-partitions x k
    from grower_spark.operators.similarity import partial_topk

    order = [F.desc("score_micro"), F.asc(id_col)]
    scored = partial_topk(scored, ["qid"], order, k)
    w = Window.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def term_affinity_topk(df: DataFrame, k: int = 50, min_count: int = 5,
                       text_col: str = "text") -> DataFrame:
    """Top-k token-pair affinity (pointwise mutual information without
    the log — ``p(x,y) / (p(x) p(y))`` over consecutive-token bigrams):
    collocation mining for tokenizer-merge candidates, multi-word-entity
    discovery, and template detection in a training corpus.  Dropping the
    ``ln`` keeps the ranking identical (ln is monotone) while keeping the
    value engine-portable — ``ln``'s last ulp is not, the same reason
    weighted_poisson_sample avoids A-ES keys.

    Counting: ``c_x`` = token occurrences, ``c_xy`` = consecutive-pair
    occurrences within a document (no cross-document pairs, same contract
    as fit_bigram_lm), ``N`` / ``N_b`` = their corpus totals.  Affinity is
    computed as ``(c_xy/N_b) / ((c_x/N) * (c_y/N))`` — every operand an
    exact int64, every step an exact-rounded IEEE op in a FIXED
    parenthesization, so both engines agree bit-for-bit (the naive
    ``c_xy*N^2`` integer numerator exceeds 2^53 and silently loses
    exactness in the double cast).

    Plan / 100 TB: one explode→agg shuffle for unigrams, one for bigrams
    (both map-side combinable — shuffle rows bounded by partitions ×
    vocab, not corpus); the two scalar totals ride a 1-row broadcast; the
    unigram table joins in twice (broadcast while vocab fits an executor
    — beyond that Catalyst degrades to a pair of vocab-keyed shuffle
    joins, same shape as bigram_lm_score_join's production twin); the
    final top-k is ``orderBy().limit(k)`` which Spark plans as
    TakeOrderedAndProject — per-partition heaps merged on the driver,
    NO global sort shuffle.  ``min_count`` prunes the hapax tail before
    the joins (rare pairs also have degenerate affinity).
    """
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    totals = df.where(F.col(text_col).isNotNull()).select(
        F.sum(n_tok).alias("_n"),
        F.sum(F.greatest(n_tok - 1, F.lit(0))).alias("_nb"),
    )
    uni = (
        df.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pair_structs = F.zip_with(
        F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
        lambda p, c: F.struct(p.alias("x"), c.alias("y")),
    )
    big = (
        df.select(F.explode(pair_structs).alias("pr"))
        .groupBy(F.col("pr.x").alias("x"), F.col("pr.y").alias("y"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= min_count)
    )
    cx = uni.select(F.col("tok").alias("x"), F.col("c").alias("c_x"))
    cy = uni.select(F.col("tok").alias("y"), F.col("c").alias("c_y"))
    joined = (
        big.join(F.broadcast(cx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(totals))
    )
    aff = (
        (F.col("c_xy").cast("double") / F.col("_nb").cast("double"))
        / (
            (F.col("c_x").cast("double") / F.col("_n").cast("double"))
            * (F.col("c_y").cast("double") / F.col("_n").cast("double"))
        )
    )
    return (
        joined.select(
            "x", "y",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.col("c_x").cast("long").alias("c_x"),
            F.col("c_y").cast("long").alias("c_y"),
            aff.alias("_aff"),
        )
        .orderBy(F.col("_aff").desc(), "x", "y")
        .limit(k)
        .select(
            "x", "y", "c_xy", "c_x", "c_y",
            F.round("_aff", 4).alias("affinity_r4"),
        )
    )


def gopher_rules(df: DataFrame, text_col: str = "text",
                 min_words: int = 5, max_words: int = 100_000,
                 min_mean_word_len: int = 3, max_mean_word_len: int = 10,
                 max_symbol_ratio_bp: int = 1000,
                 min_alpha_word_bp: int = 8000,
                 min_stopwords: int = 2,
                 max_bullet_line_bp: int = 9000,
                 max_ellipsis_line_bp: int = 3000) -> DataFrame:
    """The Gopher document-quality rules (Rae et al., "Scaling Language
    Models: Methods, Analysis & Insights from Training Gopher", 2021,
    §A1.1 — the published repetition-free subset), as pure column
    expressions: one map-side pass, no UDF, no shuffle.

    Per-doc integer signals and boolean rule flags, plus ``gopher_pass``
    (all rules hold).  Ratios are integer basis points so the flags are
    engine-exact:

    - word count in [min_words, max_words];
    - mean word length in [min_mean_word_len, max_mean_word_len]
      (integer-floored mean, exact in both engines);
    - symbol-to-word ratio (``#`` and ``...`` occurrences per word)
      <= max_symbol_ratio_bp;
    - >= min_alpha_word_bp of words contain an alphabetic character;
    - >= min_stopwords stopword hits (the paper's "stop word" rule);
    - line rules on newline-delimited docs: <= max_bullet_line_bp of
      lines start with a bullet, <= max_ellipsis_line_bp end with an
      ellipsis (docs without newlines have one line and typically pass
      — exercised with multi-line fixtures in pytest).

    Output: ``(input columns..., n_words, mean_word_len, symbol_bp,
    alpha_word_bp, n_stop_hits, bullet_line_bp, ellipsis_line_bp,
    ok_* x7, gopher_pass int)``.
    """
    # token/line arrays materialized as columns: every signal below
    # consumes them, and inlined they would re-split the text once per
    # consumer (the quality_signals n_alpha lesson — 4+ splits per row)
    staged = df.withColumn("_gt", _tokens(F.col(text_col))).withColumn(
        "_gl", F.split(F.col(text_col), "\n")
    )
    toks, lines = F.col("_gt"), F.col("_gl")
    stop = _lit_strs(STOPWORDS_EN)
    n_words = F.greatest(F.size(toks), F.lit(0))
    nw1 = F.greatest(n_words, F.lit(1))
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = (sum_len / nw1).cast("long")
    n_hash = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), r"#", "")
    )
    n_ell = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\.\.\.|…"), F.lit(0))
    )
    symbol_bp = ((n_hash + n_ell) * 10000 / nw1).cast("long")
    n_alpha_w = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_bp = (n_alpha_w * 10000 / nw1).cast("long")
    n_stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*([-*•])"))
    )
    n_ell_end = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))
    )
    bullet_bp = (n_bullet * 10000 / n_lines).cast("long")
    ell_bp = (n_ell_end * 10000 / n_lines).cast("long")
    out = staged.select(
        *[F.col(c) for c in df.columns],
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_bp.alias("symbol_bp"),
        alpha_bp.alias("alpha_word_bp"),
        n_stop_hits.cast("long").alias("n_stop_hits"),
        bullet_bp.alias("bullet_line_bp"),
        ell_bp.alias("ellipsis_line_bp"),
    )
    checks = {
        "ok_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "ok_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "ok_symbol_ratio": F.col("symbol_bp") <= max_symbol_ratio_bp,
        "ok_alpha_words": F.col("alpha_word_bp") >= min_alpha_word_bp,
        "ok_stopwords": F.col("n_stop_hits") >= min_stopwords,
        "ok_bullet_lines": F.col("bullet_line_bp") <= max_bullet_line_bp,
        "ok_ellipsis_lines": F.col("ellipsis_line_bp") <= max_ellipsis_line_bp,
    }
    for name, cond in checks.items():
        out = out.withColumn(name, cond)
    passed = None
    for name in checks:
        passed = F.col(name) if passed is None else (passed & F.col(name))
    return out.withColumn("gopher_pass", passed.cast("int"))


def fertility_stats(df: DataFrame, text_col: str = "text",
                    lang_col: str = "lang") -> DataFrame:
    """Per-language tokenizer-fertility panel: docs, whitespace tokens
    per doc and characters per token (x100 fixed-point) — the quick
    read on how token-hungry each language is under a given
    tokenization, i.e. the relative context-window cost per language
    (the published tokenizer-parity concern: identical text budgets buy
    unequal token budgets across languages).

    One map-combinable aggregation over (lang); integer outputs only.
    NULL text rows carry no tokens and are excluded (they would deflate
    fertility with zeros that say nothing about the language).
    """
    toks = _tokens(F.col(text_col))
    return (
        df.where(F.col(text_col).isNotNull())
        .groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(toks)).cast("long").alias("n_tokens"),
            F.sum(F.length(text_col)).cast("long").alias("n_chars"),
        )
        .select(
            lang_col,
            "n_docs",
            "n_tokens",
            (F.col("n_tokens") * 100 / F.greatest(F.col("n_docs"), F.lit(1)))
            .cast("long").alias("tokens_per_doc_x100"),
            (F.col("n_chars") * 100 / F.greatest(F.col("n_tokens"), F.lit(1)))
            .cast("long").alias("chars_per_token_x100"),
        )
    )


def fineweb_filters(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/FineWeb-style heuristic filter panel (Raffel et al. 2020 §2.2;
    Penedo et al. 2024) as one map-side expression pass — the
    complementary panel to :func:`gopher_rules` (which covers the Gopher
    paper's rules): per-doc integer signals + flags, fixed-point only.

    - ``n_sentences`` / ``words_per_sentence_x100``: sentence segments by
      terminal punctuation — C4 drops pages with too few sentences;
    - ``numeric_word_bp`` / ``upper_word_bp``: digit-only and
      all-uppercase token shares — boilerplate/table indicators;
    - ``has_lorem`` / ``has_curly``: the C4 verbatim rules ("lorem
      ipsum" placeholder text; ``{`` as a code smell);
    - ``dup_line_bp``: share of newline-delimited lines that repeat
      within the doc (intra-doc boilerplate);
    - ``terminal_punct_line_bp``: share of lines ending in terminal
      punctuation (C4 keeps only such lines; here a per-doc signal).

    Single-line docs degrade honestly (line signals over one line);
    multi-line behavior is pinned in pytest.
    """
    # arrays staged as columns (the gopher_rules lesson: inlined splits
    # re-execute once per consuming signal)
    staged = (
        df.withColumn("_ft", _tokens(F.col(text_col)))
        .withColumn(
            "_fs",
            F.filter(
                F.split(F.col(text_col), r"[.!?]"),
                lambda s: F.length(F.trim(s)) > 0,
            ),
        )
        .withColumn("_fl", F.split(F.col(text_col), "\n"))
    )
    toks, sentences, lines = F.col("_ft"), F.col("_fs"), F.col("_fl")
    nw1 = F.greatest(F.size(toks), F.lit(1))
    n_sent = F.greatest(F.size(sentences), F.lit(1))
    n_numeric = F.size(F.filter(toks, lambda t: t.rlike(r"^[0-9]+$")))
    n_upper = F.size(
        F.filter(toks, lambda t: t.rlike(r"^[A-Z]{2,}$"))
    )
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_dup_lines = F.size(lines) - F.size(F.array_distinct(lines))
    n_term = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"[.!?]\s*$"))
    )
    return staged.select(
        *[F.col(c) for c in df.columns],
        F.size(sentences).cast("long").alias("n_sentences"),
        (F.size(toks) * 100 / n_sent).cast("long")
        .alias("words_per_sentence_x100"),
        (n_numeric * 10000 / nw1).cast("long").alias("numeric_word_bp"),
        (n_upper * 10000 / nw1).cast("long").alias("upper_word_bp"),
        F.lower(F.col(text_col)).contains("lorem ipsum").cast("int")
        .alias("has_lorem"),
        F.col(text_col).contains("{").cast("int").alias("has_curly"),
        (n_dup_lines * 10000 / n_lines).cast("long").alias("dup_line_bp"),
        (n_term * 10000 / n_lines).cast("long")
        .alias("terminal_punct_line_bp"),
    )
