"""Multinomial Naive Bayes text classification — the supervised sibling of
the unigram-LM scoring family (``operators/text.py``): fit per-class
add-alpha token models on a labeled split, score every document under
every class in one zero-shuffle map pass, predict by argmin total cost.

The production uses in an LLM-data pipeline: language identification
against a labeled seed set (the fastText-lid role), domain/source
classification for mixture control, and quality classification from
weak labels (the GPT-3 "Wikipedia-vs-CommonCrawl" filter construction).

Everything follows the LM-family contracts (superset surface — the
reference engine has no classifier; parity target is the published
multinomial-NB construction):

- the MODEL is bounded (top-k shared vocab × |classes| cost entries,
  collected once — the ``collect_vocab`` / IVF-centroid precedent); the
  corpus is never collected,
- per-token and prior costs are quantized to integer micro-nats
  (``floor(-ln p * 1e6)``), so per-document sums are order-insensitive
  and bit-identical across engines and partitionings,
- scoring ships the model as plan literals (map token → per-class cost
  array), so the score pass is per-row JVM at scan speed: zero
  shuffles, no Python UDFs, linear in corpus bytes at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grower_spark.operators.text import _tokens, vocab_topk

__all__ = ["fit_nb_classifier", "nb_score"]


def fit_nb_classifier(
    df: DataFrame,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 128,
    alpha: float = 1.0,
) -> dict:
    """Fit a multinomial Naive Bayes model on a labeled corpus split.

    Construction (add-alpha smoothing over V+1 outcomes per class, the
    ``fit_unigram_lm`` smoothing applied per class):

        p(t | c)   = (n_tc + alpha)  / (N_c + alpha * (V + 1))
        p(oov | c) = (c_oov + alpha) / (N_c + alpha * (V + 1))
        p(c)       = (docs_c + alpha) / (docs_train + alpha * C)

    with a SHARED top-``vocab_k`` vocabulary over the whole training
    split (tf desc, token asc — the ``vocab_topk`` rank order), so every
    class prices the same token set and scores stay comparable.

    Three bounded jobs, all documented-bounded collects:
    classes (≤ dozens of labels by contract), the k-token vocab, and the
    |classes| × k count matrix (map-side partial agg; the shuffle
    carries at most |classes| × k + |classes| rows).

    Returns ``{"classes": [label...] (sorted), "vocab": [token...],
    "cost": {token: [nll_micro per class]}, "oov_nll_micro": [per
    class], "prior_nll_micro": [per class], "n_train_docs": int}``.
    """
    train = df.where(F.col(label_col).isNotNull())

    # priors: per-class doc counts (bounded: one row per label)
    doc_rows = train.groupBy(label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).collect()
    classes = sorted(r[label_col] for r in doc_rows)
    n_docs_by_class = {r[label_col]: r["n_docs"] for r in doc_rows}
    n_train = sum(n_docs_by_class.values())
    n_classes = len(classes)

    # shared vocab on the full training split
    vocab = [
        r["token"]
        for r in vocab_topk(train, id_col=id_col, text_col=text_col,
                            k=vocab_k).select("token").collect()
    ]
    vocab_set = set(vocab)

    # per-class totals + per-(class, vocab-token) counts in ONE exploded
    # pass: grouping on (label, token) first keeps the shuffle at
    # distinct-(label, token) thanks to partial aggregation, then the
    # class totals roll up from the same frame
    tok = train.where(F.col(text_col).isNotNull()).select(
        F.col(label_col).alias("_cls"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    counts = tok.groupBy("_cls", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = {
        r["_cls"]: r["n_c"]
        for r in counts.groupBy("_cls").agg(F.sum("n").alias("n_c")).collect()
    }
    in_vocab = counts.where(F.col("token").isin(vocab)).collect()
    n_tc = {(r["_cls"], r["token"]): r["n"] for r in in_vocab}

    def nll_micro(count: int, denom: float) -> int:
        return int(math.floor(-math.log((count + alpha) / denom) * 1e6))

    cost: dict[str, list[int]] = {}
    oov: list[int] = []
    prior: list[int] = []
    for ci, c in enumerate(classes):
        n_c = int(totals.get(c, 0))
        denom = n_c + alpha * (len(vocab) + 1)
        c_vocab = 0
        for t in vocab:
            n = int(n_tc.get((c, t), 0))
            c_vocab += n
            cost.setdefault(t, [0] * n_classes)[ci] = nll_micro(n, denom)
        oov.append(nll_micro(n_c - c_vocab, denom))
        prior.append(
            int(math.floor(
                -math.log((n_docs_by_class[c] + alpha)
                          / (n_train + alpha * n_classes)) * 1e6
            ))
        )
    # tokens never seen in training still need a defined row if callers
    # pass a hand-built vocab; with vocab from vocab_topk every vocab
    # token has ≥1 training occurrence, but the dict covers all of vocab
    # regardless (setdefault above).
    assert set(cost) == vocab_set
    return {
        "classes": classes,
        "vocab": vocab,
        "cost": cost,
        "oov_nll_micro": oov,
        "prior_nll_micro": prior,
        "n_train_docs": int(n_train),
    }


def _long_array(values: list[int]) -> Column:
    # one literal-list lit() call, not len(values) py4j round-trips: the
    # model literals below are vocab × classes entries and the per-element
    # Column path made PLAN CONSTRUCTION the dominant per-call cost of
    # nb_score (~1 s at vocab=128 before the driver ever ran a task)
    return F.lit([int(v) for v in values]).cast("array<long>")


def nb_score(
    df: DataFrame,
    model: dict,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a fitted NB model and predict the argmin
    class.

    The cost matrix enters the plan as a map literal (token → array of
    per-class micro-nat costs); scoring folds the token sequence with an
    element-wise array add (``zip_with``), starting from the prior cost
    vector — one zero-shuffle map pass, the ``lm_score`` shape widened
    to |classes| lanes.  Unknown tokens cost each class its OOV bucket;
    NULL/empty text scores the priors alone.  Ties break to the lowest
    class index = lexicographically smallest label (``array_position``
    returns the FIRST minimum; ``classes`` is sorted).

    Output: ``(id_col, label_col, pred_<label_col>, nll_micro,
    correct)`` — the true label (NULL-safe compared), the predicted
    label, the winning class's total cost, and a 0/1 hit flag.
    """
    classes = model["classes"]
    cost_map = F.map_from_arrays(
        F.lit(list(model["vocab"])).cast("array<string>"),
        F.lit(
            [[int(v) for v in model["cost"][t]] for t in model["vocab"]]
        ).cast("array<array<long>>"),
    )
    oov_arr = _long_array(model["oov_nll_micro"])
    prior_arr = _long_array(model["prior_nll_micro"])
    classes_arr = F.lit(list(classes)).cast("array<string>")

    toks = F.coalesce(_tokens(F.col(text_col)), F.array().cast("array<string>"))
    scores = F.aggregate(
        toks,
        prior_arr,
        lambda acc, t: F.zip_with(
            acc,
            F.coalesce(F.element_at(cost_map, t), oov_arr),
            lambda a, b: a + b,
        ),
    )
    # materialize once: argmin + element_at both consume it
    scored = df.withColumn("_scores", scores)
    pos = F.array_position(F.col("_scores"), F.array_min(F.col("_scores")))
    pred = F.element_at(classes_arr, pos.cast("int"))
    return scored.select(
        id_col,
        label_col,
        pred.alias(f"pred_{label_col}"),
        F.array_min(F.col("_scores")).cast("long").alias("nll_micro"),
        F.col(label_col).eqNullSafe(pred).cast("int").alias("correct"),
    )
