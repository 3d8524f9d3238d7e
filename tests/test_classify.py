"""Multinomial Naive Bayes classifier (operators/classify.py): hand-computed
model costs, argmin prediction, NULL handling, partitioning invariance."""

import math


def _micro(p: float) -> int:
    return int(math.floor(-math.log(p) * 1e6))


def test_nb_hand_computed(spark):
    """Fit + score against a fully hand-computed two-class model."""
    from grower_spark.operators.classify import fit_nb_classifier, nb_score

    train = spark.createDataFrame(
        [(0, "a a b", "en"), (2, "a c", "fr"), (4, "b b", "en")],
        "doc_id long, text string, lang string",
    )
    model = fit_nb_classifier(train, vocab_k=2, alpha=1.0)
    # tf: a=3 b=3 c=1 -> top2 by (tf desc, token asc) = [a, b]
    assert model["classes"] == ["en", "fr"]
    assert model["vocab"] == ["a", "b"]
    # en: a=2 b=3, N=5, denom=5+3=8; fr: a=1 c=1, N=2, denom=2+3=5
    assert model["cost"]["a"] == [_micro(3 / 8), _micro(2 / 5)]
    assert model["cost"]["b"] == [_micro(4 / 8), _micro(1 / 5)]
    # en c_oov = 5-5 = 0 -> 1/8; fr c_oov = 2-1 = 1 -> 2/5
    assert model["oov_nll_micro"] == [_micro(1 / 8), _micro(2 / 5)]
    # priors: en 2 docs, fr 1, n_train 3, C=2 -> 3/5 and 2/5
    assert model["prior_nll_micro"] == [_micro(3 / 5), _micro(2 / 5)]
    assert model["n_train_docs"] == 3

    docs = spark.createDataFrame(
        [(1, "a", "en"), (3, "c c c", "fr"), (5, None, "en"),
         (7, "a", None)],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r.asDict() for r in nb_score(docs, model).collect()}
    # "a": en 3/5*3/8 beats fr 2/5*2/5
    assert rows[1]["pred_lang"] == "en" and rows[1]["correct"] == 1
    assert rows[1]["nll_micro"] == _micro(3 / 5) + _micro(3 / 8)
    # "c c c": three OOV tokens -> fr (en OOV is 4x costlier)
    assert rows[3]["pred_lang"] == "fr" and rows[3]["correct"] == 1
    assert rows[3]["nll_micro"] == _micro(2 / 5) + 3 * _micro(2 / 5)
    # NULL text scores priors alone -> en
    assert rows[5]["pred_lang"] == "en" and rows[5]["correct"] == 1
    assert rows[5]["nll_micro"] == _micro(3 / 5)
    # NULL true label: NULL-safe compare -> 0, never NULL
    assert rows[7]["correct"] == 0


def test_nb_partition_invariance(spark):
    """Predictions are a per-row map pass: any partitioning yields the
    identical (pred, score) set — the integer-contract guarantee."""
    from grower_spark.operators.classify import fit_nb_classifier, nb_score

    docs = spark.createDataFrame(
        [(i, f"w{i % 5} w{i % 3} w{i % 7}", ["en", "fr", "de"][i % 3])
         for i in range(60)],
        "doc_id long, text string, lang string",
    )
    model = fit_nb_classifier(docs.where("doc_id % 2 = 0"), vocab_k=8)
    base = sorted(map(tuple, nb_score(docs, model).collect()))
    rep = sorted(map(tuple, nb_score(docs.repartition(7), model).collect()))
    assert base == rep and len(base) == 60
