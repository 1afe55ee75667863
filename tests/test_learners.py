"""PerceptronLearner (X2/X3): a non-trivial learner behind the broadcast
contract — must beat FrequencyLearner where surface frequency is
insufficient, train deterministically, and survive the save/load/broadcast
round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medacy_spark.learners import PerceptronLearner
from medacy_spark.model import FrequencyLearner, Model

# the same surface form 'x' is a Drug after 'take' and an ADE after
# 'felt' — only context features can separate them
TEXT = "take x now . felt x today ."
GOLD = [("Drug", 5, 6), ("ADE", 18, 19)]


@pytest.fixture(scope="module")
def ambiguous_corpus(spark):
    docs = spark.createDataFrame(
        [(i, TEXT) for i in range(40)], "doc_id long, text string"
    )
    gold = spark.createDataFrame(
        [(i, t, s, e, "x") for i in range(40) for t, s, e in GOLD],
        "doc_id long, tag string, start long, end long, text string",
    )
    return docs, gold


def _strict_f1(gold, pred):
    from medacy_spark.operators.scoring import measures, with_prf

    rows = with_prf(measures(gold, pred.select(gold.columns), mode="strict")).collect()
    return {r["tag"]: r["f1"] for r in rows}


def test_perceptron_beats_frequency(spark, ambiguous_corpus):
    docs, gold = ambiguous_corpus
    freq = Model(spark, FrequencyLearner()).fit(docs, gold)
    perc = Model(spark, PerceptronLearner(epochs=3)).fit(docs, gold)
    f_freq = _strict_f1(gold, freq.predict(docs))
    f_perc = _strict_f1(gold, perc.predict(docs))
    # the frequency learner collapses both contexts onto one label
    assert f_freq["system"] < 0.75
    # the perceptron separates them perfectly
    assert f_perc["Drug"] == 1.0 and f_perc["ADE"] == 1.0
    assert f_perc["system"] == 1.0
    assert f_perc["system"] > f_freq["system"]


def test_perceptron_fit_deterministic(spark, ambiguous_corpus):
    docs, gold = ambiguous_corpus
    a = Model(spark, PerceptronLearner(epochs=2)).fit(docs, gold).learner
    b = Model(spark, PerceptronLearner(epochs=2)).fit(docs, gold).learner
    assert a.labels == b.labels
    assert a.weights == b.weights


def test_perceptron_sharded_ipm_path(spark, ambiguous_corpus):
    """The scale path: iterative parameter mixing (force it by zeroing the
    driver-fit threshold) must learn the context rule too, and be
    deterministic across fits."""
    docs, gold = ambiguous_corpus

    def fit_ipm():
        m = Model(spark, PerceptronLearner(epochs=3))
        m.driver_fit_max_sentences = 0
        return m.fit(docs, gold)

    m = fit_ipm()
    f = _strict_f1(gold, m.predict(docs))
    assert f["Drug"] == 1.0 and f["ADE"] == 1.0
    m2 = fit_ipm()
    assert m.learner.weights == m2.learner.weights


def test_perceptron_save_load_broadcast(spark, ambiguous_corpus, tmp_path):
    docs, gold = ambiguous_corpus
    m = Model(spark, PerceptronLearner(epochs=3)).fit(docs, gold)
    path = str(tmp_path / "perc.pkl")
    m.save(path)
    m2 = Model.load(spark, path)
    assert isinstance(m2.learner, PerceptronLearner)
    a = m.predict(docs).orderBy("doc_id", "start")
    b = m2.predict(docs).orderBy("doc_id", "start")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_perceptron_cross_validate(spark, ambiguous_corpus):
    docs, gold = ambiguous_corpus
    cv = Model(spark, PerceptronLearner(epochs=3)).cross_validate(
        docs, gold, num_folds=2
    ).collect()
    rows = {r["label"]: r for r in cv}
    assert rows["Drug"]["avg_f1"] == 1.0
    assert rows["ADE"]["avg_f1"] == 1.0


def test_perceptron_driver_fit_matches_contract():
    """Pure-python fit path (no Spark): learns the context rule; Viterbi
    decode reproduces the gold sequence."""
    sents = [(TEXT.split(" "), ["O", "Drug", "O", "O", "O", "ADE", "O", "O"])] * 10
    p = PerceptronLearner(epochs=3).fit(sents)
    out = p([TEXT.split(" ")])
    assert out == [["O", "Drug", "O", "O", "O", "ADE", "O", "O"]]
    # weights are sparse, hash-stable, and pickleable
    import pickle

    p2 = pickle.loads(pickle.dumps(p))
    assert p2([TEXT.split(" ")]) == out


def test_perceptron_viterbi_uses_transitions():
    """Structured inference, not per-token classification: the middle of a
    long same-word run has IDENTICAL emission features at every position
    (±2 windows all see 'm m _ m m'), so only the learned label-transition
    weights can reproduce an alternating label pattern."""
    words = ["m"] * 9
    gold = ["Drug" if i % 2 == 0 else "Dose" for i in range(9)]
    p = PerceptronLearner(epochs=10).fit([(words, gold)] * 5)
    assert p([words]) == [gold]
    # and a run of a different length still alternates from the start
    assert p([["m"] * 5]) == [["Drug", "Dose", "Drug", "Dose", "Drug"]]
