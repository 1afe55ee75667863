"""Model facade: fit -> predict -> cross_validate (reference test_model.py
analogues: fit/predict round-trip, predict polymorphism-free table-in/
table-out, cross_validate completes and rejects k<=1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medacy_spark.corpus.synth import clinical_documents, gold_mentions
from medacy_spark.model import FrequencyLearner, Model
from medacy_spark.operators.scoring import measures


def test_fit_predict_high_pr(spark, doc_ids):
    ids = doc_ids.filter("doc_id < 300")
    docs = clinical_documents(ids).select("doc_id", "text")
    gold = gold_mentions(ids)
    m = Model(spark).fit(docs, gold)
    pred = m.predict(docs)
    row = measures(gold, pred.select("doc_id", "tag", "start", "end", "text"),
                   mode="strict").filter("tag='system'").collect()[0]
    p = row["tp"] / (row["tp"] + row["fp"])
    r = row["tp"] / (row["tp"] + row["fn"])
    # learned surface-form table + unit rules recover the corpus exactly
    assert p >= 0.95 and r >= 0.95


def test_predict_before_fit_raises(spark, doc_ids):
    with pytest.raises(RuntimeError):
        Model(spark).predict(clinical_documents(doc_ids).select("doc_id", "text"))


def test_learner_pickles(spark):
    import pickle

    learner = FrequencyLearner().fit_table({"tylenol": "Drug"})
    back = pickle.loads(pickle.dumps(learner))
    assert back(["tylenol was taken".split()]) == [["Drug", "O", "O"]]


def test_cross_validate(spark, doc_ids):
    ids = doc_ids.filter("doc_id < 120")
    docs = clinical_documents(ids).select("doc_id", "text")
    gold = gold_mentions(ids)
    stats = Model(spark).cross_validate(docs, gold, num_folds=2)
    rows = {r["label"]: r for r in stats.collect()}
    assert "system" in rows
    assert rows["system"]["avg_f1"] > 0.9
    for r in rows.values():
        assert 0.0 <= r["min_precision"] <= r["avg_precision"] <= r["max_precision"] <= 1.0

    with pytest.raises(ValueError):
        Model(spark).cross_validate(docs, gold, num_folds=1)
