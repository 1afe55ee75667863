"""Tokenizer: native/pandas parity + offset slice-identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from medacy_spark.corpus.synth import clinical_documents
from medacy_spark.operators.tokenize import sentences, tokenize_native, tokenize_pandas


def test_native_pandas_parity(spark, doc_ids):
    docs = clinical_documents(doc_ids).select("doc_id", "text")
    a = tokenize_native(docs)
    b = tokenize_pandas(docs)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_offsets_slice_identity(spark, doc_ids):
    """substring(text, idx+1, len) must recover every token — the EntTuple
    offset convention (annotations.py:8)."""
    docs = clinical_documents(doc_ids).select("doc_id", "text")
    toks = tokenize_native(docs)
    j = toks.join(docs, "doc_id")
    bad = j.filter(
        F.expr("substring(text, idx + 1, end_idx - idx)") != F.col("word")
    )
    assert bad.count() == 0


def test_sentence_ids_monotone(spark, doc_ids):
    docs = clinical_documents(doc_ids).select("doc_id", "text")
    toks = tokenize_native(docs)
    s = sentences(toks)
    # sentences end with '.'; sent count per doc = 1 + doc_id % 3
    cnt = s.groupBy("doc_id").count()
    expected = doc_ids.select(
        "doc_id", (1 + F.pmod(F.col("doc_id"), F.lit(3))).cast("long").alias("expected")
    )
    bad = cnt.join(expected, "doc_id").filter("count != expected")
    assert bad.count() == 0
