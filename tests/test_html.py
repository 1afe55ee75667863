"""Byte-identity of the html→text extractor (north-rule invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from medacy_spark.functions.html import (
    extract_text_expr,
    extract_text_udf,
    wrap_html_expr,
)

HOSTILE = [
    (1, "plain text"),
    (2, "a <b> & &amp; x"),
    (3, "naïve café 漢字 ✓ — em"),
    (4, ""),
    (5, "&lt;already-escaped&gt;"),
    (6, "</p></body></html> injected <p>"),
    (7, "tab\tand\nnewline"),
    (8, "&&&&<<<<>>>>"),
]


def _wrapped(spark):
    df = spark.createDataFrame(HOSTILE, "doc_id long, text string")
    return df.withColumn("html", wrap_html_expr(F.col("text")))


def test_expr_roundtrip_byte_identical(spark):
    w = _wrapped(spark)
    assert w.filter(extract_text_expr(F.col("html")) != F.col("text")).count() == 0


def test_udf_roundtrip_byte_identical(spark):
    w = _wrapped(spark).withColumn("ex", extract_text_udf("html"))
    assert w.filter("ex != text").count() == 0


def test_expr_and_udf_agree(spark):
    w = _wrapped(spark)
    both = w.select(
        extract_text_expr(F.col("html")).alias("a"),
        extract_text_udf("html").alias("b"),
    )
    assert both.filter("a != b").count() == 0


def test_corpus_sha_determinism(spark, doc_ids):
    """Same input -> same corpus bytes, across two independent plans."""
    from medacy_spark.corpus.synth import clinical_documents

    h1 = (
        clinical_documents(doc_ids)
        .select(F.sha2(F.col("text"), 256).alias("h"))
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256))
        .collect()[0][0]
    )
    h2 = (
        clinical_documents(doc_ids)
        .select(F.sha2(extract_text_expr(F.col("html")), 256).alias("h"))
        .agg(F.sha2(F.concat_ws("", F.sort_array(F.collect_list("h"))), 256))
        .collect()[0][0]
    )
    assert h1 == h2
