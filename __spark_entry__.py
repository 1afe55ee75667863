"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship clinical-KG slice on sf0.001: synthesize the
                clinical web corpus from the testdata doc ids, extract text
                from html byte-identically, tokenize, detect mentions
                (gazetteer broadcast join + unit adjacency matchers),
                extract (Drug, has_*, attr) triples, aggregate per
                predicate.
queries()     — one entry per implemented operator family (SURVEY.md §2),
                each runnable at any sf dir.
oracle_sql()  — DuckDB-equivalent SQL per query; every query has one
                (engine-specific sketches run in md5 portable mode, the
                non-SQL-expressible tokenizer reads a checked-in fixture).

Implementations live in medacy_spark.contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medacy_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from medacy_spark.corpus.synth import clinical_documents
    from medacy_spark.functions.html import extract_text_expr
    from medacy_spark.operators.mentions import detect_mentions, gazetteer_df
    from medacy_spark.operators.relations import extract_triples
    from medacy_spark.operators.tokenize import tokenize_native

    ids = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    docs = clinical_documents(ids)
    texts = docs.select("doc_id", extract_text_expr(F.col("html")).alias("text"))
    toks = tokenize_native(texts)
    mentions = detect_mentions(toks, gazetteer_df(spark))
    triples = extract_triples(mentions)
    return triples.groupBy("pred").agg(F.count("*").alias("n_triples")).orderBy("pred")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
