"""Mention detection: gazetteer broadcast join + unit pattern matchers (M3).

Replaces the reference's learner with a deterministic rule stack behind the
same ``mentions(doc_id, tag, start, end, text)`` schema — the reference's
LexiconOverlayer (lexicon_component.py:27-52, a spaCy PhraseMatcher) becomes
a **broadcast hash join** of exploded token n-grams against the gazetteer,
and the UnitOverlayer Matcher patterns (unit_component.py:61-172) become
lead()-column adjacency predicates (operators/sequence.py). A model-scoring
mapInPandas stage (operators/ner_model.py) plugs into the same schema.

Scale notes: the gazetteer is tiny → F.broadcast, zero shuffle; matchers are
window functions over (doc, sent) — co-partitioned with tokenization, so the
whole detection stage is one shuffle end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medacy_spark.corpus import lexicons as lex
from medacy_spark.operators.sequence import number_unit_mentions


def gazetteer_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(lex.gazetteer_rows(), "label string, term string")


def gazetteer_mentions(
    tokens: DataFrame,
    gazetteer: DataFrame,
    id_col: str = "doc_id",
    max_ngram: int = 1,
) -> DataFrame:
    """Broadcast-join token n-grams (n ≤ max_ngram) against (label, term).

    PhraseMatcher max phrase length is 10 in the reference
    (lexicon_component.py:37); our synthetic gazetteer is single-token so the
    default keeps the explode factor at 1. Multi-word terms: raise max_ngram
    and the n-gram spans are built from lead() windows upstream.
    """
    t = tokens.select(
        id_col,
        "sent_id",
        F.lower(F.col("word")).alias("norm"),
        F.col("idx").alias("start"),
        F.col("end_idx").alias("end"),
        "word",
    )
    g = F.broadcast(gazetteer.select(F.lower("term").alias("norm"), "label"))
    out = t.join(g, "norm").select(
        id_col, "sent_id",
        F.col("label").alias("tag"),
        "start", "end",
        F.col("word").alias("text"),
    )
    return out


def unit_mentions(tokens: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Number+unit adjacency mentions: Dose (num + mass/volume unit) and
    Duration (num + time unit) — unit_component.py:152-172 semantics."""
    dose = number_unit_mentions(
        tokens, lex.DOSE_UNITS, "Dose",
        part_cols=(id_col, "sent_id"), order_col="tok_id", text_col="word",
    )
    dur = number_unit_mentions(
        tokens, lex.TIME_UNITS, "Duration",
        part_cols=(id_col, "sent_id"), order_col="tok_id", text_col="word",
    )
    return dose.unionByName(dur)


def detect_mentions(
    tokens: DataFrame, gazetteer: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Full rule-stack detection -> mentions(doc_id, sent_id, tag, start, end, text).

    Tokens schema: (id, sent_id, tok_id, idx, end_idx, word). Output is
    deduplicated on the EntTuple key — union semantics of
    annotations.py:250-264.
    """
    gz = gazetteer_mentions(tokens, gazetteer, id_col)
    um = unit_mentions(tokens, id_col)
    return (
        gz.unionByName(um)
        .dropDuplicates([id_col, "tag", "start", "end", "text"])
    )
