"""Feature extraction: tokens -> per-sentence FeatureTuples (X1 tail, W1).

The reference's FeatureExtractor (discrete_feature_extractor.py:25-40)
yields one ``FeatureTuple(features, indices, file_name)`` per sentence:
a list of per-token feature dicts (±window_size neighbor features keyed
'{i}:{name}', constant bias=1.0) plus the token char spans. Window sizes
per pipeline: clinical 3, systematic-review 10, fda-nano 6, lstm 0
(clinical_pipeline.py:41 etc.).

spaCy-derived token attributes (F18) are re-expressed as columns:
prefix_/suffix_/shape_/like_num/is_punct from pure string functions; pos_
and dependency heads would come from the model-scoring UDF stage when a
real parser plugs in.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from medacy_spark.operators.sequence import LIKE_NUM, feature_window

WINDOW_SIZES = {"clinical": 3, "systematic_review": 10, "fda_nano": 6, "lstm": 0}


def with_spacy_features(tokens: DataFrame, text_col: str = "word") -> DataFrame:
    """F18: cheap spaCy-attribute analogues as pure column expressions."""
    t = F.col(text_col)
    shape = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(t, "[A-Z]", "X"), "[a-z]", "x"), r"\d", "d"
    )
    # spaCy collapses runs of >4 identical shape chars; approximate with 4+
    shape = F.regexp_replace(shape, r"(x)\1{3,}", "xxxx")
    shape = F.regexp_replace(shape, r"(X)\1{3,}", "XXXX")
    shape = F.regexp_replace(shape, r"(d)\1{3,}", "dddd")
    return (
        tokens.withColumn("prefix_", F.substring(t, 1, 1))
        .withColumn("suffix_", F.substring(t, -3, 3))
        .withColumn("shape_", shape)
        .withColumn("like_num", t.rlike(LIKE_NUM).cast("string"))
        .withColumn("is_punct", t.rlike(r"^[^\w\s]+$").cast("string"))
        .withColumn("lower_", F.lower(t))
    )


def extract_feature_tuples(
    tokens: DataFrame,
    window_size: int = 3,
    feature_cols: Sequence[str] = ("word", "lower_", "prefix_", "suffix_", "shape_", "like_num"),
    id_col: str = "doc_id",
) -> DataFrame:
    """tokens -> one row per sentence:
    (id, sent_id, features array<map<string,string>>, indices
    array<struct<start,end>>) — the FeatureTuple relation.

    Ordering inside the arrays follows tok_id (deterministic).
    """
    t = with_spacy_features(tokens)
    t = feature_window(
        t, k=window_size, feature_cols=list(feature_cols),
        part_cols=(id_col, "sent_id"), order_col="tok_id",
    )
    def by_tok_id(l, r):  # noqa: E741 - comparator for array_sort
        return (
            F.when(l["tok_id"] < r["tok_id"], -1)
            .when(l["tok_id"] > r["tok_id"], 1)
            .otherwise(0)
        )

    rows = t.groupBy(id_col, "sent_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("tok_id", "features")), by_tok_id
            ),
            lambda x: x["features"],
        ).alias("features"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("tok_id", F.struct(
                    F.col("idx").alias("start"), F.col("end_idx").alias("end")
                ).alias("span"))), by_tok_id
            ),
            lambda x: x["span"],
        ).alias("indices"),
    )
    return rows


def multi_model_merge(mention_dfs: Sequence[DataFrame], id_col: str = "doc_id") -> DataFrame:
    """U6: MultiModel annotation merge (multi_model.py:90-98) — union of
    per-model mention tables with EntTuple dedup (U1)."""
    out = mention_dfs[0].select(id_col, "tag", "start", "end", "text")
    for df in mention_dfs[1:]:
        out = out.unionByName(df.select(id_col, "tag", "start", "end", "text"))
    return out.distinct()


def vocab_index(values: DataFrame, col: str) -> DataFrame:
    """A9: value -> contiguous index dictionary (nn/vectorizer.py:48-85).
    The reference uses nondeterministic first-seen order; we define the
    documented deterministic order (ascending value) instead."""
    from pyspark.sql import Window

    w = Window.orderBy(col)
    return values.select(col).distinct().withColumn(
        "index", (F.row_number().over(w) - 1).cast("int")
    )
