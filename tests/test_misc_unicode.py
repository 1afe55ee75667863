"""Misc §2 ops + unicode→ASCII offset restoration (F5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medacy_spark.functions.unicode import restore_offset, to_ascii_with_map
from medacy_spark.operators.misc import (
    discover_sem_types,
    feature_projection,
    mention_text_from_doc,
    one_hot,
    oov_tokens,
    pos_drop,
    validate_entity_list,
    zip_datasets,
)


def test_unicode_ascii_offsets(spark):
    df = spark.createDataFrame(
        [(1, "a½b…c"), (2, "naïve µg —dash"), (3, "plain ascii")],
        "doc_id long, text string",
    )
    conv = df.select("doc_id", "text", to_ascii_with_map("text").alias("c"))
    rows = {r["doc_id"]: r for r in conv.collect()}
    assert rows[1]["c"]["ascii_text"] == "a1/2b...c"
    assert rows[2]["c"]["ascii_text"] == "naive ug --dash"
    assert rows[3]["c"]["ascii_text"] == "plain ascii"
    assert rows[3]["c"]["diffs"] == []

    # restore ascii offsets onto the original text of doc 1:
    # orig  a(0) ½(1) b(2) …(3) c(4)
    # ascii a(0) 1/2(1-3) b(4) ...(5-7) c(8)
    probes = spark.createDataFrame(
        [(1, 0, 0), (1, 2, 1), (1, 4, 2), (1, 6, 3), (1, 8, 4)],
        "doc_id long, ascii_off long, expected long",
    )
    j = probes.join(conv, "doc_id").select(
        "ascii_off", "expected",
        restore_offset(F.col("ascii_off"), F.col("c.diffs")).alias("got"),
    )
    assert j.filter("got != expected").count() == 0


def test_unicode_restore_after_multiple_diffs(spark):
    df = spark.createDataFrame([(1, "x—y—z")], "doc_id long, text string")
    conv = df.select(to_ascii_with_map("text").alias("c")).collect()[0]["c"]
    assert conv["ascii_text"] == "x--y--z"
    # ascii 'z' at 6 → orig 4
    got = spark.createDataFrame([(conv["diffs"],)], "diffs array<struct<pos:long,orig_len:long,new_len:long>>") \
        .select(restore_offset(F.lit(6), F.col("diffs")).alias("o")).collect()[0]["o"]
    assert got == 4


def test_zip_and_validate(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, v string")
    b = spark.createDataFrame([(2, "z"), (3, "w")], "doc_id long, v string")
    paired, only_a, only_b = zip_datasets(a, b)
    assert paired.count() == 1
    assert [r["doc_id"] for r in only_a.collect()] == [1]
    assert [r["doc_id"] for r in only_b.collect()] == [3]

    labels = spark.createDataFrame([("Drug",), ("ADE",)], "tag string")
    validate_entity_list(["Drug"], labels)
    with pytest.raises(ValueError):
        validate_entity_list(["Drug", "Missing"], labels)


def test_projection_posdrop_oov_onehot(spark):
    t = spark.createDataFrame(
        [(1, {"feature_is_unit": "true", "shape_": "xxx"}, "NOUN", False, "mg"),
         (2, {"feature_cui": "C1"}, "PUNCT", False, "."),
         (3, {}, "PUNCT", True, "!")],
        "tok long, features map<string,string>, pos_ string, is_target boolean, word string",
    )
    proj = t.select(feature_projection(F.col("features")).alias("f")).collect()
    assert proj[0]["f"] == {"feature_is_unit": "true"}
    kept = pos_drop(t, ["PUNCT"])
    assert {r["tok"] for r in kept.collect()} == {1, 3}  # target punct kept

    vocab = spark.createDataFrame([("mg",)], "word string")
    oov = {r["word"] for r in oov_tokens(t, vocab).collect()}
    assert oov == {".", "!"}

    oh = t.select(one_hot(F.col("pos_"), ["NOUN", "PUNCT"]).alias("v")).collect()
    assert oh[0]["v"] == [1.0, 0.0] and oh[1]["v"] == [0.0, 1.0]


def test_discover_semtypes_and_text_slice(spark):
    links = spark.createDataFrame(
        [(1, ["orch", "phsu"]), (2, ["sosy"])], "doc_id long, sem_types array<string>"
    )
    got = {r["sem_type"] for r in discover_sem_types(links).collect()}
    assert got == {"orch", "phsu", "sosy"}

    docs = spark.createDataFrame([(1, "take tylenol daily")], "doc_id long, text string")
    m = spark.createDataFrame([(1, "Drug", 5, 12)], "doc_id long, tag string, start long, end long")
    out = mention_text_from_doc(m, docs).collect()[0]
    assert out["text"] == "tylenol"
