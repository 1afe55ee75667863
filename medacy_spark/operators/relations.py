"""Relation extraction: mentions -> (subj, pred, obj) triples (M4).

The reference's closest analogue is the rel→BRAT converter's R-lines
(`R{n}\\t{type} Arg1:T{i} Arg2:T{j}`, add_rel_to_brat.py:154) plus the
adjacency Matcher patterns that pair numbers with units
(unit_component.py:152-172). Our extractor generalizes: within a sentence,
each attribute mention (Dose/Route/Frequency/Duration/Form/ADE) attaches to
its **nearest** Drug mention, emitting `has_*` predicates — the
(Drug, has_dosage, Dose) shape of the north star.

Plan shape: the join is an equi-join on (doc, sent) — per-sentence
cardinalities are tiny, so the θ-part (distance ranking) is a cheap window
after the equi-join; at 10^12 docs everything stays partitioned by doc hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRED_FOR_TAG = {
    "Dose": "has_dosage",
    "Strength": "has_strength",
    "Route": "has_route",
    "Frequency": "has_frequency",
    "Duration": "has_duration",
    "Form": "has_form",
    "ADE": "has_ade",
    "Reason": "has_reason",
}


def extract_triples(
    mentions: DataFrame,
    id_col: str = "doc_id",
    subj_tag: str = "Drug",
    sent_col: str = "sent_id",
) -> DataFrame:
    """mentions(id, sent_id, tag, start, end, text) ->
    triples(id, subj struct<tag,start,end,text>, pred, obj struct<...>).

    Each non-subject mention pairs with the nearest subject mention in the
    same sentence (ties break to the earlier drug — deterministic).
    """
    subj = mentions.filter(F.col("tag") == subj_tag).select(
        id_col, sent_col,
        F.struct("tag", "start", "end", "text").alias("subj"),
        F.col("start").alias("s_start"),
    )
    obj = mentions.filter(
        F.col("tag").isin(list(PRED_FOR_TAG))
    ).select(
        id_col, sent_col, "tag",
        F.struct("tag", "start", "end", "text").alias("obj"),
        F.col("start").alias("o_start"),
    )
    paired = obj.join(subj, [id_col, sent_col])
    dist = F.abs(F.col("o_start") - F.col("s_start"))
    w = Window.partitionBy(id_col, sent_col, "o_start", "tag").orderBy(
        dist.asc(), F.col("s_start").asc()
    )
    pred = F.element_at(
        F.create_map(*[F.lit(x) for kv in PRED_FOR_TAG.items() for x in kv]),
        F.col("tag"),
    )
    return (
        paired.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "subj", pred.alias("pred"), "obj")
    )


def triples_to_brat_lines(triples: DataFrame, mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize R-lines: number mentions T1..Tn per doc in (start, end)
    order (annotations.py:105 / W5), then format
    `R{n}\\t{pred} Arg1:T{subj} Arg2:T{obj}` (add_rel_to_brat.py:154)."""
    wnum = Window.partitionBy(id_col).orderBy("start", "end")
    numbered = (
        mentions.select(id_col, "start", "end").distinct()
        .withColumn("t_num", F.row_number().over(wnum))
    )
    t1 = numbered.select(
        F.col(id_col).alias("_id1"),
        F.col("start").alias("s1"), F.col("end").alias("e1"),
        F.col("t_num").alias("subj_t"),
    )
    t2 = numbered.select(
        F.col(id_col).alias("_id2"),
        F.col("start").alias("s2"), F.col("end").alias("e2"),
        F.col("t_num").alias("obj_t"),
    )
    flat = triples.select(
        id_col, "pred",
        F.col("subj.start").alias("ss"), F.col("subj.end").alias("se"),
        F.col("obj.start").alias("os"), F.col("obj.end").alias("oe"),
    )
    j = (
        flat.join(t1, (flat[id_col] == t1["_id1"]) & (flat["ss"] == t1["s1"]) & (flat["se"] == t1["e1"]))
        .join(t2, (flat[id_col] == t2["_id2"]) & (flat["os"] == t2["s2"]) & (flat["oe"] == t2["e2"]))
    )
    wr = Window.partitionBy(id_col).orderBy("subj_t", "obj_t", "pred")
    return j.withColumn("r_num", F.row_number().over(wr)).select(
        id_col,
        F.format_string("R%d\t%s Arg1:T%d Arg2:T%d",
                        F.col("r_num"), F.col("pred"),
                        F.col("subj_t"), F.col("obj_t")).alias("line"),
    )
