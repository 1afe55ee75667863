"""Regenerate PLANS.md — formatted physical plans of the headline operators,
the artifact backing BENCH.md's plan-shape claims.

CAUTION: PLANS.md also carries sections appended manually by later
rounds (incremental dedup, term_canon, pagerank, temporal, …) that
this tool does not regenerate — diff before overwriting, and re-append
anything the generator does not know about."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from medacy_spark import contract
    from medacy_spark.corpus.synth import clinical_documents
    from medacy_spark.functions.html import extract_text_expr
    from medacy_spark.operators.mentions import detect_mentions, gazetteer_df
    from medacy_spark.operators.relations import extract_triples
    from medacy_spark.operators.tokenize import tokenize_native
    from medacy_spark.session import get_spark

    spark = get_spark(cores=8)
    sections = []

    ids = spark.range(1000).withColumnRenamed("id", "doc_id")
    docs = clinical_documents(ids)
    texts = docs.select("doc_id", extract_text_expr(F.col("html")).alias("text"))
    tri = extract_triples(detect_mentions(tokenize_native(texts), gazetteer_df(spark)))
    sections.append((
        "Full KG pipeline from a range spine",
        "ZERO shuffle exchanges (only the gazetteer BroadcastExchange), ONE "
        "sort feeding all windows — the plan BENCH.md's scaling numbers run.",
        plan_of(tri),
    ))

    m = contract.QUERIES["measures_strict"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Strict scorer (measures_strict)",
        "Pure DataFrame: window sums + hash aggregates + one sort-merge on "
        "the mention key; no Python eval nodes anywhere.",
        plan_of(m),
    ))

    lj = contract.QUERIES["lenient_intersection"](spark, "/root/testdata/sf0.001")
    sections.append((
        "Lenient containment join (J5)",
        "Equi-join on (doc, tag) with the leniency-window θ-post-filter; "
        "doc key bounds the cross product.",
        plan_of(lj),
    ))

    from medacy_spark.corpus import lexicons as lex
    from medacy_spark.corpus.synth import rx_documents
    from medacy_spark.operators.matchers import unit_spans
    from medacy_spark.operators.mentions import gazetteer_mentions

    rx_toks = tokenize_native(rx_documents(ids))
    gaz = spark.createDataFrame(
        [("Drug", t) for t in lex.DRUGS + lex.PHRASE_DRUGS],
        "label string, term string",
    )
    pm = gazetteer_mentions(rx_toks, gaz, max_ngram=3)
    sections.append((
        "Phrase gazetteer n-gram join (J8, round 4)",
        "Candidate n-grams from ONE lead() window (explode factor = distinct "
        "term lengths in the gazetteer, here 3) + BroadcastHashJoin — no "
        "SortMergeJoin, no extra exchange beyond the tokenizer's.",
        plan_of(pm),
    ))

    us = unit_spans(rx_toks)
    sections.append((
        "Full unit-matcher stack (W7, round 4)",
        "All 9 UnitOverlayer pattern families in ONE window pass (lead/lag "
        "neighborhood) + array-explode: zero joins, zero extra exchanges.",
        plan_of(us),
    ))

    from medacy_spark.operators.lm import score_perplexity, train_ngram_lm
    from medacy_spark.operators.packing import pack_sequences

    web = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pk = pack_sequences(web.select("doc_id", "text"), 64, bucket_width=100)
    sections.append((
        "Sequence packing (round 7)",
        "Two-level distributed prefix sum: the windowed offsets relation is "
        "checkpointed AQE-off so BOTH consumers read one ExistingRDD with "
        "its hashpartitioning(_bkt) layout preserved — the only downstream "
        "exchanges are the bucket-count-scale SinglePartition window and "
        "the broadcast; the (doc → seq) fan-out is a narrow explode.",
        plan_of(pk),
    ))

    lm_model = train_ngram_lm(web, n=2)
    lm_model.gram_counts.count()
    sc = score_perplexity(web, lm_model)
    sections.append((
        "n-gram LM scoring (round 7)",
        "Gram explode + left joins against the materialized (ExistingRDD) "
        "model tables + one per-doc partial agg; the model sides are left "
        "declarative so AQE broadcasts them when min_count keeps the model "
        "executor-resident.",
        plan_of(sc),
    ))

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("# PLANS — physical plans of the headline operators\n\n")
        f.write("Regenerate with `python tools/dump_plans.py`.\n\n")
        for title, note, plan in sections:
            f.write(f"## {title}\n\n{note}\n\n```\n{plan}\n```\n\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
