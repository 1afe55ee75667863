"""End-to-end KG pipeline: detection P/R vs gold, model path parity,
relation extraction, linking, KG materialization."""

from __future__ import annotations

from pyspark.sql import functions as F

from medacy_spark.corpus.synth import clinical_documents, gold_mentions, gold_triples
from medacy_spark.operators.mentions import detect_mentions, gazetteer_df
from medacy_spark.operators.ner_model import RuleModel, model_mentions
from medacy_spark.operators.relations import extract_triples, triples_to_brat_lines
from medacy_spark.operators.scoring import measures
from medacy_spark.operators.tokenize import tokenize_native


def _mentions(spark, doc_ids):
    docs = clinical_documents(doc_ids).select("doc_id", "text")
    toks = tokenize_native(docs)
    return detect_mentions(toks, gazetteer_df(spark))


def test_detection_pr_meets_north_rule(spark, doc_ids):
    """P/R ≥ 0.95 required; on the clean corpus the rule stack is exact."""
    m = _mentions(spark, doc_ids).select("doc_id", "tag", "start", "end", "text")
    gold = gold_mentions(doc_ids)
    row = measures(gold, m, mode="strict").filter("tag='system'").collect()[0]
    p = row["tp"] / (row["tp"] + row["fp"])
    r = row["tp"] / (row["tp"] + row["fn"])
    assert p >= 0.95 and r >= 0.95
    assert (p, r) == (1.0, 1.0)


def test_triples_match_gold(spark, doc_ids):
    m = _mentions(spark, doc_ids)
    tri = extract_triples(m)
    gold = gold_triples(doc_ids)
    assert tri.exceptAll(gold).count() == 0
    assert gold.exceptAll(tri).count() == 0


def test_model_path_equals_rule_path(spark, doc_ids):
    """X2 (broadcast model via mapInPandas) produces the same mentions as
    the pure-DataFrame rule stack."""
    docs = clinical_documents(doc_ids).select("doc_id", "text").limit(2000)
    toks = tokenize_native(docs)
    bc = spark.sparkContext.broadcast(RuleModel())
    a = model_mentions(toks, bc).select("doc_id", "tag", "start", "end", "text")
    b = detect_mentions(toks, gazetteer_df(spark)).select(
        "doc_id", "tag", "start", "end", "text"
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_brat_r_lines(spark, doc_ids):
    small = doc_ids.filter("doc_id < 20")
    m = _mentions(spark, small)
    tri = extract_triples(m)
    lines = triples_to_brat_lines(tri, m)
    assert lines.count() == tri.count()
    sample = lines.orderBy("doc_id", "line").first()["line"]
    assert sample.startswith("R1\t") and "Arg1:T" in sample and "Arg2:T" in sample


def test_linking_and_kg(spark, doc_ids):
    from medacy_spark.operators.graph import materialize_nodes_edges
    from medacy_spark.operators.linking import cui_dictionary, link_mentions

    small = doc_ids.filter("doc_id < 100")
    m = _mentions(spark, small)
    links = link_mentions(m, cui_dictionary(spark))
    # every Drug/ADE/Route mention must link (they come from the dictionary)
    drugs = m.filter(F.col("tag").isin("Drug", "ADE", "Route"))
    assert links.count() == drugs.count()
    tri = extract_triples(m)
    nodes, edges = materialize_nodes_edges(links, tri)
    assert nodes.count() > 0 and edges.count() > 0
    # canonicalization: tylenol and acetaminophen share CUI C100000 → any
    # node containing 'tylenol' canonicalizes to the concept component
    tyl = nodes.filter(F.array_contains("names", "tylenol")).collect()
    if tyl:
        assert tyl[0]["canonical_id"].startswith("c:")


def test_filter_semantic_types_subset_semantics(spark):
    """get_term_by_semantic_type parity (metamap.py:206-235): subset
    containment both ways, include/exclude overlap raises, empty-type rows
    always skipped."""
    import pytest

    from medacy_spark.operators.linking import filter_semantic_types

    links = spark.createDataFrame(
        [
            (1, ["T1", "T2"]),        # include subset -> kept
            (2, ["T2", "T9"]),        # missing T1 -> dropped by include
            (3, ["T1", "T2", "T3"]),  # exclude {T3} fully present -> dropped
            (4, []),                  # @Count == 0 -> always dropped
        ],
        "id long, sem_types array<string>",
    )
    got = filter_semantic_types(links, include=("T1", "T2"), exclude=("T3",))
    assert [r["id"] for r in got.collect()] == [1]

    # exclude needs ALL its types present: T3+T4 exclude keeps row 3
    got2 = filter_semantic_types(links, include=("T1",), exclude=("T3", "T4"))
    assert sorted(r["id"] for r in got2.collect()) == [1, 3]

    # empty include keeps everything not excluded (and non-empty-typed)
    got3 = filter_semantic_types(links, include=(), exclude=("T9",))
    assert sorted(r["id"] for r in got3.collect()) == [1, 3]

    with pytest.raises(ValueError, match="Include and exclude overlap"):
        filter_semantic_types(links, include=("T1",), exclude=("T1", "T2"))

    # exclude=[] (not None) drops EVERY row: set([]) <= found_types is
    # vacuously true in the reference's `set(exclude) <= set(found_types)`
    # continue branch — only the None default skips the exclusion pass
    assert filter_semantic_types(links, include=(), exclude=()).count() == 0
    assert sorted(
        r["id"] for r in filter_semantic_types(links, include=(), exclude=None).collect()
    ) == [1, 2, 3]
