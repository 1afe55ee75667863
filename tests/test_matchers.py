"""UnitOverlayer-port (W7) and phrase-gazetteer (J8) semantics tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from medacy_spark.operators.matchers import unit_spans, unit_token_flags
from medacy_spark.operators.mentions import gazetteer_mentions, lexicon_overlay
from medacy_spark.operators.tokenize import tokenize_native


def _toks(spark, text):
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return tokenize_native(docs)


def _fams(spark, text):
    return sorted(
        (r["family"], r["text"])
        for r in unit_spans(_toks(spark, text)).collect()
    )


def test_unit_spans_all_matches_not_longest_only(spark):
    """spaCy Matcher returns every match: '6 days' inside 'in 6 days',
    'num ml' inside 'num ml / hour' (unit_component.py patterns overlap by
    construction)."""
    got = _fams(spark, "infusion at 9 ml / hour in 6 days")
    assert ("duration_pattern", "in 6 days") in got
    assert ("duration_pattern", "6 days") in got
    assert ("measurement", "9 ml") in got
    assert ("measurement", "9 ml / hour") in got
    assert ("measurement_unit", "ml / hour") in got
    assert ("volume_unit", "ml") in got
    assert ("time_unit", "hour") in got


def test_unit_spans_reference_dead_patterns(spark):
    """{'LOWER': 'IV'} (route) and {'POS': 'PREP'} (duration) can never
    fire in the reference — replicated: 'iv'/'IV' are not route matches,
    and a preposition other than literal 'in' starts no duration."""
    assert _fams(spark, "given IV now") == []
    assert _fams(spark, "given iv now") == []
    got = _fams(spark, "for 3 weeks")
    # 'for' is a PREP but only the literal-'in' 3-token variant is live
    assert ("duration_pattern", "3 weeks") in got
    assert ("duration_pattern", "for 3 weeks") not in got
    got_in = _fams(spark, "in 3 weeks")
    assert ("duration_pattern", "in 3 weeks") in got_in


def test_unit_spans_orth_case_sensitivity(spark):
    """ORTH patterns are case-sensitive: mEq/dL/L match only those exact
    spellings; LOWER patterns match any casing."""
    got_meq = _fams(spark, "40 mEq given")
    assert ("mass_unit", "mEq") in got_meq and ("measurement", "40 mEq") in got_meq
    assert _fams(spark, "40 meq given") == []  # wrong case: no match at all
    assert ("volume_unit", "L") in _fams(spark, "2 L bolus")
    assert ("volume_unit", "l") not in _fams(spark, "2 l bolus")
    # LOWER 'kg' matches uppercase too
    assert ("mass_unit", "KG") in _fams(spark, "70 KG male")


def test_unit_spans_lemma_plural_approximation(spark):
    """LEMMA patterns ('tablet', 'pill', ...) match regular plurals via the
    strip-one-s approximation."""
    got = _fams(spark, "two tablets po")
    assert ("form_unit", "tablets") in got
    got2 = _fams(spark, "3 puffs inhalation")
    assert ("form_unit", "puffs") in got2
    assert ("measurement", "3 puffs") in got2
    assert ("route_type", "inhalation") in got2


def test_unit_token_flags_phrase_membership(spark):
    """Every token inside a matched multi-word span carries the family
    flag (lexicon/unit components set flags per token in span)."""
    fl = unit_token_flags(_toks(spark, "take once a day by mouth as needed"))
    rows = {r["word"]: r for r in fl.collect()}
    for w in ("once", "a", "day"):
        assert rows[w]["feature_is_frequency_indicator"], w
    for w in ("by", "mouth"):
        assert rows[w]["feature_is_route_type"], w
    for w in ("as", "needed"):
        assert rows[w]["feature_is_frequency_indicator"], w
    assert not rows["take"]["feature_is_frequency_indicator"]
    # 'day' is also a time unit (the families overlap in the reference too)
    assert rows["day"]["feature_is_time_unit"]


def test_gazetteer_ngram_matches_and_crosses_sentences(spark):
    """max_ngram is consumed: bigram + contained unigram both match (all
    matches, not longest-only); matches may cross a sentence boundary
    (PhraseMatcher runs on the whole Doc)."""
    toks = _toks(spark, "took coated aspirin . aspirin helps")
    gaz = spark.createDataFrame(
        [("Drug", "coated aspirin"), ("Drug", "aspirin"), ("X", "aspirin . aspirin")],
        "label string, term string",
    )
    got = sorted(
        (r["tag"], r["start"], r["text"])
        for r in gazetteer_mentions(toks, gaz, max_ngram=3).collect()
    )
    assert ("Drug", 5, "coated aspirin") in got
    assert ("Drug", 12, "aspirin") in got
    assert ("Drug", 22, "aspirin") in got
    assert ("X", 12, "aspirin . aspirin") in got  # crosses the boundary


def test_gazetteer_unigram_path_unchanged(spark):
    """max_ngram=1 (the default) keeps the original single-token shape."""
    toks = _toks(spark, "aspirin and warfarin")
    gaz = spark.createDataFrame(
        [("Drug", "aspirin"), ("Drug", "warfarin")], "label string, term string"
    )
    got = sorted(
        (r["tag"], r["start"], r["end"], r["text"])
        for r in gazetteer_mentions(toks, gaz).collect()
    )
    assert got == [("Drug", 0, 7, "aspirin"), ("Drug", 12, 20, "warfarin")]


def test_lexicon_overlay_flags_every_token_in_span(spark):
    """feature_is_<label>_from_lexicon is set on EVERY token of a matched
    phrase (lexicon_component.py:44-52), one boolean column per label."""
    toks = _toks(spark, "extended release metformin helps nausea")
    gaz = spark.createDataFrame(
        [("Drug", "extended release metformin"), ("ADE", "nausea")],
        "label string, term string",
    )
    out = lexicon_overlay(toks, gaz, max_ngram=3)
    rows = {r["word"]: r for r in out.collect()}
    for w in ("extended", "release", "metformin"):
        assert rows[w]["feature_is_Drug_from_lexicon"], w
        assert not rows[w]["feature_is_ADE_from_lexicon"], w
    assert rows["nausea"]["feature_is_ADE_from_lexicon"]
    assert not rows["helps"]["feature_is_Drug_from_lexicon"]


def test_phrase_gazetteer_plan_broadcasts(spark, doc_ids):
    """J8 plan gate: the n-gram phrase join stays a BroadcastHashJoin (no
    SortMergeJoin) and plans no cartesian product."""
    from medacy_spark.corpus import lexicons as lex
    from medacy_spark.corpus.synth import rx_documents

    toks = tokenize_native(rx_documents(doc_ids))
    gaz = spark.createDataFrame(
        [("Drug", t) for t in lex.DRUGS + lex.PHRASE_DRUGS],
        "label string, term string",
    )
    m = gazetteer_mentions(toks, gaz, max_ngram=3)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_unit_spans_single_window_pass(spark, doc_ids):
    """W7 plan gate: the whole matcher stack is ONE window pass over the
    doc partition — exactly one Window node, no join, no extra exchange
    beyond the tokenizer's."""
    from medacy_spark.corpus.synth import rx_documents

    toks = tokenize_native(rx_documents(doc_ids))
    s = unit_spans(toks)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") <= 2  # tokenizer's running sums + matcher leads
    assert "Join" not in plan


def test_lexicon_overlay_on_filtered_stream(spark):
    """Covered-token flags use the match's ACTUAL source positions, so a
    filtered (non-dense-pos) token stream flags the right rows."""
    toks = _toks(spark, "took the coated aspirin now")
    # drop 'the' (pos 1): the stream keeps original pos values with a gap
    filtered = toks.filter(F.col("word") != "the")
    gaz = spark.createDataFrame(
        [("Drug", "coated aspirin")], "label string, term string"
    )
    out = lexicon_overlay(filtered, gaz, max_ngram=2)
    flags = {r["word"]: r["feature_is_Drug_from_lexicon"] for r in out.collect()}
    assert flags == {"took": False, "coated": True, "aspirin": True, "now": False}
    # and a pos-less stream fails loudly, not silently
    import pytest

    with pytest.raises(ValueError, match="pos"):
        lexicon_overlay(filtered.drop("pos"), gaz)


def test_unit_token_flags_preserves_caller_underscore_columns(spark):
    """Only the exact internal neighborhood columns are dropped — caller
    columns like _label survive the flag pass."""
    toks = _toks(spark, "5 mg now").withColumn("_label", F.lit("keep"))
    out = unit_token_flags(toks)
    assert "_label" in out.columns
    assert all(r["_label"] == "keep" for r in out.collect())
