"""Property-based differential tests: the Spark matcher stack vs an
independent in-Python model of the unit_component.py pattern semantics,
over hypothesis-generated token streams (case variants, numbers, slashes,
phrase fragments in random order)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from medacy_spark.operators import matchers as mt
from medacy_spark.operators.matchers import unit_spans
from medacy_spark.operators.mentions import gazetteer_mentions
from medacy_spark.operators.tokenize import tokenize_native

_NUM = re.compile(r"^\d+(\.\d+)?$")


def _is(fam, w):
    l = w.lower()  # noqa: E741
    if fam == "mass":
        return l in mt.MASS_LOWER or w in mt.MASS_ORTH
    if fam == "volume":
        return l in mt.VOLUME_LOWER or w in mt.VOLUME_ORTH
    if fam == "time":
        return l in mt.TIME_LOWER
    if fam == "form":
        return (
            w in mt.FORM_ORTH
            or re.sub("s$", "", l) in mt.FORM_LEMMA
            or l in mt.FORM_LOWER
        )
    if fam == "route":
        return (
            l in mt.ROUTE_LOWER
            or w in mt.ROUTE_ORTH
            or re.sub("s$", "", l) in mt.ROUTE_LEMMA
        )
    if fam == "freq":
        return l in mt.FREQ_LOWER
    raise KeyError(fam)


def py_unit_spans(words):
    """Independent model of every matcher family (reference pattern lists,
    all matches, original token space). Returns {(family, start, end, text)}."""
    offs = []
    o = 0
    for w in words:
        offs.append((o, o + len(w)))
        o += len(w) + 1
    out = set()

    def emit(fam, i, j):  # tokens i..j inclusive
        out.add((fam, offs[i][0], offs[j][1], " ".join(words[i : j + 1])))

    n = len(words)
    for i, w in enumerate(words):
        l = w.lower()  # noqa: E741
        for fam, name in (
            ("mass", "mass_unit"), ("volume", "volume_unit"),
            ("time", "time_unit"), ("form", "form_unit"),
            ("route", "route_type"), ("freq", "frequency_indicator"),
        ):
            if _is(fam, w):
                emit(name, i, i)
        if l == "prn":
            emit("duration_pattern", i, i)
        if i + 1 < n:
            nx = words[i + 1]
            if l == "as" and nx.lower() == "needed":
                emit("frequency_indicator", i, i + 1)
            if l == "by" and nx.lower() == "mouth":
                emit("route_type", i, i + 1)
            if l == "mucous" and nx.lower() == "membrane":
                emit("route_type", i, i + 1)
            if _NUM.match(w):
                if nx == "%":
                    emit("measurement", i, i + 1)
                for fam in ("mass", "volume", "form"):
                    if _is(fam, nx):
                        emit("measurement", i, i + 1)
                if _is("time", nx):
                    emit("duration_pattern", i, i + 1)
        if i + 2 < n:
            a, b = words[i + 1], words[i + 2]
            if l in ("once", "twice") and a.lower() == "a" and b.lower() == "day":
                emit("frequency_indicator", i, i + 2)
            if a == "/":
                if (
                    (_is("mass", w) and _is("volume", b))
                    or (_is("volume", w) and _is("time", b))
                    or (_is("form", w) and _is("volume", b))
                ):
                    emit("measurement_unit", i, i + 2)
            if _NUM.match(w) and a.lower() == "x" and _is("form", b):
                emit("measurement", i, i + 2)
            if l == "in" and _NUM.match(a) and _is("time", b):
                emit("duration_pattern", i, i + 2)
        if i + 3 < n:
            a, b, c = words[i + 1], words[i + 2], words[i + 3]
            if _NUM.match(w) and b == "/":
                if (
                    (_is("mass", a) and _is("volume", c))
                    or (_is("volume", a) and _is("time", c))
                    or (_is("form", a) and _is("volume", c))
                ):
                    emit("measurement", i, i + 3)
    return out


_TOKENS = (
    ["mg", "mEq", "meq", "ml", "dL", "L", "l", "cc", "kg", "KG", "g"]
    + ["hour", "days", "day", "week", "min"]
    + ["tablet", "tablets", "pill", "dose", "puff", "puffs"]
    + ["po", "IV", "iv", "oral", "gtt", "injection", "by", "mouth", "mucous", "membrane"]
    + ["prn", "bid", "daily", "as", "needed", "once", "twice", "a"]
    + ["/", "%", "x", "in", ".", "5", "12", "2.5", "200"]
    + ["patient", "took", "apply", "gave", "now"]
)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_TOKENS), min_size=1, max_size=14),
        min_size=1,
        max_size=12,
    )
)
def test_unit_spans_matches_python_model(spark, docs_tokens):
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_tokens)],
        "doc_id long, text string",
    )
    got = {}
    for r in unit_spans(tokenize_native(docs)).collect():
        got.setdefault(r["doc_id"], set()).add(
            (r["family"], r["start"], r["end"], r["text"])
        )
    for i, ws in enumerate(docs_tokens):
        assert got.get(i, set()) == py_unit_spans(ws), (i, ws)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["coated", "aspirin", "insulin", "glargine",
                             "warfarin", "took", "now", "."]),
            min_size=1, max_size=10,
        ),
        min_size=1, max_size=10,
    )
)
def test_gazetteer_ngrams_match_python_scan(spark, docs_tokens):
    terms = ["aspirin", "warfarin", "coated aspirin", "insulin glargine",
             "took coated aspirin"]
    gaz = spark.createDataFrame([("Drug", t) for t in terms],
                                "label string, term string")
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_tokens)],
        "doc_id long, text string",
    )
    got = {}
    for r in gazetteer_mentions(tokenize_native(docs), gaz, max_ngram=3).collect():
        got.setdefault(r["doc_id"], set()).add((r["start"], r["end"], r["text"]))
    term_set = set(terms)
    for i, ws in enumerate(docs_tokens):
        offs, o = [], 0
        for w in ws:
            offs.append((o, o + len(w)))
            o += len(w) + 1
        want = set()
        for a in range(len(ws)):
            for n in (1, 2, 3):
                if a + n <= len(ws):
                    surface = " ".join(ws[a : a + n])
                    if surface.lower() in term_set:
                        want.add((offs[a][0], offs[a + n - 1][1], surface))
        assert got.get(i, set()) == want, (i, ws)
