"""Corpus-level boilerplate line removal (boilerplate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from medacy_spark.operators.boilerplate import (
    boilerplate_line_keys,
    remove_boilerplate_lines,
)

BANNER = "subscribe today"


def _corpus(spark, n=12):
    # every doc: unique first line, the banner, a short frequent 'ok'
    # line, a unique last line; doc 0 carries a space-padded banner
    rows = []
    for i in range(n):
        pad = "  " if i == 0 else ""
        rows.append(
            (i, f"alpha unique {i}\n{pad}{BANNER}\nok\nomega unique {i}")
        )
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_planted_banner_removed_short_line_survives(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            _corpus(spark), min_docs=5, min_line_chars=8
        ).collect()
    }
    assert len(out) == 12
    for i, r in out.items():
        assert r["n_lines"] == 4
        assert r["n_boiler"] == 1
        # banner gone (padded variant included via the trimmed key), the
        # short frequent 'ok' line and original order preserved
        assert r["clean_text"] == f"alpha unique {i}\nok\nomega unique {i}"
        pad = 2 if i == 0 else 0
        assert r["chars_removed"] == len(BANNER) + pad + 1  # + separator
        assert 0.0 < r["frac_chars_removed"] < 1.0


def test_below_min_docs_kept(spark):
    docs = spark.createDataFrame(
        [(i, f"unique line {i}\nrare repeated line") for i in range(3)],
        ["doc_id", "text"],
    )
    out = remove_boilerplate_lines(docs, min_docs=5, min_line_chars=8)
    assert out.agg(F.sum("n_boiler")).first()[0] == 0
    assert out.agg(F.sum("chars_removed")).first()[0] == 0


def test_repeats_within_one_doc_count_once(spark):
    # the same line 10x inside ONE doc is df=1, not df=10
    docs = spark.createDataFrame(
        [(0, "\n".join(["repeated inner line"] * 10)), (1, "other text here")],
        ["doc_id", "text"],
    )
    assert boilerplate_line_keys(docs, min_docs=2, min_line_chars=8).count() == 0
    out = remove_boilerplate_lines(docs, min_docs=2, min_line_chars=8)
    assert out.agg(F.sum("n_boiler")).first()[0] == 0


def test_all_lines_removed_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [(i, BANNER) for i in range(6)] + [(100, "")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            docs, min_docs=5, min_line_chars=8
        ).collect()
    }
    assert out[0]["clean_text"] == "" and out[0]["n_boiler"] == 1
    assert out[0]["frac_chars_removed"] == 1.0
    assert out[100]["n_lines"] == 1 and out[100]["n_boiler"] == 0
    assert out[100]["clean_text"] == ""
    assert out[100]["frac_chars_removed"] == 0.0  # 0-length guard


def test_hash_key_matches_exact_key_and_shuffle_fallback(spark):
    docs = _corpus(spark, n=9)
    base = remove_boilerplate_lines(
        docs, min_docs=5, key_hash=None
    ).orderBy("doc_id").collect()
    for kw in (
        {"key_hash": "xxhash64"},
        {"key_hash": "md5"},
        # counted-threshold fallback: force the shuffle equi-join path
        {"key_hash": "xxhash64", "broadcast_max_lines": 0},
    ):
        got = remove_boilerplate_lines(docs, min_docs=5, **kw).orderBy(
            "doc_id"
        ).collect()
        assert got == base
