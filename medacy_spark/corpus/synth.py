"""Deterministic synthetic clinical web corpus (Spark-native, seed-free).

Every value is pure arithmetic over ``doc_id`` — no RNG, no wall clock — so
the corpus is bit-reproducible at any scale and the gold mentions/triples
are known *by construction* (the FIXTURES.md contract). This stands in for
the reference's sample_dataset_1 fixtures
(medacy/tests/sample_data/sample_dataset_1/) recast as tables, and for the
north-rule input shape (url, warc_ts, html, text, lang).

Sentence templates embed Drug/Dose/Route/Frequency/Duration/ADE mentions
drawn from the unit_component.py:61-172 vocabularies (see lexicons.py), e.g.

    patient was prescribed tylenol 500 mg po bid .
    patient was prescribed metformin 250 mg orally daily for 5 days .
    patient developed rash after taking aspirin .

Generation is fully distributed: a doc_id spine → explode sentences →
explode tokens; offsets come from a window running-sum; the document text is
re-assembled with concat_ws. At 10^12 docs this generator is itself a valid
Spark job (the spine can be ``spark.range``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from medacy_spark.corpus import lexicons as lex
from medacy_spark.functions.html import wrap_html_expr
from medacy_spark.operators.sequence import island_merge

OUTSIDE = "O"

PRED_FOR_TAG = {
    "Dose": "has_dosage",
    "Route": "has_route",
    "Frequency": "has_frequency",
    "Duration": "has_duration",
    "Form": "has_form",
    "ADE": "has_ade",
}


def _pick(arr: list[str], h: Column) -> Column:
    """Deterministic element pick: arr[h mod len(arr)]."""
    return F.element_at(
        F.array(*[F.lit(x) for x in arr]), (F.pmod(h, F.lit(len(arr))) + 1).cast("int")
    )


def clinical_token_stream(doc_ids: DataFrame) -> DataFrame:
    """doc_ids(doc_id long) -> (doc_id, sent_id, pos, word, role, start, end).

    Roles are the gold labels per token ('O' outside). Offsets assume tokens
    joined by single spaces (the corpus contract).
    """
    d = F.col("doc_id")
    sents = doc_ids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.pmod(d, F.lit(3)).cast("int"))).alias("sent_id"),
    )
    h = (d * 131 + F.col("sent_id") * 17).cast("long")
    kind = F.pmod(h, F.lit(4))

    drug = _pick(lex.DRUGS, h + 1)
    num = (F.pmod(h * 7 + 3, F.lit(99)) * 5 + 5).cast("string")
    unit = _pick(lex.DOSE_UNITS, h + 2)
    route = _pick(lex.ROUTES, h + 3)
    freq = _pick(lex.FREQUENCIES, h + 4)
    dnum = (F.pmod(h + 5, F.lit(9)) + 2).cast("string")
    timeunit = _pick(lex.TIME_UNITS, h + 6)
    ade = _pick(lex.ADES, h + 7)
    drug_b = _pick(lex.DRUGS, h + 8)
    num_b = (F.pmod(h * 11 + 7, F.lit(99)) * 5 + 5).cast("string")
    unit_b = _pick(lex.DOSE_UNITS, h + 9)

    def sent(words: list[Column | str], roles: list[str]) -> Column:
        ws = [F.lit(w) if isinstance(w, str) else w for w in words]
        return F.arrays_zip(
            F.array(*ws).alias("word"),
            F.array(*[F.lit(r) for r in roles]).alias("role"),
        )

    s0 = sent(
        ["patient", "was", "prescribed", drug, num, unit, route, freq, "."],
        [OUTSIDE, OUTSIDE, OUTSIDE, "Drug", "Dose", "Dose", "Route", "Frequency", OUTSIDE],
    )
    s1 = sent(
        ["patient", "was", "prescribed", drug, num, unit, route, freq, "for", dnum, timeunit, "."],
        [OUTSIDE, OUTSIDE, OUTSIDE, "Drug", "Dose", "Dose", "Route", "Frequency",
         OUTSIDE, "Duration", "Duration", OUTSIDE],
    )
    s2 = sent(
        ["patient", "developed", ade, "after", "taking", drug, "."],
        [OUTSIDE, OUTSIDE, "ADE", OUTSIDE, OUTSIDE, "Drug", OUTSIDE],
    )
    # two-drug sentence: nearest-subject assignment is data-dependent (the
    # first dose may sit closer to the second drug than to its own)
    s3 = sent(
        ["patient", "was", "prescribed", drug, num, unit, "and",
         drug_b, num_b, unit_b, route, freq, "."],
        [OUTSIDE, OUTSIDE, OUTSIDE, "Drug", "Dose", "Dose", OUTSIDE,
         "Drug", "Dose", "Dose", "Route", "Frequency", OUTSIDE],
    )

    toks = sents.select(
        "doc_id",
        "sent_id",
        F.posexplode(
            F.when(kind == 0, s0).when(kind == 1, s1).when(kind == 2, s2).otherwise(s3)
        ).alias("pos", "tok"),
    ).select(
        "doc_id", "sent_id", "pos",
        F.col("tok.word").alias("word"),
        F.col("tok.role").alias("role"),
    )

    w = Window.partitionBy("doc_id").orderBy("sent_id", "pos")
    start = F.coalesce(
        F.sum(F.length("word") + 1).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    ).cast("long")
    return toks.withColumn("start", start).withColumn(
        "end", (F.col("start") + F.length("word")).cast("long")
    )


def _sent_words_expr(doc_id: Column, sent_id: Column) -> Column:
    """Array of words for one sentence — the same template arithmetic as
    clinical_token_stream, as a pure expression (no explode)."""
    h = (doc_id * 131 + sent_id * 17).cast("long")
    kind = F.pmod(h, F.lit(4))
    drug = _pick(lex.DRUGS, h + 1)
    num = (F.pmod(h * 7 + 3, F.lit(99)) * 5 + 5).cast("string")
    unit = _pick(lex.DOSE_UNITS, h + 2)
    route = _pick(lex.ROUTES, h + 3)
    freq = _pick(lex.FREQUENCIES, h + 4)
    dnum = (F.pmod(h + 5, F.lit(9)) + 2).cast("string")
    timeunit = _pick(lex.TIME_UNITS, h + 6)
    ade = _pick(lex.ADES, h + 7)
    drug_b = _pick(lex.DRUGS, h + 8)
    num_b = (F.pmod(h * 11 + 7, F.lit(99)) * 5 + 5).cast("string")
    unit_b = _pick(lex.DOSE_UNITS, h + 9)
    s0 = F.array(
        F.lit("patient"), F.lit("was"), F.lit("prescribed"),
        drug, num, unit, route, freq, F.lit("."),
    )
    s1 = F.array(
        F.lit("patient"), F.lit("was"), F.lit("prescribed"),
        drug, num, unit, route, freq, F.lit("for"), dnum, timeunit, F.lit("."),
    )
    s2 = F.array(
        F.lit("patient"), F.lit("developed"), ade,
        F.lit("after"), F.lit("taking"), drug, F.lit("."),
    )
    s3 = F.array(
        F.lit("patient"), F.lit("was"), F.lit("prescribed"),
        drug, num, unit, F.lit("and"), drug_b, num_b, unit_b, route, freq, F.lit("."),
    )
    return F.when(kind == 0, s0).when(kind == 1, s1).when(kind == 2, s2).otherwise(s3)


def clinical_documents(doc_ids: DataFrame) -> DataFrame:
    """-> documents(doc_id, url, warc_ts, html, text, lang) in the
    BASELINE.json input_hint shape. Host assignment is deliberately skewed
    (half the corpus on host 0) to exercise salted repartitioning.

    SHUFFLE-FREE: the document text is a pure array expression over doc_id
    (transform over the sentence range → flatten → array_join) — no
    explode/groupBy round-trip, so corpus generation is map-only and the
    generator itself scales linearly to any doc count. Byte-identical to
    concat'ing clinical_token_stream (tested)."""
    d = F.col("doc_id")
    text_expr = F.array_join(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), F.pmod(d, F.lit(3)).cast("int")),
                lambda s: _sent_words_expr(d, s.cast("long")),
            )
        ),
        " ",
    )
    text = doc_ids.select("doc_id", text_expr.alias("text"))
    host_idx = F.when(F.pmod(d, F.lit(2 * len(lex.HOSTS))) < len(lex.HOSTS), F.lit(0)).otherwise(
        F.pmod(d, F.lit(len(lex.HOSTS))).cast("int")
    )
    url = F.concat(
        F.lit("https://"), _pick(lex.HOSTS, host_idx), F.lit("/doc/"), d.cast("string")
    )
    warc_ts = F.timestamp_seconds(F.lit(1704067200) + d * 7)
    return text.select(
        "doc_id",
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        wrap_html_expr(F.col("text")).alias("html"),
        "text",
        F.lit("en").alias("lang"),
    )


def rx_documents(doc_ids: DataFrame) -> DataFrame:
    """Deterministic prescription-style corpus exercising every
    UnitOverlayer matcher family (unit_component.py:61-172) and multi-word
    phrase matching (lexicon_component.py:37): compound units (mass/volume,
    volume/time), percent and num-x-form measurements, 2-/3-token
    frequency ("as needed", "once a day", "twice a day") and route
    ("by mouth", "mucous membrane") phrases, 3-token durations
    ("in N days"), and 2-/3-word drug names.

    One single-space sentence per doc (kind = doc_id % 4); pure arithmetic
    over doc_id, map-only like clinical_documents. Kept SEPARATE from the
    clinical corpus so its sha-pinned templates (tests/test_determinism.py)
    stay untouched."""
    d = F.col("doc_id")
    h = (d * 193).cast("long")
    kind = F.pmod(d, F.lit(4))
    ph = _pick(lex.PHRASE_DRUGS, h + 1)
    dr = _pick(lex.DRUGS, h + 2)
    n1 = (F.pmod(h * 3 + 11, F.lit(97)) + 1).cast("string")
    n2 = (F.pmod(h * 5 + 13, F.lit(97)) + 1).cast("string")
    n3 = (F.pmod(h, F.lit(9)) + 2).cast("string")
    n4 = (F.pmod(h, F.lit(6)) + 1).cast("string")
    n5 = F.pmod(h, F.lit(100)).cast("string")
    sp = F.lit(" ")
    t0 = F.concat(
        F.lit("patient took "), ph, sp, n1, F.lit(" mg / ml by mouth as needed .")
    )
    t1 = F.concat(
        F.lit("infusion of "), ph, F.lit(" at "), n2,
        F.lit(" ml / hour in "), n3, F.lit(" days ."),
    )
    t2 = F.concat(F.lit("apply "), n4, F.lit(" x tablet once a day prn ."))
    t3 = F.concat(
        F.lit("level fell "), n5, F.lit(" % after "), dr,
        F.lit(" via mucous membrane twice a day ."),
    )
    text = F.when(kind == 0, t0).when(kind == 1, t1).when(kind == 2, t2).otherwise(t3)
    return doc_ids.select("doc_id", text.alias("text"))


def gold_mentions(doc_ids: DataFrame) -> DataFrame:
    """-> (doc_id, tag, start, end, text): the EntTuple relation
    (annotations.py:8), multi-token roles merged by island_merge (W2)."""
    toks = clinical_token_stream(doc_ids)
    return island_merge(
        toks,
        part_cols=["doc_id", "sent_id"],
        order_cols=["pos"],
        label_col="role",
        text_col="word",
    ).select("doc_id", "tag", "start", "end", "text")


def gold_triples(doc_ids: DataFrame) -> DataFrame:
    """-> (doc_id, subj struct, pred, obj struct): each attribute mention
    pairs with its NEAREST co-sentence Drug (the extraction semantics,
    shared via operators.relations.extract_triples — assignment correctness
    against independent offset arithmetic is proven by the clinical_triples
    DuckDB oracle in contract.py)."""
    from medacy_spark.operators.relations import extract_triples

    toks = clinical_token_stream(doc_ids)
    m = island_merge(
        toks,
        part_cols=["doc_id", "sent_id"],
        order_cols=["pos"],
        label_col="role",
        text_col="word",
    ).select("doc_id", "sent_id", "tag", "start", "end", "text")
    return extract_triples(m)


def pos_sentences() -> tuple[list, list]:
    """Deterministic synthetic POS corpus with genuine context ambiguity:
    'increased' is ADJ in 'the increased dose' but VERB in 'was
    increased' — resolvable only from context, which the rule tagger's
    per-token CASE chain cannot see. Returns (train, held_out).

    Slot fillers come from a mixed-radix counter, so the 90 training
    sentences are 90 DISTINCT combinations, and the held-out split scans
    the counter past the training range skipping any word-sequence that
    appeared in training — held-out sentences are genuinely unseen
    combinations of seen vocabulary, asserted disjoint here (the round-6
    review found the previous index arithmetic had period 6, making
    'held-out' verbatim training duplicates). Shared by the pretrained
    artifact builder (tools/make_pos_fixture.py), the trained_pos_tags
    contract oracle, and the quality-gate tests."""
    adjs = ["red", "large", "small", "increased", "oral", "slow"]
    nouns = ["dose", "patient", "tablet", "infusion", "level", "doctor"]
    verbs = ["increased", "gave", "took", "measured", "reduced", "checked"]
    advs = ["daily", "slowly", "often"]

    def sent(k):
        a, n1 = adjs[k % 6], nouns[(k // 6) % 6]
        v, n2 = verbs[(k // 36) % 6], nouns[(k // 2) % 6]
        # (k // 3) decouples the adverb slot from the template selector
        # t = k % 3 below: with d = advs[k % 3], only template t==1 emits
        # the adverb and d aliased to advs[1] — 'daily' and 'often' never
        # appeared anywhere, collapsing ADV to one word type (r6 advice)
        d = advs[(k // 3) % 3]
        t = k % 3
        if t == 0:
            return ["the", a, n1, "was", v], ["DET", "ADJ", "NOUN", "AUX", "VERB"]
        if t == 1:
            return [n1, v, "the", n2, d], ["NOUN", "VERB", "DET", "NOUN", "ADV"]
        return ["a", n1, v, a, n2], ["DET", "NOUN", "VERB", "ADJ", "NOUN"]

    train = [sent(k) for k in range(90)]
    seen = {tuple(w) for w, _ in train}
    held_out: list = []
    k = 90
    while len(held_out) < 30:
        words, tags = sent(k)
        if tuple(words) not in seen:
            held_out.append((words, tags))
        k += 1
    assert not {tuple(w) for w, _ in held_out} & seen
    return train, held_out


def boundary_sentences() -> tuple[list, list]:
    """Deterministic synthetic B/I sentence-boundary corpus: each doc has
    an abbreviation '.' that must NOT open a sentence and a real boundary
    that must — the distinction the '.'-rule cannot represent. Returns
    (train, held_out); same mixed-radix/disjointness construction as
    pos_sentences (the previous arithmetic had period 12 — 'held-out'
    was verbatim training duplicates). Shared by the pretrained artifact
    builder and the quality-gate tests."""
    abbrevs = ["dr", "mg", "vs", "approx"]
    nouns = ["smith", "jones", "dose", "level", "patient", "value"]
    verbs = ["rose", "fell", "stayed", "changed"]

    def doc(k):
        a, n1 = abbrevs[k % 4], nouns[(k // 4) % 6]
        v, n2 = verbs[(k // 2) % 4], nouns[(k // 8) % 6]
        words = [a, ".", n1, v, ".", "then", n2, v, "."]
        bi = ["B", "I", "I", "I", "I", "B", "I", "I", "I"]
        return words, bi

    train = [doc(k) for k in range(24)]
    seen = {tuple(w) for w, _ in train}
    held_out: list = []
    k = 24
    while len(held_out) < 12:
        words, bi = doc(k)
        if tuple(words) not in seen:
            held_out.append((words, bi))
        k += 1
    assert not {tuple(w) for w, _ in held_out} & seen
    return train, held_out
