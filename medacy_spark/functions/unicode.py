"""Unicode→ASCII conversion with offset maps + span re-adjustment (F5/F6).

The reference converts documents to ASCII before MetaMap (multi-char
replacements shift every downstream offset) and records a diff table so
candidate spans on the ASCII text can be restored onto the original text
(metamap.py:276-317 convert, 319-409 restore; static ~1500-entry map in
tools/unicode_to_ascii.py).

Here the conversion is an Arrow-batched UDF emitting (ascii_text,
diffs array<struct<pos, orig_len, new_len>>) — ``pos`` is the char offset
in the ORIGINAL text. Span restoration is then pure column arithmetic
(aggregate over the diff array), exactly the "span fix-up = arithmetic on
offsets" discipline of SURVEY §2.8 F5. NFD-strip fallback covers
characters outside the explicit map (F6, nn/vectorizer.py:133-146).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# explicit multi-char replacements (reference unicode_to_ascii.py style)
ASCII_MAP = {
    "‘": "'", "’": "'", "“": '"', "”": '"',
    "–": "-", "—": "--", "…": "...",
    "½": "1/2", "¼": "1/4", "¾": "3/4",
    "µ": "u", "μ": "u",  # micro sign → 'u' (µg → ug)
    "×": "x", "°": " degrees ",
    "®": "(R)", "™": "(TM)",
}

DIFF_SCHEMA = T.StructType([
    T.StructField("ascii_text", T.StringType()),
    T.StructField("diffs", T.ArrayType(T.StructType([
        T.StructField("pos", T.LongType()),       # offset in original text
        T.StructField("orig_len", T.LongType()),
        T.StructField("new_len", T.LongType()),
    ]))),
])


def _convert(text: str) -> tuple[str, list[tuple[int, int, int]]]:
    out: list[str] = []
    diffs: list[tuple[int, int, int]] = []
    for i, ch in enumerate(text):
        if ord(ch) < 128:
            out.append(ch)
            continue
        rep = ASCII_MAP.get(ch)
        if rep is None:
            # NFD-strip to printable ASCII (F6); may drop the char entirely
            rep = "".join(
                c for c in unicodedata.normalize("NFD", ch) if ord(c) < 128
            )
        out.append(rep)
        if len(rep) != 1:
            diffs.append((i, 1, len(rep)))
    return "".join(out), diffs


@F.pandas_udf(DIFF_SCHEMA)
def to_ascii_with_map(text: pd.Series) -> pd.DataFrame:
    res = text.map(_convert)
    return pd.DataFrame({
        "ascii_text": res.map(lambda t: t[0]),
        "diffs": res.map(lambda t: [
            {"pos": p, "orig_len": o, "new_len": n} for p, o, n in t[1]
        ]),
    })


def restore_offset(ascii_offset: Column, diffs: Column) -> Column:
    """Map a char offset on the ASCII text back to the original text.

    ascii_pos(orig) = orig + Σ_{p_i < orig} (new_len_i − orig_len_i); this
    inverts it by folding the (pos-ascending) diff array with state
    (cumulative shift, resolved result): a target after a replacement
    accumulates its delta; a target inside one snaps to the replacement's
    original start. Pure `aggregate` expression — no Python.
    """
    a = ascii_offset.cast("long")
    init = F.struct(
        F.lit(0).cast("long").alias("shift"),
        F.lit(None).cast("long").alias("res"),
    )

    def step(st, d):
        ap = d["pos"] + st["shift"]                     # ascii start of diff
        delta = d["new_len"] - d["orig_len"]
        after = a >= ap + d["new_len"]
        inside = (a >= ap) & ~after
        return F.struct(
            F.when(st["res"].isNotNull() | ~after, st["shift"])
            .otherwise(st["shift"] + delta).alias("shift"),
            F.when(st["res"].isNotNull(), st["res"])
            .when(inside, d["pos"])
            .otherwise(F.lit(None).cast("long")).alias("res"),
        )

    return F.aggregate(
        diffs, init, step, lambda st: F.coalesce(st["res"], a - st["shift"])
    ).cast("long")
