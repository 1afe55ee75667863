"""MetaMap JSON cache source (S5) — normalize + schema-first nested read.

The reference shells out to the MetaMap binary, converts its XML to a
nested dict (metamap.py:113-152) and caches per-doc JSON; candidate
extraction then tree-searches by key (``_item_generator``,
metamap.py:154-163) because xmltodict collapses single-element lists into
plain dicts (the 350-377 pathology) and stores all numbers as strings.

Our pipeline splits that into two clean stages:

  1. ``normalize_metamap_json`` — an Arrow-batched pandas UDF that
     canonicalizes the known repeating nodes (MMO, Utterance, Phrase,
     Mapping, Candidate, SemType, ConceptPI) from dict-or-list to list.
     This is the single unavoidable Python crossing (per-doc JSON tree).
  2. ``from_json`` with a strict nested schema + a pure explode chain down
     MMOs.MMO[].Utterances.Utterance[].Phrases.Phrase[].Mappings.Mapping[]
     .MappingCandidates.Candidate[] — no UDF, no tree search; span =
     [StartPos, StartPos+Length) (F16, metamap.py:237-253).

Files under 200 bytes are corrupt per the reference (dataset.py:150-155,
metamap.py:435-438) and surface as a `corrupt` flag for the retry loop.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CANDIDATE = T.StructType([
    T.StructField("CandidateCUI", T.StringType()),
    T.StructField("CandidateMatched", T.StringType()),
    T.StructField("CandidateScore", T.StringType()),
    T.StructField("SemTypes", T.StructType([
        T.StructField("SemType", T.ArrayType(T.StringType())),
    ])),
    T.StructField("ConceptPIs", T.StructType([
        T.StructField("ConceptPI", T.ArrayType(T.StructType([
            T.StructField("StartPos", T.StringType()),
            T.StructField("Length", T.StringType()),
        ]))),
    ])),
])

METAMAP_SCHEMA = T.StructType([
    T.StructField("metamap", T.StructType([
        T.StructField("MMOs", T.StructType([
            T.StructField("MMO", T.ArrayType(T.StructType([
                T.StructField("Utterances", T.StructType([
                    T.StructField("Utterance", T.ArrayType(T.StructType([
                        T.StructField("Phrases", T.StructType([
                            T.StructField("Phrase", T.ArrayType(T.StructType([
                                T.StructField("Mappings", T.StructType([
                                    T.StructField("Mapping", T.ArrayType(T.StructType([
                                        T.StructField("MappingCandidates", T.StructType([
                                            T.StructField("Candidate", T.ArrayType(_CANDIDATE)),
                                        ])),
                                    ]))),
                                ])),
                            ]))),
                        ])),
                    ]))),
                ])),
            ]))),
        ])),
    ])),
])

# (parent-key path suffix, child key) pairs that repeat: dict -> [dict]
_LISTIFY = {
    "MMOs": "MMO",
    "Utterances": "Utterance",
    "Phrases": "Phrase",
    "Mappings": "Mapping",
    "MappingCandidates": "Candidate",
    "SemTypes": "SemType",
    "ConceptPIs": "ConceptPI",
}


def _canon(node):
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k in _LISTIFY:
                child = _LISTIFY[k]
                inner = v.get(child) if isinstance(v, dict) else None
                if inner is not None and not isinstance(inner, list):
                    v = {**v, child: [inner]}
            out[k] = _canon(v)
        return out
    if isinstance(node, list):
        return [_canon(x) for x in node]
    return node


@F.pandas_udf(T.StringType())
def normalize_metamap_json(raw: pd.Series) -> pd.Series:
    def norm(s: str) -> str:
        try:
            return json.dumps(_canon(json.loads(s)))
        except Exception:
            return "{}"
    return raw.map(norm)


def read_metamap_json(spark: SparkSession, path: str) -> DataFrame:
    """Read per-doc .metamapped JSON files -> (doc_key, mm struct, corrupt)."""
    raw = spark.read.text(path, wholetext=True).select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.metamapped$", 1).alias("doc_key"),
        F.col("value").alias("raw"),
    )
    return raw.select(
        "doc_key",
        F.from_json(normalize_metamap_json("raw"), METAMAP_SCHEMA).alias("mm"),
        (F.length("raw") < 200).alias("corrupt"),
    )


def candidates(parsed: DataFrame) -> DataFrame:
    """-> (doc_key, cui, matched, score, sem_types, start, end): one row per
    (candidate, concept span). Pure explode chain — no UDF, no tree search."""
    mmo = parsed.filter(~F.col("corrupt")).select(
        "doc_key", F.explode_outer("mm.metamap.MMOs.MMO").alias("o")
    )
    utt = mmo.select("doc_key", F.explode_outer("o.Utterances.Utterance").alias("u"))
    ph = utt.select("doc_key", F.explode_outer("u.Phrases.Phrase").alias("p"))
    mp = ph.select("doc_key", F.explode_outer("p.Mappings.Mapping").alias("m"))
    cand = mp.select(
        "doc_key", F.explode_outer("m.MappingCandidates.Candidate").alias("c")
    ).filter(F.col("c").isNotNull())
    return cand.select(
        "doc_key",
        F.col("c.CandidateCUI").alias("cui"),
        F.col("c.CandidateMatched").alias("matched"),
        F.col("c.CandidateScore").cast("long").alias("score"),
        F.col("c.SemTypes.SemType").alias("sem_types"),
        F.explode_outer("c.ConceptPIs.ConceptPI").alias("pi"),
    ).select(
        "doc_key", "cui", "matched", "score", "sem_types",
        F.col("pi.StartPos").cast("long").alias("start"),
        (F.col("pi.StartPos").cast("long") + F.col("pi.Length").cast("long")).alias("end"),
    )
