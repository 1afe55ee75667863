"""Materialize the trained-POS artifacts and the trained_pos_tags oracle
fixture (VERDICT r5 #5: ship the trainable boundary/POS models as
loadable artifacts).

Artifacts (plain S7 pickle via model.save_artifact):
  * tests/fixtures/pos_tagger.pkl     — averaged perceptron trained on
    corpus.synth.pos_sentences()[0] (deterministic, seed-free: the
    learner is deterministic by construction)
  * tests/fixtures/boundary_model.pkl — B/I boundary perceptron trained
    on corpus.synth.boundary_sentences()[0]

Oracle fixture (tests/fixtures/trained_pos_tags.parquet): the pinned
predictions of the POS artifact over the clinical-rule-token fixture's
sentences — a trained perceptron's Viterbi is not SQL-expressible, but
its output on a fixed corpus is deterministic, so the DuckDB oracle for
the `trained_pos_tags` contract query reads this parquet (same policy
and sig-column scheme as tools/make_token_fixture.py). The driver's
check then verifies Spark's distributed broadcast-Arrow scoring equals
the pinned driver-side Viterbi, token by token.

Re-run after ANY change to the perceptron learner, the POS training
corpus, or the clinical tokenizer (regenerate the token fixture FIRST):

    python tools/make_token_fixture.py && python tools/make_pos_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq

from medacy_spark.corpus.synth import boundary_sentences, pos_sentences
from medacy_spark.model import save_artifact
from medacy_spark.operators.features import train_pos_tagger
from medacy_spark.operators.tokenize import train_sentence_boundary

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
TOKEN_FIXTURE = os.path.join(FIXTURES, "clinical_rule_tokens.parquet")
OUT = os.path.join(FIXTURES, "trained_pos_tags.parquet")


def main() -> None:
    tagger = train_pos_tagger(pos_sentences()[0], epochs=5)
    save_artifact(tagger, os.path.join(FIXTURES, "pos_tagger.pkl"))
    boundary = train_sentence_boundary(boundary_sentences()[0], epochs=8)
    save_artifact(boundary, os.path.join(FIXTURES, "boundary_model.pkl"))
    print("wrote pos_tagger.pkl, boundary_model.pkl")

    toks = pq.read_table(TOKEN_FIXTURE).to_pylist()
    # group into sentences per (input-slice signature, doc, sent)
    sents: dict[tuple, list] = {}
    for r in toks:
        sents.setdefault(
            (r["sig_n"], r["sig_s"], r["doc_id"], r["sent_id"]), []
        ).append(r)
    cols: dict[str, list] = {
        "sig_n": [], "sig_s": [], "doc_id": [], "sent_id": [], "tok_id": [],
        "word": [], "pos_": [],
    }
    for key in sorted(sents):
        rows = sorted(sents[key], key=lambda r: r["tok_id"])
        words = [r["word"] for r in rows]
        tags = tagger([words])[0]
        for r, tag in zip(rows, tags):
            cols["sig_n"].append(r["sig_n"])
            cols["sig_s"].append(r["sig_s"])
            cols["doc_id"].append(r["doc_id"])
            cols["sent_id"].append(r["sent_id"])
            cols["tok_id"].append(r["tok_id"])
            cols["word"].append(r["word"])
            cols["pos_"].append(tag)
    table = pa.table({
        "sig_n": pa.array(cols["sig_n"], pa.int64()),
        "sig_s": pa.array(cols["sig_s"], pa.int64()),
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        "sent_id": pa.array(cols["sent_id"], pa.int32()),
        "tok_id": pa.array(cols["tok_id"], pa.int32()),
        "word": pa.array(cols["word"], pa.string()),
        "pos_": pa.array(cols["pos_"], pa.string()),
    })
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {len(cols['doc_id'])} rows -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
