"""Materialize the clinical_rule_tokens oracle fixture.

The spaCy-2.2 affix loop (functions/clinical_tokens.py) is not
SQL-expressible, but its output is deterministic — so the DuckDB oracle
for the `clinical_rule_tokens` contract query reads this checked-in
parquet instead of recomputing. One row per token of every documents
slice (doc_id < 50) at each testdata scale factor, tagged with a
signature of the input slice (count + sum(doc_id*length(text))) so the
oracle selects the rows matching whatever `documents` view it is run
against; an unknown input slice selects ZERO rows and fails the row-count
compare loudly.

Re-run after ANY tokenizer rule change (same policy as the _PMC_PINS in
tests/test_tokenize.py):

    python tools/make_token_fixture.py
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from medacy_spark.functions.clinical_tokens import sentence_starts, tokenize_with_offsets

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "clinical_rule_tokens.parquet")


def main() -> None:
    con = duckdb.connect()
    cols: dict[str, list] = {
        "sig_n": [], "sig_s": [], "doc_id": [], "pos": [], "sent_id": [],
        "tok_id": [], "idx": [], "end_idx": [], "word": [],
    }
    for d in SF_DIRS:
        rows = con.execute(
            "SELECT doc_id, text, "
            " (SELECT count(*) FROM read_parquet(?) WHERE doc_id < 50),"
            " (SELECT sum(doc_id*length(text)) FROM read_parquet(?) WHERE doc_id < 50)"
            f" FROM read_parquet(?) WHERE doc_id < 50 ORDER BY doc_id",
            [f"{d}/documents.parquet"] * 3,
        ).fetchall()
        for doc_id, text, sig_n, sig_s in rows:
            toks = tokenize_with_offsets(text)
            starts = sentence_starts([w for _, _, w in toks])
            sent, tok = -1, 0
            for pos, (s, e, w) in enumerate(toks):
                if starts[pos]:
                    sent += 1
                    tok = 0
                cols["sig_n"].append(sig_n)
                cols["sig_s"].append(sig_s)
                cols["doc_id"].append(doc_id)
                cols["pos"].append(pos)
                cols["sent_id"].append(sent)
                cols["tok_id"].append(tok)
                cols["idx"].append(s)
                cols["end_idx"].append(e)
                cols["word"].append(w)
                tok += 1
        if not rows:
            print(f"{d}: no documents with doc_id < 50 — skipped")
            continue
        print(f"{d}: sig_s={rows[0][3]}  (cumulative rows: {len(cols['doc_id'])})")
    table = pa.table({
        "sig_n": pa.array(cols["sig_n"], pa.int64()),
        "sig_s": pa.array(cols["sig_s"], pa.int64()),
        "doc_id": pa.array(cols["doc_id"], pa.int64()),
        "pos": pa.array(cols["pos"], pa.int32()),
        "sent_id": pa.array(cols["sent_id"], pa.int32()),
        "tok_id": pa.array(cols["tok_id"], pa.int32()),
        "idx": pa.array(cols["idx"], pa.int64()),
        "end_idx": pa.array(cols["end_idx"], pa.int64()),
        "word": pa.array(cols["word"], pa.string()),
    })
    os.makedirs(os.path.dirname(os.path.abspath(OUT)), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {len(cols['doc_id'])} rows -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
