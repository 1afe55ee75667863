"""Scaling measurement for the training-prep surface (north-rule
two-parallelism evidence): sequence packing, n-gram LM train+score, and
BPE induction over the same deterministic synthetic corpus at two core
counts. Run each level in its OWN process:

    python tools/trainprep_scaling.py <op> <cores> [n_docs]

op ∈ {pack, lm, bpe}. Never run Spark work concurrently; bracket with
tools/cpu_calibrate.py per BENCH.md discipline (best-of-3 inside).

The corpus is hash-derived with a Zipf-ish word skew (square-of-hash
concentrates word ids on small residues, vocab ≤ 20k) — so the LM
count tables and BPE pair stats see hub words, not a uniform toy; each
doc is 100 words.
"""

from __future__ import annotations

import json
import sys
import time


def _docs(spark, n_docs: int):
    from pyspark.sql import functions as F

    word = F.concat(
        F.lit("w"),
        F.pmod(
            F.pmod(F.xxhash64(F.col("doc_id"), F.col("i")), F.lit(1000))
            * F.pmod(F.xxhash64(F.col("i"), F.col("doc_id")), F.lit(1000)),
            F.lit(20000),
        ).cast("string"),
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.sequence(F.lit(1), F.lit(100))).alias("i"),
        )
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list(word)).alias("text"))
        .localCheckpoint()  # exclude synth cost from the measurement
    )


def main() -> None:
    op, cores = sys.argv[1], int(sys.argv[2])
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000
    sys.path.insert(0, ".")
    from medacy_spark.session import get_spark

    spark = get_spark(app_name=f"trainprep_{op}_{cores}", cores=cores)
    docs = _docs(spark, n_docs)
    docs.count()

    def run_pack():
        from medacy_spark.operators.packing import pack_sequences

        pack_sequences(docs, 2048, bucket_width=100_000).count()

    def run_lm():
        from medacy_spark.operators.lm import score_perplexity, train_ngram_lm

        model = train_ngram_lm(docs, n=2, k=0.1)
        score_perplexity(docs, model).count()

    def run_bpe():
        from medacy_spark.operators.bpe import learn_bpe

        learn_bpe(docs, n_merges=8).vocab.count()

    fn = {"pack": run_pack, "lm": run_lm, "bpe": run_bpe}[op]
    fn()  # warm-up (codegen + shuffle infra)
    best = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    print(json.dumps({
        "op": op, "cores": cores, "n_docs": n_docs,
        "wall_sec": round(best, 2),
        "docs_per_sec": round(n_docs / best),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
