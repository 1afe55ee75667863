"""Scaling measurement for the distributed-SVD embedding path
(embeddings_train.train_word_vectors_distributed): same synthetic corpus
at two core counts, reporting wall and N->4N efficiency. Run each level
in its OWN process (python tools/svd_scaling.py <cores> [n_docs]
[iters]); never run Spark work concurrently, and bracket with
tools/cpu_calibrate.py per BENCH.md discipline.

The corpus is web-entropy-ish: 2k-word vocabulary, 40-token sentences,
deterministic hash-derived words — dense enough that the per-iteration
matmuls (nnz*k join rows) dominate the fixed job overhead.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    vocab_n = int(sys.argv[4]) if len(sys.argv) > 4 else 2_000
    sys.path.insert(0, ".")
    from pyspark.sql import functions as F

    from medacy_spark.operators.embeddings_train import (
        train_word_vectors_distributed,
    )
    from medacy_spark.session import get_spark

    spark = get_spark(app_name="svd_scaling", cores=cores)
    d = F.col("doc_id")
    words = F.transform(
        F.sequence(F.lit(0), F.lit(39)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(d, i), F.lit(vocab_n)).cast("string")
        ),
    )
    toks = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", F.posexplode(words).alias("tok_id", "word"))
        .withColumn("sent_id", F.lit(0))
        .localCheckpoint()  # exclude synth cost from the measurement
    )
    # warm-up at a fraction of the size (codegen + shuffle infra)
    train_word_vectors_distributed(
        toks.filter(d < n_docs // 10), dim=16, window=3, iters=2
    )
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        vocab, vecs = train_word_vectors_distributed(
            toks, dim=16, window=3, iters=iters
        )
        best = min(best, time.monotonic() - t0)
    print(json.dumps({
        "cores": cores, "n_docs": n_docs, "iters": iters,
        "vocab_param": vocab_n,
        "vocab": len(vocab), "dim": int(vecs.shape[1]),
        "wall_sec": round(best, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
