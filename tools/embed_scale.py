"""Two-cluster-size scaling evidence for the embedding-pretraining
operator (north rule, same methodology as tools/scaling_bench.py): the
SAME co-occurrence+PPMI job at two parallelism levels on identical
input; report docs/sec at both plus efficiency
(T_small / T_large) · (small / large).

The job is the corpus-scale half of count-based word2vec
(operators/embeddings_train): text → split/posexplode → ±5-window
lead/lag pass → (word, ctx) count → PPMI over broadcast marginals.
Corpus = web-entropy docs (60 words/doc) over a 2,048-word vocab, so
the count table tops out at vocab² ≈ 4.2M rows — the demo stresses the
part that must scale (the windowed corpus pass + map-side-combined
count) while the localCheckpointed count table stays model-scale,
which is exactly the operator's design claim.

Usage: python tools/embed_scale.py <cores> <n_docs> [trials]
(one JSON line; best-of-trials — the sandbox host is noisy/turbo-variable,
min is the least-interference estimate. Run alone on an idle host.)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

VOCAB = 2048
WORDS_PER_DOC = 60


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from medacy_spark.operators.embeddings_train import cooccurrence_pairs, ppmi
    from medacy_spark.session import get_spark

    extra = {
        # size GC to the simulated core count (see scaling_bench.py)
        "spark.driver.extraJavaOptions": (
            f"-XX:ParallelGCThreads={max(cores, 2)} "
            f"-XX:ConcGCThreads={max(cores // 4, 1)}"
        ),
    }
    spark = get_spark(app_name=f"embed_scale_{cores}", cores=cores, extra_conf=extra)

    def docs(n: int):
        words = F.transform(
            F.sequence(F.lit(1), F.lit(WORDS_PER_DOC)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(VOCAB)).cast("string"),
            ),
        )
        # FIXED split count, independent of cores: on a real cluster the
        # input splits are data-determined and identical at both cluster
        # sizes. Tying splits to cores (scaling_bench's 4*cores is fine
        # there — its pipeline is shuffle-free) distorts THIS job: with a
        # saturated vocab² key space every map task emits the full 4.19M-
        # pair combine table, so more/smaller map tasks = strictly more
        # shuffle rows — the 8-core config was shuffling 4x the data of
        # the 2-core config (measured: eff 0.75-0.77 with 4*cores splits).
        return spark.range(n, numPartitions=32).select(
            F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text")
        )

    def job(n: int) -> int:
        toks = docs(n).select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        out = ppmi(
            cooccurrence_pairs(toks, window=5, id_cols=("doc_id",), order_col="pos")
        )
        return out.count()

    job(2000)  # warm-up: codegen + JIT
    n_pairs = job(n_docs)
    walls = []
    for _ in range(trials):
        t0 = time.monotonic()
        job(n_docs)
        walls.append(round(time.monotonic() - t0, 2))
    best = min(walls)
    print(json.dumps({
        "cores": cores,
        "n_docs": n_docs,
        "n_ppmi_pairs": n_pairs,
        "walls_s": walls,
        "best_s": best,
        "docs_per_sec": round(n_docs / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
