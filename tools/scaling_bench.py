"""Two-cluster-size scaling evidence (north rule).

No real cluster exists in this sandbox, so the N→4N executor criterion is
evidenced by running the SAME job at two parallelism levels on identical
input and reporting docs/sec at both plus the scaling efficiency
(T_small / T_large) · (small / large). Measured pairs: local[2]→local[8]
(primary — inside the turbo envelope) and local[4]→local[16] (read against
the pure-CPU hardware ceiling from tools/cpu_calibrate.py); see BENCH.md.

The job is the full KG pipeline: corpus synth (Spark-native) → html
extract → tokenize → mention detection → triple extraction → count.
Session startup and first-job codegen are excluded via a warm-up pass;
the measured run re-executes the whole pipeline from the doc-id spine.

Usage: python tools/scaling_bench.py <cores> <n_docs> [trials]
(prints one JSON line; best-of-trials is the headline number — the sandbox
host is noisy/turbo-variable, so min is the least-interference estimate)
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from medacy_spark.corpus.synth import clinical_documents
    from medacy_spark.functions.html import extract_text_expr
    from medacy_spark.operators.mentions import detect_mentions, gazetteer_df
    from medacy_spark.operators.relations import extract_triples
    from medacy_spark.operators.tokenize import tokenize_native
    from medacy_spark.session import get_spark

    import os as _os

    extra = {
        # a real N-core executor gets ~N GC threads; without this the JVM
        # sizes GC to the 32-cpu machine and the small config borrows
        # cores it wouldn't have on a cluster
        "spark.driver.extraJavaOptions": (
            f"-XX:ParallelGCThreads={max(cores, 2)} -XX:ConcGCThreads={max(cores // 4, 1)}"
        ),
    }
    if _os.environ.get("SPARK_GRAFT_NO_AQE"):
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark(app_name=f"scaling_{cores}", cores=cores, extra_conf=extra)

    def pipeline(n: int) -> int:
        # NO repartition: spark.range's range-partitioning already satisfies
        # every doc-keyed distribution downstream, so the whole pipeline
        # plans with ZERO shuffle exchanges; a round-robin repartition here
        # would destroy that property and re-introduce 4+ shuffles
        ids = spark.range(n, numPartitions=4 * cores).withColumnRenamed("id", "doc_id")
        docs = clinical_documents(ids)
        texts = docs.select("doc_id", extract_text_expr(F.col("html")).alias("text"))
        toks = tokenize_native(texts)
        mentions = detect_mentions(toks, gazetteer_df(spark))
        return extract_triples(mentions).count()

    # warm-up: codegen + JIT (a full-size pass — C2 needs the volume)
    pipeline(2000)
    n_triples = pipeline(n_docs)
    walls = []
    for _ in range(trials):
        t0 = time.monotonic()
        pipeline(n_docs)
        walls.append(round(time.monotonic() - t0, 2))
    best = min(walls)
    print(json.dumps({
        "cores": cores,
        "n_docs": n_docs,
        "n_triples": n_triples,
        "wall_sec_trials": walls,
        "wall_sec_best": best,
        "docs_per_sec": round(n_docs / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
