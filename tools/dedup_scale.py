"""10x dedup scale demonstration (VERDICT r5 #8): dedup_corpus at 100k
and 1M docs with a PLANTED megacluster, so the hot-bucket star guard
actually fires at the larger scale where an unguarded all-pairs band
join would emit O(k^2 * bands) candidate edges from one bucket.

Corpus = bench.py's web-entropy generator (60 words from a 16k vocab,
0.5% planted exact dups) PLUS a near-identical megacluster: the first
``mega`` ids share 59 of 60 words (only the trailing token varies), so
they collide in every minhash band. With mega=5000 the unguarded join
would plan ~5000^2/2 * 8 = 1e8 candidate rows from that bucket alone;
the star guard emits ~5000 * 8.

Reports per scale: wall time (best of N), docs/sec, survivor count,
candidate-edge count (minhash_lsh_candidates, counted separately —
untimed), and the guard log lines. One JSON line at the end.

Run alone on an idle host (never concurrent with other Spark work).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

from medacy_spark.operators.dedup import dedup_corpus, minhash_lsh_candidates


def web_docs(spark, n, mega=5000):
    base = F.when(F.col("id") % 200 == 1, F.col("id") - 1).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(base, i), F.lit(16384)).cast("string")
        ),
    )
    entropy = F.array_join(words, " ")
    mega_text = F.concat(
        F.lit(" ".join(f"m{j}" for j in range(59)) + " t"),
        F.col("id").cast("string"),
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < mega, mega_text).otherwise(entropy).alias("text"),
    )


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__()
        self.lines = []

    def emit(self, record):
        self.lines.append(record.getMessage())


def main():
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    mega = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.local.dir", "/dev/shm/spark-tmp")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cap = _Capture()
    logging.getLogger("medacy_spark.operators.dedup").addHandler(cap)

    out = {"mega": mega, "trials": trials, "scales": {}}
    dedup_corpus(web_docs(spark, 2000, mega=0)).count()  # codegen warm-up
    for n in (100_000, 1_000_000):
        dedup_corpus(web_docs(spark, n, mega)).count()  # untimed warm pass
        walls, survivors = [], None
        for _ in range(trials):
            cap.lines.clear()
            t0 = time.monotonic()
            survivors = dedup_corpus(web_docs(spark, n, mega)).count()
            walls.append(round(time.monotonic() - t0, 3))
        edges = minhash_lsh_candidates(web_docs(spark, n, mega)).count()
        # expected survivors: megacluster collapses to 1, the entropy
        # tail loses its 0.5% planted exact dups (ids ≡ 1 mod 200).
        # false_merges counts extra removals beyond that — chance LSH
        # collisions passing min_bands=2 without exact verification
        # (162/1M under the old correlated linear permutation family;
        # independent per-permutation hashes (dedup.perm_hash) bring it
        # to ~0, and verify_threshold kills all). Negative values are
        # megacluster escapes (false NEGATIVES) — the other failure mode
        # the linear families exhibited.
        expected = (n - mega) - (n - mega) // 200 + 1
        false_merges = expected - survivors
        assert -2 <= false_merges <= n // 1000, (survivors, expected)
        out["scales"][str(n)] = {
            "walls": walls,
            "best_docs_per_sec": round(n / min(walls), 1),
            "survivors": survivors,
            "expected_survivors": expected,
            "false_merges": false_merges,
            "candidate_edges": edges,
            "guard_log": sorted(set(cap.lines)),
        }
    spark.stop()
    r100, r1m = (out["scales"]["100000"]["best_docs_per_sec"],
                 out["scales"]["1000000"]["best_docs_per_sec"])
    out["per_doc_cost_ratio_1m_vs_100k"] = round(r100 / r1m, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
