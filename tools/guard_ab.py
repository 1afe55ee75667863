"""Guard-on/off A/B at the 100k-doc dedup measurement (VERDICT r5 #1).

Replicates bench.py's `dedup_docs_per_sec_100k` path (same web-entropy
generator, same dedup_corpus topology) under three plans:

  * guard-on  — dedup_corpus as shipped (max_bucket_size=1000, mark_hot)
  * guard-off — identical topology, max_bucket_size=None (no detection
                pass, plain min_bands filter)

Best-of-N timed passes after one full-size untimed warm pass, identical
protocol to bench.py; prints one JSON line. Run alone on an idle host
(CLAUDE.md: never run Spark work concurrently with measurements).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession, functions as F

# ONE benchmark-corpus definition across the dedup tools: guard_ab runs
# the megacluster-free slice (mega=0) of dedup_scale's generator, so a
# change there moves both tools' BENCH.md numbers together
from dedup_scale import web_docs as _scale_web_docs

from medacy_spark.operators.dedup import dedup_corpus, minhash_lsh_candidates
from medacy_spark.operators.graph import connected_components

web_docs = functools.partial(_scale_web_docs, mega=0)


def dedup_unguarded(df):
    """dedup_corpus body with the hot-bucket guard disabled."""
    pairs = minhash_lsh_candidates(df, max_bucket_size=None).filter(
        F.col("n_bands") >= 2
    )
    comp = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    victims = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return df.join(victims, "doc_id", "left_anti")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
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
    variants = {"guard_on": dedup_corpus, "guard_off": dedup_unguarded}
    out = {"n_docs": n, "trials": trials}
    for name, fn in variants.items():
        fn(web_docs(spark, 2000)).count()          # codegen warm-up
        fn(web_docs(spark, n)).count()             # full-size untimed warm pass
        walls, rate = [], 0.0
        for _ in range(trials):
            t0 = time.monotonic()
            survivors = fn(web_docs(spark, n)).count()
            w = time.monotonic() - t0
            walls.append(round(w, 3))
            rate = max(rate, round(n / w, 1))
            assert survivors <= n - n // 200 + 1
        out[name] = {"walls": walls, "best_docs_per_sec": rate}
    spark.stop()
    on, off = out["guard_on"]["best_docs_per_sec"], out["guard_off"]["best_docs_per_sec"]
    out["guard_overhead_pct"] = round((off / on - 1) * 100, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
