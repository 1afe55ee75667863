"""Measured skew demonstration: hot-host corpus, by-host partitioning vs
plans/skew.salted_repartition.

Web corpora are Zipf-skewed by host; partitioning a stage by host (the
natural co-location key for host-level work) puts the hot host's entire
share into ONE task. This harness synthesizes that shape (hot_share of N
docs on one host, the rest uniform over n_cold_hosts), runs an identical
CPU-bound stage under both partitionings, and measures PER-PARTITION task
wall time from inside the tasks (mapPartitions stamps each partition's
processing time — engine-agnostic, no UI scraping), reporting max / p99 /
median partition time and stage wall. The salted plan's max-task time is
the stage's critical path on a real cluster; that is the number the hot
host destroys.

Usage: python tools/skew_bench.py [n_docs] [hot_share]
Writes one JSON line to stdout; BENCH.md records the round's run.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F


def corpus(spark, n: int, hot_share: float, n_cold_hosts: int = 1000):
    d = F.col("id")
    hot = F.concat(F.lit("https://hot-host.example/"), d.cast("string"))
    cold = F.concat(
        F.lit("https://host"),
        F.pmod(d, F.lit(n_cold_hosts)).cast("string"),
        F.lit(".example/"),
        d.cast("string"),
    )
    url = F.when(F.pmod(d * 2654435761, F.lit(100)) < int(hot_share * 100), hot).otherwise(cold)
    # text long enough that the stage cost is data-proportional
    text = F.concat_ws(
        " ",
        *[F.concat(F.lit(f"w{i}_"), F.pmod(d * (i + 3), F.lit(997)).cast("string"))
          for i in range(30)],
    )
    return spark.range(n).select(url.alias("url"), text.alias("text"))


def timed_stage(df, cols=("text", "url")):
    """Per-partition timing from inside the task: consuming the rows
    executes the df's NARROW prefix on the input partitioning (for the
    full-KG mode that is the real extract projection, not a stand-in)."""
    def run(it):
        t0 = time.monotonic()
        n = 0
        acc = 0
        for row in it:
            for c in cols:
                acc ^= hash(row[c])
            n += 1
        yield (n, time.monotonic() - t0, acc & 7)

    return df.rdd.mapPartitions(run).collect()


def profile(parts):
    times = sorted(t for _, t, _ in parts)
    n = len(times)
    return {
        "partitions": n,
        "rows_max_partition": max(p[0] for p in parts),
        "task_sec_max": round(times[-1], 3),
        "task_sec_p99": round(times[min(n - 1, int(0.99 * n))], 3),
        "task_sec_median": round(times[n // 2], 3),
    }


def main_full(spark, n: int, hot_share: float) -> None:
    """Round-7 evidence: the FULL KG stage (extract → tokenize → mentions
    → triples) through a planted hot host, by-host partitioning vs
    salted_repartition. The skew bites in the narrow map prefix (extract
    + explode + shuffle write land on the input partitioning; the first
    doc-keyed window exchange rebalances everything after it), so the
    per-partition profile instruments the real extract projection and
    the wall/docs-per-sec numbers are the pipeline end-to-end."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from medacy_spark.corpus.synth import clinical_documents
    from medacy_spark.functions.html import extract_text_expr
    from medacy_spark.operators.mentions import detect_mentions, gazetteer_df
    from medacy_spark.operators.relations import extract_triples
    from medacy_spark.operators.tokenize import tokenize_native
    from medacy_spark.plans.skew import host_of, salted_repartition

    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    d = F.col("doc_id")
    hot = F.concat(F.lit("https://hot-host.example/"), d.cast("string"))
    cold = F.concat(
        F.lit("https://host"), F.pmod(d, F.lit(1000)).cast("string"),
        F.lit(".example/"), d.cast("string"),
    )
    url = F.when(
        F.pmod(d * 2654435761, F.lit(100)) < int(hot_share * 100), hot
    ).otherwise(cold)
    docs = clinical_documents(ids).withColumn("url", url).localCheckpoint()

    results = {"mode": "full_kg", "n_docs": n, "hot_share": hot_share}
    for name, planned in [
        ("by_host", docs.repartition(32, host_of())),
        ("salted", salted_repartition(docs, "url", num_partitions=32)),
    ]:
        texts = planned.select(
            "doc_id", extract_text_expr(F.col("html")).alias("text")
        )
        parts = timed_stage(texts, cols=("text",))  # real extract, per task
        t0 = time.monotonic()
        n_tri = extract_triples(
            detect_mentions(tokenize_native(texts), gazetteer_df(spark))
        ).count()
        wall = time.monotonic() - t0
        results[name] = {
            "pipeline_wall_sec": round(wall, 3),
            "docs_per_sec": round(n / wall, 1),
            "n_triples": n_tri,
            **profile(parts),
        }
    results["max_task_speedup"] = round(
        results["by_host"]["task_sec_max"] / results["salted"]["task_sec_max"], 2
    )
    results["pipeline_speedup"] = round(
        results["by_host"]["pipeline_wall_sec"]
        / results["salted"]["pipeline_wall_sec"], 2
    )
    print(json.dumps(results))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_share = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    full = len(sys.argv) > 3 and sys.argv[3] == "full"
    sys.path.insert(0, ".")
    from medacy_spark.plans.skew import host_of, salted_repartition
    from medacy_spark.session import get_spark

    spark = get_spark(app_name="skew_bench", cores=32)
    if full:
        main_full(spark, n, hot_share)
        spark.stop()
        return
    base = corpus(spark, n, hot_share).localCheckpoint()  # exclude synth cost

    results = {"n_docs": n, "hot_share": hot_share}
    for name, planned in [
        ("by_host", base.repartition(32, host_of())),
        ("salted", salted_repartition(base, "url", num_partitions=32)),
    ]:
        t0 = time.monotonic()
        parts = timed_stage(planned)
        wall = round(time.monotonic() - t0, 3)
        results[name] = {"stage_wall_sec": wall, **profile(parts)}
    results["max_task_speedup"] = round(
        results["by_host"]["task_sec_max"] / results["salted"]["task_sec_max"], 2
    )
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
