"""Per-partition checkpointing + lineage/metrics + exact resume (north rule).

The reference's only incrementality is MetaMap cache-skip: re-map only
files whose cached output is missing or < 200 bytes (metamap.py:74-96,
434-443; dataset.py:136-157). Generalized for a partitioned corpus:

  * the corpus is processed in *logical partitions* (e.g. bucket(url) —
    an Iceberg partition in production, a pmod(xxhash64(url), N) bucket
    here);
  * each completed partition has a row in a `metrics` lineage table
    (run_id, partition_id, stage, rows_in, rows_out, wall_ms, status) and
    its output lands under partition_id=... before the metrics row commits
    — metrics-after-data ordering makes the metrics row the commit marker;
  * resume = anti-join the partition list against completed metrics rows,
    recompute only the remainder; outputs are idempotent per (run_id,
    partition_id) — re-running a partition overwrites the same directory
    (dynamic partition overwrite), so crash-between-write-and-mark is safe.

Scale design (the round-1 version looped one Spark job per partition —
O(N) full source scans): all not-yet-committed partitions now run as ONE
pruned job per *batch* (default: a single batch), with per-partition
metrics derived from two aggregations, so the source is scanned O(1)
times per stage regardless of N:

  job 1  filter(partition_id ∈ todo) → stage_fn → one write.partitionBy
  job 2  rows_in:  groupBy(partition_id).count() over the pruned source
  job 3  rows_out: groupBy(partition_id).count() over the written output
         (partition-pruned directory listing — reads only the new dirs)

`batch_size` trades commit granularity against scan count: a crash loses
at most one batch of work (ceil(todo/batch) × 3 scans per stage). With a
real prunable partition column (`partition_col`, an Iceberg
identity/bucket partition in production) job 1/2 prune at the file level;
the derived pmod(xxhash64) bucket cannot prune but still scans once.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "run_id string, partition_id int, stage string, rows_in long, "
    "rows_out long, wall_ms long, status string"
)


def with_partition_id(df: DataFrame, key_col: str, n_partitions: int) -> DataFrame:
    """Deterministic logical partition id — bucket(url)-style."""
    return df.withColumn(
        "partition_id", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_partitions)).cast("int")
    )


def completed_partitions(spark: SparkSession, metrics_path: str, run_id: str, stage: str) -> list[int]:
    try:
        m = spark.read.parquet(metrics_path)
    except Exception:
        return []
    rows = (
        m.filter(
            (F.col("run_id") == run_id)
            & (F.col("stage") == stage)
            & (F.col("status") == "ok")
        )
        .select("partition_id")
        .distinct()
        .collect()
    )
    return sorted(r["partition_id"] for r in rows)


def run_stage_checkpointed(
    spark: SparkSession,
    source: DataFrame,
    stage_fn: Callable[[DataFrame], DataFrame],
    *,
    run_id: str,
    stage: str,
    key_col: str,
    n_partitions: int,
    output_path: str,
    metrics_path: str,
    partition_col: str | None = None,
    batch_size: int | None = None,
) -> DataFrame:
    """Run `stage_fn` over every not-yet-completed logical partition in O(1)
    Spark jobs per batch (default: one batch = all remaining partitions),
    writing output + per-partition metrics; returns the full output
    (completed + new) read back from the sink.

    `stage_fn` receives the pruned source INCLUDING the `partition_id`
    column; if its output drops that column it is re-derived from
    `key_col` (so row-wise stages need no changes as long as they keep the
    key column).

    Crash-safety: the batch write lands before the batch's metrics append;
    a crash between them re-runs those partitions into the same directories
    (partitionOverwriteMode=dynamic) — idempotent. A crash mid-batch loses
    at most `batch_size` partitions of work, never committed ones.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if partition_col is not None:
        parts = source.withColumn("partition_id", F.col(partition_col).cast("int"))
    else:
        parts = with_partition_id(source, key_col, n_partitions)
    done = set(completed_partitions(spark, metrics_path, run_id, stage))
    todo = [p for p in range(n_partitions) if p not in done]
    step = max(1, len(todo)) if batch_size is None else max(1, batch_size)
    for i in range(0, len(todo), step):
        batch = todo[i : i + step]
        t0 = time.monotonic()
        chunk = parts.filter(F.col("partition_id").isin(batch))
        out = stage_fn(chunk)
        if "partition_id" not in out.columns:
            if key_col not in out.columns:
                raise ValueError(
                    "stage_fn must preserve either partition_id or "
                    f"{key_col!r} so output rows can be re-partitioned"
                )
            out = with_partition_id(out.drop("partition_id"), key_col, n_partitions)
        out.write.mode("overwrite").partitionBy("partition_id").parquet(output_path)
        rows_in = {
            r["partition_id"]: r["c"]
            for r in chunk.groupBy("partition_id").agg(F.count("*").alias("c")).collect()
        }
        rows_out = {
            r["partition_id"]: r["c"]
            for r in spark.read.parquet(output_path)
            .filter(F.col("partition_id").isin(batch))
            .groupBy("partition_id")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        wall_ms = int((time.monotonic() - t0) * 1000)
        metrics_rows = [
            (run_id, int(pid), stage, int(rows_in.get(pid, 0)),
             int(rows_out.get(pid, 0)), wall_ms, "ok")
            for pid in batch
        ]
        spark.createDataFrame(metrics_rows, METRICS_SCHEMA).write.mode(
            "append"
        ).parquet(metrics_path)
    return spark.read.parquet(output_path)
