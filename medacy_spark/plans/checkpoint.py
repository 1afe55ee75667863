"""Per-partition checkpointing + lineage/metrics + exact resume (north rule).

The reference's only incrementality is MetaMap cache-skip: re-map only
files whose cached output is missing or < 200 bytes (metamap.py:74-96,
434-443; dataset.py:136-157). Generalized for a partitioned corpus:

  * the corpus is processed in *logical partitions* (e.g. bucket(url) —
    an Iceberg partition in production, a pmod(xxhash64(url), N) bucket
    here);
  * each completed partition appends a row to a `metrics` lineage table
    (run_id, partition_id, stage, rows_in, rows_out, wall_ms, status) and
    its output lands under partition_id=... before the metrics row commits
    — metrics-after-data ordering makes the metrics row the commit marker;
  * resume = anti-join the partition list against completed metrics rows,
    recompute only the残り; outputs are idempotent per (run_id,
    partition_id) — re-running a completed partition overwrites the same
    directory (dynamic partition overwrite), so crash-between-write-and-
    mark is safe.

This is deliberately batch-incremental (the reference is batch);
streaming/incremental.py holds the Structured-Streaming variant.
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
) -> DataFrame:
    """Run `stage_fn` over each not-yet-completed logical partition, writing
    output + metrics per partition; returns the full output (completed +
    new) read back from the sink.

    Crash-safety: output write happens before the metrics append; a crash
    between them re-runs that partition into the same directory
    (partitionOverwriteMode=dynamic) — idempotent.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    parts = with_partition_id(source, key_col, n_partitions)
    done = set(completed_partitions(spark, metrics_path, run_id, stage))
    todo = [p for p in range(n_partitions) if p not in done]
    for pid in todo:
        t0 = time.monotonic()
        chunk = parts.filter(F.col("partition_id") == pid)
        rows_in = chunk.count()
        out = stage_fn(chunk.drop("partition_id")).withColumn(
            "partition_id", F.lit(pid)
        )
        (
            out.write.mode("overwrite")
            .partitionBy("partition_id")
            .parquet(output_path)
        )
        rows_out = spark.read.parquet(output_path).filter(
            F.col("partition_id") == pid
        ).count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        metrics_row = spark.createDataFrame(
            [(run_id, pid, stage, rows_in, rows_out, wall_ms, "ok")], METRICS_SCHEMA
        )
        metrics_row.write.mode("append").parquet(metrics_path)
    return spark.read.parquet(output_path)
