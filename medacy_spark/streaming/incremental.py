"""Structured-Streaming variant of the incremental pipeline.

The reference has zero streaming operators (SURVEY.md §2.9): its only
incremental behavior is cache-skip + corrupt-retry. The batch-incremental
path (plans/checkpoint.py) is the faithful mapping; this module is the
extension for a continuously-arriving corpus: a file/parquet stream of new
documents → the same detection/extraction stages → foreachBatch append of
mentions/triples, with Spark's checkpointLocation providing exactly-once
per micro-batch.

The stage functions are the *same* DataFrame transformations as batch —
the pipeline is stream-static by construction (per-document windows only,
no cross-document state), so it is trivially streamable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def stream_documents(
    spark: SparkSession, input_path: str, schema: str
) -> DataFrame:
    """readStream over a growing parquet directory of documents."""
    return spark.readStream.schema(schema).parquet(input_path)


def run_incremental(
    stream_df: DataFrame,
    stage_fn: Callable[[DataFrame], DataFrame],
    output_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Apply the batch stage function per micro-batch and append results.

    foreachBatch gives batch semantics inside the stream: stage_fn may use
    windows/joins/aggregations exactly as in batch mode. Exactly-once via
    the checkpointLocation + idempotent parquet append of the sink.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = stage_fn(batch_df)
        out.write.mode("append").parquet(output_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def run_incremental_counts(
    stream_df: DataFrame,
    count_fn: Callable[[DataFrame], DataFrame],
    output_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Additive-state incremental aggregation: ``count_fn`` maps a
    micro-batch to a KEYED COUNT relation and each batch appends its
    partials; `merged_counts` folds the log at read time. Because counts
    form a commutative monoid, append+fold equals the whole-corpus
    recompute EXACTLY — provided the unit count_fn aggregates over (the
    document) never straddles batches, which a file stream guarantees
    for row-per-document corpora. This is the streaming shape for
    corpus-scale statistics that are sums in disguise: co-occurrence
    counts (embeddings_train), token/vocab frequencies, n-gram tables.
    Exactly-once per micro-batch via checkpointLocation; a rerun with no
    new input appends nothing (gated in test_streaming_windowed)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        count_fn(batch_df).write.mode("append").parquet(output_path)

    return (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def merged_counts(
    spark: SparkSession,
    output_path: str,
    key_cols: tuple[str, ...],
    value_col: str = "n",
) -> DataFrame:
    """Fold the appended partial-count log: sum per key. One
    map-side-combined aggregation over the partials — reading N batches'
    partials costs the same shuffle as one batch's, because the log is
    already keyed and pre-aggregated per batch."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(output_path)
        .groupBy(*key_cols)
        .agg(F.sum(value_col).cast("bigint").alias(value_col))
    )
