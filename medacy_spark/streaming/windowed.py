"""Structured-Streaming extensions: event-time windows + custom state.

The reference has zero streaming operators (SURVEY §2.9) — these are the
beyond-reference extensions for a continuously-arriving corpus/telemetry
stream:

  * windowed_event_counts — event-time tumbling windows with a watermark
    for late data (the mentions/metrics stream of a long-running KG build).
  * running_user_totals   — applyInPandasWithState: per-key state carried
    across micro-batches (e.g. per-host document counters feeding the
    skew-salting decision online).

Both are stream-static transformations of the same DataFrames the batch
path uses; tests drive them with availableNow triggers and compare against
the batch answer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time windows with late-data watermark."""
    # watermarks require TIMESTAMP (with zone); parquet NTZ columns cast
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col, "cnt",
        )
    )


def session_aggregates(
    stream: DataFrame,
    gap: str = "6 hours",
    watermark: str = "12 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Event-time sessionization with Spark's native ``session_window``
    (merging windows + watermark state eviction) — the STREAMING
    counterpart of ``operators/events.sessionize``: the same gap rule
    over a continuously arriving event stream, with late data handled
    by the watermark instead of a full re-sort.

    Boundary semantics: session_window extends a session to
    [start, last_ts + gap) and merges an event that lands strictly
    inside it, while the batch ``sessionize`` starts a new session when
    the gap is strictly exceeded — the two differ only for gaps EXACTLY
    equal to ``gap`` (zero-probability with microsecond event times;
    the equivalence test in test_streaming_windowed pins the agreement
    on the corpus)."""
    return (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sess_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            key_col, "n_events", "sess_value",
        )
    )


STATE_SCHEMA = "total long"
OUTPUT_SCHEMA = "user_id long, total long"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total = state.get[0] if state.exists else 0
    for pdf in pdfs:
        total += len(pdf)
    state.update((total,))
    yield pd.DataFrame({"user_id": [key[0]], "total": [total]})


def running_user_totals(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running event counts with explicit state across micro-batches
    (applyInPandasWithState). Emits the updated total each batch."""
    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
