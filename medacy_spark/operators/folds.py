"""Stratified fold assignment + cross-validation aggregates (X4/J12/A5).

Reproduces medacy's ``create_folds`` (medacy/model/model.py:23-66) exactly:

  * labels are sorted ascending (np.unique; the reference's ``np.flip`` at
    model.py:42 is a no-op — its result is never assigned — so the
    documented "most examples first" order never happens; we replicate the
    *actual* behavior),
  * a single fold cycler runs over labels in that order; each not-yet-
    assigned sequence containing the label is appended round-robin, in
    sequence-index order.

Equivalent closed form: order sequences by (alphabetically smallest label
they contain, sequence index); fold = (global row_number - 1) mod k. That
is a pure window computation — one sort, no Python.

Cross-fold stats (A5, model.py:429-441): per-(fold,label) metrics then
mean/min/max per label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_folds(
    sequences: DataFrame,
    num_folds: int = 10,
    seq_col: str = "seq_id",
    labels_col: str = "labels",
    scale: bool = False,
) -> DataFrame:
    """sequences(seq_id, labels array<string>) -> (seq_id, fold int).

    Sequences with an empty label set are never assigned by the reference
    (they appear in no fold) — they are dropped here too.

    Two physical paths, identical output (tested):
      * exact replay (default): one unpartitioned global window — the
        bit-for-bit parity path; every row funnels through one task, fine
        at fixture scale, a scale-killer on a real corpus.
      * ``scale=True``: range-partition on the sort key, per-partition
        local numbering, driver-side per-partition counts → offsets
        (n_partitions rows), fold = (offset + local_rn - 1) mod k. No
        single-partition exchange anywhere in the plan (gate-tested).
    """
    if num_folds < 2:
        raise ValueError(f"'num_folds' must be >= 2, but is {num_folds!r}")
    keyed = sequences.filter(F.size(labels_col) > 0).select(
        seq_col, F.array_min(labels_col).alias("_first_label")
    )
    if not scale:
        w = Window.orderBy("_first_label", seq_col)
        return keyed.select(
            seq_col,
            ((F.row_number().over(w) - 1) % num_folds).cast("int").alias("fold"),
        )
    spark = sequences.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    d = (
        keyed.repartitionByRange(n_parts, "_first_label", seq_col)
        .sortWithinPartitions("_first_label", seq_col)
        .withColumn("_pid", F.spark_partition_id())
        # pin the (sampled) range boundaries so the counts pass and the
        # numbering pass see the same partitioning
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r["_pid"], r["c"])
        for r in d.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    off_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(p) for p in offsets]),
            F.array(*[F.lit(o) for o in offsets.values()]),
        ),
        F.col("_pid"),
    )
    wl = Window.partitionBy("_pid").orderBy("_first_label", seq_col)
    return d.select(
        seq_col,
        ((off_expr + F.row_number().over(wl) - 1) % num_folds).cast("int").alias("fold"),
    )


def fold_split(data: DataFrame, folds: DataFrame, k: int, seq_col: str = "seq_id"):
    """J12: (train, test) DataFrames for fold k — a fold column beats an
    indices join (model.py:380-392)."""
    j = data.join(folds, seq_col)
    return j.filter(F.col("fold") != k).drop("fold"), j.filter(F.col("fold") == k).drop("fold")


def cross_fold_stats(per_fold_metrics: DataFrame) -> DataFrame:
    """A5: per-(fold, label) P/R/F1 rows -> per-label mean/min/max
    (model.py:429-441)."""
    aggs = []
    for m in ("precision", "recall", "f1"):
        aggs += [
            F.avg(m).alias(f"avg_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    return per_fold_metrics.groupBy("label").agg(*aggs).orderBy("label")
