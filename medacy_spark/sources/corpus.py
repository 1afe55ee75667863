"""Corpus sources/sinks.

S1 (directory corpus scan, dataset.py:82-128) becomes table scans; the
txt/ann/metamapped pairing is a full-outer equi-join on basename, with
nulls encoding the reference's directory modes (txt-only = to-predict,
ann-only = gold-only; dataset.py:44-53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Scan the documents table (parquet/Iceberg). Catalyst pushes filters
    and prunes columns — e.g. a `text`-only pipeline never reads `html`."""
    return spark.read.parquet(path)


def read_text_dir(spark: SparkSession, path: str, glob: str = "*.txt") -> DataFrame:
    """Raw-directory corpus scan: one row per file (wholetext), basename as
    doc key — the S1 shape for loose .txt corpora."""
    df = spark.read.text(f"{path}/{glob}", wholetext=True)
    return df.select(
        F.regexp_extract(F.input_file_name(), r"([^/]+)\.[a-z]+$", 1).alias("file_name"),
        F.col("value").alias("text"),
    )


def pair_corpus_files(txt: DataFrame, ann: DataFrame) -> DataFrame:
    """J1: full-outer join on file_name; null txt/ann columns encode the
    reference's directory modes (dataset.py:101-128)."""
    t = txt.select("file_name", F.col("text").alias("txt"))
    a = ann.select("file_name", F.col("text").alias("ann"))
    return t.join(a, "file_name", "full_outer").orderBy("file_name")


def write_mentions(mentions: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4: prediction sink — the mentions table partitioned for downstream
    co-located joins (bucket-by-doc in production Iceberg)."""
    mentions.write.mode(mode).parquet(path)


def write_brat_dir(
    mentions: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    documents: DataFrame | None = None,
) -> None:
    """S4: reference-shaped directory sink (one OUT/<doc>.ann per doc,
    model.py:260-270) WITHOUT a driver collect: hash-repartition on the
    doc key so every doc's lines land in one partition, sort within
    partitions by (doc, T-number) — T ids are assigned in the reference
    writer's (start, end) span order by to_ann_lines, so files are
    byte-compatible with a reference-written .ann — and stream files out
    of the executors with foreachPartition.

    When ``documents`` is given, every input doc gets a .ann file — docs
    with no predicted mentions get an EMPTY one, matching the reference's
    one-.ann-per-.txt predict layout (model.py:260-270 writes
    ``str(annotations)`` for every doc). Implemented as a left-join of the
    doc spine against the lines, a zero-length sentinel line standing in
    for "no content" — still no driver collect.

    Local/shared-filesystem sink: on a cluster without a shared mount the
    at-scale sink remains write_mentions (parquet, bucket-by-doc); this is
    the directory-layout convenience the reference CLI journey expects.
    """
    import os

    from medacy_spark.operators.annotations import to_ann_lines

    os.makedirs(out_dir, exist_ok=True)
    lines = to_ann_lines(mentions, id_col)
    if documents is not None:
        # full outer: spine-only docs get an empty file AND mentions for
        # docs outside the spine still write (never silently dropped)
        spine = documents.select(id_col).distinct()
        lines = spine.join(lines, id_col, "full_outer").select(
            id_col, F.coalesce(F.col("line"), F.lit("")).alias("line")
        )
    t_num = F.regexp_extract("line", r"^T(\d+)\t", 1).cast("int")
    arranged = lines.repartition(F.col(id_col)).sortWithinPartitions(
        F.col(id_col), t_num
    )

    def write_partition(rows) -> None:
        cur: str | None = None
        buf: list[str] = []

        def flush() -> None:
            if cur is not None:
                content = "\n".join(buf) + "\n" if buf != [""] else ""
                with open(os.path.join(out_dir, f"{cur}.ann"), "w") as f:
                    f.write(content)

        for r in rows:
            key = str(r[id_col])
            if key != cur:
                flush()
                cur, buf = key, []
            buf.append(r["line"])
        flush()

    arranged.foreachPartition(write_partition)
