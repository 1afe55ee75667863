"""Bucketed table layout — co-located joins without shuffles (M6).

At 100 TB the documents/tokens/mentions tables are written bucketed by the
doc key (Iceberg `bucket(N, url)`); every per-doc join downstream
(overlay J7, CUI overlay J9, triples assembly) then plans WITHOUT a
shuffle exchange — the same property spark.range gives the synthetic
pipeline (see BENCH.md). These helpers are the Spark-session-catalog
version (bucketBy + saveAsTable); the physical layout contract is
identical for an Iceberg catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32, sort_by: list[str] | None = None
) -> None:
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
