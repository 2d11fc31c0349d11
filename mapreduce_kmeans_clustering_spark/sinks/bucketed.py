"""Bucketed-table sink: pre-shuffle a relation ONCE on its join key so
every later equi-join on that key is co-located (no Exchange on either
side — the plan test pins this).

This is the amortization play for 100 TB fact tables: the bucket write
pays one shuffle at ingest; every subsequent join/aggregation keyed on
the bucket columns skips its exchange (and with sortBy, its sort).
Bucket metadata lives in the session catalog, so readers must go
through ``spark.table`` — a plain parquet path read loses the bucket
info.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 8,
    sorted_by: bool = True,
) -> None:
    """Persist df as a parquet table bucketed (and optionally sorted)
    by ``keys``. Bucket count rule at scale: target ~128-512 MB per
    bucket file; too few buckets caps join parallelism."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sorted_by:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
