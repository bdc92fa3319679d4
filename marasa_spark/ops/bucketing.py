"""Bucketed (co-located) joins — the shuffle-elimination tool for repeated
fact⋈fact joins at 100 TB (SURVEY.md §4; pyspark guide "Partitioning &
shuffle").

A join between two tables bucketed by the join key into the same bucket
count needs NO Exchange: each task reads matching bucket files from both
sides. The shuffle is paid ONCE at write time and amortized over every
subsequent join — the right trade for a star schema whose fact tables are
joined on the same keys by every query. (Plain parquet paths can't carry
bucket metadata, so this goes through ``saveAsTable``; with Delta/Iceberg
the same role is played by their clustering/sorted-layout metadata.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, sorted_by_key: bool = True
) -> None:
    """Materialize ``df`` as a bucketed (and per-bucket sorted) table —
    pays one shuffle now to make every later equi-join on ``key``
    exchange-free."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: with
    ``spark.sql.sources.bucketing.enabled`` (default true) the plan has no
    Exchange on either side (asserted in tests/test_plan_audit.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)
