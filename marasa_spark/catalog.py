"""Table registry over a ``/root/testdata/sf*``-style directory.

All ten driver tables (TESTDATA.md + FIXTURES.md) load as plain Parquet.
``events`` needs the nanosecond-timestamp shim (SURVEY.md §1.4):

* the Parquet column is INT64 TIMESTAMP(NANOS) which Spark 4 rejects unless
  ``spark.sql.legacy.parquet.nanosAsLong=true`` (then it arrives as LongType
  nanoseconds);
* conversion to TimestampType must use **integer** division
  (``ts div 1000``) — ``/ 1000`` promotes to double, and ~1.7e18 ns exceeds
  double's 2^53 exact range, which can flip a microsecond. The integer-div
  form exactly matches DuckDB's native µs truncation of the same column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marasa_spark.session import ensure_session_configs

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; applies the events ns-timestamp shim."""
    ensure_session_configs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views (bare names, mirroring the DuckDB
    oracle's pre-registered views) for ``spark.sql`` query bodies."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
