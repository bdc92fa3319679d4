"""Table registry over a ``/root/testdata/sf*``-style directory.

All ten driver tables (TESTDATA.md + FIXTURES.md) load as plain Parquet.
``events.ts`` has shipped under two physical encodings across driver
testdata generations, and ``load_table`` normalizes BOTH to a plain
TimestampType so every downstream operator sees one type:

* INT64 TIMESTAMP(NANOS) — Spark 4 rejects it unless
  ``spark.sql.legacy.parquet.nanosAsLong=true`` (then it arrives as
  LongType nanoseconds). Conversion to TimestampType must use **integer**
  division (``ts div 1000``) — ``/ 1000`` promotes to double, and ~1.7e18
  ns exceeds double's 2^53 exact range, which can flip a microsecond. The
  integer-div form exactly matches DuckDB's native µs truncation.
* INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) — arrives as
  TIMESTAMP_NTZ; cast to TimestampType (session TZ is pinned UTC, so wall
  values are unchanged and match DuckDB's naive read).
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
        # nanos encoding under nanosAsLong
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        # micros-ntz encoding (any table): normalize to TimestampType —
        # session TZ is pinned UTC so wall values are unchanged and every
        # operator sees the same type regardless of testdata generation.
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views (bare names, mirroring the DuckDB
    oracle's pre-registered views) for ``spark.sql`` query bodies."""
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
