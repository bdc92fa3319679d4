"""Structured Streaming runtime helpers (SURVEY.md §2.I execution side).

The oracle-checkable I-group entries in queries/streaming.py run their
constructs in batch; this module runs the SAME constructs as real streams —
file micro-batches (``maxFilesPerTrigger=1``) driven to completion with an
``availableNow`` trigger into a memory sink — so tests can assert
batch↔stream equivalence (the engine's streaming correctness story).
"""

from __future__ import annotations

import itertools
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.session import ensure_session_configs

_name_counter = itertools.count()

# staged chunks are rewritten by Spark, so ts is a real timestamp already
# (the raw testdata file needs the ns shim; staged data does not)
EVENTS_STAGED_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def stage_event_chunks(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 4, repeat: int = 1
) -> DataFrame:
    """Split the events table into ``n_chunks`` time-ordered parquet files
    (each optionally duplicated ``repeat`` times) so a file stream replays
    them as distinct micro-batches in event-time order. Returns the batch
    DataFrame of the staged data (with duplication)."""
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    per = (n + n_chunks - 1) // n_chunks
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for i in range(n_chunks):
        chunk = ev.filter(
            (F.col("event_id") >= i * per) & (F.col("event_id") < (i + 1) * per)
        )
        for r in range(repeat):
            # one file per (chunk, repeat); lexicographic names keep replay order
            tmp = f"{out_dir}/_tmp_{i}_{r}"
            chunk.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = next(
                p for p in os.listdir(tmp) if p.startswith("part-") and p.endswith(".parquet")
            )
            os.replace(f"{tmp}/{part}", f"{out_dir}/chunk_{i:02d}_{r}.parquet")
            shutil.rmtree(tmp)
    return spark.read.schema(EVENTS_STAGED_SCHEMA).parquet(out_dir)


def read_event_stream(spark: SparkSession, chunk_dir: str) -> DataFrame:
    """readStream over a staged chunk dir, one file per micro-batch, with
    the same ns-timestamp shim as the batch catalog."""
    ensure_session_configs(spark)
    return (
        spark.readStream.schema(EVENTS_STAGED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )


def run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink; returns the sink table."""
    name = f"marasa_mem_{next(_name_counter)}"
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return df.sparkSession.table(name)
