"""Group A (scan part) — columnar sources (SURVEY.md §2.A).

a1 proves the Parquet scan path for the trickiest table (``events`` with its
INT64 TIMESTAMP(NANOS) column — see catalog.py). The remaining A-group
sinks/sources (csv/json/log/stream) live in sinks.py / logstore.py /
streaming.py.

Scale posture: identity scans are whole-stage-codegen'd vectorized Parquet
reads; projection pruning means only referenced columns are decoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from marasa_spark.catalog import load_table
from marasa_spark.registry import register

A1_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


@register("a1_scan_parquet", oracle=A1_ORACLE, group="A")
def a1_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full columnar scan incl. the ns-timestamp shim (µs-exact vs DuckDB)."""
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
