"""Regression coverage for catalog.load_table's timestamp normalization:
the driver's testdata generator has shipped ``events.ts`` as BOTH
INT64 TIMESTAMP(NANOS) (rounds 1-3) and TIMESTAMP(MICROS, ntz) (round 4),
and the engine must read either into identical TimestampType values —
µs-truncated, UTC-wall-equal to DuckDB's native read of the same file."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marasa_spark.catalog import load_table
from marasa_spark.queries._util import fresh_scratch

# raw nanosecond instants with live sub-microsecond digits (the ns→µs
# truncation, not rounding, must match DuckDB)
NS_VALUES = [
    1704067798778549829,  # ...549.829 µs → truncates to ...549
    1704067200000000000,
    1704070000123456789,
    1704099999999999999,
]


def _write_events(path: str, ts_array: pa.Array) -> None:
    n = len(ts_array)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n),
            "props": pa.array(['{"k": 1}'] * n),
        }
    )
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def encoding_dirs(spark):
    base = fresh_scratch("catalog_enc", "/root/testdata/sf0.001", create=True)
    nanos_dir, micros_dir = f"{base}/nanos", f"{base}/micros"
    os.makedirs(nanos_dir)
    os.makedirs(micros_dir)
    _write_events(
        f"{nanos_dir}/events.parquet",
        pa.array(NS_VALUES, pa.timestamp("ns")),
    )
    _write_events(
        f"{micros_dir}/events.parquet",
        pa.array([v // 1000 for v in NS_VALUES], pa.timestamp("us")),
    )
    return nanos_dir, micros_dir


def test_both_encodings_normalize_to_timestamp(spark, encoding_dirs):
    nanos_dir, micros_dir = encoding_dirs
    a = load_table(spark, nanos_dir, "events")
    b = load_table(spark, micros_dir, "events")
    assert dict(a.dtypes)["ts"] == "timestamp"
    assert dict(b.dtypes)["ts"] == "timestamp"
    rows_a = sorted(map(repr, a.collect()))
    rows_b = sorted(map(repr, b.collect()))
    assert rows_a == rows_b, "nanos and micros encodings must read identically"


def test_ns_truncation_matches_duckdb(spark, encoding_dirs):
    import duckdb

    nanos_dir, _ = encoding_dirs
    got = {
        r["event_id"]: r["ts"].replace(tzinfo=None)
        for r in load_table(spark, nanos_dir, "events").collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, ts FROM '{nanos_dir}/events.parquet'"
        ).fetchall()
    )
    assert got == want
