"""Simulate the driver's verify protocol against __spark_entry__.

Builds its OWN vanilla SparkSession (no engine configs — exactly the seam the
real driver exercises), runs entry() smoke at sf0.001, then every queries()
entry at sf0.01 vs its oracle_sql() through DuckDB with an
order-insensitive canonical compare.
"""

import datetime
import decimal
import math
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
SF_DIR = "/root/testdata/sf0.01"


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


# vanilla session: the driver does NOT apply our configs
spark = SparkSession.builder.master("local[8]").appName("driver_sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

smoke = e.entry(spark)
n = smoke.count()
print(f"SMOKE entry(): rows={n} schema={smoke.schema.simpleString()}")
assert n > 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

qs, oracles = e.queries(), e.oracle_sql()
fails = []
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF_DIR)
        scols, srows = sdf.columns, sdf.collect()
        if name not in oracles:
            print(f"ROWS-ONLY {name}: rows={len(srows)}")
            continue
        rel = con.execute(oracles[name])
        dcols = [d[0] for d in rel.description]
        drows = rel.fetchall()
        ok_names = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = canon_rows(scols, [tuple(r) for r in srows]) == canon_rows(dcols, drows)
        status = "OK" if (ok_names and ok_count and ok_vals) else "MISMATCH"
        if status != "OK":
            fails.append(name)
        print(f"{status} {name}: rows={len(srows)}/{len(drows)} names={ok_names} vals={ok_vals}")
    except Exception as ex:
        fails.append(name)
        print(f"ERROR {name}: {type(ex).__name__}: {str(ex)[:200]}")

print(f"\n{len(qs) - len(fails)}/{len(qs)} queries pass; fails={fails}")
sys.exit(1 if fails else 0)
