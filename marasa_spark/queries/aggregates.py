"""Group D — aggregations (SURVEY.md §2.D).

All pure built-in ``pyspark.sql.functions`` aggregates: Catalyst plans these
as partial (map-side) + final hash aggregates with an Exchange on the group
keys — the shape that scales linearly with executors at 100 TB. Float
aggregates are rounded to 2 decimals on both engine and oracle side
(SURVEY.md §2 float-determinism note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.registry import register

# ---------------------------------------------------------------------------
# d1_agg_hash — TPC-H Q1 pricing summary (flagship). Exercises scan +
# filter pushdown + projection + 8-way hash aggregate + sort in one plan.
# ---------------------------------------------------------------------------

D1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 2)                                        AS avg_qty,
  round(avg(l_extendedprice), 2)                                   AS avg_price,
  round(avg(l_discount), 2)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("d1_agg_hash", oracle=D1_ORACLE, group="D")
def d1_agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum/avg/count (TPC-H Q1 shape); partial+final agg automatic."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
