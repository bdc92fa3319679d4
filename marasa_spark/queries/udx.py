"""Group L — the UDF / UDAF / UDTF surface (SURVEY.md §2.L).

This group's *purpose* is the Python-extension boundary, so it deliberately
crosses the JVM↔Python line — everywhere else in the engine stays JVM-side.
Performance ladder demonstrated here (pyspark guide: UDFs are the slow
path): l1 is the row-at-a-time anti-pattern (kept minimal), l2/l3/l4/l6 are
Arrow-vectorized (pandas_udf / applyInPandas / mapInPandas), l5 is a Python
UDTF. Every function is pure arithmetic so DuckDB oracles stay exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from marasa_spark.catalog import load_table
from marasa_spark.queries._util import r2, r2sql
from marasa_spark.registry import register

L1_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       {r2sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge
FROM lineitem
WHERE l_orderkey < 1000
"""


@register("l1_udf_scalar", oracle=L1_ORACLE, group="L")
def l1_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the measured anti-pattern — ~10-100×
    slower than l2's Arrow path; input pre-filtered to keep it honest but
    cheap). Same IEEE op order as the oracle → exact."""

    @F.udf(DoubleType())
    def charge_udf(price: float, disc: float, tax: float) -> float:
        return price * (1.0 - disc) * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r2(charge_udf("l_extendedprice", "l_discount", "l_tax")).alias("charge"),
    )


L2_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       {r2sql("l_extendedprice * (1 - l_discount)")} AS net_price
FROM lineitem
"""


@register("l2_udf_pandas", oracle=L2_ORACLE, group="L")
def l2_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF over Arrow batches (the fast Python path)."""

    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r2(net_price("l_extendedprice", "l_discount")).alias("net_price"),
    )


L3_ORACLE = f"""
SELECT l_returnflag, {r2sql("exp(avg(ln(l_quantity)))")} AS geo_mean_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("l3_udaf_pandas", oracle=L3_ORACLE, group="L")
def l3_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (geometric mean — not a Spark builtin)."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy()).mean()))

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r2(geo_mean("l_quantity")).alias("geo_mean_qty")
    )


_L4_MEAN = "avg(value) OVER (PARTITION BY event_type)"
_L4_STD = "stddev_samp(value) OVER (PARTITION BY event_type)"
L4_ORACLE = f"""
SELECT event_id, event_type,
       {r2sql(f"(value - {_L4_MEAN}) / {_L4_STD}", 4)} AS zscore
FROM events
"""


@register("l4_grouped_map", oracle=L4_ORACLE, group="L")
def l4_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: z-score normalize per group (whole-group
    pandas frame in/out — the custom-transform escape hatch)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z}
        )

    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("event_type").applyInPandas(
        normalize, "event_id long, event_type string, zscore double"
    )
    return out.select("event_id", "event_type", r2(F.col("zscore"), 4).alias("zscore"))


L5_ORACLE = """
SELECT r_name, CAST(unnest(range(0, r_regionkey + 1)) AS INT) AS i FROM region
"""


@register("l5_udtf", oracle=L5_ORACLE, group="L")
def l5_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in a LATERAL join (table-generating UDF): emit
    0..r_regionkey per region row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="i int")
    class SeqUDTF:
        def eval(self, n: int):
            for i in range(int(n) + 1):
                yield (i,)

    spark.udtf.register("marasa_seq_udtf", SeqUDTF)
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        "SELECT r.r_name, t.i FROM region r, LATERAL marasa_seq_udtf(r.r_regionkey) t"
    )


L6_ORACLE = f"""
SELECT event_id, user_id, {r2sql("value * 2.0")} AS doubled
FROM events
"""


@register("l6_map_in_arrow", oracle=L6_ORACLE, group="L")
def l6_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas whole-partition transform (Arrow batch iterator in/out —
    the shape used for custom scans/codecs, cf. ops/multimodal.py)."""

    def double_it(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "user_id": pdf["user_id"],
                    "doubled": pdf["value"] * 2.0,
                }
            )

    ev = load_table(spark, sf_dir, "events")
    out = ev.mapInPandas(double_it, "event_id long, user_id long, doubled double")
    return out.select("event_id", "user_id", r2(F.col("doubled")).alias("doubled"))


L7_ORACLE = """
SELECT CAST(i AS BIGINT) AS id,
       CAST(i * i AS BIGINT) AS square,
       CASE WHEN i % 2 = 0 THEN 'even' ELSE 'odd' END AS parity
FROM range(0, 1000) t(i)
"""


@register("l7_python_datasource", oracle=L7_ORACLE, group="L")
def l7_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python data source (Spark 4 DataSource API): a registered
    format whose reader declares partitions, so each executor's Python
    worker generates only its slice — the distributed alternative to
    driver-side createDataFrame for data behind Python APIs. Deterministic
    generator → full hash oracle (DuckDB range())."""
    from marasa_spark.pysource import SeqDataSource

    try:
        spark.dataSource.register(SeqDataSource)
    except Exception:
        pass  # already registered on this session
    return (
        spark.read.format("marasa_seq")
        .option("n", "1000")
        .option("partitions", "4")
        .load()
    )


# ---------------------------------------------------------------------------
# l8 — cogrouped map (applyInPandas over a cogroup: two frames per key)
# ---------------------------------------------------------------------------

L8_ORACLE = f"""
SELECT o_orderkey,
       CAST(count(l_orderkey) AS BIGINT) AS n_lines,
       {r2sql("coalesce(sum(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)), CAST(0 AS DOUBLE))", 4)} AS gross,
       {r2sql("coalesce(sum(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)), CAST(0 AS DOUBLE)) / o_totalprice", 4)} AS gross_ratio
FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_custkey < 60
GROUP BY o_orderkey, o_totalprice
"""


@register("l8_cogrouped_map", oracle=L8_ORACLE, group="L")
def l8_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped map — ``groupBy().cogroup().applyInPandas``: BOTH sides
    of a key arrive as separate pandas frames in one Python call, the
    API for per-key logic that needs the full frames of two tables at
    once (custom as-of merges, per-entity reconciliation) and the last
    Pandas-API surface the L group was missing (l4 covers one-table
    grouped map). Here each order's header meets its line items and the
    Python computes line count, gross revenue, and the gross/total
    ratio — deliberately SQL-expressible so the DuckDB oracle hash-checks
    the cogroup plumbing itself (empty right frames included: headers
    with no lines must still emit, which the LEFT JOIN oracle pins).
    Arrow-batched both directions; the cogroup is one co-partitioning
    shuffle of each side on the key — exactly a join's movement, with
    Python only seeing per-key frames, never the corpus. Rounding is
    applied JVM-side via r2 AFTER the pandas pass (l4's discipline)."""

    def reconcile(key, orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if orders_pdf.empty:
            # cogroup yields keys present in EITHER side; the semi-join
            # prune below makes this branch unreachable in practice, but
            # the contract (emit nothing without a header) stays guarded
            return pd.DataFrame(
                {"o_orderkey": [], "n_lines": [], "gross": [], "gross_ratio": []}
            ).astype(
                {"o_orderkey": "int64", "n_lines": "int64",
                 "gross": "float64", "gross_ratio": "float64"}
            )
        gross = float(
            (lines_pdf["l_extendedprice"] * (1.0 - lines_pdf["l_discount"])).sum()
        )
        total = float(orders_pdf["o_totalprice"].iloc[0])
        return pd.DataFrame(
            {
                "o_orderkey": [int(key[0])],
                "n_lines": [len(lines_pdf)],
                "gross": [gross],
                "gross_ratio": [gross / total],
            }
        )

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 60)
        .select("o_orderkey", "o_totalprice")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # prune the line side to surviving orders BEFORE the cogroup: without
    # this, every filtered-out order's lines still co-partition and invoke
    # Python just to emit nothing — measured 70s -> ~2s at sf0.1, and at
    # 100 TB it is the difference between shipping the corpus to Python
    # and shipping the working set
    li = li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_semi")
    out = (
        o.groupBy("o_orderkey")
        .cogroup(li.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, n_lines long, gross double, gross_ratio double",
        )
    )
    return out.select(
        "o_orderkey",
        "n_lines",
        r2(F.col("gross"), 4).alias("gross"),
        r2(F.col("gross_ratio"), 4).alias("gross_ratio"),
    )
