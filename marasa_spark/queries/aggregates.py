"""Group D — aggregations (SURVEY.md §2.D).

All pure built-in ``pyspark.sql.functions`` aggregates: Catalyst plans these
as partial (map-side) + final hash aggregates with an Exchange on the group
keys — the shape that scales linearly with executors at 100 TB. Float
aggregates go through the IEEE-deterministic rounding helper (``_util.r2``)
on both engine and oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table, register_views
from marasa_spark.queries._util import r2, r2sql
from marasa_spark.registry import register

# ---------------------------------------------------------------------------
# d1_agg_hash — TPC-H Q1 pricing summary (flagship). Exercises scan +
# filter pushdown + projection + 8-way hash aggregate in one plan.
# ---------------------------------------------------------------------------

D1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {r2sql("sum(l_quantity)")}                                       AS sum_qty,
  {r2sql("sum(l_extendedprice)")}                                  AS sum_base_price,
  {r2sql("sum(l_extendedprice * (1 - l_discount))")}               AS sum_disc_price,
  {r2sql("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))")} AS sum_charge,
  {r2sql("avg(l_quantity)")}                                       AS avg_qty,
  {r2sql("avg(l_extendedprice)")}                                  AS avg_price,
  {r2sql("avg(l_discount)")}                                       AS avg_disc,
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
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(F.sum(disc_price)).alias("sum_disc_price"),
            r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            r2(F.avg("l_quantity")).alias("avg_qty"),
            r2(F.avg("l_extendedprice")).alias("avg_price"),
            r2(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# d2 — DISTINCT aggregates (planned as expand + two-phase agg by Catalyst)
# ---------------------------------------------------------------------------

D2_ORACLE = f"""
SELECT l_returnflag,
       count(DISTINCT l_partkey)              AS n_parts,
       count(DISTINCT l_suppkey)              AS n_supps,
       {r2sql("sum(DISTINCT l_quantity)")}    AS sum_dist_qty,
       count(*)                               AS n
FROM lineitem
GROUP BY l_returnflag
"""


@register("d2_agg_distinct", oracle=D2_ORACLE, group="D")
def d2_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        r2(F.sum_distinct(F.col("l_quantity"))).alias("sum_dist_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# d3/d4/d5 — grouping-set families (Expand operator; one shuffle)
# ---------------------------------------------------------------------------

D3_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {r2sql("sum(l_extendedprice)")} AS sum_price,
       count(*)                        AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("d3_agg_rollup", oracle=D3_ORACLE, group="D")
def d3_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


D4_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {r2sql("sum(l_quantity)")} AS sum_qty,
       count(*)                   AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("d4_agg_cube", oracle=D4_ORACLE, group="D")
def d4_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


# Identical SQL text runs on both engines (Spark SQL front-end = EP3).
D5_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {r2sql("sum(l_extendedprice)")} AS sum_price,
       count(*)                        AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register("d5_agg_gsets", oracle=D5_SQL, group="D")
def d5_agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL front-end (same text as the oracle)."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(D5_SQL)


D6_ORACLE = f"""
SELECT o_custkey, count(*) AS n_orders, {r2sql("sum(o_totalprice)")} AS total
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 10
"""


@register("d6_agg_having", oracle=D6_ORACLE, group="D")
def d6_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r2(F.sum("o_totalprice")).alias("total"),
        )
        .filter(F.col("n_orders") >= 10)
    )


# ---------------------------------------------------------------------------
# d7/d8 — statistical + exact-percentile aggregates.
# Stats computed on bounded-magnitude columns (quantity/discount) so the
# rounding fully absorbs cross-engine summation-order noise.
# ---------------------------------------------------------------------------

D7_ORACLE = f"""
SELECT l_returnflag,
       {r2sql("stddev_samp(l_quantity)")}                AS std_qty,
       {r2sql("var_samp(l_quantity)")}                   AS var_qty,
       {r2sql("corr(l_quantity, l_extendedprice)", 4)}   AS corr_qty_price,
       {r2sql("covar_samp(l_quantity, l_discount)", 4)}  AS covar_qty_disc
FROM lineitem
GROUP BY l_returnflag
"""


@register("d7_agg_stats", oracle=D7_ORACLE, group="D")
def d7_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        r2(F.stddev_samp("l_quantity")).alias("std_qty"),
        r2(F.var_samp("l_quantity")).alias("var_qty"),
        r2(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        r2(F.covar_samp("l_quantity", "l_discount"), 4).alias("covar_qty_disc"),
    )


D8_ORACLE = f"""
SELECT l_returnflag,
       {r2sql("percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice)")} AS p25,
       {r2sql("percentile_cont(0.50) WITHIN GROUP (ORDER BY l_extendedprice)")} AS median,
       {r2sql("percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice)")} AS p75
FROM lineitem
GROUP BY l_returnflag
"""


_D8_PS = ((0.25, "p25"), (0.50, "median"), (0.75, "p75"))
_D8_BUCKET_W = 512.0


def d8_histogram_percentiles(
    rows: DataFrame, group_col: str, val_col: str, ps=_D8_PS
) -> DataFrame:
    """Exact interpolated percentiles by histogram selection (shared by d8
    and d16 — the 100 TB-safe replacement for the exact ``F.percentile``
    aggregate).

    Spark's exact ``percentile`` buffers EVERY value of a group inside one
    aggregation buffer (an OpenHashMap merged onto a single final task) — at
    100 TB a group is billions of rows and that buffer is the OOM, and even
    at bench scale the single-buffer merge+sort serializes the group.
    Selection of index k in the sorted multiset needs no global sort:

      1. bucket = floor(val / 512)  — order-preserving and data-independent,
         so the sorted order is exactly (bucket, value-within-bucket);
      2. per-(group, bucket) counts -> cumulative counts locate the bucket
         holding each target index plus the local rank inside it (the
         count/window stages run over #buckets rows, not #values);
      3. ONLY the <=6 target buckets per group are joined back (broadcast —
         the target table is tiny) and rank-sorted for the exact lo/hi
         values; memory is O(buckets) per group, the value sort touches a
         few thousand rows;
      4. (hi_i - pos)·lo + (pos - lo_i)·hi — bit-for-bit the interpolation
         Spark's ``percentile`` evaluates (the algebraically-equal
         lo + (hi-lo)·frac differs by 1 ULP and crossed an r2 boundary).

    Output proven byte-identical to the previous ``F.percentile`` form (and
    hash-identical to the DuckDB oracle) at sf0.001/0.01/0.1; warm collect
    0.435 -> 0.078 s at sf0.1 (OPTIMIZATION_r11.md §d8).
    """
    li = rows.select(
        group_col,
        val_col,
        F.floor(F.col(val_col) / F.lit(_D8_BUCKET_W)).alias("_b"),
    )
    counts = li.groupBy(group_col, "_b").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.partitionBy(group_col).orderBy("_b")
    w_all = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = counts.select(
        group_col,
        "_b",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    # per percentile: global target indices lo/hi; a bucket covers the index
    # range [cum-cnt, cum-1], so exactly one bucket row matches each index.
    # One explode over the tiny cum frame (not a per-slot filter union —
    # that re-executed the counts+window chain once per slot: 30 exchanges)
    slot_structs = []
    for p, nm in ps:
        pos = F.lit(p) * (F.col("n") - F.lit(1)).cast("double")
        for which, idx in (
            ("lo", F.floor(pos).cast("long")),
            ("hi", F.ceil(pos).cast("long")),
        ):
            slot_structs.append(
                F.struct(
                    F.lit(f"{which}_{nm}").alias("slot"), idx.alias("idx")
                )
            )
    targets = (
        cum.select(
            group_col, "_b", "cnt", "cum", "n",
            F.explode(F.array(*slot_structs)).alias("_s"),
        )
        .filter(
            (F.col("cum") - F.col("cnt") <= F.col("_s.idx"))
            & (F.col("cum") > F.col("_s.idx"))
        )
        .select(
            group_col,
            "_b",
            F.col("_s.slot").alias("slot"),
            (F.col("_s.idx") - (F.col("cum") - F.col("cnt"))).alias("local_rank"),
            "n",
        )
    )
    cand = li.join(F.broadcast(targets), [group_col, "_b"])
    w_rank = Window.partitionBy(group_col, "_b", "slot").orderBy(val_col)
    picked = (
        cand.withColumn("rn", F.row_number().over(w_rank) - 1)
        .filter(F.col("rn") == F.col("local_rank"))
        .select(group_col, "slot", val_col, "n")
    )
    return picked.groupBy(group_col).agg(
        F.max("n").alias("n"),
        *[
            F.max(F.when(F.col("slot") == f"{w}_{nm}", F.col(val_col))).alias(
                f"{w}_{nm}"
            )
            for _, nm in ps
            for w in ("lo", "hi")
        ],
    )


@register("d8_agg_percentile", oracle=D8_ORACLE, group="D")
def d8_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (value-exact vs DuckDB
    `percentile_cont` — verified in the survey), computed by histogram
    selection instead of the buffer-everything ``F.percentile`` aggregate;
    see :func:`d8_histogram_percentiles` for the exactness argument and the
    100 TB memory rationale."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = d8_histogram_percentiles(li, "l_returnflag", "l_extendedprice")
    outs = [F.col("l_returnflag")]
    for p, nm in _D8_PS:
        pos = F.lit(p) * (F.col("n") - F.lit(1)).cast("double")
        lo_i = F.floor(pos).cast("long")
        hi_i = F.ceil(pos).cast("long")
        # Spark Percentile.getPercentile's exact two-sided weighted form —
        # NOT the algebraically-equal lo + (hi-lo)*frac, which differs by
        # 1 ULP on real data and crossed an r2 boundary at sf0.001
        val = F.when(hi_i == lo_i, F.col(f"lo_{nm}")).otherwise(
            (hi_i.cast("double") - pos) * F.col(f"lo_{nm}")
            + (pos - lo_i.cast("double")) * F.col(f"hi_{nm}")
        )
        outs.append(r2(val).alias(nm))
    return wide.select(*outs)


@register("d9_agg_approx", oracle=None, group="D")
def d9_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ count-distinct, approx percentile).

    Approximate ≠ hashable cross-engine → rows-only contract; accuracy vs
    the exact values is asserted with tolerance in
    tests/test_llm_ops.py::test_approx_aggs_within_tolerance.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx(F.col("l_extendedprice"), F.lit(0.5), F.lit(10000)).alias(
            "approx_median"
        ),
    )


D14_ORACLE = """
SELECT l_returnflag,
       CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
       bool_and(l_quantity >= 1)    AS all_positive_qty,
       bool_or(l_tax > 0.07)        AS any_high_tax
FROM lineitem
GROUP BY l_returnflag
"""


@register("d14_agg_bool", oracle=D14_ORACLE, group="D")
def d14_agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/boolean aggregates: count_if, bool_and (every), bool_or
    (any)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.bool_and(F.col("l_quantity") >= 1).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
    )


D13_ORACLE = """
WITH m AS (
  SELECT c_mktsegment, min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
  FROM customer GROUP BY c_mktsegment
)
SELECT m.c_mktsegment,
       min(CASE WHEN c.c_acctbal = m.min_bal THEN c.c_custkey END) AS poorest_cust,
       max(CASE WHEN c.c_acctbal = m.max_bal THEN c.c_custkey END) AS richest_cust,
       m.min_bal, m.max_bal
FROM customer c JOIN m USING (c_mktsegment)
GROUP BY m.c_mktsegment, m.min_bal, m.max_bal
"""


@register("d13_agg_minmax_by", oracle=D13_ORACLE, group="D")
def d13_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregates, tie-proof: c_acctbal is a 2-decimal value so
    (segment, acctbal) collisions DO occur; struct min/max makes the custkey
    pick deterministic (lowest key at the min balance, highest at the max),
    mirrored in the oracle's CASE-filtered min/max."""
    c = load_table(spark, sf_dir, "customer")
    pair = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return c.groupBy("c_mktsegment").agg(
        F.min(pair)["c_custkey"].alias("poorest_cust"),
        F.max(pair)["c_custkey"].alias("richest_cust"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


# ---------------------------------------------------------------------------
# d11/d12 — pivot / unpivot (Expand + agg; oracle = conditional aggregation)
# ---------------------------------------------------------------------------

D11_ORACLE = f"""
SELECT l_returnflag,
       {r2sql("sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)")} AS qty_O,
       {r2sql("sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)")} AS qty_F
FROM lineitem
GROUP BY l_returnflag
"""


@register("d11_pivot", oracle=D11_ORACLE, group="D")
def d11_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let pivot scan for distinct
    values at scale — that's an extra full pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(r2(F.sum("l_quantity")))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
    )


D12_ORACLE = f"""
SELECT l_returnflag, 'O' AS linestatus,
       {r2sql("sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END)")} AS qty
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 'F' AS linestatus,
       {r2sql("sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END)")} AS qty
FROM lineitem GROUP BY l_returnflag
"""


@register("d12_unpivot", oracle=D12_ORACLE, group="D")
def d12_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) the d11 pivot back to long form."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(r2(F.sum("l_quantity")))
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["O", "F"],
        variableColumnName="linestatus",
        valueColumnName="qty",
    )


D10_ORACLE = """
SELECT n_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names
FROM nation JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_nationkey
"""


@register("d10_agg_collect", oracle=D10_ORACLE, group="D")
def d10_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation, sorted for determinism, joined to a scalar so the
    value-hash is dialect-proof (list vs array rendering)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("names"))
    )


# ---------------------------------------------------------------------------
# d15/d16/d17 — bitwise aggregates, exact median, ordered group-concat
# ---------------------------------------------------------------------------

D15_ORACLE = """
SELECT l_returnflag,
       bit_and(l_linenumber) AS all_bits,
       bit_or(l_linenumber)  AS any_bits,
       bit_xor(l_linenumber) AS parity_bits
FROM lineitem
GROUP BY l_returnflag
"""


@register("d15_agg_bitwise", oracle=D15_ORACLE, group="D")
def d15_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise fold aggregates (bit_and/bit_or/bit_xor) — algebraic, so
    partial+final aggregation applies like any sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bit_and("l_linenumber").alias("all_bits"),
        F.bit_or("l_linenumber").alias("any_bits"),
        F.bit_xor("l_linenumber").alias("parity_bits"),
    )


D16_ORACLE = f"""
SELECT o_orderpriority,
       {r2sql("median(o_totalprice)")} AS med_price,
       count(*) AS n
FROM orders
GROUP BY o_orderpriority
"""


@register("d16_agg_median", oracle=D16_ORACLE, group="D")
def d16_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (interpolated at even counts on both
    engines), via the same histogram selection as d8 — ``F.median`` buffers
    every group value in one aggregation buffer, the d8 docstring's 100 TB
    OOM; selection sorts only the two target buckets."""
    o = load_table(spark, sf_dir, "orders")
    wide = d8_histogram_percentiles(
        o, "o_orderpriority", "o_totalprice", ps=((0.50, "med"),)
    )
    pos = F.lit(0.5) * (F.col("n") - F.lit(1)).cast("double")
    lo_i = F.floor(pos).cast("long")
    hi_i = F.ceil(pos).cast("long")
    # same two-sided interpolation as d8 (see the comment there)
    med = F.when(hi_i == lo_i, F.col("lo_med")).otherwise(
        (hi_i.cast("double") - pos) * F.col("lo_med")
        + (pos - lo_i.cast("double")) * F.col("hi_med")
    )
    # coalesce restores the non-nullable LongType the old F.count carried
    # (n is never null — every output group has >= 1 row)
    return wide.select(
        "o_orderpriority",
        r2(med).alias("med_price"),
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n"),
    )


D17_ORACLE = """
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY c_name) AS names
FROM customer
WHERE c_custkey <= 200
GROUP BY c_mktsegment
"""


@register("d17_group_concat", oracle=D17_ORACLE, group="D")
def d17_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered group concatenation (string_agg / listagg): collect, sort,
    join — the ORDER BY inside the aggregate is what makes the result
    deterministic; bounded to a key slice because a group-concat's output
    row grows with the group (at scale: always bound or sketch it)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names")
    )


D18_ORACLE = """
WITH counts AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), ranked AS (
  SELECT o_orderpriority, o_orderstatus, n,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY n DESC, o_orderstatus DESC) AS rn
  FROM counts
)
SELECT o_orderpriority, o_orderstatus AS mode_status, n
FROM ranked WHERE rn = 1
"""


@register("d18_agg_mode", oracle=D18_ORACLE, group="D")
def d18_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-proof mode (most frequent value per group): count sub-aggregate,
    then argmax by (count, value) via max(struct) — never the builtin
    mode(), whose tie choice is engine-dependent. Two cheap aggregates on
    shrinking data, no sort."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    top = counts.groupBy("o_orderpriority").agg(
        F.max(F.struct("n", "o_orderstatus")).alias("t")
    )
    return top.select(
        "o_orderpriority",
        F.col("t.o_orderstatus").alias("mode_status"),
        F.col("t.n").alias("n"),
    )


@register("d19_sketch_hll", oracle=None, group="D")
def d19_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): one
    sketch per market segment, then hll_union_agg folds the five segment
    sketches into a global estimate WITHOUT touching the raw rows again —
    the mergeability is the whole point at 100 TB: sketches combine
    associatively across partitions, executors, days and tables, so
    distinct-count rollups become metadata-sized merges instead of
    re-scans. No oracle (DuckDB's HLL is a different algorithm); the
    estimate-vs-exact tolerance is asserted in tests/test_llm_ops.py."""
    c = load_table(spark, sf_dir, "customer")
    per = c.groupBy("c_mktsegment").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    seg = per.select(
        "c_mktsegment",
        F.hll_sketch_estimate("sk").alias("n_est"),
        "n_rows",
    )
    merged = per.agg(
        F.hll_union_agg("sk").alias("sk"), F.sum("n_rows").alias("n_rows")
    ).select(
        F.lit("__ALL__").alias("c_mktsegment"),
        F.hll_sketch_estimate("sk").alias("n_est"),
        "n_rows",
    )
    return seg.unionAll(merged)


# ---------------------------------------------------------------------------
# d20 — linear-regression aggregates (regr_slope / intercept / r2)
# ---------------------------------------------------------------------------

D20_ORACLE = f"""
SELECT l_returnflag,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT)       AS n,
       {r2sql("regr_slope(l_extendedprice, l_quantity)")}            AS slope,
       {r2sql("regr_intercept(l_extendedprice, l_quantity)")}        AS intercept,
       {r2sql("regr_r2(l_extendedprice, l_quantity)", 4)}            AS r_squared
FROM lineitem
GROUP BY l_returnflag
"""


@register("d20_agg_regr", oracle=D20_ORACLE, group="D")
def d20_agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates: OLS slope/intercept/R² of extended
    price on quantity per return flag — single-pass co-moment aggregates
    (sum, sum of squares, sum of products), so Catalyst plans them exactly
    like sum/avg: partial map-side combine + one exchange on the group key.
    At 100 TB this is the cheapest possible model fit: no iteration, no
    second scan, merge-associative state of five doubles per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        r2(F.regr_slope("l_extendedprice", "l_quantity")).alias("slope"),
        r2(F.regr_intercept("l_extendedprice", "l_quantity")).alias("intercept"),
        r2(F.regr_r2("l_extendedprice", "l_quantity"), 4).alias("r_squared"),
    )


D21_ORACLE = """
SELECT o_orderpriority, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY o_orderpriority
"""


@register("d21_bitmap_distinct", oracle=D21_ORACLE, group="D")
def d21_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps: keys bucket with
    ``bitmap_bucket_number`` (32k-bit buckets), each (group, bucket) builds
    a partial bitmap with ``bitmap_construct_agg``, partial bitmaps
    OR-merge with ``bitmap_or_agg``, and ``bitmap_count`` sums set bits.
    Unlike ``count(DISTINCT)`` — whose dedup state is the raw key set and
    must re-shuffle rows — bitmap state is a fixed 4 KB page per bucket,
    merge-associative, and can be persisted per partition/day and OR-merged
    later for incremental distinct counts (the d19 HLL pattern but exact).
    The oracle pins exactness against DuckDB's count(DISTINCT)."""
    o = load_table(spark, sf_dir, "orders")
    partial = (
        o.select(
            "o_orderpriority",
            F.bitmap_bucket_number("o_custkey").alias("bucket"),
            F.bitmap_bit_position("o_custkey").alias("pos"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
    )
    return partial.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).alias("n_customers")
    )


D22_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       count(*) AS n, {r2sql("sum(o_totalprice)")} AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("d22_grouping_id", oracle=D22_ORACLE, group="D")
def d22_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags over grouping sets: the bit that tells a NULL
    produced by aggregation apart from a NULL in the data — how every BI
    layer distinguishes the subtotal rows of d3/d4/d5 output. Same
    expand+aggregate plan as d5 (one shuffle); the flags are free
    metadata of the expansion, not extra passes."""
    from marasa_spark.catalog import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT)   AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               count(*) AS n, {r2sql("sum(o_totalprice)")} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# ---------------------------------------------------------------------------
# d23 — chi-square independence test (contingency-table statistics)
# ---------------------------------------------------------------------------

D23_ORACLE = f"""
WITH cells AS (
  SELECT event_type, CAST(value >= 25 AS BIGINT) AS hi_value,
         CAST(count(*) AS BIGINT) AS obs
  FROM events GROUP BY event_type, CAST(value >= 25 AS BIGINT)
), rowt AS (
  SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_tot FROM cells GROUP BY event_type
), colt AS (
  SELECT hi_value, CAST(sum(obs) AS BIGINT) AS col_tot FROM cells GROUP BY hi_value
), grand AS (
  SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells
)
SELECT event_type, hi_value, obs,
       {r2sql("row_tot * col_tot / CAST(n AS DOUBLE)", 4)} AS expected,
       {r2sql("(obs - row_tot * col_tot / CAST(n AS DOUBLE)) * (obs - row_tot * col_tot / CAST(n AS DOUBLE)) / (row_tot * col_tot / CAST(n AS DOUBLE))", 4)} AS chi2_term
FROM cells JOIN rowt USING (event_type) JOIN colt USING (hi_value) CROSS JOIN grand
"""


@register("d23_chi_square", oracle=D23_ORACLE, group="D")
def d23_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test as a contingency-table pipeline: is
    event type independent of value magnitude? Per-cell observed counts,
    the independence-expected count (row_tot x col_tot / N), and each
    cell's chi2 contribution — the categorical-association screen feature
    selection and A/B sanity checks run (d20's regr_* covers the
    continuous-continuous case; this is its categorical-categorical
    sibling). One groupBy over the fact builds the cells; row/column/
    grand totals are WINDOWS over the cell table — whose row count is
    the R x C category product, ~10 rows at any corpus size — so the
    fact is scanned once and the global window never sees data-sized
    input. All
    arithmetic starts from identical integer counts — expected and
    chi2_term are deterministic IEEE expressions rounded at 4 decimals.
    Σ chi2_term vs the chi-square critical value (df=(R-1)(C-1)=4) is
    the reader's decision; per-cell terms localize the dependence."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", (F.col("value") >= 25).cast("long").alias("hi_value")
    ).agg(F.count(F.lit(1)).alias("obs"))
    # totals as windows OVER THE CELL TABLE (R x C rows, category-domain
    # bounded — the global window is over ~10 rows by construction, never
    # the fact): no scalar crossJoin, so the D-group no-nested-loop audit
    # stays strict with no waiver
    from pyspark.sql import Window as _W

    row_tot = F.sum("obs").over(_W.partitionBy("event_type"))
    col_tot = F.sum("obs").over(_W.partitionBy("hi_value"))
    n = F.sum("obs").over(_W.partitionBy())
    exp = row_tot * col_tot / n.cast("double")
    return cells.select(
        "event_type",
        "hi_value",
        "obs",
        r2(exp, 4).alias("expected"),
        r2((F.col("obs") - exp) * (F.col("obs") - exp) / exp, 4).alias(
            "chi2_term"
        ),
    )


# ---------------------------------------------------------------------------
# d24 — exact percentiles via the two-phase rank shape (VERDICT r7 #7):
# d8's answer without d8's O(group) per-task buffer
# ---------------------------------------------------------------------------


@register("d24_percentile_two_phase", oracle=D8_ORACLE, group="D")
def d24_percentile_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8's exact interpolated percentiles, computed WITHOUT buffering a
    group's values in one aggregation buffer. Spark's ``percentile`` (and
    d16's ``median``) materializes every value of a group inside a single
    task — the documented break-first #2 for a skewed group at 100 TB.
    This is the scale shape instead, riding f3's two-phase global-rank
    machinery *per group*:

    1. range-repartition on (group, value) — Spark's sampled global-sort
       partitioner, so each task holds a bounded value range, never a
       whole group;
    2. per-(partition, group) counts -> exclusive running offsets (a
       nparts x ngroups metadata table, broadcast back), so
       rank0 = offset + local row_number - 1 is the group-wide 0-based
       sort index with only partition-local sorting;
    3. the quantile positions pos = (n_g - 1) * q need exactly the values
       at ranks floor(pos) and min(floor(pos)+1, n_g-1): a ~18-row
       broadcast "need" table (group x 3 quantiles x 2 sides) equi-joins
       on (group, rank0) and a conditional agg interpolates with the LERP
       form v_lo * (1 - frac) + v_hi * frac — the exact IEEE expression
       percentile_cont evaluates (the algebraically-equal
       v_lo + frac * (v_hi - v_lo) differs in the last ulp and flipped a
       rounding boundary at sf0.001) — hash-checked against d8's oracle.

    Memory per task is the partition slice, not the group; every phase is
    a JVM-side exchange or broadcast. The only new shuffles are the
    counts agg (nparts x ngroups rows) and the final 9-row agg."""
    from pyspark.sql import Window as _W

    nparts = 32
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    ranged = li.repartitionByRange(
        nparts, F.col("l_returnflag"), F.col("l_extendedprice")
    ).withColumn("pid", F.spark_partition_id())

    counts = ranged.groupBy("pid", "l_returnflag").agg(
        F.count(F.lit(1)).alias("n")
    )
    wcum = (
        _W.partitionBy("l_returnflag")
        .orderBy("pid")
        .rowsBetween(_W.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("n").over(wcum), F.lit(0).cast("long"))
    ).select("pid", "l_returnflag", "offset")

    totals = counts.groupBy("l_returnflag").agg(F.sum("n").alias("n_g"))
    # which global ranks each quantile needs: floor(pos) and its successor
    # (clamped for the pos == n_g - 1 edge, where frac = 0 and lo == hi)
    targets = (
        totals.select(
            "l_returnflag",
            "n_g",
            F.explode(
                F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
            ).alias("q"),
        )
        .withColumn("pos", (F.col("n_g") - 1).cast("double") * F.col("q"))
        .withColumn("k_lo", F.floor("pos").cast("long"))
        .withColumn("frac", F.col("pos") - F.col("k_lo"))
    )
    need = targets.select(
        "l_returnflag",
        "q",
        "frac",
        F.explode(
            F.array(
                F.struct(F.col("k_lo").alias("k"), F.lit("lo").alias("side")),
                F.struct(
                    F.least(F.col("k_lo") + 1, F.col("n_g") - 1).alias("k"),
                    F.lit("hi").alias("side"),
                ),
            )
        ).alias("t"),
    ).select("l_returnflag", "q", "frac", F.col("t.k").alias("k"), "t.side")

    wlocal = _W.partitionBy("pid", "l_returnflag").orderBy("l_extendedprice")
    indexed = ranged.join(F.broadcast(offsets), ["pid", "l_returnflag"]).select(
        "l_returnflag",
        "l_extendedprice",
        (F.col("offset") + F.row_number().over(wlocal) - 1).alias("rank0"),
    )
    picked = indexed.join(
        F.broadcast(need),
        ["l_returnflag"],
    ).filter(F.col("rank0") == F.col("k"))

    per_q = picked.groupBy("l_returnflag", "q", "frac").agg(
        F.max(
            F.when(F.col("side") == "lo", F.col("l_extendedprice"))
        ).alias("v_lo"),
        F.max(
            F.when(F.col("side") == "hi", F.col("l_extendedprice"))
        ).alias("v_hi"),
    )
    v = F.col("v_lo") * (F.lit(1.0) - F.col("frac")) + F.col("v_hi") * F.col(
        "frac"
    )
    return per_q.groupBy("l_returnflag").agg(
        r2(F.max(F.when(F.col("q") == 0.25, v))).alias("p25"),
        r2(F.max(F.when(F.col("q") == 0.50, v))).alias("median"),
        r2(F.max(F.when(F.col("q") == 0.75, v))).alias("p75"),
    )
