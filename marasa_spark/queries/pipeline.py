"""Group M — data-pipeline management operators (north-star extensions
beyond SURVEY.md §2: the operations a large-scale training-data pipeline
runs around its queries — deterministic sampling, profiling, histograms,
integrity audits, partitioned layout, time-grid gap fill).

Scale notes (100 TB):
* hash sampling — stateless per-row predicate, no shuffle at all; rates
  compose with partition pruning (the sample of a partition = the
  partition of a sample).
* profiling — one pass per metric family; distinct counts are the only
  shuffle and are per-column independent (run in one job via unioned
  aggregates; swap exact distinct for HLL at real scale — d9 shows the
  tolerance harness).
* partitioned sink — directory-partitioned parquet is THE layout lever:
  a filter on the partition key prunes entire directories before any IO
  (plan-audited in tests/test_plan_audit.py).
* gap fill — grid size is users × hours, generated from per-user bounds
  (sequence + explode), never a global cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.queries._util import fresh_scratch, r2, r2sql
from marasa_spark.registry import register

# ---------------------------------------------------------------------------
# a6 — directory-partitioned parquet sink + pruned read-back
# ---------------------------------------------------------------------------

A6_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n, {r2sql("sum(o_totalprice)")} AS sum_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


@register("a6_sink_partitioned", oracle=A6_ORACLE, group="A")
def a6_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned parquet sink: write orders partitioned by
    o_orderpriority, read back with a partition filter — the filter must
    prune directories (PartitionFilters in the scan, plan-audited), which
    at 100 TB is the difference between scanning 2/5 and 5/5 of the table."""
    d = fresh_scratch("a6_part", sf_dir)
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.partitionBy("o_orderpriority").mode("overwrite").parquet(d)
    back = spark.read.parquet(d).filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        r2(F.sum("o_totalprice")).alias("sum_price"),
    )


# ---------------------------------------------------------------------------
# m1/m2 — deterministic hash sampling (reproducible across engines & runs)
# ---------------------------------------------------------------------------

M1_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
"""


@register("m1_sample_hash", oracle=M1_ORACLE, group="M")
def m1_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/16 sample: first hex digit of md5(key) — stateless,
    shuffle-free, identical on every engine and every run (unlike
    df.sample, whose seed is partitioning-dependent). The sampling
    predicate composes with pushdown: Catalyst evaluates it at the scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


M2_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)
      < CASE WHEN c_mktsegment = 'BUILDING' THEN '8' ELSE '2' END
"""


@register("m2_stratified_sample", oracle=M2_ORACLE, group="M")
def m2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum rates (1/2 for the
    over-sampled BUILDING segment, 1/8 elsewhere) via a rate lookup on the
    same md5 ordering — the class-rebalancing primitive of a training-data
    pipeline, still stateless and shuffle-free."""
    c = load_table(spark, sf_dir, "customer")
    rate = F.when(F.col("c_mktsegment") == "BUILDING", F.lit("8")).otherwise(
        F.lit("2")
    )
    return c.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 1) < rate
    ).select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# m3 — column profiling (the data-quality pass before any training run)
# ---------------------------------------------------------------------------

M3_ORACLE = """
SELECT 'o_orderkey' AS col_name, count(*) AS n,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
       CAST(min(o_orderkey) AS DOUBLE) AS min_val,
       CAST(max(o_orderkey) AS DOUBLE) AS max_val
FROM orders
UNION ALL
SELECT 'o_custkey', count(*),
       CAST(count(*) - count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
FROM orders
UNION ALL
SELECT 'o_totalprice', count(*),
       CAST(count(*) - count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
FROM orders
"""


@register("m3_profile_stats", oracle=M3_ORACLE, group="M")
def m3_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (count / nulls / distinct / min / max per column) in
    long form — the schema-audit pass. Exact distinct per column is the
    only shuffle; at real scale swap in approx_count_distinct (d9 shows
    the tolerance harness)."""
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for col in ["o_orderkey", "o_custkey", "o_totalprice"]:
        parts.append(
            o.agg(
                F.lit(col).alias("col_name"),
                F.count(F.lit(1)).alias("n"),
                (F.count(F.lit(1)) - F.count(col)).alias("n_null"),
                F.countDistinct(col).alias("n_distinct"),
                F.min(col).cast("double").alias("min_val"),
                F.max(col).cast("double").alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# m4 — fixed-width histogram (distribution sketch for feature columns)
# ---------------------------------------------------------------------------

_M4_W = "CAST(30000 AS DOUBLE)"

M4_ORACLE = f"""
SELECT CAST(least(floor(o_totalprice / {_M4_W}), 19) AS BIGINT) AS bin,
       CAST(least(floor(o_totalprice / {_M4_W}), 19) AS DOUBLE) * {_M4_W} AS bin_lo,
       count(*) AS n,
       {r2sql("sum(o_totalprice)")} AS sum_val
FROM orders
GROUP BY 1, 2
"""


@register("m4_histogram", oracle=M4_ORACLE, group="M")
def m4_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 bins of 30k, top bin open) of order value —
    a single hash aggregate over a computed bin key; the profile-pass
    shape for numeric feature columns."""
    o = load_table(spark, sf_dir, "orders")
    w = F.lit(30000.0)
    bin_ = F.least(F.floor(F.col("o_totalprice") / w), F.lit(19)).cast("long")
    return (
        o.select(
            bin_.alias("bin"),
            (bin_.cast("double") * w).alias("bin_lo"),
            "o_totalprice",
        )
        .groupBy("bin", "bin_lo")
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("o_totalprice")).alias("sum_val"))
    )


# ---------------------------------------------------------------------------
# m5 — referential-integrity audit (anti joins as a data-quality gate)
# ---------------------------------------------------------------------------

M5_ORACLE = """
SELECT 'orders->customer' AS relation,
       (SELECT count(*) FROM orders) AS n_child,
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
       ) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'supplier->nation',
       (SELECT count(*) FROM supplier),
       (SELECT count(*) FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
"""


@register("m5_ri_audit", oracle=M5_ORACLE, group="M")
def m5_ri_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts via left-anti joins for
    three foreign keys — the ingestion gate that catches broken upstream
    extracts. Anti joins broadcast the parent key set when small; counts
    are map-side partials."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")

    def audit(label: str, child: DataFrame, parent: DataFrame, ck: str, pk: str):
        orphans = child.join(parent, child[ck] == parent[pk], "left_anti")
        return (
            child.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("n_orphans")))
            .select(F.lit(label).alias("relation"), "n_child", "n_orphans")
        )

    return (
        audit("orders->customer", o, c, "o_custkey", "c_custkey")
        .unionAll(audit("lineitem->orders", li, o, "l_orderkey", "o_orderkey"))
        .unionAll(audit("supplier->nation", s, n, "s_nationkey", "n_nationkey"))
    )


# ---------------------------------------------------------------------------
# m6 — time-grid gap fill (resample + forward fill for sparse telemetry)
# ---------------------------------------------------------------------------

M6_ORACLE = f"""
WITH hr AS (
  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
         {r2sql("sum(value)")} AS v
  FROM events GROUP BY user_id, h
), rng AS (
  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hr GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
  FROM rng
)
SELECT g.user_id, g.hour,
       last_value(hr.v IGNORE NULLS) OVER
         (PARTITION BY g.user_id ORDER BY g.hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM grid g LEFT JOIN hr ON hr.user_id = g.user_id AND hr.h = g.hour
"""


@register("m6_gap_fill", oracle=M6_ORACLE, group="M")
def m6_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + last-observation-carried-forward per user: the
    dense time grid comes from per-user (min, max) bounds via
    sequence+explode — never a global time × user cross join — then one
    window pass fills gaps. Grid and fill share the user_id partitioning,
    so the whole op is two shuffles (agg, window) regardless of scale."""
    ev = load_table(spark, sf_dir, "events")
    hr = (
        ev.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(r2(F.sum("value")).alias("v"))
    )
    grid = (
        hr.groupBy("user_id")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            F.col("user_id").alias("g_user"),
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    joined = grid.join(
        hr,
        (F.col("g_user") == F.col("user_id")) & (F.col("hour") == F.col("h")),
        "left",
    ).select(F.col("g_user").alias("user_id"), "hour", "v")
    w = (
        W.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "hour",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


# ---------------------------------------------------------------------------
# m7 — salted aggregation (explicit hot-key skew mitigation, result-exact)
# ---------------------------------------------------------------------------

M7_ORACLE = """
SELECT l_returnflag,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       count(*)                        AS cnt,
       CAST(min(l_quantity) AS DOUBLE) AS min_qty,
       CAST(max(l_quantity) AS DOUBLE) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


@register("m7_salted_agg", oracle=M7_ORACLE, group="M")
def m7_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a deliberately low-cardinality key
    (3 return flags over the whole fact table — exactly the shape where one
    reducer would own a third of 100 TB): a random salt fans each key over
    16 partitions for the partial phase, a second tiny aggregate removes
    the salt. The oracle pins that salting is RESULT-exact for algebraic
    aggregates (sum over integral doubles, count, min, max)."""
    from marasa_spark.ops.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": F.sum("l_quantity"),
            "cnt": F.count(F.lit(1)),
            "min_qty": F.min("l_quantity"),
            "max_qty": F.max("l_quantity"),
        },
    )
    return out.select(
        "l_returnflag",
        F.col("sum_qty").cast("long").alias("sum_qty"),
        "cnt",
        F.col("min_qty").cast("double").alias("min_qty"),
        F.col("max_qty").cast("double").alias("max_qty"),
    )


# ---------------------------------------------------------------------------
# m8 — shuffle reuse: one exchange feeding two aggregations (plan-audited)
# ---------------------------------------------------------------------------

M8_ORACLE = f"""
WITH daily AS (
  SELECT o_orderpriority, o_orderdate, {r2sql("sum(o_totalprice)")} AS rev
  FROM orders GROUP BY o_orderpriority, o_orderdate
)
SELECT a.o_orderpriority,
       {r2sql("max(a.rev)")} AS peak_day,
       {r2sql("avg(a.rev)", 4)} AS avg_day
FROM daily a
GROUP BY a.o_orderpriority
"""


@register("m8_exchange_reuse", oracle=M8_ORACLE, group="M")
def m8_exchange_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregations over the same shuffled base (peak and average daily
    revenue per priority) written as separate branches joined back — Spark
    must compute the base exchange ONCE and reuse it (ReusedExchange,
    plan-audited): the 100 TB pattern for fan-out analytics over one
    expensive shuffle."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderpriority", "o_orderdate").agg(
        r2(F.sum("o_totalprice")).alias("rev")
    )
    peak = daily.groupBy("o_orderpriority").agg(r2(F.max("rev")).alias("peak_day"))
    avg = daily.groupBy("o_orderpriority").agg(r2(F.avg("rev"), 4).alias("avg_day"))
    return peak.join(avg, "o_orderpriority")


# ---------------------------------------------------------------------------
# m9-m12 — event analytics over the pipeline: funnel, cohort retention,
# snapshot diff, SCD2 dimension build
# ---------------------------------------------------------------------------

M9_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase
"""


@register("m9_funnel", oracle=M9_ORACLE, group="M")
def m9_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per user, the first view,
    the first click strictly after it, the first purchase strictly after
    that. ONE shuffle: collect each user's (ts, event) list, sort, fold with
    a 3-slot state struct (`aggregate`, JVM codegen) — versus the oracle's
    three cascaded join+min CTEs. Per-user arrays bound memory by max user
    activity; at 100 TB hyperactive users would be windowed first."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    evs = F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type")))
    nullts = F.lit(None).cast("timestamp")
    state = F.struct(nullts.alias("v"), nullts.alias("c"), nullts.alias("p"))

    def step(acc, x):
        take_v = acc["v"].isNull() & (x["event_type"] == "view")
        take_c = (
            acc["v"].isNotNull() & acc["c"].isNull()
            & (x["event_type"] == "click") & (x["ts"] > acc["v"])
        )
        take_p = (
            acc["c"].isNotNull() & acc["p"].isNull()
            & (x["event_type"] == "purchase") & (x["ts"] > acc["c"])
        )
        return F.struct(
            F.when(take_v, x["ts"]).otherwise(acc["v"]).alias("v"),
            F.when(take_c, x["ts"]).otherwise(acc["c"]).alias("c"),
            F.when(take_p, x["ts"]).otherwise(acc["p"]).alias("p"),
        )

    per_user = (
        ev.groupBy("user_id")
        .agg(F.aggregate(evs, state, step).alias("f"))
        .select("f.v", "f.c", "f.p")
    )
    return per_user.agg(
        F.count("v").alias("n_view"),
        F.count("c").alias("n_click"),
        F.count("p").alias("n_purchase"),
    )


M10_ORACLE = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
),
coh AS (
  SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_week FROM uw
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_offset,
       count(*) AS n_users
FROM coh
GROUP BY cohort_week, week_offset
"""


@register("m10_retention_cohort", oracle=M10_ORACLE, group="M")
def m10_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week, counted
    in each later week they return. Dedup to (user, week) FIRST — the window
    and final aggregate then run over the tiny deduped set, so the raw-event
    shuffle happens exactly once (count(*), not count(distinct), thereafter)."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    ).distinct()
    coh = uw.withColumn("cohort_week", F.min("wk").over(W.partitionBy("user_id")))
    return (
        coh.withColumn(
            "week_offset", (F.datediff("wk", "cohort_week") / F.lit(7)).cast("int")
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


M11_ORACLE = """
WITH s1 AS (
  SELECT user_id, event_type, event_id FROM (
    SELECT user_id, event_type, event_id,
           row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts <= TIMESTAMP '2024-01-03 00:00:00'
  ) WHERE rn = 1
),
s2 AS (
  SELECT user_id, event_type, event_id FROM (
    SELECT user_id, event_type, event_id,
           row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT CASE WHEN s1.user_id IS NULL THEN 'added'
            WHEN s1.event_id <> s2.event_id THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       count(*) AS n_keys
FROM s2 LEFT JOIN s1 USING (user_id, event_type)
GROUP BY change_type
"""


@register("m11_snapshot_diff", oracle=M11_ORACLE, group="M")
def m11_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC-style): latest state per (user, event_type) key at
    an early cutoff vs now, classified added/changed/unchanged. Both
    snapshots are argmax-by-(ts, event_id) aggregates — max(struct), not a
    sort — and the diff join is co-partitioned on the same grouping key."""
    ev = load_table(spark, sf_dir, "events")

    def latest(df: DataFrame, prefix: str) -> DataFrame:
        top = F.max(F.struct("ts", "event_id")).alias("t")
        return df.groupBy("user_id", "event_type").agg(top).select(
            "user_id", "event_type", F.col("t.event_id").alias(f"{prefix}_event_id")
        )

    s1 = latest(ev.filter(F.col("ts") <= F.lit("2024-01-03 00:00:00").cast("timestamp")), "s1")
    s2 = latest(ev, "s2")
    diff = s2.join(s1, ["user_id", "event_type"], "left")
    return (
        diff.withColumn(
            "change_type",
            F.when(F.col("s1_event_id").isNull(), F.lit("added"))
            .when(F.col("s1_event_id") != F.col("s2_event_id"), F.lit("changed"))
            .otherwise(F.lit("unchanged")),
        )
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


M12_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events WHERE user_id < 20
),
changes AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type AS state, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
FROM changes
"""


@register("m12_scd2_build", oracle=M12_ORACLE, group="M")
def m12_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from an event stream: keep state-change
    rows (lag filter), then close each interval with the next change's
    timestamp (lead; NULL = current). One shuffle on user_id serves both
    windows and survives to the output partitioning. Bounded to a user
    slice only to keep oracle rows reviewable."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    changes = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", prev)
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
    )


M13_ORACLE = f"""
WITH c AS (
  SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey
)
SELECT count(*) AS n_keys,
       CAST(max(n) AS BIGINT) AS max_rows,
       {r2sql("max(n) / CAST(sum(n) AS DOUBLE)", 6)} AS top1_share,
       {r2sql("percentile_cont(0.5) WITHIN GROUP (ORDER BY n)")} AS p50_rows,
       {r2sql("percentile_cont(0.99) WITHIN GROUP (ORDER BY n)")} AS p99_rows
FROM c
"""


@register("m13_skew_diag", oracle=M13_ORACLE, group="M")
def m13_skew_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic: rows-per-key distribution (max,
    top-1 share, p50/p99) for a prospective shuffle key. This is the
    profiling pass that decides broadcast vs salt vs AQE-skew-join BEFORE
    burning a 100 TB shuffle; one count aggregate + one tiny stats pass."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    ps = F.percentile(F.col("n"), F.array(F.lit(0.5), F.lit(0.99)))
    return c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_rows"),
        r2(F.max("n").cast("double") / F.sum("n").cast("double"), 6).alias("top1_share"),
        ps.alias("_ps"),
    ).select(
        "n_keys",
        "max_rows",
        "top1_share",
        r2(F.col("_ps")[0]).alias("p50_rows"),
        r2(F.col("_ps")[1]).alias("p99_rows"),
    )


M14_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n, {r2sql("sum(o_totalprice)")} AS sum_price
FROM orders
GROUP BY o_orderpriority
"""


@register("m14_incremental_agg", oracle=M14_ORACLE, group="M")
def m14_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a materialized partial state
    (orders before 1998) merged with a delta batch (the rest) by re-
    aggregating the mergeable (count, sum) states — never rescanning the
    base. The oracle aggregates everything from scratch: merge(partial,
    delta) must equal recompute. Rounding happens only at the final merge,
    so the partial states stay bit-exact."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_part"), F.sum("o_totalprice").alias("sum_part")
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_part").alias("n"),
            r2(F.sum("sum_part")).alias("sum_price"),
        )
    )


M15_ORACLE = """
WITH routed AS (
  SELECT event_id,
         coalesce(array_to_string(list_filter([
           CASE WHEN value < 0 OR value > 5 THEN 'value_range' END,
           CASE WHEN event_type NOT IN ('click','view','purchase','signup') THEN 'unknown_type' END,
           CASE WHEN json_extract(props, '$.k') IS NULL THEN 'bad_props' END
         ], x -> x IS NOT NULL), ','), '') AS reasons
  FROM events
)
SELECT CASE WHEN reasons = '' THEN 'ok' ELSE 'quarantine' END AS status,
       reasons,
       count(*) AS n
FROM routed
GROUP BY status, reasons
"""


@register("m15_quarantine", oracle=M15_ORACLE, group="M")
def m15_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: every record routed ok/quarantine with the FULL
    list of violated rules (not just the first) — rules are a literal array
    of CASE expressions filtered to non-null, so adding a rule is one line
    and the pass stays single-scan, shuffle only on the tiny audit key."""
    ev = load_table(spark, sf_dir, "events")
    reasons = F.array_join(
        F.filter(
            F.array(
                F.when((F.col("value") < 0) | (F.col("value") > 5), F.lit("value_range")),
                F.when(
                    ~F.col("event_type").isin("click", "view", "purchase", "signup"),
                    F.lit("unknown_type"),
                ),
                F.when(
                    F.get_json_object("props", "$.k").isNull(), F.lit("bad_props")
                ),
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return (
        ev.select(reasons.alias("reasons"))
        .withColumn(
            "status",
            F.when(F.col("reasons") == "", F.lit("ok")).otherwise(F.lit("quarantine")),
        )
        .groupBy("status", "reasons")
        .agg(F.count(F.lit(1)).alias("n"))
    )


M16_ORACLE = """
WITH arr AS (
  SELECT user_id, ts,
         max(ts) OVER (PARTITION BY user_id
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       CAST(count(CASE WHEN date_diff('second', ts, high_water) > 3600 THEN 1 END) AS BIGINT) AS n_late,
       CAST(max(date_diff('second', ts, high_water)) AS BIGINT) AS max_lateness_s
FROM arr
GROUP BY user_id
"""


@register("m16_late_audit", oracle=M16_ORACLE, group="M")
def m16_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit: events compared to the running event-time
    high-watermark in ARRIVAL order (simulated deterministically by md5 of
    event_id — the testdata arrives time-sorted, so real arrival order
    would show zero lateness). Per-user running max = one window over the
    user partition; the audit that sizes a stream's withWatermark delay."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.md5(F.col("event_id").cast("string")), "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    lateness = F.unix_timestamp(F.max("ts").over(w)) - F.unix_timestamp("ts")
    return (
        ev.select("user_id", lateness.alias("late_s"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("late_s") > 3600, 1)).alias("n_late"),
            F.max("late_s").alias("max_lateness_s"),
        )
    )


M17_ORACLE = f"""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       {r2sql("list_reduce(list(value ORDER BY ts, event_id),"
              " (acc, x) -> acc * CAST(0.9 AS DOUBLE) + x * CAST(0.1 AS DOUBLE))", 6)} AS ewma
FROM events
GROUP BY user_id
"""


@register("m17_ewma", oracle=M17_ORACLE, group="M")
def m17_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per key (alpha=0.1, seeded
    with the first observation): inherently sequential, expressed as ONE
    shuffle + per-key sorted fold (`aggregate`), the same double-precision
    sequential order as the oracle's list_reduce — bit-compatible. Memory
    is max per-key history; at 100 TB checkpoint the EWMA per day and fold
    only the delta (m14's maintenance pattern)."""
    ev = load_table(spark, sf_dir, "events")
    evs = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    fold = F.aggregate(
        evs,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x["value"]).otherwise(
            acc * F.lit(0.9) + x["value"] * F.lit(0.1)
        ),
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        r2(fold, 6).alias("ewma"),
    )


M18_ORACLE = """
WITH marked AS (
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > 1800000000 THEN 1 ELSE 0 END AS new_sess
    FROM events
), numbered AS (
    SELECT user_id, ts,
           CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS sess_id
    FROM marked
)
SELECT user_id, sess_id, count(*) AS n_events, min(ts) AS sess_start,
       max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
FROM numbered
GROUP BY user_id, sess_id
"""


@register("m18_sessionize", oracle=M18_ORACLE, group="M")
def m18_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min inactivity gap) via lag + running sum —
    the bounded-data twin of i3's streaming session_window, and the shape
    used to backfill history next to a live stream. One shuffle on user_id
    serves the lag window, the session-id window AND the final groupBy
    (same partitioning throughout); the running sum orders by (ts,
    event_id) so duplicate timestamps can't flip session boundaries
    between engines or between runs."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.withColumn(
        "new_sess",
        F.when(us - F.lag(us).over(w) > 1800 * 1000 * 1000, 1).otherwise(0),
    )
    numbered = marked.withColumn("sess_id", F.sum("new_sess").over(w))
    return numbered.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("sess_start"),
        (F.max(us) - F.min(us)).alias("dur_us"),
    )


M19_ORACLE = f"""
WITH stats AS (
    SELECT event_type,
           {r2sql("avg(value)", 6)} AS mu,
           {r2sql("stddev_samp(value)", 6)} AS sigma
    FROM events GROUP BY event_type
)
SELECT event_id, e.event_type, value,
       {r2sql("(value - mu) / sigma")} AS z
FROM events e JOIN stats USING (event_type)
WHERE abs({r2sql("(value - mu) / sigma")}) > 2.5
"""


@register("m19_zscore_outliers", oracle=M19_ORACLE, group="M")
def m19_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly flags. Determinism design: mu/sigma
    are rounded to 6 dp BEFORE the z division (absorbing both engines'
    float-sum ordering noise), so z is bit-identical across engines and the
    |z| > 2.5 cut can't flip a boundary row. Scale: stats is a tiny
    per-type aggregate (map-side combine, then broadcast back onto the
    stream of rows) — the big side is never shuffled."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        r2(F.avg("value"), 6).alias("mu"),
        r2(F.stddev_samp("value"), 6).alias("sigma"),
    )
    z = r2((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


M20_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n,
       {r2sql("sum(CASE WHEN o_orderpriority = '1-URGENT'"
              " THEN o_totalprice * CAST(1.1 AS DOUBLE) ELSE o_totalprice END)")}
           AS sum_price
FROM orders
GROUP BY o_orderpriority
"""


@register("m20_partition_backfill", oracle=M20_ORACLE, group="M")
def m20_partition_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-scoped backfill via DYNAMIC partition overwrite: write the
    full priority-partitioned table, then rewrite ONLY the 1-URGENT
    partition with corrected values — the read-back proves the other four
    partitions survived untouched (any clobber breaks the count and the
    hash). This is the idempotent reprocessing primitive at 100 TB: a bad
    day's data is repaired by overwriting exactly the affected
    date-partitions, never the table; static overwrite mode here would
    silently drop the other partitions."""
    d = fresh_scratch("m20_backfill", sf_dir)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(d)
    corrected = o.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") * F.lit(1.1)
    )
    corrected.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("o_orderpriority").parquet(d)
    back = spark.read.parquet(d)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        r2(F.sum("o_totalprice")).alias("sum_price"),
    )


M21_ORACLE = f"""
SELECT CAST(4 AS BIGINT) AS n_files, count(*) AS n_rows,
       {r2sql("sum(value)")} AS sum_value
FROM events
"""


@register("m21_compaction", oracle=M21_ORACLE, group="M")
def m21_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: a 64-file fragmented layout (the natural
    residue of streaming ingest) is rewritten to 4 right-sized files; the
    result re-reads the compacted layout and PROVES both the file count
    (countDistinct of input_file_name, pinned by the oracle literal) and
    bit-level content preservation (row count + value sum). At 100 TB,
    listing and task-scheduling overhead of millions of tiny files
    dominates jobs long before IO does — periodic compaction to
    ~maxPartitionBytes-sized files is routine maintenance, and 'compaction
    lost/duplicated rows' is the failure mode this hash guards."""
    d = fresh_scratch("m21_compact", sf_dir)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.repartition(64).write.mode("overwrite").parquet(f"{d}/small")
    spark.read.parquet(f"{d}/small").repartition(4).write.mode("overwrite").parquet(
        f"{d}/compact"
    )
    back = spark.read.parquet(f"{d}/compact").select(
        "value", F.col("_metadata.file_path").alias("file_path")
    )
    return back.agg(
        F.countDistinct("file_path").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        r2(F.sum("value")).alias("sum_value"),
    )


M22_ORACLE = """
SELECT 'not_null_custkey' AS check_name,
       CAST(count(*) - count(o_custkey) AS DOUBLE) AS observed,
       CAST(count(*) - count(o_custkey) = 0 AS INT) AS passed
FROM orders
UNION ALL
SELECT 'status_in_domain',
       CAST(count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END)
            AS DOUBLE),
       CAST(count(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 END) = 0
            AS INT)
FROM orders
UNION ALL
SELECT 'price_positive', CAST(min(o_totalprice) AS DOUBLE),
       CAST(min(o_totalprice) > 0 AS INT)
FROM orders
UNION ALL
SELECT 'date_in_range',
       CAST(count(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                         OR o_orderdate >= TIMESTAMP '1999-01-01'
                       THEN 1 END) AS DOUBLE),
       CAST(count(CASE WHEN o_orderdate < TIMESTAMP '1992-01-01'
                         OR o_orderdate >= TIMESTAMP '1999-01-01'
                       THEN 1 END) = 0 AS INT)
FROM orders
UNION ALL
SELECT 'pk_unique', CAST(count(*) - count(DISTINCT o_orderkey) AS DOUBLE),
       CAST(count(*) - count(DISTINCT o_orderkey) = 0 AS INT)
FROM orders
"""


@register("m22_expectations", oracle=M22_ORACLE, group="M")
def m22_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract expectation suite (null counts, value domain, range,
    PK uniqueness) in long form — the gate a pipeline runs BEFORE
    publishing a table, complementing m15's row-level quarantine. All
    checks are aggregates over one table scan each (the PK-uniqueness
    distinct is the only shuffle); thresholds are data-independent
    invariants of the schema contract, so the suite is deterministic at
    every scale factor."""
    o = load_table(spark, sf_dir, "orders")
    lo, hi = F.lit("1992-01-01").cast("timestamp"), F.lit("1999-01-01").cast("timestamp")
    n_null = F.count(F.lit(1)) - F.count("o_custkey")
    n_bad_status = F.count(
        F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
    )
    n_bad_date = F.count(
        F.when((F.col("o_orderdate") < lo) | (F.col("o_orderdate") >= hi), 1)
    )
    n_dup = F.count(F.lit(1)) - F.countDistinct("o_orderkey")
    checks = [
        ("not_null_custkey", n_null, n_null == 0),
        ("status_in_domain", n_bad_status, n_bad_status == 0),
        ("price_positive", F.min("o_totalprice"), F.min("o_totalprice") > 0),
        ("date_in_range", n_bad_date, n_bad_date == 0),
        ("pk_unique", n_dup, n_dup == 0),
    ]
    parts = [
        o.agg(
            F.lit(name).alias("check_name"),
            obs.cast("double").alias("observed"),
            ok.cast("int").alias("passed"),
        )
        for name, obs, ok in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# m23 — partition row-count drift (the cheapest pipeline anomaly detector)
# ---------------------------------------------------------------------------

M23_ORACLE = f"""
SELECT day, n, prev_n,
       {r2sql("CAST(n AS DOUBLE) / CAST(prev_n AS DOUBLE)", 4)} AS ratio,
       CAST(2 * n > 3 * prev_n OR 2 * prev_n > 3 * n AS INT) AS drifted
FROM (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
         lag(count(*)) OVER (ORDER BY CAST(ts AS DATE)) AS prev_n
  FROM (
    SELECT ts FROM events
    UNION ALL
    SELECT ts FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
  ) GROUP BY CAST(ts AS DATE)
)
WHERE prev_n IS NOT NULL
"""


@register("m23_rowcount_drift", oracle=M23_ORACLE, group="M")
def m23_rowcount_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day row-count drift audit: daily ingest volumes with a
    lag-1 ratio, flagging ±50% swings — the first-line anomaly detector a
    pipeline runs on every landed partition (a dropped upstream feed or a
    double-delivery shows up here before any content check). The events
    corpus ingests uniformly (the alarm never fired at any SF — caught
    by the constant-column audit), so a double-delivery of 2024-01-15
    is deterministically simulated via UNION ALL, identically in the
    oracle: that day flags on the way up AND the day after flags on the
    way back down — the detector's both edges exercised. The daily
    counts collapse the table to ~one row per partition-day BEFORE the
    window, so the unpartitioned lag window sorts only days, never rows —
    at 100 TB that is a few thousand rows on one core after a map-side
    combined count."""
    ev = load_table(spark, sf_dir, "events").select("ts")
    ev = ev.unionAll(
        ev.filter(F.to_date("ts") == F.lit("2024-01-15").cast("date"))
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = W.orderBy("day")
    out = daily.withColumn("prev_n", F.lag("n").over(w)).filter(
        F.col("prev_n").isNotNull()
    )
    return out.select(
        "day",
        "n",
        "prev_n",
        r2(F.col("n").cast("double") / F.col("prev_n").cast("double"), 4).alias(
            "ratio"
        ),
        (
            (2 * F.col("n") > 3 * F.col("prev_n"))
            | (2 * F.col("prev_n") > 3 * F.col("n"))
        )
        .cast("int")
        .alias("drifted"),
    )


# ---------------------------------------------------------------------------
# m24 — deterministic fixed-SIZE sample (vs m1's fixed-RATE sample)
# ---------------------------------------------------------------------------

M24_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
LIMIT 200
"""


@register("m24_sample_fixed", oracle=M24_ORACLE, group="M")
def m24_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample: the 200 rows with the smallest
    md5(key) — a reproducible 'random' subset whose SIZE (not rate) is
    pinned, the shape eval sets and debug slices want. Spark plans
    orderBy+limit as TakeOrderedAndProject: each partition keeps a local
    top-200 heap and the driver merges heaps — no global sort, no full
    shuffle, O(n) scan + O(k log k) merge at any scale. The md5 tiebreak
    is total (keys are unique), so the boundary row is engine-independent."""
    o = load_table(spark, sf_dir, "orders")
    key = F.md5(F.col("o_orderkey").cast("string"))
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice", key.alias("_h"))
        .orderBy("_h", "o_orderkey")
        .limit(200)
        .drop("_h")
    )


M25_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         {r2sql("pow(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) / CAST(281474976710656 AS DOUBLE), CAST(1 AS DOUBLE) / n_chars)", 6)} AS pk
  FROM documents
)
SELECT doc_id, n_chars, pk
FROM (
  SELECT doc_id, n_chars, pk,
         row_number() OVER (ORDER BY pk DESC, doc_id) AS rn
  FROM keyed
)
WHERE rn <= 100
"""


@register("m25_weighted_sample", oracle=M25_ORACLE, group="M")
def m25_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each doc draws a reproducible uniform u from an
    md5-derived 48-bit integer and competes with priority u^(1/w)
    (w = n_chars, so longer docs are proportionally likelier) — the top-k
    priorities ARE the weighted sample. This is how a training mix takes
    'n tokens from this source, weighted by quality' reproducibly: no RNG
    state, re-runs and engines agree bit-for-bit, and the top-k is
    TakeOrderedAndProject (per-partition heaps, no global sort). Priority
    is floor-rounded to 6 decimals with a doc_id tiebreak so the k-boundary
    can't flip on a last-ulp pow() difference between runtimes."""
    d = load_table(spark, sf_dir, "documents")
    u48 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
    u = u48.cast("long") / F.lit(float(1 << 48))
    pk = r2(F.pow(u, F.lit(1.0) / F.col("n_chars")), 6)
    keyed = d.select("doc_id", "n_chars", pk.alias("pk"))
    return (
        keyed.orderBy(F.col("pk").desc(), "doc_id").limit(100)
    )


M26_ORACLE = f"""
WITH bucketed AS (
  SELECT doc_id, n_chars,
         CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
       {r2sql("count(*) / CAST((SELECT count(*) FROM documents) AS DOUBLE)", 4)} AS frac
FROM bucketed
GROUP BY split
"""


@register("m26_dataset_split", oracle=M26_ORACLE, group="M")
def m26_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: each doc hashes to a
    bucket in [0,100) from md5(doc_id) and the bucket ranges define the
    80/10/10 split — disjoint and exhaustive BY CONSTRUCTION (one bucket,
    one range), stable across runs/engines/appends (a doc's split never
    changes when the corpus grows, unlike any rank- or random-based
    split, so eval sets can't silently leak into training on re-runs).
    Stateless per-row predicate; the only shuffle is the 3-key summary
    rollup."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long") % 100
    )
    total = d.count()
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
            r2(F.count(F.lit(1)) / F.lit(float(total)), 4).alias("frac"),
        )
    )


# ---------------------------------------------------------------------------
# m27 — Z-order (Morton) layout: 2-D locality for file-stat pruning
# ---------------------------------------------------------------------------

from marasa_spark.ops.layout import z_interleave, z_interleave_sql  # noqa: E402

_M27_Z = z_interleave_sql("l_partkey % 256", "l_suppkey % 256", bits=8)

M27_ORACLE = f"""
WITH z AS (
  SELECT (l_partkey % 256) AS px, (l_suppkey % 256) AS sx,
         {_M27_Z} AS zval
  FROM lineitem
)
SELECT CAST(floor(zval / CAST(4096 AS DOUBLE)) AS BIGINT) AS file_bucket,
       count(*) AS n,
       min(px) AS min_p, max(px) AS max_p,
       min(sx) AS min_s, max(sx) AS max_s
FROM z
GROUP BY file_bucket
"""


@register("m27_zorder_layout", oracle=M27_ORACLE, group="M")
def m27_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout assignment + per-file locality audit. Interleave the
    bits of two scan dimensions (part, supplier — each reduced to 8 bits)
    into a Morton z-value and derive the target file bucket from its HIGH
    bits (z div 4096 → 16 buckets): a stateless per-row expression, so the
    writer needs no global sort, no sampled range boundaries, and no
    single-partition window — every task writes its z-tile independently
    (`repartitionByRange(bucket)` at real scale; a6 shows the partitioned
    sink itself). The output is the audit a lakehouse OPTIMIZE ZORDER job
    prints: each bucket's row count and its min/max span on BOTH
    dimensions — every file covers a ~64×64 rectangle of the 256×256 key
    space, so a predicate on EITHER key prunes ~3/4 of files by min/max
    stats alone (single-key sort would cluster one dimension and leave the
    other's span at 256 = zero pruning)."""
    li = load_table(spark, sf_dir, "lineitem")
    px = F.col("l_partkey") % 256
    sx = F.col("l_suppkey") % 256
    z = z_interleave(px, sx, bits=8)
    return (
        li.select(px.alias("px"), sx.alias("sx"), z.alias("zval"))
        .select(
            F.floor(F.col("zval") / F.lit(4096.0)).cast("long").alias("file_bucket"),
            "px",
            "sx",
        )
        .groupBy("file_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("px").alias("min_p"),
            F.max("px").alias("max_p"),
            F.min("sx").alias("min_s"),
            F.max("sx").alias("max_s"),
        )
    )


# ---------------------------------------------------------------------------
# m29 — heavy hitters: Misra-Gries candidates + exact verification
# ---------------------------------------------------------------------------

from marasa_spark.ops.freq import heavy_hitters_exact  # noqa: E402

M29_ORACLE = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tot AS (SELECT count(*) AS total FROM tok)
SELECT token, count(*) AS n
FROM tok, tot
GROUP BY token, total
HAVING CAST(count(*) AS DOUBLE) >= CAST(0.002 AS DOUBLE) * CAST(total AS DOUBLE)
"""


@register("m29_heavy_hitters", oracle=M29_ORACLE, group="M")
def m29_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (tokens ≥ 0.2% of all tokens) WITHOUT the
    vocabulary-wide shuffle: per-partition Misra-Gries summaries (k=501
    counters, mapInPandas, mergeable-summaries compress — ops/freq.py)
    union into a candidate set that provably contains every true heavy
    hitter; a second pass counts ONLY the candidates exactly (broadcast
    semi-join before the groupBy) and applies the exact threshold, so the
    result is deterministic and identical to the naive full GROUP BY ...
    HAVING the oracle runs. At 100 TB the naive plan shuffles the whole
    vocabulary (the biggest shuffle in the pipeline); this one shuffles
    only candidate tokens — thousands of rows. The MG guarantee and the
    compress path are pinned on adversarial high-cardinality data in
    tests/test_freq.py (this corpus's vocabulary is deliberately tiny)."""
    d = load_table(spark, sf_dir, "documents")
    return heavy_hitters_exact(d, "text", theta=0.002, k=501)


# ---------------------------------------------------------------------------
# m30 — file-skipping min/max index (manifest-pruned scan)
# ---------------------------------------------------------------------------

M30_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n, {r2sql("sum(o_totalprice)")} AS sum_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY o_orderpriority
"""


@register("m30_file_skipping_index", oracle=M30_ORACLE, group="M")
def m30_file_skipping_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max file-skipping index — the table-format manifest trick
    (Iceberg manifests, Delta file stats) as a first-class op. Write the
    table range-clustered on the filter column (repartitionByRange →
    every file owns a contiguous o_orderdate slice), persist a per-file
    (min, max) manifest as a parquet TABLE beside the data (write-time
    metadata, like an Iceberg manifest — ops/manifest.py), then answer a
    6-month window query by scanning ONLY the files whose [min, max]
    overlaps it. The prune is a JVM-side filter over the manifest
    DataFrame; the sole driver crossing is the FINAL path list, bounded
    by files-that-survive (≈2 here), never files-that-exist — the shape
    the round-5 verdict asked for in place of the collect-everything
    manifest. Result is identical to the full-table filter BY
    CONSTRUCTION (skipped files can contain no qualifying rows — the
    min/max bound is sound), which is what the oracle checks; the
    files-actually-skipped claim AND the filter-before-collect plan shape
    are pinned in tests/test_layout.py. At 100 TB this is the difference
    between opening ~8% and 100% of files for a 6-month window over 6.5
    years — with a manifest that stays columnar however many entries it
    holds."""
    import datetime

    from marasa_spark.ops.manifest import overlaps, read_pruned, write_manifest

    d = fresh_scratch("m30_idx", sf_dir)
    load_table(spark, sf_dir, "orders").repartitionByRange(
        8, "o_orderdate"
    ).write.mode("overwrite").parquet(d)
    write_manifest(spark, d, ["o_orderdate"])
    lo = datetime.datetime(1996, 1, 1)
    hi = datetime.datetime(1996, 7, 1)
    pruned = read_pruned(spark, d, overlaps("o_orderdate", lo, hi))
    return (
        pruned.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("o_totalprice")).alias("sum_price"),
        )
    )


# ---------------------------------------------------------------------------
# m31 — Z-order layout + 2-D partition-pruned probe (m27∘a6 end-to-end)
# ---------------------------------------------------------------------------

M31_ORACLE = f"""
SELECT count(*) AS n, {r2sql("sum(l_quantity)")} AS sum_qty
FROM lineitem
WHERE (l_partkey % 256) BETWEEN 32 AND 95
  AND (l_suppkey % 256) BETWEEN 100 AND 163
"""


@register("m31_zorder_skipping", oracle=M31_ORACLE, group="M")
def m31_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The m27 claim exercised end-to-end: write lineitem
    directory-partitioned by its Morton z-bucket (16 dirs, each a 64×64
    rectangle of the part×supplier key space), then answer a 2-D range
    probe by first pruning buckets whose rectangle cannot overlap the
    probe window — the bucket predicate is a PartitionFilter, so entire
    directories are skipped before any IO (a6's machinery) — and only
    then applying the row-level predicate. The 64×64 probe here overlaps
    4 of 16 buckets: a single-key sort layout would prune on one
    dimension only (4/16 on part, 16/16 on supplier); z-order prunes on
    BOTH. Bucket selection is pure driver-side arithmetic over the 16
    rectangle bounds (no data read); pinned in tests/test_layout.py."""
    from marasa_spark.ops.layout import z_interleave

    d = fresh_scratch("m31_zidx", sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    px = (F.col("l_partkey") % 256).alias("px")
    sx = (F.col("l_suppkey") % 256).alias("sx")
    zb = F.floor(
        z_interleave(F.col("px"), F.col("sx"), bits=8) / F.lit(4096.0)
    ).cast("int")
    li.select(px, sx, "l_quantity").withColumn("zb", zb).write.partitionBy(
        "zb"
    ).mode("overwrite").parquet(d)
    # rectangle bounds per bucket are arithmetic, not data: bucket b covers
    # px in [64*(b div 2 mod 2)+... ] — derived from the interleave's top
    # 4 bits (bit15=sx7, bit14=px7, bit13=sx6, bit12=px6)
    p_lo, p_hi, s_lo, s_hi = 32, 95, 100, 163
    hit = [
        b
        for b in range(16)
        if not (
            64 * (((b >> 2) & 1) * 2 + (b & 1)) > p_hi
            or 64 * (((b >> 2) & 1) * 2 + (b & 1)) + 63 < p_lo
            or 64 * (((b >> 3) & 1) * 2 + ((b >> 1) & 1)) > s_hi
            or 64 * (((b >> 3) & 1) * 2 + ((b >> 1) & 1)) + 63 < s_lo
        )
    ]
    back = spark.read.parquet(d).filter(F.col("zb").isin(hit))
    return (
        back.filter(
            F.col("px").between(p_lo, p_hi) & F.col("sx").between(s_lo, s_hi)
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("l_quantity")).alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# m32 — Hilbert-curve layout (the locality-superior sibling of m27)
# ---------------------------------------------------------------------------

from marasa_spark.ops.layout import hilbert_sql, with_hilbert  # noqa: E402

_M32_BASE = (
    "(SELECT (l_partkey % 64) AS x, (l_suppkey % 64) AS y FROM lineitem)"
)

M32_ORACLE = f"""
WITH h AS (
  {hilbert_sql(_M32_BASE, ["x", "y"], bits=6)}
)
SELECT CAST(floor(hval / CAST(256 AS DOUBLE)) AS BIGINT) AS file_bucket,
       count(*) AS n,
       min(x) AS min_p, max(x) AS max_p,
       min(y) AS min_s, max(y) AS max_s
FROM h
GROUP BY file_bucket
"""


@register("m32_hilbert_layout", oracle=M32_ORACLE, group="M")
def m32_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout assignment + the m27 locality audit, on a 64×64
    grid (part, supplier each reduced to 6 bits; 16 file buckets of 256
    curve positions). Hilbert dominates Morton for file skipping because
    the curve NEVER jumps: consecutive positions are always grid
    neighbors, so a contiguous curve range — i.e. a file — is one
    connected blob with a tight bounding box, where Morton's quadrant
    seams give some files full-width spans. The property is pinned in
    tests/test_layout.py (unit-step adjacency over the whole grid +
    mean bounding-box area vs m27 on the same data). Like m27 the bucket
    is a stateless per-row expression chain — no global sort, no sampled
    boundaries; the stateful per-level rotation is materialized as
    columns, still wholly JVM-side."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        (F.col("l_partkey") % 64).alias("x"), (F.col("l_suppkey") % 64).alias("y")
    )
    h = with_hilbert(base, F.col("x"), F.col("y"), out="hval", bits=6)
    return (
        h.select(
            F.floor(F.col("hval") / F.lit(256.0)).cast("long").alias("file_bucket"),
            "x",
            "y",
        )
        .groupBy("file_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("min_p"),
            F.max("x").alias("max_p"),
            F.min("y").alias("min_s"),
            F.max("y").alias("max_s"),
        )
    )


# ---------------------------------------------------------------------------
# m33 — 3-D Z-order: the N-dimensional generalization of m27
# ---------------------------------------------------------------------------

from marasa_spark.ops.layout import z_interleave_nd, z_interleave_nd_sql  # noqa: E402

_M33_Z = z_interleave_nd_sql(
    ["l_partkey % 16", "l_suppkey % 16", "month(l_shipdate) - 1"], bits=4
)

M33_ORACLE = f"""
WITH z AS (
  SELECT (l_partkey % 16) AS px, (l_suppkey % 16) AS sx,
         (month(l_shipdate) - 1) AS mx,
         {_M33_Z} AS zval
  FROM lineitem
)
SELECT CAST(floor(zval / CAST(256 AS DOUBLE)) AS BIGINT) AS file_bucket,
       count(*) AS n,
       min(px) AS min_p, max(px) AS max_p,
       min(sx) AS min_s, max(sx) AS max_s,
       min(mx) AS min_m, max(mx) AS max_m
FROM z
GROUP BY file_bucket
"""


@register("m33_zorder_3d", oracle=M33_ORACLE, group="M")
def m33_zorder_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-dimensional Z-order (part × supplier × ship-month, 4 bits
    each): the co-clustering a fact table wants when queries filter on any
    subset of three dimensions. Each of the 16 file buckets (256 curve
    positions) covers a bounded BOX of the 16×16×12 key space, so min/max
    file stats prune on one-, two- or three-column predicates alike —
    single-key sorting would leave two of the three spans at full width.
    Same stateless per-row arithmetic as m27 at N=3; the audit emits each
    bucket's span on all three dimensions."""
    li = load_table(spark, sf_dir, "lineitem")
    px = F.col("l_partkey") % 16
    sx = F.col("l_suppkey") % 16
    mx = F.month("l_shipdate") - 1
    z = z_interleave_nd([px, sx, mx], bits=4)
    return (
        li.select(px.alias("px"), sx.alias("sx"), mx.alias("mx"), z.alias("zval"))
        .select(
            F.floor(F.col("zval") / F.lit(256.0)).cast("long").alias("file_bucket"),
            "px", "sx", "mx",
        )
        .groupBy("file_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("px").alias("min_p"), F.max("px").alias("max_p"),
            F.min("sx").alias("min_s"), F.max("sx").alias("max_s"),
            F.min("mx").alias("min_m"), F.max("mx").alias("max_m"),
        )
    )


# ---------------------------------------------------------------------------
# m34 — MERGE INTO (upsert): matched -> update, not-matched -> insert
# ---------------------------------------------------------------------------

M34_ORACLE = f"""
WITH target AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
), source AS (
  SELECT c_custkey, c_name,
         c_acctbal + CAST(100 AS DOUBLE) AS c_acctbal
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
       COALESCE(s.c_name, t.c_name) AS c_name,
       {r2sql("COALESCE(s.c_acctbal, t.c_acctbal)")} AS c_acctbal,
       CASE WHEN s.c_custkey IS NULL THEN 'unchanged'
            WHEN t.c_custkey IS NULL THEN 'inserted'
            ELSE 'updated' END AS merge_action
FROM target t
FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
"""


@register("m34_merge_upsert", oracle=M34_ORACLE, group="M")
def m34_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the Delta/Iceberg upsert verb) as a pure
    DataFrame op: WHEN MATCHED THEN UPDATE, WHEN NOT MATCHED THEN INSERT,
    expressed as one full-outer join on the merge key with per-column
    COALESCE(source, target) — plus a merge_action audit column (the
    row-level provenance Delta's MERGE metrics aggregate). Target =
    customers missing every 3rd key (so the source genuinely inserts);
    source = even-keyed customers with shifted balances (so it genuinely
    updates).

    100 TB: one shuffle per side on the merge key — the irreducible cost
    of hash-MERGE; AQE handles skewed keys. A real table format narrows
    the REWRITE (only files containing matched keys are rewritten —
    exactly the file set m30's manifest machinery identifies by joining
    source keys against per-file key min/max); the row-level semantics
    are these. Broadcast the source when it is dimension-sized."""
    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    source = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey"),
        F.col("c_name"),
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
    )
    t, s = target.alias("t"), source.alias("s")
    return t.join(s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer").select(
        F.coalesce(F.col("s.c_custkey"), F.col("t.c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("s.c_name"), F.col("t.c_name")).alias("c_name"),
        r2(F.coalesce(F.col("s.c_acctbal"), F.col("t.c_acctbal"))).alias("c_acctbal"),
        F.when(F.col("s.c_custkey").isNull(), F.lit("unchanged"))
        .when(F.col("t.c_custkey").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("merge_action"),
    )


# ---------------------------------------------------------------------------
# m35 — schema evolution: mergeSchema read over batches written with
# different schemas (add-column + backfill-as-NULL)
# ---------------------------------------------------------------------------

M35_ORACLE = """
WITH unified AS (
  SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT COALESCE(o_orderpriority, '__LEGACY__') AS o_orderpriority,
       count(*) AS n,
       count(o_orderpriority) AS n_with_col
FROM unified
GROUP BY COALESCE(o_orderpriority, '__LEGACY__')
"""


@register("m35_schema_evolution", oracle=M35_ORACLE, group="M")
def m35_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive schema evolution, exercised through the real machinery:
    batch 1 lands WITHOUT o_orderpriority (the v1 writer), batch 2 lands
    WITH it (the v2 writer, same directory), and the read side unifies
    them via parquet mergeSchema — old files surface the new column as
    NULL (backfill-as-NULL, the Delta/Iceberg add-column contract; no
    file is rewritten). The aggregate pins both halves: n_with_col counts
    only v2 rows, the '__LEGACY__' bucket is exactly the v1 rows.

    100 TB: add-column is a metadata-only operation — this op proves the
    read path needs nothing else. mergeSchema reconciles footers (one
    metadata pass, no data IO); at real scale the table format pins the
    schema in its log instead of re-reading footers, same read
    semantics. Column pruning still works: a query not touching the new
    column reads v1 files untouched."""
    d = fresh_scratch("m35_evo", sf_dir)
    o = load_table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(d)
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("append").parquet(d)
    back = spark.read.option("mergeSchema", "true").parquet(d)
    return back.groupBy(
        F.coalesce(F.col("o_orderpriority"), F.lit("__LEGACY__")).alias(
            "o_orderpriority"
        )
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderpriority").alias("n_with_col"),
    )


# ---------------------------------------------------------------------------
# m36 — metadata-only aggregates: count/min/max served from the manifest
# ---------------------------------------------------------------------------

M36_ORACLE = """
SELECT count(*) AS n_rows,
       min(o_orderdate) AS min_date,
       max(o_orderdate) AS max_date
FROM orders
"""


@register("m36_metadata_only_agg", oracle=M36_ORACLE, group="M")
def m36_metadata_only_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only query answering — the table-format trick where
    count(*)/min/max never touch data: fold the per-file manifest
    (n_rows, min, max — ops/manifest.py) instead of scanning the table.
    sum(n_rows) is exact because every row belongs to exactly one file;
    min-of-mins / max-of-maxs are exact because file stats are tight
    bounds computed from the rows themselves. The oracle runs the full
    scan; the op reads KB of manifest — at 100 TB this is the difference
    between a metadata lookup and a 100 TB scan (Iceberg answers these
    from manifest totals, Spark's own OptimizeMetadataOnlyQuery does it
    for partition keys only). The equality pin in tests/test_layout.py
    also guards manifest staleness discipline: the manifest is written
    inside the table write, never recomputed lazily."""
    from marasa_spark.ops.manifest import manifest_dir, write_manifest

    d = fresh_scratch("m36_meta", sf_dir)
    load_table(spark, sf_dir, "orders").repartitionByRange(
        8, "o_orderdate"
    ).write.mode("overwrite").parquet(d)
    write_manifest(spark, d, ["o_orderdate"])
    m = spark.read.parquet(manifest_dir(d))
    return m.agg(
        F.sum("n_rows").alias("n_rows"),
        F.min("min_o_orderdate").alias("min_date"),
        F.max("max_o_orderdate").alias("max_date"),
    )


# ---------------------------------------------------------------------------
# m37 — MERGE with DELETE clause (the full three-verb MERGE surface)
# ---------------------------------------------------------------------------

M37_ORACLE = f"""
WITH target AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
), source AS (
  SELECT c_custkey,
         c_acctbal + CAST(100 AS DOUBLE) AS c_acctbal,
         CASE WHEN c_custkey % 10 = 0 THEN 'delete' ELSE 'upsert' END AS action
  FROM customer WHERE c_custkey % 2 = 0
), merged AS (
  SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
         {r2sql("COALESCE(s.c_acctbal, t.c_acctbal)")} AS c_acctbal,
         CASE WHEN s.c_custkey IS NULL THEN 'unchanged'
              WHEN s.action = 'delete' AND t.c_custkey IS NOT NULL THEN 'deleted'
              WHEN s.action = 'delete' THEN 'noop_delete'
              WHEN t.c_custkey IS NULL THEN 'inserted'
              ELSE 'updated' END AS merge_action
  FROM target t
  FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
)
SELECT merge_action, count(*) AS n, {r2sql("sum(c_acctbal)")} AS sum_bal
FROM merged
WHERE merge_action IN ('unchanged', 'updated', 'inserted')
GROUP BY merge_action
"""


@register("m37_merge_delete", oracle=M37_ORACLE, group="M")
def m37_merge_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full three-verb MERGE (Delta's complete surface): WHEN MATCHED
    AND action='delete' THEN DELETE, WHEN MATCHED THEN UPDATE, WHEN NOT
    MATCHED [AND action<>'delete'] THEN INSERT — one full-outer join with
    a verb-resolution CASE, then the delete/no-op verbs filtered out of
    the survivors. A source 'delete' for a key absent from the target is
    a no-op (ANSI MERGE: NOT MATCHED clauses never fire DELETE). The
    registered result is the per-verb survivor summary (count + balance
    mass), which pins both the row routing and the arithmetic.

    100 TB: identical movement to m34 (one shuffle per side on the merge
    key); DELETE adds zero data movement — it is a filter on the joined
    stream, and in a table format it shrinks the rewrite (deleted rows
    simply don't land in the rewritten files)."""
    c = load_table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") % 3 != 0).select("c_custkey", "c_acctbal")
    source = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey"),
        (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal"),
        F.when(F.col("c_custkey") % 10 == 0, F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("action"),
    )
    t, s = target.alias("t"), source.alias("s")
    merged = t.join(
        s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer"
    ).select(
        F.coalesce(F.col("s.c_custkey"), F.col("t.c_custkey")).alias("c_custkey"),
        r2(F.coalesce(F.col("s.c_acctbal"), F.col("t.c_acctbal"))).alias("c_acctbal"),
        F.when(F.col("s.c_custkey").isNull(), F.lit("unchanged"))
        .when(
            (F.col("s.action") == "delete") & F.col("t.c_custkey").isNotNull(),
            F.lit("deleted"),
        )
        .when(F.col("s.action") == "delete", F.lit("noop_delete"))
        .when(F.col("t.c_custkey").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("merge_action"),
    )
    return (
        merged.filter(
            F.col("merge_action").isin("unchanged", "updated", "inserted")
        )
        .groupBy("merge_action")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("c_acctbal")).alias("sum_bal"),
        )
    )


# ---------------------------------------------------------------------------
# m38 — skew-proof MERGE: aggregated-delta upsert of a fact stream into a
# per-key state table
# ---------------------------------------------------------------------------

M38_ORACLE = """
WITH target AS (
  SELECT o_custkey, count(*) AS n_orders,
         sum(o_totalprice) AS spend, max(o_orderdate) AS last_dt
  FROM orders WHERE o_orderdate < DATE '1999-01-01' GROUP BY o_custkey
), delta AS (
  SELECT o_custkey, count(*) AS n_orders,
         sum(o_totalprice) AS spend, max(o_orderdate) AS last_dt
  FROM orders WHERE o_orderdate >= DATE '1999-01-01' GROUP BY o_custkey
)
SELECT COALESCE(t.o_custkey, s.o_custkey) AS o_custkey,
       CAST(COALESCE(t.n_orders, 0) + COALESCE(s.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(floor((COALESCE(t.spend, CAST(0 AS DOUBLE)) + COALESCE(s.spend, CAST(0 AS DOUBLE))) * 100 + CAST(0.5 AS DOUBLE)) AS DOUBLE) / 100 AS spend,
       COALESCE(s.last_dt, t.last_dt) AS last_dt,
       CASE WHEN s.o_custkey IS NULL THEN 'unchanged'
            WHEN t.o_custkey IS NULL THEN 'inserted'
            ELSE 'updated' END AS merge_action
FROM target t FULL OUTER JOIN delta s ON t.o_custkey = s.o_custkey
"""


@register("m38_merge_skew_delta", oracle=M38_ORACLE, group="M")
def m38_merge_skew_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-proof MERGE pattern: when the source is a FACT stream
    (many rows per key, hot keys included) being upserted into per-key
    state, never join raw source rows against the target — pre-aggregate
    the delta to ONE row per key first, then run m34's full-outer +
    COALESCE merge on the collapsed sides. The pre-aggregation is where
    the skew dies: Spark's partial (map-side) aggregation collapses a
    hot customer's rows within each input partition BEFORE the shuffle,
    so the merge join itself sees at most one row per key per side and
    no AQE skew-split is ever needed — additive state (counts, sums,
    max-timestamps) is exactly the class of MERGE this rewrite covers.
    Here orders before 1999 are the standing state, 1999+ the delta;
    customers first seen in the delta come out 'inserted'. At 100 TB
    both aggregates shuffle once on the merge key and the merge join
    consumes that partitioning — no exchange in the plan carries more
    than one row per key."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp")

    def per_key_state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("spend"),
            F.max("o_orderdate").alias("last_dt"),
        )

    t = per_key_state(o.filter(F.col("o_orderdate") < cut)).alias("t")
    s = per_key_state(o.filter(F.col("o_orderdate") >= cut)).alias("s")
    return t.join(s, F.col("t.o_custkey") == F.col("s.o_custkey"), "full_outer").select(
        F.coalesce(F.col("t.o_custkey"), F.col("s.o_custkey")).alias("o_custkey"),
        (
            F.coalesce(F.col("t.n_orders"), F.lit(0))
            + F.coalesce(F.col("s.n_orders"), F.lit(0))
        )
        .cast("long")
        .alias("n_orders"),
        r2(
            F.coalesce(F.col("t.spend"), F.lit(0.0))
            + F.coalesce(F.col("s.spend"), F.lit(0.0))
        ).alias("spend"),
        F.coalesce(F.col("s.last_dt"), F.col("t.last_dt")).alias("last_dt"),
        F.when(F.col("s.o_custkey").isNull(), F.lit("unchanged"))
        .when(F.col("t.o_custkey").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("merge_action"),
    )


# ---------------------------------------------------------------------------
# m39 — broadcast-Bloom semi-join reducer (the runtime-filter pattern,
# built explicitly so the mechanics are testable and conf-independent)
# ---------------------------------------------------------------------------

M39_ORACLE = f"""
SELECT s_nationkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       {r2sql("sum(l_extendedprice)")} AS revenue
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
WHERE s_acctbal > 4000
GROUP BY s_nationkey
"""

_BLOOM_BITS = 1 << 16  # 65536 bits = 1024 longs = 8 KB broadcast


@register("m39_bloom_semijoin_prune", oracle=M39_ORACLE, group="M")
def m39_bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicitly-built broadcast Bloom filter —
    the runtime-filter pattern. Spark's optimizer-injected variant is
    exercised by c23_bloom_join (scoped ``runtime.bloomFilter`` confs);
    this op builds the same reducer as plain DataFrame algebra, so the
    bitmap size, probe count, and prune placement are explicit, work on a
    vanilla session with zero conf overrides, and stay auditable when the
    optimizer's thresholds would decline to inject. The dim side (suppliers over a balance threshold)
    folds its join keys into a 64Kbit bitmap — two xxhash64 probes per
    key, ``bit_or`` per 64-bit bucket, assembled into ONE map row — which
    broadcasts at a fixed 8 KB regardless of dim cardinality. The fact
    scan applies the two-probe membership test BEFORE its shuffle, so the
    sort-merge join (hinted ``merge`` — the shape a too-big-to-broadcast
    dim forces at 100 TB) moves only rows that can match; Bloom false
    positives are eliminated by the exact join, which is why the plain
    join SQL is a valid oracle. At 100 TB this is the difference between
    shuffling the full fact table and shuffling the ~selectivity fraction
    of it, at the cost of an 8 KB broadcast — the bitmap never scales
    with the dim, unlike broadcasting the key set itself."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 4000)

    def pos_expr(key: str, j: int) -> str:
        # xxhash64 is input-TYPE-sensitive: hashing s_suppkey (build) and
        # l_suppkey (probe) at different widths would silently prune
        # MATCHING rows (false negatives the exact join cannot repair).
        # Pin both sides to BIGINT so the filter is robust to schema drift.
        return f"pmod(xxhash64(CAST({key} AS BIGINT), {j}), {_BLOOM_BITS})"

    pos = su.selectExpr(
        f"explode(array({pos_expr('s_suppkey', 0)}, {pos_expr('s_suppkey', 1)})) AS pos"
    ).selectExpr(
        "pos div 64 AS bucket",
        "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS m",
    )
    bloom = (
        pos.groupBy("bucket")
        .agg(F.bit_or("m").alias("mask"))
        .agg(F.map_from_entries(F.collect_list(F.struct("bucket", "mask"))).alias("bf"))
    )

    def hit(j: int) -> str:
        p = pos_expr("l_suppkey", j)
        word = f"element_at(bf, {p} div 64)"
        bit = f"shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT))"
        return f"({word} IS NOT NULL AND ({word} & {bit}) != 0)"

    pruned = (
        li.select("l_suppkey", "l_extendedprice")
        .crossJoin(F.broadcast(bloom))
        .filter(F.expr(f"{hit(0)} AND {hit(1)}"))
        .drop("bf")
    )
    return (
        pruned.hint("merge")
        .join(su.select("s_suppkey", "s_nationkey"), pruned.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            r2(F.sum("l_extendedprice")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# m40 — fixed-iteration PageRank over the customer-supplier trade graph
# ---------------------------------------------------------------------------

_PR_D = "CAST(0.85 AS DOUBLE)"


def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled-CTE twin of ops.graph.pagerank: one CTE per iteration,
    each rounding to 8 decimals exactly as the engine does."""
    rnd8 = lambda x: r2sql(x, 8)  # noqa: E731
    sql = f"""WITH edges AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), e AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
), deg AS (
  SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM deg
), r0 AS (
  SELECT node, deg, {rnd8("CAST(1 AS DOUBLE) / n")} AS r FROM deg CROSS JOIN nn
)"""
    for t in range(1, iters + 1):
        sql += f""", r{t} AS (
  SELECT deg.node, deg.deg,
         {rnd8(f"(CAST(1 AS DOUBLE) - {_PR_D}) / n + {_PR_D} * c.c")} AS r
  FROM deg JOIN (
    SELECT e.dst AS node, sum(r{t - 1}.r / r{t - 1}.deg) AS c
    FROM e JOIN r{t - 1} ON e.src = r{t - 1}.node GROUP BY e.dst
  ) c USING (node) CROSS JOIN nn
)"""
    sql += f"""
SELECT node, CAST(deg AS BIGINT) AS degree, {r2sql("r", 6)} AS pagerank
FROM r{iters}"""
    return sql


M40_ORACLE = _pagerank_oracle(5)


@register("m40_pagerank", oracle=M40_ORACLE, group="M")
def m40_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-iteration PageRank over the undirected customer-supplier trade
    graph (an edge per distinct trading pair from orders ⋈ lineitem;
    customers at 2k, suppliers at 2k+1 keep the id spaces disjoint) — the
    canonical iterative-algebra workload the engine had not yet carried
    beyond min-label components (k49). The Spark side is
    ops.graph.pagerank: edge list checkpointed once, two shuffles per
    iteration, ranks re-rounded to 8 decimals per round so the DuckDB
    unrolled-CTE oracle folds bit-identical inputs; the oracle IS the same
    recurrence written as six chained CTEs. Undirected degree >= 1 by
    construction removes the dangling-mass term, which is what makes the
    recurrence expressible identically in both engines. At 100 TB the
    knobs are iteration count and the edge-list checkpoint granularity;
    the per-round cost is joins on the node key that AQE can co-partition
    after round one."""
    from marasa_spark.ops.graph import pagerank

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, iters=5, damping=0.85)
    return ranks.select(
        "node",
        F.col("deg").cast("long").alias("degree"),
        r2(F.col("r"), 6).alias("pagerank"),
    )


# ---------------------------------------------------------------------------
# m41 — k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_M41_K = 10

M41_ORACLE = f"""
WITH eq AS (
  SELECT c_mktsegment AS mktsegment, c_nationkey AS nationkey,
         CAST(count(*) AS BIGINT) AS class_size
  FROM customer
  GROUP BY c_mktsegment, c_nationkey
)
SELECT mktsegment, nationkey, class_size,
       class_size < {_M41_K} AS at_risk,
       CAST(CASE WHEN class_size < {_M41_K} THEN class_size ELSE 0 END AS BIGINT) AS rows_to_suppress
FROM eq
"""


@register("m41_k_anonymity", oracle=M41_ORACLE, group="M")
def m41_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: equivalence-class sizes over the quasi-
    identifier pair (mktsegment, nationkey) with the under-k classes
    flagged — the privacy gate a dataset release runs BEFORE the k32/k61
    PII scrubbers (those remove direct identifiers; re-identification
    risk lives in quasi-identifier combinations, and a class of size 1
    IS an identifier no regex can see). rows_to_suppress quantifies the
    generalize-or-drop cost per risky class. One groupBy on the QI pair
    — equivalence classes are the aggregation key, so the audit scales
    exactly like any hash aggregate. k=10 splits the corpus's 5x25
    classes 35/90 at the driver's correctness SF (class sizes scale with
    SF, so the flag saturates at other scales — the hash check remains
    live everywhere, the discrimination check holds where the driver
    grades)."""
    c = load_table(spark, sf_dir, "customer")
    eq = c.groupBy(
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_nationkey").alias("nationkey"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    return eq.select(
        "mktsegment",
        "nationkey",
        "class_size",
        (F.col("class_size") < F.lit(_M41_K)).alias("at_risk"),
        F.when(F.col("class_size") < F.lit(_M41_K), F.col("class_size"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rows_to_suppress"),
    )


# ---------------------------------------------------------------------------
# m42 — PSI distribution drift between two time windows
# ---------------------------------------------------------------------------

_M42_CUT = "2024-01-16 00:00:00"

M42_ORACLE = f"""
WITH b AS (
  SELECT CAST(least(floor(value / 50), 9) AS BIGINT) AS bucket,
         CASE WHEN ts < TIMESTAMP '{_M42_CUT}' THEN 1 ELSE 0 END AS is_ref
  FROM events
), per AS (
  SELECT bucket,
         CAST(sum(is_ref) AS BIGINT) AS ref_cnt,
         CAST(sum(1 - is_ref) AS BIGINT) AS cur_cnt
  FROM b GROUP BY bucket
), tot AS (
  SELECT CAST(sum(ref_cnt) AS BIGINT) AS ref_tot,
         CAST(sum(cur_cnt) AS BIGINT) AS cur_tot,
         CAST(count(*) AS BIGINT) AS nb
  FROM per
)
SELECT bucket, ref_cnt, cur_cnt,
       {r2sql("(ref_cnt + CAST(0.5 AS DOUBLE)) / (ref_tot + CAST(0.5 AS DOUBLE) * nb)", 6)} AS ref_share,
       {r2sql("(cur_cnt + CAST(0.5 AS DOUBLE)) / (cur_tot + CAST(0.5 AS DOUBLE) * nb)", 6)} AS cur_share,
       {r2sql("((cur_cnt + CAST(0.5 AS DOUBLE)) / (cur_tot + CAST(0.5 AS DOUBLE) * nb) - (ref_cnt + CAST(0.5 AS DOUBLE)) / (ref_tot + CAST(0.5 AS DOUBLE) * nb)) * ln(((cur_cnt + CAST(0.5 AS DOUBLE)) / (cur_tot + CAST(0.5 AS DOUBLE) * nb)) / ((ref_cnt + CAST(0.5 AS DOUBLE)) / (ref_tot + CAST(0.5 AS DOUBLE) * nb)))", 6)} AS psi_term
FROM per CROSS JOIN tot
"""


@register("m42_psi_drift", oracle=M42_ORACLE, group="M")
def m42_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift audit: the `value` distribution of
    a reference window (first half of the month) vs the current window,
    bucketed into 10 fixed bands, with each bucket's PSI contribution —
    the drift gate feature pipelines run before a model retrain consumes
    new data (m23 catches ROW-COUNT drift; this catches a distribution
    that moved under a stable count). Laplace smoothing (+0.5 per bucket)
    keeps empty buckets finite, so the ln never sees zero and both
    engines compute identical smoothed shares from identical integer
    counts. One pass over the fact: per-bucket conditional counts (the
    CASE-sum split, never two scans), a 10-row total folded back as a
    broadcast. Σ psi_term > 0.2 is the conventional retrain trigger —
    left to the reader of the artifact, the per-bucket terms localize
    WHICH band moved. ts comparisons ride catalog.load_table's µs
    truncation (TESTDATA's INT64-nanos hazard)."""
    e = load_table(spark, sf_dir, "events")
    b = e.select(
        F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("long").alias("bucket"),
        F.when(F.col("ts") < F.lit(_M42_CUT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    per = b.groupBy("bucket").agg(
        F.sum("is_ref").alias("ref_cnt"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("cur_cnt"),
    )
    tot = per.agg(
        F.sum("ref_cnt").alias("ref_tot"),
        F.sum("cur_cnt").alias("cur_tot"),
        F.count(F.lit(1)).alias("nb"),
    )
    half = F.lit(0.5)
    p_ref = (F.col("ref_cnt") + half) / (F.col("ref_tot") + half * F.col("nb"))
    p_cur = (F.col("cur_cnt") + half) / (F.col("cur_tot") + half * F.col("nb"))
    return per.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "ref_cnt",
        "cur_cnt",
        r2(p_ref, 6).alias("ref_share"),
        r2(p_cur, 6).alias("cur_share"),
        r2((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


# ---------------------------------------------------------------------------
# m43 — market-basket co-occurrence (top-k "also bought" per item)
# ---------------------------------------------------------------------------

M43_ORACLE = """
WITH pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, CAST(count(*) AS BIGINT) AS n_baskets
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
), sym AS (
  SELECT p1 AS item, p2 AS other, n_baskets FROM pairs
  UNION ALL
  SELECT p2, p1, n_baskets FROM pairs
), ranked AS (
  SELECT item, other, n_baskets,
         row_number() OVER (PARTITION BY item ORDER BY n_baskets DESC, other) AS rk
  FROM sym
)
SELECT item, other, n_baskets, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
"""


@register("m43_market_basket", oracle=M43_ORACLE, group="M")
def m43_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: for every item, the top-3 items most
    often sharing an order with it — the 'also bought' co-occurrence
    table recommendation and affinity pipelines materialize. The pair
    self-join is keyed on the BASKET (l_orderkey) with p1 < p2 cutting
    the diagonal and mirror: pair fan-out per order is C(basket, 2),
    bounded by basket size (single digits in an order-line schema), so
    the shuffle grows linearly with orders — this is the bounded-
    candidate principle of k9/k52 applied to co-occurrence (all-pairs
    over ITEMS would be quadratic; all-pairs within a BASKET is not).
    Symmetrization is a cheap union of the half-pair table; the top-3
    per item rides WindowGroupLimit (rank pushdown) with the partner
    key as tiebreak. rk is CAST to BIGINT to pin the cross-engine
    row_number type."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.toDF("okey", "p1")
    b = li.toDF("okey", "p2")
    pairs = (
        a.join(b, "okey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    sym = pairs.selectExpr("p1 AS item", "p2 AS other", "n_baskets").unionAll(
        pairs.selectExpr("p2 AS item", "p1 AS other", "n_baskets")
    )
    w = W.partitionBy("item").orderBy(F.desc("n_baskets"), "other")
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("item", "other", "n_baskets", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# m45 — one-pass table profile (the ANALYZE/data-quality report as a query)
# ---------------------------------------------------------------------------

M45_ORACLE = """
SELECT 'o_custkey' AS col, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct,
       CAST(min(o_custkey) AS VARCHAR) AS min_v, CAST(max(o_custkey) AS VARCHAR) AS max_v
FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_orderstatus) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
       CAST(count(*) - count(o_orderdate) AS BIGINT),
       CAST(count(DISTINCT o_orderdate) AS BIGINT),
       CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
FROM orders
"""


@register("m45_table_profile", oracle=M45_ORACLE, group="M")
def m45_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (ANALYZE-style data-quality report) as ONE
    aggregation pass: row count, null count, exact distinct count, and
    min/max per profiled column, emitted long-form (one row per column).
    The oracle spells the same report as per-column UNION ALL selects —
    semantically identical, but the Spark plan computes every column's
    statistics in a SINGLE scan + one aggregate (count(DISTINCT a),
    count(DISTINCT b), ... expand to one multi-distinct aggregate), then
    unpivots the 1-row wide result with stack() — a metadata-sized
    reshape. At 100 TB the difference is 1 scan vs N scans; swapping the
    exact distincts for approx_count_distinct (d9's posture) makes the
    same plan sketch-cheap when exactness isn't contractual. min/max
    stringify so heterogeneous column types share one report schema
    (dates render ISO — matching DuckDB's VARCHAR cast)."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderstatus", "o_orderdate"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__null"),
            F.countDistinct(c).alias(f"{c}__ndv"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__null, {c}__ndv, {c}__min, {c}__max" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col, n_rows, n_null, n_distinct, min_v, max_v)"
    )
