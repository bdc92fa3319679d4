"""Group E — window functions (SURVEY.md §2.E).

Determinism discipline (SURVEY §2 note): rank/dense_rank are deterministic
under ties, so they may order by the value alone; row_number/ntile/lag/lead
and frame aggregates always carry a unique tiebreaker in ORDER BY.

Scale posture: windows partitioned by a key shuffle once on that key and
sort within partitions — fine at 100 TB when partition counts are sane.
The only global (unpartitioned) window in the engine is f1's order-proof
rank, flagged there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.queries._util import r2, r2sql
from marasa_spark.registry import register

E1_ORACLE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
       rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)            AS rnk,
       dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)            AS drnk,
       ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
"""


@register("e1_win_rank", oracle=E1_ORACLE, group="E")
def e1_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w_tie = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    w_val = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w_tie).alias("rn"),
        F.rank().over(w_val).alias("rnk"),
        F.dense_rank().over(w_val).alias("drnk"),
        F.ntile(4).over(w_tie).alias("quartile"),
    )


E2_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       lag(o_totalprice)  OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_totalprice) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
       last_value(o_totalprice) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("e2_win_analytic", oracle=E2_ORACLE, group="E")
def e2_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last with explicit frames on both sides."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)).alias(
            "first_price"
        ),
        F.last("o_totalprice").over(w.rowsBetween(0, W.unboundedFollowing)).alias(
            "last_price"
        ),
    )


_E3_RUNNING = (
    "sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_E3_MOVING = (
    "avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
)
E3_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       {r2sql(_E3_RUNNING)} AS running_total,
       {r2sql(_E3_MOVING)}  AS moving_avg3
FROM orders
"""


@register("e3_win_frame_rows", oracle=E3_ORACLE, group="E")
def e3_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (ROWS frames)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        r2(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0))).alias(
            "running_total"
        ),
        r2(F.avg("o_totalprice").over(w.rowsBetween(-2, 0))).alias("moving_avg3"),
    )


_E4_NEAR_SUM = (
    "sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice"
    " RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)"
)
E4_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice,
       {r2sql(_E4_NEAR_SUM)} AS near_sum,
       count(*) OVER
         (PARTITION BY o_custkey ORDER BY o_totalprice
          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)     AS near_n
FROM orders
"""


@register("e4_win_frame_range", oracle=E4_ORACLE, group="E")
def e4_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame (deterministic under ties — the frame is
    defined by the ordering value, not row position)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        r2(F.sum("o_totalprice").over(w)).alias("near_sum"),
        F.count(F.lit(1)).over(w).alias("near_n"),
    )


E6_ORACLE = f"""
SELECT c_custkey, c_mktsegment,
       {r2sql("percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)", 6)} AS pct_rank,
       {r2sql("cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal)", 6)} AS cdist,
       nth_value(c_custkey, 3) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_richest
FROM customer
"""


@register("e6_win_distribution", oracle=E6_ORACLE, group="E")
def e6_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank/cume_dist (value-ordered,
    tie-deterministic) + nth_value with an explicit frame and tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    w_val = W.partitionBy("c_mktsegment").orderBy("c_acctbal")
    w_tie = (
        W.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        r2(F.percent_rank().over(w_val), 6).alias("pct_rank"),
        r2(F.cume_dist().over(w_val), 6).alias("cdist"),
        F.nth_value("c_custkey", 3).over(w_tie).alias("third_richest"),
    )


E7_ORACLE = """
SELECT o_orderkey, o_custkey,
       last_value(big_price IGNORE NULLS) OVER
         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_big_price
FROM (
  SELECT o_orderkey, o_custkey, o_orderdate,
         CASE WHEN o_totalprice > 300000 THEN o_totalprice END AS big_price
  FROM orders
)
"""


@register("e7_win_ignore_nulls", oracle=E7_ORACLE, group="E")
def e7_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window fill-forward: the most recent 'big order' price
    carried forward per customer (the classic last-observation-carried-
    forward pattern over sparse observations)."""
    o = load_table(spark, sf_dir, "orders")
    big = F.when(F.col("o_totalprice") > 300000, F.col("o_totalprice"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.last(big, ignorenulls=True).over(w).alias("last_big_price"),
    )


E5_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register("e5_topk_per_group", oracle=E5_ORACLE, group="E")
def e5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer (rank + filter; Spark 4 pushes the rank
    limit into the sort via WindowGroupLimit — no full materialization)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


E8_SQL = """
SELECT event_id, user_id, ts,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_1h,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 24 HOUR PRECEDING AND CURRENT ROW) AS n_24h
FROM events
WHERE user_id < 30
"""


@register("e8_win_time_range", oracle=E8_SQL, group="E")
def e8_win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frames (trailing 1h / 24h event counts per user)
    — the sliding-window rate-limit / velocity feature. RANGE frames are
    value-defined, so timestamp ties share a frame on both engines
    (deterministic without a tiebreaker); one shuffle on user_id serves
    both frames."""
    from marasa_spark.catalog import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(E8_SQL)


E9_ORACLE = f"""
SELECT event_id, event_type, value,
       {r2sql("median(value) OVER (PARTITION BY event_type)", 6)} AS type_median,
       {r2sql("quantile_cont(value, 0.9) OVER (PARTITION BY event_type)", 6)} AS type_p90,
       CASE WHEN value > {r2sql("quantile_cont(value, 0.9) OVER (PARTITION BY event_type)", 6)}
            THEN 1 ELSE 0 END AS above_p90
FROM events
WHERE event_id < 2000
"""


@register("e9_win_percentile", oracle=E9_ORACLE, group="E")
def e9_win_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles as window functions: every row carries its
    group's median and p90 without a join back (the two-pass
    aggregate-then-join alternative costs a second shuffle and loses
    rows-to-stats locality). Unbounded percentile windows buffer each
    partition — fine for bounded group counts (one buffer per event_type
    here); for high-cardinality or huge groups switch to the d9 approx
    sketch or the aggregate-join shape. The slice filter applies BEFORE
    the window on both sides (SQL WHERE precedes window evaluation), so
    the stats describe exactly the sliced population."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    w = W.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        r2(F.median("value").over(w), 6).alias("type_median"),
        r2(F.percentile("value", 0.9).over(w), 6).alias("type_p90"),
        F.when(F.col("value") > r2(F.percentile("value", 0.9).over(w), 6), 1)
        .otherwise(0)
        .alias("above_p90"),
    )


# ---------------------------------------------------------------------------
# e10 — gaps-and-islands: consecutive-day activity streaks per user
# ---------------------------------------------------------------------------

E10_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_num
  FROM events
), seq AS (
  SELECT user_id, day_num,
         row_number() OVER (PARTITION BY user_id ORDER BY day_num) AS rn
  FROM days
)
SELECT user_id,
       CAST(min(day_num) AS BIGINT) AS streak_start_day,
       CAST(max(day_num) AS BIGINT) AS streak_end_day,
       CAST(count(*) AS BIGINT) AS streak_len
FROM seq
GROUP BY user_id, day_num - rn
"""


@register("e10_gaps_islands", oracle=E10_ORACLE, group="E")
def e10_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's CONSECUTIVE-day activity streaks via
    the row_number-difference trick — day_num - rn is constant exactly
    within a run of consecutive days, so one window plus one groupBy
    finds every streak's start/end/length with no self-join and no
    iterative expansion (the classic relational answer to 'longest
    streak', 'current streak', retention-quality cohorts; m18's
    sessionizer is the timestamp-gap analogue, this is the calendar-grid
    one). The window partitions by user and orders by the DISTINCT
    day_num — unique within user, so no tiebreaker is needed and both
    engines assign identical rn. Everything after the distinct is
    integer arithmetic: no float anywhere, the hash is exact. Scales on
    the user key; a user's partition is bounded by days-in-history, not
    events. DuckDB's date_diff and Spark's datediff meet at the shared
    day-number epoch (2024-01-01)."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "day_num"
        ),
    ).distinct()
    w = W.partitionBy("user_id").orderBy("day_num")
    seq = days.withColumn("rn", F.row_number().over(w))
    return (
        seq.groupBy("user_id", (F.col("day_num") - F.col("rn")).alias("_isl"))
        .agg(
            F.min("day_num").cast("long").alias("streak_start_day"),
            F.max("day_num").cast("long").alias("streak_end_day"),
            F.count(F.lit(1)).alias("streak_len"),
        )
        .drop("_isl")
    )


# ---------------------------------------------------------------------------
# e11 — hot-key running sum via time-sliced two-phase (SCALE.md break-first
# #1's fix for associative frame aggregates)
# ---------------------------------------------------------------------------

E11_ORACLE = """
SELECT event_id, user_id,
       CAST(sum(CAST(floor(value * 1000000 + CAST(0.5 AS DOUBLE)) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS run_value_u
FROM events
"""


@register("e11_running_sum_two_phase", oracle=E11_ORACLE, group="E")
def e11_running_sum_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key cumulative sum WITHOUT the hot-key ceiling. A plain
    `sum() OVER (PARTITION BY user ORDER BY ts)` puts each key's entire
    history in one task — SCALE.md break-first #1 when one key dominates.
    For ASSOCIATIVE frame aggregates the two-phase cut works per key:

    1. slice time into B global buckets (floor-scaled from the corpus
       min/max ts — one tiny agg, broadcast as a scalar pair; bucket is
       monotone in ts, so (bucket, ts) order == ts order within a key);
    2. local cumulative sum within (user, bucket) — a hot key's window
       partition is now one time slice, 1/B of its history (B rises with
       the corpus: days/hours at 100 TB);
    3. per-(user, bucket) totals -> exclusive running offsets over bucket
       (a users x B row table — 1 row per slice, not per event). The
       totals branch partial-aggregates map-side, so its exchange carries
       ~users x B rows, and the join back lands on the window's existing
       (user, bucket) partitioning (AQE broadcasts it at test scale);
    4. run = offset + local cum.

    Works because integer addition is associative: values are snapped to
    BIGINT micro-units first (rule 5 — a groupBy float sum is
    order-NONdeterministic, so the bucket totals would drift from the
    oracle's sequential fold by last-ulp rounding; exact integers make
    phase-3 totals equal any fold order). Oracle: the plain window text
    (with the unique (ts, event_id) tiebreak, HUGEINT-cast) — proving the
    sliced plan IS the running sum."""
    n_buckets = 8
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("v_u"),
    )
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("long")), F.max(F.col("ts").cast("long"))
    ).first()
    span = max(1, int(hi) - int(lo) + 1)
    bucket = F.least(
        F.lit(n_buckets - 1),
        ((F.col("ts").cast("long") - F.lit(int(lo))) * n_buckets / F.lit(span))
        .cast("long"),
    ).alias("bucket")
    bucketed = ev.select("*", bucket)

    w_local = (
        W.partitionBy("user_id", "bucket")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("local_cum", F.sum("v_u").over(w_local))

    totals = bucketed.groupBy("user_id", "bucket").agg(
        F.sum("v_u").alias("bucket_total")
    )
    w_off = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_total").over(w_off), F.lit(0))
    ).select("user_id", "bucket", "offset")

    return (
        local.join(offsets, ["user_id", "bucket"])
        .select(
            "event_id",
            "user_id",
            (F.col("offset") + F.col("local_cum")).cast("long").alias("run_value_u"),
        )
    )


# ---------------------------------------------------------------------------
# e12 — hot-key RANK FAMILY via value-sliced two-phase (extends e11's cut
# to rank/dense_rank/percent_rank/ntile — SCALE.md break-first #1 narrows
# to true sliding non-associative aggregates)
# ---------------------------------------------------------------------------

E12_ORACLE = """
WITH r AS (
  SELECT event_id, user_id,
         CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT event_id, user_id,
         CAST(rank() OVER (PARTITION BY user_id ORDER BY cents) AS BIGINT) AS rnk,
         CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY cents) AS BIGINT) AS drnk,
         CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY cents, event_id) AS BIGINT) AS tile,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM r
)
SELECT event_id, user_id, rnk, drnk,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE ((rnk - 1) * 1000000) // (n - 1) END AS BIGINT) AS pr_u,
       tile
FROM w
"""


@register("e12_rank_family_two_phase", oracle=E12_ORACLE, group="E")
def e12_rank_family_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile per key WITHOUT the
    hot-key ceiling — e11's two-phase cut extended from associative frame
    sums to the rank family, which is NOT a frame aggregate but IS
    offset-decomposable:

    1. slice the SORT DOMAIN (not time) into B global value buckets —
       bucket is a pure function of the sort key, so TIED rows always
       land in the same bucket and every row in an earlier bucket sorts
       strictly lower;
    2. local rank / dense_rank / row_number within (user, bucket) — a hot
       key's window partition is one value slice, 1/B of its rows;
    3. per-(user, bucket) row and DISTINCT-value counts -> exclusive
       running offsets over buckets (a users x B table; distinct counts
       add across buckets exactly because a value never straddles one);
    4. rank = row_offset + local_rank; dense_rank = distinct_offset +
       local_dense; row_number = row_offset + local_row_number;
       percent_rank and ntile are then CLOSED FORMS of (rank, row_number,
       per-key total): pr = (rank-1)/(n-1) emitted as exact micro-units
       via integer floor-division (both engines floor for non-negative
       operands), ntile from the SQL-standard first-tiles-bigger split —
       checked against DuckDB's built-in ntile(), so the closed form is
       proven equivalent to engine semantics, not assumed.

    The oracle is the plain single-window text; hash equality proves the
    sliced plan computes the same four analytics. What still keeps the
    one-task-per-key posture after this: sliding NON-associative frame
    aggregates (e.g. median over a moving frame) — everything else in the
    E group now has a registered two-phase escape."""
    n_buckets = 8
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    lo, hi = ev.agg(F.min("cents"), F.max("cents")).first()
    if lo is None:  # empty events table: the plain-window oracle yields 0 rows
        lo, hi = 0, 0
    span = max(1, int(hi) - int(lo) + 1)
    bucket = F.least(
        F.lit(n_buckets - 1),
        ((F.col("cents") - F.lit(int(lo))) * n_buckets / F.lit(span)).cast("long"),
    ).alias("bucket")
    bucketed = ev.select("*", bucket)

    w_rank = W.partitionBy("user_id", "bucket").orderBy("cents")
    w_rn = W.partitionBy("user_id", "bucket").orderBy("cents", "event_id")
    local = bucketed.select(
        "event_id",
        "user_id",
        "bucket",
        F.rank().over(w_rank).alias("l_rank"),
        F.dense_rank().over(w_rank).alias("l_dense"),
        F.row_number().over(w_rn).alias("l_rn"),
    )

    totals = bucketed.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cents").alias("n_dist"),
    )
    w_off = (
        W.partitionBy("user_id").orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    )
    w_all = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    offsets = totals.select(
        "user_id",
        "bucket",
        F.coalesce(F.sum("n_rows").over(w_off), F.lit(0)).alias("row_off"),
        F.coalesce(F.sum("n_dist").over(w_off), F.lit(0)).alias("dist_off"),
        F.sum("n_rows").over(w_all).alias("n"),
    )

    joined = local.join(offsets, ["user_id", "bucket"]).select(
        "event_id",
        "user_id",
        (F.col("row_off") + F.col("l_rank")).cast("long").alias("rnk"),
        (F.col("dist_off") + F.col("l_dense")).cast("long").alias("drnk"),
        (F.col("row_off") + F.col("l_rn")).cast("long").alias("rn"),
        F.col("n").cast("long").alias("n"),
    )
    # percent_rank and ntile(4) as integer closed forms of (rnk, rn, n):
    # floor division matches DuckDB // for the non-negative operands here;
    # ntile's first (n % 4) tiles are one row bigger per the SQL standard
    return joined.select(
        "event_id",
        "user_id",
        "rnk",
        "drnk",
        F.expr(
            "CAST(CASE WHEN n = 1 THEN 0 "
            "ELSE ((rnk - 1) * 1000000) div (n - 1) END AS BIGINT)"
        ).alias("pr_u"),
        F.expr(
            "CAST(CASE WHEN rn <= (n % 4) * (n div 4 + 1) "
            "THEN (rn - 1) div (n div 4 + 1) + 1 "
            "ELSE (n % 4) + (rn - (n % 4) * (n div 4 + 1) - 1) div (n div 4) + 1 "
            "END AS BIGINT)"
        ).alias("tile"),
    )


# ---------------------------------------------------------------------------
# e13 — hot-key MOVING MEDIAN via two-phase row-number + bounded frame
# fan-out (retires SCALE.md break-first #1's last resident: sliding
# NON-associative frame aggregates)
# ---------------------------------------------------------------------------

E13_FRAME = 10  # ROWS BETWEEN 9 PRECEDING AND CURRENT ROW

E13_ORACLE = """
WITH r AS (
  SELECT event_id, user_id, ts,
         CAST(floor(value * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM events
)
SELECT event_id, user_id,
       CAST(2 * median(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT) AS med2_cents
FROM r
"""


@register("e13_moving_median_two_phase", oracle=E13_ORACLE, group="E")
def e13_moving_median_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact moving median over a ROWS frame per key WITHOUT the hot-key
    ceiling — the last resident of SCALE.md break-first #1. A moving
    median is non-associative (no running offsets, no mergeable partials),
    so neither e11's cumulate-and-offset nor e12's rank decomposition
    applies. What DOES decompose is frame MEMBERSHIP:

    1. global per-key row_number rn via e11's time-sliced two-phase cut
       (local row_number within (user, time-bucket) + per-bucket exclusive
       row-count offsets) — a hot key never serializes into one task;
    2. a ROWS frame of size K is the set {rn-K+1 .. rn}, so each row
       belongs to exactly the K frames {rn .. rn+K-1}: explode that
       SEQUENCE — a bounded K-way fan-out, shuffle volume K x input,
       linear in frame size and independent of key skew;
    3. groupBy (user, frame_q): every group holds at most K rows no
       matter how hot the key — sort_array(collect_list(cents)) and pick
       the two middle elements driver-free. The frame's own anchor row is
       the member with rn == frame_q; frames past the key's last row have
       no anchor and are dropped by that predicate (no count join needed);
    4. median is emitted in integer 2x units (lower+upper middle element),
       matching DuckDB's interpolated even-frame median exactly without
       a float in the hash (rule: no float aggregate outside r2).

    Per-task memory is O(K) per group; the oracle is the plain one-window
    text, so hash equality proves the fan-out plan IS the moving median.
    Cost note (SCALE.md): shuffle volume scales with K — right for the
    smoothing-window sizes moving medians are used at (K <= ~100); for
    very large K the documented alternative is chunk-with-context grouped
    map (chunks of C >= K rows + previous-chunk tail replicated once,
    fan-out 2x instead of Kx)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    lo, hi = ev.agg(
        F.min(F.col("ts").cast("long")), F.max(F.col("ts").cast("long"))
    ).first()
    if lo is None:  # empty events: the plain-window oracle yields 0 rows
        lo, hi = 0, 0
    n_buckets = 8
    span = max(1, int(hi) - int(lo) + 1)
    bucket = F.least(
        F.lit(n_buckets - 1),
        ((F.col("ts").cast("long") - F.lit(int(lo))) * n_buckets / F.lit(span))
        .cast("long"),
    ).alias("bucket")
    bucketed = ev.select("*", bucket)

    w_rn = W.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    local = bucketed.select(
        "event_id", "user_id", "cents", "bucket", F.row_number().over(w_rn).alias("l_rn")
    )
    totals = bucketed.groupBy("user_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    w_off = (
        W.partitionBy("user_id").orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "user_id",
        "bucket",
        F.coalesce(F.sum("n_rows").over(w_off), F.lit(0)).alias("row_off"),
    )
    numbered = local.join(offsets, ["user_id", "bucket"]).select(
        "event_id",
        "user_id",
        "cents",
        (F.col("row_off") + F.col("l_rn")).cast("long").alias("rn"),
    )

    fanned = numbered.select(
        "event_id",
        "user_id",
        "cents",
        "rn",
        F.explode(
            F.sequence(F.col("rn"), F.col("rn") + F.lit(E13_FRAME - 1))
        ).alias("frame_q"),
    )
    grouped = (
        fanned.groupBy("user_id", "frame_q")
        .agg(
            F.sort_array(F.collect_list("cents")).alias("vals"),
            F.max(
                F.when(F.col("rn") == F.col("frame_q"), F.col("event_id"))
            ).alias("event_id"),
        )
        .filter(F.col("event_id").isNotNull())
    )
    sz = F.size("vals")
    return grouped.select(
        "event_id",
        "user_id",
        (
            F.element_at("vals", ((sz + 1) / 2).cast("int"))
            + F.element_at("vals", (sz / 2).cast("int") + F.lit(1))
        )
        .cast("long")
        .alias("med2_cents"),
    )
