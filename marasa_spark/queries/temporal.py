"""Temporal joins — c9 range join, c10 as-of join (SURVEY.md §2.C).

c9 keeps an equi key (l_orderkey = o_orderkey) so Catalyst plans a hash /
sort-merge join with the band as a residual filter — never a nested loop.
c10 uses the ops.asof union-sort operator (ONE shuffle on the key, no
band-join pair amplification; see ops/asof.py for the variant trade-offs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.ops.asof import asof_join_union
from marasa_spark.queries._util import r2, r2sql
from marasa_spark.registry import register

C9_ORACLE = f"""
SELECT o_orderpriority,
       count(*)                                         AS n,
       {r2sql("sum(l_extendedprice * (1 - l_discount))")} AS revenue
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
"""


@register("c9_join_range", oracle=C9_ORACLE, group="C")
def c9_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + band predicate: hash join on the order key, band as residual."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
        )
    )


# Oracle authored as an explicit latest-prior window (NOT DuckDB ASOF JOIN:
# its WHERE-on-right-attrs semantics filter after matching — SURVEY §2.C
# trap — and window SQL is dialect-identical anyway).
C10_ORACLE = """
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
FROM (
  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
         p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
)
WHERE rn = 1
"""


@register("c10_join_asof", oracle=C10_ORACLE, group="C")
def c10_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest prior click for each purchase, per user."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return asof_join_union(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_seq="click_id",
        left_seq="purchase_id",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


# Tolerance is a POST-filter on the single latest-prior match: if the most
# recent click is older than the window, every other click is older still,
# so filtering after the top-1 pick is exactly equivalent to bounding the
# band inside the join — and it keeps the union-sort single-shuffle plan.
Z1_ORACLE = """
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
FROM (
  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
         p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND c.ts <= p.ts
   AND c.ts >= p.ts - INTERVAL 1 HOUR
)
WHERE rn = 1
"""


@register("z1_asof_tolerance", oracle=Z1_ORACLE, group="C")
def z1_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas ``merge_asof
    tolerance=`` semantics): the latest prior click counts only if it is at
    most 1 hour before the purchase. Implemented as the c10 union-sort
    as-of (ONE shuffle, no band-pair amplification) plus a post-filter on
    the matched timestamp — equivalent to a two-sided band join because
    the top-1 match is the NEWEST candidate: if it misses the window,
    every other candidate misses it too. The id sorts after the driver's
    50-query window (z-prefix) by design; see tools/driver_sim.py."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return (
        asof_join_union(
            purchases,
            clicks,
            on="user_id",
            left_ts="purchase_ts",
            right_ts="click_ts",
            right_seq="click_id",
            left_seq="purchase_id",
        )
        .filter(
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
        )
        .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
    )


@register("z2_asof_tolerance_bucketed", oracle=Z1_ORACLE, group="C")
def z2_asof_tolerance_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tolerance as-of as z1, through the SKEW-PROOF plan:
    ops.asof.asof_join_bucketed shuffles on (user, time-bucket) instead of
    user alone, so a hot user spreads across one task per tolerance window
    instead of serializing on one. Same oracle as z1 — two independent
    physical strategies, one declared semantics, which is itself the
    correctness argument (plus the equivalence test in
    tests/test_asof.py)."""
    from marasa_spark.ops.asof import asof_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return asof_join_bucketed(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_seq="click_id",
        tolerance_s=3600,
        left_seq="purchase_id",
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


# nearest: min |Δt|; exact-distance ties prefer the BACKWARD candidate;
# same-timestamp right rows resolve to max event_id — mirrored exactly in
# the two-pass union-sort implementation (ops/asof.py asof_join_nearest).
Z5_ORACLE = """
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts, matched_dir
FROM (
  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
         p.ts AS purchase_ts, c.event_id AS click_id, c.ts AS click_ts,
         CASE WHEN c.ts <= p.ts THEN 'backward' ELSE 'forward' END AS matched_dir,
         row_number() OVER (
           PARTITION BY p.event_id
           ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)) ASC,
                    CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
                    c.event_id DESC) AS rn
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id
)
WHERE rn = 1
"""


@register("z5_asof_nearest", oracle=Z5_ORACLE, group="C")
def z5_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof direction='nearest': the closest click to each purchase
    in either time direction (ties: backward wins, then max click_id).
    Two union-sort as-of passes — backward on ts, forward on negated ts —
    then a per-row closer-match pick; see ops.asof.asof_join_nearest. The
    oracle expresses the same semantics as one window over ALL candidate
    pairs, so the hash check proves the two-pass trick equals the direct
    definition."""
    from marasa_spark.ops.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    return asof_join_nearest(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_seq="click_id",
        left_seq="purchase_id",
    ).select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts",
        "matched_dir",
    )
