"""Group C — joins (SURVEY.md §2.C; c9/c10 temporal variants in temporal.py).

Scale posture: dimension tables (region/nation/supplier at realistic scales)
are broadcast — explicitly hinted with F.broadcast so the plan survives
stats misestimates at 100 TB; fact-fact joins (orders⋈lineitem) shuffle on
the join key and benefit from AQE skew splitting (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table, register_views
from marasa_spark.queries._util import fresh_scratch, r2, r2sql
from marasa_spark.registry import register

C1_ORACLE = """
SELECT c_custkey, c_name, n_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


@register("c1_join_inner", oracle=C1_ORACLE, group="C")
def c1_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; nation is broadcast (25 rows at every scale)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner").select(
        "c_custkey", "c_name", "n_name"
    )


C2_ORACLE = f"""
SELECT n_name, {r2sql("sum(l_extendedprice * (1 - l_discount))")} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("c2_join_multiway", oracle=C2_ORACLE, group="C")
def c2_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star join (TPC-H Q5 shape), structured so the BIGGEST fact
    (lineitem) streams and never builds a hash side.

    The filtered order side (orders⋈customer⋈nation⋈region — region/date
    predicates applied first) collapses to a narrow (o_orderkey, n_name)
    relation that joins into the lineitem scan; left to its own file-size
    stats Catalyst would happily broadcast the whole lineitem table at
    small scale factors, which inverts build/stream and dies at 100 TB.
    The big-side aggregate is partial before the final 25-key shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    order_side = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("o_orderkey", "n_name")
    )
    # Broadcast the narrow filtered side so the fact NEVER builds the hash
    # table (measured: Catalyst's file-size stats otherwise build lineitem).
    # If the filtered side outgrows broadcast size at extreme scale, drop
    # the hint — AQE falls back to a shuffle join; the structure (narrow
    # filtered side vs streaming fact) is what carries to 100 TB.
    return (
        li.join(F.broadcast(order_side), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


C3_ORACLE = """
SELECT c_custkey, o_orderkey
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_totalprice > 300000
"""


@register("c3_join_left", oracle=C3_ORACLE, group="C")
def c3_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with an extra ON-clause predicate (not a post-filter) —
    unmatched customers surface with NULL o_orderkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 300000)
    return c.join(o, cond, "left").select("c_custkey", "o_orderkey")


C4_ORACLE = """
SELECT n_name, s_name
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
"""


@register("c4_join_right", oracle=C4_ORACLE, group="C")
def c4_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer — nations keep a row even with no suppliers."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select("n_name", "s_name")


C5_ORACLE = """
WITH c AS (
  SELECT c_nationkey, count(*) AS n_cust
  FROM customer WHERE c_mktsegment = 'MACHINERY' GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey, count(*) AS n_supp
  FROM supplier WHERE s_acctbal > 0 GROUP BY s_nationkey
)
SELECT c_nationkey, s_nationkey, n_cust, n_supp
FROM c FULL JOIN s ON c_nationkey = s_nationkey
"""


@register("c5_join_full", oracle=C5_ORACLE, group="C")
def c5_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two filtered aggregates (asymmetric key sets)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        "c_nationkey", "s_nationkey", "n_cust", "n_supp"
    )


C6_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000
)
"""


@register("c6_join_semi", oracle=C6_ORACLE, group="C")
def c6_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join (no row multiplication, early-out probe)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


C7_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@register("c7_join_anti", oracle=C7_ORACLE, group="C")
def c7_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (customers with no URGENT order).
    The original every-customer form was vacuous in this corpus — every
    customer has orders at sf0.001/0.01, so the anti join output was
    EMPTY and the hash check held on zero rows; the priority filter
    keeps ~13% of customers surviving at every SF, so the anti-join
    semantics are actually exercised (the zero-row-oracle audit that
    caught this is part of the round-6 sweep)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


C8_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@register("c8_join_cross", oracle=C8_ORACLE, group="C")
def c8_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two bounded dims (5×25) — broadcast NLJ."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


# Portable SQL: runs verbatim on Spark (EP3) and DuckDB.
C12_SQL = """
SELECT c_custkey, c_name,
       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
       (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
FROM customer
WHERE c_acctbal > 9000
"""


@register("c12_scalar_subquery", oracle=C12_SQL, group="C")
def c12_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries — Catalyst decorrelates both into one
    left-outer aggregate join over orders (no per-row subquery execution;
    the same rewrite a hand-planned engine would need is free)."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(C12_SQL)


C13_SQL = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
  AND o_totalprice > 400000
"""


@register("c13_in_subquery", oracle=C13_SQL, group="C")
def c13_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → decorrelated to a left-semi join by Catalyst."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(C13_SQL)


C11_ORACLE = """
SELECT s_suppkey, count(*) AS n_poorer_cust
FROM supplier JOIN customer ON s_acctbal > c_acctbal
GROUP BY s_suppkey
"""


@register("c11_join_theta", oracle=C11_ORACLE, group="C")
def c11_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure inequality (theta) join → BroadcastNestedLoopJoin with the small
    side broadcast; aggregated output keeps result bounded.

    100 TB path: band-bucketize both sides on the compared value (histogram
    equi-buckets), equi-join on bucket pairs where min(a)>max(c) is decidable,
    NLJ only the boundary buckets.
    """
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(F.broadcast(s), s.s_acctbal > c.c_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_poorer_cust"))
    )


C14_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
  AND NOT EXISTS (SELECT 1 FROM orders o2
                  WHERE o2.o_custkey = c.c_custkey
                    AND o2.o_orderstatus = 'F' AND o2.o_totalprice > 500000)
"""


@register("c14_exists_subquery", oracle=C14_SQL, group="C")
def c14_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — Catalyst decorrelates to a left-semi
    plus left-anti join on o_custkey, both co-partitioned with the probe:
    exactly the plan a hand-written engine would pick, derived from the
    declarative form."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(C14_SQL)


C15_SQL = """
SELECT n_name, t.c_custkey, t.c_acctbal
FROM nation, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


@register("c15_lateral_join", oracle=C15_SQL, group="C")
def c15_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-2 customers per nation): Spark
    rewrites the per-row subquery into a window/limit over a single join —
    no per-nation re-execution. Unique tiebreaker (c_custkey) makes the
    LIMIT deterministic on both engines."""
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(C15_SQL)


C16_ORACLE = """
WITH o AS (
  SELECT nullif(o_custkey % 50, 0) AS k, o_totalprice FROM orders
), c AS (
  SELECT nullif(c_custkey % 50, 0) AS k, c_custkey FROM customer
)
SELECT o.k AS bucket, count(*) AS n_pairs
FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
GROUP BY o.k
"""


@register("c16_join_null_safe", oracle=C16_ORACLE, group="C")
def c16_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): the NULL bucket
    joins to itself instead of vanishing — Spark keeps it a HASH join
    (null-safe equality is still hashable), not a nested loop. NULL is
    also the canonical skew key: at scale it's the first candidate for
    salting (m7)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("k_o")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_custkey") % 50, F.lit(0)).alias("k_c")
    )
    return (
        o.join(c, F.col("k_o").eqNullSafe(F.col("k_c")))
        .groupBy("k_o")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(F.col("k_o").alias("bucket"), "n_pairs")
    )


# Spark spells integer division DIV; DuckDB spells it // — two dialect
# variants of the same recursion (seed types: BIGINT key, INT depth)
_C17_BODY = """
WITH RECURSIVE walk(root, k, depth) AS (
  SELECT o_orderkey AS root, o_orderkey AS k, 0 AS depth
  FROM orders WHERE o_orderkey < 500
  UNION ALL
  SELECT root, k {div} 2, depth + 1 FROM walk WHERE k > 1
)
SELECT root, max(depth) AS depth_to_one, max(k) AS maxk
FROM walk
GROUP BY root
"""

C17_SPARK = _C17_BODY.format(div="DIV")
C17_ORACLE = _C17_BODY.format(div="//")


@register("c17_recursive_cte", oracle=C17_ORACLE, group="C")
def c17_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): iterative hierarchy walk (k -> k/2 chain to
    the root) — graph reachability as SQL. Each recursion step is one
    self-join-free projection of the frontier; depth is bounded by
    log2(max key). The engine-specific integer-division spelling (DIV vs
    //) is the only dialect difference."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(C17_SPARK)


C18_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n_items, {r2sql("sum(l_extendedprice)")} AS rev
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


@register("c18_join_sort_merge", oracle=C18_ORACLE, group="C")
def c18_join_sort_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact with the MERGE hint: at 100 TB neither orders nor lineitem
    broadcasts, and a shuffled sort-merge join is the strategy that spills
    gracefully (sorted runs on disk) where a hash build OOMs. Pinned here
    (and plan-audited) so the engine's large-large posture is an explicit,
    tested choice instead of a stats accident."""
    o = load_table(spark, sf_dir, "orders").hint("merge")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            r2(F.sum("l_extendedprice")).alias("rev"),
        )
    )


C19_ORACLE = f"""
SELECT c_custkey, count(*) AS n_orders, {r2sql("sum(o_totalprice)")} AS sum_price
FROM customer JOIN orders ON c_custkey = o_custkey
WHERE c_custkey <= 1000
GROUP BY c_custkey
"""


@register("c19_join_bucketed", oracle=C19_ORACLE, group="C")
def c19_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-co-located join: both sides written bucketBy(8, custkey) +
    sortBy, then joined WITHOUT any Exchange — the scan's bucket layout
    already satisfies the join's required distribution, and the groupBy on
    the same key rides the join's output partitioning, so the whole plan is
    shuffle-free (plan-audited). At 100 TB this is THE lever for repeated
    fact⋈fact joins: pay the bucketed layout once at ingest, skip the
    dominant shuffle on every query after."""
    d = fresh_scratch("c19_bucket", sf_dir)
    tag = d.rsplit("/", 1)[-1].replace(".", "_")  # "." would parse as schema.table
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 1000)
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    for name, df, key in ((f"c19c_{tag}", c, "c_custkey"), (f"c19o_{tag}", o, "o_custkey")):
        df.write.bucketBy(8, key).sortBy(key).option("path", f"{d}/{name}").mode(
            "overwrite"
        ).saveAsTable(name)
    cb = spark.table(f"c19c_{tag}").hint("merge")
    ob = spark.table(f"c19o_{tag}")
    return (
        cb.join(ob, cb.c_custkey == ob.o_custkey)
        .groupBy("c_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            r2(F.sum("o_totalprice")).alias("sum_price"),
        )
    )


C20_ORACLE = f"""
SELECT c_mktsegment, count(*) AS n_events, {r2sql("sum(value)")} AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


@register("c20_join_skew_salted", oracle=C20_ORACLE, group="C")
def c20_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact⋈dim join by salt-replication: the dim side is
    replicated SALT× (explode of a literal range), the fact side routes
    each row to one replica via pmod(xxhash64(event_id), SALT), and the
    join key becomes (user_id, salt) — so one hot user_id spreads over
    SALT reducers instead of melting a single one. The salt never reaches
    the result (any routing yields the same rows), which is why the oracle
    is the plain join. At 100 TB this is the deterministic fallback when
    AQE's runtime skew split can't help (e.g. the skewed side feeds a
    further co-partitioned op). Replication cost: SALT× the DIM only."""
    salt_n = 8
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(salt_n)).cast("int")
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
    )
    return (
        ev.join(dim, (ev.user_id == dim.c_custkey) & (ev.salt == dim.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r2(F.sum("value")).alias("sum_value"),
        )
    )


C21_ORACLE = """
WITH a AS (
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS a_start,
           CAST(o_orderdate AS DATE) + 10 AS a_end
    FROM orders WHERE o_orderkey < 2000
), b AS (
    SELECT n_nationkey AS campaign_id,
           DATE '1995-01-01' + n_nationkey * 60 AS b_start,
           DATE '1995-01-01' + n_nationkey * 60 + 45 AS b_end
    FROM nation
)
SELECT o_orderkey, campaign_id,
       date_diff('day', greatest(a_start, b_start), least(a_end, b_end))
           AS overlap_days
FROM a JOIN b ON a_start < b_end AND b_start < a_end
"""


@register("c21_interval_overlap_join", oracle=C21_ORACLE, group="C")
def c21_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (order activity windows × campaign windows)
    via GRID BUCKETING: each interval explodes to the month cells it
    covers, the join is an EQUI-join on the cell, and exact overlap +
    dropDuplicates refine the candidates. A naive theta join
    (a.start < b.end AND b.start < a.end) is a nested-loop cartesian at
    100 TB; cell-bucketed overlap is linear in (rows × cells-per-interval)
    and shuffles on a uniform cell key. The oracle IS the naive theta join
    — same result, different plan class."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    a = o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("a_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 10).alias("a_end"),
    )
    n = load_table(spark, sf_dir, "nation")
    base = F.lit("1995-01-01").cast("date")
    b = n.select(
        F.col("n_nationkey").alias("campaign_id"),
        F.date_add(base, (F.col("n_nationkey") * 60).cast("int")).alias("b_start"),
        F.date_add(base, (F.col("n_nationkey") * 60 + 45).cast("int")).alias("b_end"),
    )

    def cells(start, end):
        # month cells covered by [start, end); end is exclusive so an
        # interval ending on the 1st does not claim that month
        return F.sequence(
            F.trunc(start, "month"), F.trunc(F.date_sub(end, 1), "month")
        )

    ae = a.withColumn("cell", F.explode(cells(F.col("a_start"), F.col("a_end"))))
    be = b.withColumn("cell", F.explode(cells(F.col("b_start"), F.col("b_end"))))
    cand = ae.join(be, "cell").filter(
        (F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end"))
    )
    return cand.select(
        "o_orderkey",
        "campaign_id",
        F.datediff(
            F.least("a_end", "b_end"), F.greatest("a_start", "b_start")
        ).alias("overlap_days"),
    ).dropDuplicates(["o_orderkey", "campaign_id"])


C22_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n, {r2sql("sum(o_totalprice)")} AS sum_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


@register("c22_dpp_join", oracle=C22_ORACLE, group="C")
def c22_dpp_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact is directory-partitioned on
    o_orderpriority; the join's dim side (2 of 5 priorities, derived from
    a filtered nation scan) is broadcast, and Catalyst injects its values
    into the fact scan's PartitionFilters AT RUNTIME
    (dynamicpruningexpression — plan-audited). At 100 TB this is the
    star-schema accelerant: 'orders for these two priorities' reads 2/5 of
    the directories even though the priorities are only known after
    filtering the dim, not literally in the query."""
    d = fresh_scratch("c22_dpp", sf_dir)
    load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.partitionBy("o_orderpriority").mode("overwrite").parquet(d)
    fact = spark.read.parquet(d)
    dim = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_nationkey") < 2)
        .select(
            F.element_at(
                F.array(F.lit("1-URGENT"), F.lit("2-HIGH")),
                (F.col("n_nationkey") + 1).cast("int"),
            ).alias("priority")
        )
    )
    return (
        fact.join(F.broadcast(dim), fact.o_orderpriority == dim.priority)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("o_totalprice")).alias("sum_price"),
        )
    )


C23_ORACLE = f"""
SELECT o_orderpriority, count(*) AS n, {r2sql("sum(l_extendedprice)")} AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderpriority
"""


@register("c23_bloom_join", oracle=C23_ORACLE, group="C")
def c23_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning: Catalyst's InjectRuntimeFilter
    builds a bloom filter over the selective dim side's join keys and
    pushes a ``might_contain`` predicate into the FACT scan, so fact rows
    that cannot match are dropped before the shuffle (semi-join reduction
    without a second join). At 100 TB this is the difference between
    shuffling the full fact and shuffling only the ~1/5 that survives the
    dim filter — the bloom is a few MB broadcast regardless of fact size,
    and false positives only cost work, never correctness (the join still
    applies the exact predicate).

    The injection rule only fires for non-broadcast joins past size
    thresholds, so the op pins the confs locally, materializes the result
    inside the builder (the sink-op pattern), then RESTORES every conf —
    the driver's shared session never sees the overrides. The
    ``might_contain`` plan shape is pinned by tests/test_plan_audit.py."""
    from marasa_spark.session import ensure_session_configs

    ensure_session_configs(spark)
    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    # get(k, None) is None for never-explicitly-set confs (even ones with
    # engine defaults) — restoring via unset() then returns to the default.
    prev = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                r2(F.sum("l_extendedprice")).alias("sum_price"),
            )
        )
        d = fresh_scratch("c23_bloom", sf_dir)
        j.write.mode("overwrite").parquet(d)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.read.parquet(d)


C24_ORACLE = f"""
SELECT c_mktsegment, count(*) AS n, {r2sql("sum(o_totalprice)")} AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@register("c24_join_shuffle_hash", oracle=C24_ORACLE, group="C")
def c24_join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control: SHUFFLE_HASH hint forces a shuffled hash join
    where Spark would otherwise broadcast or sort-merge. At scale this is
    the middle lever: build side too big to broadcast, but hashing the
    smaller side beats sorting BOTH sides (SMJ) when spill fits memory —
    strategy hints are how a pipeline pins that choice per join instead of
    flipping global thresholds. Plan-audited as ShuffledHashJoin; values
    must be strategy-invariant (same oracle as a plain join)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("o_totalprice")).alias("sum_price"),
        )
    )
