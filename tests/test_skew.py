"""Salted aggregation / hot-key join correctness vs the unsalted plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.ops.skew import salted_agg, salted_join_hot_keys

# round 12: heavy property/soak tier — deselected from the default
# driver-stampable run (see conftest); MARASA_FULL_SUITE=1 restores it
pytestmark = pytest.mark.slow



def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = {
        r["l_returnflag"]: (r["cnt_items"], round(r["sum_qty"], 6), r["min_qty"], r["max_qty"])
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "cnt_items": F.count(F.lit(1)),
                "sum_qty": F.sum("l_quantity"),
                "min_qty": F.min("l_quantity"),
                "max_qty": F.max("l_quantity"),
            },
            n_salts=8,
        ).collect()
    }
    want = {
        r["l_returnflag"]: (r["cnt_items"], round(r["sum_qty"], 6), r["min_qty"], r["max_qty"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("cnt_items"),
            F.sum("l_quantity").alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
        .collect()
    }
    assert got == want


def test_salted_join_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    hot = [0, 1, 2]  # pretend these users are skewed
    got = {
        (r["event_id"], r["c_mktsegment"])
        for r in salted_join_hot_keys(ev, dim, "user_id", hot, n_salts=4).collect()
    }
    want = {
        (r["event_id"], r["c_mktsegment"]) for r in ev.join(dim, "user_id").collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Skew soak (VERDICT r6 item 6): a synthetic sf1-equivalent events table with
# one user_id owning ~20% of all rows, run through each hot-key-sensitive op
# family. Each test FAILS if the family's scale path lets the hot key
# degenerate the shuffle to one task (or, where one-task-per-key is inherent
# to exact per-key semantics, if the hot key drags unrelated keys with it).
# ---------------------------------------------------------------------------


HOT_USER = 999_999
N_REPLICAS = 10  # sf0.1 events x10 ~ sf1-equivalent (1M rows)
NPARTS = 32


@pytest.fixture(scope="module")
def skewed_events(spark):
    """sf1-equivalent events with a planted hot key: every 5th event_id is
    remapped to HOT_USER (20% of rows), the rest keep their original user.
    Persisted once per module; reads come off parquet like real input."""
    from marasa_spark.queries._util import fresh_scratch

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    reps = spark.range(N_REPLICAS).select(F.col("id").alias("rep"))
    big = (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") * N_REPLICAS + F.col("rep")).alias("event_id"),
            F.when(F.col("event_id") % 5 == 0, F.lit(HOT_USER))
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            (F.col("ts") + F.make_interval(secs=F.col("rep"))).alias("ts"),
            "event_type",
            "value",
        )
    )
    d = fresh_scratch("skew_soak", "/root/testdata/sf0.1", create=False)
    big.write.parquet(d)
    return spark.read.parquet(d)


def _partition_shares(df, *cols) -> list[float]:
    """Row share per partition under the hash partitioning the op's shuffle
    would use — the direct measurement of 'does a hot key collapse the
    exchange to one task'."""
    counts = [
        r["n"]
        for r in df.repartition(NPARTS, *[F.col(c) for c in cols])
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    total = sum(counts)
    return sorted((c / total for c in counts), reverse=True)


def test_skew_window_family_stays_parallel(skewed_events, spark):
    """e-group/i6 shape: a user_id-keyed window puts the hot key on ONE
    task by definition (exact per-key order demands it) — the pin is that
    the hot task holds ONLY the hot key's ~20%, while the rest of the data
    spreads across the other partitions instead of riding along."""
    from pyspark.sql import Window as W

    shares = _partition_shares(skewed_events, "user_id")
    assert len(shares) > 1, "keyed exchange collapsed to one partition"
    assert shares[0] <= 0.30, f"hot partition share {shares[0]:.2f} > hot key's own 20%+margin"
    # and the window actually computes under the skew (no OOM/one-task stall)
    w = W.partitionBy("user_id").orderBy("event_id")
    ranked = skewed_events.withColumn("rn", F.row_number().over(w))
    hot_max = (
        ranked.filter(F.col("user_id") == HOT_USER).agg(F.max("rn").alias("m")).first()["m"]
    )
    hot_n = skewed_events.filter(F.col("user_id") == HOT_USER).count()
    assert hot_max == hot_n


def test_skew_session_window_stays_parallel(skewed_events):
    """i3 shape: session aggregation shuffles on the user key; the hot
    user's sessions must not drag other users onto its task, and the
    session count under skew must equal the per-user sequential fold."""
    shares = _partition_shares(skewed_events, "user_id")
    assert shares[0] <= 0.30
    sess = (
        skewed_events.groupBy(F.session_window("ts", "15 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = sess.agg(F.sum("n").alias("s")).first()["s"]
    assert got == skewed_events.count(), "session agg lost rows under skew"


def test_skew_asof_bucketed_spreads_hot_key(skewed_events, spark):
    """c10 family: the union-sort as-of is documented one-task-per-key; the
    bucketed variant is the hot-key escape hatch — its shuffle key is
    (user, time-bucket), so the hot key's rows spread across its buckets.
    Pin: peak (user, bucket) partition share is FAR below the hot key's
    20%, and the bucketed result matches the union-sort reference on the
    skewed table."""
    from marasa_spark.ops.asof import asof_join_bucketed, asof_join_union

    tol_s = 3600
    p = skewed_events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = skewed_events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("click_ts"),
    )
    bucketed_key = c.select(
        "user_id", F.floor(F.unix_micros("click_ts") / (tol_s * 1_000_000)).alias("bkt")
    )
    shares = _partition_shares(bucketed_key, "user_id", "bkt")
    assert shares[0] <= 0.10, (
        f"(key, bucket) exchange peak {shares[0]:.2f} — hot key not spreading "
        "across time buckets"
    )
    got = asof_join_bucketed(
        p, c, on="user_id", left_ts="purchase_ts", right_ts="click_ts",
        right_seq="click_id", left_seq="purchase_id", tolerance_s=tol_s,
    )
    want = asof_join_union(
        p, c, on="user_id", left_ts="purchase_ts", right_ts="click_ts",
        right_seq="click_id", left_seq="purchase_id",
    ).filter(
        F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {tol_s} SECONDS")
    )
    gs = {(r["purchase_id"], r["click_id"]) for r in got.collect()}
    ws = {(r["purchase_id"], r["click_id"]) for r in want.collect()}
    assert gs == ws, f"bucketed asof diverged under skew: {len(gs)} vs {len(ws)} pairs"


def test_skew_lsh_bucket_cap_bounds_degenerate_buckets(spark, sf_dir):
    """k9 shape: 20% of a corpus being byte-identical makes EVERY band
    bucket of that group degenerate (O(hot^2) candidate pairs without the
    cap). max_bucket_size drops those buckets — a documented recall cut on
    pathological keys, whose members are exact duplicates and belong to k4's
    exact dedup anyway — while ordinary near-dup pairs keep flowing. The
    pin: with the cap, no candidate pair joins two hot-group docs, and the
    op completes in bounded work."""
    from marasa_spark.ops.dedup import minhash_lsh_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    hot_n = n // 5
    hot = docs.filter(F.col("doc_id") < hot_n).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.lit("identical hot payload repeated across the corpus").alias("text"),
    )
    corpus = docs.unionAll(hot)
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", "text", num_hashes=32, bands=8,
        threshold=0.8, max_bucket_size=64,
    )
    hot_pairs = pairs.filter(
        (F.col("doc_a") >= 1_000_000) & (F.col("doc_b") >= 1_000_000)
    ).count()
    assert hot_pairs == 0, (
        f"{hot_pairs} O(hot^2) pairs leaked through capped buckets"
    )


@pytest.fixture(scope="module")
def skew_sf_dir(spark, skewed_events):
    """A synthetic sf_dir whose `events` is the hot-key soak corpus (20%
    of ~1M rows on one user) and whose `lineitem` is group-skewed (every
    row's returnflag remapped so 'R' holds ~60% of the table) — so the
    REGISTERED two-phase ops can be run through their real front door
    (load_table + the registry fn) on adversarial data."""
    from marasa_spark.queries._util import fresh_scratch

    d = fresh_scratch("skew_sfdir", "/root/testdata/sf0.1", create=True)
    skewed_events.write.mode("overwrite").parquet(f"{d}/events.parquet")
    li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    li.withColumn(
        "l_returnflag",
        F.when(F.col("l_orderkey") % 5 < 3, F.lit("R")).otherwise(
            F.col("l_returnflag")
        ),
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    return d


def test_skew_two_phase_percentile_matches_buffered(spark, skew_sf_dir):
    """d24's whole claim is 'd8's answer without d8's O(group) buffer on a
    skewed group' — so run BOTH registered ops through their real front
    door on a corpus where one returnflag holds ~60% of the table and
    require exact row equality. Two independent product implementations
    (one-buffer `percentile` vs range-repartitioned rank select) agreeing
    on adversarial data is the strongest in-repo check the claim can get."""
    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    d8 = {
        r["l_returnflag"]: (r["p25"], r["median"], r["p75"])
        for r in REGISTRY["d8_agg_percentile"].fn(spark, skew_sf_dir).collect()
    }
    d24 = {
        r["l_returnflag"]: (r["p25"], r["median"], r["p75"])
        for r in REGISTRY["d24_percentile_two_phase"].fn(spark, skew_sf_dir).collect()
    }
    assert d8 == d24
    # and the skew is real: 'R' dominates
    li = spark.read.parquet(f"{skew_sf_dir}/lineitem.parquet")
    shares = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert shares["R"] / sum(shares.values()) > 0.5


def test_skew_two_phase_running_sum_matches_plain_window(spark, skew_sf_dir):
    """e11 through its real front door on the hot-key soak corpus: the
    time-sliced two-phase cumulative sum must equal the plain one-task-
    per-key window EXACTLY (BIGINT micro-units — associativity makes the
    regrouping lossless, which is the whole trick), including on the user
    holding 20% of ~1M rows whose history now spans every time slice."""
    from pyspark.sql import Window as W

    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    got = REGISTRY["e11_running_sum_two_phase"].fn(spark, skew_sf_dir)

    ev = load_table(spark, skew_sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("v_u"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    want = ev.select(
        "event_id", "user_id", F.sum("v_u").over(w).cast("long").alias("run_value_u")
    )
    # exact anti-join equality in both directions, no driver-side sort of 1M rows
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()
    # and the hot key really is hot
    hot = ev.filter(F.col("user_id") == HOT_USER).count()
    assert hot / ev.count() > 0.15


def test_skew_two_phase_rank_family_matches_plain_window(spark, skew_sf_dir):
    """e12 through its real front door on the hot-key soak corpus: the
    value-sliced two-phase rank family must equal the plain one-task-
    per-key windows EXACTLY — rank/dense_rank with ties (the cents snap
    guarantees collisions), percent_rank in integer micro-units, and
    the closed-form ntile against F.ntile — including on the user
    holding 20% of ~1M rows whose values now span every slice."""
    from pyspark.sql import Window as W

    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    got = REGISTRY["e12_rank_family_two_phase"].fn(spark, skew_sf_dir)

    ev = load_table(spark, skew_sf_dir, "events").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w_rank = W.partitionBy("user_id").orderBy("cents")
    w_rn = W.partitionBy("user_id").orderBy("cents", "event_id")
    w_all = W.partitionBy("user_id")
    plain = ev.select(
        "event_id",
        "user_id",
        F.rank().over(w_rank).cast("long").alias("rnk"),
        F.dense_rank().over(w_rank).cast("long").alias("drnk"),
        F.ntile(4).over(w_rn).cast("long").alias("tile"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("n"),
    ).select(
        "event_id",
        "user_id",
        "rnk",
        "drnk",
        F.expr(
            "CAST(CASE WHEN n = 1 THEN 0 "
            "ELSE ((rnk - 1) * 1000000) div (n - 1) END AS BIGINT)"
        ).alias("pr_u"),
        "tile",
    )
    assert got.exceptAll(plain).isEmpty()
    assert plain.exceptAll(got).isEmpty()


def test_two_phase_rank_family_empty_events(spark):
    """e12's driver-side min/max probe on an EMPTY events table returns
    (None, None); the guard must short-circuit to zero rows with the
    plain-window schema instead of raising TypeError on int(None)."""
    from marasa_spark.queries._util import fresh_scratch
    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    d = fresh_scratch("e12_empty_sfdir", "/root/testdata/sf0.001", create=True)
    load_table(spark, "/root/testdata/sf0.001", "events").limit(0).write.mode(
        "overwrite"
    ).parquet(f"{d}/events.parquet")
    got = REGISTRY["e12_rank_family_two_phase"].fn(spark, d)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "event_id",
        "user_id",
        "rnk",
        "drnk",
        "pr_u",
        "tile",
    ]


def test_skew_two_phase_moving_median_matches_plain_window(spark, skew_sf_dir):
    """e13 on the hot-key soak corpus: the fan-out two-phase moving median
    must equal the plain one-task-per-key frame median EXACTLY — including
    on the user holding 20% of ~1M rows, whose frames now resolve via
    bounded (user, frame_q) groups instead of one serialized history.
    med2 (lower+upper middle) keeps the comparison integer-exact."""
    from pyspark.sql import Window as W

    from marasa_spark.queries.windows import E13_FRAME
    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    got = REGISTRY["e13_moving_median_two_phase"].fn(spark, skew_sf_dir)

    ev = load_table(spark, skew_sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(E13_FRAME - 1), 0)
    )
    vals = F.sort_array(F.collect_list("cents").over(w))
    sz = F.size(vals)
    plain = ev.select(
        "event_id",
        "user_id",
        (
            F.element_at(vals, ((sz + 1) / 2).cast("int"))
            + F.element_at(vals, (sz / 2).cast("int") + F.lit(1))
        )
        .cast("long")
        .alias("med2_cents"),
    )
    assert got.exceptAll(plain).isEmpty()
    assert plain.exceptAll(got).isEmpty()


def test_skew_moving_median_group_sizes_bounded(spark, skew_sf_dir):
    """The structural claim behind e13: no (user, frame_q) group ever
    exceeds the frame size, so per-task memory is O(K) regardless of how
    hot the key is (20% of ~1M rows on HOT_USER here)."""
    from marasa_spark.queries.windows import E13_FRAME

    ev = load_table(spark, skew_sf_dir, "events").select("event_id", "user_id", "ts")
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    fanned = ev.select(
        "user_id",
        rn.alias("rn"),
    ).select(
        "user_id",
        F.explode(F.sequence(F.col("rn"), F.col("rn") + F.lit(E13_FRAME - 1))).alias(
            "frame_q"
        ),
    )
    biggest = (
        fanned.groupBy("user_id", "frame_q")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("mx"))
        .first()["mx"]
    )
    assert biggest <= E13_FRAME
