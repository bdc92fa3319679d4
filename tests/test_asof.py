"""Equivalence of the three as-of join implementations (ops/asof.py): the
band-join+window variant, the union-sort single-shuffle variant (the
oracle-checked c10 path), and the merge_asof-per-group cogroup variant must
agree row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.ops.asof import asof_join, asof_join_grouped, asof_join_union

import pytest
# round 12: heavy property/soak tier — deselected from the default
# driver-stampable run (see conftest); MARASA_FULL_SUITE=1 restores it
pytestmark = pytest.mark.slow



def test_grouped_asof_matches_window_asof(spark, sf_dir):
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
    window_rows = {
        (r["purchase_id"], r["click_id"])
        for r in asof_join(
            purchases,
            clicks,
            on="user_id",
            left_ts="purchase_ts",
            right_ts="click_ts",
            right_seq="click_id",
            left_seq="purchase_id",
        ).collect()
    }
    grouped_rows = {
        (r["purchase_id"], r["click_id"])
        for r in asof_join_grouped(
            purchases,
            clicks,
            on="user_id",
            left_ts="purchase_ts",
            right_ts="click_ts",
            right_seq="click_id",
        ).collect()
    }
    assert window_rows == grouped_rows
    assert len(window_rows) > 0
    union_rows = {
        (r["purchase_id"], r["click_id"])
        for r in asof_join_union(
            purchases,
            clicks,
            on="user_id",
            left_ts="purchase_ts",
            right_ts="click_ts",
            right_seq="click_id",
            left_seq="purchase_id",
        ).collect()
    }
    assert union_rows == window_rows


def test_union_asof_inclusive_bound_and_tiebreak(spark):
    """A right row AT the left timestamp matches (inclusive <=), and ties
    among right rows resolve to the greatest right_seq; 'left' keeps
    unmatched left rows with null right columns."""
    import datetime

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(100, 1, t), (200, 2, t)], "l_id long, key long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 1, t), (11, 1, t), (9, 1, t - datetime.timedelta(minutes=1))],
        "r_id long, key long, r_ts timestamp",
    )
    inner = {
        (r["l_id"], r["r_id"])
        for r in asof_join_union(
            left, right, on="key", left_ts="l_ts", right_ts="r_ts",
            right_seq="r_id", left_seq="l_id",
        ).collect()
    }
    assert inner == {(100, 11)}  # tie at t -> max r_id; key 2 unmatched
    outer = {
        (r["l_id"], r["r_id"])
        for r in asof_join_union(
            left, right, on="key", left_ts="l_ts", right_ts="r_ts",
            right_seq="r_id", left_seq="l_id", how="left",
        ).collect()
    }
    assert outer == {(100, 11), (200, None)}


def test_union_asof_null_timestamps_match_band_join(spark):
    """Dirty-data equivalence: NULL timestamps must behave identically in
    both variants — a null-ts right row never matches (the band predicate
    ``right_ts <= left_ts`` is never true on NULL), and a null-ts left row
    matches nothing (dropped under inner, null-extended under left).
    Regression for the NULLS-FIRST ordering that previously let null-ts
    rows match in the union variant."""
    import datetime

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(100, 1, t), (200, 1, None), (300, 2, t)],
        "l_id long, key long, l_ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 1, t - datetime.timedelta(minutes=1)), (20, 2, None)],
        "r_id long, key long, r_ts timestamp",
    )
    kw = dict(on="key", left_ts="l_ts", right_ts="r_ts",
              right_seq="r_id", left_seq="l_id")
    for how in ("inner", "left"):
        band = {
            (r["l_id"], r["r_id"])
            for r in asof_join(left, right, how=how, **kw).collect()
        }
        union = {
            (r["l_id"], r["r_id"])
            for r in asof_join_union(left, right, how=how, **kw).collect()
        }
        assert union == band, f"how={how}"
    # and the concrete expectation, not just mutual agreement:
    assert {
        (r["l_id"], r["r_id"])
        for r in asof_join_union(left, right, how="left", **kw).collect()
    } == {(100, 10), (200, None), (300, None)}


def test_asof_default_left_seq_keeps_distinct_keys(spark):
    """Regression: without left_seq, the top-1 window must key on
    (join key, left_ts) — two left rows of DIFFERENT keys sharing a
    timestamp both keep their match (a left_ts-only window collapsed them
    to one surviving row)."""
    import datetime

    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t), (2, t)], "key long, l_ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, 1, t - datetime.timedelta(minutes=1)),
         (20, 2, t - datetime.timedelta(minutes=2))],
        "r_id long, key long, r_ts timestamp",
    )
    got = {
        (r["key"], r["r_id"])
        for r in asof_join(
            left, right, on="key", left_ts="l_ts", right_ts="r_ts", right_seq="r_id"
        ).collect()
    }
    assert got == {(1, 10), (2, 20)}


def test_bucketed_tolerance_asof_matches_band_with_tolerance(spark, sf_dir):
    """The (key, time-bucket) equi-join variant must equal the band join
    with the same tolerance — two physical strategies, one semantics. Also
    pins the boundary cases: a match EXACTLY tolerance old still matches
    (inclusive lower bound), bucket replication never duplicates a left
    row, and the candidate set crossing a bucket edge is found via the
    +1-bucket replica."""
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
    tol = 3600
    band = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_seq="click_id",
        left_seq="purchase_id",
        tolerance=F.expr(f"INTERVAL {tol} SECONDS"),
    )
    bucketed = asof_join_bucketed(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="click_ts",
        right_seq="click_id",
        tolerance_s=tol,
        left_seq="purchase_id",
    )
    band_rows = {(r["purchase_id"], r["click_id"]) for r in band.collect()}
    bucketed_rows = {(r["purchase_id"], r["click_id"]) for r in bucketed.collect()}
    assert bucketed_rows == band_rows
    assert len(bucketed_rows) > 0
    # no left row appears twice (the ×2 right replication must not leak)
    ids = [r["purchase_id"] for r in bucketed.collect()]
    assert len(ids) == len(set(ids))


def test_bucketed_asof_exact_tolerance_boundary(spark):
    """A right row exactly `tolerance` before the left row matches
    (inclusive), one microsecond older does not — on BOTH variants."""
    from marasa_spark.ops.asof import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, "k", "2024-01-01 12:00:00"), (2, "k", "2024-01-01 18:00:00")],
        "lid long, k string, lts string",
    ).select("lid", "k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [
            (10, "k", "2024-01-01 11:00:00"),        # exactly 1h before lid=1
            (20, "k", "2024-01-01 16:59:59.999999"),  # 1h + 1µs before lid=2
        ],
        "rid long, k string, rts string",
    ).select("rid", "k", F.col("rts").cast("timestamp").alias("rts"))
    for df in (
        asof_join_bucketed(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_seq="rid", tolerance_s=3600, left_seq="lid",
        ),
        asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_seq="rid", left_seq="lid",
            tolerance=F.expr("INTERVAL 3600 SECONDS"),
        ),
    ):
        rows = {(r["lid"], r["rid"]) for r in df.collect()}
        assert rows == {(1, 10)}


def test_nearest_asof_tie_and_direction_semantics(spark):
    """Constructed boundary cases for direction='nearest': an exact
    distance tie prefers the BACKWARD candidate; same-timestamp right
    rows resolve to max right_seq; a left row with candidates on only
    one side takes that side; a key with no right rows drops (inner)."""
    from marasa_spark.ops.asof import asof_join_nearest

    left = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 12:00:00"),  # tie: rights at 11:00 & 13:00
            (2, "a", "2024-01-01 18:00:00"),  # forward closer (19:00 vs 13:00)
            (3, "b", "2024-01-01 06:00:00"),  # backward-only (05:00)
            (4, "c", "2024-01-01 00:00:00"),  # no rights at all -> dropped
        ],
        "lid long, k string, lts string",
    ).select("lid", "k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [
            (10, "a", "2024-01-01 11:00:00"),
            (11, "a", "2024-01-01 11:00:00"),  # same ts: max seq (11) wins
            (20, "a", "2024-01-01 13:00:00"),
            (30, "a", "2024-01-01 19:00:00"),
            (40, "b", "2024-01-01 05:00:00"),
        ],
        "rid long, k string, rts string",
    ).select("rid", "k", F.col("rts").cast("timestamp").alias("rts"))
    rows = {
        r["lid"]: (r["rid"], r["matched_dir"])
        for r in asof_join_nearest(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_seq="rid", left_seq="lid",
        ).collect()
    }
    assert rows == {
        1: (11, "backward"),  # tie -> backward; same-ts -> max rid
        2: (30, "forward"),
        3: (40, "backward"),
    }
