"""Salted aggregation / hot-key join correctness vs the unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.ops.skew import salted_agg, salted_join_hot_keys


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
