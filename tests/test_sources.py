"""Round-trip integrity for the rows-only source/sink operators (a2/a3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.queries.sinks import a2_source_csv_json, a3_sink_parquet


def test_csv_json_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = a2_source_csv_json(spark, sf_dir)
    assert out.count() == docs.count()
    # text round-trips byte-exact through JSON: length matches n_chars
    bad = out.filter(F.col("text_len") != F.col("n_chars")).count()
    assert bad == 0
    # CSV carried the typed columns through
    want = {
        (r["doc_id"], r["lang"], r["source"], r["n_chars"])
        for r in docs.select("doc_id", "lang", "source", "n_chars").collect()
    }
    got = {
        (r["doc_id"], r["lang"], r["source"], r["n_chars"])
        for r in out.select("doc_id", "lang", "source", "n_chars").collect()
    }
    assert got == want


def test_parquet_append_doubles(spark, sf_dir):
    out = {r["o_orderpriority"]: (r["n_rows"], r["total"]) for r in a3_sink_parquet(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    want = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for prio, n in want.items():
        n_rows, total = out[prio]
        assert n_rows == 2, "append should add a second copy, not rewrite"
        assert total == 2 * n
