"""Group A (source/sink part) — text-format ingestion + parquet sink
(SURVEY.md §2 a2/a3). Both round-trips are deterministic, so they carry
full hash oracles phrased over the ORIGINAL tables: the check passes only
if the data survives the format round-trip byte-exact. Write-path
mechanics (append adds files, never rewrites) are additionally asserted in
tests/test_sources.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.queries._util import fresh_scratch, r2, r2sql
from marasa_spark.registry import register


A2_ORACLE = """
SELECT doc_id, lang, source, n_chars, n_chars AS text_len FROM documents
"""


@register("a2_source_csv_json", oracle=A2_ORACLE, group="A")
def a2_source_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON ingestion with explicit schemas (no inference in prod —
    a schema mismatch should fail loudly, not silently coerce): documents
    round-trip through both formats, joined back together."""
    d = fresh_scratch("a2_text", sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    docs.write.mode("overwrite").option("header", True).csv(f"{d}/csv")
    load_table(spark, sf_dir, "documents").select("doc_id", "text").write.mode(
        "overwrite"
    ).json(f"{d}/json")

    from_csv = spark.read.schema("doc_id long, lang string, source string, n_chars long").csv(
        f"{d}/csv", header=True
    )
    from_json = spark.read.schema("doc_id long, text string").json(f"{d}/json")
    return from_csv.join(from_json, "doc_id").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.length("text").cast("long").alias("text_len"),
    )


A3_ORACLE = """
SELECT o_orderpriority,
       CAST(2 AS BIGINT) AS n_rows,
       CAST(2 * count(*) AS BIGINT) AS total
FROM orders
GROUP BY o_orderpriority
"""


@register("a3_sink_parquet", oracle=A3_ORACLE, group="A")
def a3_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet sink: append twice, read back — append mode must add files,
    never rewrite (the log-structured write discipline)."""
    d = fresh_scratch("a3_parquet", sf_dir)
    result = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    result.write.mode("append").parquet(d)
    result.write.mode("append").parquet(d)  # second append → doubled rows
    back = spark.read.parquet(d)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("n").cast("long").alias("total")
    )


A7_ORACLE = """
SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(sum(l_quantity) AS BIGINT) AS qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@register("a7_sink_orc", oracle=A7_ORACLE, group="A")
def a7_sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (the second columnar format Spark ships natively):
    lineitem keys/measures written to ORC and read back — the oracle is
    phrased over the ORIGINAL table, so it passes only if the format
    round-trip is value-exact."""
    d = fresh_scratch("a7_orc", sf_dir)
    load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity"
    ).write.mode("overwrite").orc(d)
    back = spark.read.schema(
        "l_returnflag string, l_linestatus string, l_quantity double"
    ).orc(d)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").cast("long").alias("qty"),
    )


A8_ORACLE = f"""
WITH merged AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT o_orderstatus,
       count(*) AS n,
       CAST(count(o_totalprice) AS BIGINT) AS n_priced,
       {r2sql("sum(o_totalprice)")} AS sum_price
FROM merged
GROUP BY o_orderstatus
"""


@register("a8_schema_merge", oracle=A8_ORACLE, group="A")
def a8_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches written with different
    schemas (the second adds o_totalprice), read back with mergeSchema —
    the missing column must surface as NULLs, not an error. Schema drift is
    a fact of life in a long-lived 100 TB lake; mergeSchema's footprint is
    per-FILE footer unions, no data rewrite."""
    d = fresh_scratch("a8_merge", sf_dir)
    o = load_table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    ).write.mode("overwrite").parquet(f"{d}/b0")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    ).write.mode("overwrite").parquet(f"{d}/b1")
    back = spark.read.option("mergeSchema", "true").parquet(f"{d}/b0", f"{d}/b1")
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_totalprice").alias("n_priced"),
        r2(F.sum("o_totalprice")).alias("sum_price"),
    )


A9_ORACLE = f"""
SELECT event_type, count(*) AS n, {r2sql("sum(value)")} AS sum_value
FROM events
GROUP BY event_type
"""


@register("a9_source_text_parse", oracle=A9_ORACLE, group="A")
def a9_source_text_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-text source + regex field extraction (the classic log-ingest ETL):
    events rendered to log lines, read back with spark.read.text, fields
    re-extracted with regexp_extract, aggregated. The oracle runs on the
    ORIGINAL table, so the round-trip must be value-exact — doubles survive
    because %s formatting is Java's shortest-round-trip rendering and the
    parse casts it straight back."""
    d = fresh_scratch("a9_text", sf_dir)
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        F.format_string(
            "ts=%s user=%d type=%s value=%s", "ts", "user_id", "event_type", "value"
        ).alias("value")
    ).write.mode("overwrite").text(d)
    back = spark.read.text(d)
    parsed = back.select(
        F.regexp_extract("value", r"type=(\S+)", 1).alias("event_type"),
        F.regexp_extract("value", r"value=(\S+)", 1).cast("double").alias("value"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), r2(F.sum("value")).alias("sum_value")
    )


A10_ORACLE = """
SELECT p_partkey,
       p_name || ',"' || chr(10) || '|' || p_brand AS nasty,
       length(p_name || ',"' || chr(10) || '|' || p_brand) AS n_chars
FROM part
WHERE p_partkey <= 500
"""


@register("a10_csv_quoting", oracle=A10_ORACLE, group="A")
def a10_csv_quoting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip under hostile content: values containing the
    delimiter, the quote char, AND embedded newlines must survive write →
    read (quote-all + multiLine read). The oracle recomputes the nasty
    string from the original table, so any quoting/escape loss breaks the
    hash. At scale note: multiLine CSV is NOT splittable — one file, one
    task; keep quoted-newline data in parquet and use CSV only at the
    edges."""
    d = fresh_scratch("a10_csv", sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    nasty = F.concat("p_name", F.lit(',"\n|'), F.col("p_brand"))
    p.select("p_partkey", nasty.alias("nasty")).write.mode("overwrite").option(
        "header", True
    ).option("quoteAll", True).csv(d)
    back = spark.read.option("header", True).option("multiLine", True).schema(
        "p_partkey long, nasty string"
    ).csv(d)
    return back.select("p_partkey", "nasty", F.length("nasty").alias("n_chars"))


A12_ORACLE = f"""
SELECT count(CASE WHEN o_orderkey % 7 <> 0 THEN 1 END) AS n_good,
       count(CASE WHEN o_orderkey % 7 = 0 THEN 1 END) AS n_corrupt,
       {r2sql("sum(CASE WHEN o_orderkey % 7 <> 0 THEN o_totalprice END)")}
           AS sum_good
FROM orders WHERE o_orderkey < 3000
"""


@register("a12_json_corrupt", oracle=A12_ORACLE, group="A")
def a12_json_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSONL ingestion with corrupt-record routing: every 7th
    line is mangled mid-value; the reader must park the raw line in
    _corrupt (all data fields null) WITHOUT failing the job, and the good
    rows' doubles must round-trip bit-exactly through to_json/parse (the
    oracle sums the original values). At 100 TB a FAILFAST web-scrape
    ingest is a denial of service against yourself — permissive + corrupt
    counter + quarantine (m15) is the posture."""
    d = fresh_scratch("a12_json", sf_dir)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    line = F.when(
        F.col("o_orderkey") % 7 == 0,
        F.concat(
            F.lit('{"o_orderkey":'),
            F.col("o_orderkey").cast("string"),
            F.lit(',"o_totalprice":#}'),
        ),
    ).otherwise(F.to_json(F.struct("o_orderkey", "o_totalprice")))
    o.select(line.alias("value")).write.mode("overwrite").text(d)
    back = spark.read.schema(
        "o_orderkey long, o_totalprice double, _corrupt string"
    ).option("columnNameOfCorruptRecord", "_corrupt").option(
        "mode", "PERMISSIVE"
    ).json(d)
    return back.agg(
        F.count("o_totalprice").alias("n_good"),
        F.count("_corrupt").alias("n_corrupt"),
        r2(F.sum("o_totalprice")).alias("sum_good"),
    )


A13_ORACLE = f"""
SELECT CAST(month(l_shipdate) AS INT) AS mo,
       count(*) AS n,
       {r2sql("sum(l_extendedprice)")} AS sum_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY mo
"""


@register("a13_clustered_sink", oracle=A13_ORACLE, group="A")
def a13_clustered_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-on-write clustering: range-partition + locally sort the fact on
    its dominant predicate column before writing, so parquet min/max
    statistics become tight and DISJOINT — a later date-range read skips
    whole files (range partitioning) and whole row groups (local sort)
    using footer stats alone, before any column IO. At 100 TB this is the
    highest-leverage layout decision after directory partitioning: it
    costs one range shuffle at write time and pays on every subsequent
    scan. The read-back aggregate carries the hash oracle (clustering must
    never change values); the stats-tightness property itself is asserted
    from the parquet footers in tests/test_sources.py."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    d = fresh_scratch("a13_cluster", sf_dir)
    (
        li.repartitionByRange(4, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(d)
    )
    back = spark.read.parquet(d).filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    return back.groupBy(F.month("l_shipdate").alias("mo")).agg(
        F.count(F.lit(1)).alias("n"),
        r2(F.sum("l_extendedprice")).alias("sum_price"),
    )


A14_ORACLE = f"""
SELECT event_type, count(*) AS n, {r2sql("sum(value)")} AS sum_value
FROM events
WHERE event_id < 2 * ((SELECT count(*) + 3 FROM events) // 4)
GROUP BY event_type
"""


@register("a14_incremental_files", oracle=A14_ORACLE, group="A")
def a14_incremental_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level incremental ingestion: the events table staged as 4
    seqno-ranged files, then ONE read selects only the first two via
    pathGlobFilter — the scan's file listing never admits the others (no
    read-then-filter). This is the cheap end of incremental processing: a
    producer that writes range-named (or date-named) files lets every
    consumer express 'the delta since last run' as a glob/modifiedAfter
    predicate at listing time, before any IO or filtering. The oracle
    recomputes the same slice from the seqno arithmetic the staging used."""
    from marasa_spark.streaming.runtime import EVENTS_STAGED_SCHEMA, stage_event_chunks

    stage = fresh_scratch("a14_files", sf_dir, create=True)
    stage_event_chunks(spark, sf_dir, stage, n_chunks=4)
    picked = (
        spark.read.schema(EVENTS_STAGED_SCHEMA)
        .option("pathGlobFilter", "chunk_0[01]_*.parquet")
        .parquet(stage)
    )
    return picked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), r2(F.sum("value")).alias("sum_value")
    )
