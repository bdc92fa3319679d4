"""Group H — scalar function surface (SURVEY.md §2.H).

Dialect-alignment notes (each verified in the parity suite):
* DuckDB `length`/`len`/`year`/`datediff` return BIGINT where Spark returns
  INT — oracles cast to match Spark's types.
* DuckDB `regexp_replace` is first-match by default — oracles pass the 'g'
  flag to match Spark's replace-all.
* DuckDB `dayofweek` is 0=Sunday, Spark is 1=Sunday — oracle adds 1.
* Spark `floor`/`ceil` on DOUBLE return BIGINT — oracle casts.
* libm functions (ln/log10/sqrt) may differ in the last ulp across
  runtimes — rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.queries._util import r2, r2sql
from marasa_spark.registry import register

H1_ORACLE = """
SELECT c_custkey,
       upper(c_name)                                  AS uname,
       lower(c_mktsegment)                            AS lseg,
       substr(c_name, 1, 8)                           AS pref,
       trim(concat('  ', c_name, '  '))               AS trimmed,
       lpad(CAST(c_custkey AS VARCHAR), 9, '0')       AS padkey,
       replace(c_name, 'Customer', 'Cust')            AS repl,
       CAST(length(c_name) AS INT)                    AS name_len,
       concat(c_name, '-', c_mktsegment)              AS tagged
FROM customer
"""


@register("h1_fn_string", oracle=H1_ORACLE, group="H")
def h1_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 1, 8).alias("pref"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padkey"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("repl"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_name"), F.lit("-"), F.col("c_mktsegment")).alias("tagged"),
    )


H2_ORACLE = """
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+)', 1)        AS first_word,
       regexp_replace(p_type, '[AEOU]', '', 'g')     AS devowel
FROM part
"""


@register("h2_fn_regex", oracle=H2_ORACLE, group="H")
def h2_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POSIX-simple patterns only (Java vs RE2 dialects agree on these)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", "[AEOU]", "").alias("devowel"),
    )


H3_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
"""


@register("h3_fn_split_explode", oracle=H3_ORACLE, group="H")
def h3_fn_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + flatten (explode ↔ unnest)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


H4_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT)                          AS yr,
       CAST(month(o_orderdate) AS INT)                         AS mo,
       CAST(day(o_orderdate) AS INT)                           AS dy,
       CAST(dayofweek(o_orderdate) + 1 AS INT)                 AS dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)     AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE)             AS plus30,
       CAST(date_diff('day', o_orderdate, DATE '2000-01-01') AS INT) AS days_to_y2k,
       last_day(CAST(o_orderdate AS DATE))                     AS month_end
FROM orders
"""


@register("h4_fn_datetime", oracle=H4_ORACLE, group="H")
def h4_fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add("o_orderdate", 30).alias("plus30"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        F.last_day("o_orderdate").alias("month_end"),
    )


H5_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       {r2sql("l_extendedprice / l_quantity")}       AS unit_price,
       CAST(floor(l_extendedprice) AS BIGINT)        AS floor_price,
       CAST(ceil(l_extendedprice) AS BIGINT)         AS ceil_price,
       abs(l_discount - 0.05)                        AS abs_disc_gap,
       pow(l_quantity, 2)                            AS qty_sq,
       {r2sql("sqrt(l_quantity)", 6)}                AS qty_sqrt,
       {r2sql("ln(l_extendedprice)", 6)}             AS ln_price,
       {r2sql("log10(l_extendedprice)", 6)}          AS log10_price,
       l_linenumber % 3                              AS mod3,
       CAST(sign(l_discount - 0.05) AS INT)          AS disc_sign,
       greatest(l_tax, l_discount)                   AS max_rate,
       least(l_tax, l_discount)                      AS min_rate
FROM lineitem
"""


@register("h5_fn_math", oracle=H5_ORACLE, group="H")
def h5_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r2(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.floor("l_extendedprice").alias("floor_price"),
        F.ceil("l_extendedprice").alias("ceil_price"),
        F.abs(F.col("l_discount") - 0.05).alias("abs_disc_gap"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        r2(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        r2(F.log("l_extendedprice"), 6).alias("ln_price"),
        r2(F.log10("l_extendedprice"), 6).alias("log10_price"),
        (F.col("l_linenumber") % 3).alias("mod3"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


H6_ORACLE = f"""
SELECT vec_id,
       CAST(len(embedding) AS INT)                               AS dim,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT)      AS n_pos,
       {r2sql("list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))")} AS sum_d,
       embedding[1]                                              AS elem1
FROM embeddings
"""


@register("h6_fn_array", oracle=H6_ORACLE, group="H")
def h6_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform/filter/aggregate) on the
    64-d embedding vectors — sequential fold order is identical on both
    engines, so the double sum is exact."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        r2(
            F.aggregate(
                F.transform(emb, lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("sum_d"),
        F.element_at(emb, 1).alias("elem1"),
    )


H12_ORACLE = """
SELECT vec_id,
       list_max(embedding)                                        AS max_elem,
       list_min(embedding)                                        AS min_elem,
       CAST(list_position(embedding, list_max(embedding)) AS INT) AS argmax_pos,
       list_sort(embedding)[1]                                    AS sorted_first,
       list_reverse(embedding)[1]                                 AS last_elem,
       list_has_any(embedding[1:8], embedding[5:12])              AS slices_overlap
FROM embeddings
"""


@register("h12_fn_array2", oracle=H12_ORACLE, group="H")
def h12_fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array batch: max/min, argmax position, sort, reverse,
    overlap — float32 values compare exactly on both engines (same stored
    bits, widened identically)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.array_max(emb).alias("max_elem"),
        F.array_min(emb).alias("min_elem"),
        F.array_position(emb, F.array_max(emb)).cast("int").alias("argmax_pos"),
        F.element_at(F.array_sort(emb), 1).alias("sorted_first"),
        F.element_at(F.reverse(emb), 1).alias("last_elem"),
        F.arrays_overlap(F.slice(emb, 1, 8), F.slice(emb, 5, 8)).alias("slices_overlap"),
    )


@register("h7_fn_map", oracle=None, group="H")
def h7_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (rows-only: DuckDB map rendering differs).

    Builds a map per event, reads it back via element lookup + map_keys.
    """
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("value"), F.col("value"), F.lit("uid"), F.col("user_id").cast("double")
    )
    return ev.select(
        "event_id",
        m.alias("props_map"),
        F.map_keys(m).alias("keys"),
        m["value"].alias("value_back"),
    )


H10_ORACLE = """
SELECT p_partkey,
       reverse(p_name)                       AS rev_name,
       split_part(p_name, ' ', 1)            AS adjective,
       split_part(p_name, ' ', 2)            AS noun,
       repeat(p_brand, 2)                    AS brand2,
       contains(p_type, 'ECONOMY')           AS is_economy,
       starts_with(p_name, 'cold')           AS is_cold,
       ends_with(p_name, 'bolt')             AS is_bolt,
       translate(p_brand, '#', '-')          AS brand_dash
FROM part
"""


@register("h10_fn_string2", oracle=H10_ORACLE, group="H")
def h10_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: reverse/split_part/repeat/contains/starts_with/
    ends_with/translate."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_name").alias("rev_name"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adjective"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        F.repeat(F.col("p_brand"), 2).alias("brand2"),
        F.contains(F.col("p_type"), F.lit("ECONOMY")).alias("is_economy"),
        F.startswith(F.col("p_name"), F.lit("cold")).alias("is_cold"),
        F.endswith(F.col("p_name"), F.lit("bolt")).alias("is_bolt"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
    )


H11_ORACLE = """
SELECT o_orderkey,
       CAST(weekofyear(o_orderdate) AS INT)   AS iso_week,
       CAST(dayofyear(o_orderdate) AS INT)    AS doy,
       CAST(quarter(o_orderdate) AS INT)      AS qtr,
       CAST(epoch(o_orderdate) AS BIGINT)     AS epoch_s
FROM orders
"""


@register("h11_fn_datetime2", oracle=H11_ORACLE, group="H")
def h11_fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second datetime batch: ISO week, day-of-year, quarter, epoch seconds
    (session TZ pinned UTC so unix_timestamp ≡ DuckDB epoch)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


H8_ORACLE = f"""
SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
       count(*)                 AS n,
       {r2sql("sum(value)")}    AS sum_value
FROM events
GROUP BY k
"""


@register("h8_fn_json", oracle=H8_ORACLE, group="H")
def h8_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (the marasa dynamic-payload pattern)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k"), F.col("value")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), r2(F.sum("value")).alias("sum_value"))
    )


H9_ORACLE = """
SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256 FROM documents
"""


@register("h9_fn_hash", oracle=H9_ORACLE, group="H")
def h9_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


H13_ORACLE = """
SELECT o_orderkey,
       greatest(o_totalprice, CAST(100000 AS DOUBLE)) AS floor_price,
       least(o_totalprice, CAST(100000 AS DOUBLE))    AS cap_price,
       nullif(o_orderstatus, 'O')                     AS closed_status,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN')   AS status_label,
       CASE WHEN o_orderstatus = 'F' AND o_totalprice > CAST(150000 AS DOUBLE)
            THEN o_totalprice END                     AS big_final_price
FROM orders
"""


@register("h13_fn_conditional", oracle=H13_ORACLE, group="H")
def h13_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar surface: greatest/least clamping, NULLIF
    sentinel-to-null, COALESCE defaulting, guarded projection — all
    codegen'd row expressions, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.greatest("o_totalprice", F.lit(100000.0)).alias("floor_price"),
        F.least("o_totalprice", F.lit(100000.0)).alias("cap_price"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("closed_status"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0),
            F.col("o_totalprice"),
        ).alias("big_final_price"),
    )


H14_ORACLE = """
SELECT o_orderkey,
       o_orderkey & 255                       AS low_byte,
       o_orderkey | 4096                      AS with_flag,
       xor(o_orderkey, o_custkey)             AS key_xor,
       o_orderkey << 2                        AS shifted_l,
       o_orderkey >> 3                        AS shifted_r,
       CAST(bit_count(o_orderkey) AS INT)     AS popcount
FROM orders
"""


@register("h14_fn_bitwise", oracle=H14_ORACLE, group="H")
def h14_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: and/or/xor, shifts, popcount — pure codegen
    integer ops (the building blocks the SimHash/LSH family uses)."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
        F.bit_count(k).alias("popcount"),
    )


H15_ORACLE = f"""
SELECT l_orderkey, l_linenumber,
       {r2sql("sin(l_discount)", 6)}                   AS sin_d,
       {r2sql("cos(l_discount)", 6)}                   AS cos_d,
       {r2sql("atan2(l_discount, l_tax + CAST(0.01 AS DOUBLE))", 6)} AS at2,
       {r2sql("degrees(l_discount)", 6)}               AS deg,
       {r2sql("exp(l_discount)", 6)}                   AS exp_d
FROM lineitem
WHERE l_orderkey < 1000
"""


@register("h15_fn_trig", oracle=H15_ORACLE, group="H")
def h15_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric/transcendental batch (libm last-ulp differences across
    runtimes absorbed by 6-decimal rounding, like h5)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r2(F.sin(d), 6).alias("sin_d"),
        r2(F.cos(d), 6).alias("cos_d"),
        r2(F.atan2(d, F.col("l_tax") + F.lit(0.01)), 6).alias("at2"),
        r2(F.degrees(d), 6).alias("deg"),
        r2(F.exp(d), 6).alias("exp_d"),
    )


H16_ORACLE = """
SELECT p_partkey,
       printf('%06d:%s', p_partkey, p_brand)            AS tag,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0')        AS padded_key,
       rpad(p_brand, 12, '.')                           AS brand_cell,
       translate(p_type, 'ae', '__')                    AS masked_type,
       left(p_name, 5)                                  AS name_head,
       right(p_name, 4)                                 AS name_tail
FROM part
"""


@register("h16_fn_format", oracle=H16_ORACLE, group="H")
def h16_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting batch: printf-style format, pad, translate,
    left/right — report/export rendering surface, all codegen."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%06d:%s", "p_partkey", "p_brand").alias("tag"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("p_brand", 12, ".").alias("brand_cell"),
        F.translate("p_type", "ae", "__").alias("masked_type"),
        F.left("p_name", F.lit(5)).alias("name_head"),
        F.right("p_name", F.lit(4)).alias("name_tail"),
    )


H17_ORACLE = """
WITH t AS (
  SELECT p_partkey,
         list_filter(string_split(p_type, ' '), w -> len(w) > 5) AS toks
  FROM part
), u AS (
  SELECT p_partkey, toks, unnest(range(1, len(toks) + 1)) AS i FROM t
)
SELECT t.p_partkey, CAST(u.i - 1 AS INT) AS pos, u.toks[u.i] AS word
FROM t LEFT JOIN u ON t.p_partkey = u.p_partkey
"""


@register("h17_fn_posexplode_outer", oracle=H17_ORACLE, group="H")
def h17_fn_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional + OUTER generator: posexplode_outer keeps rows whose
    filtered array is empty (NULL pos/word) — the \"explode must not drop
    parents\" contract; the oracle mirrors it with a LEFT JOIN against the
    unnest."""
    p = load_table(spark, sf_dir, "part")
    toks = F.filter(F.split("p_type", " "), lambda w: F.length(w) > 5)
    return p.select("p_partkey", toks.alias("toks")).select(
        "p_partkey", F.posexplode_outer("toks").alias("pos", "word")
    )


H18_ORACLE = """
SELECT event_id,
       TRY_CAST(props AS INTEGER)                          AS props_as_int,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       value / nullif(CAST(event_id % 5 AS DOUBLE), 0)     AS safe_ratio
FROM events
WHERE event_id < 2000
"""


@register("h18_fn_try", oracle=H18_ORACLE, group="H")
def h18_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface: try_cast on unparseable strings and
    try_divide by zero produce NULL, never a task failure — the difference
    between one bad record and a dead 100 TB job. (Oracle mirrors
    try_divide with /nullif, DuckDB's equivalent.)"""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.col("props").try_cast("int").alias("props_as_int"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.try_divide("value", (F.col("event_id") % 5).cast("double")).alias("safe_ratio"),
    )


H19_ORACLE = """
WITH urls AS (
    SELECT p_partkey,
           'https://shop-' || lower(replace(p_brand, '#', '')) || '.example.com/'
               || lower(replace(p_type, ' ', '-')) || '?pk=' || p_partkey AS url
    FROM part WHERE p_partkey <= 800
)
SELECT p_partkey, url,
       regexp_extract(url, 'https://([^/]+)/', 1)    AS host,
       regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, 'pk=([0-9]+)', 1)         AS qp_pk
FROM urls
"""


@register("h19_fn_url", oracle=H19_ORACLE, group="H")
def h19_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface (parse_url HOST/PATH/QUERY-param) over URLs
    built deterministically from part rows; the oracle re-parses with
    equivalent regexes since DuckDB has no parse_url. Web-corpus pipelines
    lean on this for domain-level dedup, robots filtering and domain-mix
    curation (k30) — all stateless per-row JVM expressions, no shuffle."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 800)
    url = F.concat(
        F.lit("https://shop-"),
        F.lower(F.replace(F.col("p_brand"), F.lit("#"), F.lit(""))),
        F.lit(".example.com/"),
        F.lower(F.replace(F.col("p_type"), F.lit(" "), F.lit("-"))),
        F.lit("?pk="),
        F.col("p_partkey").cast("string"),
    )
    u = p.select("p_partkey", url.alias("url"))
    return u.select(
        "p_partkey",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("pk")).alias("qp_pk"),
    )


H20_ORACLE = f"""
SELECT event_type,
       count(*) AS n,
       CAST(count(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS n_typed,
       {r2sql("avg(CAST(json_extract(props, '$.k') AS INT))")} AS avg_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
"""


@register("h20_fn_json_schema", oracle=H20_ORACLE, group="H")
def h20_fn_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON with TYPES: ``from_json`` parses the payload
    against a declared StructType once, then every downstream expression is
    typed column access (h8's ``get_json_object`` re-parses the string per
    extraction and always yields strings). Malformed payloads become NULL
    structs instead of job failures — the count(typed) vs count(*) gap is
    the built-in corruption meter. At 100 TB parse-once-then-project is the
    only sane shape for multi-field JSON payloads; the log store's
    ``value`` column (SURVEY §1.1) reads the same way."""
    ev = load_table(spark, sf_dir, "events")
    typed = ev.withColumn("j", F.from_json("props", "k INT"))
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("j.k").alias("n_typed"),
        r2(F.avg("j.k")).alias("avg_k"),
        F.max("j.k").alias("max_k"),
    )


H21_ORACLE = """
WITH formatted AS (
  SELECT o_orderkey,
         strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS s_euro,
         strftime(o_orderdate, '%Y%m%d') AS s_compact
  FROM orders
)
SELECT o_orderkey,
       strptime(s_euro, '%d/%m/%Y %H:%M:%S') AS parsed_ts,
       CAST(strptime(s_compact, '%Y%m%d') AS DATE) AS parsed_date,
       try_strptime(s_compact, '%d/%m/%Y') AS misparse
FROM formatted
"""


@register("h21_fn_datetime_parse", oracle=H21_ORACLE, group="H")
def h21_fn_datetime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→timestamp parsing round trip: format a real timestamp into
    two string layouts, parse both back, and try-parse with a WRONG
    pattern (NULL, not failure — the ingestion posture for dirty date
    columns). The two engines use different pattern LANGUAGES (Java
    letters vs strptime %-codes) — the op pins that the engine's patterns
    produce value-identical results to the oracle's, which is exactly the
    trap a pipeline hits porting ETL between engines."""
    o = load_table(spark, sf_dir, "orders")
    formatted = o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "dd/MM/yyyy HH:mm:ss").alias("s_euro"),
        F.date_format("o_orderdate", "yyyyMMdd").alias("s_compact"),
    )
    return formatted.select(
        "o_orderkey",
        F.to_timestamp("s_euro", "dd/MM/yyyy HH:mm:ss").alias("parsed_ts"),
        F.to_date("s_compact", "yyyyMMdd").alias("parsed_date"),
        F.try_to_timestamp(F.col("s_compact"), F.lit("dd/MM/yyyy")).alias("misparse"),
    )


H22_ORACLE = f"""
SELECT event_type,
       count(*) AS n,
       {r2sql("avg(CAST(json_extract(props, '$.k') AS INT))")} AS avg_k
FROM events
WHERE CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
GROUP BY event_type
"""


@register("h22_fn_variant", oracle=H22_ORACLE, group="H")
def h22_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): ``parse_json`` once into a
    binary-encoded variant, then typed ``variant_get`` path extraction —
    the open-schema payload answer between h8's string re-parsing and
    h20's fixed StructType: no declared schema, but extraction is typed
    and the encoded form avoids re-tokenizing JSON per access. The oracle
    computes the same typed extraction via DuckDB's JSON path — variant
    semantics must be value-identical to a JSON reference."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.withColumn("v", F.parse_json("props"))
    k = F.variant_get("v", "$.k", "int")
    return (
        v.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), r2(F.avg(k)).alias("avg_k"))
    )
