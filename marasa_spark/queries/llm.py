"""Group K — LLM-training-data pipeline operators (SURVEY.md §2.K + the
north star's dedup / similarity / multimodal / text-analysis expansion).

k1-k8 are the SURVEY §2 contract; k9-k17 extend it with the scale-path
variants (MinHash-LSH, SimHash, embedding near-dup, lang-ID, quality
scoring, token counting, fingerprinting, IVF ANN, multimodal binary).
Implementations live in marasa_spark/ops/ — these entries wire them to
testdata + DuckDB oracles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.ops import dedup as D
from marasa_spark.ops import multimodal as M
from marasa_spark.ops import similarity as S
from marasa_spark.ops import text as T
from marasa_spark.queries._util import fresh_scratch, r2, r2sql
from marasa_spark.registry import register


def cos_sql(a: str, b: str) -> str:
    """DuckDB double-precision cosine with the same sequential fold order as
    ops.similarity.cosine (bit-compatible; the builtin
    list_cosine_similarity accumulates in float32 and is NOT oracle-safe)."""
    def sq(v: str) -> str:
        return (
            f"list_sum(list_transform(range(1, len({v})+1),"
            f" i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE)))"
        )

    dot = (
        f"list_sum(list_transform(range(1, len({a})+1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    return f"({dot} / (sqrt({sq(a)}) * sqrt({sq(b)})))"


# ---------------------------------------------------------------------------
# k1-k3 — text aggregation / profiling / rule-based classification
# ---------------------------------------------------------------------------

K1_ORACLE = """
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
"""


@register("k1_word_count", oracle=K1_ORACLE, group="K")
def k1_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + term frequency (the canonical map-side-combine shape)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


K2_ORACLE = f"""
SELECT lang, source, count(*) AS n,
       {r2sql("avg(n_chars)")} AS avg_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
"""


@register("k2_lang_stats", oracle=K2_ORACLE, group="K")
def k2_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language/source corpus profile."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n"),
        r2(F.avg("n_chars")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_CLS_JOIN = "(^| )(join|merge)( |$)"
_CLS_WIN = "(^| )(window|partition)( |$)"
_CLS_AGG = "(^| )(sum|count|avg)( |$)"

K3_ORACLE = f"""
SELECT CASE WHEN regexp_matches(text, '{_CLS_JOIN}') THEN 'join-y'
            WHEN regexp_matches(text, '{_CLS_WIN}') THEN 'window-y'
            WHEN regexp_matches(text, '{_CLS_AGG}') THEN 'agg-y'
            ELSE 'other' END AS doc_class,
       count(*) AS n
FROM documents
GROUP BY doc_class
"""


@register("k3_keyword_class", oracle=K3_ORACLE, group="K")
def k3_keyword_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based text classification (keyword rules, first match wins)."""
    d = load_table(spark, sf_dir, "documents")
    cls = (
        F.when(F.col("text").rlike(_CLS_JOIN), "join-y")
        .when(F.col("text").rlike(_CLS_WIN), "window-y")
        .when(F.col("text").rlike(_CLS_AGG), "agg-y")
        .otherwise("other")
    )
    return d.select(cls.alias("doc_class")).groupBy("doc_class").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# k4/k5 — dedup (exact + near)
# ---------------------------------------------------------------------------

K4_ORACLE = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents
GROUP BY content_hash
"""


@register("k4_dedup_exact", oracle=K4_ORACLE, group="K")
def k4_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: representative (min id) + copy count.
    (sf0.1 contains 8 exact dup texts; smaller sfs have none — both states
    hash-check.)"""
    return D.exact_dup_groups(
        load_table(spark, sf_dir, "documents"), "doc_id", "text"
    )


K5_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 1000
), cnt AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(i AS DOUBLE)) AS jaccard
FROM inter
JOIN cnt na ON doc_a = na.doc_id
JOIN cnt nb ON doc_b = nb.doc_id
WHERE CAST(i AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(i AS DOUBLE)) >= 0.9
"""


@register("k5_dedup_near", oracle=K5_ORACLE, group="K")
def k5_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact token-set Jaccard ≥ 0.9 (O(n²) reference,
    bounded to the doc_id<1000 verification slice — the k19/k20
    convention; quadratic work over an unbounded corpus is exactly what
    k9's MinHash-LSH replaces at scale)."""
    return D.jaccard_pairs(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000),
        "doc_id",
        "text",
        threshold=0.9,
    )


# ---------------------------------------------------------------------------
# k6/k7 — similarity search + kNN classification
# ---------------------------------------------------------------------------

_K6_COS_R6 = r2sql(cos_sql("q.embedding", "c.embedding"), 6)

K6_ORACLE = f"""
SELECT q_id, c_id, sim, rank
FROM (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         {_K6_COS_R6} AS sim,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {_K6_COS_R6} DESC, c.vec_id) AS rank
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
  JOIN embeddings c ON c.vec_id <> q.vec_id
)
WHERE rank <= 5
"""


@register("k6_sim_cosine_topk", oracle=K6_ORACLE, group="K")
def k6_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 cosine neighbors for each probe vector (brute force; the probe
    side broadcasts, corpus streams — see ops/similarity.py scale notes)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return S.cosine_topk(queries, corpus, k=5)


_K7_COS_R6 = r2sql(cos_sql("q.embedding", "c.embedding"), 6)

K7_ORACLE = f"""
WITH nn AS (
  SELECT q_id, c_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY {_K7_COS_R6} DESC, c.vec_id) AS rank
    FROM (SELECT * FROM embeddings WHERE vec_id < 20) q
    JOIN embeddings c ON c.vec_id <> q.vec_id
  ) WHERE rank <= 5
), votes AS (
  SELECT q_id, label, count(*) AS votes
  FROM nn JOIN embeddings ON c_id = vec_id
  GROUP BY q_id, label
)
SELECT q_id, label AS pred_label, votes
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY votes DESC, label) AS vrank
      FROM votes)
WHERE vrank = 1
"""


@register("k7_knn_label", oracle=K7_ORACLE, group="K")
def k7_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-label vote (deterministic tiebreak: min label)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    neighbors = S.cosine_topk(queries, corpus, k=5).select("q_id", "c_id")
    labels = e.select(F.col("vec_id").alias("c_id"), "label")
    return S.knn_label_vote(neighbors, labels, "q_id", "c_id", "label")


# ---------------------------------------------------------------------------
# k8 — multimodal struct column (text ⋈ embedding)
# ---------------------------------------------------------------------------

K8_ORACLE = """
SELECT doc_id, lang, n_chars, label, CAST(len(embedding) AS INT) AS dim
FROM documents JOIN embeddings ON doc_id = vec_id
"""


@register("k8_multimodal", oracle=K8_ORACLE, group="K")
def k8_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record: text + vector in one struct column; the oracle
    checks the projected scalar fields (struct rendering is dialect-bound)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(e, d.doc_id == e.vec_id).withColumn(
        "record",
        F.struct("text", "embedding", "lang", "label"),
    )
    return joined.select(
        "doc_id",
        F.col("record.lang").alias("lang"),
        "n_chars",
        F.col("record.label").alias("label"),
        F.size("record.embedding").alias("dim"),
    )


# ---------------------------------------------------------------------------
# k9/k10 — the dedup scale paths (k9 is hash-oracled: at 16 bands × 2 rows
# the banding curve gives candidate recall ≈ 1-(1-0.81)^16 ≈ 1.0 at θ=0.9
# and verification removes every false positive, so the verified LSH output
# EQUALS the exact all-pairs Jaccard set — the same SQL k5 pins, unbounded)
# ---------------------------------------------------------------------------

# k5's exact-Jaccard SQL with the doc_id bound removed: k9's whole claim is
# full-corpus recall, so its oracle is the full-corpus truth.
K9_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), cnt AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(i AS DOUBLE)) AS jaccard
FROM inter
JOIN cnt na ON doc_a = na.doc_id
JOIN cnt nb ON doc_b = nb.doc_id
WHERE CAST(i AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(i AS DOUBLE)) >= 0.9
"""


@register("k9_dedup_minhash_lsh", oracle=K9_ORACLE, group="K")
def k9_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard-verified — the dedup scale
    path, hash-oracled against the unbounded all-pairs truth (VERDICT r7
    #2). The Jaccard verification is the identical IEEE double expression
    on both engines, so values hash-match despite the xxhash64 signature
    internals being engine-private.

    ``max_bucket_size`` is set EXPLICITLY above the corpus's densest
    band-bucket (measured 3,189 docs at sf0.1): the default 1,000 cap
    silently dropped that whole near-dup family from every band and cost
    94% of true pairs (56,950 of 964,854 found — measured round 8). At
    real scale the cap is the recall/cost knob for pathological keys; a
    registered-correctness query must sit above the data's real family
    size, so the cap here is a guard against degenerate blowup only."""
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=32,
        bands=16,
        threshold=0.9,
        max_bucket_size=10_000,
    )


@register("k10_dedup_simhash", oracle=None, group="K")
def k10_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures per document (rows-only: xxhash64-based).
    Uses the vectorized explode/aggregate form — bit-identical to the
    Column fold (pinned in tests), but inside whole-stage codegen instead
    of the interpreted higher-order path (measured 2.6 s → 0.4 s at
    sf0.1)."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_table(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# k11 — embedding-cosine near-dup pairs (hash oracle, double math)
# ---------------------------------------------------------------------------

_K11_COS = r2sql(cos_sql("a.embedding", "b.embedding"), 6)

K11_ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_K11_COS} AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 1000 AND b.vec_id < 1000 AND {_K11_COS} >= 0.35
"""


@register("k11_embed_neardup", oracle=K11_ORACLE, group="K")
def k11_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold picked to be
    non-trivial on N(0,1)-ish vectors; bounded to the vec_id<1000
    verification slice — k5's convention; k21's LSH bucketing is the
    scale path over the unbounded corpus)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 1000)
    # id-pairs first (cheap nested loop), repartition the MB-sized pair
    # table, THEN broadcast-attach vectors and evaluate the cosine in a
    # distributed projection — putting the cosine in the nested-loop join
    # condition runs all n² of it on the one task AQE coalesces a KB-sized
    # id slice into (see ops/dedup.jaccard_pairs for the full argument)
    pair_ids = (
        e.select(F.col("vec_id").alias("vec_a"))
        .join(e.select(F.col("vec_id").alias("vec_b")), F.col("vec_a") < F.col("vec_b"))
        .repartition("vec_a", "vec_b")
    )
    # k9-playbook verify (round 11): vectors broadcast pre-cast to
    # array<double> with their norm precomputed per VECTOR (the old
    # per-pair cosine() re-derived both norms for every one of the ~500k
    # pairs — 3 dim-length folds/pair instead of 1), and the dot product
    # is pinned behind the nondeterministic no-op so the threshold filter
    # can't re-evaluate the fold. Same IEEE expression as the oracle's
    # cos_sql: dot and norms are the identical sequential double folds,
    # divided in the same order.
    vn = e.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"),
        S.norm(F.col("embedding")).alias("nrm"),
    )
    pairs = pair_ids.join(
        F.broadcast(
            vn.select(
                F.col("vid").alias("vec_a"),
                F.col("v").alias("ea"),
                F.col("nrm").alias("na"),
            )
        ),
        "vec_a",
    ).join(
        F.broadcast(
            vn.select(
                F.col("vid").alias("vec_b"),
                F.col("v").alias("eb"),
                F.col("nrm").alias("nb"),
            )
        ),
        "vec_b",
    )
    pairs = pairs.withColumn(
        "dp",
        F.when(
            F.spark_partition_id() >= 0, S.dot(F.col("ea"), F.col("eb"))
        ).otherwise(F.lit(0.0)),
    )
    sim = r2(F.col("dp") / (F.col("na") * F.col("nb")), 6)
    return (
        pairs.withColumn("sim", sim)
        .filter(F.col("sim") >= 0.35)
        .select("vec_a", "vec_b", "sim")
    )


# ---------------------------------------------------------------------------
# k12-k15 — text analysis (lang-ID, quality, token counting, fingerprints)
# ---------------------------------------------------------------------------

_ZH = "[一-鿿]"
_FR = "(^| )(le|la|les|et|des|une?)( |$)"
_ES = "(^| )(el|los|las|y|una?)( |$)"
_DE = "(^| )(der|die|das|und|eine?)( |$)"

_LANG_DIRTY = """
  SELECT doc_id, lang,
         text || CASE WHEN doc_id % 3 <> 2 THEN
             CASE lang WHEN 'fr' THEN ' le chat et la'
                       WHEN 'es' THEN ' el gato y los'
                       WHEN 'de' THEN ' der hund und die'
                       WHEN 'zh' THEN ' 中文'
                       ELSE '' END
           ELSE '' END AS text
  FROM documents
"""


def _lang_marked(d: DataFrame) -> DataFrame:
    """Dirty the synthetic corpus with declared-language marker tokens in
    2/3 of each language's docs (the corpus text itself is English
    word-soup for every declared lang, so without this the lang-ID's
    non-en branches never fire — caught by the constant-column audit).
    The unmarked third is a deliberate, known miss class: recall lands
    at ~2/3 for non-en and the confusion matrix stays interesting."""
    marker = F.when(
        F.col("doc_id") % 3 != 2,
        F.when(F.col("lang") == "fr", F.lit(" le chat et la"))
        .when(F.col("lang") == "es", F.lit(" el gato y los"))
        .when(F.col("lang") == "de", F.lit(" der hund und die"))
        .when(F.col("lang") == "zh", F.lit(" 中文"))
        .otherwise(F.lit("")),
    ).otherwise(F.lit(""))
    return d.select(
        "doc_id", "lang", F.concat(F.col("text"), marker).alias("text")
    )


K12_ORACLE = f"""
SELECT doc_id, lang AS declared_lang,
       CASE WHEN regexp_matches(text, '{_ZH}') THEN 'zh'
            WHEN regexp_matches(text, '{_FR}') THEN 'fr'
            WHEN regexp_matches(text, '{_ES}') THEN 'es'
            WHEN regexp_matches(text, '{_DE}') THEN 'de'
            ELSE 'en' END AS guessed_lang
FROM ({_LANG_DIRTY})
"""


@register("k12_lang_id", oracle=K12_ORACLE, group="K")
def k12_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based language ID (charset + stopword markers), over the
    marker-dirtied corpus (_lang_marked: the raw synthetic text is
    English word-soup for every declared lang, so the non-en branches
    were dead until markers were injected — identically in the oracle).
    The function's branches are additionally unit-pinned on constructed
    text in tests/test_jl_projection.py."""
    d = _lang_marked(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        T.lang_id(F.col("text")).alias("guessed_lang"),
    )


_QF_TOKS = "string_split(text, ' ')"
K13_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS DOUBLE)                   AS n_chars,
       CAST(len({_QF_TOKS}) AS DOUBLE)                AS n_tokens,
       {r2sql("(CAST(length(text) AS DOUBLE) - (CAST(len(" + _QF_TOKS + ") AS DOUBLE) - 1)) / CAST(len(" + _QF_TOKS + ") AS DOUBLE)", 4)} AS avg_token_len,
       {r2sql("CAST(len(list_filter(" + _QF_TOKS + ", t -> t IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / CAST(len(" + _QF_TOKS + ") AS DOUBLE)", 4)} AS stopword_ratio,
       {r2sql("CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)", 4)} AS digit_ratio
FROM documents
"""


@register("k13_quality_score", oracle=K13_ORACLE, group="K")
def k13_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap quality signals (the standard corpus pre-filter features)."""
    d = load_table(spark, sf_dir, "documents")
    q = T.quality_features(F.col("text"))
    return d.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        r2(q["avg_token_len"], 4).alias("avg_token_len"),
        r2(q["stopword_ratio"], 4).alias("stopword_ratio"),
        r2(q["digit_ratio"], 4).alias("digit_ratio"),
    )


K14_ORACLE = f"""
SELECT doc_id,
       CAST(len({_QF_TOKS}) AS BIGINT) AS n_ws_tokens,
       CAST(list_sum(list_transform({_QF_TOKS},
            t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subword_est
FROM documents
"""


@register("k14_token_count", oracle=K14_ORACLE, group="K")
def k14_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish subword token counting."""
    d = load_table(spark, sf_dir, "documents")
    tc = T.token_counts(F.col("text"))
    return d.select(
        "doc_id",
        tc["n_ws_tokens"].cast("long").alias("n_ws_tokens"),
        tc["n_subword_est"].cast("long").alias("n_subword_est"),
    )


K15_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT doc_id, md5(string_agg(w, ' ' ORDER BY w)) AS bow_fp
FROM tok
GROUP BY doc_id
"""


@register("k15_fingerprint", oracle=K15_ORACLE, group="K")
def k15_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words document fingerprint (order/multiplicity-invariant
    near-dup pre-key); the char-level rolling hash lives in ops.text with
    unit tests (no SQL-expressible oracle)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.bow_fingerprint(F.col("text")).alias("bow_fp"))


# ---------------------------------------------------------------------------
# k16 — IVF-style ANN (cluster-pruned similarity search, hash oracle)
# ---------------------------------------------------------------------------

_ASG_COS = r2sql(cos_sql("e.embedding", "cent.c"), 6)
_PROBE_COS = r2sql(cos_sql("p.qe", "m.me"), 6)

K16_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 4
), asg AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, cent.cent_id AS cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_ASG_COS} DESC, cent.cent_id) AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
), probes AS (
  SELECT e.vec_id AS q_id, e.embedding AS qe, asg.cluster AS q_cluster
  FROM embeddings e JOIN asg ON e.vec_id = asg.vec_id
  WHERE e.vec_id < 10
), members AS (
  SELECT e.vec_id AS c_id, e.embedding AS me, asg.cluster
  FROM embeddings e JOIN asg ON e.vec_id = asg.vec_id
)
SELECT q_id, cluster, c_id, sim, rank FROM (
  SELECT p.q_id, m.cluster, m.c_id,
         {_PROBE_COS} AS sim,
         row_number() OVER (PARTITION BY p.q_id
                            ORDER BY {_PROBE_COS} DESC, m.c_id) AS rank
  FROM probes p JOIN members m
    ON m.cluster = p.q_cluster AND m.c_id <> p.q_id
) WHERE rank <= 3
"""


@register("k16_ann_ivf", oracle=K16_ORACLE, group="K")
def k16_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign vectors to nearest of 4 fixed centroids, probe only
    the query's own cluster for top-3 — the partition-pruned search shape
    (recall vs k6 brute force asserted in tests)."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    centroids = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    assigned = S.ivf_assign(corpus, centroids)
    probes = (
        assigned.filter(F.col("c_id") < 10)
        .select(
            F.col("c_id").alias("q_id"),
            F.col("c_vec").alias("q_vec"),
            F.col("cluster").alias("q_cluster"),
        )
    )
    # per-side norm factoring (round 12, the cosine_topk/k11 discipline):
    # dot/(qn*mn) is the identical IEEE expression to cosine(q_vec, c_vec)
    # at a third of the per-pair interpreted-fold work
    members = assigned.select("c_id", "c_vec", "cluster").withColumn(
        "_mnrm", S.norm(F.col("c_vec"))
    )
    pairs = members.join(
        F.broadcast(probes.withColumn("_qnrm", S.norm(F.col("q_vec")))),
        (F.col("cluster") == F.col("q_cluster")) & (F.col("q_id") != F.col("c_id")),
    ).withColumn(
        "sim",
        r2(
            S.dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("_qnrm") * F.col("_mnrm")),
            6,
        ),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "cluster", "c_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# k18 — TF-IDF scoring (the classic corpus-weighting pipeline op)
# ---------------------------------------------------------------------------

K18_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), dfreq AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
), total AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT doc_id, token, tf,
       {r2sql("tf * ln(CAST(n_docs AS DOUBLE) / df)", 4)} AS tfidf
FROM tf JOIN dfreq USING (token) CROSS JOIN total
"""


@register("k18_tfidf", oracle=K18_ORACLE, group="K")
def k18_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: term frequency ⋈ document frequency ⋈ corpus size — two
    shuffles (doc,term / term) + a broadcast scalar; the standard
    feature-weighting pass of a text pipeline."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf already has one row per distinct (doc, token): document frequency
    # is a plain count over it — no second corpus explode, no countDistinct
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "token",
            "tf",
            r2(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# k19 — character-n-gram Jaccard near-dup (the shingle-level dedup variant)
# ---------------------------------------------------------------------------

_K19_SH = (
    "list_distinct(list_transform(range(1, greatest(length(text)-4, 1)+1),"
    " i -> substring(text, i, 5)))"
)
_K19_I = "CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)"
_K19_U = f"(CAST(len(a.g) + len(b.g) AS DOUBLE) - {_K19_I})"

K19_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {_K19_SH} AS g FROM documents WHERE doc_id < 200
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {r2sql(f"{_K19_I} / {_K19_U}", 4)} AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE {_K19_I} / {_K19_U} >= 0.8
"""


@register("k19_ngram_jaccard", oracle=K19_ORACLE, group="K")
def k19_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by character-5-gram shingle Jaccard ≥ 0.8 (bounded to
    a doc_id slice; at scale the shingle sets feed MinHash-LSH (k9) instead
    of the O(n²) pair join). Routed through jaccard_pairs' k9-playbook
    shape (size-pruned id pairs → hashed-shingle primitive intersect
    behind the pushdown barrier) — the old inline form evaluated the
    string-array intersect inside the nested-loop join condition AND
    re-derived it in the projection. The threshold filter runs on the
    RAW jaccard (oracle convention); only the emitted value is rounded.
    Shingle-vocabulary hash-collision freedom is pinned in
    tests/test_llm_ops.py::test_shingle_hash_is_collision_free."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return D.jaccard_pairs(
        d,
        "doc_id",
        "text",
        threshold=0.8,
        shingle=lambda c: D.char_shingles(c, 5),
    ).select("doc_a", "doc_b", r2(F.col("jaccard"), 4).alias("jaccard"))


# ---------------------------------------------------------------------------
# k20 — edit-distance near-dup (character-level; completes the dedup family)
# ---------------------------------------------------------------------------

K20_ORACLE = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.text, b.text) AS INT) AS edit_dist
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE a.doc_id < 50 AND b.doc_id < 50
  AND levenshtein(a.text, b.text) <= 100
"""


@register("k20_edit_distance", oracle=K20_ORACLE, group="K")
def k20_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup pairs by Levenshtein distance (bounded doc
    slice — edit distance is O(len²) per pair; at scale it's the verify
    step AFTER an LSH/fingerprint candidate pass (k9/k15), never all-pairs).

    Round-11 shape (the jaccard_pairs playbook + banding):

    * the nested-loop pair generator sees (id, length) rows only and
      applies the EXACT length prune in the join condition — an edit
      script must cover the length gap, so dist ≤ 100 needs
      |len_a − len_b| ≤ 100 (1225 → 480 pairs at the shipped corpus);
    * surviving id pairs repartition (spreading the per-pair O(len·k)
      DP off the one task AQE coalesces a KB-sized input to), then texts
      re-attach by broadcast;
    * the distance itself is the BANDED levenshtein(l, r, 100): the DP
      evaluates a 2k+1-wide diagonal band instead of the full len×len
      matrix and returns −1 past the threshold — identical values for
      every emitted row (d ≤ 100 ⟹ band exact), and the −1 filter is
      exactly the old dist ≤ 100 predicate."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    sized = d.select("doc_id", F.length("text").alias("n"))
    pair_ids = (
        sized.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
        .join(
            sized.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("n_a") - F.col("n_b")) <= 100),
        )
        .repartition("doc_a", "doc_b")
    )
    texts = d.select("doc_id", "text")
    pairs = pair_ids.join(
        F.broadcast(
            texts.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
        ),
        "doc_a",
    ).join(
        F.broadcast(
            texts.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
        ),
        "doc_b",
    )
    dist = F.levenshtein("ta", "tb", 100)
    return (
        pairs.filter(dist >= 0)
        .select("doc_a", "doc_b", dist.cast("int").alias("edit_dist"))
    )


# ---------------------------------------------------------------------------
# k25 — dup-pair clustering (connected components → keep/drop decisions)
# ---------------------------------------------------------------------------

K25_ORACLE = """
WITH RECURSIVE tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 1000
), cnt AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pr AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN cnt na ON doc_a = na.doc_id
  JOIN cnt nb ON doc_b = nb.doc_id
  WHERE CAST(i AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(i AS DOUBLE)) >= 0.9
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pr
  UNION
  SELECT doc_b, doc_a FROM pr
), reach AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
)
SELECT node AS doc_id, least(node, min(r)) AS cluster
FROM reach GROUP BY node
"""


@register("k25_dup_clusters", oracle=K25_ORACLE, group="K")
def k25_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → clusters: min-label propagation over the k5 pair
    graph assigns every clustered doc its minimum reachable doc_id (the
    canonical representative — everything else is a drop candidate). The
    oracle computes the same closure with a recursive CTE. The pair stage
    is bounded to the doc_id<1000 verification slice (k5's convention);
    at scale the pair list comes from k9's LSH instead of all-pairs, and
    the propagation cost per round is two shuffles on the edge key."""
    pairs = D.jaccard_pairs(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000),
        "doc_id",
        "text",
        threshold=0.9,
    )
    return D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster"
    )


# ---------------------------------------------------------------------------
# k26 — n-gram frequency tables (the language-model counting pass)
# ---------------------------------------------------------------------------

K26_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t
)
SELECT bigram,
       count(*) AS n_total,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM bg
GROUP BY bigram
HAVING count(*) >= 3
"""


@register("k26_ngram_counts", oracle=K26_ORACLE, group="K")
def k26_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency table (count ≥ 3): zip-shifted token arrays
    → explode → one hash aggregate — the n-gram LM counting pass. The
    zip_with of two slices builds bigrams without a self-join; single-token
    docs yield an empty slice, not an error."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    return (
        d.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_total") >= 3)
    )


# ---------------------------------------------------------------------------
# k23 — text normalization (the canonical pre-dedup canonicalization pass)
# ---------------------------------------------------------------------------

_K23_NORM = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g'))"
)

K23_ORACLE = f"""
SELECT doc_id,
       {_K23_NORM} AS norm_text,
       CAST(len(string_split({_K23_NORM}, ' ')) AS INT) AS n_norm_tokens
FROM documents
"""


@register("k23_text_normalize", oracle=K23_ORACLE, group="K")
def k23_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization before dedup/fingerprinting: lowercase, strip
    non-alphanumerics, collapse runs of spaces, trim — pure codegen'd
    string expressions; the pass every exact/near-dup key should run on
    so 'Hello, World!' and 'hello world' collide."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(F.split(norm, " ")).alias("n_norm_tokens"),
    )


# ---------------------------------------------------------------------------
# k24 — the composed corpus filter (lang ∧ quality ∧ dedup): the pipeline op
# ---------------------------------------------------------------------------

K24_ORACLE = f"""
WITH feat AS (
  SELECT doc_id, lang, text,
         CASE WHEN regexp_matches(text, '{_ZH}') THEN 'zh'
              WHEN regexp_matches(text, '{_FR}') THEN 'fr'
              WHEN regexp_matches(text, '{_ES}') THEN 'es'
              WHEN regexp_matches(text, '{_DE}') THEN 'de'
              ELSE 'en' END AS guessed,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
              t -> t IN ('the','a','of','and','to','in','is','on','for','with')))
              AS DOUBLE) / CAST(len(string_split(text, ' ')) AS DOUBLE) AS sw,
         min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
  FROM documents
)
SELECT doc_id, lang, n_tokens, {r2sql("sw", 4)} AS stopword_ratio
FROM feat
WHERE guessed = lang
  AND n_tokens BETWEEN 20 AND 2000
  AND (lang <> 'en' OR sw >= 0.05)
  AND doc_id = keep_id
"""


@register("k24_quality_filter", oracle=K24_ORACLE, group="K")
def k24_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining corpus filter: language consistency
    (declared = guessed), token-count bounds, stopword floor for English,
    and exact-dedup survivorship — one pass of row expressions plus a
    single window on the content hash (no join): the shape of a real
    corpus-cleaning stage at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sw_list = F.filter(
        toks,
        lambda t: t.isin(
            "the", "a", "of", "and", "to", "in", "is", "on", "for", "with"
        ),
    )
    n_tokens = F.size(toks).cast("long")
    sw = F.size(sw_list).cast("double") / F.size(toks).cast("double")
    keep_id = F.min("doc_id").over(W.partitionBy(F.md5(F.col("text"))))
    feat = d.select(
        "doc_id",
        "lang",
        T.lang_id(F.col("text")).alias("guessed"),
        n_tokens.alias("n_tokens"),
        sw.alias("sw"),
        keep_id.alias("keep_id"),
    )
    return feat.filter(
        (F.col("guessed") == F.col("lang"))
        & F.col("n_tokens").between(20, 2000)
        & ((F.col("lang") != "en") | (F.col("sw") >= 0.05))
        & (F.col("doc_id") == F.col("keep_id"))
    ).select("doc_id", "lang", "n_tokens", r2(F.col("sw"), 4).alias("stopword_ratio"))


# ---------------------------------------------------------------------------
# k21/k22 — embedding-space LSH + trained-IVF: the ANN scale paths
# ---------------------------------------------------------------------------


@register("k21_embed_lsh_neardup", oracle=None, group="K")
def k21_embed_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane-LSH near-dup pairs over embeddings — the bucketed
    scale path for k11 (whose all-pairs crossJoin is the bounded reference).
    Exact-cosine verification means zero false positives; recall vs k11 is
    asserted in tests/test_llm_ops.py. Rows-only: replicating the sha-derived
    hyperplane matrix in SQL is not practical."""
    e = load_table(spark, sf_dir, "embeddings")
    return S.rh_lsh_pairs(
        e, "vec_id", "embedding", dim=64, threshold=0.35, num_bits=32, bands=16
    )


@register("k22_ann_ivf_kmeans", oracle=None, group="K")
def k22_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over Lloyd's-trained centroids (k16 uses fixed seed vectors;
    this is the real-data path: 3 k-means iterations, then probe only the
    query's own cluster). Rows-only: iterative float means aren't
    reproducible cross-engine; in-cluster exactness is asserted in tests."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    centroids = S.kmeans_centroids(corpus, k=8, dim=64, iters=3)
    assigned = S.ivf_assign(corpus, centroids)
    probes = assigned.filter(F.col("c_id") < 10).select(
        F.col("c_id").alias("q_id"),
        F.col("c_vec").alias("q_vec"),
        F.col("cluster").alias("q_cluster"),
    )
    # per-side norm factoring (round 12, the cosine_topk/k11 discipline):
    # dot/(qn*mn) is the identical IEEE expression to cosine(q_vec, c_vec)
    # at a third of the per-pair interpreted-fold work
    members = assigned.select("c_id", "c_vec", "cluster").withColumn(
        "_mnrm", S.norm(F.col("c_vec"))
    )
    pairs = members.join(
        F.broadcast(probes.withColumn("_qnrm", S.norm(F.col("q_vec")))),
        (F.col("cluster") == F.col("q_cluster")) & (F.col("q_id") != F.col("c_id")),
    ).withColumn(
        "sim",
        r2(
            S.dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("_qnrm") * F.col("_mnrm")),
            6,
        ),
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "cluster", "c_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# k17 — multimodal binary plumbing (stubbed codec, real Spark shape)
# ---------------------------------------------------------------------------


@register("k17_multimodal_binary", oracle=None, group="K")
def k17_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column + mapInPandas feature extraction over opaque
    payloads (checksum/size + deterministic fake dimensions for
    non-media blobs). k41 is the REAL-decode twin: it parses actual
    PNG/GIF/WAV container headers; only pixel-level decode
    (decode_media(real_codec=True)) awaits external codec libraries."""
    d = load_table(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "doc_id", "text")
    return M.decode_media(media)


# ---------------------------------------------------------------------------
# k27-k30 — training-data prep: chunking, repetition filter, benchmark
# decontamination, domain mixture sampling
# ---------------------------------------------------------------------------

K27_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks), 6)) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // 6 AS INT) AS chunk_id,
       array_to_string(list_slice(toks, start, start + 7), ' ') AS chunk_text,
       CAST(len(list_slice(toks, start, start + 7)) AS INT) AS n_tokens
FROM s
WHERE len(list_slice(toks, start, start + 7)) >= 3
"""


@register("k27_doc_chunk", oracle=K27_ORACLE, group="K")
def k27_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (size 8, stride 6, tail chunks kept
    when >= 3 tokens) — the context-window prep step of a training pipeline.
    sequence + explode + slice: per-doc work is linear, no shuffle at all
    (narrow transform), so it scales embarrassingly."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    out = (
        d.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(6))).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / F.lit(6)).cast("int").alias("chunk_id"),
            F.slice("toks", F.col("start"), F.lit(8)).alias("chunk"),
        )
    )
    return out.filter(F.size("chunk") >= 3).select(
        "doc_id",
        "chunk_id",
        F.array_join("chunk", " ").alias("chunk_text"),
        F.size("chunk").alias("n_tokens"),
    )


K28_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), tri AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g
  FROM t WHERE len(toks) >= 3
)
SELECT doc_id,
       CAST(len(g) AS INT) AS n_tri,
       CAST(len(g) - len(list_distinct(g)) AS INT) AS n_dup,
       {r2sql("(len(g) - len(list_distinct(g))) / CAST(len(g) AS DOUBLE)", 4)} AS dup_ratio
FROM tri
"""


@register("k28_repetition_filter", oracle=K28_ORACLE, group="K")
def k28_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (duplicate-trigram ratio, the
    Gopher-style quality rule): three shifted slices zip_with'ed into
    trigrams, distinct-count per row — all array expressions, zero shuffle,
    one linear pass whatever the corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    m = n - F.lit(2)
    s1 = F.slice(toks, 1, m)
    s2 = F.slice(toks, 2, m)
    s3 = F.slice(toks, 3, m)
    pair = F.zip_with(s1, s2, lambda x, y: F.concat(x, F.lit(" "), y))
    tri = F.zip_with(pair, s3, lambda xy, z: F.concat(xy, F.lit(" "), z))
    base = d.filter(n >= 3).select("doc_id", tri.alias("g"))
    n_tri = F.size("g")
    n_dup = F.size("g") - F.size(F.array_distinct("g"))
    return base.select(
        "doc_id",
        n_tri.alias("n_tri"),
        n_dup.alias("n_dup"),
        r2(n_dup.cast("double") / n_tri.cast("double"), 4).alias("dup_ratio"),
    )


K29_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 2),
                i -> array_to_string(list_slice(toks, i, i + 3), ' '))) AS shingle
  FROM t
), bench AS (
  SELECT DISTINCT shingle FROM g WHERE doc_id % 100 = 7
)
SELECT g.doc_id, CAST(count(DISTINCT g.shingle) AS BIGINT) AS n_hits
FROM g JOIN bench USING (shingle)
WHERE g.doc_id % 100 <> 7
GROUP BY g.doc_id
"""


@register("k29_contamination", oracle=K29_ORACLE, group="K")
def k29_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing any 4-gram
    shingle with a (small) benchmark set. The benchmark's distinct shingles
    BROADCAST to every executor — the 100-TB corpus never shuffles, it
    stream-probes the hash set and aggregates hits per doc."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    m = F.size(toks) - F.lit(3)
    quad = F.zip_with(
        F.zip_with(
            F.slice(toks, 1, m), F.slice(toks, 2, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
        F.zip_with(
            F.slice(toks, 3, m), F.slice(toks, 4, m),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = d.select("doc_id", F.explode(quad).alias("shingle"))
    bench = grams.filter(F.col("doc_id") % 100 == 7).select("shingle").distinct()
    corpus = grams.filter(F.col("doc_id") % 100 != 7)
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_hits"))
    )


K30_ORACLE = f"""
WITH sel AS (
  SELECT source,
         CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 8
              WHEN source IN ('src5','src6','src7','src8','src9') THEN 4
              WHEN source IN ('src10','src11','src12','src13','src14') THEN 2
              ELSE 1 END AS thresh,
         strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS rank
  FROM documents
)
SELECT source,
       count(*) AS n_total,
       CAST(count(CASE WHEN rank < thresh THEN 1 END) AS BIGINT) AS n_sel,
       {r2sql("count(CASE WHEN rank < thresh THEN 1 END) / CAST(count(*) AS DOUBLE)", 4)} AS sel_share
FROM sel
GROUP BY source
"""


@register("k30_domain_mix", oracle=K30_ORACLE, group="K")
def k30_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: per-source target rates (1/2, 1/4, 1/8,
    1/16) applied as a deterministic md5-digit threshold — the m1 hash
    sampler parameterized per domain. Stateless per-row predicate, no
    shuffle before the per-source audit aggregate; rerunning at any scale
    selects the same documents."""
    d = load_table(spark, sf_dir, "documents")
    thresh = (
        F.when(F.col("source").isin("src0", "src1", "src2", "src3", "src4"), 8)
        .when(F.col("source").isin("src5", "src6", "src7", "src8", "src9"), 4)
        .when(F.col("source").isin("src10", "src11", "src12", "src13", "src14"), 2)
        .otherwise(1)
    )
    rank = F.expr("instr('0123456789abcdef', substring(md5(cast(doc_id as string)), 1, 1)) - 1")
    sel = d.select("source", thresh.alias("thresh"), rank.alias("rank"))
    hit = F.when(F.col("rank") < F.col("thresh"), F.lit(1))
    return sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(hit).alias("n_sel"),
        r2(F.count(hit).cast("double") / F.count(F.lit(1)).cast("double"), 4).alias("sel_share"),
    )


K31_ORACLE = """
WITH RECURSIVE tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 1000
), cnt AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pr AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN cnt na ON doc_a = na.doc_id
  JOIN cnt nb ON doc_b = nb.doc_id
  WHERE CAST(i AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(i AS DOUBLE)) >= 0.9
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pr
  UNION
  SELECT doc_b, doc_a FROM pr
), reach AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
), comp AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster
  FROM reach GROUP BY node
), ranked AS (
  SELECT c.cluster, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster
                            ORDER BY d.n_chars DESC, c.doc_id) AS rn
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT cluster,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_doc,
       CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM ranked
GROUP BY cluster
"""


@register("k31_cluster_rep", oracle=K31_ORACLE, group="K")
def k31_cluster_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup pipeline final stage: per near-dup cluster (k25's components),
    elect the canonical representative — longest document, doc_id as the
    tie-break — and count the drop set. Argmax is max(struct(n_chars,
    -doc_id)), one aggregate over the (tiny) clustered subset; the corpus
    join is key-co-partitioned, never broadcast-inverted. Pair stage
    bounded to the doc_id<1000 slice (k5's convention; k9 at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(
        docs.filter(F.col("doc_id") < 1000), "doc_id", "text", threshold=0.9
    )
    comp = D.connected_components(pairs).select(F.col("node").alias("doc_id"), "cluster")
    ranked = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    top = F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")))
    return ranked.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        (-top.getField("neg_id")).alias("rep_doc"),
        (F.count(F.lit(1)) - F.lit(1)).alias("n_dropped"),
    )


# Java and RE2 agree on these patterns (no lookaround, no \b).
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

K32_ORACLE = f"""
WITH seeded AS (
    SELECT doc_id,
           text || ' contact user' || doc_id || '@mail.example.com or call 555-123-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
    FROM documents WHERE doc_id < 2000
)
SELECT doc_id,
       regexp_replace(regexp_replace(raw, '{PII_EMAIL}', '[EMAIL]', 'g'),
                      '{PII_PHONE}', '[PHONE]', 'g') AS scrubbed,
       len(regexp_extract_all(raw, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(raw, '{PII_PHONE}')) AS n_phones
FROM seeded
"""


@register("k32_pii_scrub", oracle=K32_ORACLE, group="K")
def k32_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails, phone numbers) with per-doc redaction
    counts — the compliance scrub every training corpus runs before
    anything else. Synthetic PII is seeded deterministically from doc_id so
    the redaction provably fires on every row (the oracle recomputes the
    seeding). Stateless per-row regexes: no shuffle, scales linearly, and
    the counts give the audit trail (rows with n_emails=0 after a scrub
    claiming coverage = a pattern gap). Patterns avoid lookaround/\\b so
    Java (Spark) and RE2 (DuckDB) agree."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or call 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    seeded = d.select("doc_id", raw.alias("raw"))
    return seeded.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("raw", PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
        ).alias("scrubbed"),
        F.regexp_count("raw", F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count("raw", F.lit(PII_PHONE)).alias("n_phones"),
    )


K33_ORACLE = """
WITH index AS (
    SELECT md5(lower(text)) AS hh, min(doc_id) AS dup_of
    FROM documents GROUP BY md5(lower(text))
), batch AS (
    SELECT doc_id + 10000 AS new_id, text FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id + 20000 AS new_id, text || ' fresh content'
    FROM documents WHERE doc_id % 5 = 1
)
SELECT new_id, dup_of,
       CAST(dup_of IS NOT NULL AS INT) AS is_dup
FROM batch LEFT JOIN index ON md5(lower(batch.text)) = index.hh
"""


@register("k33_incremental_dedup", oracle=K33_ORACLE, group="K")
def k33_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup: a new ingest batch (seeded here as 20%
    copies of corpus docs + 20% genuinely-new docs) is checked against the
    EXISTING corpus's content-hash index — only the batch is scanned and
    hashed; the corpus contributes a precomputed (hash → min doc_id)
    index. That asymmetry is the daily-ingest scale story at 100 TB: the
    index is bucketed by hash once, each day's batch hash-joins against it
    without re-reading the corpus; min(doc_id) makes the representative
    deterministic. Same pattern lifts to MinHash bands for near-dup
    (k9's banding applied batch-vs-index instead of self-join)."""
    docs = load_table(spark, sf_dir, "documents")
    index = docs.groupBy(F.md5(F.lower("text")).alias("hh")).agg(
        F.min("doc_id").alias("dup_of")
    )
    dups = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("new_id"), "text"
    )
    fresh = docs.filter(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + 20000).alias("new_id"),
        F.concat("text", F.lit(" fresh content")).alias("text"),
    )
    batch = dups.unionAll(fresh).withColumn("hh", F.md5(F.lower("text")))
    return batch.join(index, "hh", "left").select(
        "new_id", "dup_of", F.col("dup_of").isNotNull().cast("int").alias("is_dup")
    )


@register("k34_embed_quantize", oracle=None, group="K")
def k34_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (per-vector
    max-abs scale) and its retrieval cost: per probe, recall@10 of
    quantized-cosine top-k against exact-cosine top-k. 4× smaller vectors
    mean 4× less shuffle/scan/cache at 100 TB — this op makes the
    recall price measurable (tests pin a floor). All JVM higher-order
    expressions (transform/aggregate); no oracle (float-ordering
    sensitive); recall floor asserted in tests/test_llm_ops.py."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.array_max(F.transform("embedding", lambda x: F.abs(x))) > 0
    )
    scale = (F.array_max(F.transform("embedding", lambda x: F.abs(x))) / 127.0).alias(
        "scale"
    )
    with_q = emb.select("vec_id", "embedding", scale).withColumn(
        "deq",
        F.transform(
            "embedding",
            lambda x: F.floor(x / F.col("scale") + 0.5).cast("double")
            * F.col("scale"),
        ),
    )
    probes = with_q.filter(F.col("vec_id") < 5)
    exact = S.cosine_topk(
        probes.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")),
        with_q.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")),
        k=10,
    )
    quant = S.cosine_topk(
        probes.select(F.col("vec_id").alias("q_id"), F.col("deq").alias("q_vec")),
        with_q.select(F.col("vec_id").alias("c_id"), F.col("deq").alias("c_vec")),
        k=10,
    )
    hits = exact.join(quant, ["q_id", "c_id"], "left_semi")
    return (
        hits.groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(
            "q_id",
            "n_hits",
            r2(F.col("n_hits") / F.lit(10.0)).alias("recall_at_10"),
        )
    )


K35_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
), counts AS (
    SELECT tok, count(*) AS n FROM toks GROUP BY tok
), vocab AS (
    SELECT tok FROM counts ORDER BY n DESC, tok LIMIT 25
)
SELECT doc_id, count(*) AS n_tokens,
       count(CASE WHEN v.tok IS NULL THEN 1 END) AS n_oov,
       {r2sql("count(CASE WHEN v.tok IS NULL THEN 1 END)"
              " / CAST(count(*) AS DOUBLE)", 4)} AS oov_rate
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY doc_id
"""


@register("k35_oov_rate", oracle=K35_ORACLE, group="K")
def k35_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: build the corpus's top-25 token vocab
    (count desc, token as the deterministic tiebreak; the corpus has 31
    distinct tokens, so a top-50 vocab covered everything and the OOV
    branch never fired — caught by the constant-column audit), broadcast
    it, and score every document's out-of-vocabulary rate — the tokenizer-fit
    check a training pipeline runs before committing to a vocab. Two
    linear passes: token counts (one shuffle on token), then a broadcast
    membership probe per token — the corpus is never shuffled for the
    probe; at 100 TB the vocab stays executor-resident while documents
    stream."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    w = W.orderBy(F.col("n").desc(), F.col("tok"))
    vocab = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 25)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    probed = toks.join(F.broadcast(vocab), "tok", "left")
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count(F.when(F.col("in_vocab").isNull(), 1)).alias("n_oov"),
        r2(
            F.count(F.when(F.col("in_vocab").isNull(), 1))
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# k36 — training-sequence packing (concat-and-chunk, GPT-style)
# ---------------------------------------------------------------------------

_K36_BUDGET = 512

K36_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), pos AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS start_off
  FROM toks
)
SELECT CAST(floor(start_off / CAST({_K36_BUDGET} AS DOUBLE)) AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT)  AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM pos
GROUP BY 1
"""


@register("k36_pack_sequences", oracle=K36_ORACLE, group="K")
def k36_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: concatenate the corpus in doc_id order
    and split at a fixed token budget (concat-and-chunk, the standard
    pretraining layout) — each document's sequence is floor(global token
    offset / budget). The global prefix sum is NOT a single-partition
    window: same two-phase shape as f3_global_index — range-repartition by
    doc_id, per-partition token subtotals (one tiny row each) → exclusive
    offsets broadcast back, then a partition-local running sum. Every
    phase is parallel; the only serial object is the #partitions-row
    offset table, so the layout holds at 100 TB."""
    nparts = 16
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    ranged = docs.repartitionByRange(nparts, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("pid").agg(F.sum("n_tok").alias("part_tok"))
    wcum = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("part_tok").over(wcum), F.lit(0))
    ).select("pid", "off")
    wloc = W.partitionBy("pid").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    pos = ranged.join(F.broadcast(offsets), "pid").withColumn(
        "start_off", F.col("off") + F.sum("n_tok").over(wloc) - F.col("n_tok")
    )
    seq = F.floor(
        F.col("start_off") / F.lit(float(_K36_BUDGET))
    ).alias("seq_id")
    return pos.groupBy(seq).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# k37 — boilerplate scoring (corpus-common word-5-gram fraction)
# ---------------------------------------------------------------------------

_K37_COMMON = "CAST(count(CASE WHEN d.df >= 2 THEN 1 END) AS DOUBLE)"

K37_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 4, 0) + 1),
                               i -> array_to_string(t[i:i+4], ' '))) AS gram
  FROM toks
), df AS (
  SELECT gram, count(*) AS df FROM grams GROUP BY gram
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT)                       AS n_grams,
       CAST(count(CASE WHEN d.df >= 2 THEN 1 END) AS BIGINT) AS n_common,
       {r2sql(f"{_K37_COMMON} / CAST(count(*) AS DOUBLE)", 4)} AS boilerplate_score
FROM grams g JOIN df d USING (gram)
GROUP BY g.doc_id
"""


@register("k37_boilerplate", oracle=K37_ORACLE, group="K")
def k37_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate scoring (CCNet-style): the fraction of a document's
    distinct word 5-grams that recur in other documents (df >= 2) — high
    scores mark templated/boilerplate text a training pipeline down-weights
    or drops. Two shuffles, both on the gram key: df counts (map-side
    combined), then the gram->df join back to per-doc grams; at 100 TB the
    df table is Zipf-shrunk far below the corpus and the join is
    shuffle-on-gram with no skew (grams hash uniformly)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # Docs with <5 tokens must yield ZERO grams (oracle range(1,1) is empty);
    # an unguarded sequence(0, size-5) would step backwards to [0, -1] and
    # make slice() throw on the -1 index.
    gram_idx = F.when(
        F.size(toks) >= 5, F.sequence(F.lit(0), F.size(toks) - 5)
    ).otherwise(F.array().cast("array<int>"))
    gram_expr = F.transform(
        gram_idx,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 5)),
    )
    grams = (
        docs.select("doc_id", F.explode(gram_expr).alias("gram"))
        .dropDuplicates(["doc_id", "gram"])
    )
    df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    joined = grams.join(df, "gram")
    n_common = F.count(F.when(F.col("df") >= 2, 1))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        n_common.alias("n_common"),
        r2(n_common.cast("double") / F.count(F.lit(1)).cast("double"), 4).alias(
            "boilerplate_score"
        ),
    )


# ---------------------------------------------------------------------------
# k38/k39 — corpus-LM quality scoring + cross-doc sentence dedup share
# ---------------------------------------------------------------------------

K38_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), freq AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS n_w FROM tok GROUP BY w
), total AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tok
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       {r2sql("avg(ln(n_w / n_total))", 4)} AS avg_logprob
FROM tok JOIN freq USING (w), total
GROUP BY doc_id
"""


@register("k38_unigram_logprob", oracle=K38_ORACLE, group="K")
def k38_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM quality score: each document's mean token
    log-probability under the corpus's own unigram distribution — the
    cheapest member of the perplexity-filter family (CCNet/Gopher-style
    'how typical is this text'), with the LM trained and applied in one
    job. Two linear passes: token counts (one shuffle on word), then
    tokens⋈freq re-joined on word (same key — the exchange is reusable)
    and a per-doc mean (shuffle on doc_id). The vocabulary table is
    dictionary-sized, so at 100 TB the freq side broadcasts and the only
    full-data shuffle is the per-doc regroup; no Python crosses the
    boundary."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("n_w"))
    total = tok.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            r2(F.avg(F.log(F.col("n_w") / F.col("n_total"))), 4).alias(
                "avg_logprob"
            ),
        )
    )


K39_ORACLE = f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || '. subscribe to the newsletter today. all rights reserved'
              ELSE text END AS text
  FROM documents
), sent AS (
  SELECT DISTINCT doc_id, md5(trim(s)) AS h
  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS s FROM dirty)
  WHERE trim(s) <> ''
), global_n AS (
  SELECT h, CAST(count(*) AS BIGINT) AS n_docs FROM sent GROUP BY h
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_sents,
       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_sents,
       {r2sql("sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE)", 4)} AS dup_share
FROM sent JOIN global_n USING (h)
GROUP BY doc_id
"""


@register("k39_paragraph_dedup", oracle=K39_ORACLE, group="K")
def k39_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-sentence share (the RefinedWeb/MassiveText
    line-dedup signal): split each doc into sentences, hash them, count how
    many DISTINCT docs contain each sentence corpus-wide, and report per
    doc the fraction of its sentences that appear elsewhere — high shares
    flag boilerplate and mirror pages for removal or line-level scrubbing.
    The corpus has no sentence boundaries of its own (one period-free
    line per doc — the split and dup branches never fired; caught by the
    constant-column audit), so a shared two-sentence boilerplate tail is
    deterministically injected into every 5th doc, identically in the
    oracle: 20% of docs then carry 3 sentences of which the 2 injected
    ones are corpus-wide duplicates (dup_share 2/3). Hashes (16 B) — never sentence text — ride the corpus-wide shuffle;
    per-doc internal repeats are collapsed by the DISTINCT before counting
    so the signal is strictly cross-doc. Both shuffles key on uniform md5
    values: no skew at any scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    ". subscribe to the newsletter today. all rights reserved"
                ),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    sent = (
        d.select(
            "doc_id",
            F.explode(F.split("text", "\\. ")).alias("s"),
        )
        .select("doc_id", F.trim("s").alias("s"))
        .filter(F.col("s") != "")
        .select("doc_id", F.md5("s").alias("h"))
        .distinct()
    )
    global_n = sent.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    dup = F.when(F.col("n_docs") >= 2, 1).otherwise(0)
    return (
        sent.join(global_n, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sents"),
            F.sum(dup).alias("n_dup_sents"),
            r2(F.sum(dup) / F.count(F.lit(1)).cast("double"), 4).alias(
                "dup_share"
            ),
        )
    )


_K40_PAT = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

K40_ORACLE = f"""
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN text || ' order 12345 units (qty: 7)'
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_K40_PAT}')) AS BIGINT) AS n_pretok,
       CAST(len(list_filter(regexp_extract_all(text, '{_K40_PAT}'),
                            t -> t ~ '^[0-9]+$')) AS BIGINT) AS n_number_runs,
       {r2sql("len(regexp_extract_all(text, '" + _K40_PAT + "'))"
              " / CAST(len(string_split(text, ' ')) AS DOUBLE)", 4)} AS pretok_per_word
FROM dirty
"""


@register("k40_pretokenize_regex", oracle=K40_ORACLE, group="K")
def k40_pretokenize_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style regex pre-tokenization counts: the GPT-family tokenizers
    first split text into letter runs / digit runs / punctuation with a
    regex before byte-pair merging — this op counts those pre-tokens per
    doc (a far better token-budget estimate than k14's chars/4) plus the
    number-run count and pre-tokens-per-word ratio (high ratios flag
    punctuation/code-heavy text for routing to different tokenizers). The
    pattern sticks to POSIX classes so Java and RE2-ish dialects agree.
    The corpus text is pure lowercase words (no digits or punctuation —
    every branch but letter-runs was dead; caught by the constant-column
    audit), so ' order 12345 units (qty: 7)' is deterministically
    appended to every 4th doc, identically in the oracle: number-run and
    punctuation counts now vary. Single pass, no shuffle at all — count columns are per-row
    expressions."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.col("text"), F.lit(" order 12345 units (qty: 7)")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    toks = F.regexp_extract_all("text", F.lit(_K40_PAT), 0)
    n_pre = F.size(toks).cast("long")
    n_num = F.size(F.filter(toks, lambda t: t.rlike("^[0-9]+$"))).cast("long")
    n_ws = F.size(F.split("text", " ")).cast("double")
    return d.select(
        "doc_id",
        n_pre.alias("n_pretok"),
        n_num.alias("n_number_runs"),
        r2(n_pre / n_ws, 4).alias("pretok_per_word"),
    )


K41_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
            ELSE 'audio/wav' END AS media_type,
       CASE WHEN doc_id % 3 IN (0, 1)
            THEN CAST((doc_id * 7) % 320 + 16 AS INT) END AS width,
       CASE WHEN doc_id % 3 IN (0, 1)
            THEN CAST((doc_id * 13) % 240 + 16 AS INT) END AS height,
       CASE WHEN doc_id % 3 IN (0, 1) THEN 1
            ELSE CAST(doc_id % 1000 + 1 AS INT) END AS n_frames
FROM documents
"""


@register("k41_media_header_decode", oracle=K41_ORACLE, group="K")
def k41_media_header_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decoding round-trip: each doc synthesizes a VALID binary
    payload (PNG with correct IHDR+CRC / GIF89a / PCM-16 WAV, dimensions
    derived from doc_id) and ops.multimodal.parse_media_header parses the
    container format back out of the raw bytes — stdlib struct/zlib only,
    no codec libraries. The oracle recomputes the expected metadata from
    doc_id arithmetic, so a parser that misreads a single header field
    hash-fails. Both stages are Arrow-batched mapInPandas/pandas_udf over
    payloads partitioned by id — the exact shape a PIL/ffmpeg full decode
    drops into (that pixel-level step, decode_media(real_codec=True),
    remains the one declared stub: libraries absent here)."""
    from marasa_spark.ops.multimodal import (
        synthesize_gif,
        synthesize_png,
        synthesize_wav,
    )

    @F.pandas_udf("binary")
    def synth(doc_id: pd.Series) -> pd.Series:
        out = []
        for d in doc_id:
            d = int(d)
            if d % 3 == 0:
                out.append(synthesize_png((d * 7) % 320 + 16, (d * 13) % 240 + 16))
            elif d % 3 == 1:
                out.append(synthesize_gif((d * 7) % 320 + 16, (d * 13) % 240 + 16))
            else:
                out.append(synthesize_wav(d % 1000 + 1, d % 2 + 1))
        return pd.Series(out)

    d = load_table(spark, sf_dir, "documents")
    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return M.decode_media_headers(media)


K44_ORACLE = f"""
WITH per_doc AS (
  SELECT source,
         n_chars,
         {r2sql("CAST(len(list_filter(" + _QF_TOKS + ", t -> t IN ('the','a','of','and','to','in','is','on','for','with'))) AS DOUBLE) / CAST(len(" + _QF_TOKS + ") AS DOUBLE)", 4)} AS q
  FROM documents
), per_source AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
         {r2sql("avg(q)", 4)} AS mean_stopword_ratio
  FROM per_doc GROUP BY source
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY mean_stopword_ratio DESC, source) AS q_rank,
         sum(mean_stopword_ratio) OVER () AS q_sum
  FROM per_source
)
SELECT source, n_docs, n_chars_total, mean_stopword_ratio, q_rank,
       {r2sql("mean_stopword_ratio / q_sum", 4)} AS mix_weight
FROM ranked
"""


@register("k44_source_mix_table", oracle=K44_ORACLE, group="K")
def k44_source_mix_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality routing table: aggregate a cheap per-doc quality
    signal (stopword ratio — natural-language-likeness) to source level,
    rank sources, and derive normalized mixture weights — the decision
    table a pretraining mix is built from ('sample source X at weight w').
    Per-doc signals are floor-rounded BEFORE the source average and the
    rank carries a source tiebreak, so the table is bit-stable across
    engines and partitionings. The per-source rollup is the only big-data
    shuffle; ranking runs over the tiny source table."""
    d = load_table(spark, sf_dir, "documents")
    q = T.quality_features(F.col("text"))
    per_doc = d.select("source", "n_chars", r2(q["stopword_ratio"], 4).alias("q"))
    per_source = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
        r2(F.avg("q"), 4).alias("mean_stopword_ratio"),
    )
    w_rank = W.orderBy(F.col("mean_stopword_ratio").desc(), "source")
    w_all = W.partitionBy()
    return per_source.select(
        "source",
        "n_docs",
        "n_chars_total",
        "mean_stopword_ratio",
        F.row_number().over(w_rank).alias("q_rank"),
        r2(
            F.col("mean_stopword_ratio")
            / F.sum("mean_stopword_ratio").over(w_all),
            4,
        ).alias("mix_weight"),
    )


K46_ORACLE = f"""
WITH guessed AS (
  SELECT lang AS declared_lang,
         CASE WHEN regexp_matches(text, '{_ZH}') THEN 'zh'
              WHEN regexp_matches(text, '{_FR}') THEN 'fr'
              WHEN regexp_matches(text, '{_ES}') THEN 'es'
              WHEN regexp_matches(text, '{_DE}') THEN 'de'
              ELSE 'en' END AS guessed_lang
  FROM ({_LANG_DIRTY})
), counts AS (
  SELECT declared_lang, guessed_lang, count(*) AS n FROM guessed GROUP BY 1, 2
), per_lang AS (
  SELECT declared_lang, CAST(sum(n) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN declared_lang = guessed_lang THEN n ELSE 0 END)
              AS BIGINT) AS n_correct
  FROM counts GROUP BY declared_lang
)
SELECT c.declared_lang, c.guessed_lang, c.n,
       p.n_total,
       {r2sql("p.n_correct / CAST(p.n_total AS DOUBLE)", 4)} AS lang_recall
FROM counts c JOIN per_lang p USING (declared_lang)
"""


@register("k46_langid_eval", oracle=K46_ORACLE, group="K")
def k46_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component evaluation inside the engine: the k12 language-ID
    classifier scored against the corpus's declared labels as a confusion
    matrix with per-language recall — the QA loop every classifier-driven
    pipeline stage needs (route/drop decisions are only as good as the
    classifier, so its error structure must be a queryable table, not a
    notebook artifact). Two tiny shuffles on (declared, guessed); the
    classification itself is a per-row expression at scan speed. Runs
    over the _lang_marked dirtied corpus (see k12): diagonal-dominant
    with the unmarked third of each language as the known miss class."""
    d = _lang_marked(load_table(spark, sf_dir, "documents"))
    guessed = d.select(
        F.col("lang").alias("declared_lang"),
        T.lang_id(F.col("text")).alias("guessed_lang"),
    )
    counts = guessed.groupBy("declared_lang", "guessed_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_lang = counts.groupBy("declared_lang").agg(
        F.sum("n").alias("n_total"),
        F.sum(
            F.when(F.col("declared_lang") == F.col("guessed_lang"), F.col("n"))
            .otherwise(0)
        ).alias("n_correct"),
    )
    return counts.join(per_lang, "declared_lang").select(
        "declared_lang",
        "guessed_lang",
        "n",
        "n_total",
        r2(F.col("n_correct") / F.col("n_total").cast("double"), 4).alias(
            "lang_recall"
        ),
    )


K47_ORACLE = """
WITH RECURSIVE tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 1000
), cnt AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), pr AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN cnt na ON doc_a = na.doc_id
  JOIN cnt nb ON doc_b = nb.doc_id
  WHERE CAST(i AS DOUBLE) / (CAST(na.n + nb.n AS DOUBLE) - CAST(i AS DOUBLE)) >= 0.9
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pr
  UNION
  SELECT doc_b, doc_a FROM pr
), reach AS (
  SELECT a AS node, b AS r FROM edges
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
), comp AS (
  SELECT node AS doc_id, least(node, min(r)) AS cluster
  FROM reach GROUP BY node
), nearrep AS (
  SELECT doc_id, cluster,
         CAST(max(CASE WHEN rn = 1 THEN rdoc END)
              OVER (PARTITION BY cluster) AS BIGINT) AS rep_doc
  FROM (
    SELECT c.cluster, c.doc_id, c.doc_id AS rdoc,
           row_number() OVER (PARTITION BY c.cluster
                              ORDER BY d.n_chars DESC, c.doc_id) AS rn
    FROM comp c JOIN documents d USING (doc_id)
  )
), exact AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS exact_rep
  FROM documents
)
SELECT d.doc_id,
       CASE WHEN e.exact_rep <> d.doc_id THEN 'drop_exact'
            WHEN nr.rep_doc IS NOT NULL AND nr.rep_doc <> d.doc_id THEN 'drop_near'
            ELSE 'keep' END AS decision,
       CAST(CASE WHEN e.exact_rep <> d.doc_id THEN e.exact_rep
                 WHEN nr.rep_doc IS NOT NULL THEN nr.rep_doc
                 ELSE d.doc_id END AS BIGINT) AS rep_doc
FROM documents d
JOIN exact e USING (doc_id)
LEFT JOIN nearrep nr USING (doc_id)
"""


@register("k47_dedup_decisions", oracle=K47_ORACLE, group="K")
def k47_dedup_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's FINAL ARTIFACT: one keep/drop decision per
    document, composing exact dedup (k4: identical md5 → keep min id),
    near-dup clustering (k5 pairs → k25 components → k31 longest-doc
    representative), with exact-match precedence. This is the table the
    training-data build actually consumes — everything upstream
    (LSH candidates at scale via k9, verify via k5's exact Jaccard) feeds
    it. Windows shuffle on content hash and cluster id; the corpus join
    is key-co-partitioned on doc_id. Exact dedup covers the FULL corpus
    (cheap md5 window); the quadratic near-dup pair stage is bounded to
    the doc_id<1000 slice (k5's convention; k9 at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    exact = docs.select(
        "doc_id",
        F.min("doc_id")
        .over(W.partitionBy(F.md5("text")))
        .alias("exact_rep"),
    )
    pairs = D.jaccard_pairs(
        docs.filter(F.col("doc_id") < 1000), "doc_id", "text", threshold=0.9
    )
    comp = D.connected_components(pairs).select(
        F.col("node").alias("doc_id"), "cluster"
    )
    ranked = comp.join(docs.select("doc_id", "n_chars"), "doc_id").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("cluster").orderBy(F.col("n_chars").desc(), "doc_id")
        ),
    )
    nearrep = ranked.select(
        "doc_id",
        F.max(F.when(F.col("rn") == 1, F.col("doc_id")))
        .over(W.partitionBy("cluster"))
        .alias("rep_doc"),
    )
    joined = docs.select("doc_id").join(exact, "doc_id").join(nearrep, "doc_id", "left")
    decision = (
        F.when(F.col("exact_rep") != F.col("doc_id"), "drop_exact")
        .when(
            F.col("rep_doc").isNotNull() & (F.col("rep_doc") != F.col("doc_id")),
            "drop_near",
        )
        .otherwise("keep")
    )
    rep = (
        F.when(F.col("exact_rep") != F.col("doc_id"), F.col("exact_rep"))
        .when(F.col("rep_doc").isNotNull(), F.col("rep_doc"))
        .otherwise(F.col("doc_id"))
    )
    return joined.select(
        "doc_id", decision.alias("decision"), rep.alias("rep_doc")
    )


# ---------------------------------------------------------------------------
# k48 — ANN quality evaluation (recall of the IVF path vs brute force)
# ---------------------------------------------------------------------------


@register("k48_ann_recall_eval", oracle=None, group="K")
def k48_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as a queryable artifact (the k46 posture applied to
    similarity search): recall@5 of the trained-IVF path (k22's index —
    Lloyd's centroids — queried multi-probe with nprobe=3) against the k6
    brute-force exact top-5, per probe. A pipeline that swaps brute force
    for IVF at 100 TB needs this table in the engine, not in a notebook —
    it is the evidence the sublinear scan is still finding the right
    neighbors. Rows-only (k-means float means aren't reproducible
    cross-engine); mean recall >= 0.9 is pinned in tests/test_llm_ops.py.

    Cost shape: brute force is one broadcast of the 10 probes against the
    corpus; the IVF side re-uses the k22 plan (centroid assign = broadcast
    join, in-cluster pairs only). Both sides end in tiny per-probe top-5
    windows keyed by q_id."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    probes_src = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = S.cosine_topk(probes_src, corpus, k=5).select(
        "q_id", F.col("c_id").alias("exact_id")
    )
    centroids = S.kmeans_centroids(corpus, k=8, dim=64, iters=3)
    assigned = S.ivf_assign(corpus, centroids)
    # query side probes its top-3 cells (multi-probe IVF: 3/8 of the corpus
    # per probe instead of a full scan, recovering the Voronoi-boundary
    # neighbors single-cell probing misses)
    probes = S.ivf_assign(
        probes_src.select(F.col("q_id").alias("c_id"), F.col("q_vec").alias("c_vec")),
        centroids,
        nprobe=3,
    ).select(
        F.col("c_id").alias("q_id"),
        F.col("c_vec").alias("q_vec"),
        F.col("cluster").alias("q_cluster"),
    )
    # per-side norm factoring (round 12, the cosine_topk/k11 discipline):
    # dot/(qn*mn) is the identical IEEE expression to cosine(q_vec, c_vec)
    # at a third of the per-pair interpreted-fold work
    members = assigned.select("c_id", "c_vec", "cluster").withColumn(
        "_mnrm", S.norm(F.col("c_vec"))
    )
    pairs = members.join(
        F.broadcast(probes.withColumn("_qnrm", S.norm(F.col("q_vec")))),
        (F.col("cluster") == F.col("q_cluster")) & (F.col("q_id") != F.col("c_id")),
    ).withColumn(
        "sim",
        r2(
            S.dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("_qnrm") * F.col("_mnrm")),
            6,
        ),
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("c_id"))
    ivf = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", F.col("c_id").alias("ivf_id"))
    )
    hits = exact.join(
        ivf, (exact.q_id == ivf.q_id) & (exact.exact_id == ivf.ivf_id), "left"
    ).select(exact.q_id, "exact_id", F.col("ivf_id").isNotNull().alias("hit"))
    return hits.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.col("hit").cast("int")).alias("n_hit"),
        r2(F.sum(F.col("hit").cast("int")) / F.count(F.lit(1)).cast("double"), 4)
        .alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# k49 — connected components via large-star/small-star (the scale CC path)
# ---------------------------------------------------------------------------


@register("k49_cc_star", oracle=K25_ORACLE, group="K")
def k49_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k25's clustering re-run through the large-star/small-star alternating
    algorithm (ops/dedup.py connected_components_star): same (doc_id,
    cluster) labels — the oracle is literally k25's recursive-CTE closure —
    but convergence is O(log²) rounds in component DIAMETER instead of
    min-label propagation's one-round-per-hop. On a 100 TB corpus where
    transitive LSH merges produce chain-shaped components, this is the
    difference between a handful of shuffle rounds and dozens; each round
    is a groupBy-min plus a join back on the same key. Equivalence of the
    two algorithms on identical pair lists is pinned in
    tests/test_dedup_star.py."""
    pairs = D.jaccard_pairs(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000),
        "doc_id",
        "text",
        threshold=0.9,
    )
    return D.connected_components_star(pairs).select(
        F.col("node").alias("doc_id"), "cluster"
    )


# ---------------------------------------------------------------------------
# k50 — MinHash Jaccard ESTIMATION (signature-only similarity, no token re-read)
# ---------------------------------------------------------------------------


@register("k50_minhash_jaccard_est", oracle=None, group="K")
def k50_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-only Jaccard estimation: for every LSH candidate pair, the
    fraction of agreeing MinHash positions (E[agree] = exact Jaccard; with
    H=64 hashes the standard error is √(j(1-j)/64) ≤ 0.063) next to the
    exact token-set Jaccard and the absolute error. The point at 100 TB:
    once signatures exist, pair similarity is a 64-element compare on
    ~0.5 KB rows — the token payload (unbounded) never re-enters the
    shuffle, so candidate scoring costs the same whether documents are
    tweets or books. Rows-only (xxhash64-based signatures are
    engine-specific); the estimator's error bound is pinned in
    tests/test_dedup_star.py. The EVAL slice is bounded to doc_id<1000
    (the exact-Jaccard comparison column is the quadratic-ish part, not
    the estimator being evaluated — k5's convention)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    cand = D.minhash_lsh_pairs(
        d, "doc_id", "text", num_hashes=32, bands=8, threshold=0.0
    ).select("doc_a", "doc_b", F.col("jaccard").alias("jaccard_exact"))
    sig = d.select(
        F.col("doc_id").alias("doc"),
        D.minhash_signature(D.tokens(F.col("text")), 64).alias("sig"),
    )
    pairs = cand.join(
        sig.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a"
    ).join(
        sig.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b"
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda z: z
        )
    )
    est = agree.cast("double") / F.lit(64.0)
    return pairs.select(
        "doc_a",
        "doc_b",
        r2(F.col("jaccard_exact"), 6).alias("jaccard_exact"),
        r2(est, 6).alias("jaccard_est"),
        r2(F.abs(est - F.col("jaccard_exact")), 6).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# k51 — duplicated-span coverage (exact-substring dedup signal per document)
# ---------------------------------------------------------------------------

_K51_SH = (
    "list_distinct(list_transform(range(1, greatest(len(t)-7, 1)+1),"
    " i -> array_to_string(t[i:i+7], ' ')))"
)
_K51_DUP = "CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)"

K51_ORACLE = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT doc_id, unnest({_K51_SH}) AS s FROM tok),
cnt AS (SELECT s, count(*) AS nd FROM sh GROUP BY s)
SELECT doc_id, count(*) AS n_sh, {_K51_DUP} AS n_dup,
       {r2sql(f"CAST({_K51_DUP} AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS dup_frac
FROM sh JOIN cnt USING (s)
GROUP BY doc_id
"""


@register("k51_dup_span_coverage", oracle=K51_ORACLE, group="K")
def k51_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span coverage: the fraction of a doc's
    distinct word-8-gram spans that also occur in at least one OTHER doc
    (nd counts docs per span; distinct-per-doc makes nd a doc count) —
    the doc-level signal of the exact-substring dedup family ("what share
    of this document is boilerplate the corpus already has?"), used to
    rank docs for removal where whole-doc dedup (k4/k9) finds nothing.
    Plan: explode distinct spans, ONE shuffle keyed on xxhash64(span) —
    the 8-byte hash, never the span string, is what crosses the wire
    (64-bit collisions over a corpus-scale span set are ~1e-10 — the same
    trade k4 makes) — count docs per span, join back, re-group by doc."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - 7, F.lit(1)))
    spans = F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i, F.lit(8)), " "))
    )
    sh = d.select("doc_id", F.explode(spans).alias("s")).select(
        "doc_id", F.xxhash64("s").alias("h")
    )
    cnt = sh.groupBy("h").agg(F.count(F.lit(1)).alias("nd"))
    dup = F.sum((F.col("nd") >= 2).cast("int")).cast("long")
    return (
        sh.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            dup.alias("n_dup"),
            r2(dup.cast("double") / F.count(F.lit(1)).cast("double"), 4).alias(
                "dup_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# k52 — SemDeDup-style embedding dedup (cluster-then-prune, deterministic)
# ---------------------------------------------------------------------------

_K52_ASG_COS = r2sql(cos_sql("e.embedding", "cent.c"), 6)
_K52_PAIR_COS = r2sql(cos_sql("x.embedding", "y.embedding"), 6)

K52_ORACLE = f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS c FROM embeddings WHERE vec_id < 32
), asg AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, cent.cent_id AS cluster,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_K52_ASG_COS} DESC, cent.cent_id) AS rn
    FROM embeddings e CROSS JOIN cent
  ) WHERE rn = 1
), dropped AS (
  SELECT DISTINCT x.vec_id FROM asg x JOIN asg y
    ON x.cluster = y.cluster AND y.vec_id < x.vec_id
  WHERE {_K52_PAIR_COS} >= 0.35
)
SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS keep
FROM asg a LEFT JOIN dropped d ON a.vec_id = d.vec_id
"""


@register("k52_semdedup", oracle=K52_ORACLE, group="K")
def k52_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    embeddings (fixed 32 centroids here — k22 is the trained-k-means
    variant of the same assignment), then WITHIN each cluster drop any
    vector whose cosine to a lower-id cluster-mate reaches the threshold
    (deterministic keep-lowest-id; the exists-a-duplicate test needs no
    chaining so the decision is local to each pair). Pairwise work is
    cluster-local: at 100 TB the cluster COUNT scales with the corpus so
    cluster SIZE stays bounded (SemDeDup runs ~100k clusters for billions
    of points) — never an all-pairs join. τ=0.35 is tuned to this
    synthetic N(0,1) corpus (real text embeddings dedup at ~0.95+);
    cosines are 6-dp rounded on both engines (k11's discipline) so the
    threshold can't flip on a fold-order ulp.

    Round-12 shape (output bit-identical, md5-harness-checked + 3-SF
    parity): the assignment is localCheckpoint'ed once — it feeds BOTH
    pair sides and the final keep projection, and without the cut the
    whole assign plan re-executed per branch per action (the k9 lineage
    lesson); each side carries its vector's norm computed ONCE per vector,
    so the per-pair cosine is ``dot/(xn·yn)`` — the identical IEEE
    expression as ``cosine(xv, yv)`` (same folds, same operand order) at
    a third of the interpreted-fold work (guide §1.2; the rh_lsh_pairs
    precedent); the y side is broadcast (cluster-local pair generation
    never needs the corpus shuffled — at SemDeDup's real scale the
    within-cluster join shuffles both sides by cluster id instead, which
    is what the oracle's shape pins)."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    centroids = e.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    asg = S.ivf_assign(corpus, centroids)
    try:
        asg = asg.localCheckpoint(eager=True)
    except Exception:
        asg.cache().count()
    an = asg.withColumn("_nrm", S.norm(F.col("c_vec")))
    x = an.select(
        F.col("c_id").alias("vec_id"), F.col("c_vec").alias("xv"), "cluster",
        F.col("_nrm").alias("xn"),
    )
    y = an.select(
        F.col("c_id").alias("y_id"), F.col("c_vec").alias("yv"),
        F.col("cluster").alias("y_cluster"), F.col("_nrm").alias("yn"),
    )
    pair_cos = S.dot(F.col("xv"), F.col("yv")) / (F.col("xn") * F.col("yn"))
    dropped = (
        x.join(
            F.broadcast(y),
            (F.col("cluster") == F.col("y_cluster")) & (F.col("y_id") < F.col("vec_id")),
        )
        .filter(r2(pair_cos, 6) >= 0.35)
        .select("vec_id")
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        asg.select(F.col("c_id").alias("vec_id"), "cluster")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.col("is_dropped").isNull().alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# k53 — unigram LM quality score (order-free micro-nat integer sums)
# ---------------------------------------------------------------------------

_K53_MICRO = (
    "CAST(floor(ln(CAST(total AS DOUBLE) / CAST(n AS DOUBLE))"
    " * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)

K53_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
tot AS (SELECT count(*) AS total FROM tok),
lm AS (SELECT token, {_K53_MICRO} AS micro FROM tf, tot)
SELECT doc_id, count(*) AS n_tok,
       {r2sql("CAST(sum(micro) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * CAST(1000000 AS DOUBLE))", 4)} AS avg_nats
FROM tok JOIN lm USING (token)
GROUP BY doc_id
"""


@register("k53_lm_score", oracle=K53_ORACLE, group="K")
def k53_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: per-doc average surprisal
    -ln p(token) under the corpus's own unigram distribution — the
    CCNet-style "LM perplexity" quality filter reduced to its
    SQL-expressible core (a real pipeline swaps in a pretrained LM's token
    probs; the plan is identical). Determinism trick: each token's
    surprisal is rounded to MICRO-NATS and summed as a BIGINT — float sums
    over a shuffled group are fold-order-dependent (non-associative), but
    integer sums are exact at any partitioning, so the per-doc score is
    hash-oracle-safe. The vocab→surprisal table broadcasts (tiny here;
    k18's df-side pattern — shuffle-join it once vocab outgrows the
    broadcast threshold), so the corpus itself is never shuffled by token:
    the only wide exchange is the per-doc regroup."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    tot = tok.groupBy().agg(F.count(F.lit(1)).alias("total"))
    micro = F.floor(
        F.log(F.col("total").cast("double") / F.col("n").cast("double"))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    lm = tf.crossJoin(F.broadcast(tot)).select("token", micro.alias("micro"))
    return (
        tok.join(F.broadcast(lm), "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum("micro").alias("sum_micro"))
        .select(
            "doc_id",
            "n_tok",
            r2(
                F.col("sum_micro").cast("double")
                / (F.col("n_tok").cast("double") * F.lit(1000000.0)),
                4,
            ).alias("avg_nats"),
        )
    )


# ---------------------------------------------------------------------------
# k54 — URL canonicalization dedup (the web-corpus near-dup front door)
# ---------------------------------------------------------------------------

# Canonicalization, identical op sequence on both engines (no regex group
# refs — Java says $1 where RE2 says \1, so steps use literal replaces or
# plain deletions only): drop fragment, drop default port, strip tracking
# params, strip trailing slash, lowercase (synthesized paths are
# case-free by construction; a production canonicalizer lowercases only
# scheme+host).
_K54_SEED_SQL = """
CASE CAST(o_orderkey % 3 AS INT)
  WHEN 0 THEN 'https://shop.example.com/p/' || CAST(o_orderkey % 500 AS VARCHAR)
           || '?utm_campaign=spring&ref=home'
  WHEN 1 THEN 'HTTPS://Shop.Example.COM:443/p/' || CAST(o_orderkey % 500 AS VARCHAR) || '/'
  ELSE 'https://shop.example.com/p/' || CAST(o_orderkey % 500 AS VARCHAR) || '#top'
END
"""

K54_ORACLE = f"""
WITH seeded AS (
  SELECT o_orderkey, {_K54_SEED_SQL} AS url FROM orders
), canon AS (
  SELECT o_orderkey, url,
         regexp_replace(
           replace(
             regexp_replace(regexp_replace(lower(url), '#.*$', ''),
                            '[?&](utm_[a-z]+|ref)=[^&#]*', '', 'g'),
             ':443/', '/'),
           '/$', '') AS canonical_url
  FROM seeded
)
SELECT canonical_url,
       count(*) AS n_rows,
       CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
       min(o_orderkey) AS keep_orderkey
FROM canon
GROUP BY canonical_url
"""


@register("k54_url_canonical_dedup", oracle=K54_ORACLE, group="K")
def k54_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the cheapest and highest-yield dedup
    pass in a web corpus runs BEFORE any content hashing: the same page
    crawled as http/HTTPS, with tracking params, default ports, fragments
    or trailing slashes is one document. Synthesizes three messy variants
    per product URL from orders, canonicalizes (drop fragment → strip
    utm_*/ref params → drop default port → strip trailing slash → lower),
    and groups: one row per canonical URL with its variant count and the
    kept crawl (min orderkey). Stateless per-row string ops at scan speed;
    the only shuffle is the canonical-key groupBy — at 100 TB this
    de-duplicates fetches before they are even stored."""
    o = load_table(spark, sf_dir, "orders")
    pid = (F.col("o_orderkey") % 500).cast("string")
    url = (
        F.when(
            (F.col("o_orderkey") % 3) == 0,
            F.concat(
                F.lit("https://shop.example.com/p/"), pid,
                F.lit("?utm_campaign=spring&ref=home"),
            ),
        )
        .when(
            (F.col("o_orderkey") % 3) == 1,
            F.concat(
                F.lit("HTTPS://Shop.Example.COM:443/p/"), pid, F.lit("/")
            ),
        )
        .otherwise(
            F.concat(F.lit("https://shop.example.com/p/"), pid, F.lit("#top"))
        )
    )
    canon = F.regexp_replace(
        F.replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("url")), "#.*$", ""),
                "[?&](utm_[a-z]+|ref)=[^&#]*",
                "",
            ),
            F.lit(":443/"),
            F.lit("/"),
        ),
        "/$",
        "",
    )
    return (
        o.select("o_orderkey", url.alias("url"))
        .withColumn("canonical_url", canon)
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("url").alias("n_variants"),
            F.min("o_orderkey").alias("keep_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# k55 — containment dedup (asymmetric near-dup: quotes / subset documents)
# ---------------------------------------------------------------------------

K55_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id < 1000
), cnt AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(i AS DOUBLE) / CAST(na.n AS DOUBLE) AS c_ab,
       CAST(i AS DOUBLE) / CAST(nb.n AS DOUBLE) AS c_ba
FROM inter
JOIN cnt na ON doc_a = na.doc_id
JOIN cnt nb ON doc_b = nb.doc_id
WHERE CAST(i AS DOUBLE) / CAST(na.n AS DOUBLE) >= 0.9
   OR CAST(i AS DOUBLE) / CAST(nb.n AS DOUBLE) >= 0.9
"""


@register("k55_containment_dedup", oracle=K55_ORACLE, group="K")
def k55_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup: |A∩B| / |A| — the signal Jaccard
    misses. A short document wholly quoted inside a long one has low
    Jaccard (the union is large) but containment ≈ 1; corpus pipelines
    use this to drop subset/boilerplate docs that whole-doc similarity
    keeps. Emits both directions per pair where either reaches 0.9.
    Same bounded-slice posture as k5 (doc_id<1000; ratios are exact
    count-division, no rounding needed for the oracle hash — numerator
    and denominators are integers so both engines divide the same
    doubles); the scale path reuses k9's LSH candidates, since
    containment ≥ c implies Jaccard ≥ c/(2-c) bounds the candidate
    search."""
    # k9-playbook verify (round 11): hashed-token primitive intersect,
    # evaluated ONCE behind the nondeterministic pin (the old shape
    # re-derived the string intersect in c_ab, c_ba AND the OR filter).
    # NO size prefilter is possible here — that is the point of
    # containment: i ≥ 0.9·min(|A|,|B|) holds for ANY size ratio (a tweet
    # inside an encyclopedia), so unlike Jaccard the size pair carries no
    # pruning signal.
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    t = d.select("doc_id", D.tokens(F.col("text")).alias("toks"))
    sized = t.select("doc_id", F.size("toks").alias("n"))
    pair_ids = (
        sized.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
        .join(
            sized.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            F.col("doc_a") < F.col("doc_b"),
        )
        .repartition("doc_a", "doc_b")
    )
    th = t.select(
        "doc_id", F.transform("toks", lambda x: F.xxhash64(x)).alias("th")
    )
    pairs = pair_ids.join(
        F.broadcast(th.select(F.col("doc_id").alias("doc_a"), F.col("th").alias("th_a"))),
        "doc_a",
    ).join(
        F.broadcast(th.select(F.col("doc_id").alias("doc_b"), F.col("th").alias("th_b"))),
        "doc_b",
    )
    pairs = pairs.withColumn(
        "inter",
        F.when(
            F.spark_partition_id() >= 0,
            F.size(F.array_intersect("th_a", "th_b")).cast("double"),
        ).otherwise(F.lit(-1.0)),
    )
    c_ab = F.col("inter") / F.col("n_a").cast("double")
    c_ba = F.col("inter") / F.col("n_b").cast("double")
    return (
        pairs.select(
            "doc_a", "doc_b", c_ab.alias("c_ab"), c_ba.alias("c_ba")
        )
        .filter((F.col("c_ab") >= 0.9) | (F.col("c_ba") >= 0.9))
    )


# ---------------------------------------------------------------------------
# k56 — temperature-weighted source sampling (the multilingual mix formula)
# ---------------------------------------------------------------------------

K56_ORACLE = f"""
WITH g AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_docs) AS DOUBLE) AS N,
         sum(pow(CAST(n_docs AS DOUBLE), CAST(0.7 AS DOUBLE))) AS S
  FROM g
)
SELECT source, n_docs,
       {r2sql("CAST(n_docs AS DOUBLE) / N", 6)} AS p_raw,
       {r2sql("pow(CAST(n_docs AS DOUBLE), CAST(0.7 AS DOUBLE)) / S", 6)} AS p_temp,
       {r2sql("(pow(CAST(n_docs AS DOUBLE), CAST(0.7 AS DOUBLE)) / S) / (CAST(n_docs AS DOUBLE) / N)", 6)} AS boost
FROM g, tot
"""


@register("k56_temperature_sampling", oracle=K56_ORACLE, group="K")
def k56_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted sampling rates per source: p_i ∝ n_i^α with
    α = 0.7 — the exponentiated-count formula multilingual / multi-source
    corpora use (XLM-R, mT5) to up-sample small sources without letting
    the head domains drown them. Emits, per source, its natural share
    p_raw, its temperature share p_temp, and the resampling boost
    p_temp / p_raw a sampler (e.g. m25's A-Res weights, or a per-source
    m1-style hash rate) would apply. One groupBy shuffle over the corpus;
    the totals (N, Σ n^α) come from a second aggregate over the tiny
    per-source frame and ride a broadcast cross join — nothing about this
    changes at 100 TB because everything after the first shuffle is
    O(#sources). All ratios computed from unrounded doubles on both
    engines, then r2-floored at 6 decimals."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = g.agg(
        F.sum("n_docs").cast("double").alias("_N"),
        F.sum(F.pow(F.col("n_docs").cast("double"), F.lit(0.7))).alias("_S"),
    )
    n = F.col("n_docs").cast("double")
    p_raw = n / F.col("_N")
    p_temp = F.pow(n, F.lit(0.7)) / F.col("_S")
    return g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        r2(p_raw, 6).alias("p_raw"),
        r2(p_temp, 6).alias("p_temp"),
        r2(p_temp / p_raw, 6).alias("boost"),
    )


# ---------------------------------------------------------------------------
# k57 — dataset card: the per-language corpus summary artifact
# ---------------------------------------------------------------------------

K57_ORACLE = f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
       {r2sql("sum(CAST(n_chars AS DOUBLE)) / count(*)", 2)} AS avg_chars,
       {r2sql("CAST(1 AS DOUBLE) - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*)", 6)} AS dup_rate
FROM documents
GROUP BY lang
"""


@register("k57_dataset_card", oracle=K57_ORACLE, group="K")
def k57_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the one-table corpus summary a training run records
    next to its data snapshot — per language: document count, distinct
    sources, total/average characters, and the exact-duplicate rate
    (1 − distinct md5(text) / count). Everything is a single groupBy(lang)
    with partial aggregation; the two DISTINCTs expand to the standard
    two-phase distinct-agg plan (d2's shape). The md5 runs JVM-side at
    scan speed, so at 100 TB this is one pass over the corpus producing a
    #languages-row artifact — cheap enough to regenerate per snapshot and
    diff across ingests (m23's drift check is the companion op)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("n_chars_total"),
        r2(F.sum(F.col("n_chars").cast("double")) / F.count(F.lit(1)), 2).alias(
            "avg_chars"
        ),
        r2(
            F.lit(1.0)
            - F.countDistinct(F.md5("text")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


# ---------------------------------------------------------------------------
# k58 — product-quantization encode (the memory side of IVF-PQ ANN)
# ---------------------------------------------------------------------------

def _pq_l2_sql(a: str, b: str, off: int, n: int) -> str:
    """DuckDB squared-L2 over a length-``n`` slice starting at 1-based
    offset ``off+1`` — same sequential fold order as ops.similarity.l2sq."""
    xa = f"CAST({a}[{off} + i] AS DOUBLE)"
    xb = f"CAST({b}[{off} + i] AS DOUBLE)"
    return (
        f"list_sum(list_transform(range(1, {n + 1}),"
        f" i -> ({xa} - {xb}) * ({xa} - {xb})))"
    )


def _pq_sub_cte(s: int, sub_dim: int) -> str:
    d = r2sql(_pq_l2_sql("e.embedding", "cb.cv", s * sub_dim, sub_dim), 6)
    return f"""s{s} AS (
  SELECT vec_id, CAST(cent_id AS INTEGER) AS code_{s}, dist AS err_{s} FROM (
    SELECT e.vec_id, cb.cent_id, {d} AS dist,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {d} ASC, cb.cent_id) AS rn
    FROM embeddings e CROSS JOIN cb
  ) WHERE rn = 1
)"""


K58_ORACLE = f"""
WITH cb AS (
  SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8
),
{_pq_sub_cte(0, 16)},
{_pq_sub_cte(1, 16)},
{_pq_sub_cte(2, 16)},
{_pq_sub_cte(3, 16)}
SELECT vec_id, code_0, code_1, code_2, code_3,
       err_0, err_1, err_2, err_3
FROM s0 JOIN s1 USING (vec_id) JOIN s2 USING (vec_id) JOIN s3 USING (vec_id)
"""


@register("k58_pq_encode", oracle=K58_ORACLE, group="K")
def k58_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011): each 64-d embedding splits
    into 4 16-d subvectors, each replaced by the id of its nearest codeword
    (squared-L2, min-id tiebreak) — 64 floats become 4 small ints, the
    compressed representation IVF-PQ searches over. Codebooks here are the
    first 8 vectors' subspace slices (the k16 data-derived-constants shape),
    which makes the whole encode hash-oracle-able; k59 is the k-means-
    trained variant with an ADC search and a recall gate. Scale: ONE
    corpus pass for all subspaces (explode → broadcast codebook join →
    one argmin window → pivot back; see ops.similarity.pq_encode),
    exchange-budget-pinned."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    cb = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    return S.pq_encode(corpus, cb, n_sub=4, sub_dim=16).select(
        F.col("c_id").alias("vec_id"),
        "code_0", "code_1", "code_2", "code_3",
        "err_0", "err_1", "err_2", "err_3",
    )


# ---------------------------------------------------------------------------
# k59 — IVF-PQ ANN search with trained codebooks + ADC (rows-only, recall-gated)
# ---------------------------------------------------------------------------

@register("k59_ann_ivfpq", oracle=None, group="K")
def k59_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search, the trained half of k58: per-subspace L2 k-means
    codebooks (Lloyd's, deterministic init — the only driver-side data is
    each 8×16 codebook, the MLlib model-collect pattern), PQ-encode the
    corpus, then answer 5 probe queries by Asymmetric Distance Computation:
    est_dist(q, x) = Σ_s l2(q_s, codeword[code_s(x)]) — a join of the
    corpus CODES (4 small ints/vector) against a 160-row broadcast
    query-to-codeword distance table, never the raw vectors — then an
    EXACT re-rank of the top-100 ADC shortlist (the refine stage every
    production IVF-PQ deployment runs). This is why PQ scales: the
    full-corpus pass touches 4 ints + 4 lookups per vector; exact floats
    are read for only 100 candidates per query. Rows-only by contract
    (k-means is iterative); recall@10 vs exact L2 pinned ≥0.7 in
    tests/test_llm_ops.py (measured 0.90 at sf0.01)."""
    from marasa_spark.ops.similarity import kmeans_centroids, l2sq, pq_encode

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    n_sub, sub_dim, k = 4, 16, 8
    queries_full = corpus.filter(F.col("c_id") < 5)

    # train one 8×16 codebook per subspace; assemble the k×64 full-width
    # codebook driver-side (k-means already collects exactly this model —
    # assembly adds zero new driver data) so the encode is the single-pass
    # pq_encode plan instead of a per-subspace loop of joins
    sub_cents: list[dict[int, list[float]]] = []
    for s in range(n_sub):
        sub = corpus.select(
            "c_id", F.slice("c_vec", s * sub_dim + 1, sub_dim).alias("c_vec")
        )
        cents = kmeans_centroids(sub, k=k, dim=sub_dim, iters=3, metric="l2")
        sub_cents.append(
            {r["cent_id"]: list(r["cent_vec"]) for r in cents.collect()}
        )
    full_cb = spark.createDataFrame(
        [
            (cid, [v for s in range(n_sub) for v in sub_cents[s][cid]])
            for cid in range(k)
        ],
        "cent_id long, c_vec array<double>",
    )

    wide = pq_encode(corpus, full_cb, n_sub=n_sub, sub_dim=sub_dim)
    codes = wide.selectExpr(
        "c_id",
        "stack(4, 0, code_0, 1, code_1, 2, code_2, 3, code_3) AS (s, code)",
    )
    qdists = queries_full.select(
        F.col("c_id").alias("q_id"),
        F.posexplode(
            F.array(
                *[
                    F.slice("c_vec", s * sub_dim + 1, sub_dim)
                    for s in range(n_sub)
                ]
            )
        ).alias("s", "q_sub"),
    ).join(
        F.broadcast(
            full_cb.select(
                "cent_id",
                F.posexplode(
                    F.array(
                        *[
                            F.slice("c_vec", s * sub_dim + 1, sub_dim)
                            for s in range(n_sub)
                        ]
                    )
                ).alias("s", "cb_sub"),
            )
        ),
        "s",
    ).select(
        "q_id", "s", "cent_id",
        r2(l2sq(F.col("q_sub"), F.col("cb_sub")), 6).alias("qdist"),
    )

    est = (
        codes.join(
            F.broadcast(qdists),
            (codes.s == qdists.s) & (codes.code == qdists.cent_id),
        )
        .filter(F.col("c_id") != F.col("q_id"))
        .groupBy("q_id", "c_id")
        .agg(r2(F.sum("qdist"), 6).alias("est_dist"))
    )
    wq = W.partitionBy("q_id").orderBy(F.col("est_dist").asc(), F.col("c_id"))
    shortlist = (
        est.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= 100)
        .select("q_id", "c_id")
    )
    # refine: exact L2 re-rank of the 100-candidate shortlist — the
    # standard IVF-PQ+refine pipeline. The exact distance touches only
    # 100 vectors per query (vs the whole corpus for brute force); ADC's
    # job is candidate generation, not final ordering. Measured recall@10
    # vs exact search: 0.26 without this stage, 0.90 with it (sf0.01).
    qv = queries_full.select(F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec"))
    cand = (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(corpus, "c_id")
        .withColumn("dist", r2(l2sq(F.col("q_vec"), F.col("c_vec")), 6))
    )
    wr = W.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("c_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 10)
        .select("q_id", F.col("c_id").alias("n_id"), "rank", "dist")
    )


# ---------------------------------------------------------------------------
# k60 — containment dedup via prefix filtering (the k55 SCALE path, exact)
# ---------------------------------------------------------------------------

@register("k60_containment_prefix_join", oracle=K55_ORACLE, group="K")
def k60_containment_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k55's result through the PPJoin-style prefix-filter plan — the
    similarity-join technique that makes exact containment search scale
    WITHOUT the all-pairs stage. Guarantee (direction A→B): if
    |A∩B|/|A| ≥ t then among ANY fixed ordering of A's tokens, one of the
    first ⌊(1−t)·|A|⌋+1 must appear in B (otherwise more than (1−t)·|A|
    of A's tokens miss B and containment is < t). So candidates =
    (A's rarest-token prefix) ⋈ (B's full token set), run in both
    directions, then exact verification on the candidate pairs only.
    Ordering by ascending global document-frequency makes the joined
    prefix tokens the RAREST ones — the join key distribution is
    deliberately anti-skewed, tiny posting lists instead of stopwords.
    Same oracle as k55 (two plans, one semantics): prefix filtering is
    lossless for the ≥ t output, which the hash check proves. At 100 TB
    the all-pairs k55 shape is impossible; this shape is one token
    shuffle + a rare-token join + per-candidate verification.

    Round-12 restructure (output identical — md5-harness-checked at sf0.1
    + 3-SF parity; the r11 shape paid 5 string-keyed exchanges and a
    pair×token verify join):

    * the per-doc distinct token SET comes from ``array_distinct`` per row
      (no explode+distinct exchange), carried as an xxhash64-HASHED long
      array — every downstream key is 8 B, never a UTF8String (guide
      §2.3; the k9/k55 verify discipline, same documented collision
      caveat: the shipped corpora pin vocabulary collision-freeness in
      tests, and a candidate-side collision can only ADD a candidate,
      which the exact verify then decides).
    * the prefix is built per doc by sorting its (df, h) pairs INSIDE the
      row (array_sort on a struct array) instead of a row_number window
      over every token — the prefix-filter guarantee holds for ANY fixed
      per-doc token order (if none of the first ⌊(1−t)·n⌋+1 tokens hits
      B, more than (1−t)·n tokens miss B), so ordering by (df, hash)
      instead of (df, token-string) changes only which lossless candidate
      superset is generated, never the verified output.
    * verification attaches both docs' hashed-set arrays per unique
      candidate pair (array_intersect behind the nondeterministic no-op
      pin, evaluated once) instead of re-joining the token table twice
      and counting — the k9 playbook's thin-pair + payload-attach shape.
      |A| is size(set) projected per row, so the old two count
      aggregations and their joins are gone. At the contract's bounded
      slice the attaches broadcast; at 100 TB they are shuffled-on-id
      joins (k9's documented fallback)."""
    t = 0.9
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    th = d.select(
        "doc_id",
        F.transform(D.tokens(F.col("text")), lambda x: F.xxhash64(x)).alias("th"),
    ).withColumn("n", F.size("th"))
    tokh = th.select("doc_id", F.explode("th").alias("h"))
    vocab = tokh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    # prefix size = ⌊n·(den−num)/den⌋ + 1 computed with EXACT arithmetic:
    # the tempting float (1 − 0.9) is 0.0999…8, and 0.0999…8 × 10 floors
    # to 0 instead of 1 — one prefix token where one may be missing, i.e.
    # lost candidates. n × 1.0 / 10.0 is correctly rounded at integers.
    num, den = 9, 10  # t = num/den
    n_pref = (
        F.floor(F.col("n") * F.lit(float(den - num)) / F.lit(float(den))) + 1
    ).cast("int")
    prefix = (
        tokh.join(vocab, "h")
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("df", "h")).alias("dfh"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "doc_id",
            F.explode(F.slice(F.array_sort("dfh"), 1, n_pref)).alias("p"),
        )
        .select("doc_id", F.col("p.h").alias("h"))
    )

    # candidates in each direction: smaller-side prefix ⋈ other side's FULL
    # token set; normalize to doc_a < doc_b and dedup, then spread the thin
    # pair table off whatever few tasks the rare-token join landed on
    # before the verify payloads attach (the k9 lesson: compute-bound
    # stages must be spread by key, byte-based AQE coalescing guesses
    # wrong on KB-sized pair tables)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cand_ab = (
        prefix.alias("p")
        .join(
            tokh.alias("f"),
            (F.col("p.h") == F.col("f.h")) & (F.col("p.doc_id") != F.col("f.doc_id")),
        )
        .select(
            F.least("p.doc_id", "f.doc_id").alias("doc_a"),
            F.greatest("p.doc_id", "f.doc_id").alias("doc_b"),
        )
        .distinct()
        .repartition(nparts, "doc_a", "doc_b")
    )

    pairs = cand_ab.join(
        F.broadcast(
            th.select(
                F.col("doc_id").alias("doc_a"),
                F.col("th").alias("th_a"),
                F.col("n").alias("n_a"),
            )
        ),
        "doc_a",
    ).join(
        F.broadcast(
            th.select(
                F.col("doc_id").alias("doc_b"),
                F.col("th").alias("th_b"),
                F.col("n").alias("n_b"),
            )
        ),
        "doc_b",
    )
    # the k9 nondeterministic no-op pin: array_intersect evaluated exactly
    # once per pair, never substituted into the OR filter's two branches
    pairs = pairs.withColumn(
        "inter",
        F.when(
            F.spark_partition_id() >= 0,
            F.size(F.array_intersect("th_a", "th_b")).cast("double"),
        ).otherwise(F.lit(-1.0)),
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            (F.col("inter") / F.col("n_a").cast("double")).alias("c_ab"),
            (F.col("inter") / F.col("n_b").cast("double")).alias("c_ba"),
        )
        .filter((F.col("c_ab") >= t) | (F.col("c_ba") >= t))
    )


# ---------------------------------------------------------------------------
# k61 — PII scrubbing: regex redaction with per-doc audit counts
# ---------------------------------------------------------------------------

# The synthetic corpus carries no PII, so the op INJECTS deterministic
# PII derived from doc_id (an email and a phone per doc) before
# redacting — both engines build the identical dirty text, so the oracle
# checks the actual redaction, not a no-op. Dialect note: Spark's
# regexp_replace is global; DuckDB's needs the explicit 'g' flag.
_K61_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_K61_PHONE = "\\d{3}-\\d{3}-\\d{4}"

K61_ORACLE = f"""
WITH dirty AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || CASE WHEN doc_id % 3 = 0
                      THEN ' or 555-000-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END AS text
  FROM documents WHERE doc_id < 500
), red AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '{_K61_EMAIL}', '[EMAIL]', 'g'),
                        '{_K61_PHONE}', '[PHONE]', 'g') AS text
  FROM dirty
)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, '[EMAIL]', ''))
            AS BIGINT) / 7 AS n_emails,
       CAST(length(text) - length(replace(text, '[PHONE]', ''))
            AS BIGINT) / 7 AS n_phones
FROM red
"""


@register("k61_pii_redaction", oracle=K61_ORACLE, group="K")
def k61_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data PII scrubbing: redact email addresses and US-style
    phone numbers with typed placeholders, and emit per-document audit
    counts (the compliance artifact a scrubbing pass must produce). Pure
    JVM regexp_replace chain — stateless per-row projection, zero
    shuffle, scales embarrassingly; the audit counts come from
    placeholder-length arithmetic so no second regex pass is needed;
    every 3rd doc carries TWO phone numbers so the replace's global
    flag (all occurrences, not first-match) is actually exercised.
    The corpus is synthetic, so deterministic PII is injected from
    doc_id first (identically in the oracle) — the redaction regexes are
    therefore genuinely exercised against text that contains matches."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" or 555-000-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = dirty.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", _K61_EMAIL, "[EMAIL]"), _K61_PHONE, "[PHONE]"
        ).alias("text"),
    )
    ph_len = F.lit(7).cast("bigint")  # len('[EMAIL]') == len('[PHONE]') == 7
    return red.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        (
            (F.length("text") - F.length(F.replace("text", F.lit("[EMAIL]"), F.lit(""))))
            .cast("bigint")
            / ph_len
        ).alias("n_emails"),
        (
            (F.length("text") - F.length(F.replace("text", F.lit("[PHONE]"), F.lit(""))))
            .cast("bigint")
            / ph_len
        ).alias("n_phones"),
    )


# ---------------------------------------------------------------------------
# k63 — domain-mixture reweighting under a token budget
# ---------------------------------------------------------------------------

K63_ORACLE = """
WITH per_src AS (
  SELECT source,
         sum(n_chars) AS chars_s,
         CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
              THEN CAST(3 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END AS wt
  FROM documents GROUP BY source
), tot AS (
  SELECT sum(chars_s) AS total_chars, sum(wt) AS total_wt FROM per_src
), rates AS (
  SELECT source,
         CAST(floor(least(CAST(1 AS DOUBLE),
              (CAST(0.5 AS DOUBLE) * total_chars * wt)
              / (total_wt * chars_s)) * 1000000) AS BIGINT) AS thresh
  FROM per_src, tot
)
SELECT d.source,
       count(*) AS n_docs_kept,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_kept
FROM documents d JOIN rates r ON d.source = r.source
WHERE (d.doc_id * 2654435761) % 1000000 < r.thresh
GROUP BY d.source
"""


@register("k63_mixture_reweight", oracle=K63_ORACLE, group="K")
def k63_mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting — the pretraining-corpus op where each
    source gets a TARGET mixture weight and the pipeline downsamples to
    a global token budget (here: even-indexed sources weighted 3:1 over
    odd, budget = 50% of total chars). Per-source keep rate =
    min(1, budget·w_s/Σw / chars_s), materialized as an INTEGER
    threshold (floor(rate·10⁶)) compared against a deterministic
    arithmetic hash of doc_id — so selection is reproducible, oracle-
    exact, and rerun-stable (the Knuth multiplicative constant; no RNG,
    no seed drift across engines or partitionings). Plan: one metadata-
    sized per-source aggregate broadcast back onto the corpus scan —
    a stateless per-row filter at 100 TB, the same shape as m1's hash
    sampling. Oversubscribed sources cap at rate 1 (the least());
    re-normalizing the residual budget across capped sources is the
    iterative refinement a real mixture tuner adds on top."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum("n_chars").alias("chars_s"),
        F.when(
            F.substring("source", 4, 10).cast("bigint") % 2 == 0, F.lit(3.0)
        )
        .otherwise(F.lit(1.0))
        .alias("wt"),
    )
    # same fold shape as the oracle: scalar totals attached by broadcast
    tot = per_src.agg(
        F.sum("chars_s").alias("total_chars"), F.sum("wt").alias("total_wt")
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.lit(0.5) * F.col("total_chars") * F.col("wt"))
                / (F.col("total_wt") * F.col("chars_s")),
            )
            * F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("thresh"),
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter((F.col("doc_id") * F.lit(2654435761)) % 1_000_000 < F.col("thresh"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
    )


# ---------------------------------------------------------------------------
# k64 — dedup survivor selection by quality (keep-best, not keep-first)
# ---------------------------------------------------------------------------

K64_ORACLE = """
WITH fp AS (
  SELECT doc_id, substr(text, 1, 64) AS fingerprint,
         length(text) - length(replace(text, ' ', '')) + 1 AS quality
  FROM documents
), ranked AS (
  SELECT doc_id, fingerprint, CAST(quality AS BIGINT) AS quality,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY quality DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY fingerprint) AS cluster_size
  FROM fp
)
SELECT doc_id, fingerprint, quality, CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked WHERE rn = 1 AND cluster_size > 1
"""


@register("k64_dedup_keep_best", oracle=K64_ORACLE, group="K")
def k64_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivor selection by QUALITY: within each duplicate
    cluster (64-char prefix fingerprint — the cheap stand-in for k49's
    connected components), keep the highest-quality member instead of
    the arbitrary first one (k4/k47 keep min-doc_id; real pipelines keep
    the longest/cleanest copy, since near-dups differ by truncation and
    boilerplate). Quality here = token count (whitespace arithmetic,
    engine-exact); tiebreak doc_id per the unique-ORDER-BY rule; only
    genuine clusters (size > 1) surface. One shuffle on the fingerprint;
    swap the fingerprint for k49's cluster ids and the same window is
    the representative-selection stage of the full near-dup pipeline."""
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        F.substring("text", 1, 64).alias("fingerprint"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        )
        .cast("bigint")
        .alias("quality"),
    )
    w = W.partitionBy("fingerprint").orderBy(F.col("quality").desc(), "doc_id")
    wc = W.partitionBy("fingerprint")
    return (
        fp.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(wc).cast("bigint"))
        .filter((F.col("rn") == 1) & (F.col("cluster_size") > 1))
        .select("doc_id", "fingerprint", "quality", "cluster_size")
    )


# ---------------------------------------------------------------------------
# k65 — mixture waterfilling: EXACT budget attainment under caps
# ---------------------------------------------------------------------------

# k63's rate = min(1, budget·w_s/Σw/chars_s) leaves budget on the table
# whenever a source caps (an oversubscribed source can't supply its
# share). Waterfilling redistributes the residual: find λ* such that
# Σ_s min(chars_s, λ*·wt_s) = budget. Closed form via one sorted prefix
# scan — sources sorted by capacity ratio r_s = chars_s/wt_s cap in
# order, so for each breakpoint i, λ_i = (budget − Σ_{j≤i} chars_j) /
# (Σwt − Σ_{j≤i} wt_j), and λ* = λ_k at the largest k with r_k ≤ λ_k
# (no valid k → nothing caps, λ* = budget/Σwt). Weights here force caps:
# sources 0-4 carry weight 10 (oversubscribed 4x), the rest weight 1.
# All inputs are integer-exact (char counts, 10/1 weights), so both
# engines compute bit-identical doubles through the identical op chain.
K65_ORACLE = """
WITH per_src AS (
  SELECT source,
         CAST(sum(n_chars) AS BIGINT) AS chars_s,
         CASE WHEN CAST(substr(source, 4) AS BIGINT) < 5
              THEN CAST(10 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END AS wt
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(chars_s) AS DOUBLE) AS total_chars,
         sum(wt) AS total_wt
  FROM per_src
), ranked AS (
  SELECT source, chars_s, wt,
         CAST(chars_s AS DOUBLE) / wt AS r_s,
         CAST(sum(chars_s) OVER (ORDER BY CAST(chars_s AS DOUBLE) / wt, source) AS DOUBLE) AS prefix_chars,
         sum(wt) OVER (ORDER BY CAST(chars_s AS DOUBLE) / wt, source) AS prefix_wt
  FROM per_src
), lam AS (
  SELECT r_s,
         CASE WHEN total_wt - prefix_wt = CAST(0 AS DOUBLE)
              THEN CASE WHEN CAST(0.5 AS DOUBLE) * total_chars - prefix_chars
                             >= CAST(0 AS DOUBLE)
                        THEN CAST(1000000000000000000 AS DOUBLE)
                        ELSE CAST(-1000000000000000000 AS DOUBLE) END
              ELSE (CAST(0.5 AS DOUBLE) * total_chars - prefix_chars)
                   / (total_wt - prefix_wt) END AS lam_i
  FROM ranked, tot
), star AS (
  SELECT COALESCE(max(lam_i) FILTER (WHERE r_s <= lam_i),
                  (SELECT CAST(0.5 AS DOUBLE) * total_chars / total_wt FROM tot)
         ) AS lam_star
  FROM lam
), rates AS (
  SELECT source,
         CAST(floor(least(CAST(1 AS DOUBLE),
              lam_star * wt / CAST(chars_s AS DOUBLE)) * 1000000) AS BIGINT) AS thresh
  FROM per_src, star
)
SELECT d.source,
       count(*) AS n_docs_kept,
       CAST(sum(d.n_chars) AS BIGINT) AS chars_kept,
       max(r.thresh) AS thresh
FROM documents d JOIN rates r ON d.source = r.source
WHERE (d.doc_id * 2654435761) % 1000000 < r.thresh
GROUP BY d.source
"""


@register("k65_mixture_waterfill", oracle=K65_ORACLE, group="K")
def k65_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting with EXACT budget attainment (waterfilling):
    where k63 lets an oversubscribed source cap at rate 1 and silently
    under-spends the budget, this finds the waterline λ* with
    Σ min(chars_s, λ*·wt_s) = budget in closed form — one sort of the
    per-source table by capacity ratio, prefix sums, and the largest
    valid breakpoint (the algorithm domain-mixture tuners iterate; the
    sorted-prefix identity makes it single-pass). Here sources 0-4 are
    weighted 10:1 — oversubscribed ~4×, so they CAP (thresh 10⁶) and the
    residual budget redistributes across the other 15 (thresh ≈ ⅓·10⁶);
    k63's naive rule would stop at the cap and deliver less than the
    budget. Everything is a window over the 20-row per-source table —
    metadata-scale — followed by the same broadcast + stateless hash
    filter as k63; inputs are integer-exact so both engines walk an
    identical IEEE op chain to identical thresholds. max(r.thresh) in
    the output is constant per group (thresh is functionally determined
    by source) and exposes the waterline for the oracle to pin."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("chars_s"),
        F.when(
            F.substring("source", 4, 10).cast("bigint") < 5, F.lit(10.0)
        )
        .otherwise(F.lit(1.0))
        .alias("wt"),
    )
    tot = per_src.agg(
        F.sum("chars_s").cast("double").alias("total_chars"),
        F.sum("wt").alias("total_wt"),
    )
    r_s = F.col("chars_s").cast("double") / F.col("wt")
    w = W.orderBy(r_s, "source")
    ranked = per_src.select(
        "source",
        "chars_s",
        "wt",
        r_s.alias("r_s"),
        F.sum("chars_s").over(w).cast("double").alias("prefix_chars"),
        F.sum("wt").over(w).alias("prefix_wt"),
    )
    lam = ranked.crossJoin(F.broadcast(tot)).select(
        "r_s",
        F.when(
            F.col("total_wt") - F.col("prefix_wt") == F.lit(0.0),
            # all-capped breakpoint: valid only if the budget covers the
            # whole corpus; otherwise poison it out of the max()
            F.when(
                F.lit(0.5) * F.col("total_chars") - F.col("prefix_chars")
                >= F.lit(0.0),
                F.lit(1e18),
            ).otherwise(F.lit(-1e18)),
        )
        .otherwise(
            (F.lit(0.5) * F.col("total_chars") - F.col("prefix_chars"))
            / (F.col("total_wt") - F.col("prefix_wt"))
        )
        .alias("lam_i"),
    )
    fallback = tot.select(
        (F.lit(0.5) * F.col("total_chars") / F.col("total_wt")).alias("fb")
    )
    star = (
        lam.agg(
            F.max(F.when(F.col("r_s") <= F.col("lam_i"), F.col("lam_i"))).alias(
                "lam_max"
            )
        )
        .crossJoin(F.broadcast(fallback))
        .select(F.coalesce("lam_max", "fb").alias("lam_star"))
    )
    rates = per_src.crossJoin(F.broadcast(star)).select(
        "source",
        F.floor(
            F.least(
                F.lit(1.0),
                F.col("lam_star") * F.col("wt") / F.col("chars_s").cast("double"),
            )
            * F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("thresh"),
    )
    return (
        d.join(F.broadcast(rates), "source")
        .filter((F.col("doc_id") * F.lit(2654435761)) % 1_000_000 < F.col("thresh"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
            F.max("thresh").alias("thresh"),
        )
    )


# ---------------------------------------------------------------------------
# k66 — balanced shard packing (training-data sharding without hot shards)
# ---------------------------------------------------------------------------

K66_ORACLE = """
WITH ranked AS (
  SELECT doc_id, n_chars,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r
  FROM documents
)
SELECT CAST(CASE WHEN CAST(floor(CAST(r AS DOUBLE) / CAST(16 AS DOUBLE)) AS BIGINT) % 2 = 0
            THEN r % 16 ELSE 15 - (r % 16) END AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total
FROM ranked GROUP BY 1
"""


@register("k66_shard_pack", oracle=K66_ORACLE, group="K")
def k66_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced shard assignment for training-data output: docs ranked by
    size descending, then dealt to 16 shards in SNAKE (boustrophedon)
    order — the classic greedy-balance guarantee (each round of 2x16 deals
    gives every shard one big-half and one small-half doc), so shard
    byte-loads land within a fraction of a percent of each other instead
    of the size-skew a naive hash or round-robin-by-id deal leaves. The
    global rank uses f3's two-phase shape (range repartition on the sort
    key -> 16-row per-partition offset table broadcast back -> local
    row_number), NOT a single-partition window — the deal stays fully
    parallel at 100 TB, and the snake arithmetic is stateless per row.
    All-integer arithmetic: both engines agree bit-for-bit."""
    n_shards = 16
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranged = d.repartitionByRange(
        n_shards, F.col("n_chars").desc(), F.col("doc_id")
    ).withColumn("pid", F.spark_partition_id())
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    wcum = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("n").over(wcum), F.lit(0))
    ).select("pid", "offset")
    wlocal = W.partitionBy("pid").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    r = F.col("offset") + F.row_number().over(wlocal) - 1
    shard = F.when(
        F.floor(r.cast("double") / F.lit(16.0)).cast("long") % 2 == 0,
        r % n_shards,
    ).otherwise(n_shards - 1 - (r % n_shards))
    return (
        ranged.join(F.broadcast(offsets), "pid")
        .select(shard.cast("long").alias("shard"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
        )
    )


# ---------------------------------------------------------------------------
# k67 — DSIR-style importance resampling (hashed-bigram domain matching)
# ---------------------------------------------------------------------------

K67_ORACLE = """
WITH tok AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
), bg AS (
  SELECT doc_id, source,
         substr(md5(ws[i] || ' ' || ws[i+1]), 1, 2) AS b
  FROM tok, LATERAL (SELECT unnest(range(1, len(ws))) AS i) ix
  WHERE len(ws) >= 2
), tgt AS (
  SELECT b, CAST(count(*) AS DOUBLE) AS ct FROM bg
  WHERE source IN ('src0','src1','src2') GROUP BY b
), tgt_tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS t FROM bg WHERE source IN ('src0','src1','src2')
), raw_tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS rr FROM bg
), rawc AS (
  SELECT b, CAST(count(*) AS DOUBLE) AS cr FROM bg GROUP BY b
), lr AS (
  SELECT rawc.b,
         ln((COALESCE(ct, CAST(0 AS DOUBLE)) + CAST(1 AS DOUBLE)) / (t + CAST(256 AS DOUBLE)))
         - ln((cr + CAST(1 AS DOUBLE)) / (rr + CAST(256 AS DOUBLE))) AS logratio
  FROM rawc LEFT JOIN tgt USING (b), tgt_tot, raw_tot
), scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(floor(avg(logratio) * 10000 + CAST(0.5 AS DOUBLE)) AS DOUBLE) / 10000 AS weight
  FROM bg JOIN lr USING (b)
  GROUP BY doc_id
)
SELECT doc_id, n_bigrams, weight,
       CAST(CASE WHEN row_number() OVER (ORDER BY weight DESC, doc_id) <= 100
            THEN 1 ELSE 0 END AS BIGINT) AS selected
FROM scored
"""


@register("k67_dsir_importance", oracle=K67_ORACLE, group="K")
def k67_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023)
    with hashed-bigram features: score every document by how much more
    likely its bigrams are under the TARGET domain's hashed-ngram
    distribution (here sources src0-2) than under the raw pool, then
    select the top-100. Features are bigrams hashed into 256 buckets via
    the first two md5 hex chars — the engine-portable hash (substring
    equality, no integer conversion), so both engines bucket identically;
    both distributions are add-one smoothed. Movement: one explode ->
    bucket counts (two tiny 256-row aggregates, map-side combined), the
    256-row logratio table broadcast back onto the bigram stream, one
    per-doc regroup — the LM 'training' and the scoring pass share the
    same linear scan shape as k38. The selection rank orders by the
    ROUNDED weight with doc_id tiebreak (e9's posture: rank on what you
    output). At 100 TB the bucket table is still 256 rows — DSIR's whole
    point is that domain matching needs only a hashed profile, not a
    model."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    idx = F.when(F.size(ws) >= 2, F.sequence(F.lit(0), F.size(ws) - 2)).otherwise(
        F.array().cast("array<int>")
    )
    bgs = F.transform(
        idx,
        lambda i: F.substring(
            F.md5(F.concat_ws(" ", F.element_at(ws, i + 1), F.element_at(ws, i + 2))),
            1,
            2,
        ),
    )
    bg = d.select("doc_id", "source", F.explode(bgs).alias("b"))
    is_t = F.col("source").isin("src0", "src1", "src2")
    tgt = bg.filter(is_t).groupBy("b").agg(
        F.count(F.lit(1)).cast("double").alias("ct")
    )
    tgt_tot = bg.filter(is_t).agg(F.count(F.lit(1)).cast("double").alias("t"))
    raw_tot = bg.agg(F.count(F.lit(1)).cast("double").alias("rr"))
    rawc = bg.groupBy("b").agg(F.count(F.lit(1)).cast("double").alias("cr"))
    lr = (
        rawc.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tgt_tot))
        .crossJoin(F.broadcast(raw_tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0.0)) + F.lit(1.0))
                    / (F.col("t") + F.lit(256.0))
                )
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("rr") + F.lit(256.0)))
            ).alias("logratio"),
        )
    )
    scored = (
        bg.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            r2(F.avg("logratio"), 4).alias("weight"),
        )
    )
    wsel = W.orderBy(F.col("weight").desc(), "doc_id")
    return scored.select(
        "doc_id",
        "n_bigrams",
        "weight",
        F.when(F.row_number().over(wsel) <= 100, 1)
        .otherwise(0)
        .cast("long")
        .alias("selected"),
    )


# ---------------------------------------------------------------------------
# k68 — Johnson-Lindenstrauss random projection (embedding dim reduction)
# ---------------------------------------------------------------------------

from marasa_spark.ops.similarity import _rh_signs  # noqa: E402

_K68_SIGNS = _rh_signs(8, 64, seed=7)


def _k68_bit_sql(row: list[float]) -> str:
    lits = ", ".join(f"CAST({int(s)} AS DOUBLE)" for s in row)
    return (
        "list_sum(list_transform(range(1, 65), i -> "
        f"CAST(embedding[i] AS DOUBLE) * ([{lits}])[i])) / sqrt(CAST(8 AS DOUBLE))"
    )


K68_ORACLE = "SELECT vec_id,\n       " + ",\n       ".join(
    r2sql(_k68_bit_sql(row), 4) + f" AS p{b}" for b, row in enumerate(_K68_SIGNS)
) + "\nFROM embeddings"


@register("k68_jl_projection", oracle=K68_ORACLE, group="K")
def k68_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64-d -> 8-d: the standard
    pre-shrink before ANN indexing / clustering at corpus scale, using the
    same deterministic Rademacher (±1) planes as the SimHash machinery
    (ops/similarity._rh_signs — seeded sha256, so every executor and both
    engines see the identical matrix as PLAN LITERALS, nothing shipped or
    re-hashed per row) scaled by 1/sqrt(8) to make the projection
    distance-preserving in expectation. One stateless map pass — 8
    sequential zip_with/aggregate folds per row, JVM-side, no shuffle at
    all; the oracle embeds the same 8x64 sign matrix as SQL list literals
    and folds in the same order, so the doubles agree bit-for-bit before
    the 4-decimal round. The JL distortion guarantee (pairwise distances
    within ~1/sqrt(8) relative error w.h.p.) is pinned behaviorally in
    tests/test_jl_projection.py."""
    e = load_table(spark, sf_dir, "embeddings")
    out = [F.col("vec_id")]
    for b, row in enumerate(_K68_SIGNS):
        plane = F.array(*[F.lit(s) for s in row])
        proj = F.aggregate(
            F.zip_with(F.col("embedding"), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) / F.sqrt(F.lit(8.0))
        out.append(r2(proj, 4).alias(f"p{b}"))
    return e.select(*out)


# ---------------------------------------------------------------------------
# k69 — deterministic per-epoch global shuffle (training-order generation)
# ---------------------------------------------------------------------------

K69_ORACLE = """
WITH epochs AS (
  SELECT doc_id, e.epoch,
         (doc_id * (2654435761 + e.epoch * 40503)) % 1000000007 AS h
  FROM documents, (SELECT unnest([0, 1]) AS epoch) e
)
SELECT epoch, doc_id,
       CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS BIGINT) AS pos
FROM epochs
"""


@register("k69_epoch_shuffle", oracle=K69_ORACLE, group="K")
def k69_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle — the training-order
    generator: every epoch gets its own full permutation of the corpus,
    reproducible from (doc_id, epoch) alone (affine hash mod a prime,
    no RNG state to checkpoint, any worker can answer 'what is position
    p of epoch e' independently — how epoch reshuffling works when the
    corpus doesn't fit anywhere). The epoch must vary the MULTIPLIER,
    not add an offset: h = id*P + e*C shifts every hash equally and
    (except at the modulus wraparound) preserves the order — epoch 1
    would replay epoch 0's sequence; the behavioral test caught exactly
    that in the first draft. h = id*(P + e*C) mod prime gives
    decorrelated permutations. Positions come from f3's two-phase
    rank GENERALIZED to partitioned-global ranks: range-repartition on
    (epoch, hash), per-(epoch, partition) counts, running offsets per
    epoch (a window over the tiny counts table), local row_number —
    never a one-task-per-epoch window, which is what a naive
    PARTITION BY epoch ORDER BY hash would plan at 100 TB. Epoch
    decorrelation (almost no doc keeps its position across epochs) is
    pinned behaviorally in tests/test_jl_projection.py."""
    nparts = 16
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    e = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    x = d.crossJoin(F.broadcast(e)).select(
        "doc_id",
        "epoch",
        (
            (F.col("doc_id") * (F.lit(2654435761) + F.col("epoch") * F.lit(40503)))
            % F.lit(1000000007)
        ).alias("h"),
    )
    ranged = x.repartitionByRange(nparts, "epoch", "h", "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("epoch", "pid").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        W.partitionBy("epoch")
        .orderBy("pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("n").over(wcum), F.lit(0))
    ).select("epoch", "pid", "offset")
    wlocal = W.partitionBy("epoch", "pid").orderBy("h", "doc_id")
    return (
        ranged.join(F.broadcast(offsets), ["epoch", "pid"])
        .select(
            "epoch",
            "doc_id",
            (F.col("offset") + F.row_number().over(wlocal)).cast("long").alias("pos"),
        )
    )


# ---------------------------------------------------------------------------
# k70 — fixed-budget sequence batching via distributed prefix sum
# ---------------------------------------------------------------------------

K70_ORACLE = """
WITH ordered AS (
  SELECT doc_id, n_chars,
         (doc_id * 2654435761) % 1000000007 AS h
  FROM documents
), cum AS (
  SELECT doc_id, n_chars,
         CAST(COALESCE(sum(n_chars) OVER (
           ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS chars_before
  FROM ordered
)
SELECT CAST(floor(CAST(chars_before AS DOUBLE) / CAST(20000 AS DOUBLE)) AS BIGINT) AS batch_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       min(doc_id) AS first_doc
FROM cum
GROUP BY batch_id
"""


@register("k70_prefix_sum_batching", oracle=K70_ORACLE, group="K")
def k70_prefix_sum_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget training micro-batches: walk the corpus in its
    deterministic shuffle order (k69's hash) and cut a new batch every
    20k chars — batch_id = floor(running_chars_before / budget), the
    standard sequence-batching rule (every batch lands within one doc of
    the budget, no bin search, reproducible from the order alone). The
    interesting part at 100 TB is the RUNNING SUM: a bare
    ROWS UNBOUNDED PRECEDING window over a global order is one task, so
    this generalizes f3's two-phase rank to a two-phase PREFIX SUM —
    range-repartition on the order key, per-partition char totals, an
    exclusive running offset over the tiny per-partition table broadcast
    back, then offset + local exclusive cumsum inside each partition.
    Same movement budget as a global sort; the only single-partition
    object is the 16-row offset table. Batch-size discipline is pinned
    behaviorally in tests/test_jl_projection.py."""
    nparts = 16
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(1000000007)).alias("h"),
    )
    ranged = d.repartitionByRange(nparts, "h", "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    psums = ranged.groupBy("pid").agg(F.sum("n_chars").alias("s"))
    wcum = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = psums.withColumn(
        "offset", F.coalesce(F.sum("s").over(wcum), F.lit(0))
    ).select("pid", "offset")
    wlocal = (
        W.partitionBy("pid")
        .orderBy("h", "doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = ranged.join(F.broadcast(offsets), "pid").withColumn(
        "chars_before",
        (
            F.col("offset") + F.coalesce(F.sum("n_chars").over(wlocal), F.lit(0))
        ).cast("long"),
    )
    batch = F.floor(F.col("chars_before").cast("double") / F.lit(20000.0)).cast(
        "long"
    )
    return (
        cum.select(batch.alias("batch_id"), "n_chars", "doc_id")
        .groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# k71 — bigram LM perplexity scoring (the step up from k38's unigram score)
# ---------------------------------------------------------------------------

K71_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), big AS (
  SELECT doc_id, list_extract(t, i) AS w1, list_extract(t, i + 1) AS w2
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
), bc AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 FROM big GROUP BY w1, w2
), cc AS (
  SELECT w1, CAST(count(*) AS DOUBLE) AS c1 FROM big GROUP BY w1
), v AS (
  SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vsz
  FROM (SELECT unnest(t) AS w FROM toks)
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       {r2sql("avg(ln((c12 + 1) / (c1 + vsz)))", 4)} AS avg_logprob
FROM big JOIN bc USING (w1, w2) JOIN cc USING (w1) CROSS JOIN v
GROUP BY doc_id
"""


@register("k71_bigram_lm_logprob", oracle=K71_ORACLE, group="K")
def k71_bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained BIGRAM LM quality score with add-one smoothing: each
    document's mean log P(w_i | w_{i-1}) under the corpus's own bigram
    counts — the next rung of the perplexity-filter ladder above k38's
    unigram score (CCNet-style filters use exactly this family; a bigram
    model separates fluent text from bag-of-words soup that unigram
    frequency cannot). Bigrams are built JVM-side with zero data movement
    (zip_with over two slices of the split array — no lag window, no
    self-join), so the whole job is: one shuffle to count (w1,w2), one on
    w1 for context totals, the V scalar broadcast, and the per-doc regroup.
    At 100 TB the count tables are vocabulary-bounded (dictionary-sized
    against the corpus) so both re-joins broadcast, leaving the per-doc
    regroup as the only full-data shuffle; smoothing keeps every unseen
    transition finite so the score is total."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    big = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                " (a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c12"))
    cc = big.groupBy("w1").agg(F.count(F.lit(1)).cast("double").alias("c1"))
    v = toks.select(F.explode("t").alias("w")).agg(
        F.count_distinct(F.col("w")).cast("double").alias("vsz")
    )
    return (
        big.join(bc, ["w1", "w2"])
        .join(cc, ["w1"])
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            r2(F.avg(F.log((F.col("c12") + 1) / (F.col("c1") + F.col("vsz")))), 4).alias(
                "avg_logprob"
            ),
        )
    )


# ---------------------------------------------------------------------------
# k72 — filter-cascade attrition audit (the funnel table of a cleaning run)
# ---------------------------------------------------------------------------

K72_ORACLE = f"""
WITH per_doc AS (
  SELECT CASE
           WHEN n_chars < 100 THEN 1
           WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 2
           WHEN len(string_split(text, ' ')) < 20
             OR len(string_split(text, ' ')) > 90 THEN 3
           WHEN CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) < CAST(5 AS DOUBLE)
             OR CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) > CAST(6 AS DOUBLE) THEN 4
           ELSE 0
         END AS stage_failed
  FROM documents
), drops AS (
  SELECT stage_failed, CAST(count(*) AS BIGINT) AS dropped
  FROM per_doc WHERE stage_failed > 0 GROUP BY stage_failed
), total AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM per_doc
), stages AS (
  SELECT * FROM (VALUES (1, 'min_length'), (2, 'lang_allowlist'),
                        (3, 'token_count'), (4, 'mean_word_len')) AS s(stage_idx, stage_name)
)
SELECT stage_idx, stage_name,
       CAST(n_total - COALESCE(sum(dropped) OVER (ORDER BY stage_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS docs_in,
       CAST(COALESCE(dropped, 0) AS BIGINT) AS dropped,
       CAST(n_total - COALESCE(sum(dropped) OVER (ORDER BY stage_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS docs_out,
       {r2sql("COALESCE(dropped, 0) / CAST(n_total - COALESCE(sum(dropped) OVER (ORDER BY stage_idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)", 4)} AS drop_share
FROM stages LEFT JOIN drops ON stage_idx = stage_failed CROSS JOIN total
"""


@register("k72_filter_cascade", oracle=K72_ORACLE, group="K")
def k72_filter_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attrition funnel of an ORDERED quality-filter battery (the table
    every dataset-cleaning report leads with): four stages — minimum
    length, language allowlist, token-count band, mean-word-length band —
    applied in sequence, reporting per stage how many documents entered,
    were dropped THERE (first failing stage wins, as in a real cascade
    where later filters never see earlier drops), survived, and the drop
    share. One linear scan computes each doc's first-failing stage, one
    4-group aggregate counts them, and the cumulative window runs over the
    4-row stage table — so the funnel costs a single pass at any scale and
    the 100 TB shape is scan + tiny-aggregate, no shuffle of document
    payloads. Thresholds are calibrated to the corpus so every stage's
    drop branch is live at all three SFs (the constant-column audit's
    standing requirement)."""
    ntok = F.size(F.split("text", " "))
    mwl = F.col("n_chars").cast("double") / ntok.cast("double")
    stage_failed = (
        F.when(F.col("n_chars") < 100, 1)
        .when(~F.col("lang").isin("en", "de", "fr", "es"), 2)
        .when((ntok < 20) | (ntok > 90), 3)
        .when((mwl < 5.0) | (mwl > 6.0), 4)
        .otherwise(0)
    )
    d = load_table(spark, sf_dir, "documents")
    per = d.select(stage_failed.alias("stage_failed"))
    drops = per.filter("stage_failed > 0").groupBy("stage_failed").agg(
        F.count(F.lit(1)).alias("dropped")
    )
    total = per.agg(F.count(F.lit(1)).alias("n_total"))
    stages = spark.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("stage_idx"), F.lit(name).alias("stage_name")
                    )
                    for i, name in [
                        (1, "min_length"),
                        (2, "lang_allowlist"),
                        (3, "token_count"),
                        (4, "mean_word_len"),
                    ]
                ]
            )
        ).alias("s")
    ).select("s.*")
    before = W.orderBy("stage_idx").rowsBetween(W.unboundedPreceding, -1)
    through = W.orderBy("stage_idx").rowsBetween(W.unboundedPreceding, 0)
    dropped = F.coalesce(F.col("dropped"), F.lit(0))
    docs_in = F.col("n_total") - F.coalesce(F.sum(dropped).over(before), F.lit(0))
    docs_out = F.col("n_total") - F.coalesce(F.sum(dropped).over(through), F.lit(0))
    return (
        stages.join(drops, stages.stage_idx == drops.stage_failed, "left")
        .crossJoin(F.broadcast(total))
        .select(
            "stage_idx",
            "stage_name",
            docs_in.cast("long").alias("docs_in"),
            dropped.cast("long").alias("dropped"),
            docs_out.cast("long").alias("docs_out"),
            r2(dropped.cast("double") / docs_in.cast("double"), 4).alias("drop_share"),
        )
    )


# ---------------------------------------------------------------------------
# k73/k74 — BPE tokenizer training + encoding as pure relational algebra
# ---------------------------------------------------------------------------

_BPE_ITERS = 10


def _bpe_vocab_ctes(iters: int) -> str:
    """The shared DuckDB CTE chain: word-frequency table -> char-split
    symbol strings -> `iters` greedy merge rounds. Symbol strings use a
    TWO-space separator and one leading/trailing pad space, so the merge
    `replace(s, ' p1  p2 ', ' p1p2 ')` consumes one space from each
    neighboring gap: adjacent pairs in a run stay matchable (left-to-right
    non-overlapping replace == BPE's greedy-left merge order), and the
    two-space discipline is restored by the replacement's own padding."""
    sql = """WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
), wf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM tok WHERE w <> '' GROUP BY w
), v0 AS (
  SELECT w, freq, '  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s FROM wf
)"""
    for t in range(1, iters + 1):
        sql += f""", m{t} AS (
  SELECT {t} AS it, p1, p2, cnt FROM (
    SELECT p1, p2, CAST(sum(freq) AS BIGINT) AS cnt,
           row_number() OVER (ORDER BY sum(freq) DESC, p1, p2) AS rk
    FROM (
      SELECT freq, list_extract(syms, i) AS p1, list_extract(syms, i + 1) AS p2
      FROM (SELECT freq, string_split(trim(s), '  ') AS syms FROM v{t - 1}),
           unnest(generate_series(1, len(syms) - 1)) AS u(i)
    ) GROUP BY p1, p2
  ) WHERE rk = 1
), v{t} AS (
  SELECT w, freq,
         replace(s, ' ' || p1 || '  ' || p2 || ' ', ' ' || p1 || p2 || ' ') AS s
  FROM v{t - 1} CROSS JOIN m{t}
)"""
    return sql


K73_ORACLE = (
    _bpe_vocab_ctes(_BPE_ITERS)
    + "\nSELECT it, p1, p2, cnt FROM ("
    + " UNION ALL ".join(f"SELECT * FROM m{t}" for t in range(1, _BPE_ITERS + 1))
    + ")"
)


def _bpe_train(spark: SparkSession, sf_dir: str, iters: int):
    """Spark twin of the CTE chain: returns (merges_df, final_vocab_df)."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = wf.selectExpr(
        "w", "freq", "'  ' || regexp_replace(w, '(.)', '$1  ') AS s"
    )
    merges = []
    for t in range(1, iters + 1):
        pairs = (
            vocab.selectExpr("freq", "split(trim(s), '  ') AS syms")
            .selectExpr(
                "freq",
                "explode(zip_with(slice(syms, 1, size(syms) - 1),"
                " slice(syms, 2, size(syms) - 1),"
                " (a, b) -> struct(a AS p1, b AS p2))) AS bg",
            )
            .select("freq", "bg.p1", "bg.p2")
        )
        top1 = (
            pairs.groupBy("p1", "p2")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "p1", "p2")
            .limit(1)
            .select(F.lit(t).alias("it"), "p1", "p2", "cnt")
        )
        try:
            top1 = top1.localCheckpoint(eager=True)
        except Exception:
            top1.cache().count()
        if not top1.take(1):
            # No bigrams left (tiny or fully-merged vocab): without this
            # guard the crossJoin against an EMPTY top1 would silently
            # empty `vocab` for every remaining round and the op would
            # return zero rows — and the unrolled-CTE oracle degrades the
            # same way, so parity would HIDE the failure. Stop loudly-by-
            # construction instead: merges found so far are the result.
            break
        merges.append(top1)
        vocab = vocab.crossJoin(F.broadcast(top1.select("p1", "p2"))).selectExpr(
            "w",
            "freq",
            "replace(s, ' ' || p1 || '  ' || p2 || ' ', ' ' || p1 || p2 || ' ') AS s",
        )
        try:
            vocab = vocab.localCheckpoint(eager=True)
        except Exception:
            vocab.cache().count()
    if not merges:
        raise ValueError("_bpe_train: corpus produced no symbol bigrams at all")
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out, vocab


@register("k73_bpe_train", oracle=K73_ORACLE, group="K")
def k73_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING as pure relational algebra: ten greedy
    merge rounds over the corpus's word-frequency table — each round
    counts symbol bigrams (weighted by word frequency), takes the global
    top pair under a total tiebreak (count DESC, then pair lexicographic,
    via orderBy+limit — no single-partition window), and rewrites every
    word's symbol string with one `replace`. The two-space separator
    encoding makes SQL's left-to-right non-overlapping replace implement
    BPE's greedy-left merge exactly (see _bpe_vocab_ctes), so the DuckDB
    oracle is the SAME recurrence unrolled into CTEs and the output —
    (iteration, left symbol, right symbol, pair count) — is integer-exact
    with no float anywhere. Scale shape: everything runs over the word-
    TYPE table (Heaps-law bounded, millions of rows at 100 TB, not the
    corpus), each round is one bigram-count shuffle plus a 1-row
    broadcast; the corpus itself is read once for the frequency table.
    End-of-word markers are omitted (merges stay within words) — the
    convention is documented rather than modeled."""
    merges, _ = _bpe_train(spark, sf_dir, _BPE_ITERS)
    return merges


K74_ORACLE = (
    _bpe_vocab_ctes(_BPE_ITERS)
    + f""", doc_tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), wmap AS (
  SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS ntok_w,
         CAST(len(w) AS BIGINT) AS nchar_w
  FROM v{_BPE_ITERS}
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(ntok_w) AS BIGINT) AS n_tokens,
       {r2sql("sum(nchar_w) / CAST(sum(ntok_w) AS DOUBLE)", 4)} AS chars_per_token
FROM doc_tok JOIN wmap USING (w)
WHERE w <> ''
GROUP BY doc_id"""
)


@register("k74_bpe_encode", oracle=K74_ORACLE, group="K")
def k74_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the k73-trained vocabulary: token counts and
    compression ratio (chars per token) per document — the fertility
    metric tokenizer teams track per language/source. The trained vocab
    collapses to a word -> token-count map (word-type-table sized, so it
    BROADCASTS at any corpus scale); encoding is then one stateless join
    on the exploded word stream plus the per-doc regroup — the corpus
    never carries symbol strings, only its words. Shares k73's training
    chain verbatim (same CTEs in the oracle, same _bpe_train twin), so
    the two registrations cross-check each other: a drift in the merge
    order would break BOTH hashes in correlated ways."""
    _, vocab = _bpe_train(spark, sf_dir, _BPE_ITERS)
    wmap = vocab.selectExpr(
        "w",
        "CAST(size(split(trim(s), '  ')) AS BIGINT) AS ntok_w",
        "CAST(length(w) AS BIGINT) AS nchar_w",
    )
    d = load_table(spark, sf_dir, "documents")
    doc_tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter("w <> ''")
    return (
        doc_tok.join(F.broadcast(wmap), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("ntok_w").alias("n_tokens"),
            r2(
                F.sum("nchar_w").cast("double") / F.sum("ntok_w").cast("double"), 4
            ).alias("chars_per_token"),
        )
    )


# ---------------------------------------------------------------------------
# k75 — BM25 ranked retrieval (the lexical-search scoring standard)
# ---------------------------------------------------------------------------

_BM25_TERMS = ("window", "hash", "merge")
_BM25_K1 = "CAST(1.2 AS DOUBLE)"
_BM25_B = "CAST(0.75 AS DOUBLE)"
_BM25_TOPK = 15

K75_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok WHERE token <> '' GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
  GROUP BY doc_id, token
), dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
), scored AS (
  SELECT doc_id,
         sum(ln((CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))
             * (tf * ({_BM25_K1} + CAST(1 AS DOUBLE)))
             / (tf + {_BM25_K1} * (CAST(1 AS DOUBLE) - {_BM25_B} + {_BM25_B} * dl / avgdl))) AS score,
         CAST(count(*) AS BIGINT) AS n_terms_matched
  FROM tf JOIN dfreq USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, {r2sql("score", 4)} AS bm25, n_terms_matched
FROM scored
ORDER BY {r2sql("score", 4)} DESC, doc_id
LIMIT {_BM25_TOPK}
"""


@register("k75_bm25_topk", oracle=K75_ORACLE, group="K")
def k75_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: Robertson/Spärck-Jones IDF with the +1
    smoothing (Lucene's formulation), k1=1.2 b=0.75, for a fixed 3-term
    query — the lexical-search scoring standard and the retrieval half of
    every RAG data pipeline. Plan: the exploded token stream is filtered
    to the QUERY TERMS BEFORE the (doc, term) shuffle (prune-before-
    shuffle: at 100 TB the tf exchange carries only query-term hits,
    thousands of rows, not the corpus), doc lengths are one groupBy over
    the same stream, df/avgdl/N are tiny aggregates broadcast back, and
    the top-k is orderBy+limit — TakeOrderedAndProject's per-partition
    k-heap, never a single-partition rank window. The ORDER BY key is
    the ROUNDED score with doc_id as tiebreak: rounding to the 4-decimal
    grain absorbs cross-engine ln()/summation-order ulp jitter, and any
    ties rounding creates break on doc_id identically in both engines."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dl = (
        tok.filter("token <> ''")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dl"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(1.2), F.lit(0.75)
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    term_score = idf * (F.col("tf") * (k1 + F.lit(1.0))) / (
        F.col("tf")
        + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(term_score).alias("score"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
    )
    return (
        scored.select(
            "doc_id", r2(F.col("score"), 4).alias("bm25"), "n_terms_matched"
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# k76 — lexical-diversity quality filter (entropy + type-token ratio)
# ---------------------------------------------------------------------------

K76_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), wc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM tok WHERE w <> '' GROUP BY doc_id, w
), per AS (
  SELECT doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_types,
         {r2sql("ln(CAST(sum(c) AS DOUBLE)) - sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE)", 4)} AS word_entropy,
         {r2sql("CAST(count(*) AS DOUBLE) / sum(c)", 4)} AS ttr
  FROM wc GROUP BY doc_id
)
SELECT doc_id, n_words, n_types, word_entropy, ttr,
       (word_entropy >= CAST(3.1 AS DOUBLE) AND ttr >= CAST(0.45 AS DOUBLE)) AS keep
FROM per
"""


@register("k76_lexical_diversity", oracle=K76_ORACLE, group="K")
def k76_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-diversity quality filter: per-doc word-distribution
    Shannon entropy and type-token ratio, with a keep flag — the
    diversity axis of Gopher/CCNet-style quality rules that k13/k24's
    surface heuristics (length, punctuation, stopwords) don't measure
    (a doc that repeats one sentence passes length checks but craters
    here). Entropy uses the shuffle-free identity H = ln(n) - Σc·ln(c)/n
    so one (doc, word) count and one per-doc regroup compute everything —
    no per-doc window, no softmax-style two-pass. The keep flag compares
    the ROUNDED values against the thresholds (rounded values are
    cross-engine identical, so the boolean cannot diverge; thresholds
    3.1/0.45 split this corpus ~50/50 — verified non-constant). At
    100 TB both shuffles key on doc/word — no skew beyond stopwords,
    which the c-count partial aggregation absorbs map-side."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").cast("double")
    per = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_types"),
        r2(F.log(n) - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / n, 4).alias(
            "word_entropy"
        ),
        r2(F.count(F.lit(1)).cast("double") / F.sum("c"), 4).alias("ttr"),
    )
    return per.withColumn(
        "keep",
        (F.col("word_entropy") >= F.lit(3.1)) & (F.col("ttr") >= F.lit(0.45)),
    )


# ---------------------------------------------------------------------------
# k77 — blocked inverted index (posting lists in bounded blocks)
# ---------------------------------------------------------------------------

_K77_BLOCK = 64

K77_ORACLE = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token,
       CAST(doc_id // {_K77_BLOCK} AS BIGINT) AS block_id,
       list_sort(list(doc_id)) AS postings,
       CAST(count(*) AS BIGINT) AS n_in_block
FROM tok WHERE token <> ''
GROUP BY token, doc_id // {_K77_BLOCK}
"""


@register("k77_inverted_index", oracle=K77_ORACLE, group="K")
def k77_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked inverted index: (term, doc-block) -> sorted posting array —
    the physical structure under k75's BM25 and every lexical search
    engine, built the way real ones shard it: postings live in FIXED-SIZE
    BLOCKS (doc_id // 64), so no aggregation group ever exceeds the block
    size. That bound is the whole design: a naive term -> collect_list
    puts a stopword's entire corpus-wide posting list in ONE task (the
    unbounded-array scale-killer), while here the heaviest possible group
    is 64 doc_ids regardless of corpus size, and block-local arrays
    concatenate into full postings by reading blocks in order. One
    distinct (doc, term) pass, one (term, block) shuffle; sort_array
    makes the collected order deterministic for the hash compare."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter("token <> ''")
        .distinct()
    )
    return (
        tok.withColumn(
            # Integer division, not a float round-trip (double division is
            # exact only below 2^53). Caveat: Spark `div` truncates toward
            # zero while DuckDB `//` FLOORS, so the two agree only because
            # doc_id >= 0 here; negative ids would need pmod/floor on the
            # Spark side to keep the oracle in step.
            "block_id", F.expr(f"doc_id div {_K77_BLOCK}")
        )
        .groupBy("token", "block_id")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("postings"),
            F.count(F.lit(1)).alias("n_in_block"),
        )
    )


# ---------------------------------------------------------------------------
# k78 — deterministic MLM masking prep (masked input + ordered targets)
# ---------------------------------------------------------------------------

_K78_RULE = (
    "substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)), 1, 1) = '0'"
)

K78_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS tok
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents),
       unnest(generate_series(1, len(toks))) AS u(i)
), marked AS (
  SELECT doc_id, pos, tok, {_K78_RULE} AS masked FROM tok
)
SELECT doc_id,
       string_agg(CASE WHEN masked THEN '<MASK>' ELSE tok END, ' ' ORDER BY pos) AS masked_text,
       coalesce(string_agg(tok, ' ' ORDER BY pos) FILTER (masked), '') AS targets,
       CAST(count(*) FILTER (masked) AS BIGINT) AS n_masked,
       {r2sql("count(*) FILTER (masked) / CAST(count(*) AS DOUBLE)", 4)} AS mask_ratio
FROM marked
GROUP BY doc_id
"""


@register("k78_mlm_masking", oracle=K78_ORACLE, group="K")
def k78_mlm_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MLM (BERT-objective) masking prep: each token masks
    iff the first hex digit of md5(doc_id:pos) is '0' — a 1/16 rate that
    is REPRODUCIBLE across engines, runs, and partitionings (the m1
    hash-sampling rule applied at token granularity; df.sample-style RNG
    would make training data unauditable). Emits the masked input text,
    the position-ordered target string, and the realized mask ratio —
    the actual tensors-minus-tokenizer a masked-LM data loader consumes.
    Order discipline: Spark rebuilds both strings via array_sort over
    (pos, token) structs then array_join (collect_list order is
    partitioning-dependent — NEVER string-concat straight off a
    collect), matching the oracle's ORDER BY pos string_agg; docs whose
    mask set is empty pin the ''-vs-NULL edge (coalesce in DuckDB,
    array_join's natural '' in Spark). One explode + one doc-keyed
    regroup; the hash rule is stateless scan-side arithmetic."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.posexplode(F.filter(F.split("text", " "), lambda t: t != "")).alias(
                "pos", "tok"
            ),
        )
        .withColumn(
            "masked",
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("doc_id").cast("string"),
                                F.col("pos").cast("string"))
                ),
                1,
                1,
            )
            == "0",
        )
    )
    out_tok = F.when(F.col("masked"), F.lit("<MASK>")).otherwise(F.col("tok"))
    per = tok.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), out_tok.alias("t")))
        ).alias("all_toks"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("masked"), F.struct(F.col("pos"), F.col("tok").alias("t")))
            )
        ).alias("tgt_toks"),
        F.sum(F.col("masked").cast("long")).alias("n_masked"),
        r2(
            F.sum(F.col("masked").cast("long")) / F.count(F.lit(1)).cast("double"), 4
        ).alias("mask_ratio"),
    )
    join_t = lambda c: F.array_join(F.transform(c, lambda s: s["t"]), " ")  # noqa: E731
    return per.select(
        "doc_id",
        join_t(F.col("all_toks")).alias("masked_text"),
        join_t(F.col("tgt_toks")).alias("targets"),
        "n_masked",
        "mask_ratio",
    )


# ---------------------------------------------------------------------------
# k79 — length-bucketed batching: padding-waste accounting
# ---------------------------------------------------------------------------

_K79_BUCKET = 16

K79_ORACLE = f"""
WITH lens AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tok
  FROM documents
), bucketed AS (
  SELECT CAST((n_tok - 1) // {_K79_BUCKET} AS BIGINT) AS bucket, n_tok FROM lens
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(n_tok) AS BIGINT) AS max_len,
       CAST(sum(n_tok) AS BIGINT) AS sum_len,
       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste,
       {r2sql("(count(*) * max(n_tok) - sum(n_tok)) / CAST(count(*) * max(n_tok) AS DOUBLE)", 4)} AS waste_ratio
FROM bucketed
GROUP BY bucket
"""


@register("k79_length_bucketing", oracle=K79_ORACLE, group="K")
def k79_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching audit: group documents into 16-token
    length buckets and account the PADDING WASTE of batching each bucket
    to its max length — the number a training-infra team watches when
    picking bucket boundaries (naive batching pads everything to the
    global max; bucketing caps waste at bucket_width-1 per doc, and
    waste_ratio quantifies the win per bucket). Pure arithmetic on
    per-doc token counts: one stateless length projection + one groupBy
    on the bucket id — the audit costs a single aggregation at any
    corpus size, and the bucket id is the natural repartition key for
    the downstream packing job (k36/k70 consume exactly this layout).
    All-integer outputs except the ratio (same-group integer arithmetic,
    rounded)."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).cast("long").alias(
            "n_tok"
        )
    )
    b = lens.withColumn(
        "bucket", ((F.col("n_tok") - 1) / F.lit(_K79_BUCKET)).cast("long")
    )
    waste = F.count(F.lit(1)) * F.max("n_tok") - F.sum("n_tok")
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tok").alias("max_len"),
        F.sum("n_tok").alias("sum_len"),
        waste.cast("long").alias("pad_waste"),
        r2(
            waste.cast("double") / (F.count(F.lit(1)) * F.max("n_tok")).cast("double"),
            4,
        ).alias("waste_ratio"),
    )


# ---------------------------------------------------------------------------
# k80 — incremental NEAR-dup: daily batch vs a PERSISTED MinHash band index
# (VERDICT r6 item 4 — the lift k33's docstring promised: k9's banding
# applied batch-vs-index instead of self-join)
# ---------------------------------------------------------------------------

K80_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 2000
), batch AS (
  SELECT doc_id + 50000 AS new_id, text FROM corpus WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 60000 AS new_id, text || ' zq' FROM corpus WHERE doc_id % 7 = 1
), ctok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM corpus
), btok AS (
  SELECT DISTINCT new_id, unnest(string_split(text, ' ')) AS w FROM batch
), ccnt AS (
  SELECT doc_id, count(*) AS n FROM ctok GROUP BY doc_id
), bcnt AS (
  SELECT new_id, count(*) AS n FROM btok GROUP BY new_id
), inter AS (
  SELECT b.new_id, c.doc_id AS dup_of, count(*) AS i
  FROM btok b JOIN ctok c ON b.w = c.w
  GROUP BY b.new_id, c.doc_id
)
SELECT inter.new_id AS new_id, inter.dup_of AS dup_of,
       CAST(i AS DOUBLE) / (CAST(bn.n + cn.n AS DOUBLE) - CAST(i AS DOUBLE)) AS jaccard
FROM inter
JOIN bcnt bn ON inter.new_id = bn.new_id
JOIN ccnt cn ON inter.dup_of = cn.doc_id
WHERE CAST(i AS DOUBLE) / (CAST(bn.n + cn.n AS DOUBLE) - CAST(i AS DOUBLE)) >= 0.9
"""

_K80_HASHES = 32
_K80_BANDS = 16  # 2 rows/band: P(miss | J>=0.9) per pair = (1-J^2)^16 <= 4e-13


def _k80_banded(df: DataFrame, id_col: str, toks_col: str) -> DataFrame:
    """(id, band, bucket) rows — identical banding expression on both the
    index build and the probe side (bucket hashes must align bit-exactly)."""
    rpb = _K80_HASHES // _K80_BANDS
    sig = df.withColumn("sig", D.minhash_signature(F.col(toks_col), _K80_HASHES))
    return sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice("sig", b * rpb + 1, rpb)).alias("bucket"),
                    )
                    for b in range(_K80_BANDS)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


@register("k80_incremental_near_dup", oracle=K80_ORACLE, group="K")
def k80_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup against a PERSISTED band-bucket index — k33's
    exact-hash batch-vs-index pattern lifted to k9's MinHash-LSH bands.

    Offline phase (the nightly index job, run here as setup): tokenize the
    corpus once, persist (a) the (dup_of, band, bucket) band index and (b)
    the tokenized-corpus store used for candidate verification. Probe
    phase — the plan this op RETURNS — reads ONLY those persisted files
    plus the staged ingest batch: it bands the batch, equi-joins
    (band, bucket) against the index (candidates carry ~20 B/row, the k9
    payload-free shape), dedups candidate pairs, then verifies each with
    exact token-set Jaccard from the persisted token store. The corpus
    parquet is NEVER re-scanned at probe time — pinned by
    tests/test_plan_audit.py (no documents.parquet in the probe plan).
    That asymmetry is the daily-ingest story at 100 TB: index build is
    paid once per corpus, each day's batch costs O(batch) + candidate
    verifies.

    Correctness vs the all-pairs oracle: both sides compute exact Jaccard
    >= 0.9 on (batch x corpus); the LSH layer only proposes candidates, so
    the outputs coincide exactly when no true pair misses every band. With
    16 bands of 2 rows, P(miss) <= (1 - 0.9^2)^16 ~ 4e-13 per pair, and the
    xxhash64 banding is deterministic per dataset — hash-green at all three
    SFs is a verified fact of the fixture, the same pinning convention as
    k58/k59's recall floor."""
    scratch = fresh_scratch("k80", sf_dir)
    corpus = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)

    # -- offline: build + persist the index (corpus scanned exactly once) --
    ctoks = corpus.select(
        F.col("doc_id").alias("dup_of"), D.tokens(F.col("text")).alias("ctoks")
    )
    _k80_banded(ctoks, "dup_of", "ctoks").write.parquet(f"{scratch}/bands")
    # the persisted verify store is HASHED (k9-playbook, round 11): 8 B per
    # token + the string-distinct count — smaller on disk than the string
    # arrays it replaces, and the probe's intersect runs on the primitive-
    # specialized long path. n_c is the STRING-distinct size, so the
    # probe's union (n_b + n_c - i) is the exact oracle expression.
    ctoks.select(
        "dup_of",
        F.size("ctoks").alias("n_c"),
        F.transform("ctoks", lambda x: F.xxhash64(x)).alias("th_c"),
    ).write.parquet(f"{scratch}/toks")
    dups = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 50000).alias("new_id"), "text"
    )
    near = corpus.filter(F.col("doc_id") % 7 == 1).select(
        (F.col("doc_id") + 60000).alias("new_id"),
        F.concat("text", F.lit(" zq")).alias("text"),
    )
    dups.unionAll(near).write.parquet(f"{scratch}/batch")

    # -- probe: persisted index + staged batch ONLY ------------------------
    bands_idx = spark.read.parquet(f"{scratch}/bands")
    tok_idx = spark.read.parquet(f"{scratch}/toks")
    bt = spark.read.parquet(f"{scratch}/batch").select(
        "new_id", D.tokens(F.col("text")).alias("btoks")
    )
    bth = bt.select(
        "new_id",
        F.size("btoks").alias("n_b"),
        F.transform("btoks", lambda x: F.xxhash64(x)).alias("th_b"),
    )
    cand = (
        _k80_banded(bt, "new_id", "btoks")
        .join(bands_idx, ["band", "bucket"])
        .select("new_id", "dup_of")
        .dropDuplicates(["new_id", "dup_of"])
    )
    # size-compatibility prune BEFORE array attach (k9's prefilter): the
    # n-only joins read just the int column off the parquet store (column
    # pruning — no array IO), and J >= 0.9 requires min >= 0.9*max, with
    # the 1e-9 slack keeping the prune output-neutral (the exact verify
    # below still decides).
    sized = (
        cand.join(tok_idx.select("dup_of", "n_c"), "dup_of")
        .join(bth.select("new_id", "n_b"), "new_id")
        .filter(
            F.least("n_b", "n_c").cast("double")
            >= F.lit(0.9 - 1e-9) * F.greatest("n_b", "n_c").cast("double")
        )
    )
    pairs = sized.join(tok_idx.select("dup_of", "th_c"), "dup_of").join(
        bth.select("new_id", "th_b"), "new_id"
    )
    # intersect pinned behind the nondeterministic no-op: evaluated once
    # per candidate, never substituted into the threshold filter (k9's pin)
    pairs = pairs.withColumn(
        "inter",
        F.when(
            F.spark_partition_id() >= 0,
            F.size(F.array_intersect("th_b", "th_c")).cast("double"),
        ).otherwise(F.lit(-1.0)),
    )
    union = (F.col("n_b") + F.col("n_c")).cast("double") - F.col("inter")
    jac = F.col("inter") / union
    return (
        pairs.filter(jac >= 0.9)
        .withColumn("jaccard", jac)
        .select("new_id", "dup_of", "jaccard")
    )


# ---------------------------------------------------------------------------
# k81 — real PNG decode end-to-end: synthesized filtered PNGs → reference
# decoder → pixel stats, hash-checked against the closed-form oracle
# (VERDICT r6 item 7: the codec slot now has one WORKING codec)
# ---------------------------------------------------------------------------

K81_ORACLE = """
WITH dims AS (
  SELECT doc_id, 4 + doc_id % 29 AS w, 3 + doc_id % 17 AS h
  FROM documents WHERE doc_id < 400
), px AS (
  SELECT doc_id, w, h, (doc_id*31 + y*17 + x*7) % 256 AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, w, h
"""


@register("k81_png_pixel_stats", oracle=K81_ORACLE, group="K")
def k81_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level media decode with a codec that ACTUALLY RUNS: each doc
    synthesizes a grayscale-8 PNG whose scanlines carry real PNG filters
    (cycling None/Sub/Up/Average/Paeth) and whose pixels follow a closed
    form in (doc_id, x, y); the payload travels as a binary column; the
    reference decoder (ops/multimodal.py decode_png_pixels — stdlib zlib +
    the five RFC 2083 unfilter algorithms) recovers the pixels inside an
    Arrow-batched mapInPandas, and the emitted per-image statistics must
    hash-match DuckDB evaluating the closed form directly — a true
    encode→container→decode round trip, not a header peek. Scale shape:
    synthesis and decode are per-row Python over Arrow batches (the
    correct posture for CPU-heavy codecs — parallelism follows the id
    repartition, payload bytes never hit the driver); the stats are
    decoder output, no extra shuffle. Color/interlaced PNGs and other
    containers still raise NotImplementedError — the declared slot where
    PIL/ffmpeg plug in (not installable offline)."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.multimodal import png_pixel_stats, synthesize_png_filtered

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            out.append(
                synthesize_png_filtered(
                    4 + i % 29,
                    3 + i % 17,
                    lambda x, y, i=i: (i * 31 + y * 17 + x * 7) % 256,
                )
            )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return png_pixel_stats(media)


# ---------------------------------------------------------------------------
# k82 — leakage-safe train/val/test split: duplicate groups never straddle
# a split boundary
# ---------------------------------------------------------------------------

K82_ORACLE = """
WITH groups AS (
  SELECT md5(text) AS content_hash, min(doc_id) AS rep
  FROM documents GROUP BY md5(text)
), assigned AS (
  SELECT content_hash, rep,
         CASE
           WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
           WHEN substring(md5(CAST(rep AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
           ELSE 'test'
         END AS split
  FROM groups
)
SELECT d.doc_id AS doc_id, a.rep AS group_rep, a.split AS split
FROM documents d JOIN assigned a ON md5(d.text) = a.content_hash
"""


@register("k82_leakage_safe_split", oracle=K82_ORACLE, group="K")
def k82_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that can never leak a duplicate across
    the boundary: docs group by content hash (k4's exact-dup shuffle), the
    GROUP — not the doc — draws its split from a hash of its
    representative id, and every member inherits it. Random row-level
    splits put byte-identical train/test twins in 100 TB corpora (dup rate
    is never zero); splitting on the dup-group key is the fix, and the
    same two-join shape lifts to near-dup cluster ids (k25/k49 connected
    components) when semantic leakage matters too. Deterministic and
    engine-portable: the split comes from the first hex char of
    md5(rep) — 12/16 train, 2/16 val, 2/16 test — string comparison, no
    modulo-on-signed-hash pitfalls. Shuffle budget: one hash groupBy +
    one join back on the hash key (co-partitioned by Catalyst); the split
    table is derived, not stored, so re-sharding the corpus never churns
    assignments."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select("doc_id", F.md5("text").alias("content_hash"))
    hexc = F.substring(F.md5(F.col("rep").cast("string")), 1, 1)
    assigned = (
        hashed.groupBy("content_hash")
        .agg(F.min("doc_id").alias("rep"))
        .withColumn(
            "split",
            F.when(hexc <= "b", "train").when(hexc <= "d", "val").otherwise("test"),
        )
    )
    return hashed.join(assigned, "content_hash").select(
        "doc_id", F.col("rep").alias("group_rep"), "split"
    )


# ---------------------------------------------------------------------------
# k83 — truecolor + Adam7-interlaced PNG decode (VERDICT r7 #4): the widened
# reference codec, hash-checked against the closed-form pixel oracle
# ---------------------------------------------------------------------------

K83_ORACLE = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 23 AS w, 2 + doc_id % 13 AS h,
         doc_id % 2 AS interlaced
  FROM documents WHERE doc_id < 300
), px AS (
  SELECT doc_id, w, h, interlaced,
         (doc_id*31 + y*17 + x*7 + c*11) % 256 AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2,
       LATERAL (SELECT unnest(range(0, 3)) AS c) t3
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(interlaced AS INT) AS interlaced,
       CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, w, h, interlaced
"""


@register("k83_png_truecolor_interlaced", oracle=K83_ORACLE, group="K")
def k83_png_truecolor_interlaced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k81's round trip through the WIDENED codec (VERDICT r7 #4): each doc
    synthesizes a truecolor (RGB8) PNG — even doc_ids sequential, odd ones
    Adam7-interlaced, so both rasters decode in one query — with real
    cycling scanline filters and closed-form channel values; the reference
    decoder (ops/multimodal.py decode_png_pixels: per-pass unfilter with
    bpp-aware left references, then the seven-pass re-raster) recovers the
    interleaved samples inside Arrow-batched mapInPandas, and the per-image
    stats must hash-match DuckDB evaluating the closed form over
    (x, y, channel). Same scale posture as k81: per-row Python over Arrow
    batches, payloads never on the driver, stats are decoder output with
    no extra shuffle. The NotImplementedError slot now covers only
    palette/16-bit/alpha PNG and externally-codec'd formats (JPEG/audio),
    which genuinely need PIL/ffmpeg."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.multimodal import png_pixel_stats, synthesize_png_filtered

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            out.append(
                synthesize_png_filtered(
                    3 + i % 23,
                    2 + i % 13,
                    lambda x, y, i=i: (
                        (i * 31 + y * 17 + x * 7) % 256,
                        (i * 31 + y * 17 + x * 7 + 11) % 256,
                        (i * 31 + y * 17 + x * 7 + 22) % 256,
                    ),
                    color_type=2,
                    interlace=i % 2,
                )
            )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    # interlaced is a function of doc_id — re-derive post-decode, no join
    return png_pixel_stats(media).select(
        "doc_id", "width", "height",
        (F.col("doc_id") % 2).cast("int").alias("interlaced"),
        "n_px", "px_sum", "px_min", "px_max",
    )


# ---------------------------------------------------------------------------
# k84 — full-matrix PNG decode (palette / gray+alpha / RGBA / 16-bit):
# round-8 completion of the reference codec, hash-checked per color type
# ---------------------------------------------------------------------------

K84_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         3 + doc_id % 19 AS w, 2 + doc_id % 11 AS h,
         doc_id % 4 AS mode,
         CASE doc_id % 4 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 1 END AS ch,
         4 + doc_id % 12 AS n_pal
  FROM documents WHERE doc_id < 240
), px AS (
  SELECT doc_id, w, h, mode,
    CASE mode
      WHEN 0 THEN CASE c
        WHEN 0 THEN (7 * ((x + 3*y + doc_id) % n_pal) + doc_id) % 256
        WHEN 1 THEN (11 * ((x + 3*y + doc_id) % n_pal) + 3) % 256
        ELSE (13 * ((x + 3*y + doc_id) % n_pal) + 7) % 256 END
      WHEN 3 THEN (doc_id*523 + y*291 + x*97) % 65536
      ELSE (doc_id*31 + y*17 + x*7 + c*5) % 256
    END AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2,
       LATERAL (SELECT unnest(range(0, ch)) AS c) t3
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(mode AS INT) AS mode,
       CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, w, h, mode
"""


@register("k84_png_colortype_matrix", oracle=K84_ORACLE, group="K")
def k84_png_colortype_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 codec completion, driver-checkable: each doc synthesizes
    a PNG in one of the four color modes beyond k81/k83's gray/RGB — palette
    (PLTE index expansion to RGB), gray+alpha, RGBA, and 16-bit grayscale
    (2-byte samples, big-endian recombination) — alternating sequential /
    Adam7 rasters INDEPENDENTLY of the mode ((doc_id // 4) % 2), with the
    full cycling filter set. The reference decoder recovers the samples
    inside Arrow-batched mapInPandas and the per-image stats hash-match
    DuckDB evaluating the closed form over (x, y, channel) — palette docs
    are checked against the EXPANDED palette bytes, 16-bit docs against
    0..65535 sample values. Same scale posture as k81: payloads never on
    the driver, stats are decoder output, no extra shuffle. What remains
    NotImplemented in the codec is exactly the external-library surface:
    sub-byte depths, JPEG entropy decode, audio."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.multimodal import (
        png_pixel_stats,
        synthesize_png_filtered,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            w, h = 3 + i % 19, 2 + i % 11
            mode, il = i % 4, (i // 4) % 2
            if mode == 0:
                n_pal = 4 + i % 12
                pal = [
                    ((7 * j + i) % 256, (11 * j + 3) % 256, (13 * j + 7) % 256)
                    for j in range(n_pal)
                ]
                blob = synthesize_png_filtered(
                    w, h, lambda x, y, i=i, n=n_pal: (x + 3 * y + i) % n,
                    3, il, 8, pal,
                )
            elif mode == 1:
                blob = synthesize_png_filtered(
                    w, h,
                    lambda x, y, i=i: tuple(
                        (i * 31 + y * 17 + x * 7 + c * 5) % 256 for c in range(2)
                    ),
                    4, il, 8,
                )
            elif mode == 2:
                blob = synthesize_png_filtered(
                    w, h,
                    lambda x, y, i=i: tuple(
                        (i * 31 + y * 17 + x * 7 + c * 5) % 256 for c in range(4)
                    ),
                    6, il, 8,
                )
            else:
                blob = synthesize_png_filtered(
                    w, h,
                    lambda x, y, i=i: (i * 523 + y * 291 + x * 97) % 65536,
                    0, il, 16,
                )
            out.append(blob)
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return png_pixel_stats(media).select(
        "doc_id", "width", "height",
        (F.col("doc_id") % 4).cast("int").alias("mode"),
        "n_px", "px_sum", "px_min", "px_max",
    )


# ---------------------------------------------------------------------------
# k85 — real WAV/PCM audio decode end-to-end: synthesized PCM clips →
# reference decoder → sample stats, hash-checked against the closed form
# (narrows the audio codec slot: uncompressed PCM needs no external lib)
# ---------------------------------------------------------------------------

K85_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         1 + doc_id % 2 AS ch,
         50 + doc_id % 97 AS frames,
         CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
         8000 * (1 + doc_id % 3) AS rate
  FROM documents WHERE doc_id < 400
), s AS (
  SELECT doc_id, ch, frames, bits, rate,
    CASE WHEN bits = 8 THEN (doc_id*37 + f*13 + c*5) % 256
         ELSE ((doc_id*37 + f*13 + c*5) % 4096) - 2048 END AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, frames)) AS f) t1,
       LATERAL (SELECT unnest(range(0, ch)) AS c) t2
)
SELECT doc_id, CAST(ch AS INT) AS channels, CAST(bits AS INT) AS bits,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(v) AS BIGINT) AS sample_sum,
       CAST(min(v) AS INT) AS sample_min, CAST(max(v) AS INT) AS sample_max,
       CAST((frames * 1000000) // rate AS BIGINT) AS duration_us
FROM s GROUP BY doc_id, ch, bits, frames, rate
"""


@register("k85_wav_sample_stats", oracle=K85_ORACLE, group="K")
def k85_wav_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-sample decode with a codec that ACTUALLY RUNS — the audio twin
    of k81's PNG round trip. Each doc synthesizes a RIFF/WAVE container
    carrying real integer PCM (alternating mono/stereo, 8-/16-bit widths,
    three sample rates) whose samples follow a closed form in
    (doc_id, frame, channel); the payload travels as a binary column; the
    reference decoder (ops/multimodal.py decode_wav_samples — stdlib struct
    over the RIFF chunk walk) recovers the interleaved samples inside an
    Arrow-batched mapInPandas, and the per-clip statistics (count / sum /
    min / max plus exact integer duration_us = frames * 1e6 // rate, floor
    semantics identical in Spark and DuckDB for non-negative operands) must
    hash-match DuckDB evaluating the closed form directly. WAV PCM is
    uncompressed, so this codec is complete offline — the
    NotImplementedError slot now covers only genuinely-external decode
    (JPEG entropy, compressed/float audio). Scale shape: synthesis and
    decode are per-row Python over Arrow batches (the correct posture for
    per-item codecs — parallelism follows the id partitioning, payload
    bytes never hit the driver); the stats are decoder output, no extra
    shuffle."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.multimodal import synthesize_wav_pcm, wav_sample_stats

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            ch = 1 + i % 2
            frames = 50 + i % 97
            bits = 8 if i % 3 == 0 else 16
            rate = 8000 * (1 + i % 3)
            if bits == 8:
                samples = [
                    (i * 37 + f * 13 + c * 5) % 256
                    for f in range(frames)
                    for c in range(ch)
                ]
            else:
                samples = [
                    ((i * 37 + f * 13 + c * 5) % 4096) - 2048
                    for f in range(frames)
                    for c in range(ch)
                ]
            out.append(synthesize_wav_pcm(samples, ch, rate, bits))
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return wav_sample_stats(media)


# ---------------------------------------------------------------------------
# k86 — sub-byte PNG decode (1/2/4-bit gray + palette): the last PNG depths,
# completing the full RFC 2083 (color type, depth, interlace) matrix
# ---------------------------------------------------------------------------

K86_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         3 + doc_id % 19 AS w, 2 + doc_id % 11 AS h,
         CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END AS bits,
         doc_id % 2 AS pal,
         CASE doc_id % 2 WHEN 0 THEN 1 ELSE 3 END AS ch
  FROM documents WHERE doc_id < 240
), px AS (
  SELECT doc_id, w, h, bits, pal,
    CASE WHEN pal = 0 THEN (doc_id*31 + y*17 + x*7) % (1 << bits)
         ELSE CASE c
           WHEN 0 THEN (7 * ((x + 3*y + doc_id) % (1 << bits)) + doc_id) % 256
           WHEN 1 THEN (11 * ((x + 3*y + doc_id) % (1 << bits)) + 3) % 256
           ELSE (13 * ((x + 3*y + doc_id) % (1 << bits)) + 7) % 256 END
    END AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2,
       LATERAL (SELECT unnest(range(0, ch)) AS c) t3
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(bits AS INT) AS bits,
       CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, w, h, bits, pal
"""


@register("k86_png_subbyte_depths", oracle=K86_ORACLE, group="K")
def k86_png_subbyte_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final PNG depths (this round): 1-, 2- and 4-bit grayscale and
    palette images, where several samples pack into each scanline byte
    (MSB-first, byte-boundary pad per row) and the RFC 2083 filters run
    over the PACKED bytes at bpp = 1 — so the decoder must unfilter at the
    packed stride and only then unpack samples, per interlace pass. Docs
    alternate gray/palette, cycle the three sub-byte depths, and alternate
    sequential/Adam7 independently; per-image stats (gray: raw 0..2^d-1
    samples; palette: PLTE-expanded RGB bytes) hash-match DuckDB
    evaluating the closed form. With k81/k83/k84 this closes the whole
    legal (color type, depth, interlace) space of RFC 2083 — the
    NotImplementedError slot is now exactly the external-library surface
    (JPEG entropy decode, compressed audio) plus ancillary-chunk
    interpretation. Scale posture unchanged from k81: Arrow-batched
    per-row codec work, payloads never on the driver, no extra shuffle."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.multimodal import (
        png_pixel_stats,
        synthesize_png_filtered,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            w, h = 3 + i % 19, 2 + i % 11
            bits = (1, 2, 4)[i % 3]
            il = (i // 2) % 2
            n = 1 << bits
            if i % 2 == 0:
                blob = synthesize_png_filtered(
                    w, h, lambda x, y, i=i, n=n: (i * 31 + y * 17 + x * 7) % n,
                    0, il, bits,
                )
            else:
                pal = [
                    ((7 * j + i) % 256, (11 * j + 3) % 256, (13 * j + 7) % 256)
                    for j in range(n)
                ]
                blob = synthesize_png_filtered(
                    w, h, lambda x, y, i=i, n=n: (x + 3 * y + i) % n,
                    3, il, bits, pal,
                )
            out.append(blob)
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    bits_col = (
        F.when(F.col("doc_id") % 3 == 0, 1)
        .when(F.col("doc_id") % 3 == 1, 2)
        .otherwise(4)
    )
    return png_pixel_stats(media).select(
        "doc_id", "width", "height",
        bits_col.cast("int").alias("bits"),
        "n_px", "px_sum", "px_min", "px_max",
    )


# ---------------------------------------------------------------------------
# k87 — baseline JPEG grayscale decode: real entropy decoding (Huffman + DC
# prediction + AC run-length + IDCT) in pure stdlib, hash-checked via
# block-constant fixtures whose decode is exact
# ---------------------------------------------------------------------------

K87_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         8*(1 + doc_id % 4) - doc_id % 5 AS w,
         8*(1 + doc_id % 3) - doc_id % 7 AS h
  FROM documents WHERE doc_id < 300
), px AS (
  SELECT doc_id, w, h,
         (doc_id*41 + (y // 8)*23 + (x // 8)*11) % 256 AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, w, h
"""


@register("k87_jpeg_gray_decode", oracle=K87_ORACLE, group="K")
def k87_jpeg_gray_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG entropy decode with a codec that ACTUALLY RUNS — the
    format the codec slot said needed an external library now has a
    pure-stdlib reference implementation for its grayscale half
    (ops/jpeg.py): marker/DQT/DHT/SOF0 parsing, canonical Huffman
    reconstruction, the scan's DC-prediction + AC run-length/EOB decode
    with 0xFF00 unstuffing, dequantization, zigzag, separable 2-D IDCT,
    and crop. Hash-oracle strategy: DCT is lossy in general, so the
    driver-checkable fixtures are BLOCK-CONSTANT images — a constant 8x8
    block with an all-ones quant table holds exactly one DC coefficient
    (8*(v-128)) and decodes EXACTLY, so DuckDB can evaluate the decoded
    pixels in closed form (dims deliberately non-multiples of 8 to pin the
    crop path). The general entropy paths the constant fixtures can't
    reach — AC runs, ZRL, mid-block EOB, nontrivial quant tables, DRI
    restart markers — are pinned by a hypothesis/property suite against an
    independent IDCT (tests). Color JPEG (chroma upsampling, YCbCr) and
    progressive scans remain the declared external-codec slot. Scale
    posture matches k81: Arrow-batched per-row codec work inside
    mapInPandas, payloads never on the driver, stats are decoder output,
    no extra shuffle."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.jpeg import jpeg_pixel_stats, synthesize_jpeg_gray

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            w = 8 * (1 + i % 4) - i % 5
            h = 8 * (1 + i % 3) - i % 7
            out.append(
                synthesize_jpeg_gray(
                    w, h, lambda bx, by, i=i: (i * 41 + by * 23 + bx * 11) % 256
                )
            )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return jpeg_pixel_stats(media)


# ---------------------------------------------------------------------------
# k88 — windowed audio features over decoded PCM: the feature-extraction
# stage after the codec (energy + zero-crossing activity per frame window)
# ---------------------------------------------------------------------------

K88_ORACLE = """
WITH dims AS (
  SELECT doc_id, 200 + doc_id % 101 AS frames
  FROM documents WHERE doc_id < 300
), s AS (
  SELECT doc_id, f, f // 25 AS win_id,
         ((doc_id*37 + f*13) % 4096) - 2048 AS v
  FROM dims, LATERAL (SELECT unnest(range(0, frames)) AS f) t
), feat AS (
  SELECT doc_id, win_id, v,
         lag(v) OVER (PARTITION BY doc_id, win_id ORDER BY f) AS pv
  FROM s
)
SELECT doc_id, CAST(win_id AS INT) AS win_id,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
       CAST(max(abs(v)) AS INT) AS peak,
       CAST(count(*) FILTER (WHERE pv IS NOT NULL
            AND ((pv < 0 AND v > 0) OR (pv > 0 AND v < 0))) AS BIGINT) AS n_crossings
FROM feat GROUP BY doc_id, win_id
"""


@register("k88_audio_frame_features", oracle=K88_ORACLE, group="K")
def k88_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stage AFTER the codec in an audio pipeline: each clip decodes
    through the k85 PCM reference decoder and emits per-25-frame-window
    features — integer energy (sum |amplitude|), peak, and strict zero
    crossings (opposite nonzero signs between consecutive samples,
    windows independent) — the primitives under voice-activity detection
    and silence trimming. Everything is integer arithmetic, so the
    feature rows hash-match DuckDB evaluating the closed-form samples
    with the same window grouping (lag-within-window for crossings).
    Scale posture: decode + featurize happen in ONE mapInPandas pass
    (payloads never re-read, never on the driver), and the output is
    window-domain-sized — a 10^6x reduction from sample rows, which is
    what makes downstream SQL over audio features tractable at 100 TB."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.multimodal import synthesize_wav_pcm, wav_frame_features

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            frames = 200 + i % 101
            samples = [((i * 37 + f * 13) % 4096) - 2048 for f in range(frames)]
            out.append(synthesize_wav_pcm(samples, 1, 8000, 16))
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return wav_frame_features(media)


# ---------------------------------------------------------------------------
# k89 — animated-GIF decode with FRAME SAMPLING: real LZW decompression
# (dynamic code sizes, CLEAR resets, KwKwK) plus the video-pipeline
# posture of skipping unsampled frames at the container level
# ---------------------------------------------------------------------------

K89_ORACLE = """
WITH dims AS (
  SELECT doc_id, 3 + doc_id % 13 AS w, 2 + doc_id % 9 AS h,
         2 + doc_id % 5 AS nf, 4 + doc_id % 13 AS ncol
  FROM documents WHERE doc_id < 240
), px AS (
  SELECT doc_id, w, h, f,
    CASE c
      WHEN 0 THEN (7 * ((x + 3*y + 5*f + doc_id) % ncol) + doc_id) % 256
      WHEN 1 THEN (11 * ((x + 3*y + 5*f + doc_id) % ncol) + 3) % 256
      ELSE (13 * ((x + 3*y + 5*f + doc_id) % ncol) + 7) % 256
    END AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, nf)) AS f) t0,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2,
       LATERAL (SELECT unnest(range(0, 3)) AS c) t3
  WHERE f % 2 = 0
)
SELECT doc_id, CAST(f AS INT) AS frame,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(count(*) AS BIGINT) AS n_px, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, f, w, h
"""


@register("k89_gif_frame_sample", oracle=K89_ORACLE, group="K")
def k89_gif_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video stage of the multimodal pipeline, with a codec that
    ACTUALLY RUNS: each doc synthesizes an animated GIF (real LZW
    compression — the dictionary genuinely grows, CLEAR resets on table
    fill) of 2-6 full-screen frames; the reference decoder
    (ops/multimodal.py decode_gif_frames) walks the block stream and
    decodes EVERY SECOND frame — unsampled frames are skipped at the
    sub-block level without inflating their LZW data, which is the cheap-
    seek posture frame sampling needs when a 100 TB corpus holds hours of
    animation per row. Sampled frames expand through the global color
    table and their per-frame RGB stats hash-match DuckDB evaluating the
    closed form over (frame, x, y, channel) restricted to even frames.
    LZW decode is complete (dynamic code sizes to 12 bits, KwKwK);
    interlaced/partial-screen frames are the declared ffmpeg slot.
    Scale posture unchanged: Arrow-batched per-row codec work, payloads
    never on the driver, output frames-sized."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.multimodal import gif_frame_stats, synthesize_gif_animated

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            w, h = 3 + i % 13, 2 + i % 9
            nf, ncol = 2 + i % 5, 4 + i % 13
            pal = [
                ((7 * j + i) % 256, (11 * j + 3) % 256, (13 * j + 7) % 256)
                for j in range(ncol)
            ]
            out.append(
                synthesize_gif_animated(
                    w, h, nf,
                    lambda x, y, f, i=i, n=ncol: (x + 3 * y + 5 * f + i) % n,
                    pal,
                )
            )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return gif_frame_stats(media, every=2)


# ---------------------------------------------------------------------------
# k90 — baseline COLOR JPEG decode (4:4:4): multi-component interleaved
# entropy decode + integer YCbCr->RGB, hash-checked via block-constant
# fixtures whose per-plane decode is exact
# ---------------------------------------------------------------------------

K90_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         8*(1 + doc_id % 3) - doc_id % 5 AS w,
         8*(1 + doc_id % 2) - doc_id % 7 AS h
  FROM documents WHERE doc_id < 240
), px AS (
  SELECT doc_id, w, h,
         (doc_id*41 + (y // 8)*23 + (x // 8)*11) % 256 AS cy,
         (doc_id*29 + (y // 8)*13 + (x // 8)*7) % 256 AS cb,
         (doc_id*17 + (y // 8)*19 + (x // 8)*5) % 256 AS cr
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2
), rgb AS (
  SELECT doc_id, w, h,
    greatest(0, least(255, CAST(floor(CAST(cy AS DOUBLE)
      + CAST(1.402 AS DOUBLE) * (cr - 128) + CAST(0.5 AS DOUBLE)) AS INT))) AS r,
    greatest(0, least(255, CAST(floor(CAST(cy AS DOUBLE)
      - CAST(0.344136 AS DOUBLE) * (cb - 128)
      - CAST(0.714136 AS DOUBLE) * (cr - 128) + CAST(0.5 AS DOUBLE)) AS INT))) AS g,
    greatest(0, least(255, CAST(floor(CAST(cy AS DOUBLE)
      + CAST(1.772 AS DOUBLE) * (cb - 128) + CAST(0.5 AS DOUBLE)) AS INT))) AS b
  FROM px
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 * count(*) AS BIGINT) AS n_px,
       CAST(sum(r + g + b) AS BIGINT) AS px_sum,
       CAST(min(least(r, g, b)) AS INT) AS px_min,
       CAST(max(greatest(r, g, b)) AS INT) AS px_max
FROM rgb GROUP BY doc_id, w, h
"""


@register("k90_jpeg_color_decode", oracle=K90_ORACLE, group="K")
def k90_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline COLOR JPEG (4:4:4) decode — the multi-component half of
    k87: the interleaved scan carries one 8x8 block per component per
    MCU (Y via the Annex K luminance Huffman pair, Cb/Cr via the
    chrominance pair, three independent DC predictors), per-plane
    dequant + IDCT, then integer YCbCr->RGB (JFIF constants, round
    half-up, clamp). Block-constant Y/Cb/Cr fixtures decode exactly, and
    the SQL oracle mirrors the conversion with the SAME float64
    expression shape (DOUBLE-cast literals per the house rule — DuckDB
    would otherwise parse 1.402 as DECIMAL and change the arithmetic),
    so the decoded RGB stats hash-match. What remains the external-codec
    slot is exactly libjpeg's value-add: chroma-SUBSAMPLED MCU geometry
    (fractional sampling + upsampling filters) and progressive scans.
    Scale posture matches k81/k87: Arrow-batched per-row codec work,
    payloads never on the driver, no extra shuffle."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.jpeg import jpeg_pixel_stats, synthesize_jpeg_color

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            w = 8 * (1 + i % 3) - i % 5
            h = 8 * (1 + i % 2) - i % 7
            out.append(
                synthesize_jpeg_color(
                    w, h,
                    lambda bx, by, i=i: (
                        (i * 41 + by * 23 + bx * 11) % 256,
                        (i * 29 + by * 13 + bx * 7) % 256,
                        (i * 17 + by * 19 + bx * 5) % 256,
                    ),
                )
            )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return jpeg_pixel_stats(media)


# ---------------------------------------------------------------------------
# k91 — baseline COLOR JPEG decode at 4:2:0 chroma subsampling: the real
# 2x2 MCU geometry (four Y blocks + Cb + Cr per MCU) with nearest-neighbor
# chroma upsampling, hash-checked via MCU-constant fixtures whose decode
# is exact (round 8 verdict #4 — the jpeg slot narrows to progressive/
# arithmetic/filtered-upsample)
# ---------------------------------------------------------------------------

K91_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         16*(1 + doc_id % 2) - doc_id % 5 AS w,
         16*(1 + doc_id % 3) - doc_id % 7 AS h
  FROM documents WHERE doc_id < 240
), px AS (
  SELECT doc_id, w, h,
         (doc_id*41 + (y // 16)*23 + (x // 16)*11) % 256 AS cy,
         (doc_id*29 + (y // 16)*13 + (x // 16)*7) % 256 AS cb,
         (doc_id*17 + (y // 16)*19 + (x // 16)*5) % 256 AS cr
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2
), rgb AS (
  SELECT doc_id, w, h,
    greatest(0, least(255, CAST(floor(CAST(cy AS DOUBLE)
      + CAST(1.402 AS DOUBLE) * (cr - 128) + CAST(0.5 AS DOUBLE)) AS INT))) AS r,
    greatest(0, least(255, CAST(floor(CAST(cy AS DOUBLE)
      - CAST(0.344136 AS DOUBLE) * (cb - 128)
      - CAST(0.714136 AS DOUBLE) * (cr - 128) + CAST(0.5 AS DOUBLE)) AS INT))) AS g,
    greatest(0, least(255, CAST(floor(CAST(cy AS DOUBLE)
      + CAST(1.772 AS DOUBLE) * (cb - 128) + CAST(0.5 AS DOUBLE)) AS INT))) AS b
  FROM px
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(3 * count(*) AS BIGINT) AS n_px,
       CAST(sum(r + g + b) AS BIGINT) AS px_sum,
       CAST(min(least(r, g, b)) AS INT) AS px_min,
       CAST(max(greatest(r, g, b)) AS INT) AS px_max
FROM rgb GROUP BY doc_id, w, h
"""


@register("k91_jpeg_420_decode", oracle=K91_ORACLE, group="K")
def k91_jpeg_420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline 4:2:0 chroma-subsampled COLOR JPEG decode — the MCU
    geometry half of the jpeg external-codec slot brought in-engine: each
    MCU interleaves FOUR Y blocks (2x2) then Cb then Cr, the chroma
    planes decode at quarter resolution, and upsampling is
    nearest-neighbor index replication (exact on MCU-constant fixtures;
    fractional/edge-filtered upsampling remains libjpeg's slot along
    with progressive and arithmetic coding). Fixture dims straddle
    non-multiple-of-16 sizes so the padded-MCU crop path is exercised;
    the SQL oracle mirrors the integer YCbCr->RGB conversion with the
    same float64 expression shape as k90's.
    Scale posture matches k87/k90: Arrow-batched per-row codec work in
    jpeg_pixel_stats' mapInPandas, payloads never on the driver, no
    extra shuffle (parallelism follows the id partitioning; a repartition
    was tried and REJECTED — on 240 tiny rows the worker round-trips cost
    more than the decode, which rides the decoder's flat-block fast path
    here)."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.jpeg import jpeg_pixel_stats, synthesize_jpeg_color_420

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 240)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            w = 16 * (1 + i % 2) - i % 5
            h = 16 * (1 + i % 3) - i % 7
            out.append(
                synthesize_jpeg_color_420(
                    w, h,
                    lambda mx, my, i=i: (
                        (i * 41 + my * 23 + mx * 11) % 256,
                        (i * 29 + my * 13 + mx * 7) % 256,
                        (i * 17 + my * 19 + mx * 5) % 256,
                    ),
                )
            )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    return jpeg_pixel_stats(media)


# ---------------------------------------------------------------------------
# k92 — G.711 mu-law/A-law audio decode: logarithmic telephony companding
# expands with pure CCITT integer arithmetic (no codec library), so the
# audio external-codec slot narrows to genuinely-compressed (MP3/AAC/FLAC)
# and IEEE-float formats. The oracle re-derives the expansion per byte in
# SQL (power-of-two CASE ladders instead of shifts; XOR 0x55 spelled as
# arithmetic bit flips), so decoded linear samples hash-match end to end.
# ---------------------------------------------------------------------------

_K92_T_U = """
CASE seg_u WHEN 0 THEN m_u WHEN 1 THEN m_u*2 WHEN 2 THEN m_u*4
           WHEN 3 THEN m_u*8 WHEN 4 THEN m_u*16 WHEN 5 THEN m_u*32
           WHEN 6 THEN m_u*64 ELSE m_u*128 END
"""

_K92_T_A = """
CASE seg_a WHEN 0 THEN m_a*16 + 8 WHEN 1 THEN m_a*16 + 264
           ELSE (m_a*16 + 264) * (CASE seg_a WHEN 2 THEN 2 WHEN 3 THEN 4
                 WHEN 4 THEN 8 WHEN 5 THEN 16 WHEN 6 THEN 32 ELSE 64 END)
END
"""

K92_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, 1 + doc_id % 2 AS ch, 60 + doc_id % 83 AS frames,
         doc_id % 2 AS is_alaw
  FROM documents WHERE doc_id < 400
), codes AS (
  SELECT doc_id, ch, frames, is_alaw,
         (doc_id*31 + f*7 + c*3) % 256 AS b
  FROM dims,
       LATERAL (SELECT unnest(range(0, frames)) AS f) t1,
       LATERAL (SELECT unnest(range(0, ch)) AS c) t2
), bits AS (
  SELECT *,
         (255 - b) % 16 * 8 + 132 AS m_u,
         ((255 - b) // 16) % 8 AS seg_u,
         255 - b AS u,
         b + (1 - 2*((b // 1) % 2))*1 + (1 - 2*((b // 4) % 2))*4
           + (1 - 2*((b // 16) % 2))*16 + (1 - 2*((b // 64) % 2))*64 AS a
  FROM codes
), seg2 AS (
  SELECT *, a % 16 AS m_a, (a // 16) % 8 AS seg_a FROM bits
), expanded AS (
  SELECT doc_id, ch, frames, is_alaw,
    CASE WHEN is_alaw = 0
         THEN CASE WHEN u >= 128 THEN 132 - ({_K92_T_U})
                   ELSE ({_K92_T_U}) - 132 END
         ELSE CASE WHEN a >= 128 THEN ({_K92_T_A})
                   ELSE -({_K92_T_A}) END
    END AS v
  FROM seg2
)
SELECT doc_id, CAST(ch AS INT) AS channels,
       CAST(CASE WHEN is_alaw = 1 THEN 6 ELSE 7 END AS INT) AS fmt,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(v) AS BIGINT) AS sample_sum,
       CAST(min(v) AS INT) AS sample_min, CAST(max(v) AS INT) AS sample_max,
       CAST((frames * 1000000) // 8000 AS BIGINT) AS duration_us
FROM expanded GROUP BY doc_id, ch, frames, is_alaw
"""


@register("k92_wav_g711_stats", oracle=K92_ORACLE, group="K")
def k92_wav_g711_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G.711 companded-audio decode end-to-end — the telephony half of the
    audio slot brought in-engine (k85 covers linear PCM): each doc
    synthesizes a RIFF/WAVE container under format tag 7 (mu-law, even
    ids) or 6 (A-law, odd ids) whose companded bytes follow a closed form
    in (doc_id, frame, channel); the reference decoder expands them to
    16-bit linear with the CCITT integer arithmetic (verified byte-for-
    byte against audioop on all 256 codes in tests), and the per-clip
    stats hash-match DuckDB re-deriving the expansion formula directly —
    including the XOR-0x55 A-law toggle spelled as arithmetic bit flips.
    Scale posture matches k85: Arrow-batched per-row codec work, payloads
    never on the driver, no extra shuffle."""
    from pyspark.sql.types import BinaryType, IntegerType, LongType, StructField, StructType

    from marasa_spark.ops.multimodal import decode_wav_samples, synthesize_wav_g711

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            ch = 1 + i % 2
            frames = 60 + i % 83
            codes = [
                (i * 31 + f * 7 + c * 3) % 256
                for f in range(frames)
                for c in range(ch)
            ]
            out.append(
                synthesize_wav_g711(codes, ch, 8000, "alaw" if i % 2 else "ulaw")
            )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("channels", IntegerType()),
            StructField("fmt", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("sample_sum", LongType()),
            StructField("sample_min", IntegerType()),
            StructField("sample_max", IntegerType()),
            StructField("duration_us", LongType()),
        ]
    )

    def stats(batches):
        import struct as _struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                ch, rate, bits, samples = decode_wav_samples(blob)
                # format tag from the container (fmt chunk starts at 20 in
                # these fixtures: RIFF(12) + 'fmt '(4) + size(4))
                fmt_tag = _struct.unpack("<H", blob[20:22])[0]
                frames = len(samples) // ch
                rows.append(
                    (
                        int(doc_id),
                        ch,
                        fmt_tag,
                        len(samples),
                        sum(samples),
                        min(samples),
                        max(samples),
                        frames * 1_000_000 // rate,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "channels", "fmt", "n_samples",
                    "sample_sum", "sample_min", "sample_max", "duration_us",
                ],
            )

    return media.mapInPandas(stats, schema)


# ---------------------------------------------------------------------------
# k93 — ISO-BMFF (MP4) container walk: the video-metadata half of the
# multimodal slot brought in-engine. A 100 TB media pipeline filters on
# duration/track layout/sample counts BEFORE paying for any frame decode;
# the box skeleton (ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/stbl/stsz) is
# pure struct arithmetic — only codec payload decode (H.26x/AAC in mdat)
# genuinely needs external libraries and stays the declared slot.
# ---------------------------------------------------------------------------

K93_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
         1000 * (1 + doc_id % 3) AS timescale,
         900 * (doc_id % 50 + 10) AS duration,
         1 + doc_id % 3 AS n_tracks
  FROM documents WHERE doc_id < 300
), tracks AS (
  SELECT doc_id, brand, timescale, duration, n_tracks, t,
         CASE WHEN t = 0 THEN 1 ELSE 0 END AS is_video,
         100 + (doc_id*7 + t*13) % 200 AS n_samples
  FROM dims, LATERAL (SELECT unnest(range(0, n_tracks)) AS t) tt
)
SELECT doc_id, brand,
       CAST((duration * 1000) // timescale AS BIGINT) AS duration_ms,
       CAST(n_tracks AS INT) AS n_tracks,
       CAST(sum(is_video) AS INT) AS n_video,
       CAST(count(*) - sum(is_video) AS INT) AS n_audio,
       CAST(sum(n_samples) AS BIGINT) AS total_samples
FROM tracks GROUP BY doc_id, brand, duration, timescale, n_tracks
"""


@register("k93_mp4_box_stats", oracle=K93_ORACLE, group="K")
def k93_mp4_box_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4/ISO-BMFF container metadata extraction end-to-end: each doc
    synthesizes a minimal valid box tree (ftyp + moov with mvhd and 1-3
    trak subtrees, video first then audio, per-track stsz sample counts
    following a closed form in (doc_id, track)); the payload travels as a
    binary column; the reference walker (ops/multimodal.parse_mp4_boxes —
    size/type iteration with 64-bit largesize support, recursion into the
    standard containers) recovers brand, movie duration, track layout and
    sample counts inside Arrow-batched mapInPandas, and the per-file
    summary hash-matches DuckDB evaluating the closed form. duration_ms
    is exact integer arithmetic (duration * 1000 // timescale). Frame
    DECODE (mdat codec payload) is the declared external slot — this op
    is the filter a media pipeline runs before paying for it.
    Scale posture matches k41/k85: per-row header work, payloads never on
    the driver, no extra shuffle."""
    from pyspark.sql.types import BinaryType, IntegerType, LongType, StringType, StructField, StructType

    from marasa_spark.ops.multimodal import parse_mp4_boxes, synthesize_mp4

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            brand = b"isom" if i % 2 == 0 else b"mp42"
            timescale = 1000 * (1 + i % 3)
            duration = 900 * (i % 50 + 10)
            n_tracks = 1 + i % 3
            tracks = [
                (
                    b"vide" if t == 0 else b"soun",
                    t + 1,
                    30000 if t == 0 else 48000,
                    100 + (i * 7 + t * 13) % 200,
                )
                for t in range(n_tracks)
            ]
            out.append(synthesize_mp4(brand, timescale, duration, tracks))
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("brand", StringType()),
            StructField("duration_ms", LongType()),
            StructField("n_tracks", IntegerType()),
            StructField("n_video", IntegerType()),
            StructField("n_audio", IntegerType()),
            StructField("total_samples", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = parse_mp4_boxes(bytes(payload))
                vids = sum(1 for t in m["tracks"] if t["handler"] == "vide")
                rows.append(
                    (
                        int(doc_id),
                        m["brand"],
                        m["duration"] * 1000 // m["timescale"],
                        len(m["tracks"]),
                        vids,
                        len(m["tracks"]) - vids,
                        sum(t["n_samples"] for t in m["tracks"]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "brand", "duration_ms", "n_tracks",
                    "n_video", "n_audio", "total_samples",
                ],
            )

    return media.mapInPandas(stats, schema)


# ---------------------------------------------------------------------------
# k94 — 24-bit PCM + IEEE-float WAV decode: the last stdlib-decodable audio
# widths (format 1 at 24 bits, format 3 at 32/64 bits), closing the audio
# external-codec slot down to genuinely-compressed formats (MP3/AAC/FLAC).
# Hash stability without float hazards: fixture samples are the dyadic
# rationals v/256 (binary32-exact for |v| <= 32768), every decoded value
# and every partial sum is exactly representable, and the op emits stats
# in integer quarter-*256* units (q8 = 256·v) so the oracle is pure
# integer arithmetic — the k53 micro-unit discipline applied to audio.
# ---------------------------------------------------------------------------

K94_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         1 + doc_id % 2 AS ch,
         40 + doc_id % 83 AS frames,
         CASE doc_id % 3 WHEN 0 THEN 1 ELSE 3 END AS fmt,
         CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 32 ELSE 64 END AS bits,
         8000 * (1 + doc_id % 3) AS rate
  FROM documents WHERE doc_id < 360
), s AS (
  SELECT doc_id, ch, frames, fmt, bits, rate,
         ((doc_id*37 + f*13 + c*5) % 65536) - 32768 AS v
  FROM dims,
       LATERAL (SELECT unnest(range(0, frames)) AS f) t1,
       LATERAL (SELECT unnest(range(0, ch)) AS c) t2
)
SELECT doc_id, CAST(ch AS INT) AS channels, CAST(fmt AS INT) AS fmt,
       CAST(bits AS INT) AS bits,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CAST(v AS BIGINT) * 256) AS BIGINT) AS sum_q8,
       CAST(min(v) * 256 AS BIGINT) AS min_q8,
       CAST(max(v) * 256 AS BIGINT) AS max_q8,
       CAST((frames * 1000000) // rate AS BIGINT) AS duration_us
FROM s GROUP BY doc_id, ch, frames, fmt, bits, rate
"""


@register("k94_wav_float24_stats", oracle=K94_ORACLE, group="K")
def k94_wav_float24_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """24-bit PCM and IEEE-float WAV decode end-to-end — the round-10
    narrowing of the audio codec slot (VERDICT r9 #4): both widths are
    pure ``struct`` unpacking, no codec library. Each doc synthesizes a
    RIFF/WAVE container as 24-bit integer PCM (ids % 3 == 0, storing
    256·v), binary32 float (ids % 3 == 1, storing v/256) or binary64
    float (ids % 3 == 2, storing v/256), with v a closed form in
    (doc_id, frame, channel) over [-32768, 32767]. v/256 is a dyadic
    rational with <= 16 significant bits, so the binary32 encode, the
    float64 widening on decode, and every sequential partial sum are all
    EXACT — multiplying back by 65536 (or reading the 24-bit int
    directly) yields the integer 256·v with zero rounding anywhere, and
    the emitted stats are plain BIGINTs the oracle derives with integer
    arithmetic only. Scale posture matches k85/k92: Arrow-batched per-row
    codec work inside mapInPandas, payload bytes never on the driver, no
    extra shuffle."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from marasa_spark.ops.multimodal import (
        decode_wav_samples,
        synthesize_wav_float,
        synthesize_wav_pcm,
    )

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 360)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            ch = 1 + i % 2
            frames = 40 + i % 83
            rate = 8000 * (1 + i % 3)
            vs = [
                ((i * 37 + f * 13 + c * 5) % 65536) - 32768
                for f in range(frames)
                for c in range(ch)
            ]
            mode = i % 3
            if mode == 0:
                out.append(synthesize_wav_pcm([v * 256 for v in vs], ch, rate, 24))
            else:
                out.append(
                    synthesize_wav_float(
                        [v / 256.0 for v in vs], ch, rate, 32 if mode == 1 else 64
                    )
                )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("channels", IntegerType()),
            StructField("fmt", IntegerType()),
            StructField("bits", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("sum_q8", LongType()),
            StructField("min_q8", LongType()),
            StructField("max_q8", LongType()),
            StructField("duration_us", LongType()),
        ]
    )

    def stats(batches):
        import struct as _struct

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(payload)
                ch, rate, bits, samples = decode_wav_samples(blob)
                fmt_tag = _struct.unpack("<H", blob[20:22])[0]
                if fmt_tag == 3:
                    # exact: each s is v/256 with v integral, so s*65536
                    # is the integer 256*v represented exactly in float64
                    q8 = [int(s * 65536) for s in samples]
                else:
                    q8 = list(samples)  # stored 24-bit value IS 256*v
                frames = len(samples) // ch
                rows.append(
                    (
                        int(doc_id),
                        ch,
                        fmt_tag,
                        bits,
                        len(q8),
                        sum(q8),
                        min(q8),
                        max(q8),
                        frames * 1_000_000 // rate,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "channels", "fmt", "bits", "n_samples",
                    "sum_q8", "min_q8", "max_q8", "duration_us",
                ],
            )

    return media.mapInPandas(stats, schema)


# ---------------------------------------------------------------------------
# k95 — BMP decode (24-bit direct + 8-bit paletted, both row orders): the
# one common uncompressed raster format the PNG/JPEG/GIF matrix didn't
# cover; pure struct arithmetic, so it joins the REAL-decode set and the
# external slot stays RLE4/bitfield BMPs only (RLE8 decoded since round 11).
# ---------------------------------------------------------------------------

K95_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         3 + doc_id % 17 AS w, 2 + doc_id % 11 AS h,
         CAST(doc_id % 4 AS INT) AS mode
  FROM documents WHERE doc_id < 300
), pidx AS (
  SELECT doc_id, w, h, mode, x, y,
    CASE WHEN mode = 2 THEN (x + 3*y + doc_id) % 16
         WHEN mode = 3 THEN ((x // 3) + 3*y + doc_id) % 16
         ELSE 0 END AS p
  FROM dims,
       LATERAL (SELECT unnest(range(0, h)) AS y) t1,
       LATERAL (SELECT unnest(range(0, w)) AS x) t2
), px AS (
  SELECT doc_id, w, h, mode,
    CASE WHEN mode < 2 THEN (doc_id*31 + y*17 + x*7) % 256
         ELSE (7 * p + doc_id) % 256 END AS r,
    CASE WHEN mode < 2 THEN (doc_id*13 + y*5 + x*11) % 256
         ELSE (11 * p + 3) % 256 END AS g,
    CASE WHEN mode < 2 THEN (doc_id*7 + y*3 + x*13) % 256
         ELSE (13 * p + 7) % 256 END AS b
  FROM pidx
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, mode,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h, mode
"""


@register("k95_bmp_pixel_stats", oracle=K95_ORACLE, group="K")
def k95_bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP decode end-to-end — the last common uncompressed raster format
    brought into the REAL-decode set (PNG k81/k83/k84/k86, JPEG
    k87/k90/k91, GIF k89). Each doc synthesizes a BITMAPINFOHEADER BMP as
    24-bit direct color stored bottom-up (mode 0), 24-bit top-down via
    negative biHeight (mode 1 — same pixels, opposite row order, so the
    orientation branch is actually exercised against one closed form), or
    8-bit paletted (mode 2, BGRX palette lookup), or 8-bit BI_RLE8
    run-length compressed (mode 3, round 11 — encoded runs, absolute-mode
    literals with 16-bit padding, end-of-line/bitmap escapes; its index
    pattern repeats in x so both run AND literal opcodes appear in every
    fixture); pixels follow closed forms in (doc_id, x, y); per-image
    channel sums hash-match DuckDB evaluating the forms directly. Row
    padding to 4-byte boundaries and the BGR byte order are the decode
    hazards the fixture widths deliberately sweep (w % 4 covers every
    pad). Scale posture matches k81: Arrow-batched per-row codec work
    inside mapInPandas, payloads never on the driver, no extra
    shuffle."""
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from marasa_spark.ops.multimodal import decode_bmp_pixels, synthesize_bmp

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)

    @F.pandas_udf(BinaryType())
    def synth(doc_ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in doc_ids:
            i = int(doc_id)
            w, h, mode = 3 + i % 17, 2 + i % 11, i % 4
            if mode < 2:
                pixels = [
                    (
                        (i * 31 + y * 17 + x * 7) % 256,
                        (i * 13 + y * 5 + x * 11) % 256,
                        (i * 7 + y * 3 + x * 13) % 256,
                    )
                    for y in range(h)
                    for x in range(w)
                ]
                out.append(
                    synthesize_bmp(w, h, pixels, bpp=24, top_down=(mode == 1))
                )
            else:
                palette = [
                    ((7 * p + i) % 256, (11 * p + 3) % 256, (13 * p + 7) % 256)
                    for p in range(16)
                ]
                if mode == 2:
                    indices = [
                        (x + 3 * y + i) % 16 for y in range(h) for x in range(w)
                    ]
                else:  # mode 3: x-repeating pattern → real RLE runs
                    indices = [
                        (x // 3 + 3 * y + i) % 16
                        for y in range(h)
                        for x in range(w)
                    ]
                out.append(
                    synthesize_bmp(
                        w, h, [], bpp=8, palette=palette, indices=indices,
                        rle8=(mode == 3),
                    )
                )
        return pd.Series(out)

    media = d.select("doc_id", synth("doc_id").alias("payload"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", IntegerType()),
            StructField("n_px", LongType()),
            StructField("sum_r", LongType()),
            StructField("sum_g", LongType()),
            StructField("sum_b", LongType()),
        ]
    )

    def stats(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                i = int(doc_id)
                w, h, pixels = decode_bmp_pixels(bytes(payload))
                rows.append(
                    (
                        i,
                        w,
                        h,
                        i % 4,
                        len(pixels),
                        sum(p[0] for p in pixels),
                        sum(p[1] for p in pixels),
                        sum(p[2] for p in pixels),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "mode",
                    "n_px", "sum_r", "sum_g", "sum_b",
                ],
            )

    return media.mapInPandas(stats, schema)


# ---------------------------------------------------------------------------
# k96 — overlapping token-window chunking: the RAG / context-window
# preprocessing shape (split every document into fixed-size token chunks
# with overlap so no boundary-spanning context is lost). Pure JVM array
# expressions — sequence/slice/array_join under one explode, no Python.
# ---------------------------------------------------------------------------

_K96_SIZE, _K96_STRIDE = 8, 6  # chunk_size, stride = size - overlap(2);
# sized to the corpus (docs average ~23 tokens -> ~4 chunks); production
# values (512/384 etc.) change only these constants, not the plan shape.

K96_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), c AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(0, (len(toks) - 1) // {_K96_STRIDE} + 1)) AS chunk_id
  FROM t
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(least({_K96_SIZE}, n - chunk_id * {_K96_STRIDE}) AS BIGINT) AS n_tokens,
       array_to_string(
         list_slice(toks, chunk_id * {_K96_STRIDE} + 1,
                    chunk_id * {_K96_STRIDE} + {_K96_SIZE}), ' ') AS chunk_text
FROM c
"""


@register("k96_chunk_overlap", oracle=K96_ORACLE, group="K")
def k96_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token chunks per document — the
    context-window preprocessing step every RAG index and long-document
    training pipeline runs first. Chunk starts are multiples of the
    stride (size − overlap) below the token count, so consecutive chunks
    share `overlap` tokens and a short tail keeps its partial window; the
    chunk text itself is hash-checked (exact string equality across
    engines, not just counts). Entirely JVM-side: split → one transform
    over sequence(0, n_chunks−1) building (chunk_id, n_tokens, text via
    slice+array_join) → one explode; no UDF, no shuffle at all — the op
    is embarrassingly row-parallel, so at 100 TB it rides the scan
    partitioning and the only cost is the output's size amplification
    (size/stride ≈ 1.33x here)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.floor((n - F.lit(1)) / F.lit(_K96_STRIDE)) + F.lit(1)
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long")),
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.least(
                    F.lit(_K96_SIZE).cast("long"),
                    (n - i.cast("int") * F.lit(_K96_STRIDE)).cast("long"),
                ).alias("n_tokens"),
                F.array_join(
                    F.slice(
                        toks,
                        i.cast("int") * F.lit(_K96_STRIDE) + F.lit(1),
                        F.lit(_K96_SIZE),
                    ),
                    " ",
                ).alias("chunk_text"),
            ),
        )
    ).alias("c")
    return d.select("doc_id", chunk).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
