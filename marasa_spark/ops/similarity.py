"""Similarity search over embedding columns (SURVEY.md §2.K k6/k7; north
star: ANN for training-data pipelines).

All variants are pure built-in higher-order functions (zip_with/aggregate)
— JVM-side, no UDFs in the hot path. Cosine math is double-cast and
sequential-fold so the DuckDB oracles can reproduce it bit-for-bit.

Scale paths:
* brute force (`cosine_topk`) — block-partitioned crossJoin; at 100 TB the
  query side is small (a batch of probes) and gets broadcast, so the big
  side streams without a shuffle: cost O(|Q|·N) FLOPs, embarrassingly
  parallel.
* IVF (`ivf_assign` + `ivf_topk`) — coarse quantizer: vectors are assigned
  to their nearest centroid once (a tiny broadcast join), probes search
  only their cluster → the scan prunes to N/K per probe. Centroids would
  come from k-means at real scale; any deterministic fixed set works for
  the operator (the driver check uses the first K vectors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from marasa_spark.queries._util import r2


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    sim_decimals: int = 6,
) -> DataFrame:
    """Brute-force top-k cosine neighbors per query (self-match excluded).

    The (small) query side is broadcast against the corpus — no shuffle of
    the big side; ranking is on the rounded similarity with the corpus id
    as tiebreak, so results are stable across engines and partitionings.
    """
    pairs = corpus.join(
        F.broadcast(queries), F.col(q_id) != F.col(c_id)
    ).withColumn("sim", r2(cosine(F.col(q_vec), F.col(c_vec)), sim_decimals))
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, c_id, "sim", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    c_id: str = "c_id",
    c_vec: str = "c_vec",
    cent_id: str = "cent_id",
    cent_vec: str = "cent_vec",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, min-id
    tiebreak). Centroids are broadcast; one pass over the corpus."""
    sims = corpus.join(F.broadcast(centroids)).withColumn(
        "csim", r2(cosine(F.col(c_vec), F.col(cent_vec)), 6)
    )
    w = Window.partitionBy(c_id).orderBy(F.col("csim").desc(), F.col(cent_id))
    return (
        sims.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select(c_id, c_vec, F.col(cent_id).alias("cluster"))
    )


def knn_label_vote(neighbors: DataFrame, labels: DataFrame, q_id: str, c_id: str, label: str) -> DataFrame:
    """Majority label among each query's neighbors (deterministic: max
    count, then min label)."""
    counted = (
        neighbors.join(labels, on=c_id)
        .groupBy(q_id, label)
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy(q_id).orderBy(F.col("votes").desc(), F.col(label))
    return (
        counted.withColumn("vrank", F.row_number().over(w))
        .filter(F.col("vrank") == 1)
        .select(q_id, F.col(label).alias("pred_label"), "votes")
    )
