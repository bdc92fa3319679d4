"""Heavy-hitter (Misra-Gries candidate + exact verify) behavior tests.

The registered op (m29) runs over the testdata corpus, whose vocabulary is
deliberately tiny (31 tokens — smaller than k, so the compress path never
fires there). These tests exercise the parts the corpus can't:

* the compress path on high-cardinality data (vocabulary ≫ k),
* the MG guarantee — every token with global count ≥ θN is a candidate
  regardless of partitioning,
* exactness — the two-pass result equals the naive full GROUP BY at
  several partitionings (the determinism the oracle hash relies on).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from marasa_spark.ops.freq import heavy_hitters_exact, mg_candidates


def _zipf_docs(spark, n_docs: int, vocab: int, seed: int, parts: int):
    """Documents over a Zipf-ish vocabulary: token i has weight ~ 1/(i+1),
    so a handful of tokens are genuinely heavy and the tail is wide."""
    rng = random.Random(seed)
    weights = [1.0 / (i + 1) for i in range(vocab)]
    docs = []
    for d in range(n_docs):
        toks = rng.choices([f"t{i}" for i in range(vocab)], weights, k=40)
        docs.append((d, " ".join(toks)))
    return spark.createDataFrame(docs, "doc_id long, text string").repartition(parts)


def test_compress_fires_and_caps_summary_size(spark):
    df = _zipf_docs(spark, n_docs=400, vocab=5000, seed=7, parts=4)
    k = 50
    cands = mg_candidates(df, "text", k).collect()
    # per partition at most k survivors -> union is capped
    assert 0 < len(cands) <= 4 * k
    # compress must actually have fired: 400*40 tokens over 5000 vocab
    # would otherwise yield thousands of distinct survivors
    distinct_tokens = df.select(
        F.explode(F.split("text", " "))
    ).distinct().count()
    assert distinct_tokens > 4 * k


@pytest.mark.parametrize("parts", [1, 3, 8])
def test_two_pass_equals_naive_at_any_partitioning(spark, parts):
    df = _zipf_docs(spark, n_docs=300, vocab=2000, seed=11, parts=parts)
    theta = 0.004
    got = {
        (r["token"], r["n"])
        for r in heavy_hitters_exact(df, "text", theta=theta).collect()
    }
    toks = df.select(F.explode(F.split("text", " ")).alias("token"))
    total = toks.count()
    naive = {
        (r["token"], r["n"])
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n").cast("double") >= theta * float(total))
        .collect()
    }
    assert naive, "theta too high — test data produced no heavy hitters"
    assert got == naive


def test_candidates_contain_all_true_heavy_hitters(spark):
    df = _zipf_docs(spark, n_docs=300, vocab=2000, seed=23, parts=6)
    theta = 0.004
    k = int(1.0 / theta) + 1
    cands = {r["token"] for r in mg_candidates(df, "text", k).collect()}
    toks = df.select(F.explode(F.split("text", " ")).alias("token"))
    total = toks.count()
    hh = {
        r["token"]
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n").cast("double") >= theta * float(total))
        .collect()
    }
    assert hh and hh <= cands
