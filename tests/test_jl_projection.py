"""Behavioral bounds for the round-6 late-batch ops: k68's JL distortion
guarantee, k66's shard balance, k67's domain-matching signal, and m38's
merge-equals-unsplit-aggregate identity. Parity (tests/test_oracle_parity.py)
already pins cross-engine value hashes; these pin the SEMANTIC claims the
docstrings make.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.registry import REGISTRY, queries_map

queries_map()


def test_jl_distortion_bounded(spark, sf_dir):
    """Adjacent-pair L2 distances must survive the 64->8 projection with
    median relative distortion well inside the JL ~1/sqrt(8) regime."""
    proj = REGISTRY["k68_jl_projection"].fn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    p2 = sum((F.col(f"a.p{b}") - F.col(f"b.p{b}")) ** 2 for b in range(8))
    d2 = F.aggregate(
        F.zip_with(
            F.col("ea.embedding"),
            F.col("eb.embedding"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        proj.alias("a")
        .join(proj.alias("b"), F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .join(emb.alias("ea"), F.col("a.vec_id") == F.col("ea.vec_id"))
        .join(emb.alias("eb"), F.col("b.vec_id") == F.col("eb.vec_id"))
        .select((F.sqrt(p2) / F.sqrt(d2)).alias("ratio"))
    )
    ratios = [r.ratio for r in pairs.collect()]
    assert len(ratios) >= 100
    med = sorted(ratios)[len(ratios) // 2]
    # E[ratio] = 1; with 8 dims the spread is wide per pair but the median
    # must sit near 1 and no mass may collapse to ~0 (lost geometry)
    assert 0.75 < med < 1.25, med
    assert sum(1 for r in ratios if r < 0.2) / len(ratios) < 0.02


def test_shard_pack_balance(spark, sf_dir):
    """Snake-deal shard loads must be balanced: max/min char-load spread
    within 2%, and every shard populated."""
    rows = REGISTRY["k66_shard_pack"].fn(spark, sf_dir).collect()
    assert len(rows) == 16
    loads = [r.chars_total for r in rows]
    assert min(loads) > 0
    assert (max(loads) - min(loads)) / (sum(loads) / 16) < 0.02, loads


def test_dsir_prefers_target_domain(spark, sf_dir):
    """Docs FROM the target sources must score higher on average than the
    rest (the whole point of importance resampling), and the selected
    top-100 must over-represent the target domain vs its base rate."""
    scored = REGISTRY["k67_dsir_importance"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    j = scored.join(docs, "doc_id").withColumn(
        "is_target", F.col("source").isin("src0", "src1", "src2")
    )
    stats = {
        r.is_target: r
        for r in j.groupBy("is_target")
        .agg(F.avg("weight").alias("w"), F.avg("selected").alias("sel_rate"))
        .collect()
    }
    assert stats[True].w > stats[False].w
    assert stats[True].sel_rate > stats[False].sel_rate


def test_merge_delta_equals_unsplit(spark, sf_dir):
    """m38's merged state must equal the aggregate computed WITHOUT the
    pre/post split — the additive-state correctness identity."""
    merged = REGISTRY["m38_merge_skew_delta"].fn(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders")
    direct = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.max("o_orderdate").alias("last_dt"),
    )
    diff = (
        merged.select("o_custkey", "n_orders", "last_dt")
        .exceptAll(direct)
        .count()
    )
    assert diff == 0
    n_actions = {r.merge_action for r in merged.select("merge_action").distinct().collect()}
    assert "updated" in n_actions


def test_epoch_shuffle_decorrelated_permutations(spark, sf_dir):
    """k69: each epoch must be a full permutation 1..N, and the two
    epochs' orders must be decorrelated (almost no doc holds the same
    position in both)."""
    df = REGISTRY["k69_epoch_shuffle"].fn(spark, sf_dir)
    per_epoch = {
        r.epoch: r
        for r in df.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("npos"),
        )
        .collect()
    }
    assert set(per_epoch) == {0, 1}
    for r in per_epoch.values():
        assert (r.lo, r.hi, r.npos) == (1, r.n, r.n), r
    same = (
        df.filter(F.col("epoch") == 0)
        .alias("a")
        .join(
            df.filter(F.col("epoch") == 1).alias("b"),
            F.col("a.doc_id") == F.col("b.doc_id"),
        )
        .filter(F.col("a.pos") == F.col("b.pos"))
        .count()
    )
    n = per_epoch[0].n
    assert same / n < 0.02, (same, n)


def test_lang_id_branches_fire_on_marked_text(spark):
    """k12's corpus is English word-soup for every declared lang, so the
    non-'en' branches of ops.text.lang_id never fire through the
    registry op (documented data limitation, adjudicated by k46's
    confusion matrix). This pins the function itself on constructed
    inputs: every marker class must win on its own text and lose on the
    others."""
    from marasa_spark.ops.text import lang_id

    cases = [
        ("the quick brown fox jumps over it", "en"),
        ("le chat et la table des maisons", "fr"),
        ("el gato y los perros una casa", "es"),
        ("der hund und die katze das haus", "de"),
        ("中文文本在这里", "zh"),
        ("", "en"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], ["text"])
    got = [r.g for r in df.select(lang_id(F.col("text")).alias("g")).collect()]
    assert got == [want for _, want in cases], got


def test_prefix_sum_batches_respect_budget(spark, sf_dir):
    """k70: every batch's char total must sit within one max-document of
    the 20k budget (the one-doc-overshoot guarantee of the
    floor(prefix/budget) rule), and batches must partition the corpus."""
    rows = REGISTRY["k70_prefix_sum_batching"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    total = docs.agg(F.sum("n_chars").alias("s"), F.max("n_chars").alias("m")).collect()[0]
    assert sum(r.chars_total for r in rows) == total.s
    budget, max_doc = 20000, total.m
    ids = sorted(r.batch_id for r in rows)
    assert ids == list(range(len(ids)))
    for r in rows:
        assert r.chars_total <= budget + max_doc, r
        if r.batch_id != ids[-1]:
            assert r.chars_total >= budget - max_doc, r
