"""Behavioral tests for the LLM-data operators whose engine-hash internals
make cross-engine oracles impossible (SURVEY.md §2.K rows-only entries):
MinHash-LSH recall, SimHash invariance, IVF-vs-brute-force agreement,
rolling-hash reference, multimodal decode plumbing, approx-agg tolerance.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.ops import dedup as D
from marasa_spark.ops import multimodal as M
from marasa_spark.ops import similarity as S
from marasa_spark.ops import text as T


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """At threshold 0.9 with 16 bands × 2 rows, LSH candidate recall is
    ~1-(1-0.81)^16 ≈ 1; verification removes false positives — so the
    verified LSH output must equal the exact O(n²) pair set."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_pairs(docs, "doc_id", "text", 0.9).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.9
        ).collect()
    }
    assert lsh <= exact, "LSH produced a false positive despite verification"
    assert lsh == exact, f"LSH missed {len(exact - lsh)} of {len(exact)} true pairs"


def test_minhash_verify_token_hash_is_collision_free(spark, sf_dir):
    """minhash_lsh_pairs verifies candidates by intersecting xxhash64-hashed
    token arrays (primitive fast path) instead of the string arrays. The
    intersect COUNT equals the string-set intersect count iff no two
    distinct tokens of the corpus share an xxhash64 value — asserted here
    on the shipped vocabulary, which turns the ~V²/2⁶⁵ collision argument
    in the docstring into an exact statement for every oracle-checked run."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    # union the synthetic batch marker token k80's probe appends, so the
    # pin also covers its batch-vs-index hashed intersect
    toks = toks.unionAll(docs.sparkSession.createDataFrame([("zq",)], "tok string"))
    vocab = (
        toks.agg(
            F.countDistinct("tok").alias("n_tok"),
            F.countDistinct(F.xxhash64("tok")).alias("n_hash"),
        )
        .collect()[0]
    )
    assert vocab["n_tok"] == vocab["n_hash"], (
        f"xxhash64 collision in token vocabulary: {vocab['n_tok']} tokens -> "
        f"{vocab['n_hash']} hashes; the hashed-array verify would miscount"
    )


def test_shingle_hash_is_collision_free(spark, sf_dir):
    """k19's jaccard_pairs verify intersects xxhash64-hashed 5-gram shingle
    arrays (same primitive fast path as the word-token ops). Pins that the
    shipped corpus's shingle vocabulary is collision-free under xxhash64,
    making the hashed count exactly the string-set count on every
    oracle-checked run (the word-token twin of this pin is above)."""
    from marasa_spark.ops.dedup import char_shingles

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(char_shingles(F.col("text"), 5)).alias("sh"))
        .agg(
            F.countDistinct("sh").alias("n_sh"),
            F.countDistinct(F.xxhash64("sh")).alias("n_hash"),
        )
        .collect()[0]
    )
    assert vocab["n_sh"] == vocab["n_hash"], (
        f"xxhash64 collision in shingle vocabulary: {vocab['n_sh']} -> "
        f"{vocab['n_hash']}; k19's hashed verify would miscount"
    )


def test_minhash_rejects_non_integral_id(spark):
    """The capped-bucket sentinel (doc + 2^32) needs an integral id; a
    string id would coerce to NULL and silently drop pairs (ADVICE r9) —
    the op must refuse instead."""
    import pytest

    df = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], ["doc_id", "text"]
    )
    with pytest.raises(ValueError, match="integral id"):
        D.minhash_lsh_pairs(df, "doc_id", "text")


def test_simhash_invariants(spark):
    df = spark.createDataFrame(
        [
            (1, "join filter window"),
            (2, "join filter window"),          # identical
            (3, "window filter join"),          # same token set, other order
            (4, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    sigs = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", D.simhash64(D.tokens(F.col("text"))).alias("sh")).collect()
    }
    assert sigs[1] == sigs[2]
    assert sigs[1] == sigs[3]  # distinct-token-set invariance
    assert sigs[1] != sigs[4]


def test_simhash_table_matches_column_form(spark, sf_dir):
    """k10's vectorized explode/aggregate simhash must be BIT-identical to
    the Column higher-order fold on the shipped corpus (the two paths
    share the same per-bit ±1 vote definition; this pin is what lets the
    corpus op use the codegen'd shape)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    col_form = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", D.simhash64(D.tokens(F.col("text"))).alias("sh")
        ).collect()
    }
    tbl_form = {
        r["doc_id"]: r["simhash"]
        for r in D.simhash_table(docs, "doc_id", "text").collect()
    }
    assert col_form == tbl_form


def test_ivf_equals_brute_force_within_cluster(spark, sf_dir):
    """The IVF operator must return exactly the brute-force top-3 computed
    over its own cluster members (pruning is the approximation; in-cluster
    ranking must be exact)."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    centroids = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_vec")
    )
    assigned = S.ivf_assign(corpus, centroids)
    clusters = {r["c_id"]: r["cluster"] for r in assigned.select("c_id", "cluster").collect()}

    from marasa_spark.queries.llm import k16_ann_ivf

    got = {}
    for r in k16_ann_ivf(spark, sf_dir).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["c_id"], r["sim"]))

    import math

    vecs = {r["c_id"]: r["c_vec"] for r in corpus.collect()}

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6

    for q in range(10):
        members = [c for c, cl in clusters.items() if cl == clusters[q] and c != q]
        want = sorted(((-cos(vecs[q], vecs[c]), c) for c in members))[:3]
        want_ids = [c for _s, c in want]
        got_ids = [c for _rk, c, _s in sorted(got[q])]
        assert got_ids == want_ids, f"q={q}: {got_ids} != {want_ids}"


def test_rh_lsh_recall_vs_brute_force(spark, sf_dir):
    """Random-hyperplane LSH (k11's scale path) mirrors the k9-vs-k5
    pattern: verified output must be a subset of the exact all-pairs set
    (zero false positives), with recall ≥ the banding curve's floor.
    At threshold 0.35 (θ ≈ 69°, p ≈ 0.617) with 16 bands × 2 bits the
    theoretical recall is 1-(1-p²)^16 ≈ 0.999 — and the planes are a fixed
    sha-derived matrix, so the observed recall is deterministic."""
    from marasa_spark.queries.llm import k11_embed_neardup

    e = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in k11_embed_neardup(spark, sf_dir).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in S.rh_lsh_pairs(
            e, "vec_id", "embedding", dim=64, threshold=0.35, num_bits=32, bands=16
        ).collect()
    }
    assert lsh <= exact, "RH-LSH produced a false positive despite verification"
    assert exact, "test needs a non-empty exact pair set"
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"RH-LSH recall {recall:.3f} below banding-curve floor"


def test_rh_lsh_selfjoin_salt_is_output_invariant(spark, sf_dir):
    """rh_lsh_pairs' hot-cell salt split (round 11) must be a pure
    parallelism knob: (vec_a, vec_b, sim) identical for any s (the
    minhash twin of test_dedup_star's pin — same replication scheme)."""
    e = load_table(spark, sf_dir, "embeddings")
    mk = lambda s: sorted(  # noqa: E731
        (r["vec_a"], r["vec_b"], r["sim"])
        for r in S.rh_lsh_pairs(
            e, "vec_id", "embedding", dim=64, threshold=0.35,
            num_bits=32, bands=16, selfjoin_salt=s,
        ).collect()
    )
    ref = mk(1)
    assert ref, "test needs a non-empty pair set"
    assert mk(3) == ref


def test_kmeans_ivf_in_cluster_exactness(spark, sf_dir):
    """k22: Lloyd's centroids must produce a valid partition (every vector
    assigned, k clusters at most) and the IVF probe must return exactly the
    brute-force top-3 within the query's own cluster."""
    import math

    from marasa_spark.queries.llm import k22_ann_ivf_kmeans

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    centroids = S.kmeans_centroids(corpus, k=8, dim=64, iters=3)
    assert centroids.count() == 8
    assigned = S.ivf_assign(corpus, centroids)
    assert assigned.count() == corpus.count(), "every vector must be assigned"
    clusters = {r["c_id"]: r["cluster"] for r in assigned.select("c_id", "cluster").collect()}
    vecs = {r["c_id"]: r["c_vec"] for r in corpus.collect()}

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return math.floor(dot / (na * nb) * 1e6 + 0.5) / 1e6

    got = {}
    for r in k22_ann_ivf_kmeans(spark, sf_dir).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["c_id"]))
    for q in range(10):
        members = [c for c, cl in clusters.items() if cl == clusters[q] and c != q]
        want_ids = [c for _s, c in sorted(((-cos(vecs[q], vecs[c]), c) for c in members))[:3]]
        got_ids = [c for _rk, c in sorted(got[q])]
        assert got_ids == want_ids, f"q={q}: {got_ids} != {want_ids}"


def test_connected_components_reference(spark):
    """Min-label propagation on a known graph: two chains and an isolated
    pair — every node must get its component's minimum id, including
    through multi-hop chains (the case a single propagation round misses)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["cluster"] for r in D.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_rolling_hash_reference(spark):
    texts = ["hello world", "a", "join filter window group"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r["id"]: r["rh"]
        for r in df.select("id", T.rolling_hash(F.col("text")).alias("rh")).collect()
    }

    def ref(s: str, base=31, mod=2**31 - 1) -> int:
        h = 0
        for ch in s:
            h = (h * base + ord(ch)) % mod
        return h

    for i, t in enumerate(texts):
        assert got[i] == ref(t), t


def test_multimodal_decode_plumbing(spark, sf_dir):
    import hashlib

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = M.attach_binary_payload(docs, "doc_id", "text")
    out = M.decode_media(media)
    rows = {r["doc_id"]: r for r in out.collect()}
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(want)
    for did, text in want.items():
        r = rows[did]
        assert r["n_bytes"] == len(text.encode())
        assert r["checksum"] == hashlib.md5(text.encode()).hexdigest()
        assert 0 <= r["width"] < 1920 and 0 <= r["height"] < 1080

    # the real-codec slot is an explicit stub
    import pytest

    with pytest.raises(Exception, match="NotImplementedError|not available"):
        M.decode_media(media, real_codec=True).collect()


def test_approx_aggs_within_tolerance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05


def test_hll_sketch_estimates_within_tolerance(spark, sf_dir):
    """d19: every per-segment DataSketches estimate and the merged-union
    global estimate land within 3% of the exact distinct count."""
    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    got = {
        r["c_mktsegment"]: (r["n_est"], r["n_rows"])
        for r in REGISTRY["d19_sketch_hll"].fn(spark, sf_dir).collect()
    }
    c = load_table(spark, sf_dir, "customer")
    exact = {
        r["c_mktsegment"]: r["n"]
        for r in c.groupBy("c_mktsegment")
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    exact["__ALL__"] = c.select("c_custkey").distinct().count()
    assert set(got) == set(exact)
    for seg, n in exact.items():
        assert abs(got[seg][0] - n) / n < 0.03, (seg, got[seg], n)


def test_hll_sketch_serialized_roundtrip_merge(spark, sf_dir):
    """d19's portable-claim pin (round-5 verdict #6): per-SEGMENT sketches
    serialized to a parquet binary column, read back in a separate scan,
    and merged via the engine must (a) estimate within 3% of exact under
    THREE different segmentations of the same key set, and (b) agree with
    each other to within 2% — textbook HLL union is register-lossless
    over a disjoint partition of the input, but DataSketches sketches
    promote through modes (coupon list → sparse → dense HLL_4/6/8) at
    thresholds the segmentation shifts, so the merged register state is
    only NEAR-invariant (measured spread here: ~1%, 1494-1508 over 1500).
    The bound is the portable-artifact claim: segment sketches computed
    per day/table/cluster merge into the same rollup as a direct global
    sketch up to documented sketch error, never up to bit equality.
    Cross-ENGINE hash parity remains impossible by design —
    DuckDB's approx_count_distinct is its own HLL variant with different
    register layout, hashing, and bias correction, so only the
    Spark↔Spark serialized round-trip (and the ±3% bound vs exact) is
    checkable; d19 stays rows-only with this test as its quantitative
    bound."""
    from marasa_spark.queries._util import fresh_scratch

    c = load_table(spark, sf_dir, "customer")
    exact = c.select("c_custkey").distinct().count()
    segmentations = {
        "mktsegment": F.col("c_mktsegment"),
        "nation": F.col("c_nationkey").cast("string"),
        "mod7": (F.col("c_custkey") % 7).cast("string"),
    }
    d = fresh_scratch("d19_roundtrip", sf_dir, create=True)
    estimates = {}
    for name, seg in segmentations.items():
        path = f"{d}/{name}"
        # serialize: one binary sketch per segment, persisted
        c.groupBy(seg.alias("seg")).agg(
            F.hll_sketch_agg("c_custkey").alias("sk")
        ).write.mode("overwrite").parquet(path)
        # separate scan: merge the serialized sketches engine-side
        merged = (
            spark.read.parquet(path)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
            .first()
        )
        estimates[name] = int(merged["est"])
    for name, est in estimates.items():
        assert abs(est - exact) / exact < 0.03, (name, est, exact)
    spread = (max(estimates.values()) - min(estimates.values())) / exact
    assert spread < 0.02, (
        "merged estimates drifted across segmentations: " + repr(estimates)
    )


def test_int8_quantization_recall_floor(spark, sf_dir):
    """k34: int8 max-abs quantization must keep mean recall@10 >= 0.8
    against exact cosine (measured 1.0 at sf0.01 — the floor leaves room
    for other data distributions, not for a broken quantizer)."""
    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    rows = REGISTRY["k34_embed_quantize"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    mean_recall = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert mean_recall >= 0.8, mean_recall


def test_k37_boilerplate_short_docs(spark, tmp_path):
    """Docs with <5 tokens must yield zero 5-grams (n_grams absent from the
    output, like the oracle's empty range(1,1)) instead of crashing —
    regression for the unguarded sequence(0, size-5) → [0, -1] → slice(-1)
    INVALID_PARAMETER_VALUE.START crash on a 3-token doc."""
    from marasa_spark.registry import REGISTRY, queries_map

    queries_map()
    spark.createDataFrame(
        [
            (1, "only three tokens", "en", "web", 17),
            (2, "a b c d e f g", "en", "web", 13),
            (3, "a b c d e f g", "en", "web", 13),
            (4, "", "en", "web", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["k37_boilerplate"].fn(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {2, 3}  # short/empty docs produce no gram rows
    assert rows[2]["n_grams"] == 3 and rows[2]["boilerplate_score"] == 1.0


def test_media_header_parser_round_trips():
    """ops.multimodal parses back exactly what it synthesized — PNG IHDR
    (incl. CRC layout), GIF screen descriptor, WAV RIFF chunk walk — and
    rejects unknown magics instead of guessing."""
    from marasa_spark.ops.multimodal import (
        parse_media_header,
        synthesize_gif,
        synthesize_png,
        synthesize_wav,
    )

    assert parse_media_header(synthesize_png(123, 77)) == ("image/png", 123, 77, 1)
    assert parse_media_header(synthesize_gif(300, 200)) == ("image/gif", 300, 200, 1)
    assert parse_media_header(synthesize_wav(999, 2)) == ("audio/wav", None, None, 999)
    assert parse_media_header(synthesize_wav(10, 1)) == ("audio/wav", None, None, 10)
    assert parse_media_header(b"not a media file")[0] == "unknown"
    # a real PNG IHDR must carry a correct CRC — corrupting it is detectable
    png = bytearray(synthesize_png(64, 64))
    import struct as s
    import zlib as z

    body = bytes(png[12:29])  # tag + 13-byte IHDR body
    assert s.unpack(">I", bytes(png[29:33]))[0] == z.crc32(body) & 0xFFFFFFFF


def test_ann_recall_eval_floor(spark, sf_dir):
    """k48: the in-engine ANN quality table must show the IVF path finding
    ≥90% of the brute-force top-5 on average (and full per-probe coverage:
    one row per probe, 5 exact neighbors each)."""
    from marasa_spark.queries.llm import k48_ann_recall_eval

    rows = k48_ann_recall_eval(spark, sf_dir).collect()
    assert len(rows) == 10, "one evaluation row per probe"
    assert all(r["n_exact"] == 5 for r in rows)
    mean_recall = sum(r["recall_at_5"] for r in rows) / len(rows)
    assert mean_recall >= 0.9, f"IVF recall@5 {mean_recall:.3f} below floor"


def test_pq_encode_distortion_and_codes(spark, sf_dir):
    """k58: every vector gets one code per subspace in [0, 8); codewords
    encode to THEMSELVES with zero error in every subspace (the argmin of
    a distance-to-self set is self) — the basic sanity any quantizer must
    pass."""
    from marasa_spark.queries.llm import k58_pq_encode

    rows = k58_pq_encode(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n
    for r in rows:
        for s in range(4):
            assert 0 <= r[f"code_{s}"] < 8
            assert r[f"err_{s}"] >= 0.0
    for r in rows:
        if r["vec_id"] < 8:  # codewords themselves
            assert all(r[f"err_{s}"] == 0.0 for s in range(4))
            assert all(r[f"code_{s}"] == r["vec_id"] for s in range(4))


def test_ivfpq_refined_recall_floor(spark, sf_dir):
    """k59: ADC shortlist + exact re-rank must reach mean recall@10 >= 0.7
    against exact L2 search (measured 0.90 at sf0.01; ADC alone measures
    0.26 on this near-isotropic synthetic corpus — the refine stage is
    load-bearing and this floor would catch losing it)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from marasa_spark.ops.similarity import l2sq
    from marasa_spark.queries.llm import k59_ann_ivfpq

    got = k59_ann_ivfpq(spark, sf_dir).collect()
    approx: dict[int, set[int]] = {}
    for r in got:
        approx.setdefault(r["q_id"], set()).add(r["n_id"])
    assert len(approx) == 5 and all(len(v) == 10 for v in approx.values())

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    qv = corpus.filter(F.col("c_id") < 5).select(
        F.col("c_id").alias("q_id"), F.col("c_vec").alias("q_vec")
    )
    pairs = qv.join(corpus, F.col("c_id") != F.col("q_id")).withColumn(
        "d", l2sq(F.col("q_vec"), F.col("c_vec"))
    )
    w = W.partitionBy("q_id").orderBy(F.col("d").asc(), F.col("c_id"))
    exact: dict[int, set[int]] = {}
    for r in (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter("rn <= 10")
        .select("q_id", "c_id")
        .collect()
    ):
        exact.setdefault(r["q_id"], set()).add(r["c_id"])
    recalls = [len(approx[q] & exact[q]) / 10 for q in exact]
    assert sum(recalls) / len(recalls) >= 0.7, recalls


def test_pq_encode_generic_geometry(spark, sf_dir):
    """pq_encode is geometry-generic: with 8 subspaces of 8 dims and the
    first 4 vectors as codebooks, codewords still self-encode with zero
    error in every subspace and every code is in range — the single-pass
    explode/pivot plan must not hard-code the k58 4×16 shape."""
    from pyspark.sql import functions as F

    from marasa_spark.ops.similarity import pq_encode

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    cb = e.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_vec")
    )
    rows = pq_encode(corpus, cb, n_sub=8, sub_dim=8).collect()
    assert len(rows) == e.count()
    for r in rows:
        for s in range(8):
            assert 0 <= r[f"code_{s}"] < 4
        if r["c_id"] < 4:
            assert all(r[f"err_{s}"] == 0.0 for s in range(8))
            assert all(r[f"code_{s}"] == r["c_id"] for s in range(8))


def test_real_codec_decodes_png_end_to_end(spark, sf_dir):
    """decode_media(real_codec=True) now has one WORKING codec: filtered
    grayscale-8 PNGs decode to their true dimensions through the stdlib
    reference decoder; non-PNG payloads still raise (the declared slot)."""
    from pyspark.sql.types import BinaryType

    docs = load_table(spark, sf_dir, "documents").limit(20).select("doc_id")

    @F.pandas_udf(BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [
                M.synthesize_png_filtered(
                    4 + int(i) % 29,
                    3 + int(i) % 17,
                    lambda x, y, i=int(i): (i * 31 + y * 17 + x * 7) % 256,
                )
                for i in ids
            ]
        )

    media = docs.select(
        "doc_id",
        synth("doc_id").alias("payload"),
        F.struct(F.lit("image/png").alias("mime"), F.lit(0).alias("declared_len")).alias(
            "media_meta"
        ),
    )
    rows = {r["doc_id"]: r for r in M.decode_media(media, real_codec=True).collect()}
    assert rows
    for did, r in rows.items():
        assert r["media_type"] == "image/png"
        assert r["width"] == 4 + did % 29 and r["height"] == 3 + did % 17
        assert r["n_frames"] == 1


def test_real_codec_dispatches_all_three_formats(spark, sf_dir):
    """decode_media(real_codec=True) now dispatches on the container
    signature: PNG → pixel decode, baseline grayscale JPEG → entropy
    decode, WAV PCM → frame count from the decoded samples; anything else
    still raises (the declared external-codec slot)."""
    from pyspark.sql.types import BinaryType

    from marasa_spark.ops.jpeg import synthesize_jpeg_gray

    docs = load_table(spark, sf_dir, "documents").limit(21).select("doc_id")

    @F.pandas_udf(BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            if i % 3 == 0:
                out.append(
                    M.synthesize_png_filtered(4 + i % 9, 3 + i % 7, lambda x, y: 7)
                )
            elif i % 3 == 1:
                out.append(synthesize_jpeg_gray(8 + i % 9, 8 + i % 7, lambda bx, by: 99))
            else:
                out.append(
                    M.synthesize_wav_pcm([0] * (2 * (10 + i % 5)), 2, 8000, 16)
                )
        return pd.Series(out)

    media = docs.select(
        "doc_id",
        synth("doc_id").alias("payload"),
        F.struct(F.lit("x").alias("mime"), F.lit(0).alias("declared_len")).alias(
            "media_meta"
        ),
    )
    rows = {r["doc_id"]: r for r in M.decode_media(media, real_codec=True).collect()}
    assert rows
    for did, r in rows.items():
        if did % 3 == 0:
            assert r["media_type"] == "image/png"
            assert (r["width"], r["height"]) == (4 + did % 9, 3 + did % 7)
        elif did % 3 == 1:
            assert r["media_type"] == "image/jpeg"
            assert (r["width"], r["height"]) == (8 + did % 9, 8 + did % 7)
        else:
            assert r["media_type"] == "audio/wav"
            assert r["n_frames"] == 10 + did % 5


def test_k20_banded_levenshtein_equals_full(spark, sf_dir):
    """k20's round-11 rewrite computes levenshtein with the threshold-100
    band plus an exact |len_a-len_b| <= 100 prune. Pin the equivalence on
    the shipped slice: the banded pipeline's (pair -> distance) map must
    equal the full unbanded all-pairs filter, including pairs near the
    threshold boundary."""
    from marasa_spark.registry import queries_map

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    full = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", F.levenshtein("ta", "tb").cast("int").alias("edit_dist")
        )
        .filter(F.col("edit_dist") <= 100)
        .collect()
    }
    banded = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in queries_map()["k20_edit_distance"](spark, sf_dir).collect()
    }
    assert banded == full
