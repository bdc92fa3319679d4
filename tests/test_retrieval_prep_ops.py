"""Behavioral invariants for the continuation-session operators — the
checks a hash oracle can't express (the oracle proves Spark == DuckDB;
these prove both equal the SEMANTICS): BPE compression monotonicity,
BM25 membership, MLM mask/target round-trip, streak geometry, PSI
non-negativity, co-occurrence symmetry, streaming-merge argmax.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from marasa_spark.catalog import load_table
from marasa_spark.registry import REGISTRY, queries_map

queries_map()


def _run(spark, sf_dir, qid):
    return REGISTRY[qid].fn(spark, sf_dir)


def test_bpe_encode_compresses_and_bounds(spark, sf_dir):
    """Token counts sit strictly between word count (every word one
    token, unreachable in 10 merges) and character count (zero merges),
    and at least some words actually merged (n_tokens < char count
    corpus-wide — the training did something)."""
    enc = _run(spark, sf_dir, "k74_bpe_encode")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("n_w"),
        F.length(F.regexp_replace("text", " ", "")).alias("n_c"),
    )
    j = enc.join(docs, "doc_id").collect()
    assert len(j) > 0
    for r in j:
        assert r["n_words"] == r["n_w"]
        assert r["n_words"] <= r["n_tokens"] <= r["n_c"], (
            f"doc {r['doc_id']}: tokens {r['n_tokens']} outside "
            f"[{r['n_w']}, {r['n_c']}]"
        )
        assert r["chars_per_token"] >= 1.0
    total_tok = sum(r["n_tokens"] for r in j)
    total_chr = sum(r["n_c"] for r in j)
    assert total_tok < total_chr, "10 merge rounds compressed nothing"


def test_bpe_train_merges_are_distinct_adjacent_pairs(spark, sf_dir):
    """One merge per iteration, all pairs distinct (a pair, once merged,
    can never be the top pair again — its occurrences are gone), counts
    positive."""
    m = _run(spark, sf_dir, "k73_bpe_train").collect()
    assert sorted(r["it"] for r in m) == list(range(1, len(m) + 1))
    assert len({(r["p1"], r["p2"]) for r in m}) == len(m)
    assert all(r["cnt"] > 0 for r in m)


def test_bm25_returns_matching_docs_with_positive_scores(spark, sf_dir):
    """Every returned doc must actually contain >=1 query term; scores
    positive (the +1-smoothed IDF is always > 0); n_terms in 1..3."""
    from marasa_spark.queries.llm import _BM25_TERMS, _BM25_TOPK

    top = _run(spark, sf_dir, "k75_bm25_topk")
    docs = load_table(spark, sf_dir, "documents")
    j = top.join(docs, "doc_id").collect()
    assert 0 < len(j) <= _BM25_TOPK
    for r in j:
        words = set(r["text"].split(" "))
        hit = words & set(_BM25_TERMS)
        assert hit, f"doc {r['doc_id']} in top-k contains no query term"
        assert len(hit) == r["n_terms_matched"]
        assert r["bm25"] > 0


def test_mlm_masking_round_trips(spark, sf_dir):
    """Splicing the target tokens back into the <MASK> slots must
    reproduce the original token stream exactly — the property that
    makes the (input, target) pair trainable."""
    out = {r["doc_id"]: r for r in _run(spark, sf_dir, "k78_mlm_masking").collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    saw_empty = saw_masked = False
    for d in docs:
        r = out[d["doc_id"]]
        orig = [t for t in d["text"].split(" ") if t != ""]
        masked = r["masked_text"].split(" ")
        targets = r["targets"].split(" ") if r["targets"] else []
        assert len(masked) == len(orig)
        assert len(targets) == r["n_masked"]
        saw_empty |= r["n_masked"] == 0
        saw_masked |= r["n_masked"] > 0
        it = iter(targets)
        spliced = [next(it) if t == "<MASK>" else t for t in masked]
        assert spliced == orig, f"doc {d['doc_id']}: mask round-trip broke"
    assert saw_masked, "mask rule never fired"
    assert saw_empty, "no doc exercises the empty-target edge"


def test_streaks_are_islands(spark, sf_dir):
    """Streak geometry: length == end - start + 1, and consecutive
    streaks of one user are separated by a gap >= 2 days (otherwise
    they'd be ONE island)."""
    rows = _run(spark, sf_dir, "e10_gaps_islands").collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        assert r["streak_len"] == r["streak_end_day"] - r["streak_start_day"] + 1
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["streak_start_day"])
        for a, b in zip(rs, rs[1:]):
            assert b["streak_start_day"] >= a["streak_end_day"] + 2, (
                f"user {u}: adjacent islands should have merged"
            )


def test_psi_terms_nonneg_and_shares_sum_to_one(spark, sf_dir):
    """Each PSI term (p-q)·ln(p/q) is non-negative by construction;
    smoothed shares sum to ~1 on each side."""
    rows = _run(spark, sf_dir, "m42_psi_drift").collect()
    assert rows
    assert all(r["psi_term"] >= 0 for r in rows)
    for col in ("ref_share", "cur_share"):
        s = sum(r[col] for r in rows)
        assert abs(s - 1.0) < 1e-3, f"{col} sums to {s}"


def test_market_basket_symmetry_and_rank(spark, sf_dir):
    """Co-occurrence counts are symmetric (count(a->b) == count(b->a)
    whenever both directions survive the top-3 cut), and per-item ranks
    are 1..k with strictly non-increasing counts."""
    rows = _run(spark, sf_dir, "m43_market_basket").collect()
    assert rows
    cnt = {(r["item"], r["other"]): r["n_baskets"] for r in rows}
    for (a, b), n in cnt.items():
        if (b, a) in cnt:
            assert cnt[(b, a)] == n
    by_item: dict[int, list] = {}
    for r in rows:
        by_item.setdefault(r["item"], []).append(r)
    for item, rs in by_item.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a["n_baskets"] >= b["n_baskets"]


def test_chi_square_expected_preserves_totals(spark, sf_dir):
    """Independence-expected counts must reproduce the observed grand
    total (Σ expected == Σ obs — the defining constraint of the null
    model)."""
    rows = _run(spark, sf_dir, "d23_chi_square").collect()
    assert rows
    assert abs(sum(r["expected"] for r in rows) - sum(r["obs"] for r in rows)) < 0.1
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_stream_merge_upsert_is_argmax(spark, sf_dir):
    """The folded state after the streaming merge equals the batch
    argmax over the whole feed: one row per user, and that row's
    event_id belongs to the user's max-ts event."""
    state = {r["user_id"]: r["last_event_id"]
             for r in _run(spark, sf_dir, "i17_stream_merge_upsert").collect()}
    ev = load_table(spark, sf_dir, "events")
    best = {
        r["user_id"]: r["eid"]
        for r in ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id"))["event_id"].alias("eid"))
        .collect()
    }
    assert state == best
