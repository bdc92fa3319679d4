"""Large-star/small-star connected components (k49) and MinHash Jaccard
estimation (k50) behavior pins.

The star algorithm must produce labels IDENTICAL to min-label propagation
on any input — both assign every node its component minimum — so the
equivalence check runs on the real near-dup graph AND on synthetic shapes
chosen to stress convergence (a long path is the worst case for label
propagation and the motivating case for star rounds).
"""

from __future__ import annotations

import pytest

from marasa_spark.catalog import load_table
from marasa_spark.ops import dedup as D
from marasa_spark.registry import REGISTRY, queries_map


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # fully compress, then relabel every node with its component MINIMUM
    roots = {n: find(n) for n in parent}
    comp_min: dict[int, int] = {}
    for n, r in roots.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[r] for n, r in roots.items()}


SYNTHETIC_GRAPHS = {
    # worst case for label propagation: diameter = n-1
    "path64": [(i, i + 1) for i in range(64)],
    "two_components": [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)],
    "star_hub_max": [(100, i) for i in range(5)],  # hub has the LARGEST id
    "dup_edges_both_orientations": [(1, 2), (2, 1), (1, 2), (2, 3)],
}


@pytest.mark.parametrize("name", sorted(SYNTHETIC_GRAPHS))
def test_cc_star_matches_union_find(spark, name):
    edges = SYNTHETIC_GRAPHS[name]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["cluster"]
        for r in D.connected_components_star(df).collect()
    }
    assert got == _union_find_labels(edges)


def test_cc_star_equals_label_propagation_on_real_pairs(spark, sf_dir):
    pairs = D.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.9
    )
    star = {
        r["node"]: r["cluster"] for r in D.connected_components_star(pairs).collect()
    }
    prop = {
        r["node"]: r["cluster"] for r in D.connected_components(pairs).collect()
    }
    assert star == prop
    assert len(star) > 0  # the seeded testdata contains near-dup clusters


def test_path_converges_in_log_rounds(spark):
    """A 64-node path must converge well under the 25-round cap (the whole
    point of the star algorithm vs 63 propagation rounds)."""
    edges = SYNTHETIC_GRAPHS["path64"]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = D.connected_components_star(df, max_iters=10).collect()
    assert {r["cluster"] for r in got} == {0}
    assert len(got) == 65


def test_minhash_estimate_error_bound(spark, sf_dir):
    """k50: signature-agreement Jaccard estimates track exact Jaccard within
    the H=64 binomial error bound (mean |err| well inside 1.5 sigma-bar,
    no pathological outlier)."""
    queries_map()
    rows = REGISTRY["k50_minhash_jaccard_est"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    errs = [r["abs_err"] for r in rows]
    assert max(errs) <= 0.35, max(errs)
    assert sum(errs) / len(errs) <= 0.10, sum(errs) / len(errs)
    for r in rows:
        assert 0.0 <= r["jaccard_est"] <= 1.0
