"""Heavy hitters (frequent items) at scale: mergeable Misra-Gries
candidates + exact verification.

The naive plan for "tokens making up ≥ θ of the corpus" shuffles EVERY
distinct token (the full vocabulary) to count it — at 100 TB that is the
largest shuffle in the pipeline for an answer that is only ever a handful
of rows. The classic two-pass fix:

1. **Candidate pass** — each partition summarizes its own token stream
   with a Misra-Gries sketch of k = ceil(1/θ) counters. MG's guarantee
   (and the mergeable-summaries merge rule, Agarwal et al., PODS'12):
   any item with partition-local count > n_p/(k+1) survives in the
   summary. If a token's GLOBAL count ≥ θN > N/(k+1), then by pigeonhole
   some partition holds it with local count > n_p/(k+1) — so every true
   heavy hitter is in the union of the per-partition candidate sets.
   The union is ≤ k × num_partitions rows (thousands), never the
   vocabulary.
2. **Verify pass** — re-scan and count ONLY the candidates exactly
   (broadcast semi-join on the tiny candidate set before the groupBy),
   then filter by the exact threshold. False candidates fall out here,
   so the final output is deterministic and exact — identical to the
   full-vocabulary GROUP BY ... HAVING, which is precisely what the
   DuckDB oracle runs.

Total shuffle: the candidate union (tiny) + counts for candidate tokens
only (tiny). The corpus is read twice but never shuffled by token.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate tokens (whitespace tokens of
    ``text_col``), merged batch-by-batch with the mergeable-summaries rule:
    add batch counts, and while more than k counters remain, subtract the
    (k+1)-th largest count from all and drop the non-positive. Output is
    one ``token`` column (the union of per-partition summaries; a superset
    of every item with global frequency > n/(k+1))."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            vc = (
                pdf[text_col]
                .str.split(" ")
                .explode()
                .value_counts()
            )
            for tok, n in vc.items():
                counters[tok] = counters.get(tok, 0) + int(n)
            if len(counters) > k:
                # mergeable-summaries compress: subtract the (k+1)-th
                # largest count; everything it zeroes-or-negates drops.
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
        yield pd.DataFrame({"token": list(counters.keys())})

    return df.select(text_col).mapInPandas(summarize, schema="token string")


def heavy_hitters_exact(
    df: DataFrame, text_col: str, theta: float, k: int | None = None
) -> DataFrame:
    """Exact heavy hitters (tokens with count ≥ theta × total tokens) via
    the two-pass candidate/verify plan above. Output: (token, n) — byte-
    identical to the full GROUP BY ... HAVING at any partitioning."""
    if k is None:
        k = int(1.0 / theta) + 1  # k+1 > 1/theta -> guarantee holds
    cands = mg_candidates(df, text_col, k).distinct()
    toks = df.select(F.explode(F.split(text_col, " ")).alias("token"))
    total = toks.groupBy().agg(F.count(F.lit(1)).alias("total"))
    return (
        toks.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n").cast("double") >= F.lit(theta) * F.col("total").cast("double"))
        .select("token", "n")
    )
