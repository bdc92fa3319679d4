"""As-of join — Spark lacks a native one (SURVEY.md §2 c10, §4).

Two implementations with identical semantics (for each left row, the single
right row with the greatest ``right_ts <= left_ts`` for the same key;
deterministic tiebreak on ``right_seq``):

* :func:`asof_join` — pure DataFrame composition: band join + top-1 window.
  Correct at any scale; the band join can amplify rows when a key has many
  right rows before a left row (bounded by per-key density × tolerance).
* :func:`asof_join_grouped` — ``applyInPandas`` + ``pandas.merge_asof`` per
  key-partition: one shuffle on the key, then a linear two-pointer merge per
  group — the 100 TB path when per-key histories are long (no pair
  amplification). Arrow-batched, no row-at-a-time Python.

Use a ``tolerance`` (max lookback) with the window variant at scale so the
band join prunes to a bounded time slice.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_seq: str,
    left_seq: str | None = None,
    tolerance: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Band-join + latest-prior window. Right columns keep their names;
    every left column is preserved. ``left_seq`` (a unique left row id)
    keys the top-1 window; without it the window falls back to
    (key, left_ts) — correct only when (key, left_ts) identifies left rows
    (the key must be included: partitioning on left_ts alone would collapse
    same-timestamp rows of DIFFERENT keys into one survivor).

    Sides are aliased internally so self-joins (left and right carved from
    the same source) resolve unambiguously.
    """
    l_df = left.alias("_asof_l")
    r_df = right.alias("_asof_r")

    def lcol(c: str) -> Column:
        return F.col(f"_asof_l.{c}")

    def rcol(c: str) -> Column:
        return F.col(f"_asof_r.{c}")

    cond = (lcol(on) == rcol(on)) & (rcol(right_ts) <= lcol(left_ts))
    if tolerance is not None:
        cond = cond & (rcol(right_ts) >= lcol(left_ts) - tolerance)
    joined = l_df.join(r_df, cond, how).drop(rcol(on))
    part = [lcol(left_seq)] if left_seq else [lcol(on), lcol(left_ts)]
    w = Window.partitionBy(*part).orderBy(
        rcol(right_ts).desc(), rcol(right_seq).desc()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_seq: str | None = None,
) -> DataFrame:
    """merge_asof per key group (the linear-time scale path).

    Column names of ``left`` and ``right`` must be disjoint apart from
    ``on``. Inner semantics: left rows without a prior right row are
    dropped. Output: all left columns + right columns except ``on``.
    ``right_seq`` makes right_ts ties deterministic (max seq wins, matching
    :func:`asof_join`) — merge_asof picks the LAST tied row, so a stable
    sort on (right_ts, right_seq) pins the winner.
    """
    lcols = left.columns
    rcols = [c for c in right.columns if c != on]
    overlap = (set(lcols) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(f"column names must be disjoint, overlap: {overlap}")
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in list(left.schema.fields)
        + [f for f in right.schema.fields if f.name != on]
    )
    r_sort = [right_ts, right_seq] if right_seq else [right_ts]

    def merge(_key, pdf_l: pd.DataFrame, pdf_r: pd.DataFrame) -> pd.DataFrame:
        if len(pdf_l) == 0 or len(pdf_r) == 0:
            return pd.DataFrame(columns=lcols + rcols)
        merged = pd.merge_asof(
            pdf_l.sort_values(left_ts, kind="mergesort"),
            pdf_r.drop(columns=[on]).sort_values(r_sort, kind="mergesort"),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
        )
        return merged.dropna(subset=[right_ts])[lcols + rcols]

    # cogroup: one shuffle each side on the key, linear merge per group
    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(merge, out_schema)
