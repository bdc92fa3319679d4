"""The driver's external correctness signal is CAPPED: CORRECTNESS_r{N}.json
has contained exactly the 50 lexicographically-first registry ids every
round (r01-r06). Those 50 ids are therefore the ONLY externally-verified
rows — renaming or inserting an id that sorts before d17_group_concat
silently churns which ops the driver checks. This freeze makes that churn
a loud test failure instead (VERDICT r6 item 8). New ops are fine as long
as their ids sort after the frozen window (e.g. d18+, e*, f*, ... z*).
"""

from __future__ import annotations

from marasa_spark.registry import queries_map

# byte-for-byte the key set of CORRECTNESS_r06.json
DRIVER_FIRST_50 = [
    "a10_csv_quoting", "a12_json_corrupt", "a13_clustered_sink",
    "a14_incremental_files", "a1_scan_parquet", "a2_source_csv_json",
    "a3_sink_parquet", "a4_log_sink", "a5_stream_source",
    "a6_sink_partitioned", "a7_sink_orc", "a8_schema_merge",
    "a9_source_text_parse", "b1_project", "b2_filter_pred", "b3_expr_case",
    "b4_expr_arith", "b5_cast_matrix", "c10_join_asof", "c11_join_theta",
    "c12_scalar_subquery", "c13_in_subquery", "c14_exists_subquery",
    "c15_lateral_join", "c16_join_null_safe", "c17_recursive_cte",
    "c18_join_sort_merge", "c19_join_bucketed", "c1_join_inner",
    "c20_join_skew_salted", "c21_interval_overlap_join", "c22_dpp_join",
    "c23_bloom_join", "c24_join_shuffle_hash", "c2_join_multiway",
    "c3_join_left", "c4_join_right", "c5_join_full", "c6_join_semi",
    "c7_join_anti", "c8_join_cross", "c9_join_range", "d10_agg_collect",
    "d11_pivot", "d12_unpivot", "d13_agg_minmax_by", "d14_agg_bool",
    "d15_agg_bitwise", "d16_agg_median", "d17_group_concat",
]


def test_driver_first_50_ids_are_frozen():
    got = sorted(queries_map())[:50]
    assert got == DRIVER_FIRST_50, (
        "the 50 lexicographically-first registry ids changed — this churns "
        "the only ids the driver's CORRECTNESS file verifies. If the change "
        "is intentional, update DRIVER_FIRST_50 AND note the churn in "
        "CHANGES.md; otherwise rename the new op to sort after "
        "d17_group_concat."
    )


# ---------------------------------------------------------------------------
# Signed-sum rounding lint (round-9 verdict #5 / SCALE.md break-first #9):
# a rounded double sum whose ROW terms can be negative is an accumulation-
# order time bomb — cancellation makes the relative error unbounded, and
# the order jitter WILL eventually straddle the rounding grain (z32's Q9
# profit split by one cent at sf0.1 only). The k53/z32 discipline: round
# each row to integer micro-units, sum as BIGINT, divide for display.
# This lint finds every oracle that rounds a sum over an expression
# containing a minus and requires it to be on the audited allowlist of
# provably NONNEGATIVE row shapes. A new profit/net/diff-shaped oracle
# fails here until it is rewritten to integer units.
# ---------------------------------------------------------------------------

# Audited: every id below rounds sums whose row terms cannot be negative —
# revenue * (1 - discount) with 0 <= discount <= 1 (and optional
# * (1 + tax)), CASE ... ELSE 0 over such terms, squared differences, or
# greatest(x, 0). Nonnegative sums keep relative FP error ~n*eps, far
# inside the rounding grain; only MIXED-SIGN sums cancel.
ROUNDED_SIGNED_SUM_ALLOWLIST = {
    "c2_join_multiway",
    "c9_join_range",
    "d1_agg_hash",
    "k58_pq_encode",  # sum of squared coordinate differences
    "l8_cogrouped_map",
    "m20_partition_backfill",  # CASE over positive o_totalprice multiples
    "z10_sql_frontend_q5",
    "z11_sql_frontend_q10",
    "z16_sql_frontend_q7",
    "z28_sql_frontend_q19_disjunctive",
    "z34_sql_frontend_q14",
    "z49_sql_frontend_q93_shape",  # greatest(qty - returned, 0)
    "z7_sql_frontend_q3",
    "z9_sql_frontend_q1",
}


def _balanced_span_end(s: str, open_paren_at: int) -> int:
    depth = 0
    for i in range(open_paren_at, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(s)


def test_no_unaudited_rounded_signed_double_sums():
    import re

    from marasa_spark.registry import oracle_sql_map

    flagged = {}
    for qid, sql in oracle_sql_map().items():
        s = re.sub(r"\s+", " ", sql.lower())
        for m in re.finditer(r"floor\s*\(", s):
            span = s[m.start() : _balanced_span_end(s, m.end() - 1)]
            for ms in re.finditer(r"sum\s*\(", span):
                arg = span[ms.end() : _balanced_span_end(span, ms.end() - 1) - 1]
                if re.search(r"[\w\)\s]\-\s*[\w\(]", arg):
                    flagged.setdefault(qid, arg[:80])
    unaudited = sorted(set(flagged) - ROUNDED_SIGNED_SUM_ALLOWLIST)
    assert not unaudited, (
        f"oracle(s) {unaudited} round a double sum over a signed expression "
        f"(first: {flagged[unaudited[0]]!r}). If the row terms can be "
        "negative, rewrite to the k53/z32 integer-unit recipe (round each "
        "row to integer micro-units, CAST the sum to BIGINT); if they are "
        "provably nonnegative, add the id to ROUNDED_SIGNED_SUM_ALLOWLIST "
        "with a comment stating why."
    )
    # the allowlist must not rot: every entry still triggers the pattern
    stale = sorted(ROUNDED_SIGNED_SUM_ALLOWLIST - set(flagged))
    assert not stale, f"allowlist entries no longer match any oracle: {stale}"
