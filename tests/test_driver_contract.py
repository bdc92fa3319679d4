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
