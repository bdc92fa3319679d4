"""SQL front-end parity (SURVEY.md §3.2 EP3): both entry points — the
DataFrame API and ``spark.sql`` — must produce identical results, since
they compile to the same Catalyst IR.

Strategy: feed each operator's ORACLE SQL to ``spark.sql``. Oracles using
DuckDB-only functions/casts don't parse in Spark and are skipped; oracles
that deliberately compensate for a dialect difference (h4 shifts dayofweek
by +1 for DuckDB) are expected mismatches. Everything else must agree with
the DataFrame build — and enough must run (≥25) for the dual-front-end
claim to be real.
"""

from __future__ import annotations

from marasa_spark.catalog import register_views
from marasa_spark.registry import REGISTRY, queries_map

import pytest
# round 12: heavy property/soak tier — deselected from the default
# driver-stampable run (see conftest); MARASA_FULL_SUITE=1 restores it
pytestmark = pytest.mark.slow


queries_map()

# oracles that intentionally encode a DuckDB-ism and so must NOT match when
# run through Spark's parser (the compensation is the point)
EXPECTED_DIALECT_MISMATCH = {
    "h4_fn_datetime",  # oracle computes dayofweek+1 (DuckDB is 0-based)
}


def test_sql_frontend_parity(spark, sf_dir):
    register_views(spark, sf_dir)
    agreed, skipped, mismatched = [], [], []
    for qid, spec in sorted(REGISTRY.items()):
        if spec.oracle is None:
            continue
        try:
            sql_rows = sorted(map(repr, spark.sql(spec.oracle).collect()))
        except Exception:
            skipped.append(qid)  # DuckDB-only dialect
            continue
        df_rows = sorted(map(repr, spec.fn(spark, sf_dir).collect()))
        (agreed if sql_rows == df_rows else mismatched).append(qid)

    unexpected = [q for q in mismatched if q not in EXPECTED_DIALECT_MISMATCH]
    assert not unexpected, f"SQL vs DataFrame front-end disagree: {unexpected}"
    assert len(agreed) >= 25, (
        f"only {len(agreed)} oracles ran through spark.sql "
        f"(agreed={agreed}, skipped={len(skipped)})"
    )
