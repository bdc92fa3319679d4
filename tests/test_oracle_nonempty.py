"""Zero-row-oracle guard: a hash-checked op whose oracle returns ZERO
rows is vacuously green — the value compare holds on nothing, so the
operator's semantics are never actually exercised (this caught
c7_join_anti and z14, whose anti-join predicates matched no customer in
this corpus). Every registered DuckDB oracle must return at least one
row at the driver's correctness SF. DuckDB-only: cheap enough to run on
every suite invocation.
"""

from __future__ import annotations

import duckdb
import pytest

# round 12: heavy property/soak tier — deselected from the default
# driver-stampable run (see conftest); MARASA_FULL_SUITE=1 restores it
pytestmark = pytest.mark.slow

from marasa_spark.registry import REGISTRY, queries_map

queries_map()

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

ORACLED = sorted(qid for qid, ent in REGISTRY.items() if ent.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield c
    c.close()


@pytest.mark.parametrize("qid", ORACLED)
def test_oracle_nonempty(con, qid):
    n = con.execute(f"SELECT count(*) FROM ({REGISTRY[qid].oracle})").fetchone()[0]
    assert n >= 1, f"{qid}: oracle returns zero rows — the hash check is vacuous"
