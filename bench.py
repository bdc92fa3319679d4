"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON
line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol mirrors BASELINE.md: warmed session, per-query warm best-of-3
wall-clock of a full plan execution + collect().
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marasa_spark.registry import queries_map
from marasa_spark.session import get_spark

# headline set: BASELINE.md query -> registry id (grows as operators land)
HEADLINE: dict[str, str] = {
    "q_pricing_summary": "d1_agg_hash",
}

RUNS = 3


def bench_one(spark, fn, sf_dir: str) -> float:
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="marasa_spark_bench")
    qmap = queries_map()

    results: dict[str, float] = {}
    for label, qid in HEADLINE.items():
        if qid not in qmap:
            continue
        fn = qmap[qid]
        fn(spark, sf_dir).collect()  # warm (plan + parquet footer + JIT)
        results[label] = round(bench_one(spark, fn, sf_dir), 4)

    total = round(sum(results.values()), 4)
    print(
        json.dumps(
            {
                "metric": "sum_warm_best_of_3_latency",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
