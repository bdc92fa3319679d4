"""Round-11 optimization measurement harness (guide §1).

For every headline label in bench.py, measures on a warmed session:
  * collect_s  — warm best-of-3 of df.collect()  (the bench protocol metric)
  * noop_s     — warm best-of-3 of a noop-sink write (pure computation,
                 guide §1.4: isolates the plan from the py4j row transfer)
and dumps .explain("formatted") for each component query to
plans/r12/<qid>_{suffix}.txt so plan claims are auditable offline.

Usage: python tools/measure_r12.py [suffix]   (suffix default "before")
Writes JSON to /tmp/measure_r12_<suffix>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from marasa_spark.registry import queries_map  # noqa: E402
from marasa_spark.session import get_spark  # noqa: E402

RUNS = 3


def timed(action, runs: int = RUNS) -> float:
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        action()
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name="measure_r12")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "1m"),
    )
    qmap = queries_map()

    out: dict[str, dict] = {}
    for label, qids in HEADLINE.items():
        if only is not None and label not in only:
            continue
        rec: dict[str, float] = {"collect_s": 0.0, "noop_s": 0.0}
        for qid in qids:
            fn = qmap[qid]
            spark.sparkContext.setJobDescription(f"{label}/{qid}")
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{qid}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
            df.collect()  # warm: parquet footers, codegen, JIT
            # bench_one protocol: the PLAN is built once, the action timed
            rec["collect_s"] += timed(lambda: df.collect())
            rec["noop_s"] += timed(
                lambda: df.write.format("noop").mode("overwrite").save()
            )
            spark.sparkContext.setJobDescription(None)
        rec = {k: round(v, 4) for k, v in rec.items()}
        out[label] = rec
        print(f"{label:22s} collect={rec['collect_s']:8.3f}  noop={rec['noop_s']:8.3f}")

    path = f"/tmp/measure_r12_{suffix}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
