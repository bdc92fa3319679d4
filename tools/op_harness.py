"""Isolated fresh-session harness for individual registry ops (round 12).

For each requested op id, in ONE fresh JVM (the bench_full build protocol):
  * fn_s      — fn() call time (includes any eager checkpoint jobs)
  * first_s   — first collect (plan construction + codegen + py4j)
  * warm_s    — warm best-of-3 collect
  * noop_s    — warm best-of-3 noop-sink write (compute only, guide §1.4)
  * n_rows    — result cardinality
  * md5       — order-insensitive byte-identity fingerprint: md5 over rows
                sorted by their full repr tuple (column order preserved) —
                the before/after equivalence witness for restructures
and dumps .explain("formatted") to plans/r12/<qid>_<suffix>.txt.

Usage: python tools/op_harness.py <suffix> <qid>[,<qid>...] [sf_dir]
Writes JSON to /tmp/op_harness_<suffix>.json (merging over earlier runs
with the same suffix so multi-invocation sweeps accumulate).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marasa_spark.session import get_spark  # noqa: E402


def fingerprint(rows) -> str:
    keyed = sorted(tuple(repr(v) for v in r) for r in rows)
    return hashlib.md5("\n".join(",".join(t) for t in keyed).encode()).hexdigest()


def main() -> None:
    suffix = sys.argv[1]
    qids = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(plans_dir, exist_ok=True)
    spark = get_spark(app_name=f"op_harness_{suffix}")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "1m"),
    )
    from marasa_spark.registry import queries_map

    qmap = queries_map()
    path = f"/tmp/op_harness_{suffix}.json"
    out: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as fh:
            out = json.load(fh)

    for qid in qids:
        fn = qmap[qid]
        spark.sparkContext.setJobDescription(f"{qid}: fn()")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        fn_s = time.perf_counter() - t0

        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(plans_dir, f"{qid}_{suffix}.txt"), "w") as fh:
            fh.write(plan)

        spark.sparkContext.setJobDescription(f"{qid}: first collect")
        t0 = time.perf_counter()
        rows = df.collect()
        first_s = time.perf_counter() - t0
        fp = fingerprint(rows)
        n = len(rows)
        del rows

        spark.sparkContext.setJobDescription(f"{qid}: warm collects")
        warms = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = df.collect()
            warms.append(time.perf_counter() - t0)
            del r
        spark.sparkContext.setJobDescription(f"{qid}: noop writes")
        noops = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noops.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        rec = {
            "fn_s": round(fn_s, 3),
            "first_s": round(first_s, 3),
            "build_s": round(fn_s + first_s, 3),
            "warm_s": round(min(warms), 3),
            "noop_s": round(min(noops), 3),
            "n_rows": n,
            "md5": fp,
        }
        out[qid] = rec
        print(f"{qid}: {json.dumps(rec)}")

    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", path)


if __name__ == "__main__":
    main()
