"""Isolated fresh-session cold/warm harness for k9 (minhash_lsh_pairs).

Measures, in ONE fresh JVM (the bench_full build protocol):
  * fn_s      — minhash_lsh_pairs() call time (includes the three eager
                localCheckpoint materializations: grp, per_set, rep_pairs)
  * first_s   — first collect (expansion plan construction + codegen + py4j)
  * warm_s    — warm best-of-3 collect
  * md5       — md5 over sorted (doc_a, doc_b, repr(jaccard)) — the
                byte-identity fingerprint (sf0.1 reference at the r11
                final shape: 7c305345080023eaf324c553a873f031, 964,854
                pairs — deterministic across runs and DuckDB-oracle-green
                at sf0.1; the pre-r11-restructure value was
                956b16dfc6a7613b02b17f1c6d166a8c)

Usage: python tools/k9_cold_harness.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from marasa_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="k9_cold_harness")
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_BYTES", "1m"),
    )
    from marasa_spark.registry import queries_map

    fn = queries_map()["k9_dedup_minhash_lsh"]
    spark.sparkContext.setJobDescription("k9 harness: fn() incl checkpoints")
    t0 = time.perf_counter()
    pairs = fn(spark, sf_dir)
    fn_s = time.perf_counter() - t0

    spark.sparkContext.setJobDescription("k9 harness: first collect")
    t0 = time.perf_counter()
    rows = pairs.collect()
    first_s = time.perf_counter() - t0

    fp = hashlib.md5(
        "\n".join(
            f"{r['doc_a']},{r['doc_b']},{r['jaccard']!r}"
            for r in sorted(rows, key=lambda r: (r["doc_a"], r["doc_b"]))
        ).encode()
    ).hexdigest()
    n = len(rows)
    del rows

    spark.sparkContext.setJobDescription("k9 harness: warm collects")
    warms = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = pairs.collect()
        warms.append(time.perf_counter() - t0)
        del r
    print(
        f"fn_s={fn_s:.3f} first_s={first_s:.3f} "
        f"build_s={fn_s + first_s:.3f} warm_s={min(warms):.3f} "
        f"n_pairs={n} md5={fp}"
    )


if __name__ == "__main__":
    main()
