"""Interleaved A/B of spark.sql.adaptive.advisoryPartitionSizeInBytes on
headline labels (round 12, VERDICT r11 #3).

r11 shipped the bench-box advisory at 1 MB (measured +10-15% on the
window/session/percentile labels) but the driver's PERF_r11 showed eight
sub-120 ms labels regressed 0.62-0.89x raw — uniform with a
more-post-shuffle-tasks scheduling tax the r11 sweep never measured.
This measures BOTH sides: per label, the plan is rebuilt and timed under
each setting back-to-back (interleaved, alternating order per round) so
box drift cancels within a pair.

Usage: python tools/ab_advisory.py [rounds] [labels_csv]
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

# the eight PERF_r11 raw regressions + the three labels the 1m setting was
# adopted for (both sides of the trade, per the verdict)
DEFAULT_LABELS = [
    "q_pricing_summary", "q_multiway_join", "q_range_join", "q_json",
    "q_word_count", "q_dedup_exact", "q_setops", "q_cosine_topk",
    "q_window_frame", "q_session", "q_stats",
]
SETTINGS = ["1m", "8m"]
RUNS = 3


def best_of(df, runs: int = RUNS) -> float:
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        rows = df.collect()
        times.append(time.perf_counter() - t0)
        del rows
    return min(times)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    labels = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_LABELS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_advisory")
    qmap = queries_map()

    samples: dict[str, dict[str, list[float]]] = {
        lb: {s: [] for s in SETTINGS} for lb in labels
    }
    for rnd in range(rounds):
        order = SETTINGS if rnd % 2 == 0 else SETTINGS[::-1]
        for label in labels:
            for setting in order:
                spark.conf.set(
                    "spark.sql.adaptive.advisoryPartitionSizeInBytes", setting
                )
                total = 0.0
                for qid in HEADLINE[label]:
                    # rebuild the plan under this conf (AQE captures the
                    # advisory at plan creation)
                    df = qmap[qid](spark, sf_dir)
                    df.collect()  # warm
                    total += best_of(df)
                samples[label][setting].append(round(total, 4))

    out = {}
    for label in labels:
        row = {s: min(samples[label][s]) for s in SETTINGS}
        row["all"] = samples[label]
        row["ratio_1m_over_8m"] = round(row["1m"] / row["8m"], 3)
        out[label] = row
        print(
            f"{label:22s} 1m={row['1m']:.4f} 8m={row['8m']:.4f} "
            f"ratio={row['ratio_1m_over_8m']}"
        )
    with open("/tmp/ab_advisory.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote /tmp/ab_advisory.json")


if __name__ == "__main__":
    main()
