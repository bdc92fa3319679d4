"""Re-measure a naive-PySpark BASELINE.md row under the exact survey
protocol (BASELINE.md §Environment): fresh process, local[4],
spark.sql.shuffle.partitions=8, spark.sql.legacy.parquet.nanosAsLong=true,
warmed session, best-of-3 collect(), sf0.1.

Usage: python tools/remeasure_baseline.py q_session [repeats]

Each repeat is a fully fresh JVM (subprocess) so JIT/footer caches don't
leak between repeats; the printed figure per repeat is the warm best-of-3
within that process, and the summary is min/median across repeats.

Written for the round-2 q_session investigation: the survey-recorded
0.352 s does not reproduce under its own protocol (measured ≥0.9 s across
every variant tried — native session_window, gaps-and-islands SQL, long-µs
arithmetic, mapInPandas; see git history of _scratch/sess_exp*.py).
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

# naive hand-written PySpark per BASELINE.md: query text mirrors SURVEY §2
NAIVE = {
    "q_session": """
ev = spark.read.parquet(SF + "/events.parquet")
ts_type = dict(ev.dtypes)["ts"]
if ts_type == "bigint":  # nanos testdata generation
    ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
elif ts_type == "timestamp_ntz":  # micros-ntz generation
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
df = (ev.groupBy(F.session_window("ts", "30 minutes").alias("win"), "user_id")
      .agg(F.count(F.lit(1)).alias("n"))
      .select("user_id", F.col("win.start").alias("session_start"), "n"))
""",
}

RUNNER = """
import time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
{query}
df.collect()  # warm: plan + parquet footers + JIT
times = []
for _ in range(3):
    t0 = time.perf_counter()
    df.collect()
    times.append(time.perf_counter() - t0)
print("BEST", min(times))
"""


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "q_session"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    bests = []
    for i in range(repeats):
        out = subprocess.run(
            [sys.executable, "-c", RUNNER.format(query=NAIVE[label])],
            capture_output=True,
            text=True,
            timeout=300,
        )
        for line in out.stdout.splitlines():
            if line.startswith("BEST"):
                bests.append(float(line.split()[1]))
                print(f"repeat {i}: warm best-of-3 = {bests[-1]:.3f}s")
    print(
        json.dumps(
            {
                "label": label,
                "protocol": "local[4], 8 shuffle partitions, warm best-of-3 collect, sf0.1",
                "repeats": bests,
                "min": round(min(bests), 3),
                "median": round(statistics.median(bests), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
