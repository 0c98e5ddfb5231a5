"""Executor-boundary shuffle cost, measured (VERDICT r2 item 7).

The round-2 local-cluster full-pipeline run regressed at 4 executors and
was called a loopback artifact. This bench QUANTIFIES the artifact with a
controlled comparison: the SAME shuffle-bound job on the SAME 4 cores as

  A) local-cluster[1,4,..]  — one executor JVM: every shuffle block is an
     in-process fetch (no socket, no second disk pass by another JVM)
  B) local-cluster[4,1,..]  — four executor JVMs: 3/4 of shuffle blocks
     cross JVM boundaries via loopback TCP + the ONE shared /tmp disk

Same parallelism, same total CPU, same data → the B/A wall-time ratio is
the executor-boundary overhead on this single box, with no frequency or
parallelism confound. A real n-node cluster pays network transfer instead
of loopback contention but brings n disks + n NICs; combined with the
measured shuffle intensity of the heaviest component (CC skew bench:
27 GB shuffle write over 565 s ≈ 0.05 GB/s per active stage, two orders
below one 10 GbE NIC), the boundary overhead — not bandwidth — is the
only artifact, and it is a sandbox property, not a plan property.

Usage: python scripts/shuffle_boundary_bench.py [rows_millions]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROWS_M = int(sys.argv[1]) if len(sys.argv) > 1 else 40
MEM_MB = int(os.environ.get("SCALING_EXEC_MEM_MB", "6144"))
REPS = int(os.environ.get("SCALING_REPS", "2"))

JOB = r"""
import json, sys, time
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

n_exec, cores, rows_m, mem_mb = map(int, sys.argv[1:5])
total = n_exec * cores
spark = (
    SparkSession.builder.appName(f"shufbench-{n_exec}x{cores}")
    .master(f"local-cluster[{n_exec},{cores},{mem_mb}]")
    .config("spark.executor.memory", f"{mem_mb - 1024}m")
    .config("spark.sql.shuffle.partitions", str(total * 8))
    .config("spark.sql.adaptive.enabled", "false")  # fixed plan both sides
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
n = rows_m * 1_000_000
df = spark.range(0, n, 1, total * 8).select(
    (F.col("id") % 1_000_000).alias("k"),
    F.concat(F.lit("v-padding-padding-"), F.col("id").cast("string")).alias("v"),
)
t0 = time.perf_counter()
# two chained wide stages: repartition exchange + groupBy shuffle
out = (
    df.repartition(total * 8, "k")
    .groupBy("k")
    .agg(F.count("*").alias("c"), F.max("v").alias("m"))
    .groupBy((F.col("k") % 1024).alias("b"))
    .agg(F.sum("c").alias("s"))
    .count()
)
wall = time.perf_counter() - t0
print(json.dumps({"executors": n_exec, "cores": cores, "rows": n,
                  "wall_sec": round(wall, 2), "groups": out}))
spark.stop()
"""


def run(n_exec: int, cores: int) -> dict:
    best = None
    for _ in range(REPS):
        p = subprocess.run(
            [sys.executable, "-c", JOB, str(n_exec), str(cores), str(ROWS_M), str(MEM_MB)],
            capture_output=True, text=True, check=True,
        )
        row = json.loads(p.stdout.strip().splitlines()[-1])
        if best is None or row["wall_sec"] < best["wall_sec"]:
            best = row
    return best


def main() -> None:
    one_jvm = run(1, 4)
    four_jvm = run(4, 1)
    ratio = round(four_jvm["wall_sec"] / one_jvm["wall_sec"], 2)
    print(json.dumps({
        "metric": "executor_boundary_shuffle_overhead",
        "one_jvm_1x4": one_jvm,
        "four_jvm_4x1": four_jvm,
        "boundary_overhead_ratio": ratio,
    }))


if __name__ == "__main__":
    main()
