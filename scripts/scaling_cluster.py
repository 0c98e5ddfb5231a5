"""North-rule scaling evidence with REAL executor JVMs.

`local[k]` threads share one JVM heap — allocator/GC contention between
threads is a local-mode artifact that a real cluster doesn't have (each
executor is its own JVM). Spark's `local-cluster[n, cores, mem]` test
master spawns n separate executor JVMs, so this harness measures the thing
the north rule actually asks for: the same job at N executors vs 4N
executors with per-executor resources held constant.

Usage: python scripts/scaling_cluster.py [n_exec] [cores_per_exec] [files] [tpf]
Default: 1 vs 4 executors x 4 cores x 12g.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N_EXEC = int(sys.argv[1]) if len(sys.argv) > 1 else 1
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 4
FILES = int(sys.argv[3]) if len(sys.argv) > 3 else 24000
TPF = int(sys.argv[4]) if len(sys.argv) > 4 else 60
MEM_MB = int(os.environ.get("SCALING_EXEC_MEM_MB", "12288"))
REPS = int(os.environ.get("SCALING_REPS", "2"))

JOB = r"""
import json, os, subprocess, sys, time
sys.path.insert(0, "/root/repo")
# ship the package to the executor JVMs — the spark-submit --py-files path
ZIP = "/tmp/ns_spark_pkg.zip"
if not os.path.exists(ZIP):
    subprocess.run(["zip", "-qr", ZIP, "neosemantics_spark", "-x", "*.pyc"],
                   cwd="/root/repo", check=True)
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from neosemantics_spark.config import KEEP, GraphConfig
from neosemantics_spark.operators.cc import canonical_map, canonicalize_triples
from neosemantics_spark.operators.export import graph_to_triples, to_ntriples_lines
from neosemantics_spark.operators.materialize import materialize, transform_triples
from neosemantics_spark.sources.datagen import scale_corpus
from neosemantics_spark.sources.parse import extract_triples

n_exec, cores, files, tpf, mem_mb = map(int, sys.argv[1:6])
total = n_exec * cores
spark = (
    SparkSession.builder.appName(f"scale-{n_exec}x{cores}")
    .master(f"local-cluster[{n_exec},{cores},{mem_mb}]")
    .config("spark.executor.memory", f"{mem_mb - 1024}m")
    .config("spark.sql.shuffle.partitions", str(total * 4))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile(ZIP)
corpus = scale_corpus(spark, files, tpf, partitions=total * 4, fmt="Turtle")
parse_only = os.environ.get("SCALING_STAGES", "") == "parse"
t0 = time.perf_counter()
stages = {}
def mark(name):
    stages[name] = round(time.perf_counter() - t0 - sum(stages.values()), 2)
cfg = GraphConfig(handle_vocab_uris=KEEP)
if parse_only:
    # the 100 TB-dominant stage in isolation: a pure narrow map (no
    # shuffle, no cache) — measures executor-JVM parse scaling without
    # the single-host loopback-shuffle artifact
    raw = extract_triples(corpus)
    n = raw.count()
    mark("parse")
    wall = time.perf_counter() - t0
    print(json.dumps({"executors": n_exec, "cores_per_exec": cores, "triples": n,
                      "wall_sec": round(wall, 2), "stages": stages,
                      "tps": round(n / wall, 1)}))
    spark.stop()
    sys.exit(0)
raw = extract_triples(corpus).cache()
n = raw.count()
mark("parse")
t = transform_triples(raw, cfg)
t = canonicalize_triples(t, canonical_map(t)).cache()
t.count()
mark("cc")
tables = materialize(t, cfg, cache_intermediate=True)
tables = tables._replace(nodes=tables.nodes.cache(), edges=tables.edges.cache())
nn = tables.nodes.count()
ne = tables.edges.count()
tables.node_props.count()
mark("materialize")
nx = to_ntriples_lines(graph_to_triples(tables, cfg).filter(F.col("sspo").isNull())).count()
mark("export")
wall = time.perf_counter() - t0
print(json.dumps({"executors": n_exec, "cores_per_exec": cores, "triples": n,
                  "nodes": nn, "edges": ne, "exported": nx,
                  "wall_sec": round(wall, 2), "stages": stages,
                  "tps": round(n / wall, 1)}))
spark.stop()
"""


def run(n_exec: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", JOB, str(n_exec), str(CORES), str(FILES), str(TPF), str(MEM_MB)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:])
        raise RuntimeError("job produced no output")
    return json.loads(lines[-1])


def best(n_exec: int) -> dict:
    return min((run(n_exec) for _ in range(REPS)), key=lambda r: r["wall_sec"])


def main() -> None:
    small = best(N_EXEC)
    big = best(4 * N_EXEC)
    eff = round((big["tps"] / small["tps"]) / 4, 3)
    print(json.dumps({"N": small, "4N": big, "scaling_efficiency": eff}))


if __name__ == "__main__":
    main()
