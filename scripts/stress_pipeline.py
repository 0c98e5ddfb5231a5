"""500k-doc adversarial dedup-pipeline stress profile (BASELINE.md
"Adversarial corpora" section).

Input: the sf0.1 documents table replicated `REPS`× with per-replica
variant tails — maximally hot shingles (every doc shares the base
vocabulary), near-dup cliques of size REPS. Generated once under
/tmp/big_docs500 and reused.

Stages timed exactly like the round-3 profile so numbers are comparable
across rounds: exact dedup → minhash/LSH candidates → set-intersect
Jaccard verification → CC clustering (+ rep selection) → bigram LM
train/score.

Usage: python scripts/stress_pipeline.py [cpus] [reps]
Defaults: 16 100 (500k docs at sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
INPUT = f"/tmp/big_docs{REPS * 5}"

os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)

from pyspark.sql import functions as F  # noqa: E402

from neosemantics_spark.operators import dedup, lm  # noqa: E402
from neosemantics_spark.session import get_spark  # noqa: E402

spark = get_spark("stress", cpus=CPUS)
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", "32")

if not os.path.isdir(INPUT):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = base.count()
    parts = [
        base.select(
            (F.col("doc_id") + k * n).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" variant{k} tail")).alias("text"),
        )
        for k in range(REPS)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(INPUT)

docs = spark.read.parquet(INPUT)
t = time.perf_counter()
marks: dict[str, float] = {}


def mark(name: str) -> None:
    global t
    now = time.perf_counter()
    marks[name] = round(now - t, 1)
    print(f"{name}: {marks[name]}s", flush=True)
    t = now


kept = dedup.dedup_exact(docs, "text").cache()
kept.count()
mark("exact")
pairs = dedup.minhash_lsh_candidates(kept, num_hashes=8, bands=4).cache()
pairs.count()
mark("minhash_cand")
verified = (
    dedup.ngram_jaccard_pairs(kept, threshold=0.8, candidates=pairs)
    .select("a", "b")
    .cache()
)
verified.count()
mark("jaccard_verify")
clusters = dedup.near_dup_clusters(kept, verified)
reps = kept.join(clusters, "doc_id").filter(F.col("doc_id") == F.col("cluster_id")).cache()
reps.count()
mark("cc_cluster")
model = lm.train_bigram_lm(reps)
mark("lm_train")
scored = reps.join(lm.lm_score(reps, model).select("doc_id", "avg_logp"), "doc_id", "left").cache()
scored.count()
mark("lm_score")

import json  # noqa: E402

print(json.dumps({"cpus": CPUS, "reps": REPS, "stages": marks, "total": round(sum(marks.values()), 1)}))
spark.stop()
