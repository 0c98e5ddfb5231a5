"""500k-scale stress profile for the round-5 operators (BASELINE.md
"Round-5 operator additions" section).

Text side — the 500k-doc adversarial corpus from stress_pipeline.py
(/tmp/big_docs500, generated there if missing):
- pack_sequences: 64-shard GPT-style packing (per-shard window sort is
  the cost; shards are the parallel unit).
- temperature_mix: alpha=0.3 over 20 derived sources, budget = 20% of
  corpus tokens (one totals agg + a pure predicate — should be scan-
  bound).
- NB classifier: train on 250k docs (derived source labels), score the
  other 250k (count-table joins).

Embedding side — 500k vectors as 100 deterministic scalar-multiplied
replicas of the sf0.1 embedding table (same direction => cosine
exactly 1.0: every vector sits in a 100-clone clique, the adversarial
worst case for semantic dedup — ~24.7M verified pairs into CC):
- semantic_dedup at threshold 0.95 (nbits sized by suggest_nbits).
- cluster_balanced_sample at target 100, sqrt(n) centroids.

Usage: python scripts/stress_r5_ops.py [cpus]  (default 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
INPUT = "/tmp/big_docs500"
EMB_REPS = 100

os.environ["SPARK_GRAFT_CPUS"] = str(CPUS)

from pyspark.sql import functions as F  # noqa: E402

from neosemantics_spark.operators import classify, datasets, similarity  # noqa: E402
from neosemantics_spark.session import get_spark  # noqa: E402

spark = get_spark("stress-r5", cpus=CPUS)
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
        for k in range(100)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(INPUT)

docs = spark.read.parquet(INPUT).withColumn(
    "source", F.concat(F.lit("src"), (F.col("doc_id") % 20).cast("string"))
)
n_docs = docs.count()
marks: dict[str, float] = {}
t = time.perf_counter()


def mark(name: str) -> None:
    global t
    now = time.perf_counter()
    marks[name] = round(now - t, 2)
    t = now


# --- pack_sequences
packed = datasets.pack_sequences(docs, seq_tokens=2048, n_shards=64)
n_packed = packed.count()
mark("pack_sequences")

# --- temperature_mix (budget = 20% of corpus tokens)
total_tokens = docs.select(
    F.sum(F.size(datasets.norm_tokens(F.col("text")))).alias("t")
).first()["t"]
mixed = datasets.temperature_mix(
    docs, total_budget=0.2 * total_tokens, alpha=0.3, strata_col="source"
)
n_mixed = mixed.count()
mark("temperature_mix")

# --- NB classifier: train 250k / score 250k
train = docs.filter(F.col("doc_id") % 2 == 0)
test = docs.filter(F.col("doc_id") % 2 == 1)
model = classify.train_nb(train, "source")
mark("nb_train")
n_scored = classify.nb_score(test, model).count()
mark("nb_score")

# --- embedding side: 500k vectors (100 clone replicas per base vector)
base_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
n_base = base_emb.count()
emb = base_emb.select(
    F.explode(F.sequence(F.lit(0), F.lit(EMB_REPS - 1))).alias("k"),
    "vec_id",
    "embedding",
).select(
    (F.col("vec_id") + F.col("k") * n_base).alias("vec_id"),
    F.transform(
        "embedding", lambda x: x * (F.col("k").cast("float") + F.lit(1.0))
    ).alias("embedding"),
)
emb = emb.repartition(32).localCheckpoint(eager=True)  # materialize the
# blow-up once so every op below times its own work, not the generator
n_emb = emb.count()
mark("emb_generate")

nbits = similarity.suggest_nbits(n_emb)
sd = similarity.semantic_dedup(emb, threshold=0.95, nbits=nbits, bands=2)
n_reps = sd.filter(F.col("is_rep") == 1).count()
mark("semantic_dedup")

cs = similarity.cluster_balanced_sample(
    emb, target_per_cluster=100, n_centroids=similarity.suggest_n_centroids(n_emb)
)
n_sampled = cs.count()
mark("cluster_balanced_sample")

print(
    json.dumps(
        {
            "cpus": CPUS,
            "n_docs": n_docs,
            "n_emb": n_emb,
            "nbits": nbits,
            "stages_sec": marks,
            "n_packed": n_packed,
            "n_mixed": n_mixed,
            "n_scored": n_scored,
            "semantic_dedup_reps": n_reps,
            "cluster_sampled": n_sampled,
        }
    )
)
