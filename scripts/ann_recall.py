"""Recall@k study for the approximate ANN paths vs exact ground truth.

VERDICT r2 items 2/6: the LSH and IVF candidate plans are shape-correct,
but recall at realistic (nbits, bands) / (n_centroids, n_probe) was only
implied by the sf0.1 oracle. This script measures recall@k against
brute-force cosine at the base corpus AND a deterministic 10x blow-up
(each copy k perturbs every coordinate slightly, so near-duplicate
structure survives while ids stay unique) and prints one JSON line per
configuration. Results table lives in BASELINE.md.

Usage: python scripts/ann_recall.py [mult] [k] [n_queries]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neosemantics_spark.operators import similarity as sim  # noqa: E402
from neosemantics_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def blow_up(emb, mult: int):
    """mult deterministic copies: copy k shifts ids by k*n and perturbs
    every coordinate by 0.02*k*cos(dim+k) — distinct vectors, preserved
    neighborhood structure, no RNG."""
    n = emb.count()
    if mult <= 1:
        return emb, n
    def perturb(kf: float):
        # closure factory: a default arg would count as a lambda param
        return lambda x, i: x.cast("double") + F.lit(0.02 * kf) * F.cos(
            i.cast("double") + F.lit(kf)
        )

    parts = []
    for k in range(mult):
        parts.append(
            emb.select(
                (F.col("vec_id") + k * n).alias("vec_id"),
                F.transform("embedding", perturb(float(k))).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(eager=True), n * mult


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    spark = get_spark("ann-recall", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb, n = blow_up(base, mult)
    qids = list(range(n_q))
    bf = sim.brute_force_topk(emb, qids, k=k).select("query_id", "neighbor_id").cache()
    bf_n = bf.count()

    def recall(df) -> float:
        hits = (
            df.select("query_id", "neighbor_id")
            .join(bf, ["query_id", "neighbor_id"], "left_semi")
            .count()
        )
        return round(hits / bf_n, 3)

    rows = []
    for nbits, bands, probe_bits in (
        (4, 2, 0), (4, 4, 0), (6, 4, 0), (8, 8, 0),
        (4, 4, 1), (4, 4, 2), (6, 4, 1), (6, 4, 2), (8, 8, 2),
    ):
        t0 = time.perf_counter()
        r = recall(
            sim.lsh_topk(emb, qids, k=k, nbits=nbits, bands=bands, probe_bits=probe_bits)
        )
        rows.append(
            {"path": "lsh_topk", "n": n, "nbits": nbits, "bands": bands,
             "probe_bits": probe_bits,
             "recall": r, "sec": round(time.perf_counter() - t0, 2)}
        )
    n_cent = sim.suggest_n_centroids(n)
    for n_probe, refine, assign_k in (
        (4, 0, 1), (8, 0, 1), (8, 1, 1), (16, 1, 1),
        (8, 0, 2), (16, 0, 2), (16, 1, 2),
        (24, 0, 3), (32, 0, 4), (48, 0, 4), (32, 0, 5),
    ):
        t0 = time.perf_counter()
        r = recall(
            sim.ivf_topk(emb, qids, k=k, n_centroids=n_cent, n_probe=n_probe,
                         refine_iters=refine, assign_k=assign_k)
        )
        rows.append(
            {"path": "ivf_topk", "n": n, "n_centroids": n_cent,
             "n_probe": n_probe, "refine_iters": refine, "assign_k": assign_k,
             "recall": r, "sec": round(time.perf_counter() - t0, 2)}
        )
    for row in rows:
        print(json.dumps(row))
    spark.stop()


if __name__ == "__main__":
    main()
