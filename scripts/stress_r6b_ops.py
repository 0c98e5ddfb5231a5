"""Stress evidence for the round-6 second-half operators: triangle
counting / neighborhood similarity at millions of edges (with an
adversarial hub that would sink the naive wedge join), BPE training at
sf0.1, and embedding quantization at ~200k vectors.

Usage: python scripts/stress_r6b_ops.py [cpus]

Graph: 1M-node functional graph (i -> 2i+1, i -> 7i+13 mod n; few
triangles), 2,000 disjoint 10-cliques (ids >= 10M; every clique node
must come out with EXACTLY C(9,2)=36 triangles and lcc 1.0 — a
value-level check at scale, not just a timing), and one hub wired to
200k base nodes. The hub is the point: a per-node neighbor-pair count
would expand C(200k, 2) = 2x10^10 wedges through it; the
degree-ordered forward orientation gives the hub out-degree ~0, so the
wedge join never sees the blowup.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from neosemantics_spark.operators.bpe import encode_bpe, train_bpe, word_histogram
    from neosemantics_spark.operators.embed import quantize_embeddings
    from neosemantics_spark.operators.graphalg import (
        neighborhood_similarity,
        triangle_stats,
    )
    from neosemantics_spark.session import get_spark

    spark = get_spark("stress-r6b", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    n = 1_000_000
    base = spark.range(n).select(F.col("id"))
    e_fn = base.select(
        F.col("id").alias("src"), ((F.col("id") * 2 + 1) % n).alias("dst")
    ).unionByName(
        base.select(F.col("id").alias("src"), ((F.col("id") * 7 + 13) % n).alias("dst"))
    )
    # 2,000 disjoint 10-cliques: ids 10M + c*10 + {0..9}
    cl = (
        spark.range(2_000)
        .select(F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"), (F.col("id") * 10).alias("c"))
        .select((F.lit(10_000_000) + F.col("c") + F.col("i")).alias("v"), F.col("c"))
    )
    e_cl = (
        cl.alias("a")
        .join(cl.alias("b"), "c")
        .filter(F.col("a.v") < F.col("b.v"))
        .select(F.col("a.v").alias("src"), F.col("b.v").alias("dst"))
    )
    hub = spark.range(200_000).select(
        F.lit(20_000_000).alias("src"), (F.col("id") * 5 % n).alias("dst")
    )
    edges = (
        e_fn.unionByName(e_cl)
        .unionByName(hub)
        .select(F.col("src").cast("string"), F.col("dst").cast("string"))
        .repartition(CPUS * 2)
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()

    t0 = time.time()
    tri = triangle_stats(edges).localCheckpoint(eager=True)
    n_nodes = tri.count()
    t_tri = time.time() - t0
    clique_rows = tri.filter(
        (F.col("uri").cast("long") >= 10_000_000) & (F.col("uri").cast("long") < 20_000_000)
    )
    bad = clique_rows.filter((F.col("triangles") != 36) | (F.col("lcc") != 1.0)).count()
    n_clique = clique_rows.count()
    hub_row = tri.filter(F.col("uri") == "20000000").first()
    total_tri = tri.agg((F.sum("triangles") / 3).alias("t")).first()["t"]
    print(
        f"[triangles] {n_edges} edges, {n_nodes} nodes: {t_tri:.1f} s | "
        f"clique nodes {n_clique} (bad: {bad}) | hub degree {hub_row['degree']}, "
        f"hub triangles {hub_row['triangles']} | total triangles {int(total_tri)}",
        flush=True,
    )
    assert bad == 0 and n_clique == 20_000

    # neighborhood similarity: cap the hub out (docstring contract) —
    # degree cap 100 keeps sum(deg^2) linear-ish in edges here
    t0 = time.time()
    deg = (
        edges.select(F.col("src").alias("u")).unionByName(edges.select(F.col("dst").alias("u")))
        .groupBy("u").agg(F.count("*").alias("d"))
    )
    hot = deg.filter(F.col("d") > 100).select("u")
    capped = (
        edges.join(hot.withColumnRenamed("u", "src"), "src", "left_anti")
        .join(hot.withColumnRenamed("u", "dst"), "dst", "left_anti")
    )
    n_sim = neighborhood_similarity(capped, min_jaccard=0.5).count()
    print(f"[neighbor_sim] capped graph: {n_sim} pairs >= 0.5 in {time.time()-t0:.1f} s", flush=True)

    # BPE at sf0.1: histogram (the corpus-sized stage), 30-merge train,
    # full encode
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.time()
    n_words = word_histogram(docs).count()
    t_hist = time.time() - t0
    t0 = time.time()
    merges = train_bpe(docs, n_merges=30, min_freq=2)
    t_train = time.time() - t0
    t0 = time.time()
    n_tok = encode_bpe(docs, merges).agg(F.sum("n_tokens")).first()[0]
    t_enc = time.time() - t0
    print(
        f"[bpe] sf0.1 hist {n_words} words {t_hist:.1f} s | train 30 merges "
        f"{t_train:.1f} s | encode {n_tok} tokens {t_enc:.1f} s",
        flush=True,
    )

    # quantization at 200k vectors (500 base x 400 replicas, jittered id)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    big = (
        emb.crossJoin(spark.range(40).withColumnRenamed("id", "rep"))
        .select((F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"), "embedding")
        .repartition(CPUS * 2)
        .localCheckpoint(eager=True)
    )
    nb = big.count()
    t0 = time.time()
    qn = quantize_embeddings(big, bits=8).count()
    print(f"[quantize] {nb} vectors -> {qn} coded in {time.time()-t0:.1f} s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
