"""Extra benchmarks for optimization work (guide §1.1/§1.4) — NOT the
frozen driver bench. Mirrors bench.py's stage list but:

- runs the whole suite R times inside ONE warm session (separates JVM/JIT
  warmup from steady-state compute; bench.py's first sample is ~1.6x its
  third on this host),
- reports per-stage seconds for every repeat plus min/median,
- optional `--stages a,b,c` to run only a subset of the dataops stages
  (the kg_* construction chain always runs as a unit — its stages share
  cached state exactly like bench.py),
- `--plans DIR --suffix before|after` dumps `.explain("formatted")` for
  each requested query DataFrame instead of timing.

Numbers printed here are cited in OPTIMIZATION_r07.md; the driver's
grading numbers come from the frozen bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_FILES = int(os.environ.get("BENCH_FILES", "2000"))
TPF = int(os.environ.get("BENCH_TPF", "40"))

DATAOPS = [
    "dedup_minhash_lsh", "dedup_simhash", "ann_topk", "ann_ivf",
    "text_quality", "decontam", "hash_split", "token_budget_sample",
    "temperature_mix", "pack_sequences", "nb_classify", "semantic_dedup",
    "lm_score_trigram", "lm_score_kn5", "events_window", "orders_rdf",
    "corpus_profile", "embedding_quantize", "bpe_word_hist",
]
GRAPH = [("graph_pagerank", "kg_pagerank"), ("graph_triangles", "kg_triangles")]


def run_suite(spark, qs, timings, stages=None):
    from pyspark.sql import functions as F

    from neosemantics_spark.config import KEEP, GraphConfig
    from neosemantics_spark.operators.cc import canonical_map, canonicalize_triples
    from neosemantics_spark.operators.export import graph_to_triples, to_ntriples_lines
    from neosemantics_spark.operators.materialize import materialize, transform_triples
    from neosemantics_spark.operators import similarity as sim
    from neosemantics_spark.sources.datagen import scale_corpus
    from neosemantics_spark.sources.parse import extract_triples
    from neosemantics_spark.validation.shacl import ShaclValidator, compile_shapes

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        out = fn()
        timings.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        return out

    want = lambda n: stages is None or n in stages  # noqa: E731
    cleanup = []
    if stages is None or any(s.startswith("kg_") for s in stages):
        corpus = scale_corpus(spark, N_FILES, TPF, partitions=CPUS * 2, fmt="Turtle")
        cfg = GraphConfig(handle_vocab_uris=KEEP)
        raw = extract_triples(corpus).cache()
        cleanup.append(raw)
        timed("kg_parse", raw.count)
        t = transform_triples(raw, cfg)
        t = timed("kg_cc", lambda: canonicalize_triples(t, canonical_map(t)).cache())
        cleanup.append(t)
        timed("kg_cc_apply", t.count)
        tables = materialize(t, cfg, cache_intermediate=True)
        tables = tables._replace(nodes=tables.nodes.cache(), edges=tables.edges.cache())
        cleanup += [tables.nodes, tables.edges, tables.node_props]
        timed("kg_nodes", tables.nodes.count)
        timed("kg_edges", tables.edges.count)
        timed("kg_node_props", tables.node_props.count)
        shapes = compile_shapes(
            """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix v: <http://example.org/voc#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
v:EntityShape a sh:NodeShape ; sh:targetClass v:Entity ;
  sh:property [ sh:path v:rank ; sh:datatype xsd:integer ; sh:minCount 1 ] ;
  sh:property [ sh:path v:name ; sh:minLength 3 ] .
"""
        )
        timed("kg_shacl", ShaclValidator(tables).validate(shapes).count)
        delta_nodes = tables.nodes.select("uri").filter(F.crc32("uri") % 100 == 0)
        timed(
            "kg_shacl_delta",
            ShaclValidator(tables).validate_delta(shapes, delta_nodes).count,
        )
        timed(
            "kg_export",
            to_ntriples_lines(
                graph_to_triples(tables, cfg).filter(F.col("sspo").isNull())
            ).count,
        )

    for name in DATAOPS:
        if want(name):
            timed(name, lambda n=name: qs[n](spark, SF_DIR).count())
    for key, qname in GRAPH:
        if want(key):
            timed(key, lambda n=qname: qs[n](spark, SF_DIR).count())

    if stages is None or any(s.startswith(("embedding_near", "ann_recall")) for s in (stages or [])):
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ann_nbits = sim.suggest_nbits(emb.count())
        if want("embedding_near_dups"):
            timed(
                "embedding_near_dups",
                lambda: sim.embedding_near_dups(
                    emb, threshold=0.5, nbits=ann_nbits, bands=2
                ).count(),
            )
        if want("ann_recall_lsh") or want("ann_recall_ivf"):
            qids, rk = list(range(20)), 10
            bf = (
                sim.brute_force_topk(emb, qids, k=rk)
                .select("query_id", "neighbor_id")
                .cache()
            )
            bf_n = bf.count()
            cleanup.append(bf)

            def _recall(df):
                return round(
                    df.select("query_id", "neighbor_id")
                    .join(bf, ["query_id", "neighbor_id"], "left_semi")
                    .count()
                    / bf_n,
                    3,
                )

            if want("ann_recall_lsh"):
                timed(
                    "ann_recall_lsh",
                    lambda: _recall(
                        sim.lsh_topk(emb, qids, k=rk, nbits=4, bands=4, probe_bits=1)
                    ),
                )
            if want("ann_recall_ivf"):
                timed(
                    "ann_recall_ivf",
                    lambda: _recall(
                        sim.ivf_topk(
                            emb, qids, k=rk, n_centroids=None, n_probe=16,
                            refine_iters=0, assign_k=2,
                        )
                    ),
                )
    for df in cleanup:
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001
            pass


def dump_plans(spark, qs, names, out_dir, suffix):
    """Write .explain('formatted') for each named dataops query DF."""
    from neosemantics_spark.plans.explain import formatted_plan

    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        if n not in qs:
            print(f"skip {n}: not a queries() entry", file=sys.stderr)
            continue
        df = qs[n](spark, SF_DIR)
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {n}_{suffix}.txt", file=sys.stderr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stages", type=str, default=None,
                    help="comma list; default = full bench.py stage set")
    ap.add_argument("--plans", type=str, default=None,
                    help="dump plans to this dir instead of timing")
    ap.add_argument("--suffix", type=str, default="before")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from neosemantics_spark.session import get_spark

    spark = get_spark("bench_extra", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    if args.plans:
        names = args.stages.split(",") if args.stages else list(qs)
        dump_plans(spark, qs, names, args.plans, args.suffix)
        spark.stop()
        return

    stages = set(args.stages.split(",")) if args.stages else None
    timings: dict[str, list[float]] = {}
    for _ in range(args.repeats):
        run_suite(spark, qs, timings, stages)
    import statistics

    summary = {
        n: {
            "all": v,
            "min": min(v),
            "median": round(statistics.median(v), 3),
        }
        for n, v in timings.items()
    }
    print(json.dumps(summary, indent=1))
    totals = [round(sum(v[i] for v in timings.values()), 3)
              for i in range(len(next(iter(timings.values()))))]
    print(json.dumps({"totals_per_repeat": totals}))
    spark.stop()


if __name__ == "__main__":
    main()
