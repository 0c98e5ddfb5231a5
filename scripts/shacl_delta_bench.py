"""Delta-scoped SHACL validation at scale — the evidence the sf0.1 bench
cannot show (VERDICT r3 note in BASELINE.md: at 2000 nodes both paths are
dominated by fixed scan cost).

Builds a synthetic materialized graph DIRECTLY as DataFrames (no parse —
this measures the validator, nothing else): N typed nodes, ~90% carrying
a name property (10% minCount violations), a numeric rank property, plus
a rel per node for the class-constraint family. Then times

  full  = validate(shapes)                 — every focus node aggregated
  delta = validate_delta(shapes, 200 uris) — semi-join prunes BEFORE the
                                             cardinality aggregations

Usage: python scripts/shacl_delta_bench.py [n_nodes] [delta_size]
Prints one JSON line with both wall times and the speedup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neosemantics_spark.operators.materialize import GraphTables  # noqa: E402
from neosemantics_spark.session import get_spark  # noqa: E402
from neosemantics_spark.validation.shacl import ShaclValidator, compile_shapes  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

SHAPES = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix e: <http://e/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
e:TS a sh:NodeShape ; sh:targetClass e:T ;
  sh:property [ sh:path e:name ; sh:minCount 1 ; sh:minLength 3 ] ;
  sh:property [ sh:path e:rank ; sh:datatype xsd:integer ; sh:maxInclusive 1000000000 ] ;
  sh:property [ sh:path e:knows ; sh:class e:T ] .
"""


def build_tables(spark, n: int) -> GraphTables:
    ids = spark.range(0, n, 1, CPUS * 2)
    uri = F.concat(F.lit("http://e/n"), F.col("id").cast("string"))
    nodes = ids.select(
        uri.alias("uri"),
        F.lit(None).cast("string").alias("graph"),
        F.array(F.lit("http://e/T")).alias("labels"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    name_props = ids.filter(F.col("id") % 10 != 0).select(
        uri.alias("uri"),
        F.lit(None).cast("string").alias("graph"),
        F.lit("http://e/name").alias("prop"),
        F.array(F.concat(F.lit("name-"), F.col("id").cast("string"))).alias("values"),
        F.lit("STRING").alias("value_type"),
        F.lit("http://www.w3.org/2001/XMLSchema#string").alias("datatype"),
    )
    rank_props = ids.select(
        uri.alias("uri"),
        F.lit(None).cast("string").alias("graph"),
        F.lit("http://e/rank").alias("prop"),
        F.array((F.col("id") % 1000).cast("string")).alias("values"),
        F.lit("INTEGER").alias("value_type"),
        F.lit("http://www.w3.org/2001/XMLSchema#integer").alias("datatype"),
    )
    edges = ids.select(
        uri.alias("src"),
        F.lit("http://e/knows").alias("rel"),
        F.concat(F.lit("http://e/n"), ((F.col("id") + 1) % n).cast("string")).alias("dst"),
        F.lit(None).cast("string").alias("graph"),
        F.create_map().cast("map<string,string>").alias("props"),
    )
    return GraphTables(
        nodes=nodes, edges=edges, node_props=name_props.unionByName(rank_props)
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark("shacl-delta-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    tables = build_tables(spark, n)
    shapes = compile_shapes(SHAPES)
    v = ShaclValidator(tables)

    t0 = time.perf_counter()
    full_viol = v.validate(shapes).count()
    t_full = time.perf_counter() - t0

    delta = spark.range(0, d).select(
        F.concat(F.lit("http://e/n"), (F.col("id") * (n // d)).cast("string")).alias("uri")
    )
    t0 = time.perf_counter()
    delta_viol = v.validate_delta(shapes, delta).count()
    t_delta = time.perf_counter() - t0

    # same measurement over PARQUET tables with the prop-partitioned
    # props writer — the storage half of the win (partition pruning
    # removes the scan the semi-join alone cannot)
    import shutil
    import tempfile

    from neosemantics_spark.config import GraphConfig
    from neosemantics_spark.operators.materialize import write_node_props_partitioned

    tmp = tempfile.mkdtemp(prefix="shacl_delta_")
    # uri-sorted layout (what an Iceberg table with a sort order gives):
    # row-group min/max on uri become tight, so the delta In-predicate
    # SKIPS row groups instead of just filtering after the read
    tables.nodes.repartitionByRange(32, "uri").sortWithinPartitions("uri").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/nodes")
    tables.edges.repartitionByRange(32, "src").sortWithinPartitions("src").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/edges")
    write_node_props_partitioned(tables.node_props, f"{tmp}/props", GraphConfig())
    pt = GraphTables(
        nodes=spark.read.parquet(f"{tmp}/nodes"),
        edges=spark.read.parquet(f"{tmp}/edges"),
        node_props=spark.read.parquet(f"{tmp}/props"),
    )
    vp = ShaclValidator(pt)
    t0 = time.perf_counter()
    pq_full = vp.validate(shapes).count()
    t_pq_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    pq_delta = vp.validate_delta(shapes, delta).count()
    t_pq_delta = time.perf_counter() - t0
    assert (pq_full, pq_delta) == (full_viol, delta_viol)
    # clustered delta — the realistic per-batch shape (one incremental
    # run's touched nodes are the ids IT minted, a contiguous range)
    cdelta = spark.range(n // 2, n // 2 + d).select(
        F.concat(F.lit("http://e/n"), F.col("id").cast("string")).alias("uri")
    )
    t0 = time.perf_counter()
    pq_cdelta = vp.validate_delta(shapes, cdelta).count()
    t_pq_cdelta = time.perf_counter() - t0
    shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "shacl_delta_vs_full",
                "n_nodes": n,
                "delta_size": d,
                "full_sec": round(t_full, 2),
                "full_violations": full_viol,
                "delta_sec": round(t_delta, 2),
                "delta_violations": delta_viol,
                "speedup": round(t_full / t_delta, 1),
                "parquet_full_sec": round(t_pq_full, 2),
                "parquet_delta_sec": round(t_pq_delta, 2),
                "parquet_speedup": round(t_pq_full / t_pq_delta, 1),
                "parquet_clustered_delta_sec": round(t_pq_cdelta, 2),
                "parquet_clustered_delta_violations": pq_cdelta,
                "parquet_clustered_speedup": round(t_pq_full / t_pq_cdelta, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
