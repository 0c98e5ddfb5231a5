"""End-to-end import pipeline drive: parse → transform → CC → materialize.

Run: spark-submit --py-files /tmp/ns_spark.zip examples/pipeline_demo.py
"""

from pyspark.sql import functions as F

from neosemantics_spark.config import ARRAY, SHORTEN, GraphConfig
from neosemantics_spark.pipeline import import_rdf
from neosemantics_spark.session import get_spark
from neosemantics_spark.sources.datagen import fixture_corpus


def main() -> None:
    spark = get_spark("pipeline-demo", cpus=8)
    cfg = GraphConfig(handle_vocab_uris=SHORTEN, handle_multival=ARRAY, keep_lang_tag=True)
    res = import_rdf(fixture_corpus(spark), cfg)
    print(
        f"[demo] parsed={res.triples_parsed} loaded={res.triples_loaded} "
        f"errors={res.parse_errors} prefixes={len(res.namespaces)}"
    )
    print("[demo] namespaces:", dict(sorted(res.namespaces.items())))
    print("[demo] nodes:")
    res.tables.nodes.orderBy("uri").show(30, truncate=44)
    print("[demo] edges:")
    res.tables.edges.orderBy("src", "rel").show(20, truncate=40)
    # canonicalization check: sameAs clique collapsed
    n = res.tables.nodes.filter(F.col("uri").isin("http://b.org/e9", "http://c.org/e5")).count()
    print(f"[demo] alias nodes remaining after CC (expect 0): {n}")
    spark.stop()


if __name__ == "__main__":
    main()
