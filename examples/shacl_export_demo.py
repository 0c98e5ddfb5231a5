"""Drive: import → SHACL validate → export to N-Triples files.

Run: spark-submit --py-files /tmp/ns_spark.zip examples/shacl_export_demo.py
"""

import tempfile

from pyspark.sql import functions as F

from neosemantics_spark.config import ARRAY, KEEP, GraphConfig
from neosemantics_spark.operators.export import graph_to_triples, write_ntriples
from neosemantics_spark.pipeline import import_rdf
from neosemantics_spark.session import get_spark
from neosemantics_spark.sources.datagen import fixture_corpus
from neosemantics_spark.validation.shacl import ShaclValidator, compile_shapes

SHAPES = """@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:ThingShape a sh:NodeShape ; sh:targetClass ex:Thing ;
  sh:property [ sh:path ex:size ; sh:datatype xsd:integer ; sh:minCount 1 ] ;
  sh:property [ sh:path ex:rel ; sh:class ex:Thing ] .
"""


def main() -> None:
    spark = get_spark("shacl-export-demo", cpus=8)
    cfg = GraphConfig(handle_vocab_uris=KEEP, handle_multival=ARRAY)
    res = import_rdf(fixture_corpus(spark), cfg, link_entities=False)
    validator = ShaclValidator(res.tables)
    verdicts = validator.validate(compile_shapes(SHAPES))
    print("[demo] SHACL verdicts:")
    verdicts.show(truncate=50)
    trip = graph_to_triples(res.tables, cfg)
    with tempfile.TemporaryDirectory() as d:
        write_ntriples(trip.filter(F.col("graph").isNull() & F.col("sspo").isNull()), d + "/nt")
        back = spark.read.text(d + "/nt")
        print(f"[demo] exported {back.count()} N-Triples lines; sample:")
        back.show(8, truncate=100)
    spark.stop()


if __name__ == "__main__":
    main()
