"""Ontology importer: routing + OWL restriction assembly (§2.8;
onto/OntologyImporter.java, fixtures moviesontology.owl/onto1.owl style)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neosemantics_spark.operators.inference import (
    assemble_restrictions,
    route_ontology,
)
from neosemantics_spark.sources.parse import extract_triples

ONTO = """@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix ex: <http://example.org/onto#> .
ex:Person a owl:Class ; rdfs:label "Person" .
ex:Actor a owl:Class ; rdfs:subClassOf ex:Person .
ex:actedIn a owl:ObjectProperty ; rdfs:domain ex:Actor ; rdfs:range ex:Movie .
ex:name a owl:DatatypeProperty ; rdfs:domain ex:Person .
ex:Movie a owl:Class ; owl:equivalentClass ex:Film .
ex:Director a owl:Class ;
  rdfs:subClassOf [ a owl:Restriction ;
                    owl:onProperty ex:directed ;
                    owl:someValuesFrom ex:Movie ] .
ex:Remake a owl:Class ;
  owl:equivalentClass [ a owl:Restriction ;
                        owl:onProperty ex:basedOn ;
                        owl:minCardinality 1 ] .
"""


@pytest.fixture(scope="module")
def triples(spark):
    src = spark.createDataFrame(
        pd.DataFrame(
            [{"repo": "r", "path": "o.ttl", "commit": "c" * 40, "lang": "Turtle", "content": ONTO}]
        )
    )
    return extract_triples(src).cache()


def test_route_ontology(spark, triples):
    edges, kinds = route_ontology(triples)
    e = {(r["src"].split("#")[-1], r["rel"], r["dst"].split("#")[-1]) for r in edges.collect()
         if not r["dst"].startswith("bnode://")}
    assert ("Actor", "SCO", "Person") in e
    assert ("actedIn", "DOMAIN", "Actor") in e
    assert ("actedIn", "RANGE", "Movie") in e
    assert ("Movie", "EQC", "Film") in e
    k = {(r["name"].split("#")[-1], r["kind"]) for r in kinds.collect()}
    assert ("Person", "Class") in k
    assert ("actedIn", "Relationship") in k
    assert ("name", "Property") in k


def test_assemble_restrictions(spark, triples):
    res = assemble_restrictions(triples).collect()
    by_src = {r["src"].split("#")[-1]: r for r in res}
    d = by_src["Director"]
    assert d["rel"] == "SCO_RESTRICTION"
    assert d["dst"] == "http://example.org/onto#Movie"
    assert d["kind"] == "some"
    assert d["props"]["onProperty"] == "http://example.org/onto#directed"
    r = by_src["Remake"]
    assert r["rel"] == "EQC_RESTRICTION"
    assert r["kind"] == "cardinality"
    assert r["props"]["minCardinality"] == "1"
    assert r["dst"] == "http://example.org/onto#basedOn"  # cardinality → onProperty target
