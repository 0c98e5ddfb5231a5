"""MAP mode, applyNeo4jNaming, WKT points, strict datatype check,
shortform round-trip — the remaining vocab/datatype matrix cells
(RDFProceduresTest.java:880-935, 986-1115, 1674-1736, 2410-2525)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neosemantics_spark.config import ARRAY, IGNORE, KEEP, MAP, GraphConfig
from neosemantics_spark.functions import full_uri_from_short_form, short_form_from_full_uri
from neosemantics_spark.operators.materialize import materialize, transform_triples
from neosemantics_spark.operators.prefixes import build_prefix_map
from neosemantics_spark.sources.parse import extract_triples

TTL = """@prefix ex: <http://example.org/> .
@prefix geo: <http://www.opengis.net/ont/geosparql#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:place a ex:City ;
  ex:located_in ex:country1 ;
  ex:name "Springfield" ;
  ex:point "Point(1.5 -2.25 10)"^^geo:wktLiteral ;
  ex:mixed "7"^^xsd:integer ;
  ex:mixed "not a number" .
"""


@pytest.fixture(scope="module")
def raw(spark):
    src = spark.createDataFrame(
        pd.DataFrame(
            [{"repo": "r", "path": "p.ttl", "commit": "c" * 40, "lang": "Turtle", "content": TTL}]
        )
    )
    return extract_triples(src).cache()


def test_map_mode_with_fallback(spark, raw):
    cfg = GraphConfig(handle_vocab_uris=MAP)
    mapping = {"http://example.org/name": "title", "http://example.org/City": "Town"}
    tables = materialize(transform_triples(raw, cfg, mapping=mapping), cfg)
    row = tables.nodes.filter(F.col("uri") == "http://example.org/place").collect()[0]
    assert "title" in row["props"]          # mapped
    assert "mixed" in row["props"]          # IGNORE fallback → local name
    assert row["labels"] == ["Town"]


def test_ignore_neo4j_naming(spark, raw):
    cfg = GraphConfig(handle_vocab_uris=IGNORE, apply_neo4j_naming=True)
    tables = materialize(transform_triples(raw, cfg), cfg)
    row = tables.nodes.filter(F.col("uri") == "http://example.org/place").collect()[0]
    assert row["labels"] == ["City"]  # Capitalised label
    # rels are UPPERCASEd (RDFToLPGStatementProcessor.java:240-257)
    edges = tables.edges.collect()
    assert {e["rel"] for e in edges} == {"LOCATED_IN"}
    # props camelCase-ish: first letter lowered
    assert all(k[0].islower() for k in row["props"].keys())


def test_wkt_point_struct(spark, raw):
    from neosemantics_spark.operators.transforms import with_typed_values

    t = with_typed_values(raw)
    pt = t.filter(F.col("datatype").endswith("wktLiteral")).select("value_point", "value_type").collect()[0]
    assert pt["value_type"] == "POINT"
    assert pt["value_point"]["x"] == 1.5
    assert pt["value_point"]["y"] == -2.25
    assert pt["value_point"]["z"] == 10.0
    assert pt["value_point"]["crs"] == "cartesian"


def test_strict_datatype_check(spark, raw):
    """strict ⇒ values conflicting with the first-stored type are discarded
    (DirectStatementLoader.java:180-206)."""
    cfg = GraphConfig(handle_vocab_uris=KEEP, handle_multival=ARRAY, strict_data_type_check=True)
    tables = materialize(transform_triples(raw, cfg), cfg)
    row = tables.node_props.filter(F.col("prop") == "http://example.org/mixed").collect()[0]
    assert list(row["values"]) == ["7"]
    assert row["n_types"] == 2  # conflict recorded
    # non-strict keeps both as strings
    cfg2 = GraphConfig(handle_vocab_uris=KEEP, handle_multival=ARRAY)
    t2 = materialize(transform_triples(raw, cfg2), cfg2)
    row2 = t2.node_props.filter(F.col("prop") == "http://example.org/mixed").collect()[0]
    assert sorted(row2["values"]) == ["7", "not a number"]


def test_shortform_roundtrip_functions(spark):
    ns_to_prefix = build_prefix_map(["http://example.org/", "http://other.org/ns#"])
    df = spark.createDataFrame(
        pd.DataFrame({"iri": ["http://example.org/name", "http://other.org/ns#x",
                              "http://www.w3.org/2000/01/rdf-schema#label"]})
    )
    out = df.select(
        short_form_from_full_uri(F.col("iri"), ns_to_prefix).alias("short")
    ).select(
        "short", full_uri_from_short_form(F.col("short"), ns_to_prefix).alias("back")
    ).collect()
    shorts = [r["short"] for r in out]
    assert shorts == ["ns0__name", "ns1__x", "rdfs__label"]
    backs = [r["back"] for r in out]
    assert backs == [
        "http://example.org/name",
        "http://other.org/ns#x",
        "http://www.w3.org/2000/01/rdf-schema#label",
    ]
