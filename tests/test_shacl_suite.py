"""W3C-style SHACL triad suite: each case = (data.ttl, shapes.ttl,
results.ttl). The expected report is itself RDF parsed by OUR parser, and
verdicts are compared as sets on (focusNode, constraint component,
resultPath) — the reference harness's comparison
(SHACLValidationProceduresTest.java:1593-1762, set-equality :1705-1713).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neosemantics_spark.config import ARRAY, KEEP, GraphConfig
from neosemantics_spark.operators.materialize import materialize, transform_triples
from neosemantics_spark.rdf.terms import SH, BNode, IRI, Literal
from neosemantics_spark.rdf.turtle import parse_turtle
from neosemantics_spark.sources.parse import extract_triples
from neosemantics_spark.validation.shacl import ShaclValidator, compile_shapes

PRE = """@prefix ex: <http://example.org/> .
@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
"""

# name -> (data.ttl, shapes.ttl, results.ttl)
TRIADS = {
    "datatype": (
        PRE + """
ex:ok a ex:T ; ex:num "5"^^xsd:integer .
ex:bad a ex:T ; ex:num "five" .
""",
        PRE + """
ex:TS a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:num ; sh:datatype xsd:integer ] .
""",
        PRE + """
[] a sh:ValidationResult ; sh:focusNode ex:bad ;
   sh:sourceConstraintComponent sh:DatatypeConstraintComponent ;
   sh:resultPath ex:num .
""",
    ),
    "cardinality_inverse": (
        PRE + """
ex:a a ex:T ; ex:rel ex:b .
ex:b a ex:U .
ex:c a ex:U .
""",
        PRE + """
ex:US a sh:NodeShape ; sh:targetClass ex:U ;
  sh:property [ sh:path [ sh:inversePath ex:rel ] ; sh:minCount 1 ] .
""",
        PRE + """
[] a sh:ValidationResult ; sh:focusNode ex:c ;
   sh:sourceConstraintComponent sh:MinCountConstraintComponent ;
   sh:resultPath ex:rel .
""",
    ),
    "in_and_pattern": (
        PRE + """
ex:a a ex:T ; ex:color "red" ; ex:code "AB12" .
ex:b a ex:T ; ex:color "mauve" ; ex:code "nope" .
""",
        PRE + """
ex:TS a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:color ; sh:in ( "red" "green" "blue" ) ] ;
  sh:property [ sh:path ex:code ; sh:pattern "^[A-Z]{2}[0-9]+$" ] .
""",
        PRE + """
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:InConstraintComponent ; sh:resultPath ex:color .
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:PatternConstraintComponent ; sh:resultPath ex:code .
""",
    ),
    "ranges_and_lengths": (
        PRE + """
ex:a a ex:T ; ex:age "30"^^xsd:integer ; ex:nick "abcd" .
ex:b a ex:T ; ex:age "200"^^xsd:integer ; ex:nick "x" .
""",
        PRE + """
ex:TS a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:age ; sh:minInclusive 0 ; sh:maxInclusive 150 ] ;
  sh:property [ sh:path ex:nick ; sh:minLength 2 ; sh:maxLength 8 ] .
""",
        PRE + """
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:MaxInclusiveConstraintComponent ; sh:resultPath ex:age .
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:MinLengthConstraintComponent ; sh:resultPath ex:nick .
""",
    ),
    "has_value_and_nodekind": (
        PRE + """
ex:a a ex:T ; ex:flag ex:on ; ex:ref ex:x .
ex:b a ex:T ; ex:ref "literal-where-iri-expected" .
""",
        PRE + """
ex:TS a sh:NodeShape ; sh:targetClass ex:T ;
  sh:property [ sh:path ex:flag ; sh:hasValue ex:on ] ;
  sh:property [ sh:path ex:ref ; sh:nodeKind sh:IRI ] .
""",
        PRE + """
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:HasValueConstraintComponent ; sh:resultPath ex:flag .
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:NodeKindConstraintComponent ; sh:resultPath ex:ref .
""",
    ),
    "closed_and_disjoint": (
        PRE + """
ex:a a ex:T ; ex:p "1" ; ex:q "2" .
ex:b a ex:T ; ex:p "same" ; ex:q "same" ; ex:rogue "x" .
""",
        PRE + """
ex:TS a sh:NodeShape ; sh:targetClass ex:T ;
  sh:closed true ;
  sh:ignoredProperties ( ex:q ) ;
  sh:property [ sh:path ex:p ; sh:disjoint ex:q ] .
""",
        PRE + """
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:ClosedConstraintComponent .
[] a sh:ValidationResult ; sh:focusNode ex:b ;
   sh:sourceConstraintComponent sh:DisjointConstraintComponent ; sh:resultPath ex:p .
""",
    ),
}

# sh:targetQuery extension point (SHACLValidator.java:885-895 validates a
# query fragment; here a SQL predicate over the focus columns)
TRIADS["target_query"] = (
    PRE + """
ex:q1 a ex:T ; ex:num "1"^^xsd:integer .
ex:q2 a ex:T ; ex:other "x" .
ex:z3 a ex:T ; ex:other "y" .
""",
    PRE + """
ex:QS a sh:NodeShape ;
  sh:targetQuery "uri LIKE 'http://example.org/q%'" ;
  sh:property [ sh:path ex:num ; sh:minCount 1 ] .
""",
    PRE + """
[] a sh:ValidationResult ; sh:focusNode ex:q2 ;
   sh:sourceConstraintComponent sh:MinCountConstraintComponent ;
   sh:resultPath ex:num .
""",
)


def test_target_query_invalid_sql_rejected(spark):
    """A malformed sh:targetQuery fragment is rejected with the
    reference-style error (SHACLValidator.java:885-895)."""
    data = PRE + 'ex:a a ex:T ; ex:num "1"^^xsd:integer .\n'
    shapes = PRE + """
ex:QS a sh:NodeShape ;
  sh:targetQuery "no_such_column >< 3" ;
  sh:property [ sh:path ex:num ; sh:minCount 1 ] .
"""
    src = spark.createDataFrame(
        pd.DataFrame(
            [{"repo": "r", "path": "tq.ttl", "commit": "c" * 40, "lang": "Turtle",
              "content": data}]
        )
    )
    cfg = GraphConfig(handle_vocab_uris=KEEP, handle_multival=ARRAY)
    tables = materialize(transform_triples(extract_triples(src), cfg), cfg)
    with pytest.raises(ValueError, match="sh:targetQuery"):
        ShaclValidator(tables).validate(compile_shapes(shapes)).collect()


def _expected_verdicts(results_ttl: str) -> set:
    stmts = parse_turtle(results_ttl)
    by_subj = {}
    for s in stmts:
        key = s.s.value if isinstance(s.s, IRI) else "_:" + s.s.value
        by_subj.setdefault(key, {})[s.p.value] = s.o
    out = set()
    for props in by_subj.values():
        if SH + "sourceConstraintComponent" not in props:
            continue
        focus = props[SH + "focusNode"].value
        comp = props[SH + "sourceConstraintComponent"].value
        path = props.get(SH + "resultPath")
        out.add((focus, comp.split("#")[-1], path.value if path else None))
    return out


@pytest.mark.parametrize("name", sorted(TRIADS))
def test_shacl_triad(spark, name):
    data_ttl, shapes_ttl, results_ttl = TRIADS[name]
    src = spark.createDataFrame(
        pd.DataFrame(
            [{"repo": "r", "path": f"{name}.ttl", "commit": "c" * 40, "lang": "Turtle", "content": data_ttl}]
        )
    )
    cfg = GraphConfig(handle_vocab_uris=KEEP, handle_multival=ARRAY)
    tables = materialize(transform_triples(extract_triples(src), cfg), cfg)
    got_df = ShaclValidator(tables).validate(compile_shapes(shapes_ttl)).toPandas()
    got = {
        (r.focus_node, r.property_shape.split("#")[-1], r.result_path)
        for r in got_df.itertuples()
    }
    assert got == _expected_verdicts(results_ttl), f"{name}: {got}"
