"""RDF term model for the PySpark-native KG-construction engine.

Plain-Python value objects used only inside the Arrow-batched parser UDFs
(`neosemantics_spark.sources.parse`). Everything downstream of the parser is
columnar (DataFrame rows), so these classes never cross an executor
boundary as objects.

Semantics mirror rdf4j's term model as used by the reference
(neosemantics: /root/reference/src/main/java/n10s/RDFToLPGStatementProcessor.java:393-397):
subjects are IRI | BNode | QuotedTriple, objects add Literal.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"
SH = "http://www.w3.org/ns/shacl#"
SKOS = "http://www.w3.org/2004/02/skos/core#"

XSD_STRING = XSD + "string"
RDF_LANGSTRING = RDF + "langString"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"
OWL_SAMEAS = OWL + "sameAs"


class IRI(NamedTuple):
    value: str

    def n3(self) -> str:
        return f"<{self.value}>"


class BNode(NamedTuple):
    # parser-scoped local id (without the "_:" sigil)
    value: str

    def n3(self) -> str:
        return f"_:{self.value}"


class Literal(NamedTuple):
    lexical: str
    datatype: str = XSD_STRING
    lang: Optional[str] = None

    def n3(self) -> str:
        esc = (
            self.lexical.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )
        if self.lang:
            return f'"{esc}"@{self.lang}'
        if self.datatype and self.datatype != XSD_STRING:
            return f'"{esc}"^^<{self.datatype}>'
        return f'"{esc}"'


class QuotedTriple(NamedTuple):
    """RDF-star quoted triple term (Turtle-star << s p o >>)."""

    s: "Term"
    p: "Term"
    o: "Term"

    def n3(self) -> str:
        return f"<< {self.s.n3()} {self.p.n3()} {self.o.n3()} >>"


Term = Union[IRI, BNode, Literal, QuotedTriple]


class Statement(NamedTuple):
    s: Term
    p: Term
    o: Term
    g: Optional[str] = None  # named-graph IRI (quads), else None

    def spo(self) -> Tuple[Term, Term, Term]:
        return (self.s, self.p, self.o)
