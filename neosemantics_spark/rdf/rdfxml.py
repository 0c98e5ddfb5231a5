"""RDF/XML parser on xml.etree — the striped-syntax subset used by the
reference's RDF/XML fixtures (fibo-fragment.rdf, moviesontology.owl,
jeu-de-donnees-*.rdf; format list /root/reference/src/main/java/n10s/CommonProcedures.java:45-48).

Supported: rdf:RDF root (or a bare node element), rdf:Description and typed
node elements, rdf:about / rdf:ID / rdf:nodeID, property elements with
rdf:resource / rdf:nodeID / rdf:datatype / xml:lang / literal text /
nested node elements, rdf:parseType="Resource" | "Literal" | "Collection",
rdf:li containers, xml:base.

Runs inside Arrow-batched pandas UDFs only.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import List, Optional

from .terms import (
    RDF,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_STRING,
    BNode,
    IRI,
    Literal,
    Statement,
    Term,
)

_RDF_NS = "{" + RDF + "}"
_XML_NS = "{http://www.w3.org/XML/1998/namespace}"

_SYNTAX_ATTRS = {
    _RDF_NS + "about",
    _RDF_NS + "ID",
    _RDF_NS + "nodeID",
    _RDF_NS + "resource",
    _RDF_NS + "datatype",
    _RDF_NS + "parseType",
    _XML_NS + "lang",
    _XML_NS + "base",
}


def _split_qname(tag: str) -> str:
    """'{ns}local' → full IRI 'nslocal'."""
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


class RdfXmlParser:
    def __init__(self, base: Optional[str] = None):
        self.base = base
        self._anon = 0
        self.statements: List[Statement] = []

    def _new_bnode(self) -> BNode:
        self._anon += 1
        return BNode(f"genid{self._anon}")

    def _resolve(self, ref: str, base: Optional[str]) -> str:
        base = base or self.base
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", ref):
            return ref
        if base is None:
            return ref
        if ref.startswith("#") or not ref:
            return re.sub(r"#.*$", "", base) + ref
        return base.rsplit("/", 1)[0] + "/" + ref

    def _node_element(self, el: ET.Element, base: Optional[str]) -> Term:
        base = el.get(_XML_NS + "base", base)
        about = el.get(_RDF_NS + "about")
        rid = el.get(_RDF_NS + "ID")
        nid = el.get(_RDF_NS + "nodeID")
        if about is not None:
            subj: Term = IRI(self._resolve(about, base))
        elif rid is not None:
            subj = IRI(self._resolve("#" + rid, base))
        elif nid is not None:
            subj = BNode(nid)
        else:
            subj = self._new_bnode()
        tag_iri = _split_qname(el.tag)
        if tag_iri != RDF + "Description":
            self.statements.append(Statement(subj, IRI(RDF_TYPE), IRI(tag_iri), None))
        # attribute abbreviation: non-syntax attributes are string properties
        for attr, val in el.attrib.items():
            if attr in _SYNTAX_ATTRS or attr.startswith(_XML_NS):
                continue
            iri = _split_qname(attr)
            if iri.startswith(RDF) and iri != RDF_TYPE:
                continue
            if iri == RDF_TYPE:
                self.statements.append(Statement(subj, IRI(RDF_TYPE), IRI(self._resolve(val, base)), None))
            else:
                self.statements.append(Statement(subj, IRI(iri), Literal(val, XSD_STRING), None))
        li_counter = 0
        for child in el:
            li_counter = self._property_element(subj, child, base, li_counter)
        return subj

    def _property_element(self, subj: Term, el: ET.Element, base: Optional[str], li_counter: int) -> int:
        base = el.get(_XML_NS + "base", base)
        tag_iri = _split_qname(el.tag)
        if tag_iri == RDF + "li":
            li_counter += 1
            tag_iri = RDF + f"_{li_counter}"
        pred = IRI(tag_iri)
        resource = el.get(_RDF_NS + "resource")
        nid = el.get(_RDF_NS + "nodeID")
        datatype = el.get(_RDF_NS + "datatype")
        parse_type = el.get(_RDF_NS + "parseType")
        lang = el.get(_XML_NS + "lang")
        children = list(el)
        if resource is not None:
            self.statements.append(Statement(subj, pred, IRI(self._resolve(resource, base)), None))
        elif nid is not None:
            self.statements.append(Statement(subj, pred, BNode(nid), None))
        elif parse_type == "Resource":
            node = self._new_bnode()
            self.statements.append(Statement(subj, pred, node, None))
            inner_li = 0
            for child in children:
                inner_li = self._property_element(node, child, base, inner_li)
        elif parse_type == "Literal":
            xml_text = "".join(ET.tostring(c, encoding="unicode") for c in children)
            if el.text:
                xml_text = el.text + xml_text
            self.statements.append(
                Statement(subj, pred, Literal(xml_text, RDF + "XMLLiteral"), None)
            )
        elif parse_type == "Collection":
            if not children:
                self.statements.append(Statement(subj, pred, IRI(RDF_NIL), None))
            else:
                head = self._new_bnode()
                self.statements.append(Statement(subj, pred, head, None))
                cur = head
                for k, child in enumerate(children):
                    item = self._node_element(child, base)
                    self.statements.append(Statement(cur, IRI(RDF_FIRST), item, None))
                    nxt: Term = IRI(RDF_NIL) if k == len(children) - 1 else self._new_bnode()
                    self.statements.append(Statement(cur, IRI(RDF_REST), nxt, None))
                    cur = nxt
        elif children:
            obj = self._node_element(children[0], base)
            self.statements.append(Statement(subj, pred, obj, None))
        else:
            text = el.text or ""
            # property attributes on an empty property element → bnode object
            prop_attrs = {
                a: v
                for a, v in el.attrib.items()
                if a not in _SYNTAX_ATTRS and not a.startswith(_XML_NS)
            }
            if prop_attrs and not text.strip():
                node = self._new_bnode()
                self.statements.append(Statement(subj, pred, node, None))
                for attr, val in prop_attrs.items():
                    self.statements.append(Statement(node, IRI(_split_qname(attr)), Literal(val, XSD_STRING), None))
            elif datatype:
                self.statements.append(Statement(subj, pred, Literal(text, self._resolve(datatype, base)), None))
            elif lang:
                self.statements.append(
                    Statement(subj, pred, Literal(text, RDF + "langString", lang), None)
                )
            else:
                self.statements.append(Statement(subj, pred, Literal(text, XSD_STRING), None))
        return li_counter

    def parse(self, text: str) -> List[Statement]:
        root = ET.fromstring(text)
        base = root.get(_XML_NS + "base", self.base)
        if _split_qname(root.tag) == RDF + "RDF":
            for child in root:
                self._node_element(child, base)
        else:
            self._node_element(root, base)
        return self.statements


def parse_rdfxml(text: str, base: Optional[str] = None) -> List[Statement]:
    return RdfXmlParser(base).parse(text)
