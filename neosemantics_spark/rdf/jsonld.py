"""Minimal JSON-LD 1.0 expansion → triples.

Covers the subset exercised by the reference's JSON-LD fixtures
(/root/reference/src/test/resources/mini-ld.json and friends, asserted in
RDFProceduresTest.java:444-468): @context term→IRI mapping with @id/@type
coercion and @vocab, @id, @type, value objects (@value/@language/@type),
nested node objects, arrays, @graph, @list.

Runs inside Arrow-batched pandas UDFs only.
"""

from __future__ import annotations

import json
from typing import Any, List, Optional

from .terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD,
    XSD_STRING,
    BNode,
    IRI,
    Literal,
    Statement,
    Term,
)

_KEYWORDS = {"@context", "@id", "@type", "@value", "@language", "@graph", "@list", "@set", "@reverse", "@vocab", "@base"}


class _Ctx:
    def __init__(self) -> None:
        self.terms: dict = {}  # term -> {"@id": iri, "@type": coercion, "@language": lang}
        self.vocab: Optional[str] = None
        self.base: Optional[str] = None

    def child(self) -> "_Ctx":
        c = _Ctx()
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.base = self.base
        return c


class JsonLdParser:
    def __init__(self) -> None:
        self._anon = 0
        self.statements: List[Statement] = []

    def _new_bnode(self) -> BNode:
        self._anon += 1
        return BNode(f"genid{self._anon}")

    def _parse_context(self, ctx: _Ctx, spec: Any) -> _Ctx:
        if spec is None:
            return _Ctx()
        if isinstance(spec, list):
            for item in spec:
                ctx = self._parse_context(ctx, item)
            return ctx
        if isinstance(spec, str):
            # remote contexts unsupported — treat as vocab-less no-op
            return ctx
        out = ctx.child()
        for k, v in spec.items():
            if k == "@vocab":
                out.vocab = v
            elif k == "@base":
                out.base = v
            elif k.startswith("@"):
                continue
            elif isinstance(v, str):
                out.terms[k] = {"@id": v}
            elif isinstance(v, dict):
                out.terms[k] = v
        return out

    def _expand_iri(self, ctx: _Ctx, value: str, vocab: bool = False) -> Optional[str]:
        if value.startswith("@"):
            return None
        if ":" in value:
            pfx, local = value.split(":", 1)
            if pfx in ctx.terms and not local.startswith("//"):
                base = ctx.terms[pfx].get("@id", "")
                return base + local
            return value  # absolute IRI (or blank-node _:x handled by caller)
        if value in ctx.terms:
            tid = ctx.terms[value].get("@id")
            if tid:
                return self._expand_iri(ctx, tid, vocab=True)
        if vocab and ctx.vocab:
            return ctx.vocab + value
        if ctx.base:
            return ctx.base + value
        return value

    def _node_term(self, ctx: _Ctx, iri: str) -> Term:
        if iri.startswith("_:"):
            return BNode(iri[2:])
        return IRI(iri)

    def _to_object(self, ctx: _Ctx, value: Any, term_def: dict) -> Optional[Term]:
        coerce = term_def.get("@type")
        lang = term_def.get("@language")
        if isinstance(value, dict):
            if "@value" in value:
                lex = value["@value"]
                vlang = value.get("@language", lang)
                vtype = value.get("@type")
                if isinstance(lex, bool):
                    return Literal("true" if lex else "false", XSD + "boolean")
                if isinstance(lex, int):
                    return Literal(str(lex), XSD + "integer")
                if isinstance(lex, float):
                    return Literal(repr(lex), XSD + "double")
                if vtype:
                    return Literal(str(lex), self._expand_iri(ctx, vtype, vocab=True) or XSD_STRING)
                if vlang:
                    return Literal(str(lex), "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", vlang)
                return Literal(str(lex), XSD_STRING)
            if "@list" in value:
                items = value["@list"]
                if not items:
                    return IRI(RDF_NIL)
                head = self._new_bnode()
                cur = head
                for k, item in enumerate(items):
                    obj = self._to_object(ctx, item, {})
                    if obj is not None:
                        self.statements.append(Statement(cur, IRI(RDF_FIRST), obj, None))
                    nxt: Term = IRI(RDF_NIL) if k == len(items) - 1 else self._new_bnode()
                    self.statements.append(Statement(cur, IRI(RDF_REST), nxt, None))
                    cur = nxt
                return head
            return self._parse_node(ctx, value)
        if isinstance(value, bool):
            if coerce == "@id":
                return None
            return Literal("true" if value else "false", XSD + "boolean")
        if isinstance(value, int):
            return Literal(str(value), XSD + "integer")
        if isinstance(value, float):
            return Literal(repr(value), XSD + "double")
        if isinstance(value, str):
            if coerce == "@id":
                iri = self._expand_iri(ctx, value)
                return self._node_term(ctx, iri) if iri else None
            if coerce == "@vocab":
                iri = self._expand_iri(ctx, value, vocab=True)
                return self._node_term(ctx, iri) if iri else None
            if coerce and not coerce.startswith("@"):
                return Literal(value, self._expand_iri(ctx, coerce, vocab=True) or XSD_STRING)
            if lang:
                return Literal(value, "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", lang)
            return Literal(value, XSD_STRING)
        return None

    def _parse_node(self, ctx: _Ctx, node: dict, graph: Optional[str] = None) -> Optional[Term]:
        if "@context" in node:
            ctx = self._parse_context(ctx, node["@context"])
        if "@graph" in node:
            gid = None
            if "@id" in node:
                gid = self._expand_iri(ctx, node["@id"])
            items = node["@graph"]
            if isinstance(items, dict):
                items = [items]
            for item in items:
                self._parse_node(ctx, item, graph=gid)
            # a node with only @graph/@context/@id contributes no subject triples
            rest = {k: v for k, v in node.items() if k not in ("@context", "@graph", "@id")}
            if not rest:
                return None
        sid = node.get("@id")
        if sid is not None:
            subj = self._node_term(ctx, self._expand_iri(ctx, sid) or sid)
        else:
            subj = self._new_bnode()
        types = node.get("@type", [])
        if isinstance(types, str):
            types = [types]
        for t in types:
            t_iri = self._expand_iri(ctx, t, vocab=True)
            if t_iri:
                self.statements.append(Statement(subj, IRI(RDF_TYPE), IRI(t_iri), graph))
        for key, value in node.items():
            if key in _KEYWORDS or key.startswith("@"):
                continue
            term_def = ctx.terms.get(key, {})
            pred_iri = self._expand_iri(ctx, key, vocab=True)
            if pred_iri is None or (":" not in pred_iri and ctx.vocab is None and key not in ctx.terms):
                continue  # term not defined and no vocab → dropped (JSON-LD expansion rule)
            pred = IRI(pred_iri)
            values = value if isinstance(value, list) else [value]
            for v in values:
                obj = self._to_object(ctx, v, term_def)
                if obj is not None:
                    self.statements.append(Statement(subj, pred, obj, graph))
        return subj

    def parse(self, text: str) -> List[Statement]:
        doc = json.loads(text)
        ctx = _Ctx()
        if isinstance(doc, list):
            for node in doc:
                self._parse_node(ctx, node)
        else:
            self._parse_node(ctx, doc)
        return self.statements


def parse_jsonld(text: str, base: Optional[str] = None) -> List[Statement]:
    p = JsonLdParser()
    return p.parse(text)
