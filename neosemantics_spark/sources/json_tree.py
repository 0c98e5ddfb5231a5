"""JSON-as-tree importer — `n10s.experimental.importJSONAsTree` analogue.

Reference: /root/reference/src/main/java/n10s/experimental/ExperimentalImports.java:28-31
and experimental/PlainJsonStatementLoader.java:10-28 — arbitrary JSON is
mapped to nodes/relationships hanging off a container node: objects become
(blank) nodes, scalar fields become properties, object/array fields become
relationships named after the key.

Spark shape: the same Arrow-batched mapInPandas stage as the RDF parsers,
emitting the standard triples schema, so everything downstream (transforms,
materialize, export) works on JSON trees unchanged. Bnode ids are
path-derived → deterministic (unlike the reference's node-id-based ones).
"""

from __future__ import annotations

import json
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame

from ..rdf.terms import RDF_TYPE, XSD, BNode, IRI, Literal, Statement, Term
from .parse import TRIPLES_SCHEMA, statements_to_rows

DEFAULT_NS = "http://example.org/json#"  # key → predicate namespace


def _json_statements(doc, container_iri: str, ns: str) -> List[Statement]:
    out: List[Statement] = []

    def node_for(path: str) -> BNode:
        return BNode("j" + path.replace("/", "_"))

    def walk(value, parent: Term, key: str, path: str) -> None:
        pred = IRI(ns + key)
        if isinstance(value, dict):
            node = node_for(path)
            out.append(Statement(parent, pred, node, None))
            out.append(Statement(node, IRI(RDF_TYPE), IRI(ns + key.capitalize()), None))
            for k, v in value.items():
                walk(v, node, k, f"{path}/{k}")
        elif isinstance(value, list):
            for i, item in enumerate(value):
                walk(item, parent, key, f"{path}/{i}")
        elif isinstance(value, bool):
            out.append(Statement(parent, pred, Literal("true" if value else "false", XSD + "boolean"), None))
        elif isinstance(value, int):
            out.append(Statement(parent, pred, Literal(str(value), XSD + "integer"), None))
        elif isinstance(value, float):
            out.append(Statement(parent, pred, Literal(repr(value), XSD + "double"), None))
        elif value is None:
            pass
        else:
            out.append(Statement(parent, pred, Literal(str(value), XSD + "string"), None))

    root = IRI(container_iri)
    if isinstance(doc, dict):
        for k, v in doc.items():
            walk(v, root, k, "/" + k)
    elif isinstance(doc, list):
        for i, item in enumerate(doc):
            walk(item, root, "item", f"/{i}")
    return out


def import_json_as_tree(
    src_files: DataFrame, container_base: str = "http://example.org/container/", ns: str = DEFAULT_NS
) -> DataFrame:
    """src_files rows whose `content` is arbitrary JSON → triples DF.
    Container IRI per document = container_base + path."""
    cols = ["repo", "path", "commit", "content"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in TRIPLES_SCHEMA.fields]
        for pdf in batches:
            rows: List[dict] = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                try:
                    doc = json.loads(content)
                    stmts = _json_statements(doc, container_base + path, ns)
                    rows.extend(statements_to_rows(stmts, repo, path, commit))
                except Exception as e:  # noqa: BLE001
                    rows.append(
                        {
                            **{n: None for n in names},
                            "repo": repo, "path": path, "commit": commit,
                            "stmt_idx": -1,
                            "parse_error": f"{type(e).__name__}: {e}"[:500],
                        }
                    )
            yield pd.DataFrame(rows, columns=names) if rows else pd.DataFrame(
                {c: pd.Series(dtype=object) for c in names}
            )

    return src_files.select(*cols).mapInPandas(run, schema=TRIPLES_SCHEMA)
