"""Persistent SHACL shapes store — the n10s.validation.shacl.import.* /
listShapes / dropShapes procedure family
(/root/reference/src/main/java/n10s/validation/ValidationProcedures.java:57-117).

The reference compiles a shapes document once and serializes the compiled
ValidatorConfig into the graph so later validate/validateTransaction calls
reuse it without re-shipping the document. Spark analogue: the shapes
Turtle document plus its compiled constraint-component listing persist as
parquet next to the checkpoint (driver-side metadata writes, like
MappingStore — shapes docs are KBs, not data). Every incremental batch
then validates its delta against the SAME stored shapes.

Listing rows mirror the reference's ConstraintComponent record
(ConstraintComponent.java:8-11): (target, propertyOrRelationshipPath,
param, value).
"""

from __future__ import annotations

import os
from typing import List, Optional

import pandas as pd
from pyspark.sql import SparkSession

from .shacl import CompiledShapes, compile_shapes

_LIST_SCHEMA = "target string, propertyOrRelationshipPath string, param string, value string"


def constraint_components(shapes: CompiledShapes) -> List[dict]:
    """Flatten compiled shapes into the reference's listing rows — one row
    per set constraint parameter (SHACLValidator's compiled-constraint
    enumeration backing listShapes)."""
    rows: List[dict] = []

    def add(target: Optional[str], path: Optional[str], param: str, value) -> None:
        rows.append(
            {
                "target": target,
                "propertyOrRelationshipPath": path,
                "param": param,
                "value": None if value is None else str(value),
            }
        )

    for c in shapes.props:
        tgt = c.target_class or (("query:" + c.target_query) if c.target_query else None)
        for param in (
            "min_count", "max_count", "datatype", "class_constraint", "node_kind",
            "has_value_uri", "has_value_literal", "in_literals", "in_uris",
            "pattern", "min_length", "max_length", "min_inclusive",
            "max_inclusive", "min_exclusive", "max_exclusive", "disjoint_path",
        ):
            v = getattr(c, param)
            if v is not None:
                add(tgt, c.path, param, v)
    for n in shapes.nodes:
        tgt = n.target_class or (("query:" + n.target_query) if n.target_query else None)
        if n.closed:
            add(tgt, None, "closed", True)
            if n.ignored_props:
                add(tgt, None, "ignored_props", ",".join(n.ignored_props))
        if n.not_class is not None:
            add(tgt, None, "not_class", n.not_class)
        if n.required_class is not None:
            add(tgt, None, "required_class", n.required_class)
    return rows


class ShapesStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.doc_path = os.path.join(root, "shacl_shapes", "doc")
        self.list_path = os.path.join(root, "shacl_shapes", "components")

    def import_shapes(self, shapes_doc: str) -> pd.DataFrame:
        """shacl.import.inline analogue: compile (rejecting bad docs
        BEFORE persisting, like the reference), store doc + listing,
        return the listing."""
        listing = pd.DataFrame(
            constraint_components(compile_shapes(shapes_doc)),
            columns=["target", "propertyOrRelationshipPath", "param", "value"],
        )
        self.spark.createDataFrame(
            pd.DataFrame([{"doc": shapes_doc}]), "doc string"
        ).coalesce(1).write.mode("overwrite").parquet(self.doc_path)
        self.spark.createDataFrame(listing, _LIST_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(self.list_path)
        return listing

    def list_shapes(self) -> pd.DataFrame:
        """listShapes analogue; empty frame when nothing is loaded."""
        try:
            return self.spark.read.parquet(self.list_path).toPandas()
        except Exception:  # noqa: BLE001 — nothing imported yet
            return pd.DataFrame(
                columns=["target", "propertyOrRelationshipPath", "param", "value"]
            )

    def drop_shapes(self) -> None:
        """dropShapes analogue."""
        import shutil

        for p in (self.doc_path, self.list_path):
            shutil.rmtree(p, ignore_errors=True)

    def compiled(self) -> Optional[CompiledShapes]:
        """Recompile the stored document (deterministic — same doc, same
        constraints); None when no shapes are loaded."""
        try:
            doc = self.spark.read.parquet(self.doc_path).first()["doc"]
        except Exception:  # noqa: BLE001
            return None
        return compile_shapes(doc)
