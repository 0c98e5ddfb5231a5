"""SHACL validation re-expressed as DataFrame constraint checks.

Reference pipeline (/root/reference/src/main/java/n10s/validation/):
shapes doc → 3 SPARQL extraction queries (SHACLValidator.java:59-180) →
constraint records → compiled Cypher violation queries
(SHACLValidator.java:1219-1533) → UNION batches (ValidatorConfig.java:115-145).

Here: shapes doc parsed DRIVER-SIDE with our own Turtle parser → constraint
records (plain dicts, the `ValidatorConfig` analogue) → each constraint
family compiles to one DataFrame check over the materialized graph tables
(broadcast-friendly: the shapes are tiny, the graph is huge) →
`unionByName` fan-in (no batching cap needed — Spark schedules stages in
parallel; SURVEY.md §2.6/L3).

Result schema follows ValidatorConfig.java:21-23 / ValidationResult.java:
(focus_node, node_type, shape_id, property_shape, offending_value,
 result_path, severity, result_message).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..operators.materialize import GraphTables
from ..rdf.terms import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, SH, XSD, BNode, IRI, Literal
from ..rdf.turtle import parse_turtle

SH_VIOLATION = SH + "Violation"

RESULT_SCHEMA = StructType(
    [
        StructField("focus_node", StringType()),
        StructField("node_type", StringType()),
        StructField("shape_id", StringType()),
        StructField("property_shape", StringType()),
        StructField("offending_value", StringType()),
        StructField("result_path", StringType()),
        StructField("severity", StringType()),
        StructField("result_message", StringType()),
    ]
)


@dataclass
class PropertyConstraint:
    """One property-shape row — the IR#1 record of SHACLValidator.java
    (constraint record per property shape, :969-1165)."""

    shape_id: str
    target_class: Optional[str]
    path: str
    inverse: bool = False
    target_query: Optional[str] = None
    min_count: Optional[int] = None
    max_count: Optional[int] = None
    datatype: Optional[str] = None
    class_constraint: Optional[str] = None
    node_kind: Optional[str] = None
    has_value_uri: Optional[str] = None
    has_value_literal: Optional[str] = None
    in_literals: Optional[List[str]] = None
    in_uris: Optional[List[str]] = None
    pattern: Optional[str] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    min_inclusive: Optional[float] = None
    max_inclusive: Optional[float] = None
    min_exclusive: Optional[float] = None
    max_exclusive: Optional[float] = None
    disjoint_path: Optional[str] = None
    severity: str = SH_VIOLATION
    message: Optional[str] = None


@dataclass
class NodeConstraint:
    """Closed-shape / class-level constraints (SHACLValidator.java:125-180)."""

    shape_id: str
    target_class: Optional[str]
    closed: bool = False
    target_query: Optional[str] = None
    ignored_props: List[str] = field(default_factory=list)
    allowed_props: List[str] = field(default_factory=list)
    not_class: Optional[str] = None
    required_class: Optional[str] = None
    severity: str = SH_VIOLATION


@dataclass
class CompiledShapes:
    props: List[PropertyConstraint]
    nodes: List[NodeConstraint]


def _term_key(t) -> str:
    if isinstance(t, IRI):
        return t.value
    if isinstance(t, BNode):
        return "_:" + t.value
    if isinstance(t, Literal):
        return t.lexical
    return str(t)


def compile_shapes(shapes_doc: str) -> CompiledShapes:
    """Parse a Turtle shapes document and extract constraint records —
    the driver-side analogue of the 3 SPARQL queries
    (SHACLValidator.java:59-123 property shapes, :125-151 closed shapes,
    :154-180 class constraints)."""
    stmts = parse_turtle(shapes_doc)
    spo: Dict[str, Dict[str, List]] = {}
    for s in stmts:
        sk = _term_key(s.s)
        spo.setdefault(sk, {}).setdefault(_term_key(s.p), []).append(s.o)

    def one(subj: str, pred: str):
        vals = spo.get(subj, {}).get(pred)
        return vals[0] if vals else None

    def rdf_list(head) -> List:
        out = []
        cur = head
        while cur is not None and not (isinstance(cur, IRI) and cur.value == RDF_NIL):
            ck = _term_key(cur)
            first = one(ck, RDF_FIRST)
            if first is not None:
                out.append(first)
            cur = one(ck, RDF_REST)
        return out

    props: List[PropertyConstraint] = []
    node_cons: List[NodeConstraint] = []
    for subj, pmap in spo.items():
        types = [_term_key(o) for o in pmap.get(RDF_TYPE, [])]
        is_shape = (SH + "NodeShape") in types or (SH + "property") in pmap
        if not is_shape:
            continue
        tc = one(subj, SH + "targetClass")
        # implicit class target: shape that is itself an rdfs/owl Class
        if tc is None and any(t.endswith("Class") for t in types):
            tc = IRI(subj)
        # sh:targetQuery extension point (SHACLValidator.java:885-895
        # validates a Cypher WHERE fragment; the Spark-native analogue is
        # a SQL predicate over the focus-node columns — SURVEY §7 known-
        # hard 6 sanctions this re-scoping)
        tq = one(subj, SH + "targetQuery")
        target_query = tq.lexical if isinstance(tq, Literal) else None
        if tc is None and target_query is None:
            continue
        target = _term_key(tc) if tc is not None else None
        sev_n = one(subj, SH + "severity")
        node_sev = _term_key(sev_n) if sev_n else SH_VIOLATION
        closed_v = one(subj, SH + "closed")
        ignored = [
            _term_key(x) for x in rdf_list(one(subj, SH + "ignoredProperties"))
        ]
        not_v = one(subj, SH + "not")
        required = one(subj, SH + "class")
        allowed: List[str] = []
        for ps in pmap.get(SH + "property", []):
            pk = _term_key(ps)
            path = one(pk, SH + "path")
            inverse = False
            if path is not None and isinstance(path, BNode):
                inv = one(_term_key(path), SH + "inversePath")
                if inv is not None:
                    path = inv
                    inverse = True
            if path is None:
                continue
            path_iri = _term_key(path)
            if not inverse:
                allowed.append(path_iri)
            c = PropertyConstraint(
                shape_id=subj, target_class=target, path=path_iri,
                inverse=inverse, target_query=target_query,
            )

            def geti(p):
                v = one(pk, SH + p)
                return int(v.lexical) if isinstance(v, Literal) else None

            def getf(p):
                v = one(pk, SH + p)
                return float(v.lexical) if isinstance(v, Literal) else None

            c.min_count = geti("minCount")
            c.max_count = geti("maxCount")
            dt = one(pk, SH + "datatype")
            c.datatype = _term_key(dt) if dt else None
            cls = one(pk, SH + "class")
            c.class_constraint = _term_key(cls) if cls else None
            nk = one(pk, SH + "nodeKind")
            c.node_kind = _term_key(nk) if nk else None
            hv = one(pk, SH + "hasValue")
            if isinstance(hv, Literal):
                c.has_value_literal = hv.lexical
            elif hv is not None:
                c.has_value_uri = _term_key(hv)
            inlist = rdf_list(one(pk, SH + "in"))
            if inlist:
                lits = [x.lexical for x in inlist if isinstance(x, Literal)]
                uris = [_term_key(x) for x in inlist if not isinstance(x, Literal)]
                c.in_literals = lits or None
                c.in_uris = uris or None
            pat = one(pk, SH + "pattern")
            c.pattern = pat.lexical if isinstance(pat, Literal) else None
            c.min_length = geti("minLength")
            c.max_length = geti("maxLength")
            c.min_inclusive = getf("minInclusive")
            c.max_inclusive = getf("maxInclusive")
            c.min_exclusive = getf("minExclusive")
            c.max_exclusive = getf("maxExclusive")
            dis = one(pk, SH + "disjoint")
            c.disjoint_path = _term_key(dis) if dis else None
            sev = one(pk, SH + "severity")
            c.severity = _term_key(sev) if sev else SH_VIOLATION
            msg = one(pk, SH + "message")
            c.message = msg.lexical if isinstance(msg, Literal) else None
            props.append(c)
        if closed_v is not None or not_v is not None or required is not None:
            node_cons.append(
                NodeConstraint(
                    shape_id=subj,
                    target_class=target,
                    target_query=target_query,
                    closed=isinstance(closed_v, Literal) and closed_v.lexical == "true",
                    ignored_props=ignored,
                    allowed_props=allowed,
                    not_class=_term_key(not_v) if not_v else None,
                    required_class=_term_key(required) if required else None,
                    severity=node_sev,
                )
            )
    return CompiledShapes(props=props, nodes=node_cons)


# ---------------------------------------------------------------- runtime
_XSD_CAST = {
    XSD + "integer": "long", XSD + "long": "long", XSD + "int": "long",
    XSD + "decimal": "double", XSD + "double": "double", XSD + "float": "double",
    XSD + "boolean": "boolean", XSD + "dateTime": "timestamp", XSD + "date": "date",
}


def _result(df: DataFrame, c, component: str, path, offending, message: str) -> DataFrame:
    return df.select(
        F.col("uri").alias("focus_node"),
        F.lit(c.target_class if c.target_class is not None else "query:" + (c.target_query or "")).alias("node_type"),
        F.lit(c.shape_id).alias("shape_id"),
        F.lit(SH + component).alias("property_shape"),
        offending.cast("string").alias("offending_value"),
        F.lit(path).cast("string").alias("result_path"),
        F.lit(c.severity).alias("severity"),
        F.lit(message).alias("result_message"),
    )


class ShaclValidator:
    """Runtime: constraint records + graph tables → results DF.

    Labels may be stored transformed (SHORTEN/IGNORE); pass `iri_map` to
    translate shape IRIs into stored form (the reference compiles the
    translated names straight into Cypher — SHACLValidator.java:1219+)."""

    def __init__(self, tables: GraphTables, iri_map=None):
        self.t = tables
        self.m = iri_map or (lambda x: x)
        # focus universe: nodes with their labels; props in long form;
        # out/in edges per (node, rel)
        self.nodes = tables.nodes.select("uri", "labels")
        self.props = tables.node_props
        self.edges = tables.edges
        # small-delta pushdown: when validate_delta collects the delta as
        # a literal uri list, every focus-side scan (nodes/props/edges)
        # carries an In(uri, ...) predicate that reaches the parquet
        # reader (row-group skipping) instead of a join that prunes only
        # AFTER the full scan — the O(delta) path for per-batch validation
        self._delta_uris: Optional[List[str]] = None

    # SQL functions a sh:targetQuery may NOT call: these escape the
    # declarative sandbox into arbitrary JVM invocation. The reference
    # EXPLAIN-validates its Cypher fragment (SHACLValidator.java:885-895);
    # Spark SQL needs an explicit denylist on the ANALYZED tree because
    # reflect()/java_method() are legal expressions.
    _FORBIDDEN_FNS = ("reflect", "java_method")

    def _focus(self, c, node_set: Optional[DataFrame] = None) -> DataFrame:
        """Focus-node selection: sh:targetClass label membership, or the
        sh:targetQuery extension point — a SQL predicate over the focus
        columns (uri, labels), validated before use exactly like the
        reference validates its Cypher fragment
        (SHACLValidator.java:885-895).

        `node_set` (DataFrame[uri]) intersects the focus set UP FRONT —
        the validateSet/delta scoping of SHACLValidator.java:922-936
        (node-set-scoped query variants): every downstream check family
        (incl. the cardinality and closed-shape aggregations) then prunes
        to the set via this one semi-join instead of aggregating the full
        graph and filtering results."""
        if c.target_class is not None:
            focus = self.nodes.filter(F.array_contains("labels", self.m(c.target_class)))
        else:
            q = c.target_query
            try:
                focus = self.nodes.filter(F.expr(q))
                focus.schema  # force analysis — rejects bad columns/syntax
            except Exception as e:  # noqa: BLE001
                raise ValueError(
                    f'Invalid SQL expression: "{q}". The SQL fragment in a '
                    "sh:targetQuery element should form a valid query when "
                    "embedded in the following template: "
                    '"SELECT * FROM nodes(uri, labels) WHERE <your sql>"'
                ) from e
            analyzed = focus._jdf.queryExecution().analyzed().toString().lower()
            for fn in self._FORBIDDEN_FNS:
                if fn + "(" in analyzed:
                    raise ValueError(
                        f'Forbidden function "{fn}" in sh:targetQuery "{q}": '
                        "shapes documents may only use pure SQL predicates "
                        "over (uri, labels)."
                    )
        if node_set is not None:
            if self._delta_uris is not None:
                # literal In predicate — pushes to the scan; exactly
                # equivalent to the semi-join (the list IS the node set)
                focus = focus.filter(F.col("uri").isin(self._delta_uris))
            else:
                focus = focus.join(node_set.select("uri"), "uri", "left_semi")
        return focus

    def _prop_vals(self, focus: DataFrame, path: str) -> DataFrame:
        p = self.props.filter(F.col("prop") == self.m(path))
        if self._delta_uris is not None:
            p = p.filter(F.col("uri").isin(self._delta_uris))
        p = p.select("uri", F.explode("values").alias("value"), "value_type", "datatype")
        return focus.select("uri").join(p, "uri", "inner")

    def _out_edges(self, focus: DataFrame, path: str, inverse: bool = False) -> DataFrame:
        e = self.edges.filter(F.col("rel") == self.m(path))
        if inverse:
            e = e.select(F.col("dst").alias("uri"), F.col("src").alias("other"))
        else:
            e = e.select(F.col("src").alias("uri"), F.col("dst").alias("other"))
        if self._delta_uris is not None:
            e = e.filter(F.col("uri").isin(self._delta_uris))
        return focus.select("uri").join(e, "uri", "inner")

    # ---------------- property-constraint checks (§2.6 table)
    def check_property(
        self, c: PropertyConstraint, node_set: Optional[DataFrame] = None
    ) -> List[DataFrame]:
        out: List[DataFrame] = []
        focus = self._focus(c, node_set)
        vals = self._prop_vals(focus, c.path)
        msg = c.message or ""

        if c.min_count is not None or c.max_count is not None:
            # cardinality = #values + #out-rels (inverse → in-rels)
            # (SHACLValidator.java:1418-1487)
            vc = vals.groupBy("uri").agg(F.count("*").alias("nv"))
            ec = self._out_edges(focus, c.path, c.inverse).groupBy("uri").agg(
                F.count("*").alias("ne")
            )
            card = (
                focus.select("uri")
                .join(vc, "uri", "left")
                .join(ec, "uri", "left")
                .select(
                    "uri",
                    (F.coalesce("nv", F.lit(0)) + F.coalesce("ne", F.lit(0))).alias("n"),
                )
            )
            if c.min_count is not None:
                bad = card.filter(F.col("n") < c.min_count)
                out.append(
                    _result(bad, c, "MinCountConstraintComponent", c.path, F.col("n"),
                            msg or f"minCount {c.min_count}")
                )
            if c.max_count is not None:
                bad = card.filter(F.col("n") > c.max_count)
                out.append(
                    _result(bad, c, "MaxCountConstraintComponent", c.path, F.col("n"),
                            msg or f"maxCount {c.max_count}")
                )

        if c.datatype is not None:
            cast_t = _XSD_CAST.get(c.datatype)
            if cast_t:
                bad = vals.filter(
                    F.expr(f"try_cast(value as {cast_t})").isNull() & F.col("value").isNotNull()
                )
            else:  # string-ish expected: any non-string stored type violates
                bad = vals.filter(~F.col("value_type").isin("STRING"))
            out.append(
                _result(bad, c, "DatatypeConstraintComponent", c.path, F.col("value"),
                        msg or f"datatype {c.datatype}")
            )
            # property used as relationship (SHACLValidator.java:1234-1256)
            rel_bad = self._out_edges(focus, c.path)
            out.append(
                _result(rel_bad, c, "DatatypeConstraintComponent", c.path, F.col("other"),
                        msg or "property used as relationship")
            )

        if c.class_constraint is not None:
            # object must bear the class label (J6 anti-join family,
            # SHACLValidator.java:1332-1354)
            e = self._out_edges(focus, c.path, c.inverse)
            labeled = self.nodes.select(F.col("uri").alias("other"), "labels")
            bad = e.join(labeled, "other", "left").filter(
                F.coalesce(
                    ~F.array_contains("labels", self.m(c.class_constraint)), F.lit(True)
                )
            )
            out.append(
                _result(bad, c, "ClassConstraintComponent", c.path, F.col("other"),
                        msg or f"class {c.class_constraint}")
            )
            # values stored as literals also violate sh:class
            out.append(
                _result(vals, c, "ClassConstraintComponent", c.path, F.col("value"),
                        msg or "literal where resource expected")
            )

        if c.node_kind is not None:
            if c.node_kind.endswith("Literal"):
                bad = self._out_edges(focus, c.path)
                out.append(
                    _result(bad, c, "NodeKindConstraintComponent", c.path, F.col("other"),
                            msg or "expected literal")
                )
            else:  # sh:IRI / sh:BlankNodeOrIRI: must not be a stored property
                out.append(
                    _result(vals, c, "NodeKindConstraintComponent", c.path, F.col("value"),
                            msg or "expected IRI")
                )

        if c.has_value_uri is not None:
            have = self._out_edges(focus, c.path).filter(
                F.col("other") == self.m(c.has_value_uri)
            )
            if c.path == RDF_TYPE:
                have = focus.filter(
                    F.array_contains("labels", self.m(c.has_value_uri))
                ).select("uri", F.lit(None).alias("other"))
            bad = focus.join(have.select("uri").distinct(), "uri", "left_anti")
            out.append(
                _result(bad, c, "HasValueConstraintComponent", c.path, F.lit(c.has_value_uri),
                        msg or f"missing required value {c.has_value_uri}")
            )
        if c.has_value_literal is not None:
            have = vals.filter(F.col("value") == c.has_value_literal)
            bad = focus.join(have.select("uri").distinct(), "uri", "left_anti")
            out.append(
                _result(bad, c, "HasValueConstraintComponent", c.path,
                        F.lit(c.has_value_literal),
                        msg or f"missing required value {c.has_value_literal}")
            )

        if c.in_literals is not None:
            bad = vals.filter(~F.col("value").isin(c.in_literals))
            out.append(
                _result(bad, c, "InConstraintComponent", c.path, F.col("value"),
                        msg or "value not in enumeration")
            )
        if c.in_uris is not None:
            allowed = [self.m(u) for u in c.in_uris]
            bad = self._out_edges(focus, c.path).filter(~F.col("other").isin(allowed))
            out.append(
                _result(bad, c, "InConstraintComponent", c.path, F.col("other"),
                        msg or "value not in enumeration")
            )

        if c.pattern is not None:
            bad = vals.filter(~F.col("value").rlike(c.pattern))
            out.append(
                _result(bad, c, "PatternConstraintComponent", c.path, F.col("value"),
                        msg or f"pattern {c.pattern}")
            )
        if c.min_length is not None:
            bad = vals.filter(F.length("value") < c.min_length)
            out.append(
                _result(bad, c, "MinLengthConstraintComponent", c.path, F.col("value"),
                        msg or f"minLength {c.min_length}")
            )
        if c.max_length is not None:
            bad = vals.filter(F.length("value") > c.max_length)
            out.append(
                _result(bad, c, "MaxLengthConstraintComponent", c.path, F.col("value"),
                        msg or f"maxLength {c.max_length}")
            )
        num = F.expr("try_cast(value as double)")
        if c.min_inclusive is not None:
            bad = vals.filter(num.isNull() | (num < c.min_inclusive))
            out.append(
                _result(bad, c, "MinInclusiveConstraintComponent", c.path, F.col("value"),
                        msg or f"minInclusive {c.min_inclusive}")
            )
        if c.max_inclusive is not None:
            bad = vals.filter(num.isNull() | (num > c.max_inclusive))
            out.append(
                _result(bad, c, "MaxInclusiveConstraintComponent", c.path, F.col("value"),
                        msg or f"maxInclusive {c.max_inclusive}")
            )
        if c.min_exclusive is not None:
            bad = vals.filter(num.isNull() | (num <= c.min_exclusive))
            out.append(
                _result(bad, c, "MinExclusiveConstraintComponent", c.path, F.col("value"),
                        msg or f"minExclusive {c.min_exclusive}")
            )
        if c.max_exclusive is not None:
            bad = vals.filter(num.isNull() | (num >= c.max_exclusive))
            out.append(
                _result(bad, c, "MaxExclusiveConstraintComponent", c.path, F.col("value"),
                        msg or f"maxExclusive {c.max_exclusive}")
            )
        if c.disjoint_path is not None:
            # value sets of two props must not overlap (arrays_overlap;
            # SHACLValidator.java:1446-1479)
            a = self._prop_vals(focus, c.path)
            b = self._prop_vals(focus, c.disjoint_path).select(
                "uri", F.col("value").alias("value_b")
            )
            bad = a.join(b, "uri").filter(F.col("value") == F.col("value_b"))
            out.append(
                _result(bad, c, "DisjointConstraintComponent", c.path, F.col("value"),
                        msg or f"disjoint {c.disjoint_path}")
            )
        return out

    def check_node(
        self, c: NodeConstraint, node_set: Optional[DataFrame] = None
    ) -> List[DataFrame]:
        out: List[DataFrame] = []
        focus = self._focus(c, node_set)
        if c.closed:
            allowed = {self.m(p) for p in c.allowed_props} | {
                self.m(p) for p in c.ignored_props
            }
            used_p = self.props.select("uri", F.col("prop").alias("used"))
            used_r = self.edges.select(F.col("src").alias("uri"), F.col("rel").alias("used"))
            used = used_p.unionByName(used_r)
            if self._delta_uris is not None:
                used = used.filter(F.col("uri").isin(self._delta_uris))
            bad = (
                focus.select("uri")
                .join(used, "uri", "inner")
                .filter(~F.col("used").isin(list(allowed)) if allowed else F.lit(True))
            )
            out.append(
                _result(bad, c, "ClosedConstraintComponent", None, F.col("used"),
                        "closed shape violation")
            )
        if c.not_class is not None:
            bad = focus.filter(F.array_contains("labels", self.m(c.not_class)))
            out.append(
                _result(bad, c, "NotConstraintComponent", None, F.lit(c.not_class),
                        f"must not be a {c.not_class}")
            )
        if c.required_class is not None:
            bad = focus.filter(~F.array_contains("labels", self.m(c.required_class)))
            out.append(
                _result(bad, c, "ClassConstraintComponent", None, F.lit(c.required_class),
                        f"must also be a {c.required_class}")
            )
        return out

    def view_checks(self, shapes: CompiledShapes, explain: bool = False) -> List[dict]:
        """n10s.validation.shacl.viewCypher analogue
        (ValidationProcedures.java:118-126 — the reference prints each
        compiled Cypher violation query): enumerate the compiled DataFrame
        checks; with explain=True each record carries the check's
        Catalyst-OPTIMIZED plan string — the Spark equivalent of the
        compiled query text, and the thing to eyeball when asking 'does
        this constraint prune before it aggregates?'."""
        out: List[dict] = []
        for c in shapes.props:
            for i, df in enumerate(self.check_property(c)):
                rec = {
                    "shape_id": c.shape_id,
                    "target": c.target_class or ("query:" + (c.target_query or "")),
                    "path": c.path,
                    "check_idx": i,
                }
                if explain:
                    rec["plan"] = df._jdf.queryExecution().optimizedPlan().toString()
                out.append(rec)
        for c in shapes.nodes:
            for i, df in enumerate(self.check_node(c)):
                rec = {
                    "shape_id": c.shape_id,
                    "target": c.target_class or ("query:" + (c.target_query or "")),
                    "path": None,
                    "check_idx": i,
                }
                if explain:
                    rec["plan"] = df._jdf.queryExecution().optimizedPlan().toString()
                out.append(rec)
        return out

    def validate(self, shapes: CompiledShapes, node_set: Optional[DataFrame] = None) -> DataFrame:
        """Full-graph validation (ValidationProcedures.java:128-136); pass
        `node_set` (DataFrame[uri]) for the validateSet variant (:139-153).

        The node_set is pushed INTO focus selection (one semi-join per
        constraint, below every aggregation — SHACLValidator.java:922-936
        scopes each compiled query the same way), so validating 100 nodes
        of a huge graph never pays full-graph cardinality/closed-shape
        aggregation. A result-level semi-join remains only as a guard for
        checks whose offending row could surface a non-focus uri."""
        spark = self.nodes.sparkSession
        checks: List[DataFrame] = []
        for c in shapes.props:
            checks.extend(self.check_property(c, node_set))
        for c in shapes.nodes:
            checks.extend(self.check_node(c, node_set))
        if not checks:
            return spark.createDataFrame([], RESULT_SCHEMA)
        res = reduce(DataFrame.unionByName, checks)
        if node_set is not None:
            res = res.join(
                node_set.select(F.col("uri").alias("focus_node")), "focus_node", "left_semi"
            )
        return res

    def validate_delta(
        self,
        shapes: CompiledShapes,
        delta_nodes: DataFrame,
        skip_untouched_shapes: bool = True,
        pushdown_threshold: int = 10_000,
    ) -> DataFrame:
        """validateTransaction analogue (ValidationProcedures.java:23-55,
        155-170): validate ONLY the nodes touched by a delta — e.g.
        `touched_nodes(checkpoint, run_id)` after an incremental run.

        The reference indexes constraints by trigger label
        (ValidatorConfig.java:100-113,147-171) so a transaction touching no
        Person node skips every Person shape. Spark analogue: collect the
        (tiny — label vocabulary sized) distinct label set of the delta
        nodes and skip constraint families whose target class has no delta
        member; constraints targeting via sh:targetQuery can't be indexed
        and always run (scoped to the delta by `_focus`)."""
        spark = self.nodes.sparkSession
        delta_nodes = delta_nodes.select("uri")
        # small-delta pushdown: collect the uri list once (a per-batch
        # delta is metadata-sized; 10k uris ≈ 1 MB) so every scan below
        # carries an In(uri, ...) predicate instead of a post-scan join —
        # with parquet/Iceberg sources the reader then skips row groups
        delta_list = [r["uri"] for r in delta_nodes.limit(pushdown_threshold + 1).collect()]
        use_pushdown = len(delta_list) <= pushdown_threshold
        props, node_cons = shapes.props, shapes.nodes
        if skip_untouched_shapes:
            scoped = (
                self.nodes.filter(F.col("uri").isin(delta_list))
                if use_pushdown
                else self.nodes.join(delta_nodes, "uri", "left_semi")
            )
            touched_labels = {
                r["l"]
                for r in scoped.select(F.explode("labels").alias("l")).distinct().collect()
            }

            def runs(c) -> bool:
                if c.target_class is None:  # targetQuery — no label index
                    return True
                return self.m(c.target_class) in touched_labels

            props = [c for c in props if runs(c)]
            node_cons = [c for c in node_cons if runs(c)]
        checks: List[DataFrame] = []
        self._delta_uris = delta_list if use_pushdown else None
        try:
            for c in props:
                checks.extend(self.check_property(c, delta_nodes))
            for c in node_cons:
                checks.extend(self.check_node(c, delta_nodes))
        finally:
            self._delta_uris = None
        if not checks:
            return spark.createDataFrame([], RESULT_SCHEMA)
        return reduce(DataFrame.unionByName, checks)


def touched_nodes(checkpoint, run_id: str) -> DataFrame:
    """Nodes touched by one incremental run: subjects plus resource
    objects of the run's triples (adding an edge touches both endpoints —
    the trigger-node set of ValidationProcedures.java:155-170). Reads only
    the run's partition (triples/run_id=<id>) — partition-pruned scan."""
    t = checkpoint.all_triples().filter(F.col("run_id") == run_id)
    subj = t.select(F.col("subject").alias("uri"))
    obj = t.filter(~F.col("is_literal")).select(F.col("object").alias("uri"))
    return subj.unionByName(obj).distinct()
