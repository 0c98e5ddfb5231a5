"""Micro-reasoners (J7) + ontology/SKOS statement routers (§2.8).

Reference: /root/reference/src/main/java/n10s/inference/MicroReasoners.java
(:31-44 queries; :58-88 nodesLabelled; :162-199 getRels) and
onto/OntologyImporter.java:133-243, skos/load/SkosImporter.java:123-160.

The ontology is metadata-sized (thousands of classes, not billions), so
the transitive closure runs as a driver-side BFS over a collected edge
list, then broadcast-joins against the huge node/edge tables — the same
shape the reference uses (small Cypher path query + big match).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Set

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rdf.terms import OWL, RDF_TYPE, RDFS, SKOS

# ontology predicate → routed relationship name (OntologyImporter.java:529-544)
ONTO_RELS = {
    RDFS + "subClassOf": "SCO",
    RDFS + "subPropertyOf": "SPO",
    RDFS + "domain": "DOMAIN",
    RDFS + "range": "RANGE",
    OWL + "equivalentClass": "EQC",
}
ONTO_CLASS_TYPES = {OWL + "Class", RDFS + "Class"}
ONTO_REL_TYPES = {OWL + "ObjectProperty", RDF_TYPE.rsplit("#", 1)[0] + "#Property"}
ONTO_PROP_TYPES = {OWL + "DatatypeProperty"}


def route_ontology(triples: DataFrame) -> DataFrame:
    """Ontology importer routing: keep only schema-level vocabulary and
    translate predicates to SCO/SPO/DOMAIN/RANGE/EQC edges; rdf:type of
    owl:Class/ObjectProperty/DatatypeProperty → kind column
    (OntologyImporter.java:133-243)."""
    rel_map = F.create_map(*[F.lit(x) for kv in ONTO_RELS.items() for x in kv])
    edges = triples.filter(F.col("predicate").isin(list(ONTO_RELS))).select(
        F.col("subject").alias("src"),
        rel_map[F.col("predicate")].alias("rel"),
        F.col("object").alias("dst"),
    )
    kinds = (
        triples.filter((F.col("predicate") == RDF_TYPE) & ~F.col("is_literal"))
        .select(
            F.col("subject").alias("name"),
            F.when(F.col("object").isin(list(ONTO_CLASS_TYPES)), "Class")
            .when(F.col("object") == OWL + "ObjectProperty", "Relationship")
            .when(F.col("object") == OWL + "DatatypeProperty", "Property")
            .alias("kind"),
        )
        .filter(F.col("kind").isNotNull())
    )
    return edges, kinds


def route_skos(triples: DataFrame) -> DataFrame:
    """SKOS importer: skos:broader → edge; skos:narrower → INVERTED broader
    edge; skos:related → RELATED (SkosImporter.java:123-160)."""
    broader = triples.filter(F.col("predicate") == SKOS + "broader").select(
        F.col("subject").alias("src"), F.lit("SCO").alias("rel"), F.col("object").alias("dst")
    )
    narrower = triples.filter(F.col("predicate") == SKOS + "narrower").select(
        F.col("object").alias("src"), F.lit("SCO").alias("rel"), F.col("subject").alias("dst")
    )
    related = triples.filter(F.col("predicate") == SKOS + "related").select(
        F.col("subject").alias("src"), F.lit("RELATED").alias("rel"), F.col("object").alias("dst")
    )
    return broader.unionByName(narrower).unionByName(related)


SKOSXL = "http://www.w3.org/2008/05/skos-xl#"
_SKOS_LABELS = ("prefLabel", "altLabel", "hiddenLabel")


def skos_label_props(triples: DataFrame) -> DataFrame:
    """SKOS label → concept-property routing, including the SKOS-XL
    two-leg indirection (SkosImporter.java:144-167): a direct
    skos:prefLabel/altLabel/hiddenLabel literal becomes a property of the
    concept, and the reified `concept --skosxl:xLabel--> labelNode
    --skosxl:literalForm--> "text"` pattern resolves through ONE equi-join
    on the label node (first leg `setIndirectPropFirstLeg`, second leg
    `setIndirectPropSecondLeg`) to the same concept-property shape.
    Returns (concept, prop, value) with prop = the ORIGINAL predicate IRI
    (skos: vs skosxl: stay distinct, as the reference keys props by
    predicate). The label-node join key is the bnode/IRI of the reified
    label — high cardinality, uniform: a plain shuffle join scales."""
    direct = triples.filter(
        F.col("predicate").isin([SKOS + x for x in _SKOS_LABELS]) & F.col("is_literal")
    ).select(
        F.col("subject").alias("concept"),
        F.col("predicate").alias("prop"),
        F.col("object").alias("value"),
    )
    leg1 = triples.filter(
        F.col("predicate").isin([SKOSXL + x for x in _SKOS_LABELS]) & ~F.col("is_literal")
    ).select(
        F.col("subject").alias("concept"),
        F.col("predicate").alias("prop"),
        F.col("object").alias("label_node"),
    )
    leg2 = triples.filter(
        (F.col("predicate") == SKOSXL + "literalForm") & F.col("is_literal")
    ).select(F.col("subject").alias("label_node"), F.col("object").alias("value"))
    xl = leg1.join(leg2, "label_node").select("concept", "prop", "value")
    return direct.unionByName(xl)


def transitive_closure(edges: DataFrame, rel: str = "SCO") -> DataFrame:
    """(descendant, ancestor) closure of the (tiny) ontology DAG.
    Driver-side BFS over the collected edge list (metadata scale), returned
    as a DataFrame for broadcast joins. Includes the reflexive pair
    (c, c) — the reference's `SCO*` includes path length 0
    (MicroReasoners.java:31-44)."""
    spark = edges.sparkSession
    rows = edges.filter(F.col("rel") == rel).select("src", "dst").collect()
    up: Dict[str, List[str]] = defaultdict(list)
    nodes: Set[str] = set()
    for r in rows:
        up[r["src"]].append(r["dst"])
        nodes.add(r["src"])
        nodes.add(r["dst"])
    out = []
    for start in sorted(nodes):
        seen = {start}
        stack = [start]
        while stack:
            cur = stack.pop()
            for parent in up.get(cur, ()):  # DAG walk with cycle guard
                if parent not in seen:
                    seen.add(parent)
                    stack.append(parent)
        out.extend((start, anc) for anc in sorted(seen))
    return spark.createDataFrame(out or [("", "")], ["descendant", "ancestor"]).filter(
        F.col("descendant") != ""
    )


def nodes_labelled_with_inference(nodes: DataFrame, closure: DataFrame, label: str) -> DataFrame:
    """n10s.inference.nodesLabelled analogue (MicroReasoners.java:58-88):
    nodes whose label is `label` OR any subclass of it, via broadcast join
    of the exploded label array against the closure."""
    sub = closure.filter(F.col("ancestor") == label).select(
        F.col("descendant").alias("label")
    )
    lab = nodes.select("uri", "labels", F.explode_outer("labels").alias("label"))
    return (
        lab.join(F.broadcast(sub), "label", "inner")
        .select("uri", "labels")
        .dropDuplicates(["uri"])
    )


def rels_with_inference(edges: DataFrame, closure_spo: DataFrame, rel: str) -> DataFrame:
    """n10s.inference.getRels analogue (MicroReasoners.java:162-199):
    edges whose rel is `rel` or any subproperty of it."""
    sub = closure_spo.filter(F.col("ancestor") == rel).select(
        F.col("descendant").alias("rel")
    )
    return edges.join(F.broadcast(sub), "rel", "inner")


def nodes_in_category(
    edges: DataFrame,
    closure: DataFrame,
    category: str,
    in_cat_rel: str = "type",
) -> DataFrame:
    """n10s.inference.nodesInCategory analogue (MicroReasoners.java:102-127):
    individuals with an `in_cat_rel` edge into `category` or ANY of its
    subcategories — `(root)<-[:SCO*0..]-()<-[:inCatRel]-(individual)`
    re-expressed as a broadcast semi-join of the (tiny) subcategory set
    against the edge table. `in_cat_rel` is the custom in-category
    relationship (the procedure's inCatRel param; default 'type')."""
    subcats = closure.filter(F.col("ancestor") == category).select(
        F.col("descendant").alias("dst")
    )
    return (
        edges.filter(F.col("rel") == in_cat_rel)
        .join(F.broadcast(subcats), "dst", "left_semi")
        .select(F.col("src").alias("uri"))
        .dropDuplicates(["uri"])
    )


def in_category_flags(
    individuals: DataFrame,
    edges: DataFrame,
    closure: DataFrame,
    category: str,
    in_cat_rel: str = "type",
    id_col: str = "uri",
) -> DataFrame:
    """Boolean n10s.inference.inCategory (MicroReasoners.java:441-480),
    vectorized: one row per individual with an `in_category` flag instead
    of a per-node function call (the set-based Spark shape — searchTopDown
    semantics: membership via the subcategory closure of `category`)."""
    members = nodes_in_category(edges, closure, category, in_cat_rel).withColumnRenamed(
        "uri", id_col
    )
    return individuals.select(id_col).distinct().join(
        members.withColumn("_in", F.lit(True)), id_col, "left"
    ).select(id_col, F.coalesce("_in", F.lit(False)).alias("in_category"))


def has_label_flags(nodes: DataFrame, closure: DataFrame, label: str) -> DataFrame:
    """Boolean n10s.inference.hasLabel (MicroReasoners.java:398-432),
    vectorized: true when a node carries `label` explicitly OR any label
    that is a subcategory of it."""
    sub = closure.filter(F.col("ancestor") == label).select(
        F.col("descendant").alias("label")
    )
    lab = nodes.select("uri", F.explode_outer("labels").alias("label"))
    hit = (
        lab.join(F.broadcast(sub), "label", "left_semi")
        .select("uri")
        .dropDuplicates(["uri"])
        .withColumn("_has", F.lit(True))
    )
    return nodes.select("uri").distinct().join(hit, "uri", "left").select(
        "uri", F.coalesce("_has", F.lit(False)).alias("has_label")
    )


def get_rels(
    edges: DataFrame,
    closure_spo: DataFrame,
    rel: str,
    node_uri: str | None = None,
    rel_dir: str = "",
) -> DataFrame:
    """n10s.inference.getRels with direction (MicroReasoners.java:164-199):
    edges whose rel is `rel` or any subproperty, optionally restricted to
    those incident to `node_uri` with relDir '>' (outgoing), '<'
    (incoming), or '' (both). Returns (src, rel, dst, direction) where
    direction is relative to `node_uri` (null when no node filter)."""
    sub = closure_spo.filter(F.col("ancestor") == rel).select(
        F.col("descendant").alias("rel")
    )
    out = edges.join(F.broadcast(sub), "rel", "left_semi")
    if node_uri is None:
        return out.withColumn("direction", F.lit(None).cast("string"))
    if rel_dir == ">":
        cond = F.col("src") == node_uri
    elif rel_dir == "<":
        cond = F.col("dst") == node_uri
    else:
        cond = (F.col("src") == node_uri) | (F.col("dst") == node_uri)
    return out.filter(cond).withColumn(
        "direction", F.when(F.col("src") == node_uri, ">").otherwise("<")
    )


OWL_RESTRICTION_PREDS = {
    OWL + "onProperty": "onProperty",
    OWL + "someValuesFrom": "someValuesFrom",
    OWL + "allValuesFrom": "allValuesFrom",
    OWL + "cardinality": "cardinality",
    OWL + "minCardinality": "minCardinality",
    OWL + "maxCardinality": "maxCardinality",
    OWL + "hasValue": "hasValue",
}


def assemble_restrictions(triples: DataFrame) -> DataFrame:
    """OWL restriction assembly (§2.8): anonymous owl:Restriction bnodes
    are stitched back together and attached to the classes that reference
    them — `B rdfs:subClassOf [ owl:onProperty P ; owl:someValuesFrom C ]`
    becomes an (B, SCO_RESTRICTION, C) edge with {onProperty, kind} props.

    Reference builds these statefully during the parse stream
    (onto/OntologyImporter.java:245-289 builders, :453-502 writer,
    onto/OWLRestriction.java); here it is one groupBy(bnode) pivot + one
    join — the per-triple router stays stateless (SURVEY.md §2.8).
    """
    pred_map = F.create_map(*[F.lit(x) for kv in OWL_RESTRICTION_PREDS.items() for x in kv])
    is_restriction_row = F.col("predicate").isin(list(OWL_RESTRICTION_PREDS)) | (
        (F.col("predicate") == RDF_TYPE) & (F.col("object") == OWL + "Restriction")
    )
    rows = triples.filter(
        is_restriction_row & F.col("subject").startswith("bnode://")
    ).select(
        F.col("subject").alias("bnode"),
        F.coalesce(pred_map[F.col("predicate")], F.lit("_type")).alias("key"),
        F.col("object").alias("val"),
    )
    assembled = (
        rows.filter(F.col("key") != "_type")
        .groupBy("bnode")
        .agg(F.map_from_entries(F.array_sort(F.collect_list(F.struct("key", "val")))).alias("props"))
    )
    target = F.coalesce(
        F.col("props")["someValuesFrom"], F.col("props")["allValuesFrom"],
        F.col("props")["hasValue"], F.col("props")["onProperty"],
    )
    kind = (
        F.when(F.col("props")["someValuesFrom"].isNotNull(), "some")
        .when(F.col("props")["allValuesFrom"].isNotNull(), "all")
        .when(F.col("props")["hasValue"].isNotNull(), "hasValue")
        .otherwise("cardinality")
    )
    links = triples.filter(
        F.col("predicate").isin([RDFS + "subClassOf", OWL + "equivalentClass"])
        & F.col("object").startswith("bnode://")
    ).select(
        F.col("subject").alias("src"),
        F.when(F.col("predicate") == RDFS + "subClassOf", "SCO_RESTRICTION")
        .otherwise("EQC_RESTRICTION")
        .alias("rel"),
        F.col("object").alias("bnode"),
    )
    return links.join(assembled, "bnode", "inner").select(
        "src", "rel", target.alias("dst"), kind.alias("kind"), "props"
    )


def di_model(
    triples: DataFrame, max_nodes: int = 25, max_rels: int = 250
) -> DataFrame:
    """Data-Importer model export (n10s.experimental.export/stream.dimodel,
    DataImporterProcedures.java:24-63 → DIModelBuilder.java:32-110): derive
    the LPG SCHEMA an ontology implies — one node definition per class,
    one relationship definition per object property (rdfs:domain →
    rdfs:range, both ends restricted to known classes, exactly the
    relsQuery filter), one property definition per datatype property
    attached to its domain class. The reference's unionOf/schema.org
    domainIncludes variants are out of scope (core rdfs:domain/range only).

    Returns (element, name, src, dst) rows: element ∈ node |
    relationship | property. The reference caps the model at 25 nodes /
    250 rels and errors beyond (DIModelBuilder.java:25-26,88-104) because
    the target is an interactive modeling tool — same guard here; the
    counts are metadata-scale driver counts."""
    edges, kinds = route_ontology(triples)
    classes = kinds.filter(F.col("kind") == "Class").select("name").distinct()
    n_classes = classes.count()
    if n_classes > max_nodes:
        raise RuntimeError(
            f"The ontology contains a large number of classes ({n_classes}) "
            "that would generate an unusable model. Pass a pre-filtered "
            "ontology (the classList analogue)."
        )
    dom = edges.filter(F.col("rel") == "DOMAIN").select(
        F.col("src").alias("pname"), F.col("dst").alias("dom")
    )
    rng = edges.filter(F.col("rel") == "RANGE").select(
        F.col("src").alias("pname"), F.col("dst").alias("rng")
    )
    obj_props = kinds.filter(F.col("kind") == "Relationship").select(
        F.col("name").alias("pname")
    )
    rels = (
        obj_props.join(dom, "pname")
        .join(rng, "pname")
        .join(classes.withColumnRenamed("name", "dom"), "dom", "left_semi")
        .join(classes.withColumnRenamed("name", "rng"), "rng", "left_semi")
        .distinct()
    )
    if rels.count() > max_rels:
        raise RuntimeError(
            "The ontology contains a large number of relationships that "
            "would generate an unusable model. Pass a pre-filtered ontology."
        )
    dt_props = (
        kinds.filter(F.col("kind") == "Property")
        .select(F.col("name").alias("pname"))
        .join(dom, "pname")
        .join(classes.withColumnRenamed("name", "dom"), "dom", "left_semi")
        .join(rng, "pname", "left")
        .distinct()
    )
    null_s = F.lit(None).cast("string")
    nodes_out = classes.select(
        F.lit("node").alias("element"), F.col("name"), null_s.alias("src"), null_s.alias("dst")
    )
    rels_out = rels.select(
        F.lit("relationship").alias("element"),
        F.col("pname").alias("name"),
        F.col("dom").alias("src"),
        F.col("rng").alias("dst"),
    )
    props_out = dt_props.select(
        F.lit("property").alias("element"),
        F.col("pname").alias("name"),
        F.col("dom").alias("src"),
        F.col("rng").alias("dst"),
    )
    return nodes_out.unionByName(rels_out).unionByName(props_out)
