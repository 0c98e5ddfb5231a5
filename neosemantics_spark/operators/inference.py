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
