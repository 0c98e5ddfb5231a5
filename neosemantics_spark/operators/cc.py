"""Entity linking / canonicalization: iterative hash-min connected
components over owl:sameAs edges.

The reference gets identity resolution "for free" from the `:Resource(uri)`
uniqueness constraint plus explicit owl:sameAs edges
(/root/reference/src/main/java/n10s/CommonProcedures.java:41-43;
DirectStatementLoader.java:66-73). A distributed engine must compute the
equivalence closure explicitly (SURVEY.md §2.4 J3, §4.1).

Algorithm: hash-min label propagation with the large-star/small-star
simplification — each round every node adopts the min canonical id in its
neighborhood; edges are rewritten to (comp(u), comp(v)) between rounds so
path lengths halve (doubling convergence). `localCheckpoint` truncates the
lineage each round (lineage blowup is the classic failure mode at scale).

Shuffle profile per round: one groupBy(node) min-agg + one join — both on
the node id key. Hot components (a celebrity entity linked to millions of
mentions) are exactly the AQE-skew-join case; we also cap rounds and salt
nothing here because the *aggregation* is a min (partial-aggregated map-
side), which absorbs skew before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rdf.terms import OWL_SAMEAS


def sameas_edges(triples: DataFrame, extra_predicates: list[str] | None = None) -> DataFrame:
    preds = [OWL_SAMEAS] + (extra_predicates or [])
    return (
        triples.filter(F.col("predicate").isin(preds) & ~F.col("is_literal"))
        .select(F.col("subject").alias("a"), F.col("object").alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(a,b) undirected → (uri, component) where component is the
    lexicographic-min uri of the equivalence class (deterministic canonical
    representative). Only nodes that appear in an edge are returned —
    isolated uris are their own component by definition (callers coalesce).
    """
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # current component per node
    comp = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.min("a")).alias("c"))
        .select(F.col("a").alias("uri"), F.col("c").alias("component"))
        .localCheckpoint(eager=True)
    )
    e = sym.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # rewrite edge endpoints to current components (star contraction).
        # Checkpoint ONCE and reuse — the naive version recomputed this
        # join three times per iteration (isEmpty, delta, next-e).
        ec = (
            e.join(comp.withColumnRenamed("uri", "a").withColumnRenamed("component", "ca"), "a")
            .join(comp.withColumnRenamed("uri", "b").withColumnRenamed("component", "cb"), "b")
            .select("ca", "cb")
            .filter(F.col("ca") != F.col("cb"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if ec.isEmpty():
            break
        sym2 = ec.union(ec.select(F.col("cb").alias("ca"), F.col("ca").alias("cb")))
        delta = sym2.groupBy("ca").agg(F.min("cb").alias("new_c")).filter(
            F.col("new_c") < F.col("ca")
        )
        # min-neighbor update on the contracted graph, then pointer jump
        # comp(u) := comp(comp(u)) so nodes whose representative itself
        # moved follow it down (path halving) — fused into one lineage,
        # checkpointed once
        comp1 = comp.join(
            delta.select(F.col("ca").alias("component"), "new_c"), "component", "left"
        ).select(
            "uri", F.least(F.coalesce("new_c", "component"), F.col("component")).alias("component")
        )
        parent = comp1.select(
            F.col("uri").alias("component"), F.col("component").alias("pcomp")
        )
        comp = (
            comp1.join(parent, "component", "left")
            .select("uri", F.least(F.coalesce("pcomp", "component"), F.col("component")).alias("component"))
            .localCheckpoint(eager=True)
        )
        e = ec.select(F.col("ca").alias("a"), F.col("cb").alias("b"))
    # final flattening: follow representatives until fixpoint (log-depth).
    # Convergence check = count of still-moving rows inside the same pass
    # (NOT exceptAll — that is a full extra shuffle-compare per round).
    for _ in range(max_iter):
        parent = comp.select(F.col("uri").alias("component"), F.col("component").alias("pcomp"))
        j = comp.join(parent, "component", "left").select(
            "uri",
            F.col("component").alias("old"),
            F.least(F.coalesce("pcomp", "component"), F.col("component")).alias("component"),
        ).localCheckpoint(eager=True)
        comp = j.select("uri", "component")
        if j.filter(F.col("old") != F.col("component")).isEmpty():
            break
    return comp


def canonical_map(triples: DataFrame) -> DataFrame:
    """(uri, component) for every uri touched by an owl:sameAs clique."""
    return connected_components(sameas_edges(triples))


def canonicalize_triples(
    triples: DataFrame,
    comp: DataFrame,
    drop_sameas: bool = True,
    broadcast_limit: int = 100_000,
) -> DataFrame:
    """Rewrite subject/object through the component map (left joins +
    coalesce — uris outside any clique stay themselves). Broadcast the map
    only while it is genuinely small: force-broadcasting a multi-million-
    row map serializes on the driver and kills scaling (measured: 4N cores
    ran SLOWER than N with an unconditional broadcast). Above the limit we
    leave the strategy to AQE (shuffle join; skew-join handles hot
    components)."""
    small = comp.limit(broadcast_limit + 1).count() <= broadcast_limit
    c = F.broadcast(comp) if small else comp
    out = (
        triples.join(
            c.select(F.col("uri").alias("subject"), F.col("component").alias("_cs")),
            "subject",
            "left",
        )
        .join(
            c.select(F.col("uri").alias("object"), F.col("component").alias("_co")),
            "object",
            "left",
        )
        .withColumn("subject", F.coalesce("_cs", "subject"))
        .withColumn(
            "object",
            F.when(~F.col("is_literal"), F.coalesce("_co", "object")).otherwise(F.col("object")),
        )
        .drop("_cs", "_co")
    )
    if drop_sameas:
        out = out.filter(F.col("predicate") != OWL_SAMEAS)
    return out
