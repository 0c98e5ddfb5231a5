"""Graph analytics over the materialized KG tables — entity-importance
signals a KG-aware training-data pipeline ranks and samples by (which
entities' documents to keep, which nodes anchor dataset cards), beyond
the construction operators themselves.

PageRank here is the fixed-iteration synchronous formulation:

    r_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} r_t(u)/outdeg(u) + dangling_t/N )

with dangling mass (rank parked on nodes without out-edges) repaid
uniformly — the standard convention that keeps Σr = 1 every iteration.

Spark shape per iteration: one equi-join of the rank vector onto the
edge list (shuffle keyed on src), one map-side-combined sum keyed on
dst, one broadcast of two scalars (N is fixed; dangling is a one-row
agg). No corpus-wide window, no driver collect inside the loop; the
rank vector is localCheckpoint-pinned every iteration (bounded, narrow
— two columns) so the lineage never compounds (the `operators/cc.py`
iterative-plan hygiene). A fixed iteration count (default 5) rather
than convergence testing keeps the plan deterministic AND lets the
DuckDB oracle replay it exactly as unrolled CTEs.

At 100 TB scale the edge list is the partitioned `edges` table; each
iteration shuffles O(|E|) contributions — the same profile as one CC
round, and the same skew treatments apply (AQE skew-join on hot dst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..utils import round4


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(uri, rank) for every node appearing as src or dst. Parallel
    edges are counted once (the edge set is dedup'd — rank flows along
    the graph structure, not statement multiplicity, matching the
    materialized edge table's set semantics)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)  # reused every iteration
    )
    nodes = (
        e.select(F.col("src").alias("uri"))
        .unionByName(e.select(F.col("dst").alias("uri")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (uri, outdeg|null): null outdeg = dangling node
    base = nodes.join(deg.withColumnRenamed("src", "uri"), "uri", "left")
    d = float(damping)
    rank = base.select("uri", "outdeg", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        dang = (
            rank.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
            .first()["m"]
        )
        contrib = (
            e.join(
                rank.select(
                    F.col("uri").alias("src"),
                    (F.col("rank") / F.col("outdeg")).alias("c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("uri"))
            .agg(F.sum("c").alias("in_c"))
        )
        rank = (
            base.join(contrib, "uri", "left")
            .select(
                "uri",
                "outdeg",
                (
                    F.lit((1.0 - d) / n)
                    + d * (F.coalesce(F.col("in_c"), F.lit(0.0)) + dang / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # pin: bounded (uri, outdeg, rank)
        )
    return rank.select("uri", round4(F.col("rank") * 1000.0).alias("rank_x1000"))


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 3,
    direction: str = "out",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(uri, hop) — every node within k hops of the seed set, hop = the
    minimum distance (seeds themselves are hop 0). The subgraph-sampling
    primitive of a KG-aware curation pass: pick anchor entities, expand
    their neighborhood, keep the documents that mention it.

    Frontier BFS, one equi-join per hop: frontier ⋈ edges keyed on the
    expansion side, then an anti-join against the visited set so each
    node is expanded exactly once — total work O(Σ frontier-adjacent
    edges), never O(k·|E|). Both the frontier and the visited set are
    localCheckpoint-pinned per hop (bounded two-column tables), the
    iterative-plan hygiene from `operators/cc.py`. `direction` is
    "out", "in", or "both" (both = treat edges as undirected).

    At scale the frontier join inherits the edge table's partitioning;
    hot hubs in the frontier are the same skew case as CC rounds (AQE
    skew-join splits them).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    if direction == "both":
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    elif direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction != "out":
        raise ValueError(f"direction must be out|in|both, got {direction!r}")
    e = e.distinct().localCheckpoint(eager=True)
    frontier = (
        seeds.select(F.col(seeds.columns[0]).alias("uri"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = frontier.withColumn("hop", F.lit(0)).localCheckpoint(eager=True)
    for depth in range(1, k + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("uri", "src"), "src")
            .select(F.col("dst").alias("uri"))
            .distinct()
            .join(visited.select("uri"), "uri", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(
            nxt.withColumn("hop", F.lit(depth))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(uri, community) by synchronous label propagation over the
    undirected dedup'd edge set: every node starts as its own label;
    each round every node adopts the most frequent label among its
    neighbors, ties broken by the lexicographically smallest label, for
    a fixed number of rounds (deterministic — no hash-order dependence,
    so the DuckDB oracle can replay it as unrolled CTEs). Nodes keep
    their current label on rounds where they have no neighbors (cannot
    happen here — nodes are defined BY the edge set — but keeps the
    semantics total).

    Spark shape per round: one join of the label vector onto the
    undirected edge list, one count agg keyed on (node, label), one
    min_by agg keyed on node — all map-side combinable except the
    final per-node pick. Label vector pinned per round.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    # undirected, self-loops dropped (a self-vote is a fixed-point trap)
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("src").alias("uri"))
        .unionByName(und.select(F.col("dst").alias("uri")))
        .distinct()
        .withColumn("community", F.col("uri"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        votes = (
            und.join(
                labels.select(
                    F.col("uri").alias("dst"), F.col("community").alias("nbr_label")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("uri"), F.col("nbr_label"))
            .agg(F.count("*").alias("cnt"))
        )
        labels = (
            votes.groupBy("uri")
            .agg(
                F.min_by(
                    "nbr_label", F.struct((-F.col("cnt")).alias("nc"), "nbr_label")
                ).alias("community")
            )
            .localCheckpoint(eager=True)
        )
    return labels


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(uri, out_degree, in_degree) over the dedup'd edge set — the
    cheap structural profile (hub/authority shape, skew inspection
    before a CC or PageRank run). Two map-side-combined counts + one
    full-outer join on the node key."""
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    out_d = e.groupBy(F.col("src").alias("uri")).agg(F.count("*").alias("out_degree"))
    in_d = e.groupBy(F.col("dst").alias("uri")).agg(F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "uri", "full")
        .select(
            "uri",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
