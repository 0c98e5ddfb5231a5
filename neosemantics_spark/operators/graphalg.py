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
        # dangling mass as a broadcast one-row aggregate INSIDE the
        # iteration's single materializing job — the previous `.first()`
        # was a second driver action per iteration (2 jobs/round → 1;
        # same IEEE arithmetic: the scalar is the same double sum, and
        # `_dang / n` is one double division either way)
        dang = rank.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
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
            .crossJoin(F.broadcast(dang))
            .select(
                "uri",
                "outdeg",
                (
                    F.lit((1.0 - d) / n)
                    + d * (F.coalesce(F.col("in_c"), F.lit(0.0)) + F.col("_dang") / n)
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


def _undirected_canonical(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Canonical undirected edge set (a < b), self-loops dropped."""
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d")).filter(
        F.col("s").isNotNull() & F.col("d").isNotNull() & (F.col("s") != F.col("d"))
    )
    return e.select(
        F.least("s", "d").alias("a"), F.greatest("s", "d").alias("b")
    ).distinct()


def triangle_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(uri, degree, triangles, lcc) per node of the undirected dedup'd
    edge set (self-loops dropped): triangle participation count and the
    local clustering coefficient 2T/(deg*(deg-1)) (0.0 for deg < 2),
    half-up-rounded to 4 decimals — the density signal that separates
    tight entity cliques from hub-and-spoke noise before community
    sampling.

    Scale shape — the degree-ordered "forward" algorithm (Schank &
    Wagner 2005), not the naive wedge join: every undirected edge is
    oriented from its lower-(degree, uri) endpoint to its higher one,
    so each node's oriented out-degree is O(√|E|) on any graph. The
    wedge join (o1.b = o2.a) therefore fans out to O(|E|^1.5) candidate
    wedges worst-case — the provable optimum for exact triangle listing
    — instead of Σdeg² (which a hub node makes quadratic). Each
    triangle is emitted exactly once (its orientation-order (a,b,c)),
    then per-node counts come from one explode + map-side-combined sum.
    All joins are equi-joins on node keys; hot keys hit AQE skew-join.
    """
    und = _undirected_canonical(edges, src_col, dst_col).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("a").alias("uri"))
        .unionByName(und.select(F.col("b").alias("uri")))
        .groupBy("uri")
        .agg(F.count("*").alias("degree"))
        .localCheckpoint(eager=True)
    )
    da = deg.select(F.col("uri").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("uri").alias("b"), F.col("degree").alias("deg_b"))
    keyed = und.join(da, "a").join(db, "b")
    # orient low (degree, uri) -> high (degree, uri); total order, no ties
    fwd = F.struct(F.col("deg_a").alias("dg"), F.col("a").alias("u")) < F.struct(
        F.col("deg_b").alias("dg"), F.col("b").alias("u")
    )
    o = keyed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    ).localCheckpoint(eager=True)
    wedges = o.alias("e1").join(
        o.select(F.col("lo").alias("hi"), F.col("hi").alias("far")).alias("e2"), "hi"
    )
    tri = wedges.join(
        o.select(F.col("lo").alias("lo"), F.col("hi").alias("far")),
        ["lo", "far"],
        "left_semi",
    )
    per_node = (
        tri.select(F.explode(F.array("lo", "hi", "far")).alias("uri"))
        .groupBy("uri")
        .agg(F.count("*").alias("triangles"))
    )
    return deg.join(per_node, "uri", "left").select(
        "uri",
        "degree",
        F.coalesce("triangles", F.lit(0)).alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            round4(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1.0))
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def neighborhood_similarity(
    edges: DataFrame,
    min_jaccard: float = 0.0,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(a, b, intersection, jaccard) for every unordered node pair a < b
    sharing at least one neighbor in the undirected dedup'd edge set —
    structural entity-resolution candidates (two URIs whose KG
    neighborhoods overlap are merge suspects even without a sameAs
    assertion; the reference's similarity surface is taxonomy-based,
    `n10s/similarity/SimilarityProcedures.java` — this is the
    set-overlap complement over instance edges). Jaccard half-up-rounded
    to 4 decimals; pairs below `min_jaccard` are dropped.

    Scale shape: candidate pairs come from one self-join keyed on the
    SHARED NEIGHBOR (each node w contributes its adjacency list's pairs)
    followed by a map-side-combined count per pair — never an all-pairs
    cross join; total work is Σ_w deg(w)², the wedge count, and the
    union size comes from two broadcast-or-shuffle equi-joins onto the
    degree table (|A∪B| = deg(A)+deg(B)−|A∩B|, so neighbor SETS are
    never materialized per pair). Hub-w quadratic blowup is the same
    skew case as CC rounds (AQE skew-join); for power-law graphs cap
    hubs upstream by filtering degree > cap before calling.
    """
    und = _undirected_canonical(edges, src_col, dst_col)
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("v")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("v"))
    )
    deg = adj.groupBy(F.col("v").alias("uri")).agg(F.count("*").alias("degree"))
    pairs = (
        adj.alias("x")
        .join(adj.select("w", F.col("v").alias("v2")).alias("y"), "w")
        .filter(F.col("v") < F.col("v2"))
        .groupBy(F.col("v").alias("a"), F.col("v2").alias("b"))
        .agg(F.count("*").alias("intersection"))
    )
    out = (
        pairs.join(deg.select(F.col("uri").alias("a"), F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("uri").alias("b"), F.col("degree").alias("db")), "b")
        .select(
            "a",
            "b",
            "intersection",
            round4(
                F.col("intersection")
                / (F.col("da") + F.col("db") - F.col("intersection"))
            ).alias("jaccard"),
        )
    )
    if min_jaccard > 0.0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


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


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(uri, core_degree) — nodes surviving `rounds` synchronous peel
    rounds of the k-core reduction over the undirected dedup'd edge set
    (each round simultaneously removes every node whose current degree
    is < k, then drops its incident edges), with their degree in the
    surviving subgraph. With enough rounds this IS the k-core (the
    dense-subgraph filter a KG curation pass keeps entity clusters by);
    a fixed `rounds` keeps the operator deterministic and lets the
    DuckDB oracle replay it as unrolled CTEs. The loop exits early at a
    fixpoint — sound, because further rounds are no-ops on a fixpoint,
    so the result equals the R-round unrolling for any larger R.

    Spark shape per round: one map-side-combined degree count + one
    semi-join of the edge set against the survivors on each endpoint —
    all equi-joins on node keys; the edge set only ever shrinks.
    Per-round pinning + partition-count pinning (the train_bpe lesson:
    unions/joins must not compound partitions across rounds).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = _undirected_canonical(edges, src_col, dst_col).localCheckpoint(eager=True)
    n_part = e.rdd.getNumPartitions()
    n_edges = e.count()
    for _ in range(rounds):
        if n_edges == 0:
            break
        deg = (
            e.select(F.col("a").alias("uri"))
            .unionByName(e.select(F.col("b").alias("uri")))
            .groupBy("uri")
            .agg(F.count("*").alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("uri")
        e2 = (
            e.join(keep.withColumnRenamed("uri", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("uri", "b"), "b", "left_semi")
            .select("a", "b")
            .coalesce(n_part)
            .localCheckpoint(eager=True)
        )
        n2 = e2.count()
        e = e2
        if n2 == n_edges:  # fixpoint: every remaining node has deg >= k
            break
        n_edges = n2
    deg = (
        e.select(F.col("a").alias("uri"))
        .unionByName(e.select(F.col("b").alias("uri")))
        .groupBy("uri")
        .agg(F.count("*").alias("core_degree"))
    )
    return deg.filter(F.col("core_degree") >= k)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(uri, ppr_x1000) — PageRank with teleport restricted to the seed
    set (uniform over seeds present in the graph; dangling mass also
    repaid to the seeds): relevance-to-anchors, the scoring twin of
    `k_hop`'s boolean neighborhood for KG-aware curation ("keep
    documents in proportion to their PPR mass around the entities this
    dataset is about"). Same per-iteration shape and pinning as
    `pagerank`; seeds outside the graph are ignored (they could receive
    teleport but never propagate — excluding them keeps Σr = 1 exact).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("uri"))
        .unionByName(e.select(F.col("dst").alias("uri")))
        .distinct()
    )
    sd = (
        seeds.select(F.col(seeds.columns[0]).alias("uri"))
        .distinct()
        .join(nodes, "uri", "left_semi")
        .localCheckpoint(eager=True)
    )
    n_seeds = sd.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed is present in the graph")
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    base = (
        nodes.join(deg.withColumnRenamed("src", "uri"), "uri", "left")
        .join(sd.withColumn("_s", F.lit(1)), "uri", "left")
        .select(
            "uri",
            "outdeg",
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("p"),
        )
        .localCheckpoint(eager=True)
    )
    d = float(damping)
    rank = base.select("uri", "outdeg", "p", F.col("p").alias("rank"))
    for _ in range(iters):
        # one job per iteration: dangling mass rides along as a broadcast
        # one-row aggregate instead of a separate `.first()` action (see
        # pagerank above)
        dang = rank.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
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
            .crossJoin(F.broadcast(dang))
            .select(
                "uri",
                "outdeg",
                "p",
                (
                    (1.0 - d) * F.col("p")
                    + d
                    * (
                        F.coalesce(F.col("in_c"), F.lit(0.0))
                        + F.col("_dang") * F.col("p")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return rank.select("uri", round4(F.col("rank") * 1000.0).alias("ppr_x1000"))
