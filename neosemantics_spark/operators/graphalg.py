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
