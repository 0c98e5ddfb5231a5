"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the full corpus; `F.zip_with` + `F.aggregate` keep the dot product
JVM-side (no UDF). Scale path: sign-LSH bucketing (axis-aligned
hyperplanes ⇒ deterministic + engine-portable) restricts candidates to
same-bucket pairs before exact scoring.

At 100 TB / billions of vectors the bucketed variant is the only viable
plan: candidate generation is an equi-join on the bucket key, then exact
cosine only within buckets. Multi-probe = explode over neighboring buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import round4


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for the given query ids.
    Plan: broadcast the |Q| query vectors against the corpus — a single
    narrow map stage + per-query top-k (window over partitionBy(query) is
    fine because |Q| is small; for large |Q| switch to groupBy + min_by/
    slice(sort_array(collect_list))).
    Deterministic tie-break: (score desc, id asc); scores rounded to 4dp
    so engine float-order differences can't flip rankings in the oracle."""
    from pyspark.sql.window import Window

    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            round4(cosine(F.col("qvec"), F.col("nvec"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def sign_lsh_bucket(vec: Column, nbits: int = 8) -> Column:
    """Sign pattern of the first `nbits` coordinates — an axis-aligned
    random-hyperplane LSH (deterministic, no RNG: the 'hyperplanes' are the
    coordinate axes, valid for cosine similarity on dense embeddings)."""
    bits = F.transform(
        F.slice(vec, 1, nbits), lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.array_join(bits, "")


def lsh_bucketed_candidates(
    embeddings: DataFrame, nbits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(a, b) candidate pairs sharing the sign-LSH bucket; equi-join on the
    bucket key — never all-pairs."""
    b = embeddings.select(F.col(id_col).alias("id"), sign_lsh_bucket(F.col(vec_col), nbits).alias("bucket"))
    l = b.select("bucket", F.col("id").alias("a"))
    r = b.select("bucket", F.col("id").alias("b"))
    return l.join(r, "bucket").filter(F.col("a") < F.col("b")).select("a", "b", "bucket")


def lsh_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    nbits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to same-bucket candidates."""
    from pyspark.sql.window import Window

    with_bucket = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec"),
        sign_lsh_bucket(F.col(vec_col), nbits).alias("bucket"),
    )
    q = with_bucket.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qvec"), "bucket"
    )
    scored = (
        F.broadcast(q)
        .join(with_bucket.select(F.col("id").alias("neighbor_id"), F.col("vec").alias("nvec"), "bucket"), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            round4(cosine(F.col("qvec"), F.col("nvec"))).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    nbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket candidates →
    exact cosine ≥ threshold. The scale path for semantic dedup of a
    training corpus: candidate generation is an equi-join on the bucket
    key (near-identical vectors share the sign pattern of every
    coordinate), exact scoring only within buckets."""
    with_bucket = embeddings.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        sign_lsh_bucket(F.col(vec_col), nbits).alias("bucket"),
    )
    l = with_bucket.select("bucket", F.col("id").alias("a"), F.col("vec").alias("va"))
    r = with_bucket.select("bucket", F.col("id").alias("b"), F.col("vec").alias("vb"))
    return (
        l.join(r, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", round4(cosine(F.col("va"), F.col("vb"))).alias("score"))
        .filter(F.col("score") >= threshold)
    )
