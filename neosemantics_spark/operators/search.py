"""Full-text retrieval operators: inverted postings + BM25 ranking,
corpus n-gram statistics.

The retrieval half of a training-data pipeline (find documents matching
a probe query, audit corpus composition) expressed as pure DataFrame
programs:

- `build_postings` — the classic inverted index as a (term, doc_id, tf)
  table plus a (doc_id, dl) length table. One narrow scan → explode →
  map-side-combined groupBy; partitioned by term it IS the distributed
  posting-list layout (all of a term's postings co-located), so the
  query-time join below shuffles nothing that isn't already term-keyed.
- `write_postings` / `read_postings` — the PERSISTED index: postings
  written partitioned by a deterministic md5 term bucket (`tb`), plus
  the doclens table and a one-row stats table (N, avgdl). Partitioning
  by raw term would mint one directory per distinct term (metastore
  death at web scale); a fixed bucket count keeps the directory fan-out
  bounded while a query's `tb IN (...)` predicate still prunes the scan
  to its terms' buckets. The bucket hash is md5-based so any engine
  (and the driver, for query terms) computes it identically. This
  mirrors the reference's persisted derived state
  (ValidatorConfig.java:177-188 stores compiled validator state in the
  graph rather than recompiling per call).
- `bm25_topk` — Okapi BM25 over the postings restricted to the query's
  terms. The term filter is an `isin` pushed into the postings scan;
  with a persisted index the bucket filter prunes partitions and the
  corpus stats come from the stats table instead of two per-query
  scalar jobs. The final top-k is `orderBy(...).limit(k)`, which Spark
  executes as TakeOrdered (per-partition heap + driver merge — no
  global sort shuffle).
- `top_ngrams` — corpus composition stats: the k most frequent word
  n-grams, a partial-agg groupBy with the same guarded n-gram expansion
  as `datasets.shingle_set`.

No UDFs anywhere; scoring is arithmetic on codegen'd columns.
"""

from __future__ import annotations

import hashlib
import re
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .datasets import norm_tokens
from ..utils import require_local_root, round4


class BM25Index(NamedTuple):
    """A loaded persisted index: postings (term, id, tf, tb) partitioned
    by tb on disk, doclens (id, dl), and the corpus stats needed by the
    BM25 formula (read once at index open, not per query)."""

    postings: DataFrame
    doclens: DataFrame
    n_docs: int
    avgdl: float
    n_buckets: int


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver-side twin of the Spark-side bucket expression below: both
    take the first 8 hex chars of md5(term) as an int mod n_buckets, so
    a query's terms map to partition values without touching the JVM."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _term_bucket_col(n_buckets: int):
    return (
        F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
        % n_buckets
    ).cast("int")


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclens): postings = (term, id, tf), doclens = (id, dl).

    tf aggregates map-side (term, id) partial counts; at 100 TB the
    postings table is written bucketed/partitioned by term so every
    query-time lookup prunes to its terms' partitions."""
    toks = norm_tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("toks"))
    postings = (
        base.select("id", F.explode("toks").alias("term"))
        .groupBy("term", "id")
        .agg(F.count("*").alias("tf"))
    )
    doclens = base.select("id", F.size("toks").alias("dl"))
    return postings, doclens


def _idx_manifest(path: str) -> dict:
    import json
    import os

    head = os.path.join(path, "commits", "HEAD")
    try:
        with open(head) as fh:
            name = fh.read().strip()
        with open(os.path.join(path, "commits", name)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return {"seq": 0, "batches": []}


def _idx_publish(path: str, batches: list) -> None:
    import json
    import os

    commits = os.path.join(path, "commits")
    os.makedirs(commits, exist_ok=True)
    seq = _idx_manifest(path)["seq"] + 1
    name = f"MANIFEST-{seq:06d}.json"
    with open(os.path.join(commits, name), "w") as fh:
        json.dump({"seq": seq, "batches": batches}, fh)
    tmp = os.path.join(commits, ".HEAD.tmp")
    with open(tmp, "w") as fh:
        fh.write(name)
    os.rename(tmp, os.path.join(commits, "HEAD"))


def _idx_batch_id(doclens: DataFrame) -> str:
    """Deterministic content fingerprint of a batch (order-independent
    xor of id hashes + count): a replay of a crashed append maps to the
    SAME batch directories and overwrites its own partial write."""
    r = doclens.agg(
        F.count("*").alias("n"), F.expr("bit_xor(xxhash64(id))").alias("x")
    ).first()
    return f"{r['n']}-{(r['x'] or 0) & 0xFFFFFFFFFFFFFFFF:016x}"


def _write_index_batch(
    postings: DataFrame, doclens: DataFrame, path: str, bid: str, n_buckets: int
) -> None:
    (
        postings.withColumn("tb", _term_bucket_col(n_buckets))
        # co-locate each bucket's postings into its partition directory
        # in one file per shuffle partition rather than one file per
        # (task, bucket) pair
        .repartition(F.col("tb"))
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(f"{path}/postings/batch={bid}")
    )
    doclens.write.mode("overwrite").parquet(f"{path}/doclens/batch={bid}")
    (
        doclens.agg(
            F.count("*").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            F.lit(n_buckets).alias("n_buckets"),
        ).write.mode("overwrite").parquet(f"{path}/stats/batch={bid}")
    )


def write_postings(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """Persist the inverted index under `path`:

    - `postings/batch=<id>/` parquet partitioned by `tb` (md5 term
      bucket) — a query prunes to its terms' buckets via a partition
      filter, so a 3-term query over a 64-bucket index reads at most
      3/64ths of the postings (and within a bucket the `term IN`
      predicate is pushed to parquet row groups).
    - `doclens/batch=<id>/` parquet (id, dl).
    - `stats/batch=<id>/` one-row parquet (n_docs, sum_dl, n_buckets) —
      the per-query scalar jobs of the index-less path become one tiny
      agg at index open.

    The index survives corpus growth the way the curation state does:
    `append_postings` folds a new document batch into its own batch
    directories under the same term-bucket layout and commits with a
    single HEAD rename (commits/MANIFEST-<n> snapshot pointer); readers
    see only committed batches, a crash mid-append leaves the previous
    snapshot fully live, and a replay overwrites its own partial
    directories (content-fingerprint batch ids). `write_postings`
    itself (re)initializes the index to exactly one batch. The path must
    be driver-local: the commit protocol is POSIX manifest + HEAD rename
    (same guard as CurationCheckpoint / save_nb)."""
    path = require_local_root(path, "BM25 index")
    postings, doclens = build_postings(docs, id_col, text_col)
    doclens = doclens.localCheckpoint(eager=True)
    bid = _idx_batch_id(doclens)
    _write_index_batch(postings, doclens, path, bid, n_buckets)
    _idx_publish(path, [bid])


def append_postings(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    validate_ids: bool = True,
) -> str:
    """Fold a new document batch into a persisted index — incremental
    index maintenance, not a rebuild. New doc ids are DISJOINT from the
    indexed corpus (validated by default: one narrow semi-join count
    over doclens), so the batch's postings rows are disjoint from every
    committed batch and 'merge' is pure directory append under the SAME
    md5 term-bucket layout (`tb` values are content hashes — stable
    across batches by construction). Stats re-derive at open time from
    the per-batch (n_docs, sum_dl) rows, so avgdl is exact over the
    grown corpus. Commit = one HEAD rename after every directory is
    written; index+append ≡ rebuild over the union (pinned by test and
    the bm25_search driver oracle). Returns the batch id."""
    path = require_local_root(path, "BM25 index")
    spark = docs.sparkSession
    m = _idx_manifest(path)
    if not m["batches"]:
        raise ValueError(f"no committed BM25 index at {path!r} — build with write_postings first")
    old = read_postings(spark, path)
    postings, doclens = build_postings(docs, id_col, text_col)
    doclens = doclens.localCheckpoint(eager=True)
    if validate_ids:
        n_dup = doclens.join(old.doclens, "id", "left_semi").count()
        if n_dup:
            raise ValueError(
                f"append_postings: {n_dup} doc ids already indexed — ids must "
                "be globally unique across batches (rebuild with "
                "write_postings to re-index changed documents)"
            )
    bid = _idx_batch_id(doclens)
    _write_index_batch(postings, doclens, path, bid, old.n_buckets)
    if bid not in m["batches"]:
        _idx_publish(path, m["batches"] + [bid])
    return bid


def read_postings(spark: SparkSession, path: str) -> BM25Index:
    """Open a persisted index at its committed snapshot: the batch list
    comes from the manifest HEAD, the corpus stats fold the per-batch
    rows (sums — exact avgdl over all batches), and the postings/
    doclens scans stay lazy until a query runs (tb partition pruning
    applies within every batch directory)."""
    import os

    path = require_local_root(path, "BM25 index")
    batches = _idx_manifest(path)["batches"]
    if not batches:
        raise ValueError(f"no committed BM25 index at {path!r}")
    post_dirs = [os.path.join(path, "postings", f"batch={b}") for b in batches]
    dl_dirs = [os.path.join(path, "doclens", f"batch={b}") for b in batches]
    st_dirs = [os.path.join(path, "stats", f"batch={b}") for b in batches]
    stats = (
        spark.read.parquet(*st_dirs)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").alias("sum_dl"),
            F.max("n_buckets").alias("n_buckets"),
        )
        .first()
    )
    n_docs = int(stats["n_docs"] or 0)
    avgdl = float(stats["sum_dl"]) / n_docs if n_docs else 0.0
    # basePath anchors partition discovery above the batch=<id> level so
    # multiple batch directories (each holding tb=* subdirs) present one
    # consistent (batch, tb)-partitioned relation; `batch` is an
    # implementation column, dropped from the logical schema
    postings = (
        spark.read.option("basePath", os.path.join(path, "postings"))
        .parquet(*post_dirs)
        .drop("batch")
    )
    doclens = (
        spark.read.option("basePath", os.path.join(path, "doclens"))
        .parquet(*dl_dirs)
        .drop("batch")
    )
    return BM25Index(
        postings=postings,
        doclens=doclens,
        n_docs=n_docs,
        avgdl=avgdl,
        n_buckets=int(stats["n_buckets"]),
    )


def tokenize_query(query: str) -> list[str]:
    """Same normalization as `norm_tokens`, driver-side, distinct terms
    in first-seen order."""
    words = re.sub(r"[^a-z0-9]+", " ", query.lower()).split()
    seen: dict[str, None] = {}
    for w in words:
        seen.setdefault(w, None)
    return list(seen)


def bm25_topk(
    docs: DataFrame | None,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    index: BM25Index | None = None,
) -> DataFrame:
    """(doc_id, score, rank) — Okapi BM25 top-k for a free-text query.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the non-negative Lucene
    variant), score = Σ_t idf_t · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    Plan: postings filtered to the query's terms (scan-pruned `isin`),
    df per term is a tiny broadcast aggregate, and the ranking is
    TakeOrdered. With `index` (a persisted `read_postings` handle) the
    postings scan additionally prunes by the terms' partition buckets
    and the corpus stats come from the index — zero per-query scalar
    jobs and no postings rebuild; without it the index is built inline
    from `docs` (audit mode) at the cost of one narrow corpus scan and
    two scalar aggregates. An empty corpus (or one where every document
    tokenizes to zero words, avgdl undefined) returns an empty result
    rather than dividing by zero. Scores are rounded to 4 decimals
    BEFORE ranking so the rank boundary is deterministic across engines
    and summation orders."""
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no indexable terms")
    if index is not None:
        buckets = sorted({term_bucket(t, index.n_buckets) for t in terms})
        post_q = index.postings.filter(
            F.col("tb").isin(buckets) & F.col("term").isin(terms)
        )
        doclens = index.doclens
        n_docs, avgdl = index.n_docs, index.avgdl
    else:
        if docs is None:
            raise ValueError("bm25_topk needs either docs or index")
        postings, doclens = build_postings(docs, id_col, text_col)
        post_q = postings.filter(F.col("term").isin(terms))
        stats = doclens.agg(
            F.count("*").alias("n"), F.avg("dl").alias("avgdl")
        ).first()
        n_docs = stats["n"]
        avgdl = float(stats["avgdl"]) if stats["avgdl"] is not None else 0.0
    if n_docs == 0 or not avgdl:
        # keep the id type of the source rather than guessing a schema
        return doclens.select(
            F.col("id").alias(id_col),
            F.lit(0.0).alias("score"),
            F.lit(1).cast("int").alias("rank"),
        ).limit(0)
    dfreq = post_q.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        post_q.join(F.broadcast(dfreq), "term")
        .join(doclens, "id")
        .select(
            "id",
            (
                idf
                * (F.col("tf").cast("double") * (k1 + 1))
                / (
                    F.col("tf").cast("double")
                    + k1 * (1 - b + b * F.col("dl").cast("double") / avgdl)
                )
            ).alias("s"),
        )
        .groupBy("id")
        .agg(round4(F.sum("s")).alias("score"))
    )
    from pyspark.sql.window import Window

    out = scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
    # the window runs over k rows post-limit — a driver-sized sort, not a
    # corpus-wide one
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return out.select(
        F.col("id").alias(id_col), "score", F.row_number().over(w).alias("rank")
    )


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(ngram, cnt) — the k most frequent word n-grams in the corpus
    (total occurrences, not document frequency). Partial-agg groupBy +
    TakeOrdered; ties broken lexicographically for determinism. Token
    array materialized first — see datasets.shingle_set (no CSE through
    lambda HOFs)."""
    base = docs.select(norm_tokens(F.col(text_col)).alias("toks"))
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        base.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram").asc())
        .limit(k)
    )
