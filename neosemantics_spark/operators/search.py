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
- `bm25_topk` — Okapi BM25 over the postings restricted to the query's
  terms. The term filter is an `isin` pushed into the postings scan
  (partition pruning when postings are written partitioned by term);
  document-frequency and corpus stats are two tiny aggregates; the final
  top-k is `orderBy(...).limit(k)`, which Spark executes as TakeOrdered
  (per-partition heap + driver merge — no global sort shuffle).
- `top_ngrams` — corpus composition stats: the k most frequent word
  n-grams, a partial-agg groupBy with the same guarded n-gram expansion
  as `datasets.shingle_set`.

No UDFs anywhere; scoring is arithmetic on codegen'd columns.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datasets import norm_tokens
from ..utils import round4


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


def tokenize_query(query: str) -> list[str]:
    """Same normalization as `norm_tokens`, driver-side, distinct terms
    in first-seen order."""
    words = re.sub(r"[^a-z0-9]+", " ", query.lower()).split()
    seen: dict[str, None] = {}
    for w in words:
        seen.setdefault(w, None)
    return list(seen)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score, rank) — Okapi BM25 top-k for a free-text query.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (the non-negative Lucene
    variant), score = Σ_t idf_t · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).

    Plan: postings filtered to the query's terms (scan-pruned `isin`),
    df per term is a tiny broadcast aggregate, corpus stats (N, avgdl)
    are one scalar agg job, and the ranking is TakeOrdered — the only
    shuffle is the (term, id) partial-count combine. Scores are rounded
    to 4 decimals BEFORE ranking so the rank boundary is deterministic
    across engines and summation orders."""
    terms = tokenize_query(query)
    if not terms:
        raise ValueError("query has no indexable terms")
    postings, doclens = build_postings(docs, id_col, text_col)
    post_q = postings.filter(F.col("term").isin(terms))
    stats = doclens.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).first()
    n_docs, avgdl = stats["n"], float(stats["avgdl"])
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
