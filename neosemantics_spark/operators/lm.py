"""N-gram language-model scoring — the classic corpus-quality signal
(KenLM-style perplexity filtering, simplified to an add-k-smoothed
bigram model) as pure DataFrame aggregations.

A pretraining pipeline scores every candidate document against a
reference LM and drops the tails (gibberish scores far below the bulk,
boilerplate far above). The full KenLM is a 5-gram model with Kneser-Ney
smoothing; the Spark-shaped core is the same two steps regardless of
order: (1) COUNT n-grams of a reference corpus into model tables,
(2) JOIN each candidate document's n-grams against those tables and
average the log-probabilities. Both steps are shuffles on n-gram keys —
map-side combined counts, then equi-joins — so the plan scales linearly
in corpus size with no driver state; the model tables themselves are
DataFrames that can be written/reloaded like any other table.

P(w2 | w1) = (c(w1,w2) + α) / (c(w1) + α·V), score = mean ln P over the
document's bigrams. Unseen bigrams/unigrams degrade smoothly via the
same formula (counts coalesce to 0).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .datasets import norm_tokens
from ..utils import round4


class BigramLM(NamedTuple):
    bigrams: DataFrame  # (w1, w2, c2)
    unigrams: DataFrame  # (w1, c1)
    vocab_size: int


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) — one row per bigram occurrence; docs shorter than
    two tokens emit nothing (guarded sequence, as in datasets.shingle_set).
    Token array materialized in its own projection first — inlining the
    tokenizer into the transform re-evaluates it per element (no CSE
    through lambda HOFs)."""
    base = docs.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("toks")
    )
    toks = F.col("toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return base.select("id", F.explode(pairs).alias("p")).select(
        "id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def train_bigram_lm(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> BigramLM:
    """Count model tables from a reference corpus. Two map-side-combined
    groupBys; vocab_size is the only driver scalar (needed in the
    smoothing denominator)."""
    bg = _doc_bigrams(corpus, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    unigrams = (
        corpus.select(F.explode(norm_tokens(F.col(text_col))).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    return BigramLM(bigrams, unigrams, unigrams.count())


def lm_score(
    docs: DataFrame,
    model: BigramLM,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp) — mean ln P(w2|w1) under the model.

    Join shape: document bigrams ⋈ model bigram counts on (w1, w2), then
    ⋈ unigram counts on w1 — both plain equi-joins on the n-gram keys
    (broadcast when the model is small, shuffled hash otherwise; AQE
    decides from the model table's size). Counts coalesce to 0 so
    documents full of out-of-model text score low instead of erroring —
    exactly the filtering signal. The mean is rounded portably
    (floor(x·1e4+0.5)/1e4) for engine-deterministic comparison."""
    bg = _doc_bigrams(docs, id_col, text_col)
    joined = (
        bg.join(model.bigrams, ["w1", "w2"], "left")
        .join(model.unigrams, "w1", "left")
        .select(
            "id",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + alpha)
                / (
                    F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                    + alpha * model.vocab_size
                )
            ).alias("logp"),
        )
    )
    return joined.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").alias("n_bigrams"),
        round4(F.avg("logp")).alias("avg_logp"),
    )
