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

`train_trigram_lm` / `lm_score_trigram` step the fidelity up one order:
Jelinek-Mercer interpolation P(w3|w1,w2) = λ3·c(w1w2w3)/c(w1w2)
+ λ2·c(w2w3)/c(w2) + λ1·(c(w3)+α)/(T+α·V) — the standard interpolated
n-gram backbone (KenLM's Kneser-Ney additionally discounts and learns
per-context weights; the JOIN SHAPE is identical — n-gram-keyed
equi-joins against one table per order — so swapping in KN counts is a
model-table change, not a plan change). The add-α unigram floor keeps
every interpolated probability strictly positive.
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


# ------------------------------------------------- interpolated trigram
class TrigramLM(NamedTuple):
    trigrams: DataFrame  # (w1, w2, w3, c3)
    bigrams: DataFrame  # (w1, w2, c2)
    unigrams: DataFrame  # (w1, c1)
    vocab_size: int
    total_tokens: int


def _doc_trigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, w3) — one row per trigram occurrence; same
    materialize-then-transform guard as `_doc_bigrams`."""
    base = docs.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("toks")
    )
    toks = F.col("toks")
    triples = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
                F.element_at(toks, i + 3).alias("w3"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string,w3:string>>"))
    return base.select("id", F.explode(triples).alias("t")).select(
        "id",
        F.col("t.w1").alias("w1"),
        F.col("t.w2").alias("w2"),
        F.col("t.w3").alias("w3"),
    )


def train_trigram_lm(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> TrigramLM:
    """Count tables for all three orders. Three map-side-combined
    groupBys; the two driver scalars (V and T) come from ONE agg job
    over the unigram table."""
    trigrams = (
        _doc_trigrams(corpus, id_col, text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
    )
    bigrams = (
        _doc_bigrams(corpus, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    unigrams = (
        corpus.select(F.explode(norm_tokens(F.col(text_col))).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    stats = unigrams.agg(
        F.count("*").alias("v"), F.sum("c1").alias("t")
    ).first()
    return TrigramLM(
        trigrams, bigrams, unigrams, int(stats["v"]), int(stats["t"] or 0)
    )


def lm_score_trigram(
    docs: DataFrame,
    model: TrigramLM,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_trigrams, avg_logp) — mean ln of the interpolated
    trigram probability. Join shape: document trigrams against the three
    count tables — trigram counts on (w1,w2,w3), context counts on
    (w1,w2), continuation bigrams on (w2,w3), unigrams on w2 and w3 —
    five n-gram-keyed equi-joins (broadcast vs shuffled left to AQE by
    model-table size), zero driver state beyond the two scalars. Each
    maximum-likelihood component is 0 when its context is unseen; the
    add-α unigram floor keeps the mixture positive, so out-of-model text
    scores low instead of -inf."""
    l3, l2, l1 = lambdas
    tg = _doc_trigrams(docs, id_col, text_col)
    uni = model.unigrams
    joined = (
        tg.join(model.trigrams, ["w1", "w2", "w3"], "left")
        .join(
            model.bigrams.select("w1", "w2", F.col("c2").alias("ctx2")),
            ["w1", "w2"],
            "left",
        )
        .join(
            model.bigrams.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c2").alias("c23")
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            uni.select(F.col("w1").alias("w2"), F.col("c1").alias("c1_w2")),
            "w2",
            "left",
        )
        .join(
            uni.select(F.col("w1").alias("w3"), F.col("c1").alias("c1_w3")),
            "w3",
            "left",
        )
    )
    z = F.lit(0).cast("double")
    c3 = F.coalesce(F.col("c3"), F.lit(0)).cast("double")
    ctx2 = F.coalesce(F.col("ctx2"), F.lit(0)).cast("double")
    c23 = F.coalesce(F.col("c23"), F.lit(0)).cast("double")
    c1w2 = F.coalesce(F.col("c1_w2"), F.lit(0)).cast("double")
    c1w3 = F.coalesce(F.col("c1_w3"), F.lit(0)).cast("double")
    p3 = F.when(ctx2 > 0, c3 / ctx2).otherwise(z)
    p2 = F.when(c1w2 > 0, c23 / c1w2).otherwise(z)
    p1 = (c1w3 + alpha) / (model.total_tokens + alpha * model.vocab_size)
    scored = joined.select(
        "id", F.log(l3 * p3 + l2 * p2 + l1 * p1).alias("logp")
    )
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").alias("n_trigrams"),
        round4(F.avg("logp")).alias("avg_logp"),
    )


# --------------------------------------------------- interpolated Kneser-Ney
class KNStats(NamedTuple):
    """Type/continuation-count tables for interpolated Kneser-Ney —
    derived from the TrigramLM count tables by four groupBys over n-gram
    TYPES (model-table scale, not corpus scale): exactly the
    'model-table change, not a plan change' the JM docstring promises."""

    ctx_types: DataFrame  # (w1, w2, n3t)            N1+(w1 w2 •)
    cont_bi: DataFrame    # (w2, w3, cont23)         N1+(• w2 w3)
    mid: DataFrame        # (w2, mid_types, follow_types)  N1+(• w2 •), N1+(w2 •)
    cont_uni: DataFrame   # (w3, cont1)              N1+(• w3)
    n_bigram_types: int   # N1+(• •)


def kn_stats(model: TrigramLM) -> KNStats:
    """Build the KN tables. Each trigram-table row is one trigram TYPE,
    so type counts are plain `count(*)` groupBys — no distinct-agg
    Expand. The two bigram-derived tables double as the continuation
    unigram distribution (N1+(• w) — 'in how many contexts was w seen',
    the Kneser-Ney insight that fixes JM's raw-frequency unigram floor
    for words frequent only in one context)."""
    tri, bi = model.trigrams, model.bigrams
    ctx_types = tri.groupBy("w1", "w2").agg(F.count("*").alias("n3t"))
    cont_bi = tri.groupBy("w2", "w3").agg(F.count("*").alias("cont23"))
    mid_types = tri.groupBy("w2").agg(F.count("*").alias("mid_types"))
    follow = bi.groupBy("w1").agg(F.count("*").alias("follow_types")).withColumnRenamed(
        "w1", "w2"
    )
    mid = mid_types.join(follow, "w2", "full").select(
        "w2",
        F.coalesce("mid_types", F.lit(0)).alias("mid_types"),
        F.coalesce("follow_types", F.lit(0)).alias("follow_types"),
    )
    cont_uni = bi.groupBy("w2").agg(F.count("*").alias("cont1")).withColumnRenamed(
        "w2", "w3"
    )
    return KNStats(ctx_types, cont_bi, mid, cont_uni, bi.count())


def lm_score_kn(
    docs: DataFrame,
    model: TrigramLM,
    stats: KNStats | None = None,
    discount: float = 0.75,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_trigrams, avg_logp) — mean ln of the interpolated
    Kneser-Ney trigram probability (the KenLM-fidelity step up from
    `lm_score_trigram`'s Jelinek-Mercer):

        P(w3|w1,w2) = max(c(w1w2w3)−D, 0)/c(w1w2)
                      + D·N1+(w1w2•)/c(w1w2) · P(w3|w2)
        P(w3|w2)    = max(N1+(•w2w3)−D, 0)/N1+(•w2•)
                      + D·N1+(w2•)/N1+(•w2•) · Pc(w3)
        Pc(w3)      = (N1+(•w3) + α) / (N1+(••) + α·V)

    with full backoff to the lower order when a context is unseen OR has
    no observed continuations (c(w1w2)=0, N1+(w1w2•)=0 — e.g. a bigram
    seen only document-finally — or N1+(•w2•)=0; without the N1+ guard
    the discounted mass is 0·p2 and ln P is NULL) and the same add-α
    floor on the
    continuation unigram keeping every probability positive. The join
    shape is the JM plan plus two type-count tables — seven n-gram-keyed
    equi-joins, zero driver state beyond three scalars."""
    if stats is None:
        stats = kn_stats(model)
    tg = _doc_trigrams(docs, id_col, text_col)
    joined = (
        tg.join(model.trigrams, ["w1", "w2", "w3"], "left")
        .join(
            model.bigrams.select("w1", "w2", F.col("c2").alias("ctx2")),
            ["w1", "w2"],
            "left",
        )
        .join(stats.ctx_types, ["w1", "w2"], "left")
        .join(stats.cont_bi, ["w2", "w3"], "left")
        .join(stats.mid, "w2", "left")
        .join(stats.cont_uni, "w3", "left")
    )
    D = F.lit(float(discount))
    c3 = F.coalesce(F.col("c3"), F.lit(0)).cast("double")
    ctx2 = F.coalesce(F.col("ctx2"), F.lit(0)).cast("double")
    n3t = F.coalesce(F.col("n3t"), F.lit(0)).cast("double")
    cont23 = F.coalesce(F.col("cont23"), F.lit(0)).cast("double")
    midt = F.coalesce(F.col("mid_types"), F.lit(0)).cast("double")
    folt = F.coalesce(F.col("follow_types"), F.lit(0)).cast("double")
    cont1 = F.coalesce(F.col("cont1"), F.lit(0)).cast("double")
    pc = (cont1 + alpha) / (stats.n_bigram_types + alpha * model.vocab_size)
    p2 = F.when(
        midt > 0,
        F.greatest(cont23 - D, F.lit(0.0)) / midt + D * folt / midt * pc,
    ).otherwise(pc)
    p3 = F.when(
        (ctx2 > 0) & (n3t > 0),
        F.greatest(c3 - D, F.lit(0.0)) / ctx2 + D * n3t / ctx2 * p2,
    ).otherwise(p2)
    scored = joined.select("id", F.log(p3).alias("logp"))
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").alias("n_trigrams"),
        round4(F.avg("logp")).alias("avg_logp"),
    )
