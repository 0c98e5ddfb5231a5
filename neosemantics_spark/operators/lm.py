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

from pyspark.storagelevel import StorageLevel

from .datasets import norm_tokens
from ..utils import round4


def _pin_model(df: DataFrame) -> DataFrame:
    """Persist a model count table (guide §5: reuse > recompute).

    Every trained model table here is consumed several times — by the
    count-of-counts/driver-scalar actions at train time AND by the
    scoring join (the KN5 score plan alone re-reads ten tables). Without
    a persist each consumer re-runs the corpus tokenize+explode+agg
    lineage from the parquet scan (measured: 11 identical `Scan parquet
    → Generate → HashAggregate` subtrees in the lm_score_kn5 physical
    plan). Model tables are aggregated n-gram counts — orders of
    magnitude smaller than the corpus — and MEMORY_AND_DISK spills
    rather than OOMs if a 100 TB-scale vocabulary outgrows executor
    memory. This is intra-query reuse of a derived table, not result
    caching: every run still computes the model from the input corpus."""
    return df.persist(StorageLevel.MEMORY_AND_DISK)


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
    bigrams = _pin_model(bg.groupBy("w1", "w2").agg(F.count("*").alias("c2")))
    unigrams = _pin_model(
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
    trigrams = _pin_model(
        _doc_trigrams(corpus, id_col, text_col)
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("c3"))
    )
    bigrams = _pin_model(
        _doc_bigrams(corpus, id_col, text_col)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    unigrams = _pin_model(
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


# --------------------------------------------- order-5 modified Kneser-Ney
class KN5LM(NamedTuple):
    """Model tables for 5-gram modified (three-discount) Kneser-Ney —
    the documented KenLM-fidelity boundary (this module's header):
    raw top-order counts, the continuation-count chain derived from the
    next order's TYPE tables, per-context backoff-mass buckets, and the
    per-level discount triples estimated from count-of-counts."""

    t5: DataFrame      # (w1..w5, c)            raw 5-gram counts
    c4r: DataFrame     # (w1..w4, c)            raw 4-gram counts (top denom)
    g5: DataFrame      # (w1..w4, n1, n2, n3p)  5-gram count buckets per ctx
    c4p: DataFrame     # (w2..w5, cc)           N1+(• w2..w5)
    d4: DataFrame      # (w2..w4, den, n1, n2, n3p)
    c3p: DataFrame     # (w3..w5, cc)           N1+(• w3 w4 w5)
    d3: DataFrame      # (w3, w4, den, n1, n2, n3p)
    c2p: DataFrame     # (w4, w5, cc)           N1+(• w4 w5)
    d2: DataFrame      # (w4, den, n1, n2, n3p)
    c1p: DataFrame     # (w5, cc)               N1+(• w5)
    discounts: dict    # level -> (D1, D2, D3)
    n_bigram_types: int
    vocab_size: int


def _doc_ngrams(docs: DataFrame, n: int, id_col: str, text_col: str) -> DataFrame:
    """(id, w1..wn) — one row per n-gram occurrence; same
    materialize-then-transform guard as `_doc_bigrams`."""
    base = docs.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("toks")
    )
    toks = F.col("toks")
    struct_type = "array<struct<" + ",".join(f"w{i + 1}:string" for i in range(n)) + ">>"
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.struct(
                *[F.element_at(toks, i + j + 1).alias(f"w{j + 1}") for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast(struct_type))
    return base.select("id", F.explode(grams).alias("g")).select(
        "id", *[F.col(f"g.w{i + 1}").alias(f"w{i + 1}") for i in range(n)]
    )


def _mkn_discounts(counts: DataFrame, col: str) -> tuple[float, float, float]:
    """Chen–Goodman modified-KN discount triple from the count-of-counts
    of one level's count table: Y = n1/(n1+2n2), D1 = 1−2Y·n2/n1,
    D2 = 2−3Y·n3/n2, D3+ = 3−4Y·n4/n3, each clamped to ≥ 0.05 so the
    backoff mass γ stays strictly positive (positivity is what keeps
    every interpolated probability finite — the lm_score_kn backoff
    lesson). Degenerate count-of-counts (any nᵢ = 0, possible on tiny
    corpora) fall back to the fixed 0.75 discount of the single-D KN."""
    c = F.col(col)
    r = counts.agg(*_coc_aggs(c)).first()
    return _discount_triple(r)


def _coc_aggs(c):
    """The four count-of-counts sums feeding a discount triple."""
    return [
        F.sum(F.when(c == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(c == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(c == 3, 1).otherwise(0)).alias("n3"),
        F.sum(F.when(c == 4, 1).otherwise(0)).alias("n4"),
    ]


def _discount_triple(r) -> tuple[float, float, float]:
    """Count-of-counts row -> clamped (D1, D2, D3) per `_mkn_discounts`."""
    n1, n2, n3, n4 = (float(r[k] or 0) for k in ("n1", "n2", "n3", "n4"))
    if min(n1, n2, n3, n4) <= 0:
        return (0.75, 0.75, 0.75)
    y = n1 / (n1 + 2.0 * n2)
    return (
        max(1.0 - 2.0 * y * n2 / n1, 0.05),
        max(2.0 - 3.0 * y * n3 / n2, 0.05),
        max(3.0 - 4.0 * y * n4 / n3, 0.05),
    )


def _bucket_aggs(c):
    """Backoff-mass buckets per context: how many continuation types
    have count exactly 1, exactly 2, and 3+ — the three numerators of
    the modified-KN γ."""
    return [
        F.sum(F.when(c == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(c == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(c >= 3, 1).otherwise(0)).alias("n3p"),
    ]


def train_kn5_lm(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> KN5LM:
    """Count/type tables for order-5 modified Kneser-Ney. Everything is
    n-gram-keyed groupBys — five raw-count tables over the corpus, then
    model-table-scale derivations (continuation counts from the next
    order's TYPE table, per-context denominator+bucket tables, four
    discount triples from count-of-counts) — the same 'model-table
    change, not a plan change' trajectory the JM docstring promises,
    two orders further. Driver scalars: the discount triples, the
    bigram-type total, and V."""
    g5 = _doc_ngrams(corpus, 5, id_col, text_col)
    t5 = _pin_model(g5.groupBy("w1", "w2", "w3", "w4", "w5").agg(F.count("*").alias("c")))
    # ---- lower-order raw tables WITHOUT re-exploding the corpus
    # (guide §2.3 'aggregate before you shuffle'): a doc of m tokens has
    # its k-gram occurrences at positions 1..m-k+1; the (k+1)-gram
    # occurrences' PREFIXES cover positions 1..m-k, so
    #   raw k-gram counts = prefix-marginal of the (k+1)-gram counts
    #                       + the doc-final k-gram of every doc with m>=k
    # and the k-gram TYPE set = prefixes of the (k+1)-gram types ∪ the
    # doc-final k-grams. The marginals run over the (already aggregated,
    # pinned) model tables; the tails come from ONE narrow pass that
    # tokenizes each doc once and keeps only its last ≤4 tokens — this
    # replaces the three corpus-scale tokenize+explode+agg passes the
    # 4/3/2-gram tables used to pay (plan: 5 `Scan→Generate→HashAggregate`
    # corpus subtrees → 2).
    tails = _pin_model(
        corpus.select(norm_tokens(F.col(text_col)).alias("_t")).select(
            F.size("_t").alias("m"),
            F.when(F.size("_t") >= 4, F.slice("_t", -4, 4)).otherwise(F.col("_t")).alias(
                "tail"
            ),
        )
    )

    def _tail_grams(k: int) -> DataFrame:
        return tails.filter(F.col("m") >= k).select(
            *[
                F.element_at("tail", j - k - 1).alias(f"w{j}")
                for j in range(1, k + 1)
            ]
        )

    c4r = _pin_model(
        t5.select("w1", "w2", "w3", "w4", "c")
        .unionByName(_tail_grams(4).withColumn("c", F.lit(1).cast("long")))
        .groupBy("w1", "w2", "w3", "w4")
        .agg(F.sum("c").alias("c"))
    )
    t4types = c4r.select("w1", "w2", "w3", "w4")  # raw 4-gram TYPES
    t3types = _pin_model(
        c4r.select("w1", "w2", "w3").unionByName(_tail_grams(3)).distinct()
    )
    t2types = _pin_model(
        t3types.select("w1", "w2").unionByName(_tail_grams(2)).distinct()
    )
    # continuation counts: c'_k(suffix) = |{w : raw (k+1)-gram (w, suffix)}|
    c4p = _pin_model(t5.groupBy("w2", "w3", "w4", "w5").agg(F.count("*").alias("cc")))
    c3p = _pin_model(
        t4types.groupBy("w2", "w3", "w4").agg(F.count("*").alias("cc")).select(
            F.col("w2").alias("w3"), F.col("w3").alias("w4"), F.col("w4").alias("w5"), "cc"
        )
    )
    c2p = _pin_model(
        t3types.groupBy("w2", "w3").agg(F.count("*").alias("cc")).select(
            F.col("w2").alias("w4"), F.col("w3").alias("w5"), "cc"
        )
    )
    c1p = _pin_model(
        t2types.groupBy("w2").agg(F.count("*").alias("cc")).select(
            F.col("w2").alias("w5"), "cc"
        )
    )
    # per-context denominator + γ buckets at each interpolated level
    g5t = t5.groupBy("w1", "w2", "w3", "w4").agg(*_bucket_aggs(F.col("c")))
    d4 = c4p.groupBy("w2", "w3", "w4").agg(
        F.sum("cc").alias("den"), *_bucket_aggs(F.col("cc"))
    )
    d3 = c3p.groupBy("w3", "w4").agg(
        F.sum("cc").alias("den"), *_bucket_aggs(F.col("cc"))
    )
    d2 = c2p.groupBy("w4").agg(
        F.sum("cc").alias("den"), *_bucket_aggs(F.col("cc"))
    )
    # all four discount triples from ONE union-agg job over the pinned
    # tables (was four separate `.first()` driver actions — same sums,
    # same rows, one job and one codegen unit); this job is also what
    # first materializes the whole pinned-table chain
    cc_union = (
        t5.select(F.lit(5).alias("lvl"), F.col("c"))
        .unionByName(c4p.select(F.lit(4).alias("lvl"), F.col("cc").alias("c")))
        .unionByName(c3p.select(F.lit(3).alias("lvl"), F.col("cc").alias("c")))
        .unionByName(c2p.select(F.lit(2).alias("lvl"), F.col("cc").alias("c")))
    )
    coc = {
        int(r["lvl"]): r
        for r in cc_union.groupBy("lvl").agg(*_coc_aggs(F.col("c"))).collect()
    }
    discounts = {lvl: _discount_triple(coc[lvl]) for lvl in (5, 4, 3, 2)}
    # distinct-token vocabulary without another corpus pass: every token
    # of a doc with m>=2 occurs in at least one bigram (as w1 unless
    # doc-final, as w2 unless doc-initial), so vocab = bigram-type
    # endpoints ∪ the single token of m==1 docs (from the tails pass).
    # The bigram-type total and the vocab count share ONE driver action
    # (cross-join of two one-row aggregates).
    vocab = (
        t2types.select(F.col("w1").alias("w"))
        .unionByName(t2types.select(F.col("w2").alias("w")))
        .unionByName(
            tails.filter(F.col("m") == 1).select(F.element_at("tail", -1).alias("w"))
        )
        .distinct()
        .agg(F.count("*").alias("uv"))
    )
    stats = (
        c1p.agg(F.sum("cc").alias("nb"), F.count("*").alias("v"))
        .crossJoin(vocab)
        .first()
    )
    uni_v = int(stats["uv"] or 0)
    tails.unpersist()
    return KN5LM(
        t5, c4r, g5t, c4p, d4, c3p, d3, c2p, d2, c1p,
        discounts, int(stats["nb"] or 0), uni_v,
    )


def _mkn_level(count_col, den_col, n1_col, n2_col, n3p_col, ds, lower):
    """One modified-KN interpolation level as a column expression:
    (c − D(c))⁺/den + γ/den · lower, with γ = D1·N1 + D2·N2 + D3·N3+
    over the context's continuation-count buckets. Falls back to `lower`
    entirely when the context is unseen or has no continuations (den or
    bucket total 0 — the lm_score_kn NULL-backoff guard generalized)."""
    d1, d2, d3 = (F.lit(float(d)) for d in ds)
    c = F.coalesce(count_col, F.lit(0)).cast("double")
    den = F.coalesce(den_col, F.lit(0)).cast("double")
    n1 = F.coalesce(n1_col, F.lit(0)).cast("double")
    n2 = F.coalesce(n2_col, F.lit(0)).cast("double")
    n3p = F.coalesce(n3p_col, F.lit(0)).cast("double")
    disc = F.when(c >= 3, d3).when(c == 2, d2).otherwise(d1)
    gamma = d1 * n1 + d2 * n2 + d3 * n3p
    return F.when(
        (den > 0) & (n1 + n2 + n3p > 0),
        F.greatest(c - disc, F.lit(0.0)) / den + gamma / den * lower,
    ).otherwise(lower)


def lm_score_kn5(
    docs: DataFrame,
    model: KN5LM,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_5grams, avg_logp) — mean ln of the order-5 modified
    (three-discount) Kneser-Ney probability, interpolating five levels:

        P(w5|w1..4) = (c5 − D₅(c5))⁺/c4(w1..4) + γ₅/c4 · P(w5|w2..4)
        P(w5|w2..4), P(w5|w3w4), P(w5|w4): same shape over the
            continuation-count chain c'ₖ with denominators Σ c'ₖ(ctx,•)
        P(w5)       = (N1+(•w5) + α)/(N1+(••) + α·V)

    with per-level discount triples D1/D2/D3 (count-of-counts estimated,
    `_mkn_discounts`) and γ = D1·N1(ctx•)+D2·N2(ctx•)+D3·N3+(ctx•). The
    unigram level keeps this engine's add-α continuation floor (the
    lm_score_kn convention) so every probability is strictly positive —
    pure modified KN at the floor can zero out on degenerate corpora.
    Every level backs off fully when its context is unseen OR has no
    continuations (the lm_score_kn doc-final-bigram guard, applied at
    all four interpolated levels). Join shape: document 5-grams against
    ten suffix-keyed model tables — ten equi-joins, zero driver state
    beyond the discount scalars; at 100 TB every table is n-gram-keyed
    and AQE picks broadcast vs shuffle per table size."""
    tg = _doc_ngrams(docs, 5, id_col, text_col)
    m = model
    pre = lambda df, p: df.select(  # noqa: E731
        *[F.col(c).alias(c if c.startswith("w") else f"{p}_{c}") for c in df.columns]
    )
    joined = (
        tg.join(m.t5.withColumnRenamed("c", "l5_c"), ["w1", "w2", "w3", "w4", "w5"], "left")
        .join(m.c4r.withColumnRenamed("c", "l5_den"), ["w1", "w2", "w3", "w4"], "left")
        .join(pre(m.g5, "g5"), ["w1", "w2", "w3", "w4"], "left")
        .join(m.c4p.withColumnRenamed("cc", "l4_c"), ["w2", "w3", "w4", "w5"], "left")
        .join(pre(m.d4, "d4"), ["w2", "w3", "w4"], "left")
        .join(m.c3p.withColumnRenamed("cc", "l3_c"), ["w3", "w4", "w5"], "left")
        .join(pre(m.d3, "d3"), ["w3", "w4"], "left")
        .join(m.c2p.withColumnRenamed("cc", "l2_c"), ["w4", "w5"], "left")
        .join(pre(m.d2, "d2"), ["w4"], "left")
        .join(m.c1p.withColumnRenamed("cc", "l1_c"), ["w5"], "left")
    )
    c1 = F.coalesce(F.col("l1_c"), F.lit(0)).cast("double")
    p1 = (c1 + alpha) / (m.n_bigram_types + alpha * m.vocab_size)
    p2 = _mkn_level(
        F.col("l2_c"), F.col("d2_den"), F.col("d2_n1"), F.col("d2_n2"),
        F.col("d2_n3p"), m.discounts[2], p1,
    )
    p3 = _mkn_level(
        F.col("l3_c"), F.col("d3_den"), F.col("d3_n1"), F.col("d3_n2"),
        F.col("d3_n3p"), m.discounts[3], p2,
    )
    p4 = _mkn_level(
        F.col("l4_c"), F.col("d4_den"), F.col("d4_n1"), F.col("d4_n2"),
        F.col("d4_n3p"), m.discounts[4], p3,
    )
    p5 = _mkn_level(
        F.col("l5_c"), F.col("l5_den"), F.col("g5_n1"), F.col("g5_n2"),
        F.col("g5_n3p"), m.discounts[5], p4,
    )
    scored = joined.select("id", F.log(p5).alias("logp"))
    return scored.groupBy(F.col("id").alias(id_col)).agg(
        F.count("*").alias("n_5grams"),
        round4(F.avg("logp")).alias("avg_logp"),
    )
