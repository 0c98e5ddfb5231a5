"""End-to-end corpus curation pipeline — the dataset-build loop a
training run executes over raw documents:

    exact dedup → near-dup clustering (keep one doc per cluster)
    → benchmark decontamination → LM quality filter → hash split

Each stage is one of the engine's first-class operators
(operators/dedup.py, operators/datasets.py, operators/lm.py); this
module only composes them and accounts for what each stage dropped.
`jobs/curate_job.py` is the spark-submit wrapper.

Scale notes: every stage is a pure DataFrame program (hash-groupBys,
bucketed candidate joins, the skew-hardened CC operator, broadcast
decontamination, n-gram-keyed LM joins, a narrow split expression).
The only driver scalars are the stage counters and the LM score
quantile cutoff (approxQuantile — a fixed-size sketch, not a collect).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import datasets, dedup, lm


class CurationResult(NamedTuple):
    curated: DataFrame  # input columns + cluster_id, avg_logp, split
    metrics: dict


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame | None = None,
    *,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.8,
    decontam_n: int = 8,
    lm_quantile: float = 0.05,
    splits: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> CurationResult:
    """Run the full curation pipeline over `docs`.

    - near-dups: MinHash-LSH candidates, exact-Jaccard verification at
      `jaccard_threshold`, transitive clustering; the cluster's min-id
      doc survives.
    - decontamination (when `bench` given): any doc sharing a
      `decontam_n`-gram with the benchmark set is dropped.
    - LM filter: a bigram LM is trained on the surviving corpus itself
      and the bottom `lm_quantile` of docs by mean log-prob is dropped
      (self-trained perplexity filtering; gibberish scores far below the
      bulk). Docs too short to have bigrams are kept (no evidence either
      way) with a null score.
    - split: deterministic md5-prefix train/val/test assignment.
    """
    metrics: dict = {"n_input": docs.count()}

    kept = dedup.dedup_exact(docs, text_col).cache()
    metrics["n_after_exact_dedup"] = kept.count()

    cand = dedup.minhash_lsh_candidates(
        kept, num_hashes=num_hashes, bands=bands, text_col=text_col
    )
    verified = dedup.ngram_jaccard_pairs(
        kept, threshold=jaccard_threshold, text_col=text_col, candidates=cand
    ).select("a", "b")
    clusters = dedup.near_dup_clusters(kept, verified, id_col)
    reps = (
        kept.join(clusters, id_col)
        .filter(F.col(id_col) == F.col("cluster_id"))
        .cache()
    )
    metrics["n_after_near_dedup"] = reps.count()

    clean = reps
    if bench is not None:
        contaminated = datasets.decontaminate(
            clean, bench, n=decontam_n, id_col=id_col, text_col=text_col
        )
        clean = clean.join(
            contaminated.select(id_col), id_col, "left_anti"
        ).cache()
        metrics["n_after_decontam"] = clean.count()

    model = lm.train_bigram_lm(clean, id_col, text_col)
    scored = clean.join(
        lm.lm_score(clean, model, id_col=id_col, text_col=text_col).select(
            id_col, "avg_logp"
        ),
        id_col,
        "left",
    ).cache()
    if lm_quantile > 0:
        [cutoff] = scored.filter(F.col("avg_logp").isNotNull()).approxQuantile(
            "avg_logp", [lm_quantile], 0.001
        ) or [None]
        if cutoff is not None:
            scored = scored.filter(
                F.col("avg_logp").isNull() | (F.col("avg_logp") >= cutoff)
            )
        metrics["lm_cutoff"] = cutoff
    metrics["n_after_lm_filter"] = scored.count()

    curated = datasets.hash_split(scored, splits, id_col=id_col)
    metrics["split_counts"] = {
        r["split"]: r["n"]
        for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    return CurationResult(curated, metrics)
