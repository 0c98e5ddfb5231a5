"""Triple-set precision/recall — the BASELINE.json headline metric
("matches the reference's emitted triples at P/R ≥ 0.95").

Both sides are triples DataFrames with the canonical columns; comparison
is multiset-free (distinct statement keys), null-graph-safe, and runs as
two anti-joins — O(n) shuffles, usable at any scale.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["subject", "predicate", "object", "is_literal"]


class PrecisionRecall(NamedTuple):
    precision: float
    recall: float
    n_predicted: int
    n_expected: int
    n_matched: int


def _norm(df: DataFrame, with_graph: bool) -> DataFrame:
    # RDF-star rows carry a null subject + sspo triple-id — fold it into
    # the subject key (null join keys never match, even null-to-null)
    subj = F.coalesce("subject", F.lit(""))
    if "sspo" in df.columns:
        subj = F.coalesce(
            "subject",
            F.concat(F.lit("<<"), F.array_join(F.coalesce("sspo", F.array()), " "), F.lit(">>")),
        )
    cols = [subj.alias("subject")] + [F.coalesce(c, F.lit("")).alias(c) for c in KEY[1:3]]
    cols.append(F.col("is_literal"))
    if with_graph:
        cols.append(F.coalesce("graph", F.lit("")).alias("gkey"))
    return df.select(*cols).distinct()


def triple_pr(predicted: DataFrame, expected: DataFrame, with_graph: bool = True) -> PrecisionRecall:
    with_graph = with_graph and "graph" in predicted.columns and "graph" in expected.columns
    p = _norm(predicted, with_graph)
    e = _norm(expected, with_graph)
    jk = p.columns
    n_p = p.count()
    n_e = e.count()
    n_m = p.join(e, jk, "left_semi").count()
    return PrecisionRecall(
        precision=round(n_m / n_p, 6) if n_p else 1.0,
        recall=round(n_m / n_e, 6) if n_e else 1.0,
        n_predicted=n_p,
        n_expected=n_e,
        n_matched=n_m,
    )
