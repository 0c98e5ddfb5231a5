"""Delete semantics (E10) — inverse import.

Reference: /root/reference/src/main/java/n10s/rdf/delete/DirectStatementDeleter.java:65-129 —
parse a delete payload, remove matching labels/properties/relationships;
array values element-wise; statements about blank nodes are refused and
counted (:69-72, there is no way to address a bnode from a new document).

Spark-first shape: the triples table is the source of truth; deletion is a
multiset subtraction (left_anti join on the statement key) followed by
re-materialization of the affected partitions — on Iceberg this is
`MERGE INTO … WHEN MATCHED THEN DELETE`. Works at any scale: the delete
payload is small and broadcast against the big table.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATEMENT_KEY = ["subject", "predicate", "object", "is_literal", "graph"]


class DeleteResult(NamedTuple):
    remaining: DataFrame
    triples_deleted: int
    not_deleted: int  # bnode-addressed statements refused (+ no-match rows)


def apply_delete(triples: DataFrame, delete_triples: DataFrame) -> DeleteResult:
    """Remove statements of `delete_triples` from `triples`.

    Bnode-addressed delete statements (skolemized `bnode://` subjects or
    objects arriving from a NEW document have fresh skolem ids, so they can
    never match — the reference refuses them outright) are filtered and
    counted as not-deleted."""
    bnodeish = F.col("subject").startswith("bnode://") | (
        ~F.col("is_literal") & F.col("object").startswith("bnode://")
    )
    refused = delete_triples.filter(bnodeish)
    effective = delete_triples.filter(~bnodeish)
    key_cols = [c for c in STATEMENT_KEY if c in delete_triples.columns]

    # null graph must match null graph → normalize nullable key columns
    def norm(df: DataFrame) -> DataFrame:
        out = df
        if "graph" in key_cols:
            out = out.withColumn("_gk", F.coalesce("graph", F.lit("")))
        return out

    jk = [c for c in key_cols if c != "graph"] + (["_gk"] if "graph" in key_cols else [])
    t_n = norm(triples)
    d_n = F.broadcast(norm(effective).select(*jk).distinct())
    matches = t_n.join(d_n, jk, "left_semi")
    n_deleted = matches.count()
    n_requested = norm(effective).select(*jk).distinct().count()
    n_matched_keys = matches.select(*jk).distinct().count()
    remaining = t_n.join(d_n, jk, "left_anti").drop("_gk")
    return DeleteResult(
        remaining=remaining,
        triples_deleted=n_deleted,
        not_deleted=refused.count() + (n_requested - n_matched_keys),
    )
