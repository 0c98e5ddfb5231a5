"""PROV-O provenance triples for curation decisions — the audit trail a
training-data pipeline must emit alongside the dataset it builds (which
documents a run kept, which it dropped, and by what activity), expressed
in the engine's own triple schema so the existing serializers
(`operators/export.py:to_ntriples_lines`) publish it as standard RDF the
reference engine (or any RDF store) can re-import.

This is the KG-construction ↔ curation bridge: the reference models
import runs as graph metadata (import-metrics counters,
n10s ImportResults — reference `src/main/java/n10s/result/*`); here the
same lineage is first-class RDF using the W3C PROV-O vocabulary
(prov:Entity / prov:Activity / prov:wasGeneratedBy /
prov:wasInvalidatedBy), joined from the decision DataFrames themselves.

Spark shape: one left-semi + one left-anti join of the input ids against
the kept ids (both on the id key — broadcast when the kept set is small,
AQE otherwise), then pure column expressions building the triple rows.
No UDFs, no collect; the output inherits the joins' partitioning and
serializes partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROV = "http://www.w3.org/ns/prov#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_DATETIME = "http://www.w3.org/2001/XMLSchema#dateTime"

_TRIPLE_COLS = ("subject", "predicate", "object", "is_literal", "datatype", "lang")


def _rows(subj, pred, obj, is_literal=False, datatype=None):
    cols = [
        subj.alias("subject"),
        F.lit(pred).alias("predicate"),
        obj.alias("object"),
        F.lit(bool(is_literal)).alias("is_literal"),
        (F.lit(datatype) if datatype else F.lit(None).cast("string")).alias("datatype"),
        F.lit(None).cast("string").alias("lang"),
    ]
    return cols


def provenance_triples(
    docs: DataFrame,
    kept: DataFrame,
    run_id: str,
    id_col: str = "doc_id",
    doc_ns: str = "http://example.org/doc/",
    activity_ns: str = "http://example.org/activity/",
    ended_at: str | None = None,
) -> DataFrame:
    """(subject, predicate, object, is_literal, datatype, lang) PROV-O
    triples for one curation run: every input doc is a prov:Entity;
    docs present in `kept` get prov:wasGeneratedBy <activity>, docs
    absent get prov:wasInvalidatedBy <activity>; the activity row is
    typed prov:Activity with an optional xsd:dateTime prov:endedAtTime
    (pass the timestamp in — determinism is on the caller).

    `kept` only needs the id column; extra columns are ignored. The
    output feeds `to_ntriples_lines` / `write_triples` unchanged.
    """
    ids = docs.select(F.col(id_col).cast("string").alias("_id"))
    kept_ids = kept.select(F.col(id_col).cast("string").alias("_id")).distinct()
    doc_iri = F.concat(F.lit(doc_ns), F.col("_id"))
    act_iri = f"{activity_ns}{run_id}"

    typed = ids.select(*_rows(doc_iri, RDF_TYPE, F.lit(PROV + "Entity")))
    gen = ids.join(kept_ids, "_id", "left_semi").select(
        *_rows(doc_iri, PROV + "wasGeneratedBy", F.lit(act_iri))
    )
    inv = ids.join(kept_ids, "_id", "left_anti").select(
        *_rows(doc_iri, PROV + "wasInvalidatedBy", F.lit(act_iri))
    )
    spark = docs.sparkSession
    act_rows = [(act_iri, RDF_TYPE, PROV + "Activity", False, None, None)]
    if ended_at is not None:
        act_rows.append(
            (act_iri, PROV + "endedAtTime", ended_at, True, XSD_DATETIME, None)
        )
    act = spark.createDataFrame(
        act_rows,
        "subject string, predicate string, object string, is_literal boolean, "
        "datatype string, lang string",
    )
    return typed.unionByName(gen).unionByName(inv).unionByName(act)
