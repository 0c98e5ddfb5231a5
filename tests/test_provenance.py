"""PROV-O curation provenance (operators/provenance.py)."""

import pytest

from neosemantics_spark.operators.provenance import (
    PROV,
    RDF_TYPE,
    XSD_DATETIME,
    provenance_triples,
)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], ["doc_id", "text"])
    kept = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    return docs, kept


def test_decision_triples(spark, frames):
    docs, kept = frames
    out = provenance_triples(docs, kept, "run1", ended_at="2026-01-01T00:00:00Z")
    rows = {(r["subject"], r["predicate"], r["object"]) for r in out.collect()}
    act = "http://example.org/activity/run1"
    doc = "http://example.org/doc/"
    assert (doc + "1", RDF_TYPE, PROV + "Entity") in rows
    assert (doc + "3", RDF_TYPE, PROV + "Entity") in rows
    assert (doc + "1", PROV + "wasGeneratedBy", act) in rows
    assert (doc + "2", PROV + "wasGeneratedBy", act) in rows
    assert (doc + "3", PROV + "wasInvalidatedBy", act) in rows
    assert (doc + "3", PROV + "wasGeneratedBy", act) not in rows
    assert (act, RDF_TYPE, PROV + "Activity") in rows
    assert (act, PROV + "endedAtTime", "2026-01-01T00:00:00Z") in rows
    # 3 typed + 2 kept + 1 dropped + 2 activity rows
    assert out.count() == 8
    lit = {r["object"]: r for r in out.collect() if r["is_literal"]}
    assert set(lit) == {"2026-01-01T00:00:00Z"}
    assert lit["2026-01-01T00:00:00Z"]["datatype"] == XSD_DATETIME


def test_no_timestamp_and_extra_kept_cols(spark, frames):
    docs, _ = frames
    kept = docs.filter("doc_id < 3")  # extra columns must be ignored
    out = provenance_triples(docs, kept, "r2")
    assert out.count() == 7
    assert out.filter("is_literal").count() == 0


def test_serializes_as_ntriples(spark, frames):
    from neosemantics_spark.operators.export import to_ntriples_lines

    docs, kept = frames
    out = provenance_triples(docs, kept, "run1", ended_at="2026-01-01T00:00:00Z")
    lines = [r["line"] for r in to_ntriples_lines(out, bnode_as_label=False).collect()]
    assert all(line.endswith(" .") for line in lines)
    assert (
        f"<http://example.org/activity/run1> <{PROV}endedAtTime> "
        f'"2026-01-01T00:00:00Z"^^<{XSD_DATETIME}> .' in lines
    )
    assert (
        f"<http://example.org/doc/3> <{PROV}wasInvalidatedBy> "
        "<http://example.org/activity/run1> ." in lines
    )
