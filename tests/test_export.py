"""Export + round-trip: the reference's 'lossless' invariant
(README.md:5-6; RDFExportTest.java isomorphism comparisons via
ModelTestUtils.java:16-31 — here multiset equality over skolemized ids)."""

import pytest
from pyspark.sql import functions as F

from neosemantics_spark.config import ARRAY, KEEP, LABELS_AND_NODES, SHORTEN, GraphConfig
from neosemantics_spark.operators.export import (
    graph_to_triples,
    implicit_ontology,
    spo_filter,
    to_ntriples_lines,
)
from neosemantics_spark.operators.materialize import materialize, transform_triples
from neosemantics_spark.operators.prefixes import build_prefix_map, collect_namespaces
from neosemantics_spark.rdf.turtle import parse_ntriples
from neosemantics_spark.sources.datagen import fixture_corpus
from neosemantics_spark.sources.parse import extract_triples


@pytest.fixture(scope="module")
def raw(spark):
    return extract_triples(fixture_corpus(spark)).cache()


def _triple_key_rows(df):
    return sorted(
        (r["subject"], r["predicate"], r["object"], bool(r["is_literal"]), r["graph"])
        for r in df.collect()
    )


def test_roundtrip_keep_array(spark, raw):
    """import(KEEP, ARRAY, LABELS_AND_NODES) → export → same triple multiset.

    LABELS_AND_NODES keeps rdf:type both as label and edge; export emits the
    type triple once from labels and once from edges → dedupe before compare.
    """
    cfg = GraphConfig(
        handle_vocab_uris=KEEP, handle_multival=ARRAY, handle_rdf_types=LABELS_AND_NODES
    )
    t = transform_triples(raw, cfg)
    tables = materialize(t, cfg)
    exported = graph_to_triples(tables, cfg).dropDuplicates(
        ["subject", "predicate", "object", "is_literal", "graph", "sspo"]
    )
    orig = t.filter(F.col("sspo").isNull()).select(
        "subject", "predicate", "object", "is_literal", "graph"
    ).dropDuplicates()
    exp = exported.filter(F.col("sspo").isNull()).select(
        "subject", "predicate", "object", "is_literal", "graph"
    )
    missing = orig.exceptAll(exp)
    extra = exp.exceptAll(orig)
    m, x = missing.count(), extra.count()
    if m or x:
        print("MISSING:"); missing.show(50, truncate=False)
        print("EXTRA:"); extra.show(50, truncate=False)
    assert m == 0 and x == 0
    # star rel-prop row survives the round trip
    star = exported.filter(F.col("sspo").isNotNull()).collect()
    assert len(star) == 1 and star[0]["object"] == "1960"


def test_roundtrip_shorten_expand(spark, raw):
    """SHORTEN import → export with prefix re-expansion restores full IRIs."""
    cfg = GraphConfig(handle_vocab_uris=SHORTEN, handle_multival=ARRAY)
    ns_to_prefix = build_prefix_map(collect_namespaces(raw))
    prefix_to_ns = {v: k for k, v in ns_to_prefix.items()}
    t = transform_triples(raw, cfg, ns_to_prefix)
    tables = materialize(t, cfg)
    exported = graph_to_triples(tables, cfg, prefix_to_ns)
    preds = {r["predicate"] for r in exported.select("predicate").distinct().collect()}
    assert all(p.startswith("http") for p in preds), preds
    assert "http://example.org/name" in preds


def test_ntriples_serialization_reparse(spark, raw):
    """Serialized N-Triples lines re-parse to the same triples (E8)."""
    cfg = GraphConfig(handle_vocab_uris=KEEP, handle_multival=ARRAY, keep_lang_tag=True)
    t = transform_triples(raw, cfg)
    tables = materialize(t, cfg)
    trip = graph_to_triples(tables, cfg).filter(F.col("sspo").isNull() & F.col("graph").isNull())
    lines = [r["line"] for r in to_ntriples_lines(trip).collect()]
    reparsed = parse_ntriples("\n".join(lines))
    assert len(reparsed) == len(lines) > 20
    # spot-check an escaped literal round-trips
    assert any('"thing one"@en' in l for l in lines)


def test_spo_filter(spark, raw):
    cfg = GraphConfig(handle_vocab_uris=KEEP)
    tables = materialize(transform_triples(raw, cfg), cfg)
    trip = graph_to_triples(tables, cfg)
    got = spo_filter(trip, subject="http://example.org/thing1", literal=True).collect()
    assert {r["predicate"] for r in got} == {
        "http://www.w3.org/2000/01/rdf-schema#label",
        "http://example.org/size",
    }


def test_implicit_ontology(spark, raw):
    cfg = GraphConfig(handle_vocab_uris=KEEP)
    tables = materialize(transform_triples(raw, cfg), cfg)
    onto = implicit_ontology(tables).toPandas()
    kinds = onto.groupby("kind").size().to_dict()
    assert kinds["Class"] >= 2 and kinds["ObjectProperty"] >= 5 and kinds["DatatypeProperty"] >= 8
