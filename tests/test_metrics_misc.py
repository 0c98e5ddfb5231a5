"""P/R metric, taxonomy similarity, compressed payloads, STRICT mode,
inference rels."""

import base64
import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neosemantics_spark.config import ARRAY, KEEP, SHORTEN_STRICT, GraphConfig
from neosemantics_spark.metrics import triple_pr
from neosemantics_spark.operators.export import graph_to_triples
from neosemantics_spark.operators.inference import rels_with_inference, transitive_closure
from neosemantics_spark.operators.materialize import materialize, transform_triples
from neosemantics_spark.operators.similarity_taxonomy import Taxonomy
from neosemantics_spark.sources.datagen import fixture_corpus
from neosemantics_spark.sources.parse import extract_triples


def test_roundtrip_pr_is_one(spark):
    """The BASELINE headline: import→export P/R vs parsed triples = 1.0
    (>= the 0.95 gate) on the fixture corpus."""
    raw = extract_triples(fixture_corpus(spark)).cache()
    cfg = GraphConfig(handle_vocab_uris=KEEP, handle_multival=ARRAY)
    t = transform_triples(raw, cfg)
    tables = materialize(t, cfg)
    exported = graph_to_triples(tables, cfg).filter(F.col("sspo").isNull())
    expected = t.filter(F.col("sspo").isNull()).select(
        "subject", "predicate", "object", "is_literal", "graph"
    )
    pr = triple_pr(exported, expected)
    assert pr.precision == 1.0 and pr.recall == 1.0, pr


def test_pr_detects_loss(spark):
    raw = extract_triples(fixture_corpus(spark))
    full = raw.filter(F.col("parse_error").isNull())
    partial = full.limit(20)
    pr = triple_pr(partial, full)
    assert pr.precision == 1.0 and pr.recall < 1.0


def test_taxonomy_similarity(spark):
    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                {"src": "Cat", "rel": "SCO", "dst": "Mammal"},
                {"src": "Dog", "rel": "SCO", "dst": "Mammal"},
                {"src": "Mammal", "rel": "SCO", "dst": "Animal"},
                {"src": "Lizard", "rel": "SCO", "dst": "Reptile"},
                {"src": "Reptile", "rel": "SCO", "dst": "Animal"},
            ]
        )
    )
    tax = Taxonomy(edges)
    assert tax.path_length("Cat", "Dog") == 2
    assert tax.path_sim("Cat", "Dog") == pytest.approx(1 / 3)
    assert tax.path_sim("Cat", "Cat") == 1.0
    # Wu-Palmer with 1-based depths: Animal=1, Mammal=2, Cat=3
    assert tax.wup_sim("Cat", "Dog") == pytest.approx(2 * 2 / (3 + 3))
    assert tax.wup_sim("Cat", "Lizard") == pytest.approx(2 * 1 / (3 + 3))
    df = tax.similarity_df(spark, [("Cat", "Dog"), ("Cat", "Lizard")]).toPandas()
    assert df.iloc[0]["wup_sim"] > df.iloc[1]["wup_sim"]


def test_compressed_payload(spark):
    nt = '<http://e/a> <http://e/p> "compressed" .\n'
    b64 = base64.b64encode(gzip.compress(nt.encode())).decode()
    src = spark.createDataFrame(
        pd.DataFrame(
            [
                {"repo": "r", "path": "data/x.nt.gz", "commit": "c" * 40,
                 "lang": None, "content": b64},
                {"repo": "r", "path": "data/bad.nt.gz", "commit": "c" * 40,
                 "lang": None, "content": "not-base64-gzip!!"},
            ]
        )
    )
    out = extract_triples(src).toPandas()
    ok = out[out.parse_error.isna()]
    assert len(ok) == 1 and ok.iloc[0]["object"] == "compressed"
    assert ok.iloc[0]["path"] == "data/x.nt"  # suffix stripped for sniffing
    assert len(out[out.parse_error.notna()]) == 1


def test_shorten_strict_raises(spark):
    raw = extract_triples(fixture_corpus(spark))
    cfg = GraphConfig(handle_vocab_uris=SHORTEN_STRICT)
    with pytest.raises(ValueError, match="SHORTEN_STRICT"):
        transform_triples(raw, cfg, {"http://www.w3.org/2001/XMLSchema#": "xsd"})


def test_rels_with_inference(spark):
    spo = spark.createDataFrame(
        pd.DataFrame(
            [
                {"src": "knows", "rel": "SPO", "dst": "related"},
                {"src": "worksWith", "rel": "SPO", "dst": "knows"},
            ]
        )
    )
    closure = transitive_closure(spo, rel="SPO")
    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                {"src": "a", "rel": "knows", "dst": "b"},
                {"src": "a", "rel": "worksWith", "dst": "c"},
                {"src": "a", "rel": "hates", "dst": "d"},
            ]
        )
    )
    got = rels_with_inference(edges, closure, "related").toPandas()
    assert sorted(got.dst) == ["b", "c"]
