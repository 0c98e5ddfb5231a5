"""MAP-mode mapping store: CRUD + persistence + import round trip
(MappingUtils.java:41-160 semantics; rdf:type prohibition
RDFToLPGStatementProcessor.java:74-86)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neosemantics_spark.config import MAP, GraphConfig
from neosemantics_spark.mapping import MappingDefinitionError, MappingStore
from neosemantics_spark.operators.materialize import transform_triples
from neosemantics_spark.sources.parse import extract_triples

VOC = "http://example.org/voc#"
NT = (
    f'<http://e/a> <{VOC}linkedTo> <http://e/b> .\n'
    f'<http://e/a> <{VOC}name> "thing" .\n'
)


def _raw(spark):
    src = spark.createDataFrame(
        pd.DataFrame(
            [{"repo": "r", "path": "f.nt", "commit": "c" * 40, "lang": "N-Triples",
              "content": NT}]
        )
    )
    return extract_triples(src)


def test_mapping_crud_and_persistence(spark, tmp_path):
    store = MappingStore(spark, str(tmp_path / "maps"))
    # add requires a prefix definition first (MappingUtils.java:48-53)
    with pytest.raises(MappingDefinitionError, match="No namespace prefix"):
        store.add(VOC + "linkedTo", "CONNECTED_TO")
    store.add_prefix("voc", VOC)
    desc = store.add(VOC + "linkedTo", "CONNECTED_TO")
    assert desc == {
        "schemaNs": VOC, "schemaPrefix": "voc",
        "schemaElement": "linkedTo", "elemName": "CONNECTED_TO",
    }
    # same graph-element key replaces the old mapping
    store.add(VOC + "connected", "CONNECTED_TO")
    # same (ns, local) replaces too
    store.add(VOC + "connected", "LINKS")
    listed = store.list().toPandas()
    assert set(listed.elemName) == {"LINKS"}
    # a NEW store on the same root sees the persisted state
    store2 = MappingStore(spark, str(tmp_path / "maps"))
    assert store2.import_mappings() == {VOC + "connected": "LINKS"}
    assert store2.drop(VOC + "connected") == "mapping successfully deleted"
    assert store2.drop(VOC + "connected") == "mapping not found"
    store2.add(VOC + "a", "A")
    store2.add(VOC + "b", "B")
    assert len(store2.list().toPandas()) == 2
    assert store2.list("a").toPandas().elemName.tolist() == ["A"]
    assert store2.drop_all(VOC) == "successfully deleted schema (and mappings)"
    assert store2.drop_all(VOC) == "schema not found"


def test_mapping_import_roundtrip(spark, tmp_path):
    """add → import uses the mapping; drop → import falls back to IGNORE
    local-name semantics (VERDICT r1 item 7 'Done =')."""
    store = MappingStore(spark, str(tmp_path / "maps2"))
    store.add_prefix("voc", VOC)
    store.add(VOC + "linkedTo", "CONNECTED_TO")
    cfg = GraphConfig(handle_vocab_uris=MAP)
    raw = _raw(spark)
    t = transform_triples(raw, cfg, mapping=store.import_mappings())
    preds = set(t.select("pred_t").toPandas().pred_t)
    assert "CONNECTED_TO" in preds       # mapped
    assert "name" in preds               # unmapped → IGNORE local name
    store.drop(VOC + "linkedTo")
    t2 = transform_triples(raw, cfg, mapping=store.import_mappings())
    preds2 = set(t2.select("pred_t").toPandas().pred_t)
    assert "CONNECTED_TO" not in preds2 and "linkedTo" in preds2


def test_rdf_type_mapping_discarded_at_import(spark, tmp_path):
    store = MappingStore(spark, str(tmp_path / "maps3"))
    rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    store.add_prefix("rdf", rdf_ns)
    store.add(rdf_ns + "type", "IS_A")  # legal to store...
    assert len(store.list().toPandas()) == 1
    # ...but discarded at import (RDFToLPGStatementProcessor.java:74-86)
    assert store.import_mappings() == {}
