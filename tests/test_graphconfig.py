"""GraphConfigStore: init/set/show/drop with the graph-empty guard
(GraphConfigProcedures.java semantics)."""

import os

import pytest

from neosemantics_spark.config import (
    ARRAY,
    KEEP,
    GraphConfig,
    GraphConfigNotFound,
    GraphConfigStore,
    GraphNotEmptyError,
)


def test_graphconfig_crud(tmp_path):
    store = GraphConfigStore(str(tmp_path / "cfg"))
    with pytest.raises(GraphConfigNotFound):
        store.show()
    cfg = store.init(handle_vocab_uris=KEEP)
    assert store.show() == cfg
    cfg2 = store.set(handle_multival=ARRAY)
    assert cfg2.handle_vocab_uris == KEEP and cfg2.handle_multival == ARRAY
    # persisted across instances
    again = GraphConfigStore(str(tmp_path / "cfg"))
    assert again.show() == cfg2
    again.drop()
    with pytest.raises(GraphConfigNotFound):
        again.show()
    with pytest.raises(GraphConfigNotFound):
        GraphConfigStore(str(tmp_path / "cfg")).set(keep_lang_tag=True)


def test_graphconfig_guard_when_graph_nonempty(tmp_path):
    graph = tmp_path / "triples"
    store = GraphConfigStore(str(tmp_path / "cfg2"), graph_dir=str(graph))
    store.init()  # empty graph: ok
    graph.mkdir()
    (graph / "run_id=x").mkdir()
    for op in ("init", "set", "drop"):
        with pytest.raises(GraphNotEmptyError):
            getattr(store, op)()


def test_graphconfig_set_rejects_unknown_key(tmp_path):
    store = GraphConfigStore(str(tmp_path / "cfg3"))
    store.init()
    with pytest.raises(TypeError):
        store.set(not_a_real_setting=1)
    # the stored config is unchanged after the failed set
    assert store.show() == GraphConfig()
