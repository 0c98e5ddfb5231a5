"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes the engine's operator surface (SURVEY.md §2 + the
training-data ops) as (spark, sf_dir) -> DataFrame callables;
`oracle_sql()` gives the DuckDB-equivalent SQL for each. Column names and
values are aligned exactly (rounded floats, string-formatted timestamps).

The KG-construction queries synthesize the north-rule input table
(repo, path, commit, lang, content) deterministically from the driver's
`documents` parquet (JVM-side string assembly — see
neosemantics_spark/sources/datagen.py), so the oracle can derive the
expected triples independently with plain SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neosemantics_spark.config import KEEP, SHORTEN, GraphConfig
from neosemantics_spark.utils import round4
from neosemantics_spark.functions import (
    get_datatype,
    get_iri_local_name,
    get_iri_namespace,
    get_lang_tag,
    get_value,
)
from neosemantics_spark.operators import (
    datasets,
    dedup,
    inference,
    lm,
    search,
    similarity,
    text,
)
from neosemantics_spark.operators.cc import canonical_map
from neosemantics_spark.operators.export import (
    graph_to_triples,
    relational_to_triples,
    to_ntriples_lines,
    to_turtle_blocks,
)
from neosemantics_spark.operators.materialize import materialize, transform_triples
from neosemantics_spark.operators.multimodal import (
    extract_features,
    media_stats,
    synthetic_media,
    synthetic_media_real,
)
from neosemantics_spark.operators.prefixes import build_prefix_map, collect_namespaces
from neosemantics_spark.sources.datagen import src_files_from_documents
from neosemantics_spark.sources.parse import extract_triples
from neosemantics_spark.validation.shacl import ShaclValidator, compile_shapes

DOC = "http://example.org/doc/"
VOC = "http://example.org/voc#"
RDFT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    return spark.read.parquet(f"{sf}/documents.parquet")


def _kg_cfg() -> GraphConfig:
    return GraphConfig(handle_vocab_uris=KEEP)


# ===================================================================== KG
def q_kg_triples_nt(spark: SparkSession, sf: str) -> DataFrame:
    src = src_files_from_documents(spark, sf, "N-Triples")
    t = extract_triples(src)
    return t.select("subject", "predicate", "object", "is_literal", "datatype")


def q_kg_triples_turtle(spark: SparkSession, sf: str) -> DataFrame:
    src = src_files_from_documents(spark, sf, "Turtle")
    t = extract_triples(src)
    return t.select("subject", "predicate", "object", "is_literal", "lang")


def _kg_tables(spark: SparkSession, sf: str):
    src = src_files_from_documents(spark, sf, "N-Triples")
    cfg = _kg_cfg()
    t = transform_triples(extract_triples(src), cfg)
    return materialize(t, cfg), cfg


def q_kg_nodes(spark: SparkSession, sf: str) -> DataFrame:
    tables, _ = _kg_tables(spark, sf)
    return tables.nodes.select(
        "uri",
        F.array_join("labels", ",").alias("labels_str"),
        F.size("props").alias("n_props"),
    )


def q_kg_edges(spark: SparkSession, sf: str) -> DataFrame:
    tables, _ = _kg_tables(spark, sf)
    return tables.edges.select("src", "rel", "dst")


def q_kg_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental MERGE-equivalent import (the reference's steady-state
    loop — DirectStatementLoader.java:60-129 find-or-create + merge;
    incremental fixtures step{1,2,3}.ttl): three doc batches plus an
    update batch that re-asserts voc:lang upper-cased for doc_id % 4 == 0
    are folded into an IncrementalGraphStore one at a time
    (order='arrival' — temporal last-write-wins). The final nodes table
    must match the oracle's from-scratch SQL derivation of the union, so
    the merge path — not a re-aggregation — is what's being value-checked."""
    import shutil
    import tempfile

    from neosemantics_spark.operators.incremental import IncrementalGraphStore

    src = src_files_from_documents(spark, sf, "N-Triples")
    did = F.regexp_extract("path", r"doc_(\d+)\.nt", 1).cast("long")
    docs = _docs(spark, sf)
    subj = F.concat(F.lit(f"<{DOC}"), F.col("doc_id").cast("string"), F.lit(">"))
    upd = docs.filter(F.col("doc_id") % 4 == 0).select(
        F.lit("org/docs").alias("repo"),
        F.concat(F.lit("data/upd_"), F.col("doc_id").cast("string"), F.lit(".nt")).alias("path"),
        F.lit("1" * 40).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        F.concat(
            subj, F.lit(f' <{VOC}lang> "'), F.upper("lang"), F.lit('" .\n')
        ).alias("content"),
    )
    cfg = _kg_cfg()
    root = tempfile.mkdtemp(prefix="kg_inc_")
    try:
        store = IncrementalGraphStore(spark, root, cfg, order="arrival")
        for b in range(3):
            batch = src.filter(did % 3 == b)
            store.merge_batch(transform_triples(extract_triples(batch), cfg), f"b{b}")
        store.merge_batch(transform_triples(extract_triples(upd), cfg), "upd")
        t = store.tables()
        lang_val = t.node_props.filter(F.col("prop") == f"{VOC}lang").select(
            "uri", F.col("values")[0].alias("lang_val")
        )
        out = t.nodes.select(
            "uri",
            F.array_join("labels", ",").alias("labels_str"),
            F.size("props").alias("n_props"),
        ).join(lang_val, "uri", "left")
        # materialize before the state dir disappears (plans reading a
        # deleted parquet path fail lazily)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_kg_sameas_refresh(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental entity-linking REFRESH (VERDICT r5 item 6): two
    batches merge into the IncrementalGraphStore WITHOUT sameAs fusion
    (batch 1 = every doc's `voc:lang` triple for even doc_ids, batch 2 =
    odd doc_ids' triples PLUS `<doc/i> owl:sameAs <doc/(i-1)>` links for
    doc_id % 10 == 1 — cross-batch merges by construction), then
    `tables_canonicalized()` applies the periodic sameAs reconcile as a
    view-level remap + algebraic re-aggregation. The oracle derives the
    expected canonicalized nodes analytically: the %10==1 docs vanish
    into their even partners, whose lang value is OVERWRITTEN by the odd
    doc's row (canonical statement order: path 'doc_<i>' sorts after
    'doc_<i-1>' within a pair), and the sameAs statements themselves
    leave no uri behind."""
    import shutil
    import tempfile

    from neosemantics_spark.operators.incremental import IncrementalGraphStore

    docs = _docs(spark, sf)
    subj = F.concat(F.lit(f"<{DOC}"), F.col("doc_id").cast("string"), F.lit(">"))
    prev = F.concat(F.lit(f"<{DOC}"), (F.col("doc_id") - 1).cast("string"), F.lit(">"))
    lang_triple = F.concat(
        subj, F.lit(f' <{VOC}lang> "'), F.col("lang"), F.lit('" .\n')
    )
    content = F.when(
        F.col("doc_id") % 10 == 1,
        F.concat(lang_triple, subj, F.lit(f" <{OWL_SAMEAS}> "), prev, F.lit(" .\n")),
    ).otherwise(lang_triple)
    src = docs.select(
        F.lit("org/docs").alias("repo"),
        F.concat(F.lit("data/doc_"), F.col("doc_id").cast("string"), F.lit(".nt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        content.alias("content"),
    )
    did = F.regexp_extract("path", r"doc_(\d+)\.nt", 1).cast("long")
    cfg = _kg_cfg()
    root = tempfile.mkdtemp(prefix="kg_refresh_")
    try:
        store = IncrementalGraphStore(spark, root, cfg, order="canonical")
        store.merge_batch(
            transform_triples(extract_triples(src.filter(did % 2 == 0)), cfg), "even"
        )
        store.merge_batch(
            transform_triples(extract_triples(src.filter(did % 2 == 1)), cfg), "odd"
        )
        t = store.tables_canonicalized()
        lang_val = t.node_props.filter(F.col("prop") == f"{VOC}lang").select(
            "uri", F.col("values")[0].alias("lang_val")
        )
        out = t.nodes.select("uri", F.size("props").alias("n_props")).join(
            lang_val, "uri", "left"
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _doc_graph_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic synthetic KG edge set over the documents table:
    every doc i (except the dangling %10==0 nodes) links to
    doc (2i+1 mod n) and doc (7i+13 mod n) — gcd(7,n)=1 for the sf doc
    counts, so every node is reachable as a dst; the %10==0 nodes have
    in-edges but no out-edges, exercising dangling-mass handling."""
    docs = _docs(spark, sf).select("doc_id")
    n = docs.count()
    src = F.concat(F.lit(DOC), F.col("doc_id").cast("string"))
    linked = docs.filter(F.col("doc_id") % 10 != 0)
    e1 = linked.select(
        src.alias("src"),
        F.concat(F.lit(DOC), ((F.col("doc_id") * 2 + 1) % n).cast("string")).alias("dst"),
    )
    e2 = linked.select(
        src.alias("src"),
        F.concat(F.lit(DOC), ((F.col("doc_id") * 7 + 13) % n).cast("string")).alias("dst"),
    )
    return e1.unionByName(e2)


def q_kg_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-iteration synchronous PageRank over the synthetic doc
    graph (d=0.85, 5 iterations, uniform dangling-mass repayment) — the
    entity-importance signal a KG-aware curation pass ranks by. The
    oracle unrolls the same five iterations as chained CTEs, so the
    iterative Spark loop (join + map-side-combined sum per round, rank
    vector pinned each iteration) is value-checked end to end."""
    from neosemantics_spark.operators.graphalg import pagerank

    return pagerank(_doc_graph_edges(spark, sf)).select("uri", "rank_x1000")


def q_kg_degrees(spark: SparkSession, sf: str) -> DataFrame:
    """Structural degree profile of the synthetic doc graph."""
    from neosemantics_spark.operators.graphalg import degree_stats

    return degree_stats(_doc_graph_edges(spark, sf)).select(
        "uri", "out_degree", "in_degree"
    )


def q_kg_khop(spark: SparkSession, sf: str) -> DataFrame:
    """3-hop out-neighborhood of the %97==0 anchor docs — the subgraph
    sampler a KG-aware curation pass uses to pick documents around seed
    entities. Frontier BFS with per-hop visited anti-join; the oracle
    unrolls the three expansions and takes min(hop) per node (a node
    first reached at depth d appears in the oracle's level-d set, so the
    min equals the BFS distance)."""
    from neosemantics_spark.operators.graphalg import k_hop

    docs = _docs(spark, sf)
    seeds = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.concat(F.lit(DOC), F.col("doc_id").cast("string")).alias("uri")
    )
    return k_hop(_doc_graph_edges(spark, sf), seeds, k=3, direction="out").select(
        "uri", "hop"
    )


def q_kg_labelprop(spark: SparkSession, sf: str) -> DataFrame:
    """Synchronous label propagation (4 rounds, lexicographic-min tie
    break) over the undirected doc graph — entity community detection
    for cluster-balanced sampling. The oracle replays each round as a
    vote-count CTE + row_number pick, including the self-loop drop."""
    from neosemantics_spark.operators.graphalg import label_propagation

    return label_propagation(_doc_graph_edges(spark, sf), iters=4).select(
        "uri", "community"
    )


def q_kg_ppr(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank from the %97==0 anchor docs (the k_hop
    seed set) — relevance-to-anchors scores; oracle unrolls the five
    seed-teleport iterations as chained CTEs."""
    from neosemantics_spark.operators.graphalg import personalized_pagerank

    docs = _docs(spark, sf)
    seeds = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.concat(F.lit(DOC), F.col("doc_id").cast("string")).alias("uri")
    )
    return personalized_pagerank(_doc_graph_edges(spark, sf), seeds, iters=5).select(
        "uri", "ppr_x1000"
    )


def q_kg_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over the
    undirected doc graph via the degree-ordered forward algorithm; the
    oracle recounts each node's adjacent-neighbor pairs directly, so the
    orientation trick is value-checked against the naive definition."""
    from neosemantics_spark.operators.graphalg import triangle_stats

    return triangle_stats(_doc_graph_edges(spark, sf)).select(
        "uri", "degree", "triangles", "lcc"
    )


def q_kg_neighbor_sim(spark: SparkSession, sf: str) -> DataFrame:
    """Neighborhood-Jaccard entity-resolution candidates (shared-
    neighbor wedge join, |A∪B| from degrees — neighbor sets never
    materialized) over the undirected doc graph, threshold 0.2."""
    from neosemantics_spark.operators.graphalg import neighborhood_similarity

    return neighborhood_similarity(
        _doc_graph_edges(spark, sf), min_jaccard=0.2
    ).select("a", "b", "intersection", "jaccard")


def q_events_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization (30-min timeout) of the events table —
    per-user lag/island pass, epoch-microsecond boundaries (exact
    longs, no float timestamps in the compare)."""
    from neosemantics_spark.streaming.stream import sessionize

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return sessionize(ev, gap_minutes=30).select(
        "user_id", "session_idx", "start_us", "end_us", "n_events", "total_value"
    )


def q_events_sessions_streaming(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING sessionizer under the same gap policy as
    `events_sessions` — identical SQL oracle, which is the point: the
    stateful operator (applyInPandasWithState, event-time timeout) must
    add no semantics beyond micro-batch delivery. The events land as
    two micro-batch files plus a far-future single-event sentinel user;
    the sentinel advances the watermark past every real session's
    flush point, so the final cleanup batch emits all of them (only the
    sentinel's own session stays open, and it is filtered out)."""
    import shutil
    import tempfile

    from neosemantics_spark.streaming.stream import streaming_sessionize

    ev = spark.read.parquet(f"{sf}/events.parquet").select("user_id", "ts", "value")
    root = tempfile.mkdtemp(prefix="ns_sess_stream_")
    try:
        src, out, ck = f"{root}/src", f"{root}/out", f"{root}/ck"
        # split by user parity into two files -> two micro-batches
        ev.filter(F.col("user_id") % 2 == 0).coalesce(1).write.parquet(src)
        ev.filter(F.col("user_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)
        sentinel = spark.createDataFrame(
            [(-1, "2030-01-01 00:00:00", 0.0)], "user_id long, ts string, value double"
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        sentinel.coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_sessionize(stream, gap_minutes=30)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        res = (
            spark.read.parquet(out)
            .filter(F.col("user_id") >= 0)
            .select(
                "user_id", "session_idx", "start_us", "end_us",
                "n_events", "total_value",
            )
        )
        rows = res.collect()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "user_id long, session_idx long, start_us long, end_us long, "
        "n_events long, total_value double",
    )


def q_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window duplicated-span extraction over the dup-injected
    view (exact copies guarantee full-document spans at every sf; the
    base corpus contributes whatever natural n-gram repeats it has).
    The oracle replays window hashing as raw-gram grouping — same
    equivalence classes, so the sha2 shuffle-key discipline is checked
    against the content-level definition."""
    from neosemantics_spark.operators.dedup import duplicated_spans

    docs = _docs(spark, sf).select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    dup_view = docs.unionByName(
        tenth.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    return duplicated_spans(dup_view, n=8, min_docs=2).select(
        "doc_id", "span_start", "span_end", "span_tokens"
    )


def q_strip_spans(spark: SparkSession, sf: str) -> DataFrame:
    """The span-dedup ACTION over the dup-injected view: every
    duplicated window's content survives only in its min-id owner doc;
    the oracle re-assembles every output text byte-for-byte from raw
    segments (the dedup_chunks reassembly discipline at sliding-window
    fidelity)."""
    from neosemantics_spark.operators.dedup import strip_spans

    docs = _docs(spark, sf).select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    dup_view = docs.unionByName(
        tenth.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    return strip_spans(dup_view, n=8, min_docs=2).select(
        "doc_id", "text_deduped", "n_tokens_kept", "n_tokens_dropped"
    )


def q_span_dup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Doc-level rollup of dup_spans over the same dup-injected view —
    the drop-mostly-duplicated-docs filter signal."""
    from neosemantics_spark.operators.dedup import span_dup_stats

    docs = _docs(spark, sf).select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    dup_view = docs.unionByName(
        tenth.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    return span_dup_stats(dup_view, n=8, min_docs=2).select(
        "doc_id", "n_tokens", "dup_tokens", "dup_frac"
    )


def q_kg_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """4-round synchronous 3-core peel over the undirected doc graph —
    the dense-subgraph filter. The oracle unrolls the same four
    degree-count + both-endpoint-semi-join rounds as chained CTEs (the
    engine's early fixpoint exit is sound against a deeper unrolling:
    extra rounds are no-ops on a fixpoint)."""
    from neosemantics_spark.operators.graphalg import k_core

    return k_core(_doc_graph_edges(spark, sf), k=3, rounds=4).select(
        "uri", "core_degree"
    )


def q_curation_prov(spark: SparkSession, sf: str) -> DataFrame:
    """PROV-O provenance triples for an exact-dedup curation decision
    over the dup-injected view (the same view as dedup_exact_groups, so
    the dropped set is non-empty at every sf): kept docs get
    prov:wasGeneratedBy, dropped get prov:wasInvalidatedBy, every doc is
    typed prov:Entity, plus the typed+timestamped activity rows. Joins
    only — the oracle rebuilds every row with string concatenation."""
    from neosemantics_spark.operators.dedup import dedup_exact
    from neosemantics_spark.operators.provenance import provenance_triples

    docs = _docs(spark, sf).select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    dup_view = docs.unionByName(
        tenth.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    ).unionByName(tenth.withColumn("doc_id", F.col("doc_id") + 20_000_000))
    kept = dedup_exact(dup_view)
    return provenance_triples(
        dup_view, kept, "r6", ended_at="2026-01-01T00:00:00Z"
    ).select("subject", "predicate", "object", "is_literal", "datatype", "lang")


def q_bpe_word_hist(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus-sized stage of BPE training: pretokenized word
    histogram (letter runs | digit runs | single punctuation)."""
    from neosemantics_spark.operators.bpe import word_histogram

    return word_histogram(_docs(spark, sf)).select("word", "freq")


def q_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """First 20 learned BPE merges over the documents corpus — the
    iterative merge loop (driver-sequential by nature: round t+1's pair
    counts depend on round t's rewrite), so no SQL oracle; pinned
    instead by tests/test_bpe.py against a pure-Python reference."""
    from neosemantics_spark.operators.bpe import merges_table, train_bpe

    merges = train_bpe(_docs(spark, sf), n_merges=20, min_freq=2)
    return merges_table(spark, merges).select("rank", "left", "right", "freq")


def q_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """Token counts after encoding the corpus with its own 20-merge
    tokenizer (iterative training upstream → rows-only check; the
    encode loop itself is pinned by tests/test_bpe.py)."""
    from neosemantics_spark.operators.bpe import encode_bpe, train_bpe

    docs = _docs(spark, sf)
    merges = train_bpe(docs, n_merges=20, min_freq=2)
    return encode_bpe(docs, merges).select("doc_id", "n_tokens")


def q_kg_shorten(spark: SparkSession, sf: str) -> DataFrame:
    src = src_files_from_documents(spark, sf, "N-Triples")
    raw = extract_triples(src)
    cfg = GraphConfig(handle_vocab_uris=SHORTEN)
    ns = build_prefix_map(collect_namespaces(raw))
    t = transform_triples(raw, cfg, ns)
    return t.select(F.col("predicate"), F.col("pred_t").alias("pred_short")).distinct()


def q_kg_map(spark: SparkSession, sf: str) -> DataFrame:
    """J5 MAP mode end-to-end: mapped vocabulary elements take the user
    name, everything else falls back to IGNORE local-name semantics, and
    an rdf:type mapping is discarded at import
    (RDFToLPGStatementProcessor.java:74-86, 260-269)."""
    src = src_files_from_documents(spark, sf, "N-Triples")
    cfg = GraphConfig(handle_vocab_uris="MAP")
    # an rdf:type entry would be discarded by MappingStore.import_mappings
    # (the reference's import-side prohibition) — so only real mappings here
    mapping = {VOC + "lang": "LANGUAGE", VOC + "nchars": "SIZE"}
    t = transform_triples(extract_triples(src), cfg, mapping=mapping)
    return t.select("subject", "pred_t")


def q_kg_sameas_cc(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    subj = F.concat(F.lit(f"<{DOC}"), F.col("doc_id").cast("string"), F.lit(">"))
    prev = F.concat(F.lit(f"<{DOC}"), (F.col("doc_id") - 1).cast("string"), F.lit(">"))
    content = F.when(
        F.col("doc_id") % 5 != 0,
        F.concat(subj, F.lit(f" <{OWL_SAMEAS}> "), prev, F.lit(" .\n")),
    ).otherwise(F.lit(""))
    src = docs.select(
        F.lit("org/docs").alias("repo"),
        F.concat(F.lit("links/"), F.col("doc_id").cast("string"), F.lit(".nt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        content.alias("content"),
    )
    comp = canonical_map(extract_triples(src))
    return comp.select("uri", "component")


def q_kg_typed_literals(spark: SparkSession, sf: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf}/events.parquet")
    subj = F.concat(F.lit("<http://example.org/evt/"), F.col("event_id").cast("string"), F.lit(">"))
    ts_lex = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    content = F.concat(
        subj, F.lit(f" <{VOC}value> \""), F.col("value").cast("string"),
        F.lit(f"\"^^<{XSD}double> .\n"),
        subj, F.lit(f" <{VOC}at> \""), ts_lex, F.lit(f"\"^^<{XSD}dateTime> .\n"),
        subj, F.lit(f" <{VOC}etype> \""), F.col("event_type"), F.lit("\" .\n"),
    )
    src = ev.select(
        F.lit("org/events").alias("repo"),
        F.concat(F.lit("ev/"), F.col("event_id").cast("string"), F.lit(".nt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        content.alias("content"),
    )
    from neosemantics_spark.operators.transforms import with_typed_values

    t = with_typed_values(extract_triples(src))
    ev_id = F.regexp_extract("subject", r"/evt/(\d+)$", 1).cast("long")
    vals = t.filter(F.col("predicate") == VOC + "value").select(
        ev_id.alias("event_id"), F.col("value_double"), F.col("value_type").alias("vt_value")
    )
    times = t.filter(F.col("predicate") == VOC + "at").select(
        ev_id.alias("event_id"),
        F.date_format("value_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.col("value_type").alias("vt_ts"),
    )
    return vals.join(times, "event_id")


def _shacl_graph(spark: SparkSession, sf: str):
    """Shared graph + shapes for the kg_shacl / kg_shacl_delta oracles."""
    docs = _docs(spark, sf)
    subj = F.concat(F.lit(f"<{DOC}"), F.col("doc_id").cast("string"), F.lit(">"))
    content = F.concat(
        subj, F.lit(f" <{RDFT}> <{VOC}Document> .\n"),
        subj, F.lit(f" <{VOC}nchars> \""), F.col("n_chars").cast("string"),
        F.lit(f"\"^^<{XSD}integer> .\n"),
        F.when(
            F.col("n_chars") >= 150,
            F.concat(subj, F.lit(f" <{VOC}long_text> \"1\" .\n")),
        ).otherwise(F.lit("")),
    )
    src = docs.select(
        F.lit("org/docs").alias("repo"),
        F.concat(F.lit("g/"), F.col("doc_id").cast("string"), F.lit(".nt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        content.alias("content"),
    )
    cfg = _kg_cfg()
    tables = materialize(transform_triples(extract_triples(src), cfg), cfg)
    shapes = compile_shapes(
        f"""@prefix sh: <http://www.w3.org/ns/shacl#> .
@prefix v: <{VOC}> .
@prefix xsd: <{XSD}> .
v:DocShape a sh:NodeShape ; sh:targetClass v:Document ;
  sh:property [ sh:path v:long_text ; sh:minCount 1 ] ;
  sh:property [ sh:path v:nchars ; sh:maxInclusive 400 ] .
"""
    )
    return docs, tables, shapes


def q_kg_shacl(spark: SparkSession, sf: str) -> DataFrame:
    _, tables, shapes = _shacl_graph(spark, sf)
    res = ShaclValidator(tables).validate(shapes)
    return res.select(
        "focus_node",
        F.element_at(F.split("property_shape", "#"), -1).alias("component"),
        "result_path",
    )


def q_kg_shacl_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Delta-scoped validation (the validateTransaction analogue,
    ValidationProcedures.java:155-170): only the delta node set — docs
    with doc_id%7==0, standing in for the nodes touched by one
    incremental run — is validated. The node_set semi-join sits BELOW
    the cardinality aggregations (tests/test_plans.py locks the plan), so
    a 100-node delta never pays a full-graph aggregation."""
    docs, tables, shapes = _shacl_graph(spark, sf)
    delta = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.concat(F.lit(DOC), F.col("doc_id").cast("string")).alias("uri")
    )
    res = ShaclValidator(tables).validate_delta(shapes, delta)
    return res.select(
        "focus_node",
        F.element_at(F.split("property_shape", "#"), -1).alias("component"),
        "result_path",
    )


def q_kg_export_nt(spark: SparkSession, sf: str) -> DataFrame:
    tables, cfg = _kg_tables(spark, sf)
    trip = graph_to_triples(tables, cfg).filter(F.col("sspo").isNull())
    return to_ntriples_lines(trip).select("line")


def q_kg_export_ttl(spark: SparkSession, sf: str) -> DataFrame:
    """Turtle writer round trip: corpus triples → Turtle blocks
    (partition-parallel serializer) → reparsed by the Turtle parser →
    must equal the directly-parsed triples (A6 ttl family,
    CollectTriples.java:19-71)."""
    src = src_files_from_documents(spark, sf, "N-Triples")
    trip = extract_triples(src)
    blocks = to_turtle_blocks(trip)
    src2 = blocks.select(
        F.lit("x").alias("repo"),
        F.lit("block.ttl").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("Turtle").alias("lang"),
        F.col("line").alias("content"),
    )
    return extract_triples(src2).select(
        "subject", "predicate", "object", "is_literal", "datatype"
    )


def q_kg_export_trig(spark: SparkSession, sf: str) -> DataFrame:
    """TriG / TriG-star writer round trip: deterministic quads (named
    graphs per doc_id%3 + default-graph rows + quoted-triple-subject star
    rows for doc_id%5) → TriG blocks → reparsed by the TriG-star parser
    with the graph column AND the quoted triple preserved."""
    from neosemantics_spark.operators.export import to_trig_blocks

    docs = _docs(spark, sf)
    nullsspo = F.lit(None).cast("array<string>").alias("sspo")
    base = docs.select(
        F.concat(F.lit(DOC), F.col("doc_id").cast("string")).alias("subject"),
        F.col("lang").alias("object"),
        F.col("doc_id"),
        F.col("n_chars"),
    )
    named = base.select(
        "subject",
        F.lit(VOC + "lang").alias("predicate"),
        "object",
        F.lit(True).alias("is_literal"),
        F.lit(XSD + "string").alias("datatype"),
        F.lit(None).cast("string").alias("lang"),
        F.concat(F.lit("http://example.org/graph/"), (F.col("doc_id") % 3).cast("string")).alias("graph"),
        nullsspo,
    )
    default_g = base.select(
        "subject",
        F.lit(VOC + "nchars").alias("predicate"),
        F.col("n_chars").cast("string").alias("object"),
        F.lit(True).alias("is_literal"),
        F.lit(XSD + "string").alias("datatype"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("graph"),
        nullsspo,
    )
    star = base.filter(F.col("doc_id") % 5 == 0).select(
        F.lit(None).cast("string").alias("_nosubj"),
        F.lit(VOC + "certainty").alias("predicate"),
        F.concat(F.lit("c"), (F.col("doc_id") % 3).cast("string")).alias("object"),
        F.lit(True).alias("is_literal"),
        F.lit(XSD + "string").alias("datatype"),
        F.lit(None).cast("string").alias("lang"),
        F.concat(F.lit("http://example.org/graph/"), (F.col("doc_id") % 3).cast("string")).alias("graph"),
        F.array(F.col("subject"), F.lit(VOC + "same"), F.col("subject")).alias("sspo"),
    ).withColumnRenamed("_nosubj", "subject")
    blocks = to_trig_blocks(named.unionByName(default_g).unionByName(star))
    src = blocks.select(
        F.lit("x").alias("repo"),
        F.lit("block.trig").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("TriG").alias("lang"),
        F.col("line").alias("content"),
    )
    return extract_triples(src).select(
        "subject", "predicate", "object", "is_literal", "graph",
        F.array_join("sspo", " ").alias("star"),
    )


def q_orders_rdf(spark: SparkSession, sf: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return relational_to_triples(
        orders,
        "o_orderkey",
        "http://example.org/order/",
        type_iri=VOC + "Order",
        literal_cols={"o_orderstatus": VOC + "status", "o_orderpriority": VOC + "priority"},
        ref_cols={"o_custkey": (VOC + "customer", "http://example.org/cust/")},
    ).select("subject", "predicate", "object", "is_literal")


# ============================================================== data ops
def q_dedup_exact_kept(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.dedup_exact(_docs(spark, sf)).select("doc_id")


def q_dedup_exact_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-dup grouping over a dup-injected view (each doc_id % 10 == 0
    document duplicated twice under fresh ids) so the oracle exercises
    real non-empty groups — the raw corpus has no exact dups at sf0.01."""
    docs = _docs(spark, sf).select("doc_id", "text")
    tenth = docs.filter(F.col("doc_id") % 10 == 0)
    dup_view = (
        docs.unionByName(tenth.withColumn("doc_id", F.col("doc_id") + 10_000_000))
        .unionByName(tenth.withColumn("doc_id", F.col("doc_id") + 20_000_000))
    )
    return dedup.exact_dup_groups(dup_view).select("text_hash", "cnt", "keep_id")


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.minhash_lsh_candidates(_docs(spark, sf), num_hashes=8, bands=4).select("a", "b")


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive near-dup clustering: MinHash-LSH pair graph → connected
    components → (doc_id, cluster_id = min doc of the component);
    singletons are their own cluster. The canonical-doc selection step of
    a corpus dedup pass, oracle-checked via a recursive-CTE closure."""
    docs = _docs(spark, sf)
    pairs = dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    return dedup.near_dup_clusters(docs, pairs)


def q_cluster_reps(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-based representative election over the near-dup
    clusters: the highest-n_chars member of each cluster is the rep
    (ties → smallest id) — the drop-in upgrade over min-id election
    once a quality signal exists."""
    docs = _docs(spark, sf)
    pairs = dedup.minhash_lsh_candidates(docs, num_hashes=8, bands=4)
    clusters = dedup.near_dup_clusters(docs, pairs)
    scores = docs.select("doc_id", F.col("n_chars").cast("double").alias("score"))
    return dedup.elect_cluster_reps(clusters, scores).select(
        "doc_id", "cluster_id", "score", "is_rep"
    )


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash(_docs(spark, sf)).select("doc_id", "simhash")


def q_dedup_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(_docs(spark, sf), threshold=0.8).select("a", "b", "jaccard")


def q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    return similarity.brute_force_topk(emb, list(range(10)), k=5).select(
        "query_id", "neighbor_id", "score", "rank"
    )


def q_ann_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return similarity.lsh_bucket_table(emb, nbits=8, bands=1).select(
        F.col("id").alias("vec_id"), "bucket"
    )


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF coarse quantization THROUGH the persisted index artifact
    (round 6): write_ann_index trains the deterministic centroids and
    commits the assignments (manifest + HEAD), read_ann_index reopens
    the snapshot, and the returned table is the loaded artifact — the
    oracle (unchanged) pins that the save→load round trip is exact."""
    import shutil
    import tempfile

    from neosemantics_spark.operators import ann_index

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    root = tempfile.mkdtemp(prefix="ann_idx_")
    try:
        ann_index.write_ann_index(emb, root, n_centroids=16)
        idx = ann_index.read_ann_index(spark, root)
        return idx.assignments.select(
            F.col("id").alias("vec_id"), "centroid_id", "dist"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 100 != 0)
    sharing any word 4-gram with the held-out eval slice (doc_id % 100
    == 0). n=4 chosen so the sf0.01 corpus actually has overlap; the
    production default is 8."""
    docs = _docs(spark, sf)
    train = docs.filter(F.col("doc_id") % 100 != 0)
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    return datasets.decontaminate(train, bench, n=4).select("doc_id", "shared_shingles")


def q_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic md5-prefix train/val/test assignment (90/5/5)."""
    return datasets.hash_split(_docs(spark, sf)).select("doc_id", "split")


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language deterministic downsample (dataset mixing): en 25%,
    de 50%, everything else 10%."""
    return datasets.stratified_sample(
        _docs(spark, sf), {"en": 0.25, "de": 0.5}, default_fraction=0.1
    ).select("doc_id", "lang")


def q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 top-10 for a mixed rare+common query ('dup' is the
    discriminative term in the synthetic vocabulary) — served through
    the PERSISTED index path: postings written partitioned by md5 term
    bucket for HALF the corpus, the other half folded in with
    append_postings (incremental index maintenance), then reopened and
    queried with bucket partition-pruning + zero per-query scalar jobs —
    the oracle's from-scratch SQL ranking over the full corpus checks
    that index+append ≡ rebuild (the inline path is covered by pytest)."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="bm25_idx_")
    try:
        docs = _docs(spark, sf)
        search.write_postings(docs.filter(F.col("doc_id") % 2 == 0), root, n_buckets=16)
        search.append_postings(docs.filter(F.col("doc_id") % 2 == 1), root)
        idx = search.read_postings(spark, root)
        out = search.bm25_topk(None, "dup merge window", k=10, index=idx).select(
            "doc_id", "score", "rank"
        )
        # materialize before the index directory disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_top_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus composition stats: 20 most frequent word bigrams."""
    return search.top_ngrams(_docs(spark, sf), n=2, k=20).select("ngram", "cnt")


def q_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM quality scoring: train on even doc_ids, score the held
    out odd half (the perplexity-filter signal of a pretraining build)."""
    docs = _docs(spark, sf)
    model = lm.train_bigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    return lm.lm_score(docs.filter(F.col("doc_id") % 2 == 1), model).select(
        "doc_id", "n_bigrams", "avg_logp"
    )


def q_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric n-gram containment over a truncation-injected view:
    every doc_id % 7 == 0 document reappears (id +40M) truncated to its
    first half (≥5 words) — the embedded-document duplication shape
    (quoted article, truncated mirror) that Jaccard under-detects. The
    truncated copy's shingles are a subset of the original's, so its
    containment is 1.0 while Jaccard can be far below any dedup
    threshold."""
    docs = _docs(spark, sf).select("doc_id", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n = F.greatest(F.lit(5), (F.size(w) / 2).cast("int"))
    trunc = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 40_000_000).alias("doc_id"),
        F.array_join(F.slice(w, 1, n), " ").alias("text"),
    )
    view = docs.unionByName(trunc)
    return dedup.ngram_containment_pairs(view, threshold=0.9).select(
        "a", "b", "cont_a", "cont_b"
    )


def q_chunk_dup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-document boilerplate profile over the same truncation-injected
    view as dedup_containment (the truncated copies' leading chunks are
    exact repeats of the originals' — aligned at position 0 because the
    chunking is non-overlapping): per doc, the fraction of 8-token
    chunks shared with at least one other document."""
    docs = _docs(spark, sf).select("doc_id", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n = F.greatest(F.lit(5), (F.size(w) / 2).cast("int"))
    trunc = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 40_000_000).alias("doc_id"),
        F.array_join(F.slice(w, 1, n), " ").alias("text"),
    )
    view = docs.unionByName(trunc)
    return dedup.chunk_dup_stats(view, chunk_tokens=8).select(
        "doc_id", "n_chunks", "shared_chunks", "dup_chunk_frac"
    )


def q_dedup_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Sub-document dedup action over the truncation-injected view: the
    truncated (+40M-id) copies lose every aligned chunk to their
    originals and keep only their partial trailing chunk. Re-assembly is
    from raw text spans (byte-preserving); max_doc_tokens=60 exercises
    the oversized-doc passthrough guard on the longer half of the
    corpus (docs above the cap return untouched, flagged)."""
    docs = _docs(spark, sf).select("doc_id", "text")
    w = F.split(F.trim(F.col("text")), r"\s+")
    n = F.greatest(F.lit(5), (F.size(w) / 2).cast("int"))
    trunc = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 40_000_000).alias("doc_id"),
        F.array_join(F.slice(w, 1, n), " ").alias("text"),
    )
    view = docs.unionByName(trunc)
    return dedup.dedup_chunks(view, chunk_tokens=8, max_doc_tokens=60).select(
        "doc_id", "text_deduped", "n_chunks_kept", "n_chunks_dropped", "passthrough"
    )


def q_repetition_features(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition filters: top-bigram character share and
    duplicated-trigram character share per document."""
    return text.repetition_features(_docs(spark, sf)).select(
        "doc_id", "top_bigram_char_frac", "dup_trigram_char_frac"
    )


def q_token_budget_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget dataset mixing: en capped at 6000 tokens, de at
    2500, zh uncapped (budget above the stratum total exercises the
    keep-all path); fr/es carry no budget and are dropped."""
    return datasets.token_budget_sample(
        _docs(spark, sf), {"en": 6000, "de": 2500, "zh": 1_000_000}
    ).select("doc_id", "lang")


def q_nb_classify(spark: SparkSession, sf: str) -> DataFrame:
    """Multinomial NB document classifier (the deterministic analogue
    of the fastText quality/source classifier): trained on even-id
    documents with their language as the label, scoring the odd-id
    half — (doc_id, predicted, score) with score the winning mean token
    log-likelihood + log-prior. Count-table model: two groupBys to
    train, narrow equi-joins to score, exactly SQL-replayable."""
    from neosemantics_spark.operators import classify

    docs = _docs(spark, sf)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    model = classify.train_nb(train, "lang")
    return classify.nb_score(test, model).select("doc_id", "predicted", "score")


def q_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based source mixing at alpha=0.5 over the language
    strata: per-stratum budgets ∝ sqrt(stratum token total), scaled to
    an 8000-token overall budget, then the shuffle-free md5-threshold
    keep-filter. Small languages get upsampled relative to their
    natural share (the XLM-R/mT5 mixing rule); strata whose budget
    exceeds their total exercise the keep-whole path."""
    return datasets.temperature_mix(
        _docs(spark, sf), total_budget=8000, alpha=0.5, strata_col="lang"
    ).select("doc_id", "lang")


def q_quality_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Soft quality filtering (DCLM-style probabilistic reweighting):
    keep probability ramps 0.1 → 1.0 as n_chars goes 100 → 400, decided
    per row by the integer md5-prefix threshold (numeric compare — the
    per-row cutoff can't be a lexicographic hex constant)."""
    return datasets.quality_weighted_sample(
        _docs(spark, sf), "n_chars", lo=100.0, hi=400.0, floor_frac=0.1
    ).select("doc_id", "n_chars")


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing: every document's (shard, seq_id, seq_offset)
    position in 4 parallel 256-token GPT-style concat-and-chunk streams,
    ordered by the deterministic md5 shuffle within each shard."""
    return datasets.pack_sequences(
        _docs(spark, sf), seq_tokens=256, n_shards=4
    ).select("doc_id", "shard", "n_tokens", "seq_id", "seq_offset")


def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style embedding-space dedup action: LSH-bucketed
    near-dup pairs at cosine >= 0.5 (the iid-regime threshold that
    yields a non-trivial pair graph on the synthetic embeddings) →
    connected components → min-id representative election. Every vector
    comes back with its cluster and an is_rep flag."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return similarity.semantic_dedup(emb, threshold=0.5).select(
        "vec_id", "cluster_id", "is_rep"
    )


def q_cluster_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-balanced sampling: IVF-assign every vector to one of 16
    deterministic centroids, then cap each cluster at 20 kept vectors in
    expectation via per-cluster integer-arithmetic md5 cutoffs — the
    diversity-flattening downsample, fully distributed (no driver
    collect)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return similarity.cluster_balanced_sample(
        emb, target_per_cluster=20, n_centroids=16
    ).select("vec_id", "centroid_id")


def q_semantic_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-space decontamination: vec_id % 20 == 0 vectors act as
    the held-out benchmark; training vectors (the rest) within cosine
    0.35 of any bench vector are flagged with their max similarity and
    hit count (the iid synthetic embeddings concentrate near cosine 0 —
    max observed ≈ 0.49 — so 0.35 flags a non-trivial tail; a real
    deployment sets ~0.9+ against paraphrase-level similarity)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    train = emb.filter(F.col("vec_id") % 20 != 0)
    return similarity.semantic_decontaminate(train, bench, threshold=0.35).select(
        "vec_id", "max_bench_cosine", "n_bench_hits"
    )


def q_semantic_decontam_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """The scale path of embedding-space decontamination: hyperplane-LSH
    bucket both sides (nbits=4, bands=2), multi-probe the bench side
    (Hamming radius 1), equi-join candidates, exact-cosine verify — no
    cross join anywhere, so both sides may be corpus-scale. The oracle
    replays the identical bucketing/probing/verify in SQL, so the match
    is hash-exact including LSH misses (recall vs brute force is
    measured separately in BASELINE.md)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") % 20 == 0)
    train = emb.filter(F.col("vec_id") % 20 != 0)
    return similarity.semantic_decontaminate(
        train, bench, threshold=0.35, prefilter="lsh", nbits=4, bands=2, probe_bits=1
    ).select("vec_id", "max_bench_cosine", "n_bench_hits")


def q_curation_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic two-batch replay of the incremental curation state
    machine (CurationCheckpoint) — the cross-batch exact-hash anti-join,
    persisted LSH bucket index, Jaccard verification against historical
    reps, the no-chaining drop rule, min-id in-batch clustering, and the
    split assignment, end to end through the persisted parquet state.

    Batch 1 = docs with doc_id % 3 < 2. Batch 2 = docs with
    doc_id % 3 > 0 re-submitted under ids +10M (the % 3 == 1 overlap is
    exact-dup-dropped against batch 1's hash state; the % 3 == 2 docs
    are genuinely new), plus two near-dup variant families of the
    % 3 == 0 docs (suffix tokens, ids +20M/+30M) that must match batch
    1's historical reps through the bucket index and be dropped without
    chaining their in-batch neighbors away. Returns the accepted
    (doc_id, split) set across both batches; the DuckDB oracle replays
    the identical policy in SQL (minhash/LSH/Jaccard/recursive-CTE CC).
    LM filtering and decontamination are disabled — they are stateless
    per batch and carry their own oracles (lm_score*, decontam)."""
    import shutil
    import tempfile

    from neosemantics_spark.curation import CurationCheckpoint

    docs = _docs(spark, sf).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 3 < 2)
    third = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = (
        docs.filter(F.col("doc_id") % 3 > 0)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .unionByName(
            third.select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzznear")).alias("text"),
            )
        )
        .unionByName(
            third.select(
                (F.col("doc_id") + 30_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qqfresh")).alias("text"),
            )
        )
    )
    root = tempfile.mkdtemp(prefix="curation_state_")
    try:
        cp = CurationCheckpoint(spark, root)
        r1 = cp.run(b1, lm_quantile=0.0)
        r2 = cp.run(b2, lm_quantile=0.0)
        out = r1.curated.select("doc_id", "split").unionByName(
            r2.curated.select("doc_id", "split")
        )
        # materialize before the state directory disappears
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_curation_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-batch SemDeDup through the incremental curation state
    machine: two batches of documents with all-unique synthetic texts
    (so every text-side stage is provably a no-op) carry the sf
    embeddings (vec_id < 250 = batch 1, rest = batch 2); semantic dedup
    at cosine 0.5 (nbits=4, bands=2) runs in-batch for batch 1, then
    batch 2 dedups against BOTH the persisted emb_buckets/emb_vecs
    state and itself (no chaining through history-dropped docs). The
    oracle replays bucketing, cross-batch matching, and both recursive
    CC closures in SQL — hash-exact including LSH misses."""
    import shutil
    import tempfile

    from neosemantics_spark.curation import CurationCheckpoint

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.format_string(
            "w%da w%db w%dc w%dd", "vec_id", "vec_id", "vec_id", "vec_id"
        ).alias("text"),
    )
    vecs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    root = tempfile.mkdtemp(prefix="curation_sem_")
    try:
        cp = CurationCheckpoint(spark, root)
        opts = dict(
            lm_quantile=0.0,
            semantic_dedup_threshold=0.5,
            semantic_nbits=4,
            semantic_bands=2,
            embeddings=vecs,
        )
        r1 = cp.run(b1, **opts)
        r2 = cp.run(b2, **opts)
        out = r1.curated.select("doc_id", F.lit(1).alias("batch")).unionByName(
            r2.curated.select("doc_id", F.lit(2).alias("batch"))
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_curation_streaming(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING curation layer under the same two-batch policy as
    `curation_incremental`: batch 1 lands as a parquet file and an
    availableNow foreachBatch stream curates it; batch 2 is appended and
    a second stream run (same stream checkpoint — only the new file is
    processed) curates it against the persisted state. The accepted
    (doc_id, split) set must equal the DuckDB replay of the policy —
    identical SQL oracle to curation_incremental, which is the point:
    the streaming wrapper must add no semantics beyond micro-batch
    delivery. This closes the last oracle-less component (round-3
    verdict: incremental/streaming curation rested on pytest only)."""
    import shutil
    import tempfile

    from neosemantics_spark.streaming.stream import streaming_curate

    docs = _docs(spark, sf).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 3 < 2)
    third = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = (
        docs.filter(F.col("doc_id") % 3 > 0)
        .select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        .unionByName(
            third.select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zzznear")).alias("text"),
            )
        )
        .unionByName(
            third.select(
                (F.col("doc_id") + 30_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" qqfresh")).alias("text"),
            )
        )
    )
    root = tempfile.mkdtemp(prefix="curation_stream_")
    src, out, ck, state = (f"{root}/{d}" for d in ("src", "out", "ck", "state"))
    try:
        b1.write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        streaming_curate(stream, state, out, ck, lm_quantile=0.0).awaitTermination(600)
        b2.write.mode("append").parquet(src)
        stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
        streaming_curate(stream2, state, out, ck, lm_quantile=0.0).awaitTermination(600)
        return (
            spark.read.parquet(out)
            .select("doc_id", F.col("split").cast("string").alias("split"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_curation_streaming_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING parity for the round-5 semantic curation stage
    (VERDICT r5 item 2): the exact `curation_semantic` scenario — two
    batches of unique-text docs carrying the sf embeddings, SemDeDup at
    cosine 0.5 cross-batch through the persisted emb_buckets/emb_vecs
    state — but each batch is delivered as a parquet file through an
    availableNow foreachBatch stream (`streaming_curate`, which forwards
    curation opts to CurationCheckpoint.run). The oracle is the SAME SQL
    as `curation_semantic`: the streaming wrapper must add no semantics
    beyond micro-batch delivery."""
    import shutil
    import tempfile

    from neosemantics_spark.streaming.stream import streaming_curate

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    docs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.format_string(
            "w%da w%db w%dc w%dd", "vec_id", "vec_id", "vec_id", "vec_id"
        ).alias("text"),
    )
    vecs = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    root = tempfile.mkdtemp(prefix="curation_stream_sem_")
    src, out, ck, state = (f"{root}/{d}" for d in ("src", "out", "ck", "state"))
    opts = dict(
        lm_quantile=0.0,
        semantic_dedup_threshold=0.5,
        semantic_nbits=4,
        semantic_bands=2,
        embeddings=vecs,
    )
    try:
        b1.write.parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        streaming_curate(stream, state, out, ck, **opts).awaitTermination(600)
        b2.write.mode("append").parquet(src)
        stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
        streaming_curate(stream2, state, out, ck, **opts).awaitTermination(600)
        return (
            spark.read.parquet(out)
            .select(
                "doc_id",
                F.when(F.col("doc_id") < 250, 1).otherwise(2).alias("batch"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def q_lm_score_trigram(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated (Jelinek-Mercer) trigram-LM scoring: train on even
    doc_ids, score the held-out odd half. One fidelity step below KenLM
    (fixed λ, add-α unigram floor instead of Kneser-Ney), same
    n-gram-keyed join shape at every order."""
    docs = _docs(spark, sf)
    model = lm.train_trigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    return lm.lm_score_trigram(docs.filter(F.col("doc_id") % 2 == 1), model).select(
        "doc_id", "n_trigrams", "avg_logp"
    )


def q_lm_score_kn(spark: SparkSession, sf: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram scoring (absolute discount +
    continuation counts — the model-table step from JM toward KenLM
    fidelity): train on even doc_ids, score the held-out odd half."""
    docs = _docs(spark, sf)
    model = lm.train_trigram_lm(docs.filter(F.col("doc_id") % 2 == 0))
    return lm.lm_score_kn(docs.filter(F.col("doc_id") % 2 == 1), model).select(
        "doc_id", "n_trigrams", "avg_logp"
    )


def q_lm_score_kn5(spark: SparkSession, sf: str) -> DataFrame:
    """Order-5 modified (three-discount) Kneser-Ney scoring — the
    KenLM-fidelity boundary lm.py's header names: train on even doc_ids,
    score the held-out odd half. The oracle replays the full
    count-of-counts discount estimation, the continuation-count chain,
    per-context backoff-mass buckets, and the five interpolation levels
    hash-exact."""
    docs = _docs(spark, sf)
    model = lm.train_kn5_lm(docs.filter(F.col("doc_id") % 2 == 0))
    return lm.lm_score_kn5(docs.filter(F.col("doc_id") % 2 == 1), model).select(
        "doc_id", "n_5grams", "avg_logp"
    )


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    return text.language_id(_docs(spark, sf)).select("doc_id", "pred_lang", "score")


def q_text_quality(spark: SparkSession, sf: str) -> DataFrame:
    return text.quality_features(_docs(spark, sf))


def q_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    return text.token_counts(_docs(spark, sf))


def q_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    return text.fingerprints(_docs(spark, sf)).select("doc_id", "exact_fp", "shingle_fp")


def q_text_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window token chunking (20-token windows, 5-token overlap,
    trailing partial kept) — map-only, partition-local."""
    return text.chunk_documents(_docs(spark, sf), chunk_tokens=20, overlap=5)


def q_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus scrubbing: deterministic PII (email+URL per doc, IPv4 on
    doc_id%3) injected into the text, then redacted with typed tokens and
    per-kind match counts — pure regexp column expressions."""
    docs = _docs(spark, sf)
    did = F.col("doc_id").cast("string")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"), did, F.lit("@example.com via https://ex.org/d/"), did,
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" from 10.0.0."), (F.col("doc_id") % 256).cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return text.redact_pii(injected).select(
        "doc_id", "redacted", "n_emails", "n_urls", "n_ips"
    )


def q_events_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), round4(F.avg("value")).alias("avg_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("hour"),
            "event_type",
            "n",
            "avg_value",
        )
    )


def q_iri_functions(spark: SparkSession, sf: str) -> DataFrame:
    src = src_files_from_documents(spark, sf, "N-Triples")
    t = extract_triples(src)
    return (
        t.select("predicate").distinct().select(
            "predicate",
            get_iri_namespace(F.col("predicate")).alias("ns"),
            get_iri_local_name(F.col("predicate")).alias("local"),
        )
    )


def q_literal_functions(spark: SparkSession, sf: str) -> DataFrame:
    docs = _docs(spark, sf)
    s1 = F.concat(F.col("n_chars").cast("string"), F.lit(f"^^{XSD}integer"))
    s2 = F.concat(F.col("source"), F.lit("@"), F.col("lang"))
    return docs.select(
        "doc_id",
        get_value(s1).alias("v1"),
        get_datatype(s1).alias("dt1"),
        get_value(s2).alias("v2"),
        get_lang_tag(s2).alias("tag2"),
    )


def q_inference_nodes(spark: SparkSession, sf: str) -> DataFrame:
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")
    nodes = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        F.concat(F.lit("http://example.org/cust/"), F.col("c_custkey").cast("string")).alias("uri"),
        F.array("n_name").alias("labels"),
    )
    sco = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_name").alias("src"), F.lit("SCO").alias("rel"), F.col("r_name").alias("dst")
    )
    closure = inference.transitive_closure(sco)
    got = inference.nodes_labelled_with_inference(nodes, closure, "ASIA")
    return got.select("uri")


def q_inference_categories(spark: SparkSession, sf: str) -> DataFrame:
    """Micro-reasoner completion (MicroReasoners.java:102-127,441-480):
    customers -[in]-> nation nodes, nations -SCO-> regions; boolean
    in_category('ASIA') via the custom in-category relationship."""
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")
    individuals = cust.select(
        F.concat(F.lit("http://example.org/cust/"), F.col("c_custkey").cast("string")).alias("uri")
    )
    in_edges = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select(
        F.concat(F.lit("http://example.org/cust/"), F.col("c_custkey").cast("string")).alias("src"),
        F.lit("in").alias("rel"),
        F.col("n_name").alias("dst"),
    )
    sco = nation.join(region, nation.n_regionkey == region.r_regionkey).select(
        F.col("n_name").alias("src"), F.lit("SCO").alias("rel"), F.col("r_name").alias("dst")
    )
    closure = inference.transitive_closure(sco)
    flags = inference.in_category_flags(
        individuals, in_edges, closure, "ASIA", in_cat_rel="in"
    )
    return flags.select("uri", "in_category")


def q_skos_route(spark: SparkSession, sf: str) -> DataFrame:
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")
    j = nation.join(region, nation.n_regionkey == region.r_regionkey)
    skos = "http://www.w3.org/2004/02/skos/core#"
    trip = j.select(
        F.col("r_name").alias("subject"),
        F.lit(skos + "narrower").alias("predicate"),
        F.col("n_name").alias("object"),
        F.lit(False).alias("is_literal"),
    ).unionByName(
        j.select(
            F.col("n_name").alias("subject"),
            F.lit(skos + "broader").alias("predicate"),
            F.col("r_name").alias("object"),
            F.lit(False).alias("is_literal"),
        )
    )
    return inference.route_skos(trip).distinct().select("src", "rel", "dst")


def q_skos_xl(spark: SparkSession, sf: str) -> DataFrame:
    """SKOS-XL two-leg label indirection end-to-end: each doc is a concept
    with a direct skos:prefLabel AND a reified skosxl:altLabel → labelNode
    → skosxl:literalForm chain; skos_label_props resolves both into
    (concept, prop, value) rows (SkosImporter.java:144-167)."""
    docs = _docs(spark, sf)
    skos = "http://www.w3.org/2004/02/skos/core#"
    skosxl = "http://www.w3.org/2008/05/skos-xl#"
    con = F.concat(F.lit("<http://example.org/concept/"), F.col("doc_id").cast("string"), F.lit(">"))
    xl = F.concat(F.lit("<http://example.org/xlabel/"), F.col("doc_id").cast("string"), F.lit(">"))
    content = F.concat(
        con, F.lit(f' <{skos}prefLabel> "pref-'), F.col("doc_id").cast("string"), F.lit('" .\n'),
        con, F.lit(f" <{skosxl}altLabel> "), xl, F.lit(" .\n"),
        xl, F.lit(f' <{skosxl}literalForm> "'), F.col("lang"), F.lit('" .\n'),
    )
    src = docs.select(
        F.lit("org/skos").alias("repo"),
        F.concat(F.lit("c/"), F.col("doc_id").cast("string"), F.lit(".nt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        content.alias("content"),
    )
    t = extract_triples(src)
    return inference.skos_label_props(t).select("concept", "prop", "value")


def q_di_model(spark: SparkSession, sf: str) -> DataFrame:
    """Data-Importer model export (experimental.export.dimodel,
    DIModelBuilder.java:32-110): deterministic ontology from nation/region
    (5 classes, one object property + one datatype property per nation)
    → LPG schema rows (element, name, src, dst)."""
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    region = spark.read.parquet(f"{sf}/region.parquet")
    r2 = region.select(
        F.col("r_regionkey").alias("k2"), F.col("r_name").alias("rng_name")
    )
    j = (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .join(r2, (nation.n_nationkey % 5) == F.col("k2"))
    )
    owl = "http://www.w3.org/2002/07/owl#"
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    c = lambda col: F.concat(F.lit("<http://o/C_"), F.regexp_replace(col, " ", "_"), F.lit(">"))  # noqa: E731
    nm = F.regexp_replace(F.col("n_name"), " ", "_")
    content = F.concat(
        c(F.col("r_name")), F.lit(f" <{RDFT}> <{owl}Class> .\n"),
        F.lit("<http://o/rel_"), nm, F.lit(f"> <{RDFT}> <{owl}ObjectProperty> .\n"),
        F.lit("<http://o/rel_"), nm, F.lit(f"> <{rdfs}domain> "), c(F.col("r_name")), F.lit(" .\n"),
        F.lit("<http://o/rel_"), nm, F.lit(f"> <{rdfs}range> "), c(F.col("rng_name")), F.lit(" .\n"),
        F.lit("<http://o/p_"), nm, F.lit(f"> <{RDFT}> <{owl}DatatypeProperty> .\n"),
        F.lit("<http://o/p_"), nm, F.lit(f"> <{rdfs}domain> "), c(F.col("r_name")), F.lit(" .\n"),
        F.lit("<http://o/p_"), nm, F.lit(f"> <{rdfs}range> <{XSD}string> .\n"),
    )
    src = j.select(
        F.lit("org/onto").alias("repo"),
        F.concat(F.lit("n/"), nm, F.lit(".nt")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.lit("N-Triples").alias("lang"),
        content.alias("content"),
    )
    return inference.di_model(extract_triples(src))


def q_kg_json_tree(spark: SparkSession, sf: str) -> DataFrame:
    """S6 JSON-as-tree importer over deterministic JSON derived from
    documents; the oracle recomputes the path-derived skolem bnode ids
    with sha256 — full structural check of the tree mapping."""
    from neosemantics_spark.sources.json_tree import import_json_as_tree

    docs = _docs(spark, sf)
    content = F.to_json(
        F.struct(
            F.col("lang").alias("lang"),
            F.col("n_chars").alias("chars"),
            F.struct(F.col("source").alias("name")).alias("src"),
        )
    )
    src = docs.select(
        F.lit("org/docs").alias("repo"),
        F.concat(F.lit("j/"), F.col("doc_id").cast("string"), F.lit(".json")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        content.alias("content"),
    )
    t = import_json_as_tree(src)
    return t.filter(F.col("parse_error").isNull()).select(
        "path", "subject", "predicate", "object", "is_literal"
    )


def q_sco_closure(spark: SparkSession, sf: str) -> DataFrame:
    """Deep-hierarchy transitive closure (J7): binary-tree SCO edges
    cat_i -> cat_{i//2} derived from documents; oracle = recursive CTE."""
    docs = _docs(spark, sf).filter((F.col("doc_id") >= 1) & (F.col("doc_id") <= 63))
    edges = docs.select(
        F.concat(F.lit("cat"), F.col("doc_id").cast("string")).alias("src"),
        F.lit("SCO").alias("rel"),
        F.concat(F.lit("cat"), F.floor(F.col("doc_id") / 2).cast("string")).alias("dst"),
    )
    return inference.transitive_closure(edges).select("descendant", "ancestor")


def q_embedding_near_dups(spark: SparkSession, sf: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    # low threshold so the sf-corpus (random-ish vectors) yields rows
    return similarity.embedding_near_dups(
        emb, threshold=0.5, nbits=4, bands=2
    ).select("a", "b", "score")


def q_corpus_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset-card profile per (lang, source): one groupBy with
    digest-based unique counts — the release-notes table for a corpus."""
    from neosemantics_spark.operators.datasets import corpus_profile

    return corpus_profile(_docs(spark, sf)).select(
        "lang", "source", "n_docs", "n_unique", "dup_ratio",
        "total_chars", "total_tokens", "avg_tokens", "min_chars", "max_chars",
    )


def q_embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension min-max int8 codes (exploded to (vec_id, pos, q)
    so the oracle compares scalar ints, not array renderings); the
    engine path is the broadcast-scales zip_with chain, the oracle
    recomputes per-element from the exploded stats join."""
    from neosemantics_spark.operators.embed import quantize_embeddings

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return quantize_embeddings(emb, bits=8).select(
        "vec_id", F.posexplode("qvec").alias("pos", "q")
    )


def q_embedding_quant_error(spark: SparkSession, sf: str) -> DataFrame:
    """Round-trip max |x - dequant(quant(x))| per vector at 8 bits —
    the bit-width audit table."""
    from neosemantics_spark.operators.embed import quantization_error

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    return quantization_error(emb, bits=8).select("vec_id", "max_err")


def q_multimodal_stats(spark: SparkSession, sf: str) -> DataFrame:
    return media_stats(synthetic_media(spark, 256)).select(
        "kind", "n", "total_bytes", "avg_width", "avg_duration_ms"
    )


def q_multimodal_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL decode path: actual PNG/WAV/NSV payloads built then decoded by
    the pure-stdlib codecs; the oracle reproduces every feature from the
    deterministic generation formulas."""
    feats = extract_features(synthetic_media_real(spark, 256))
    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        round4(F.col("mean_r")).alias("mean_r"),
        round4(F.col("mean_g")).alias("mean_g"),
        round4(F.col("mean_b")).alias("mean_b"),
        round4(F.col("duration_ms")).alias("duration_ms"),
        "n_samples",
        round4(F.col("rms")).alias("rms"),
        "n_frames",
    )


# ================================================================ driver
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline (parse → transform →
    materialize) over the documents-derived N-Triples corpus at sf0.001."""
    return q_kg_nodes(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "kg_triples_nt": q_kg_triples_nt,
        "kg_triples_turtle": q_kg_triples_turtle,
        "kg_nodes": q_kg_nodes,
        "kg_edges": q_kg_edges,
        "kg_incremental": q_kg_incremental,
        "kg_sameas_refresh": q_kg_sameas_refresh,
        "kg_pagerank": q_kg_pagerank,
        "kg_degrees": q_kg_degrees,
        "kg_khop": q_kg_khop,
        "kg_labelprop": q_kg_labelprop,
        "kg_ppr": q_kg_ppr,
        "kg_triangles": q_kg_triangles,
        "kg_neighbor_sim": q_kg_neighbor_sim,
        "kg_kcore": q_kg_kcore,
        "dup_spans": q_dup_spans,
        "span_dup_stats": q_span_dup_stats,
        "strip_spans": q_strip_spans,
        "events_sessions": q_events_sessions,
        "events_sessions_streaming": q_events_sessions_streaming,
        "curation_prov": q_curation_prov,
        "bpe_word_hist": q_bpe_word_hist,
        "bpe_merges": q_bpe_merges,
        "bpe_encode": q_bpe_encode,
        "kg_shorten": q_kg_shorten,
        "kg_map": q_kg_map,
        "kg_sameas_cc": q_kg_sameas_cc,
        "kg_typed_literals": q_kg_typed_literals,
        "kg_shacl": q_kg_shacl,
        "kg_shacl_delta": q_kg_shacl_delta,
        "kg_export_nt": q_kg_export_nt,
        "kg_export_ttl": q_kg_export_ttl,
        "kg_export_trig": q_kg_export_trig,
        "orders_rdf": q_orders_rdf,
        "dedup_exact_kept": q_dedup_exact_kept,
        "dedup_exact_groups": q_dedup_exact_groups,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "cluster_reps": q_cluster_reps,
        "dedup_simhash": q_dedup_simhash,
        "dedup_jaccard": q_dedup_jaccard,
        "ann_topk": q_ann_topk,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ann_ivf": q_ann_ivf,
        "decontam": q_decontam,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "bm25_search": q_bm25_search,
        "top_ngrams": q_top_ngrams,
        "lm_score": q_lm_score,
        "lm_score_trigram": q_lm_score_trigram,
        "lm_score_kn": q_lm_score_kn,
        "lm_score_kn5": q_lm_score_kn5,
        "curation_incremental": q_curation_incremental,
        "curation_streaming": q_curation_streaming,
        "curation_semantic": q_curation_semantic,
        "curation_streaming_semantic": q_curation_streaming_semantic,
        "dedup_containment": q_dedup_containment,
        "semantic_decontam": q_semantic_decontam,
        "semantic_decontam_lsh": q_semantic_decontam_lsh,
        "token_budget_sample": q_token_budget_sample,
        "temperature_mix": q_temperature_mix,
        "nb_classify": q_nb_classify,
        "pack_sequences": q_pack_sequences,
        "quality_sample": q_quality_sample,
        "semantic_dedup": q_semantic_dedup,
        "cluster_sample": q_cluster_sample,
        "repetition_features": q_repetition_features,
        "chunk_dup_stats": q_chunk_dup_stats,
        "dedup_chunks": q_dedup_chunks,
        "lang_id": q_lang_id,
        "text_quality": q_text_quality,
        "token_counts": q_token_counts,
        "fingerprints": q_fingerprints,
        "text_chunks": q_text_chunks,
        "pii_redact": q_pii_redact,
        "events_window": q_events_window,
        "iri_functions": q_iri_functions,
        "literal_functions": q_literal_functions,
        "inference_nodes": q_inference_nodes,
        "inference_categories": q_inference_categories,
        "skos_route": q_skos_route,
        "skos_xl": q_skos_xl,
        "di_model": q_di_model,
        "multimodal_stats": q_multimodal_stats,
        "multimodal_features": q_multimodal_features,
        "kg_json_tree": q_kg_json_tree,
        "embedding_near_dups": q_embedding_near_dups,
        "corpus_profile": q_corpus_profile,
        "embedding_quantize": q_embedding_quantize,
        "embedding_quant_error": q_embedding_quant_error,
        "sco_closure": q_sco_closure,
    }


# ================================================================ oracles
def _doc_triples_nt_sql(select: str) -> str:
    return f"""
WITH t AS (
  SELECT '{DOC}' || doc_id AS subject, '{RDFT}' AS predicate,
         '{VOC}Document' AS object, false AS is_literal,
         CAST(NULL AS VARCHAR) AS datatype
  FROM documents
  UNION ALL
  SELECT '{DOC}' || doc_id, '{VOC}text', text, true, '{XSD}string' FROM documents
  UNION ALL
  SELECT '{DOC}' || doc_id, '{VOC}lang', lang, true, '{XSD}string' FROM documents
  UNION ALL
  SELECT '{DOC}' || doc_id, '{VOC}source', '{DOC}src/' || source, false, NULL FROM documents
  UNION ALL
  SELECT '{DOC}' || doc_id, '{VOC}nchars', CAST(n_chars AS VARCHAR), true, '{XSD}integer' FROM documents
)
{select}
"""


_WORDS = "string_split_regex(trim(lower(text)), '\\s+')"
_SHINGLES = (
    "list_distinct(CASE WHEN len(w) >= 3 THEN "
    "list_transform(generate_series(1, len(w)-2), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) "
    "ELSE [array_to_string(w, ' ')] END)"
)

_EN_STOP = "'the','and','of','to','is','in','that','it','for','with','a','an','on','as','at','by','be','are'"
_LANG_LISTS = {
    "en": "'the','and','of','to','is','in','that','it','for','with'",
    "es": "'el','la','de','que','y','en','los','del','las','por'",
    "fr": "'le','la','de','et','les','des','en','un','du','une'",
    "de": "'der','die','und','das','von','den','mit','ist','des','ein'",
}


def _lsh_bucket_sql(vec_expr: str, nbits: int, band: int = 0) -> str:
    """DuckDB replica of similarity.sign_lsh_bucket: bit p = sign of the
    md5-seeded ±1 Rademacher projection of the full vector (plane id =
    band*nbits + p, weight_j from md5('<plane>:<j>'))."""
    bits = []
    for p in range(nbits):
        plane = band * nbits + p
        bits.append(
            f"(CASE WHEN list_sum(list_transform(generate_series(1, len({vec_expr})), j -> "
            f"CAST({vec_expr}[j] AS DOUBLE) * (CASE WHEN instr('0123456789abcdef', "
            f"substr(md5('{plane}:' || CAST(j - 1 AS VARCHAR)), 1, 1)) >= 9 "
            f"THEN 1.0 ELSE -1.0 END))) > 0 THEN '1' ELSE '0' END)"
        )
    return "(" + " || ".join(bits) + ")"


def _simhash_sql() -> str:
    bit_sums = ", ".join(
        f"sum(CASE WHEN instr('0123456789abcdef', substr(h, {i + 1}, 1)) >= 9 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(32)
    )
    bit_concat = " || ".join(f"(CASE WHEN b{i} > 0 THEN '1' ELSE '0' END)" for i in range(32))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_WORDS}) AS tok FROM documents
), h AS (
  SELECT doc_id, md5(tok) AS h FROM toks WHERE tok <> ''
), bits AS (
  SELECT doc_id, {bit_sums} FROM h GROUP BY doc_id
)
SELECT doc_id, {bit_concat} AS simhash FROM bits
"""


def _minhash_ctes() -> str:
    """Shared CTE chain ending in `pairs(a, b)` — used by the pairwise
    oracle and (inside WITH RECURSIVE) the clustering oracle."""
    return f"""words AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM words
), hashes AS (
  SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || '|' || shingle) AS h
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
), sig AS (
  SELECT doc_id, seed, min(h) AS minhash FROM hashes GROUP BY doc_id, seed
), band AS (
  SELECT doc_id, seed % 4 AS band, md5(string_agg(minhash, ',' ORDER BY seed)) AS bucket
  FROM sig GROUP BY doc_id, seed % 4
), pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM band l JOIN band r ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
)"""


def _minhash_sql() -> str:
    return f"WITH {_minhash_ctes()}\nSELECT a, b FROM pairs"


def _dedup_clusters_sql() -> str:
    """Transitive closure of the pair graph via recursive CTE (set-union
    recursion terminates), component id = min reachable doc id."""
    return f"""
WITH RECURSIVE {_minhash_ctes()},
sym AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
comp AS (
  SELECT a AS doc_id, least(min(b), a) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id, CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def _jaccard_sql(threshold: float = 0.8) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM words
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), pc AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS common
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b, floor(common / (sa.sz + sb.sz - common) * 10000 + 0.5) / 10000 AS jaccard
FROM pc JOIN sizes sa ON pc.a = sa.doc_id JOIN sizes sb ON pc.b = sb.doc_id
WHERE floor(common / (sa.sz + sb.sz - common) * 10000 + 0.5) / 10000 >= {threshold}
"""


def _mh_block(src: str, p: str) -> str:
    """Per-batch minhash/LSH CTE chain (prefix `p`): words → distinct
    3-shingles → 8 md5 minhashes → 4 LSH bands, mirroring
    dedup.minhash_signatures/lsh_buckets with the CurationCheckpoint
    defaults."""
    return f"""{p}w AS (
  SELECT doc_id, {_WORDS} AS w FROM {src}
), {p}sh AS MATERIALIZED (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM {p}w
), {p}sig AS MATERIALIZED (
  SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || '|' || shingle)) AS minhash
  FROM {p}sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
  GROUP BY doc_id, seed
), {p}band AS MATERIALIZED (
  SELECT doc_id, seed % 4 AS band, md5(string_agg(minhash, ',' ORDER BY seed)) AS bucket
  FROM {p}sig GROUP BY doc_id, seed % 4
)"""


def _verify_block(sh: str, pairs: str, p: str, threshold: float = 0.8) -> str:
    """Exact-Jaccard verification of candidate `pairs` over shingle rows
    `sh` (prefix `p`): rounded-4 Jaccard >= threshold, like
    dedup.ngram_jaccard_pairs. Pairs sharing no shingle never reach
    `{p}pc` (Jaccard 0, below any useful threshold)."""
    return f"""{p}sz AS MATERIALIZED (
  SELECT doc_id, count(*) AS sz FROM {sh} GROUP BY doc_id
), {p}pc AS MATERIALIZED (
  SELECT pr.a, pr.b, count(*) AS common
  FROM {pairs} pr
  JOIN {sh} l ON l.doc_id = pr.a
  JOIN {sh} r ON r.doc_id = pr.b AND r.shingle = l.shingle
  GROUP BY pr.a, pr.b
), {p}ver AS (
  SELECT pc.a, pc.b
  FROM {p}pc pc
  JOIN {p}sz sa ON pc.a = sa.doc_id
  JOIN {p}sz sb ON pc.b = sb.doc_id
  WHERE floor(pc.common / (sa.sz + sb.sz - pc.common) * 10000 + 0.5) / 10000 >= {threshold}
)"""


def _curation_incremental_sql() -> str:
    """SQL replay of the CurationCheckpoint two-batch policy (see
    q_curation_incremental): per-batch exact dedup (min id per text),
    cross-batch hash anti-join, in-batch + bucket-index candidate pairs,
    Jaccard verification, drop-on-historical-match without chaining,
    survivor-only min-id clustering, md5-cutoff split."""
    split_case = """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
            ELSE 'test' END"""
    return f"""
WITH RECURSIVE
b1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 < 2),
b2 AS (
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 3 > 0
  UNION ALL
  SELECT doc_id + 20000000, text || ' zzznear' FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 30000000, text || ' qqfresh' FROM documents WHERE doc_id % 3 = 0
),
f1 AS MATERIALIZED (
  SELECT b.doc_id, b.text FROM b1 b
  JOIN (SELECT min(doc_id) AS doc_id FROM b1 GROUP BY text) k USING (doc_id)
),
{_mh_block('f1', 'a')},
apairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM aband l JOIN aband r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
{_verify_block('ash', 'apairs', 'a')},
asym AS (SELECT a, b FROM aver UNION SELECT b AS a, a AS b FROM aver),
areach AS (
  SELECT a, b FROM asym
  UNION
  SELECT r.a, s.b FROM areach r JOIN asym s ON r.b = s.a WHERE s.b <> r.a
),
acomp AS (SELECT a AS doc_id, least(min(b), a) AS cluster_id FROM areach GROUP BY a),
reps1 AS MATERIALIZED (
  SELECT f.doc_id, f.text FROM f1 f LEFT JOIN acomp c USING (doc_id)
  WHERE coalesce(c.cluster_id, f.doc_id) = f.doc_id
),
f2 AS MATERIALIZED (
  SELECT b.doc_id, b.text FROM b2 b
  JOIN (SELECT min(doc_id) AS doc_id FROM b2 GROUP BY text) k USING (doc_id)
  WHERE b.text NOT IN (SELECT text FROM b1)
),
{_mh_block('f2', 'n')},
oldband AS (SELECT bd.* FROM aband bd JOIN reps1 USING (doc_id)),
npairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM nband l JOIN nband r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
),
xpairs AS (
  SELECT DISTINCT least(n.doc_id, o.doc_id) AS a, greatest(n.doc_id, o.doc_id) AS b
  FROM nband n JOIN oldband o ON n.band = o.band AND n.bucket = o.bucket
),
allpairs AS (SELECT a, b FROM npairs UNION SELECT a, b FROM xpairs),
vsh AS MATERIALIZED (
  SELECT doc_id, shingle FROM nsh
  UNION ALL
  SELECT s.doc_id, s.shingle FROM ash s JOIN reps1 r USING (doc_id)
),
{_verify_block('vsh', 'allpairs', 'v')},
crossv AS (
  SELECT a, b FROM vver
  WHERE a NOT IN (SELECT doc_id FROM f2) OR b NOT IN (SELECT doc_id FROM f2)
),
matched AS (
  SELECT DISTINCT id FROM (
    SELECT a AS id FROM crossv UNION ALL SELECT b AS id FROM crossv
  ) WHERE id IN (SELECT doc_id FROM f2)
),
surv AS (SELECT doc_id FROM f2 WHERE doc_id NOT IN (SELECT id FROM matched)),
inbv AS (
  SELECT a, b FROM vver
  WHERE a IN (SELECT doc_id FROM surv) AND b IN (SELECT doc_id FROM surv)
),
nsym AS (SELECT a, b FROM inbv UNION SELECT b AS a, a AS b FROM inbv),
nreach AS (
  SELECT a, b FROM nsym
  UNION
  SELECT r.a, s.b FROM nreach r JOIN nsym s ON r.b = s.a WHERE s.b <> r.a
),
ncomp AS (SELECT a AS doc_id, least(min(b), a) AS cluster_id FROM nreach GROUP BY a),
reps2 AS (
  SELECT s.doc_id FROM surv s LEFT JOIN ncomp c USING (doc_id)
  WHERE coalesce(c.cluster_id, s.doc_id) = s.doc_id
),
acc AS (SELECT doc_id FROM reps1 UNION ALL SELECT doc_id FROM reps2)
SELECT doc_id, {split_case} AS split FROM acc
"""


def _lang_id_sql() -> str:
    scores = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{lang}' AS lang, len(list_filter(w, t -> t IN ({lst}))) AS score FROM words"
        for lang, lst in sorted(_LANG_LISTS.items())
    )
    return f"""
WITH words AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), scores AS (
{scores}
), best AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn FROM scores
)
SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS pred_lang, score
FROM best WHERE rn = 1
"""


def _quality_sql() -> str:
    return f"""
WITH words AS (
  SELECT doc_id, text, {_WORDS} AS w FROM documents
), feat AS (
  SELECT doc_id,
    len(w) AS n_tokens,
    floor(list_sum(list_transform(w, t -> length(t))) / greatest(len(w), 1) * 10000 + 0.5) / 10000 AS mean_token_len,
    floor((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / greatest(length(text), 1) * 10000 + 0.5) / 10000 AS punct_ratio,
    floor(len(list_filter(w, t -> t IN ({_EN_STOP}))) / greatest(len(w), 1) * 10000 + 0.5) / 10000 AS stopword_ratio,
    floor(len(list_distinct(w)) / greatest(len(w), 1) * 10000 + 0.5) / 10000 AS distinct_ratio
  FROM words
)
SELECT doc_id, n_tokens, mean_token_len, punct_ratio, stopword_ratio, distinct_ratio,
  floor((least(n_tokens / 64.0, 1.0) * 0.25 + (1.0 - punct_ratio) * 0.25
        + least(stopword_ratio * 4, 1.0) * 0.25 + distinct_ratio * 0.25) * 10000 + 0.5) / 10000 AS quality_score
FROM feat
"""


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out["kg_triples_nt"] = _doc_triples_nt_sql("SELECT * FROM t")
    out["kg_export_ttl"] = _doc_triples_nt_sql(
        "SELECT subject, predicate, object, is_literal, datatype FROM t"
    )
    out["kg_map"] = _doc_triples_nt_sql(
        f"""
SELECT subject,
  CASE predicate
    WHEN '{VOC}lang' THEN 'LANGUAGE'
    WHEN '{VOC}nchars' THEN 'SIZE'
    ELSE regexp_extract(predicate, '^(.*[#/])([^#/]*)$', 2)
  END AS pred_t
FROM t
"""
    )
    out["kg_export_trig"] = f"""
SELECT '{DOC}' || doc_id AS subject, '{VOC}lang' AS predicate, lang AS object,
       true AS is_literal, 'http://example.org/graph/' || (doc_id % 3) AS graph,
       CAST(NULL AS VARCHAR) AS star
FROM documents
UNION ALL
SELECT '{DOC}' || doc_id, '{VOC}nchars', CAST(n_chars AS VARCHAR),
       true, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
FROM documents
UNION ALL
SELECT CAST(NULL AS VARCHAR), '{VOC}certainty', 'c' || (doc_id % 3),
       true, 'http://example.org/graph/' || (doc_id % 3),
       '{DOC}' || doc_id || ' {VOC}same {DOC}' || doc_id
FROM documents WHERE doc_id % 5 = 0
"""
    out["kg_triples_turtle"] = f"""
SELECT '{DOC}' || doc_id AS subject, '{RDFT}' AS predicate, '{VOC}Document' AS object,
       false AS is_literal, CAST(NULL AS VARCHAR) AS lang FROM documents
UNION ALL SELECT '{DOC}' || doc_id, '{VOC}text', text, true, NULL FROM documents
UNION ALL SELECT '{DOC}' || doc_id, '{VOC}summary', text, true, lang FROM documents
UNION ALL SELECT '{DOC}' || doc_id, '{VOC}lang', lang, true, NULL FROM documents
UNION ALL SELECT '{DOC}' || doc_id, '{VOC}source', '{DOC}src/' || source, false, NULL FROM documents
UNION ALL SELECT '{DOC}' || doc_id, '{VOC}nchars', CAST(n_chars AS VARCHAR), true, NULL FROM documents
"""
    out["kg_nodes"] = f"""
SELECT '{DOC}' || doc_id AS uri, '{VOC}Document' AS labels_str, 3 AS n_props FROM documents
UNION ALL
SELECT DISTINCT '{DOC}src/' || source, '', 0 FROM documents
"""
    out["kg_incremental"] = f"""
SELECT '{DOC}' || doc_id AS uri, '{VOC}Document' AS labels_str, 3 AS n_props,
       CASE WHEN doc_id % 4 = 0 THEN upper(lang) ELSE lang END AS lang_val
FROM documents
UNION ALL
SELECT DISTINCT '{DOC}src/' || source, '', 0, CAST(NULL AS VARCHAR) FROM documents
"""
    # PageRank: the five synchronous iterations unrolled as chained CTEs
    # (dangling-mass scalar + contribution sum + rank update per round),
    # replaying graphalg.pagerank's loop value-exactly — float-sum order
    # noise (~1e-16/iter) is far below the output grid
    _pr_iters = "".join(
        f""",
dang{t} AS (SELECT coalesce(sum(rank), 0) AS m FROM r{t - 1} WHERE outdeg IS NULL),
c{t} AS (
  SELECT e.dst AS uri, sum(r.rank / r.outdeg) AS in_c
  FROM e JOIN r{t - 1} r ON e.src = r.uri GROUP BY 1
),
r{t} AS (
  SELECT b.uri, b.outdeg,
         (1 - 0.85) / nn.n + 0.85 * (coalesce(c.in_c, 0) + dang{t}.m / nn.n) AS rank
  FROM base b LEFT JOIN c{t} c USING (uri) CROSS JOIN nn CROSS JOIN dang{t}
)"""
        for t in range(1, 6)
    )
    out["kg_pagerank"] = f"""
WITH nn AS (SELECT CAST(count(*) AS DOUBLE) AS n, count(*) AS ni FROM documents),
e AS (
  SELECT '{DOC}' || doc_id AS src,
         '{DOC}' || ((doc_id * 2 + 1) % (SELECT ni FROM nn)) AS dst
  FROM documents WHERE doc_id % 10 <> 0
  UNION
  SELECT '{DOC}' || doc_id,
         '{DOC}' || ((doc_id * 7 + 13) % (SELECT ni FROM nn))
  FROM documents WHERE doc_id % 10 <> 0
),
nodes AS (SELECT src AS uri FROM e UNION SELECT dst FROM e),
deg AS (SELECT src AS uri, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1),
base AS (SELECT n.uri, d.outdeg FROM nodes n LEFT JOIN deg d USING (uri)),
r0 AS (SELECT uri, outdeg, 1.0 / nn.n AS rank FROM base CROSS JOIN nn){_pr_iters}
SELECT uri, floor(rank * 1000 * 10000 + 0.5) / 10000 AS rank_x1000 FROM r5
"""
    out["kg_degrees"] = f"""
WITH nn AS (SELECT count(*) AS ni FROM documents),
e AS (
  SELECT '{DOC}' || doc_id AS src,
         '{DOC}' || ((doc_id * 2 + 1) % (SELECT ni FROM nn)) AS dst
  FROM documents WHERE doc_id % 10 <> 0
  UNION
  SELECT '{DOC}' || doc_id,
         '{DOC}' || ((doc_id * 7 + 13) % (SELECT ni FROM nn))
  FROM documents WHERE doc_id % 10 <> 0
)
SELECT uri,
       CAST(coalesce(o.c, 0) AS BIGINT) AS out_degree,
       CAST(coalesce(i.c, 0) AS BIGINT) AS in_degree
FROM (SELECT src AS uri FROM e UNION SELECT dst FROM e) n
LEFT JOIN (SELECT src, count(*) AS c FROM e GROUP BY 1) o ON n.uri = o.src
LEFT JOIN (SELECT dst, count(*) AS c FROM e GROUP BY 1) i ON n.uri = i.dst
"""
    # shared doc-graph edge CTE for the k-hop / label-prop oracles
    _dg_e = f"""
WITH nn AS (SELECT count(*) AS ni FROM documents),
e AS (
  SELECT '{DOC}' || doc_id AS src,
         '{DOC}' || ((doc_id * 2 + 1) % (SELECT ni FROM nn)) AS dst
  FROM documents WHERE doc_id % 10 <> 0
  UNION
  SELECT '{DOC}' || doc_id,
         '{DOC}' || ((doc_id * 7 + 13) % (SELECT ni FROM nn))
  FROM documents WHERE doc_id % 10 <> 0
)"""
    # k-hop: three expansions unrolled; a node first reached at depth d
    # appears in level set h_d, so min(hop) == the BFS distance the
    # Spark frontier/anti-join loop assigns
    out["kg_khop"] = f"""{_dg_e},
h0 AS (SELECT '{DOC}' || doc_id AS uri FROM documents WHERE doc_id % 97 = 0),
h1 AS (SELECT DISTINCT e.dst AS uri FROM e JOIN h0 ON e.src = h0.uri),
h2 AS (SELECT DISTINCT e.dst AS uri FROM e JOIN h1 ON e.src = h1.uri),
h3 AS (SELECT DISTINCT e.dst AS uri FROM e JOIN h2 ON e.src = h2.uri),
lv AS (
  SELECT uri, 0 AS hop FROM h0
  UNION ALL SELECT uri, 1 FROM h1
  UNION ALL SELECT uri, 2 FROM h2
  UNION ALL SELECT uri, 3 FROM h3
)
SELECT uri, CAST(min(hop) AS INTEGER) AS hop FROM lv GROUP BY uri
"""
    # label propagation: four synchronous rounds unrolled — per round a
    # neighbor-label vote count and a (count desc, label asc) pick,
    # replaying graphalg.label_propagation's min_by(struct(-cnt, lbl))
    _lp_rounds = "".join(
        f""",
v{t} AS (
  SELECT u.src AS uri, l.community AS lbl, count(*) AS c
  FROM und u JOIN l{t - 1} l ON u.dst = l.uri GROUP BY 1, 2
),
l{t} AS (
  SELECT uri, lbl AS community FROM (
    SELECT uri, lbl,
           row_number() OVER (PARTITION BY uri ORDER BY c DESC, lbl) AS rn
    FROM v{t}
  ) WHERE rn = 1
)"""
        for t in range(1, 5)
    )
    out["kg_labelprop"] = f"""{_dg_e},
und AS (
  SELECT src, dst FROM e WHERE src <> dst
  UNION
  SELECT dst, src FROM e WHERE src <> dst
),
nodes AS (SELECT src AS uri FROM und UNION SELECT dst AS uri FROM und),
l0 AS (SELECT uri, uri AS community FROM nodes){_lp_rounds}
SELECT uri, community FROM l4
"""
    out["kg_kcore"] = f"""{_dg_e},
u0 AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e WHERE src <> dst
),
d1 AS (
  SELECT u FROM (SELECT a AS u FROM u0 UNION ALL SELECT b FROM u0)
  GROUP BY 1 HAVING count(*) >= 3
),
u1 AS (
  SELECT u0.a, u0.b FROM u0
  JOIN d1 x ON u0.a = x.u JOIN d1 y ON u0.b = y.u
),
d2 AS (
  SELECT u FROM (SELECT a AS u FROM u1 UNION ALL SELECT b FROM u1)
  GROUP BY 1 HAVING count(*) >= 3
),
u2 AS (
  SELECT u1.a, u1.b FROM u1
  JOIN d2 x ON u1.a = x.u JOIN d2 y ON u1.b = y.u
),
d3 AS (
  SELECT u FROM (SELECT a AS u FROM u2 UNION ALL SELECT b FROM u2)
  GROUP BY 1 HAVING count(*) >= 3
),
u3 AS (
  SELECT u2.a, u2.b FROM u2
  JOIN d3 x ON u2.a = x.u JOIN d3 y ON u2.b = y.u
),
d4 AS (
  SELECT u FROM (SELECT a AS u FROM u3 UNION ALL SELECT b FROM u3)
  GROUP BY 1 HAVING count(*) >= 3
),
u4 AS (
  SELECT u3.a, u3.b FROM u3
  JOIN d4 x ON u3.a = x.u JOIN d4 y ON u3.b = y.u
)
SELECT u AS uri, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT a AS u FROM u4 UNION ALL SELECT b FROM u4)
GROUP BY 1 HAVING count(*) >= 3
"""
    out["strip_spans"] = f"""
WITH dv AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
seg AS (
  SELECT doc_id, text,
         CASE WHEN len(s0) = 0 THEN [text]
              ELSE list_prepend(lead || s0[1], s0[2:]) END AS s
  FROM (SELECT doc_id, text, regexp_extract_all(text, '\\S+\\s*') AS s0,
               regexp_extract(text, '^\\s*') AS lead FROM dv)
),
w AS (SELECT doc_id, {_WORDS} AS w FROM dv),
st AS (
  SELECT doc_id, CAST(s AS INT) AS s,
         array_to_string(list_slice(w, s + 1, s + 8), ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(len(w) - 7)) AS s FROM w WHERE len(w) >= 8)
),
pg AS (
  SELECT g, min(doc_id) AS owner
  FROM (SELECT DISTINCT g, doc_id FROM st)
  GROUP BY g HAVING count(*) >= 2
),
d AS (
  SELECT DISTINCT st.doc_id, st.s FROM st JOIN pg USING (g)
  WHERE st.doc_id <> pg.owner
),
i AS (
  SELECT doc_id, s,
         CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY s) IS NULL
              OR s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) > 8
              THEN 1 ELSE 0 END AS brk
  FROM d
),
gs AS (
  SELECT doc_id, s,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM i
),
rg AS (SELECT doc_id, min(s) AS rs, max(s) + 8 AS re FROM gs GROUP BY doc_id, grp),
segpos AS (
  SELECT doc_id, unnest(s) AS sg, CAST(unnest(range(len(s))) AS INT) AS i FROM seg
),
removed AS (
  SELECT DISTINCT sp.doc_id, sp.i
  FROM segpos sp JOIN rg ON sp.doc_id = rg.doc_id AND sp.i >= rg.rs AND sp.i < rg.re
),
keptseg AS (
  SELECT sp.doc_id, sp.i, sp.sg FROM segpos sp
  ANTI JOIN removed r ON sp.doc_id = r.doc_id AND sp.i = r.i
),
reb AS (SELECT doc_id, string_agg(sg, '' ORDER BY i) AS text_deduped FROM keptseg GROUP BY 1),
dr AS (SELECT doc_id, sum(re - rs) AS dropped FROM rg GROUP BY 1)
SELECT w.doc_id,
       coalesce(reb.text_deduped, '') AS text_deduped,
       CAST(len(w.w) - coalesce(dr.dropped, 0) AS BIGINT) AS n_tokens_kept,
       CAST(coalesce(dr.dropped, 0) AS BIGINT) AS n_tokens_dropped
FROM w LEFT JOIN reb ON w.doc_id = reb.doc_id
LEFT JOIN dr ON w.doc_id = dr.doc_id
"""
    out["span_dup_stats"] = f"""
WITH dv AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, {_WORDS} AS w FROM dv),
st AS (
  SELECT doc_id, CAST(s AS INT) AS s,
         array_to_string(list_slice(w, s + 1, s + 8), ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(len(w) - 7)) AS s FROM w WHERE len(w) >= 8)
),
pg AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM st)
  GROUP BY g HAVING count(*) >= 2
),
d AS (SELECT st.doc_id, st.s FROM st JOIN pg USING (g)),
i AS (
  SELECT doc_id, s,
         CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY s) IS NULL
              OR s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) > 8
              THEN 1 ELSE 0 END AS brk
  FROM d
),
gs AS (
  SELECT doc_id, s,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM i
),
sp AS (
  SELECT doc_id, max(s) + 8 - min(s) AS span_tokens
  FROM gs GROUP BY doc_id, grp
),
pd AS (SELECT doc_id, sum(span_tokens) AS dup_tokens FROM sp GROUP BY 1)
SELECT w.doc_id, CAST(len(w.w) AS INT) AS n_tokens,
       CAST(coalesce(pd.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       floor(coalesce(pd.dup_tokens, 0) * 1.0 / greatest(len(w.w), 1)
             * 10000 + 0.5) / 10000 AS dup_frac
FROM w LEFT JOIN pd ON w.doc_id = pd.doc_id
"""
    # gap sessionization: identical lag/running-sum islands per user
    out["events_sessions"] = """
WITH b AS (SELECT user_id, epoch_us(ts) AS t_us, value AS v FROM events),
m AS (
  SELECT user_id, t_us, v,
         CASE WHEN lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us) IS NULL
              OR t_us - lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us)
                 > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM b
),
s AS (
  SELECT user_id, t_us, v,
         sum(brk) OVER (PARTITION BY user_id ORDER BY t_us
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS session_idx
  FROM m
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(t_us) AS start_us, max(t_us) AS end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       floor(sum(v) * 10000 + 0.5) / 10000 AS total_value
FROM s GROUP BY 1, 2
"""
    # streaming sessionizer: same oracle as the batch operator — the
    # stateful streaming wrapper must add no semantics
    out["events_sessions_streaming"] = out["events_sessions"]
    # sliding-window duplicated spans over the dup-injected view: the
    # oracle groups by raw gram content (no hash), islands via
    # lag/running-sum per doc
    out["dup_spans"] = f"""
WITH dv AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
w AS (SELECT doc_id, {_WORDS} AS w FROM dv),
st AS (
  SELECT doc_id, CAST(s AS INT) AS s,
         array_to_string(list_slice(w, s + 1, s + 8), ' ') AS g
  FROM (SELECT doc_id, w, unnest(range(len(w) - 7)) AS s FROM w WHERE len(w) >= 8)
),
pg AS (
  SELECT g FROM (SELECT DISTINCT g, doc_id FROM st)
  GROUP BY g HAVING count(*) >= 2
),
d AS (SELECT st.doc_id, st.s FROM st JOIN pg USING (g)),
i AS (
  SELECT doc_id, s,
         CASE WHEN lag(s) OVER (PARTITION BY doc_id ORDER BY s) IS NULL
              OR s - lag(s) OVER (PARTITION BY doc_id ORDER BY s) > 8
              THEN 1 ELSE 0 END AS brk
  FROM d
),
gs AS (
  SELECT doc_id, s,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM i
)
SELECT doc_id, CAST(min(s) AS INT) AS span_start,
       CAST(max(s) + 8 AS INT) AS span_end,
       CAST(max(s) + 8 - min(s) AS INT) AS span_tokens
FROM gs GROUP BY doc_id, grp
"""
    # personalized PageRank: teleport restricted to the %97 anchor set,
    # dangling mass repaid to the seeds, five unrolled iterations
    out["kg_ppr"] = f"""
WITH nn AS (SELECT count(*) AS ni FROM documents),
e AS (
  SELECT '{DOC}' || doc_id AS src,
         '{DOC}' || ((doc_id * 2 + 1) % (SELECT ni FROM nn)) AS dst
  FROM documents WHERE doc_id % 10 <> 0
  UNION
  SELECT '{DOC}' || doc_id,
         '{DOC}' || ((doc_id * 7 + 13) % (SELECT ni FROM nn))
  FROM documents WHERE doc_id % 10 <> 0
),
nodes AS (SELECT src AS uri FROM e UNION SELECT dst FROM e),
sd AS (
  SELECT uri FROM (SELECT '{DOC}' || doc_id AS uri FROM documents WHERE doc_id % 97 = 0)
  WHERE uri IN (SELECT uri FROM nodes)
),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM sd),
deg AS (SELECT src AS uri, CAST(count(*) AS DOUBLE) AS outdeg FROM e GROUP BY 1),
base AS (
  SELECT n.uri, d.outdeg,
         CASE WHEN s.uri IS NOT NULL THEN 1.0 / ns.k ELSE 0.0 END AS p
  FROM nodes n LEFT JOIN deg d USING (uri) LEFT JOIN sd s ON n.uri = s.uri
  CROSS JOIN ns
),
r0 AS (SELECT uri, outdeg, p, p AS rank FROM base),
dang1 AS (SELECT coalesce(sum(rank), 0) AS m FROM r0 WHERE outdeg IS NULL),
c1 AS (
  SELECT e.dst AS uri, sum(r.rank / r.outdeg) AS in_c
  FROM e JOIN r0 r ON e.src = r.uri GROUP BY 1
),
r1 AS (
  SELECT b.uri, b.outdeg, b.p,
         (1 - 0.85) * b.p + 0.85 * (coalesce(c.in_c, 0) + dang1.m * b.p) AS rank
  FROM base b LEFT JOIN c1 c USING (uri) CROSS JOIN dang1
),
dang2 AS (SELECT coalesce(sum(rank), 0) AS m FROM r1 WHERE outdeg IS NULL),
c2 AS (
  SELECT e.dst AS uri, sum(r.rank / r.outdeg) AS in_c
  FROM e JOIN r1 r ON e.src = r.uri GROUP BY 1
),
r2 AS (
  SELECT b.uri, b.outdeg, b.p,
         (1 - 0.85) * b.p + 0.85 * (coalesce(c.in_c, 0) + dang2.m * b.p) AS rank
  FROM base b LEFT JOIN c2 c USING (uri) CROSS JOIN dang2
),
dang3 AS (SELECT coalesce(sum(rank), 0) AS m FROM r2 WHERE outdeg IS NULL),
c3 AS (
  SELECT e.dst AS uri, sum(r.rank / r.outdeg) AS in_c
  FROM e JOIN r2 r ON e.src = r.uri GROUP BY 1
),
r3 AS (
  SELECT b.uri, b.outdeg, b.p,
         (1 - 0.85) * b.p + 0.85 * (coalesce(c.in_c, 0) + dang3.m * b.p) AS rank
  FROM base b LEFT JOIN c3 c USING (uri) CROSS JOIN dang3
),
dang4 AS (SELECT coalesce(sum(rank), 0) AS m FROM r3 WHERE outdeg IS NULL),
c4 AS (
  SELECT e.dst AS uri, sum(r.rank / r.outdeg) AS in_c
  FROM e JOIN r3 r ON e.src = r.uri GROUP BY 1
),
r4 AS (
  SELECT b.uri, b.outdeg, b.p,
         (1 - 0.85) * b.p + 0.85 * (coalesce(c.in_c, 0) + dang4.m * b.p) AS rank
  FROM base b LEFT JOIN c4 c USING (uri) CROSS JOIN dang4
),
dang5 AS (SELECT coalesce(sum(rank), 0) AS m FROM r4 WHERE outdeg IS NULL),
c5 AS (
  SELECT e.dst AS uri, sum(r.rank / r.outdeg) AS in_c
  FROM e JOIN r4 r ON e.src = r.uri GROUP BY 1
),
r5 AS (
  SELECT b.uri, b.outdeg, b.p,
         (1 - 0.85) * b.p + 0.85 * (coalesce(c.in_c, 0) + dang5.m * b.p) AS rank
  FROM base b LEFT JOIN c5 c USING (uri) CROSS JOIN dang5
)
SELECT uri, floor(rank * 1000 * 10000 + 0.5) / 10000 AS ppr_x1000 FROM r5
"""
    # triangles + LCC: the oracle uses the naive neighbor-pair recount
    # (adjacent-pair join per node) — a different formulation from the
    # engine's degree-ordered orientation, so agreement checks the
    # algorithm, not the implementation
    out["kg_triangles"] = f"""{_dg_e},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e WHERE src <> dst
),
adj AS (SELECT a AS w, b AS v FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT v AS uri, count(*) AS degree FROM adj GROUP BY 1),
tri AS (
  SELECT a1.w AS uri, count(*) AS t
  FROM adj a1
  JOIN adj a2 ON a1.w = a2.w AND a1.v < a2.v
  JOIN und u ON u.a = a1.v AND u.b = a2.v
  GROUP BY 1
)
SELECT d.uri, CAST(d.degree AS BIGINT) AS degree,
       CAST(coalesce(t.t, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2
            THEN floor(2.0 * coalesce(t.t, 0) / (d.degree * (d.degree - 1.0))
                       * 10000 + 0.5) / 10000
            ELSE 0.0 END AS lcc
FROM deg d LEFT JOIN tri t ON d.uri = t.uri
"""
    # neighborhood-Jaccard candidates: wedge join keyed on the shared
    # neighbor, union size from degrees
    out["kg_neighbor_sim"] = f"""{_dg_e},
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e WHERE src <> dst
),
adj AS (SELECT a AS w, b AS v FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT v AS uri, count(*) AS degree FROM adj GROUP BY 1),
pairs AS (
  SELECT x.v AS a, y.v AS b, count(*) AS i
  FROM adj x JOIN adj y ON x.w = y.w AND x.v < y.v
  GROUP BY 1, 2
)
SELECT p.a, p.b, CAST(p.i AS BIGINT) AS intersection,
       floor(p.i / (da.degree + db.degree - p.i) * 10000 + 0.5) / 10000 AS jaccard
FROM pairs p
JOIN deg da ON p.a = da.uri
JOIN deg db ON p.b = db.uri
WHERE floor(p.i / (da.degree + db.degree - p.i) * 10000 + 0.5) / 10000 >= 0.2
"""
    # PROV-O curation provenance: every decision row rebuilt by string
    # concatenation over the dup-injected view's exact-dedup outcome
    _prov = "http://www.w3.org/ns/prov#"
    _rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    _act = "http://example.org/activity/r6"
    out["curation_prov"] = f"""
WITH dup_view AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
kept AS (SELECT min(doc_id) AS doc_id FROM dup_view GROUP BY text),
ids AS (
  SELECT doc_id, 'http://example.org/doc/' || CAST(doc_id AS VARCHAR) AS iri
  FROM dup_view
)
SELECT iri AS subject, '{_rdf_type}' AS predicate, '{_prov}Entity' AS object,
       FALSE AS is_literal, CAST(NULL AS VARCHAR) AS datatype,
       CAST(NULL AS VARCHAR) AS lang
FROM ids
UNION ALL
SELECT iri, '{_prov}wasGeneratedBy', '{_act}', FALSE, NULL, NULL
FROM ids WHERE doc_id IN (SELECT doc_id FROM kept)
UNION ALL
SELECT iri, '{_prov}wasInvalidatedBy', '{_act}', FALSE, NULL, NULL
FROM ids WHERE doc_id NOT IN (SELECT doc_id FROM kept)
UNION ALL
SELECT '{_act}', '{_rdf_type}', '{_prov}Activity', FALSE, NULL, NULL
UNION ALL
SELECT '{_act}', '{_prov}endedAtTime', '2026-01-01T00:00:00Z', TRUE,
       'http://www.w3.org/2001/XMLSchema#dateTime', NULL
"""
    # BPE word histogram: same pretokenizer regex in DuckDB (RE2 \\s and
    # Java \\s agree on the ASCII whitespace set this corpus uses)
    out["bpe_word_hist"] = r"""
SELECT word, count(*) AS freq FROM (
  SELECT unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS word
  FROM documents
) GROUP BY word
"""
    # sameAs refresh: the %10==1 docs merge into their even partners
    # (component = min uri of the pair), the pair's lang prop is last-
    # wins by canonical order (the odd doc's path sorts later), and the
    # sameAs rows leave no uri behind
    out["kg_sameas_refresh"] = f"""
SELECT '{DOC}' || d.doc_id AS uri, 1 AS n_props,
       coalesce(d2.lang, d.lang) AS lang_val
FROM documents d
LEFT JOIN documents d2 ON d2.doc_id = d.doc_id + 1 AND d.doc_id % 10 = 0
WHERE d.doc_id % 10 <> 1
"""
    out["kg_edges"] = f"""
SELECT '{DOC}' || doc_id AS src, '{VOC}source' AS rel, '{DOC}src/' || source AS dst FROM documents
"""
    out["kg_shorten"] = f"""
SELECT * FROM (VALUES
  ('{RDFT}', 'rdf__type'),
  ('{VOC}text', 'ns0__text'),
  ('{VOC}lang', 'ns0__lang'),
  ('{VOC}source', 'ns0__source'),
  ('{VOC}nchars', 'ns0__nchars')
) AS t(predicate, pred_short)
"""
    out["kg_sameas_cc"] = f"""
SELECT '{DOC}' || doc_id AS uri,
       '{DOC}' || (doc_id - doc_id % 5) AS component
FROM documents
"""
    out["kg_typed_literals"] = """
SELECT event_id, value AS value_double, 'DOUBLE' AS vt_value,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str, 'DATETIME' AS vt_ts
FROM events
"""
    out["kg_shacl"] = f"""
SELECT '{DOC}' || doc_id AS focus_node, 'MinCountConstraintComponent' AS component,
       '{VOC}long_text' AS result_path
FROM documents WHERE n_chars < 150
UNION ALL
SELECT '{DOC}' || doc_id, 'MaxInclusiveConstraintComponent', '{VOC}nchars'
FROM documents WHERE n_chars > 400
"""
    out["kg_shacl_delta"] = f"""
SELECT '{DOC}' || doc_id AS focus_node, 'MinCountConstraintComponent' AS component,
       '{VOC}long_text' AS result_path
FROM documents WHERE n_chars < 150 AND doc_id % 7 = 0
UNION ALL
SELECT '{DOC}' || doc_id, 'MaxInclusiveConstraintComponent', '{VOC}nchars'
FROM documents WHERE n_chars > 400 AND doc_id % 7 = 0
"""
    out["kg_export_nt"] = f"""
SELECT '<{DOC}' || doc_id || '> <{RDFT}> <{VOC}Document> .' AS line FROM documents
UNION ALL SELECT '<{DOC}' || doc_id || '> <{VOC}lang> "' || lang || '" .' FROM documents
UNION ALL SELECT '<{DOC}' || doc_id || '> <{VOC}nchars> "' || n_chars || '"^^<{XSD}integer> .' FROM documents
UNION ALL SELECT '<{DOC}' || doc_id || '> <{VOC}text> "' || text || '" .' FROM documents
UNION ALL SELECT '<{DOC}' || doc_id || '> <{VOC}source> <{DOC}src/' || source || '> .' FROM documents
"""
    out["orders_rdf"] = f"""
SELECT 'http://example.org/order/' || o_orderkey AS subject, '{RDFT}' AS predicate,
       '{VOC}Order' AS object, false AS is_literal FROM orders
UNION ALL SELECT 'http://example.org/order/' || o_orderkey, '{VOC}status', o_orderstatus, true FROM orders
UNION ALL SELECT 'http://example.org/order/' || o_orderkey, '{VOC}priority', o_orderpriority, true FROM orders
UNION ALL SELECT 'http://example.org/order/' || o_orderkey, '{VOC}customer',
       'http://example.org/cust/' || o_custkey, false FROM orders
"""
    out["dedup_exact_kept"] = "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
    # dup-injected view: every doc_id % 10 == 0 document reappears twice
    # under new ids, so the groups result is NON-empty at every sf (the
    # raw corpus has no exact dups at sf0.01 and a 0-row pass proves
    # nothing). sha256 = the engine-wide exact-dup identity.
    out["dedup_exact_groups"] = """
WITH dup_view AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 20000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
)
SELECT sha256(text) AS text_hash, count(*) AS cnt, min(doc_id) AS keep_id
FROM dup_view GROUP BY sha256(text) HAVING count(*) > 1
"""
    out["dedup_minhash_lsh"] = _minhash_sql()
    out["dedup_clusters"] = _dedup_clusters_sql()
    # quality-based rep election: the clustering replay + highest-score
    # (ties → min id) winner per cluster
    out["cluster_reps"] = f"""
WITH RECURSIVE {_minhash_ctes()},
sym AS (
  SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a
),
comp AS (
  SELECT a AS doc_id, least(min(b), a) AS cluster_id FROM reach GROUP BY a
),
cl AS (
  SELECT d.doc_id,
         CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
         CAST(d.n_chars AS DOUBLE) AS score
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY score DESC, doc_id ASC) AS rn
  FROM cl
)
SELECT doc_id, cluster_id, score,
       CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INT) AS is_rep
FROM r
"""
    out["dedup_simhash"] = _simhash_sql()
    out["dedup_jaccard"] = _jaccard_sql()
    out["ann_topk"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10
), s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         floor(list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
               * 10000 + 0.5) / 10000 AS score
  FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id
), r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM s
)
SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= 5
"""
    out["ann_lsh_buckets"] = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
)
SELECT vec_id, {_lsh_bucket_sql('v', 8, band=0)} AS bucket FROM e
"""
    out["ann_ivf"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, v AS cvec
  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
), scored AS (
  SELECT e.vec_id, c.centroid_id,
         floor(sqrt(list_sum(list_transform(generate_series(1, len(e.v)),
               j -> (e.v[j] - c.cvec[j]) * (e.v[j] - c.cvec[j])))) * 10000 + 0.5) / 10000 AS dist
  FROM e CROSS JOIN c
), r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, centroid_id ASC) AS rn
  FROM scored
)
SELECT vec_id, centroid_id, dist FROM r WHERE rn = 1
"""
    out["lang_id"] = _lang_id_sql()
    out["text_quality"] = _quality_sql()
    out["token_counts"] = f"""
WITH words AS (
  SELECT doc_id, text, {_WORDS} AS w FROM documents
)
SELECT doc_id, len(w) AS ws_tokens,
  CAST(list_sum(list_transform(w, t -> CAST(ceil(length(t) / 4.0) AS INT)))
       + (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))) AS INT) AS bpe_ish_tokens
FROM words
"""
    out["fingerprints"] = f"""
WITH words AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), sh AS (
  SELECT doc_id, w, {_SHINGLES} AS shingles FROM words
)
SELECT doc_id, md5(array_to_string(w, ' ')) AS exact_fp,
       array_to_string(list_sort(list_transform(shingles, s -> md5(s)))[1:4], '') AS shingle_fp
FROM sh
"""
    out["text_chunks"] = f"""
WITH w0 AS (
  SELECT doc_id, list_filter({_WORDS}, t -> t <> '') AS w FROM documents
), n AS (
  SELECT doc_id, w, greatest(1, CAST(ceil((len(w) - 5) / 15.0) AS INT)) AS nc FROM w0
), c AS (
  SELECT doc_id, w, unnest(generate_series(0, nc - 1)) AS chunk_idx FROM n
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       array_to_string(w[chunk_idx * 15 + 1 : chunk_idx * 15 + 20], ' ') AS chunk_text,
       CAST(len(w[chunk_idx * 15 + 1 : chunk_idx * 15 + 20]) AS INT) AS n_tokens
FROM c
"""
    _PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _PII_URL = r"https?://[^\s]+"
    _PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    out["pii_redact"] = f"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact doc' || doc_id || '@example.com via https://ex.org/d/' || doc_id
              || CASE WHEN doc_id % 3 = 0 THEN ' from 10.0.0.' || (doc_id % 256) ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
         '{_PII_URL}', '<URL>', 'g'),
         '{_PII_EMAIL}', '<EMAIL>', 'g'),
         '{_PII_IP}', '<IP>', 'g') AS redacted,
       CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PII_URL}')) AS INT) AS n_urls,
       CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS INT) AS n_ips
FROM injected
"""
    out["events_window"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour, event_type,
       count(*) AS n, floor(avg(value) * 10000 + 0.5) / 10000 AS avg_value
FROM events GROUP BY 1, 2
"""
    out["iri_functions"] = _doc_triples_nt_sql(
        """
SELECT DISTINCT predicate,
  regexp_extract(predicate, '^(.*[#/])([^#/]*)$', 1) AS ns,
  regexp_extract(predicate, '^(.*[#/])([^#/]*)$', 2) AS local
FROM t
"""
    )
    out["literal_functions"] = f"""
SELECT doc_id, CAST(n_chars AS VARCHAR) AS v1, '{XSD}integer' AS dt1,
       source AS v2, lang AS tag2
FROM documents
"""
    out["inference_nodes"] = """
SELECT 'http://example.org/cust/' || c_custkey AS uri
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
"""
    out["inference_categories"] = """
SELECT 'http://example.org/cust/' || c_custkey AS uri,
       (r_name = 'ASIA') AS in_category
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""
    out["skos_route"] = """
SELECT DISTINCT n_name AS src, 'SCO' AS rel, r_name AS dst
FROM nation JOIN region ON n_regionkey = r_regionkey
"""
    out["di_model"] = f"""
WITH n AS (
  SELECT replace(n_name, ' ', '_') AS nm, replace(r.r_name, ' ', '_') AS dom,
         replace(r2.r_name, ' ', '_') AS rng
  FROM nation
  JOIN region r ON n_regionkey = r.r_regionkey
  JOIN region r2 ON n_nationkey % 5 = r2.r_regionkey
)
SELECT 'node' AS element, 'http://o/C_' || replace(r_name, ' ', '_') AS name,
       CAST(NULL AS VARCHAR) AS src, CAST(NULL AS VARCHAR) AS dst
FROM region
UNION ALL
SELECT 'relationship', 'http://o/rel_' || nm, 'http://o/C_' || dom, 'http://o/C_' || rng FROM n
UNION ALL
SELECT 'property', 'http://o/p_' || nm, 'http://o/C_' || dom, '{XSD}string' FROM n
"""
    out["skos_xl"] = """
SELECT 'http://example.org/concept/' || doc_id AS concept,
       'http://www.w3.org/2004/02/skos/core#prefLabel' AS prop,
       'pref-' || doc_id AS value
FROM documents
UNION ALL
SELECT 'http://example.org/concept/' || doc_id,
       'http://www.w3.org/2008/05/skos-xl#altLabel', lang
FROM documents
"""
    out["multimodal_stats"] = """
WITH m AS (
  SELECT unnest(generate_series(0, 255)) AS id
), t AS (
  SELECT CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         72 AS nbytes, id % 640 + 1 AS width, (id * 1000) % 60000 AS dur
  FROM m
)
SELECT kind, count(*) AS n, CAST(sum(nbytes) AS BIGINT) AS total_bytes,
       floor(avg(width) * 10000 + 0.5) / 10000 AS avg_width, floor(avg(dur) * 10000 + 0.5) / 10000 AS avg_duration_ms
FROM t GROUP BY kind
"""
    # features of the REAL decoded payloads, reproduced analytically from
    # the deterministic generation formulas in operators/multimodal.py
    mean_sql = (
        "floor(list_avg(flatten(list_transform(generate_series(0, h - 1), y -> "
        "list_transform(generate_series(0, w - 1), x -> "
        "CAST((id * 7 + x * 3 + y * 5 + {c} * 11) % 256 AS DOUBLE))))) * 10000 + 0.5) / 10000"
    )
    out["multimodal_features"] = f"""
WITH m AS (
  SELECT unnest(generate_series(0, 255)) AS id
), base AS (
  SELECT id,
         CASE id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         4 + id % 5 AS w, 3 + id % 4 AS h,
         160 + id % 80 AS ns, 2 + id % 3 AS nf
  FROM m
)
SELECT id AS media_id, kind,
  CASE WHEN kind <> 'audio' THEN w END AS width,
  CASE WHEN kind <> 'audio' THEN h END AS height,
  CASE WHEN kind <> 'audio' THEN {mean_sql.format(c=0)} END AS mean_r,
  CASE WHEN kind <> 'audio' THEN {mean_sql.format(c=1)} END AS mean_g,
  CASE WHEN kind <> 'audio' THEN {mean_sql.format(c=2)} END AS mean_b,
  CASE WHEN kind = 'audio' THEN floor(CAST(ns AS DOUBLE) * 1000 / 8000 * 10000 + 0.5) / 10000
       WHEN kind = 'video' THEN floor(CAST(nf AS DOUBLE) * 1000 / 10 * 10000 + 0.5) / 10000
  END AS duration_ms,
  CASE WHEN kind = 'audio' THEN ns END AS n_samples,
  CASE WHEN kind = 'audio' THEN
    floor(sqrt(list_avg(list_transform(generate_series(0, ns - 1), t ->
      CAST(((id * 31 + t * 17) % 2048 - 1024) * ((id * 31 + t * 17) % 2048 - 1024) AS DOUBLE))))
      * 10000 + 0.5) / 10000
  END AS rms,
  CASE WHEN kind = 'video' THEN nf END AS n_frames
FROM base
"""
    out["kg_json_tree"] = """
WITH b AS (
  SELECT doc_id, lang, n_chars, source,
         'j/' || doc_id || '.json' AS path,
         'bnode://' || substr(sha256('org/docs|j/' || doc_id || '.json|' || repeat('0', 40) || '|j_src'), 1, 32) AS bn,
         'http://example.org/container/j/' || doc_id || '.json' AS root
  FROM documents
)
SELECT path, root AS subject, 'http://example.org/json#lang' AS predicate, lang AS object, true AS is_literal FROM b
UNION ALL SELECT path, root, 'http://example.org/json#chars', CAST(n_chars AS VARCHAR), true FROM b
UNION ALL SELECT path, root, 'http://example.org/json#src', bn, false FROM b
UNION ALL SELECT path, bn, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'http://example.org/json#Src', false FROM b
UNION ALL SELECT path, bn, 'http://example.org/json#name', source, true FROM b
"""
    # datasets.py curation ops — tokenization mirrored exactly:
    # lower → non-alnum runs to ' ' → trim → split → drop empties;
    # 4-gram window i in [1, len-3], slice toks[i : i+3] (4 elems)
    out["decontam"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - 2),
                               i -> array_to_string(toks[i:i+3], ' '))) AS shingle
  FROM tok WHERE len(toks) >= 4
), train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 100 <> 0),
   bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0)
SELECT t.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS shared_shingles
FROM train t JOIN bench b USING (shingle)
GROUP BY t.doc_id
"""
    # md5-prefix cutoffs from split_thresholds({.9,.05,.05}, 4):
    # 0.90*65536=58982=0xe666, 0.95*65536=62259=0xf333
    out["hash_split"] = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""
    # en 0.25→0x4000, de 0.5→0x8000, default 0.1→round(6553.6)=0x199a
    out["stratified_sample"] = """
SELECT doc_id, lang FROM documents
WHERE (lang = 'de' AND substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
   OR (lang = 'en' AND substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000')
   OR (lang NOT IN ('de', 'en')
       AND substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4) < '199a')
"""
    # Okapi BM25 (Lucene idf variant), k1=1.2 b=0.75; score rounded with
    # the same portable floor(x*1e4+0.5)/1e4 BEFORE ranking so the rank
    # boundary is engine-deterministic
    out["bm25_search"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), dl AS (SELECT doc_id, len(toks) AS dl FROM tok),
   stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl),
   tf AS (
  SELECT doc_id, t AS term, CAST(count(*) AS DOUBLE) AS tf
  FROM tok, unnest(toks) AS u(t)
  WHERE t IN ('dup', 'merge', 'window')
  GROUP BY 1, 2
), dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
   scored AS (
  SELECT tf.doc_id,
         floor(sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
                    * tf.tf * 2.2
                    / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) ) * 10000 + 0.5) / 10000 AS score
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    out["top_ngrams"] = """
WITH tok AS (
  SELECT list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), g AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS ngram
  FROM tok WHERE len(toks) >= 2
)
SELECT ngram, CAST(count(*) AS BIGINT) AS cnt
FROM g GROUP BY ngram
ORDER BY cnt DESC, ngram ASC LIMIT 20
"""
    # add-0.1-smoothed bigram LM trained on even doc_ids, scored on odd;
    # P(w2|w1) = (c2+α)/(c1+α·V); per-bigram ln is engine-identical up to
    # ulps, absorbed by the portable round4 on the mean
    out["lm_score"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS pair
  FROM tok WHERE len(toks) >= 2
), bge AS (SELECT doc_id, pair[1] AS w1, pair[2] AS w2 FROM bg),
   c2 AS (SELECT w1, w2, count(*) AS c2 FROM bge WHERE doc_id % 2 = 0 GROUP BY 1, 2),
   c1 AS (SELECT w1, count(*) AS c1
          FROM (SELECT doc_id, unnest(toks) AS w1 FROM tok WHERE doc_id % 2 = 0)
          GROUP BY 1),
   v AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1),
   sc AS (
  SELECT b.doc_id,
         ln((CAST(coalesce(c2.c2, 0) AS DOUBLE) + 0.1)
            / (CAST(coalesce(c1.c1, 0) AS DOUBLE) + 0.1 * v.v)) AS logp
  FROM bge b LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v
  WHERE b.doc_id % 2 = 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       floor(avg(logp) * 10000 + 0.5) / 10000 AS avg_logp
FROM sc GROUP BY doc_id
"""
    # Jelinek-Mercer interpolated trigram LM (λ = 0.6/0.3/0.1, add-0.1
    # unigram floor), trained on even doc_ids, scored on odd; round4 on
    # the mean absorbs cross-engine ulps as in lm_score / bm25_search
    out["curation_incremental"] = _curation_incremental_sql()
    # the streaming wrapper must be policy-identical to the incremental
    # state machine — same SQL replay
    out["curation_streaming"] = _curation_incremental_sql()
    # truncation-injected containment view; same shingle machinery as
    # _jaccard_sql, ratios |A∩B|/|A| and /|B| instead of the union
    out["dedup_containment"] = f"""
WITH dv AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 40000000 AS doc_id,
         array_to_string(w[1:greatest(5, len(w) // 2)], ' ') AS text
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE doc_id % 7 = 0)
), words AS (
  SELECT doc_id, {_WORDS} AS w FROM dv
), sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM words
), sizes AS (
  SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
), pc AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS common
  FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       floor(common / sa.sz * 10000 + 0.5) / 10000 AS cont_a,
       floor(common / sb.sz * 10000 + 0.5) / 10000 AS cont_b
FROM pc JOIN sizes sa ON pc.a = sa.doc_id JOIN sizes sb ON pc.b = sb.doc_id
WHERE greatest(floor(common / sa.sz * 10000 + 0.5) / 10000,
               floor(common / sb.sz * 10000 + 0.5) / 10000) >= 0.9
"""
    # chunk-level boilerplate over the truncation-injected view: chunks
    # are 8 non-overlapping lowered-whitespace tokens; shared = present
    # in >1 distinct doc
    out["chunk_dup_stats"] = """
WITH dv AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 40000000 AS doc_id,
         array_to_string(w[1:greatest(5, len(w) // 2)], ' ') AS text
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE doc_id % 7 = 0)
), tok AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM dv
), nch AS (
  SELECT doc_id, w, greatest(1, CAST(ceil(len(w) / 8.0) AS INT)) AS nc FROM tok
), ch AS (
  SELECT doc_id, array_to_string(w[(i*8 + 1):(i*8 + 8)], ' ') AS chunk_text
  FROM nch, unnest(range(0, nc)) AS g(i)
), per_chunk AS (
  SELECT chunk_text, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY 1
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN p.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_chunks,
       floor(sum(CASE WHEN p.n_docs > 1 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS dup_chunk_frac
FROM ch c JOIN per_chunk p USING (chunk_text)
GROUP BY c.doc_id
"""
    # chunk-level dedup action: each chunk content survives only in its
    # min-id document; docs re-assembled from kept chunks in index order
    # raw-span chunking replica: segments = word + trailing whitespace
    # (leading ws folded into segment 1), matching on the normalized
    # chunk, re-assembly by '' concat of kept raw spans; docs over 60
    # segments bypass as passthrough rows
    out["dedup_chunks"] = """
WITH dv AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 40000000 AS doc_id,
         array_to_string(w[1:greatest(5, len(w) // 2)], ' ') AS text
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents WHERE doc_id % 7 = 0)
), seg AS (
  SELECT doc_id, text,
         CASE WHEN len(s0) = 0 THEN [text]
              ELSE list_prepend(lead || s0[1], s0[2:]) END AS s
  FROM (SELECT doc_id, text,
               regexp_extract_all(text, '\\S+\\s*') AS s0,
               regexp_extract(text, '^\\s*') AS lead
        FROM dv)
), gated AS (SELECT doc_id, text, s, len(s) > 60 AS over FROM seg),
   nch AS (
  SELECT doc_id, s, greatest(1, CAST(ceil(len(s) / 8.0) AS INT)) AS nc
  FROM gated WHERE NOT over
), ch AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(s[(i*8 + 1):(i*8 + 8)], '') AS chunk_raw
  FROM nch, unnest(range(0, nc)) AS g(i)
), chn AS (
  SELECT doc_id, chunk_idx, chunk_raw,
         array_to_string(list_filter(string_split_regex(trim(lower(chunk_raw)), '\\s+'),
                                     t -> t <> ''), ' ') AS chunk_norm
  FROM ch
), fst AS (SELECT chunk_norm, min(doc_id) AS first_doc FROM chn GROUP BY 1),
   tot AS (SELECT doc_id, count(*) AS n_total FROM chn GROUP BY 1),
   kept AS (
  SELECT c.doc_id, c.chunk_idx, c.chunk_raw
  FROM chn c JOIN fst f USING (chunk_norm) WHERE c.doc_id = f.first_doc
), reb AS (
  SELECT doc_id, string_agg(chunk_raw, '' ORDER BY chunk_idx) AS text_deduped,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(r.text_deduped, '') AS text_deduped,
       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_chunks_kept,
       CAST(t.n_total - coalesce(r.n_kept, 0) AS BIGINT) AS n_chunks_dropped,
       FALSE AS passthrough
FROM tot t LEFT JOIN reb r USING (doc_id)
UNION ALL
SELECT doc_id, text AS text_deduped, CAST(0 AS BIGINT) AS n_chunks_kept,
       CAST(0 AS BIGINT) AS n_chunks_dropped, TRUE AS passthrough
FROM gated WHERE over
"""
    # Gopher-style repetition metrics: max(cnt*len)/sum(cnt*len) over word
    # bigrams, duplicated-trigram char share; round4-portable
    out["repetition_features"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), g AS (
  SELECT doc_id, 2 AS n,
         unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS gram
  FROM tok WHERE len(toks) >= 2
  UNION ALL
  SELECT doc_id, 3,
         unnest(list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
  FROM tok WHERE len(toks) >= 3
), c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3)
SELECT doc_id,
  floor(max(CASE WHEN n = 2 THEN cnt * length(gram) END)
        / sum(CASE WHEN n = 2 THEN cnt * length(gram) END) * 10000 + 0.5) / 10000
    AS top_bigram_char_frac,
  floor(coalesce(sum(CASE WHEN n = 3 AND cnt > 1 THEN cnt * length(gram) END), 0)
        / sum(CASE WHEN n = 3 THEN cnt * length(gram) END) * 10000 + 0.5) / 10000
    AS dup_trigram_char_frac
FROM c GROUP BY doc_id
"""
    # en 6000 / de 2500 token budgets, zh uncapped; floor-based cutoffs
    # derived from the same per-stratum token totals in both engines
    out["token_budget_sample"] = """
WITH tok AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                         t -> t <> '')) AS ntok
  FROM documents
), tot AS (SELECT lang, CAST(sum(ntok) AS DOUBLE) AS tot FROM tok GROUP BY lang),
   pfx AS (
  SELECT d.doc_id, d.lang, t.tot,
         substr(md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)), 1, 4) AS p
  FROM documents d JOIN tot t USING (lang)
)
SELECT doc_id, lang FROM pfx
WHERE (lang = 'en' AND (6000 >= tot OR p < printf('%04x', CAST(greatest(1, floor(6000 / tot * 65536)) AS BIGINT))))
   OR (lang = 'de' AND (2500 >= tot OR p < printf('%04x', CAST(greatest(1, floor(2500 / tot * 65536)) AS BIGINT))))
   OR (lang = 'zh' AND (1000000 >= tot OR p < printf('%04x', CAST(greatest(1, floor(1000000 / tot * 65536)) AS BIGINT))))
"""
    # multinomial NB replay: count tables from the even-id train half,
    # add-1 smoothed mean log-likelihood + log-prior per (doc, class),
    # arg-max with lexicographic tie-break. Zero-token docs (none at
    # this sf, but the branch is replayed) get the prior-only decision.
    out["nb_classify"] = """
WITH tok AS MATERIALIZED (
  SELECT doc_id, lang,
         unnest(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                            t -> t <> '')) AS token
  FROM documents WHERE doc_id % 2 = 0
), lik AS MATERIALIZED (
  SELECT token, lang AS label, count(*) AS cnt FROM tok GROUP BY 1, 2
), cls AS MATERIALIZED (
  SELECT d.lang AS label, count(*) AS n_docs, coalesce(t.n_tokens, 0) AS n_tokens
  FROM (SELECT lang, count(*) AS cnt FROM documents WHERE doc_id % 2 = 0 GROUP BY lang) x
  JOIN documents d ON d.lang = x.lang AND d.doc_id % 2 = 0
  LEFT JOIN (SELECT lang, count(*) AS n_tokens FROM tok GROUP BY lang) t ON t.lang = d.lang
  GROUP BY d.lang, t.n_tokens
), vb AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM tok),
   nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents WHERE doc_id % 2 = 0),
   tt AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                            t -> t <> '')) AS token
  FROM documents WHERE doc_id % 2 = 1
), sc AS (
  SELECT t.doc_id, c.label,
         ln(c.n_docs / nd.n)
           + avg(ln((coalesce(l.cnt, 0) + 1.0) / (c.n_tokens + vb.v))) AS score
  FROM tt t
  CROSS JOIN cls c CROSS JOIN vb CROSS JOIN nd
  LEFT JOIN lik l ON l.token = t.token AND l.label = c.label
  GROUP BY t.doc_id, c.label, c.n_docs, c.n_tokens, nd.n, vb.v
), best AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
  FROM sc
), emptydoc AS (
  SELECT d.doc_id FROM documents d
  WHERE d.doc_id % 2 = 1
    AND len(list_filter(string_split(trim(regexp_replace(lower(d.text), '[^a-z0-9]+', ' ', 'g')), ' '),
                        t -> t <> '')) = 0
), eb AS (
  SELECT e.doc_id, c.label, ln(c.n_docs / nd.n) AS score,
         row_number() OVER (PARTITION BY e.doc_id
                            ORDER BY ln(c.n_docs / nd.n) DESC, c.label ASC) AS rn
  FROM emptydoc e CROSS JOIN cls c CROSS JOIN nd
)
SELECT doc_id, label AS predicted,
       floor(score * 10000 + 0.5) / 10000 AS score
FROM (SELECT doc_id, label, score FROM best WHERE rn = 1
      UNION ALL
      SELECT doc_id, label, score FROM eb WHERE rn = 1)
"""
    # temperature mixing: replay the alpha=0.5 budget formula (sqrt is
    # IEEE-correctly-rounded — bit-identical across engines) and the
    # same floor-clamped md5 cutoffs as token_budget_sample.
    out["temperature_mix"] = """
WITH tok AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                         t -> t <> '')) AS ntok
  FROM documents
), tot AS (SELECT lang, CAST(sum(ntok) AS DOUBLE) AS tot FROM tok GROUP BY lang),
   z AS (SELECT sum(sqrt(tot)) AS z FROM tot),
   bud AS (SELECT lang, tot, 8000 * sqrt(tot) / z AS budget FROM tot CROSS JOIN z),
   pfx AS (
  SELECT d.doc_id, d.lang, b.tot, b.budget,
         substr(md5(d.lang || ':' || CAST(d.doc_id AS VARCHAR)), 1, 4) AS p
  FROM documents d JOIN bud b USING (lang)
)
SELECT doc_id, lang FROM pfx
WHERE budget >= tot
   OR p < printf('%04x', CAST(greatest(1, floor(budget / tot * 65536)) AS BIGINT))
"""
    # soft quality sampling: per-row numeric md5-prefix threshold
    # (0x-cast == Spark conv(...,16,10)); keep_prob formula mirrored
    # operation-for-operation so the double math is engine-identical.
    out["quality_sample"] = """
SELECT doc_id, n_chars FROM documents
WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
      < (0.1 + 0.9 * least(1.0, greatest(0.0, (n_chars - 100.0) / 300.0))) * 65536
"""
    # sequence packing: portable md5 shard hash + per-shard running-sum
    # window, exactly the Spark plan's shape.
    out["pack_sequences"] = """
WITH tok AS (
  SELECT doc_id,
         len(list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                         t -> t <> '')) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), t AS (
  SELECT doc_id, n_tokens, h,
         CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % 4 AS INT) AS shard
  FROM tok WHERE n_tokens > 0
), c AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS st
  FROM t
)
SELECT doc_id, shard, CAST(n_tokens AS INT) AS n_tokens,
       CAST(floor(st / 256.0) AS BIGINT) AS seq_id,
       CAST(st % 256 AS BIGINT) AS seq_offset
FROM c
"""
    out["lm_score_trigram"] = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), tge AS (
  SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                                     i -> [toks[i], toks[i+1], toks[i+2]])) AS g
        FROM tok WHERE len(toks) >= 3)
), bge AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS p
        FROM tok WHERE len(toks) >= 2)
), c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tge WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
   c2 AS (SELECT w1, w2, count(*) AS c2 FROM bge WHERE doc_id % 2 = 0 GROUP BY 1, 2),
   c1 AS (SELECT w1, count(*) AS c1
          FROM (SELECT doc_id, unnest(toks) AS w1 FROM tok WHERE doc_id % 2 = 0)
          GROUP BY 1),
   vt AS (SELECT CAST(count(*) AS DOUBLE) AS v, CAST(sum(c1) AS DOUBLE) AS t FROM c1),
   sc AS (
  SELECT d.doc_id,
         ln(0.6 * (CASE WHEN coalesce(x2.c2, 0) > 0
                        THEN CAST(coalesce(t3.c3, 0) AS DOUBLE) / x2.c2 ELSE 0 END)
          + 0.3 * (CASE WHEN coalesce(u2.c1, 0) > 0
                        THEN CAST(coalesce(b23.c2, 0) AS DOUBLE) / u2.c1 ELSE 0 END)
          + 0.1 * (CAST(coalesce(u3.c1, 0) AS DOUBLE) + 0.1) / (vt.t + 0.1 * vt.v)) AS logp
  FROM tge d
  LEFT JOIN c3 t3 ON d.w1 = t3.w1 AND d.w2 = t3.w2 AND d.w3 = t3.w3
  LEFT JOIN c2 x2 ON d.w1 = x2.w1 AND d.w2 = x2.w2
  LEFT JOIN c2 b23 ON d.w2 = b23.w1 AND d.w3 = b23.w2
  LEFT JOIN c1 u2 ON d.w2 = u2.w1
  LEFT JOIN c1 u3 ON d.w3 = u3.w1
  CROSS JOIN vt
  WHERE d.doc_id % 2 = 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       floor(avg(logp) * 10000 + 0.5) / 10000 AS avg_logp
FROM sc GROUP BY doc_id
"""
    # interpolated Kneser-Ney replay: same token/count CTEs as the JM
    # oracle plus the four type-count tables; D=0.75, α=0.1. The tok/
    # n-gram CTEs are multiply-referenced — MATERIALIZED (DuckDB inlines
    # CTEs per reference otherwise).
    out["lm_score_kn"] = """
WITH tok AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), tge AS MATERIALIZED (
  SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                                     i -> [toks[i], toks[i+1], toks[i+2]])) AS g
        FROM tok WHERE len(toks) >= 3)
), bge AS MATERIALIZED (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS p
        FROM tok WHERE len(toks) >= 2)
), c3 AS MATERIALIZED (SELECT w1, w2, w3, count(*) AS c3 FROM tge WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
   c2 AS MATERIALIZED (SELECT w1, w2, count(*) AS c2 FROM bge WHERE doc_id % 2 = 0 GROUP BY 1, 2),
   c1 AS (SELECT w1, count(*) AS c1
          FROM (SELECT doc_id, unnest(toks) AS w1 FROM tok WHERE doc_id % 2 = 0)
          GROUP BY 1),
   vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM c1),
   ctxt AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS n3t FROM c3 GROUP BY 1, 2),
   contb AS (SELECT w2, w3, CAST(count(*) AS DOUBLE) AS cont23 FROM c3 GROUP BY 1, 2),
   midt AS (SELECT w2, CAST(count(*) AS DOUBLE) AS mid_types FROM c3 GROUP BY 1),
   folt AS (SELECT w1 AS w2, CAST(count(*) AS DOUBLE) AS follow_types FROM c2 GROUP BY 1),
   contu AS (SELECT w2 AS w3, CAST(count(*) AS DOUBLE) AS cont1 FROM c2 GROUP BY 1),
   nb AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM c2),
   lvl AS (
  SELECT doc_id, c2v, c3v, n3tv,
         CASE WHEN midv > 0
              THEN greatest(cont23v - 0.75, 0) / midv + 0.75 * foltv / midv * pc
              ELSE pc END AS p2
  FROM (
    SELECT d.doc_id,
           coalesce(x2.c2, 0)::DOUBLE AS c2v,
           coalesce(t3.c3, 0)::DOUBLE AS c3v,
           coalesce(ct.n3t, 0) AS n3tv,
           coalesce(cb.cont23, 0) AS cont23v,
           coalesce(mt.mid_types, 0) AS midv,
           coalesce(ft.follow_types, 0) AS foltv,
           (coalesce(cu.cont1, 0) + 0.1) / (nb.b + 0.1 * vv.v) AS pc
    FROM tge d
    LEFT JOIN c3 t3 ON d.w1 = t3.w1 AND d.w2 = t3.w2 AND d.w3 = t3.w3
    LEFT JOIN c2 x2 ON d.w1 = x2.w1 AND d.w2 = x2.w2
    LEFT JOIN ctxt ct ON d.w1 = ct.w1 AND d.w2 = ct.w2
    LEFT JOIN contb cb ON d.w2 = cb.w2 AND d.w3 = cb.w3
    LEFT JOIN midt mt ON d.w2 = mt.w2
    LEFT JOIN folt ft ON d.w2 = ft.w2
    LEFT JOIN contu cu ON d.w3 = cu.w3
    CROSS JOIN nb CROSS JOIN vv
    WHERE d.doc_id % 2 = 1
  )
), sc AS (
  SELECT doc_id,
         ln(CASE WHEN c2v > 0 AND n3tv > 0
                 THEN greatest(c3v - 0.75, 0) / c2v + 0.75 * n3tv / c2v * p2
                 ELSE p2 END) AS logp
  FROM lvl
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       floor(avg(logp) * 10000 + 0.5) / 10000 AS avg_logp
FROM sc GROUP BY doc_id
"""
    # order-5 modified Kneser-Ney replay: raw n-gram counts at orders
    # 2-5, the continuation-count chain (each order's c' derived from
    # the NEXT order's raw TYPE table), per-context denominator+bucket
    # tables, count-of-counts discount triples per level (with the
    # degenerate-fallback and 0.05 clamp mirroring lm._mkn_discounts),
    # then the five interpolation levels chained through CTEs. α=0.1
    # add-α floor at the unigram level (the engine's positivity
    # convention).
    _mkn_d = """
  SELECT CASE WHEN least(n1, n2, n3, n4) <= 0 THEN 0.75
              ELSE greatest(1 - 2 * (n1 / (n1 + 2 * n2)) * n2 / n1, 0.05) END AS d1,
         CASE WHEN least(n1, n2, n3, n4) <= 0 THEN 0.75
              ELSE greatest(2 - 3 * (n1 / (n1 + 2 * n2)) * n3 / n2, 0.05) END AS d2,
         CASE WHEN least(n1, n2, n3, n4) <= 0 THEN 0.75
              ELSE greatest(3 - 4 * (n1 / (n1 + 2 * n2)) * n4 / n3, 0.05) END AS d3
  FROM (SELECT CAST(sum(CASE WHEN {c} = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
               CAST(sum(CASE WHEN {c} = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
               CAST(sum(CASE WHEN {c} = 3 THEN 1 ELSE 0 END) AS DOUBLE) AS n3,
               CAST(sum(CASE WHEN {c} = 4 THEN 1 ELSE 0 END) AS DOUBLE) AS n4
        FROM {t})"""

    def _lvl_sql(p, c, den, n1, n2, n3p, d, lower):
        disc = (
            f"(CASE WHEN coalesce({c}, 0) >= 3 THEN {d}_d3 "
            f"WHEN coalesce({c}, 0) = 2 THEN {d}_d2 ELSE {d}_d1 END)"
        )
        gamma = (
            f"({d}_d1 * coalesce({n1}, 0) + {d}_d2 * coalesce({n2}, 0) "
            f"+ {d}_d3 * coalesce({n3p}, 0))"
        )
        buckets = f"(coalesce({n1}, 0) + coalesce({n2}, 0) + coalesce({n3p}, 0))"
        return (
            f"CASE WHEN coalesce({den}, 0) > 0 AND {buckets} > 0 "
            f"THEN greatest(CAST(coalesce({c}, 0) AS DOUBLE) - {disc}, 0) "
            f"/ CAST({den} AS DOUBLE) "
            f"+ {gamma} / CAST({den} AS DOUBLE) * {lower} "
            f"ELSE {lower} END AS {p}"
        )

    _lvl2 = _lvl_sql("p2", "l2_c", "d2_den", "d2_n1", "d2_n2", "d2_n3p", "ds2", "p1")
    _lvl3 = _lvl_sql("p3", "l3_c", "d3_den", "d3_n1", "d3_n2", "d3_n3p", "ds3", "p2")
    _lvl4 = _lvl_sql("p4", "l4_c", "d4_den", "d4_n1", "d4_n2", "d4_n3p", "ds4", "p3")
    _lvl5 = _lvl_sql("p5", "l5_c", "l5_den", "g5_n1", "g5_n2", "g5_n3p", "ds5", "p4")

    out["lm_score_kn5"] = f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     t -> t <> '') AS toks
  FROM documents
), g5e AS MATERIALIZED (
  SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3, g[4] AS w4, g[5] AS w5
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 3),
                     i -> [toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]])) AS g
        FROM tok WHERE len(toks) >= 5)
), g4e AS (
  SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3, g[4] AS w4
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 2),
                     i -> [toks[i], toks[i+1], toks[i+2], toks[i+3]])) AS g
        FROM tok WHERE len(toks) >= 4)
), g3e AS (
  SELECT doc_id, g[1] AS w1, g[2] AS w2, g[3] AS w3
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                     i -> [toks[i], toks[i+1], toks[i+2]])) AS g
        FROM tok WHERE len(toks) >= 3)
), g2e AS (
  SELECT doc_id, p[1] AS w1, p[2] AS w2
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(toks)), i -> [toks[i], toks[i+1]])) AS p
        FROM tok WHERE len(toks) >= 2)
), t5 AS MATERIALIZED (
  SELECT w1, w2, w3, w4, w5, count(*) AS c FROM g5e WHERE doc_id % 2 = 0
  GROUP BY 1, 2, 3, 4, 5
), c4r AS MATERIALIZED (
  SELECT w1, w2, w3, w4, count(*) AS c FROM g4e WHERE doc_id % 2 = 0
  GROUP BY 1, 2, 3, 4
), t3t AS (SELECT w1, w2, w3 FROM g3e WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
   t2t AS (SELECT w1, w2 FROM g2e WHERE doc_id % 2 = 0 GROUP BY 1, 2),
   c4p AS MATERIALIZED (SELECT w2, w3, w4, w5, count(*) AS cc FROM t5 GROUP BY 1, 2, 3, 4),
   c3p AS MATERIALIZED (
  SELECT w2 AS w3, w3 AS w4, w4 AS w5, count(*) AS cc FROM c4r GROUP BY 1, 2, 3
), c2p AS MATERIALIZED (
  SELECT w2 AS w4, w3 AS w5, count(*) AS cc FROM t3t GROUP BY 1, 2
), c1p AS MATERIALIZED (SELECT w2 AS w5, count(*) AS cc FROM t2t GROUP BY 1),
   g5t AS (
  SELECT w1, w2, w3, w4,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(sum(CASE WHEN c >= 3 THEN 1 ELSE 0 END) AS DOUBLE) AS n3p
  FROM t5 GROUP BY 1, 2, 3, 4
), d4t AS (
  SELECT w2, w3, w4, CAST(sum(cc) AS DOUBLE) AS den,
         CAST(sum(CASE WHEN cc = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(sum(CASE WHEN cc = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(sum(CASE WHEN cc >= 3 THEN 1 ELSE 0 END) AS DOUBLE) AS n3p
  FROM c4p GROUP BY 1, 2, 3
), d3t AS (
  SELECT w3, w4, CAST(sum(cc) AS DOUBLE) AS den,
         CAST(sum(CASE WHEN cc = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(sum(CASE WHEN cc = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(sum(CASE WHEN cc >= 3 THEN 1 ELSE 0 END) AS DOUBLE) AS n3p
  FROM c3p GROUP BY 1, 2
), d2t AS (
  SELECT w4, CAST(sum(cc) AS DOUBLE) AS den,
         CAST(sum(CASE WHEN cc = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(sum(CASE WHEN cc = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(sum(CASE WHEN cc >= 3 THEN 1 ELSE 0 END) AS DOUBLE) AS n3p
  FROM c2p GROUP BY 1
), ds5 AS ({_mkn_d.format(c='c', t='t5')}),
   ds4 AS ({_mkn_d.format(c='cc', t='c4p')}),
   ds3 AS ({_mkn_d.format(c='cc', t='c3p')}),
   ds2 AS ({_mkn_d.format(c='cc', t='c2p')}),
   nbv AS (
  SELECT CAST((SELECT sum(cc) FROM c1p) AS DOUBLE) AS nb,
         CAST((SELECT count(DISTINCT w)
               FROM (SELECT unnest(toks) AS w FROM tok
                     WHERE doc_id % 2 = 0)) AS DOUBLE) AS v
), j AS (
  SELECT d.doc_id,
         t5.c AS l5_c, c4r.c AS l5_den, g5t.n1 AS g5_n1, g5t.n2 AS g5_n2, g5t.n3p AS g5_n3p,
         c4p.cc AS l4_c, d4t.den AS d4_den, d4t.n1 AS d4_n1, d4t.n2 AS d4_n2, d4t.n3p AS d4_n3p,
         c3p.cc AS l3_c, d3t.den AS d3_den, d3t.n1 AS d3_n1, d3t.n2 AS d3_n2, d3t.n3p AS d3_n3p,
         c2p.cc AS l2_c, d2t.den AS d2_den, d2t.n1 AS d2_n1, d2t.n2 AS d2_n2, d2t.n3p AS d2_n3p,
         c1p.cc AS l1_c
  FROM g5e d
  LEFT JOIN t5 ON d.w1 = t5.w1 AND d.w2 = t5.w2 AND d.w3 = t5.w3 AND d.w4 = t5.w4 AND d.w5 = t5.w5
  LEFT JOIN c4r ON d.w1 = c4r.w1 AND d.w2 = c4r.w2 AND d.w3 = c4r.w3 AND d.w4 = c4r.w4
  LEFT JOIN g5t ON d.w1 = g5t.w1 AND d.w2 = g5t.w2 AND d.w3 = g5t.w3 AND d.w4 = g5t.w4
  LEFT JOIN c4p ON d.w2 = c4p.w2 AND d.w3 = c4p.w3 AND d.w4 = c4p.w4 AND d.w5 = c4p.w5
  LEFT JOIN d4t ON d.w2 = d4t.w2 AND d.w3 = d4t.w3 AND d.w4 = d4t.w4
  LEFT JOIN c3p ON d.w3 = c3p.w3 AND d.w4 = c3p.w4 AND d.w5 = c3p.w5
  LEFT JOIN d3t ON d.w3 = d3t.w3 AND d.w4 = d3t.w4
  LEFT JOIN c2p ON d.w4 = c2p.w4 AND d.w5 = c2p.w5
  LEFT JOIN d2t ON d.w4 = d2t.w4
  LEFT JOIN c1p ON d.w5 = c1p.w5
  WHERE d.doc_id % 2 = 1
), l1 AS (
  SELECT j.*, ds2.*, ds3.*, ds4.*, ds5.*, nbv.nb, nbv.v,
         (CAST(coalesce(l1_c, 0) AS DOUBLE) + 0.1) / (nbv.nb + 0.1 * nbv.v) AS p1
  FROM j CROSS JOIN nbv
  CROSS JOIN (SELECT d1 AS ds2_d1, d2 AS ds2_d2, d3 AS ds2_d3 FROM ds2) ds2
  CROSS JOIN (SELECT d1 AS ds3_d1, d2 AS ds3_d2, d3 AS ds3_d3 FROM ds3) ds3
  CROSS JOIN (SELECT d1 AS ds4_d1, d2 AS ds4_d2, d3 AS ds4_d3 FROM ds4) ds4
  CROSS JOIN (SELECT d1 AS ds5_d1, d2 AS ds5_d2, d3 AS ds5_d3 FROM ds5) ds5
), l2 AS (SELECT *, {_lvl2} FROM l1
), l3 AS (SELECT *, {_lvl3} FROM l2
), l4 AS (SELECT *, {_lvl4} FROM l3
), l5 AS (SELECT *, {_lvl5} FROM l4
), sc AS (SELECT doc_id, ln(p5) AS logp FROM l5)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_5grams,
       floor(avg(logp) * 10000 + 0.5) / 10000 AS avg_logp
FROM sc GROUP BY doc_id
"""
    # embedding-space decontamination: bench = vec_id % 20 == 0,
    # max cosine + hit count per training vector above 0.35
    out["semantic_decontam"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), b AS (SELECT vec_id AS bid, v AS bv FROM e WHERE vec_id % 20 = 0),
   t AS (SELECT vec_id, v FROM e WHERE vec_id % 20 <> 0),
   sc AS (
  SELECT t.vec_id,
         floor(list_dot_product(t.v, b.bv)
               / (sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(b.bv, b.bv)))
               * 10000 + 0.5) / 10000 AS cos
  FROM t CROSS JOIN b
)
SELECT vec_id, max(cos) AS max_bench_cosine, CAST(count(*) AS BIGINT) AS n_bench_hits
FROM sc WHERE cos >= 0.35 GROUP BY vec_id
"""
    # LSH-prefiltered decontamination: replay the identical hyperplane
    # bucketing (nbits=4, bands 0/1), Hamming-radius-1 multi-probe on the
    # bench side, (band, bucket) candidate equi-join, exact-cosine verify.
    _flips = ", ".join(
        f"substr(bucket, 1, {i - 1}) || (CASE WHEN substr(bucket, {i}, 1) = '1' "
        f"THEN '0' ELSE '1' END) || substr(bucket, {i + 1}, {4 - i})"
        for i in range(1, 5)
    )
    out["semantic_decontam_lsh"] = f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), b0 AS MATERIALIZED (SELECT vec_id AS bid, v AS bv FROM e WHERE vec_id % 20 = 0),
   t0 AS MATERIALIZED (SELECT vec_id, v FROM e WHERE vec_id % 20 <> 0),
   tb AS (
  SELECT vec_id, 0 AS band, {_lsh_bucket_sql('v', 4, band=0)} AS bucket FROM t0
  UNION ALL
  SELECT vec_id, 1 AS band, {_lsh_bucket_sql('v', 4, band=1)} AS bucket FROM t0
), bb AS (
  SELECT bid, 0 AS band, {_lsh_bucket_sql('bv', 4, band=0)} AS bucket FROM b0
  UNION ALL
  SELECT bid, 1 AS band, {_lsh_bucket_sql('bv', 4, band=1)} AS bucket FROM b0
), probes AS (
  SELECT DISTINCT bid, band, p AS bucket
  FROM bb, unnest([bucket, {_flips}]) AS u(p)
), cand AS (
  SELECT DISTINCT tb.vec_id, probes.bid
  FROM tb JOIN probes ON tb.band = probes.band AND tb.bucket = probes.bucket
), sc AS (
  SELECT cand.vec_id,
         floor(list_dot_product(t0.v, b0.bv)
               / (sqrt(list_dot_product(t0.v, t0.v)) * sqrt(list_dot_product(b0.bv, b0.bv)))
               * 10000 + 0.5) / 10000 AS cos
  FROM cand JOIN t0 ON cand.vec_id = t0.vec_id JOIN b0 ON cand.bid = b0.bid
)
SELECT vec_id, max(cos) AS max_bench_cosine, CAST(count(*) AS BIGINT) AS n_bench_hits
FROM sc WHERE cos >= 0.35 GROUP BY vec_id
"""
    out["embedding_near_dups"] = f"""
WITH e0 AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), e AS (
  SELECT id, v, list_transform(v, x -> x / nrm) AS nv
  FROM (SELECT id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e0)
), b AS (
  SELECT id, nv, 0 AS band, {_lsh_bucket_sql('v', 4, band=0)} AS bucket FROM e
  UNION ALL
  SELECT id, nv, 1 AS band, {_lsh_bucket_sql('v', 4, band=1)} AS bucket FROM e
), s AS (
  SELECT DISTINCT l.id AS a, r.id AS b,
         floor(list_dot_product(l.nv, r.nv) * 10000 + 0.5) / 10000 AS score
  FROM b l JOIN b r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
)
SELECT a, b, score FROM s WHERE score >= 0.5
"""
    # int8 min-max quantization: parallel unnests zip positionally in
    # DuckDB, giving the same (pos, value) rows as Spark's posexplode
    _qx = """
WITH x AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS v,
         CAST(unnest(range(len(embedding))) AS INT) AS pos
  FROM embeddings
),
s AS (SELECT pos, min(v) AS dmin, max(v) AS dmax FROM x GROUP BY 1),
qc AS (
  SELECT x.vec_id, x.pos, x.v, s.dmin, s.dmax,
         CASE WHEN s.dmax - s.dmin = 0 THEN 0.0
              ELSE greatest(0.0, least(255.0,
                   floor((x.v - s.dmin) / (s.dmax - s.dmin) * 255 + 0.5)))
         END AS code
  FROM x JOIN s USING (pos)
)
"""
    out["corpus_profile"] = f"""
WITH r AS (
  SELECT lang, source, length(text) AS c, len({_WORDS}) AS t, text
  FROM documents
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_unique,
       floor((count(*) - count(DISTINCT text)) * 1.0 / count(*) * 10000 + 0.5)
       / 10000 AS dup_ratio,
       CAST(sum(c) AS BIGINT) AS total_chars,
       CAST(sum(t) AS BIGINT) AS total_tokens,
       floor(sum(t) * 1.0 / count(*) * 10000 + 0.5) / 10000 AS avg_tokens,
       CAST(min(c) AS BIGINT) AS min_chars,
       CAST(max(c) AS BIGINT) AS max_chars
FROM r GROUP BY 1, 2
"""
    out["embedding_quantize"] = (
        _qx + "SELECT vec_id, pos, CAST(code AS INT) AS q FROM qc"
    )
    out["embedding_quant_error"] = _qx + """
SELECT vec_id,
       floor(max(abs(v - (dmin + code / 255.0 * (dmax - dmin)))) * 10000 + 0.5)
       / 10000 AS max_err
FROM qc GROUP BY 1
"""
    # cross-batch SemDeDup through the curation state machine: batch 1
    # in-batch closure; batch 2 drops docs matching batch-1 ACCEPTED
    # embeddings (append-only policy), then closes over the remaining
    # survivors only (no chaining through history-dropped docs).
    # the stage normalizes ONCE (unit_vectors) and buckets the
    # normalized vectors; the replay mirrors both (bucket signs can
    # differ between raw and normalized only on exact hyperplane
    # boundaries, so the formula must match bit-for-bit)
    _cos = "floor(list_dot_product({l}.v, {r}.v) * 10000 + 0.5) / 10000"
    out["curation_semantic"] = f"""
WITH RECURSIVE e0 AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), e AS (
  SELECT id, list_transform(v, x -> x / nrm) AS v
  FROM (SELECT id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e0)
), bk AS MATERIALIZED (
  SELECT id, v, 0 AS band, {_lsh_bucket_sql('v', 4, band=0)} AS bucket FROM e
  UNION ALL
  SELECT id, v, 1 AS band, {_lsh_bucket_sql('v', 4, band=1)} AS bucket FROM e
), b1 AS MATERIALIZED (SELECT * FROM bk WHERE id < 250),
p1 AS MATERIALIZED (
  SELECT DISTINCT l.id AS a, r.id AS b
  FROM b1 l JOIN b1 r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
  WHERE {_cos.format(l='l', r='r')} >= 0.5
),
sym1 AS (SELECT a, b FROM p1 UNION SELECT b AS a, a AS b FROM p1),
reach1 AS (
  SELECT a, b FROM sym1
  UNION
  SELECT r.a, s.b FROM reach1 r JOIN sym1 s ON r.b = s.a WHERE s.b <> r.a
),
comp1 AS (SELECT a AS id, least(min(b), a) AS cid FROM reach1 GROUP BY a),
acc1 AS MATERIALIZED (
  SELECT e.id FROM e LEFT JOIN comp1 c ON e.id = c.id
  WHERE e.id < 250 AND coalesce(c.cid, e.id) = e.id
),
b2 AS MATERIALIZED (SELECT * FROM bk WHERE id >= 250),
hb AS MATERIALIZED (SELECT b1.* FROM b1 JOIN acc1 ON b1.id = acc1.id),
xmatch AS MATERIALIZED (
  SELECT DISTINCT n.id
  FROM b2 n JOIN hb o ON n.band = o.band AND n.bucket = o.bucket
  WHERE {_cos.format(l='n', r='o')} >= 0.5
),
s2 AS MATERIALIZED (
  SELECT b2.* FROM b2 LEFT JOIN xmatch x ON b2.id = x.id WHERE x.id IS NULL
),
p2 AS MATERIALIZED (
  SELECT DISTINCT l.id AS a, r.id AS b
  FROM s2 l JOIN s2 r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
  WHERE {_cos.format(l='l', r='r')} >= 0.5
),
sym2 AS (SELECT a, b FROM p2 UNION SELECT b AS a, a AS b FROM p2),
reach2 AS (
  SELECT a, b FROM sym2
  UNION
  SELECT r.a, s.b FROM reach2 r JOIN sym2 s ON r.b = s.a WHERE s.b <> r.a
),
comp2 AS (SELECT a AS id, least(min(b), a) AS cid FROM reach2 GROUP BY a),
s2ids AS (SELECT DISTINCT id FROM s2),
acc2 AS (
  SELECT s.id FROM s2ids s LEFT JOIN comp2 c ON s.id = c.id
  WHERE coalesce(c.cid, s.id) = s.id
)
SELECT id AS doc_id, 1 AS batch FROM acc1
UNION ALL
SELECT id AS doc_id, 2 AS batch FROM acc2
"""
    # the streaming wrapper must add no semantics beyond micro-batch
    # delivery: identical replay to curation_semantic (the same pairing
    # as curation_streaming ≡ curation_incremental)
    out["curation_streaming_semantic"] = out["curation_semantic"]
    # SemDeDup action: the embedding_near_dups pair replay + recursive
    # transitive closure (the dedup_clusters shape) + min-id rep flag.
    out["semantic_dedup"] = f"""
WITH RECURSIVE e0 AS (
  SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), e AS (
  SELECT id, v, list_transform(v, x -> x / nrm) AS nv
  FROM (SELECT id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e0)
), b AS MATERIALIZED (
  SELECT id, nv, 0 AS band, {_lsh_bucket_sql('v', 4, band=0)} AS bucket FROM e
  UNION ALL
  SELECT id, nv, 1 AS band, {_lsh_bucket_sql('v', 4, band=1)} AS bucket FROM e
), s AS MATERIALIZED (
  SELECT DISTINCT l.id AS a, r.id AS b,
         floor(list_dot_product(l.nv, r.nv) * 10000 + 0.5) / 10000 AS score
  FROM b l JOIN b r ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id
), pr AS (SELECT a, b FROM s WHERE score >= 0.5),
sym AS (SELECT a, b FROM pr UNION SELECT b AS a, a AS b FROM pr),
reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s2.b FROM reach r JOIN sym s2 ON r.b = s2.a WHERE s2.b <> r.a
),
comp AS (SELECT a AS vec_id, least(min(b), a) AS cluster_id FROM reach GROUP BY a)
SELECT v.vec_id,
       CAST(coalesce(c.cluster_id, v.vec_id) AS BIGINT) AS cluster_id,
       CAST(CASE WHEN coalesce(c.cluster_id, v.vec_id) = v.vec_id
                 THEN 1 ELSE 0 END AS INT) AS is_rep
FROM embeddings v LEFT JOIN comp c USING (vec_id)
"""
    # cluster-balanced sampling: the ann_ivf assignment replay + integer
    # per-cluster cutoffs (target*16^digits // n, >= 1, 'ffffg' sentinel
    # for keep-all) + the md5(cluster:id) threshold predicate.
    out["cluster_sample"] = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), c AS (
  SELECT vec_id AS centroid_id, v AS cvec
  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
), scored AS (
  SELECT e.vec_id, c.centroid_id,
         floor(sqrt(list_sum(list_transform(generate_series(1, len(e.v)),
               j -> (e.v[j] - c.cvec[j]) * (e.v[j] - c.cvec[j])))) * 10000 + 0.5) / 10000 AS dist
  FROM e CROSS JOIN c
), r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, centroid_id ASC) AS rn
  FROM scored
), a AS (SELECT vec_id, centroid_id FROM r WHERE rn = 1),
   sz AS (SELECT centroid_id, count(*) AS n FROM a GROUP BY centroid_id),
   cuts AS (
  SELECT centroid_id,
         CASE WHEN n <= 20 THEN 'ffffg'
              ELSE printf('%04x', greatest(1, (20 * 65536) // n)) END AS cut
  FROM sz
)
SELECT a.vec_id, a.centroid_id
FROM a JOIN cuts USING (centroid_id)
WHERE substr(md5(CAST(a.centroid_id AS VARCHAR) || ':' || CAST(a.vec_id AS VARCHAR)), 1, 4)
      < cut
"""
    out["sco_closure"] = """
WITH RECURSIVE edges AS (
  SELECT 'cat' || doc_id AS src, 'cat' || CAST(doc_id // 2 AS VARCHAR) AS dst
  FROM documents WHERE doc_id BETWEEN 1 AND 63
), nodes AS (
  SELECT src AS n FROM edges UNION SELECT dst FROM edges
), clo AS (
  SELECT n AS descendant, n AS ancestor FROM nodes
  UNION
  SELECT e.src, c.ancestor
  FROM edges e JOIN clo c ON e.dst = c.descendant
)
SELECT descendant, ancestor FROM clo
"""
    return out
