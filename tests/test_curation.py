"""End-to-end curation pipeline (curation.py + jobs/curate_job.py)."""

import pytest
from pyspark.sql import functions as F

from neosemantics_spark.curation import curate_corpus


@pytest.fixture(scope="module")
def corpus(spark):
    # 25 words: one changed word flips 3 of 23 shingles -> Jaccard ~0.77,
    # above the 0.7 verification threshold
    base = (
        "the quick brown fox jumps over the lazy dog while a busy crew "
        "loads data into one big table before our nightly batch run starts"
    )
    rows = []
    # 3 exact copies of one doc
    for i in range(3):
        rows.append((i, base))
    # near-dups of each other (one-word difference), not exact
    rows.append((10, base.replace("lazy", "sleepy")))
    rows.append((11, base.replace("lazy", "tired")))
    # clean distinct docs
    for i in range(20, 40):
        rows.append((i, f"document number {i} talks about spark shuffle partitions and joins variant {i % 7}"))
    # gibberish (OOV-heavy after training: rare one-off bigrams)
    rows.append((50, "zxqv wpolk jtrfn mmzya qqoro aabzz xxyyz"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_corpus_stages(spark, corpus):
    bench = spark.createDataFrame(
        # shares an 8-token window with doc 20's text
        [(1000, "document number 20 talks about spark shuffle partitions and joins")],
        ["doc_id", "text"],
    )
    res = curate_corpus(
        corpus,
        bench,
        jaccard_threshold=0.7,
        decontam_n=8,
        lm_quantile=0.1,
    )
    m = res.metrics
    assert m["n_input"] == 26
    # 3 exact copies -> 1
    assert m["n_after_exact_dedup"] == 24
    # near-dups 0/10/11 collapse into one cluster rep
    assert m["n_after_near_dedup"] == 22
    # doc 20 contaminated by the bench doc
    assert m["n_after_decontam"] == 21
    assert m["n_after_lm_filter"] < m["n_after_decontam"]
    got = res.curated
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert 20 not in ids and 1 not in ids and 2 not in ids
    assert 50 not in ids  # gibberish filtered by the self-trained LM
    assert m["n_after_lm_filter"] == len(ids)
    # every surviving row carries a split assignment
    assert got.filter(F.col("split").isNull()).count() == 0
    assert set(m["split_counts"]) <= {"train", "val", "test"}
    assert sum(m["split_counts"].values()) == len(ids)


def test_curate_corpus_rep_score_quality(spark):
    """rep_score='quality' elects the BEST-quality member of a near-dup
    cluster instead of the min id (VERDICT r5 item 3: elect_cluster_reps
    wired into the pipeline)."""
    # docs 1 and 2 are near-dups; doc 2 (higher id) is clearly higher
    # quality (longer, stopword-bearing prose); doc 9 is a singleton
    base = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the quiet green field toward the old farm house"
    )
    docs = spark.createDataFrame(
        [
            (1, base + " x"),
            (2, base + " and the sun was warm in the afternoon sky above"),
            (9, "an entirely different document about spark joins and shuffles"),
        ],
        ["doc_id", "text"],
    )
    # min-id default keeps doc 1
    res_min = curate_corpus(docs, None, jaccard_threshold=0.5, lm_quantile=0.0)
    ids_min = {r["doc_id"] for r in res_min.curated.collect()}
    assert ids_min == {1, 9}
    # quality election keeps doc 2
    res_q = curate_corpus(
        docs, None, jaccard_threshold=0.5, lm_quantile=0.0, rep_score="quality"
    )
    ids_q = {r["doc_id"] for r in res_q.curated.collect()}
    assert ids_q == {2, 9}
    assert res_q.metrics["n_after_near_dedup"] == 2
    # an explicit scores DataFrame overrides: score doc 1 higher
    scores = spark.createDataFrame([(1, 10.0), (2, 1.0)], ["doc_id", "score"])
    res_s = curate_corpus(
        docs, None, jaccard_threshold=0.5, lm_quantile=0.0, rep_score=scores
    )
    assert {r["doc_id"] for r in res_s.curated.collect()} == {1, 9}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rep_score"):
        curate_corpus(docs, None, lm_quantile=0.0, rep_score="nope")


def test_checkpoint_rep_score_quality(spark, tmp_path):
    """rep_score through the incremental path: in-batch cluster election
    is quality-based; cross-batch policy (historical doc stays
    canonical) is unchanged."""
    from neosemantics_spark.curation import CurationCheckpoint

    base = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "through the quiet green field toward the old farm house"
    )
    b1 = spark.createDataFrame(
        [
            (1, base + " x"),
            (2, base + " and the sun was warm in the afternoon sky above"),
        ],
        ["doc_id", "text"],
    )
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    r1 = cp.run(b1, lm_quantile=0.0, jaccard_threshold=0.5, rep_score="quality")
    assert {r["doc_id"] for r in r1.curated.collect()} == {2}
    # a later near-dup of the accepted doc is dropped (history canonical)
    b2 = spark.createDataFrame([(7, base + " y")], ["doc_id", "text"])
    r2 = cp.run(b2, lm_quantile=0.0, jaccard_threshold=0.5, rep_score="quality")
    assert r2.metrics["n_after_near_dedup"] == 0


def test_curate_no_bench_keeps_short_docs(spark):
    docs = spark.createDataFrame(
        [(0, "tiny"), (1, "one two"), (2, "spark shuffle join agg scan filter")],
        ["doc_id", "text"],
    )
    res = curate_corpus(docs, None, lm_quantile=0.0)
    assert "n_after_decontam" not in res.metrics
    # doc 0 has no bigrams -> null score but kept
    rows = {r["doc_id"]: r["avg_logp"] for r in res.curated.collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0] is None and rows[2] is not None


def test_curation_checkpoint_incremental(spark, tmp_path):
    from neosemantics_spark.curation import CurationCheckpoint

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega last"
    )
    b1 = spark.createDataFrame(
        [(0, base)]
        + [
            (i, f"batch one doc {i} about spark partitions shuffle joins and aggregation variant {i}")
            for i in range(1, 12)
        ],
        ["doc_id", "text"],
    )
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    r1 = cp.run(b1, lm_quantile=0.0, jaccard_threshold=0.7)
    assert r1.metrics["n_batch"] == 12
    assert r1.metrics["n_fresh"] == 12
    assert r1.metrics["n_accepted"] == 12
    accepted1 = {r["doc_id"] for r in r1.curated.select("doc_id").collect()}
    assert accepted1 == set(range(12))

    b2 = spark.createDataFrame(
        [
            (100, base),                                  # exact copy of doc 0 -> hash-dropped
            (101, base.replace("sigma", "sigmaprime")),   # near-dup of doc 0 -> cross-batch dropped
            (102, "an entirely new document about watermarking streaming state and windows"),
            (103, "an entirely new document about watermarking streaming state and windows"),  # in-batch exact dup of 102
        ],
        ["doc_id", "text"],
    )
    r2 = cp.run(b2, lm_quantile=0.0, jaccard_threshold=0.7)
    assert r2.metrics["n_batch"] == 4
    # 100 exact-dropped vs history, 103 in-batch exact dup -> 2 fresh
    assert r2.metrics["n_fresh"] == 2
    # 101 matches historical rep 0 via the persisted bucket index
    assert r2.metrics["n_after_near_dedup"] == 1
    assert {r["doc_id"] for r in r2.curated.select("doc_id").collect()} == {102}

    # batch 3: exact copy of the REJECTED doc 101 -> still dropped (hash
    # memory covers rejected docs too)
    b3 = spark.createDataFrame([(200, base.replace("sigma", "sigmaprime"))], ["doc_id", "text"])
    r3 = cp.run(b3, lm_quantile=0.0, jaccard_threshold=0.7)
    assert r3.metrics["n_fresh"] == 0
    assert r3.curated.count() == 0

    # parameter drift is refused
    with pytest.raises(ValueError, match="parameter"):
        cp.run(b3, bands=2, lm_quantile=0.0)


def test_checkpoint_meta_missing_keys_default(spark, tmp_path):
    """A meta.json written before newer params existed (no chunk_dedup /
    semantic_* keys) must open as those params' defaults, not raise
    (ADVICE r5: strict equality bricked pre-existing state roots)."""
    import json

    from neosemantics_spark.curation import CurationCheckpoint

    docs = spark.createDataFrame(
        [(i, f"doc number {i} about spark curation state roots") for i in range(4)],
        ["doc_id", "text"],
    )
    root = str(tmp_path / "state")
    cp = CurationCheckpoint(spark, root)
    cp.run(docs, lm_quantile=0.0)
    # simulate a pre-r5 checkpoint: strip the five newer keys
    meta_path = cp.p_meta
    with open(meta_path) as fh:
        meta = json.load(fh)
    for key in CurationCheckpoint._PARAM_DEFAULTS:
        meta["params"].pop(key, None)
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)

    more = spark.createDataFrame(
        [(10, "an entirely fresh doc about upgrade compatibility")],
        ["doc_id", "text"],
    )
    r = CurationCheckpoint(spark, root).run(more, lm_quantile=0.0)  # no raise
    assert r.metrics["n_accepted"] == 1
    with open(meta_path) as fh:  # meta migrated in place
        migrated = json.load(fh)["params"]
    assert migrated["chunk_dedup"] is False and migrated["semantic_bands"] == 2
    # a NON-default value for a newer param still conflicts with old meta
    with open(meta_path, "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(ValueError, match="parameter"):
        CurationCheckpoint(spark, root).run(more, lm_quantile=0.0, chunk_tokens=64)


def test_streaming_curate(spark, tmp_path):
    from neosemantics_spark.streaming.stream import streaming_curate

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [
            (0, "first unique streaming document about joins and shuffles in spark"),
            (1, "second unique streaming document about windows and watermarks today"),
        ],
        ["doc_id", "text"],
    ).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = streaming_curate(stream, state, out, ck, lm_quantile=0.0)
    q.awaitTermination(180)
    assert {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()} == {0, 1}

    # second micro-batch: one duplicate of doc 0 (dropped against state),
    # one genuinely new doc (accepted)
    spark.createDataFrame(
        [
            (2, "first unique streaming document about joins and shuffles in spark"),
            (3, "third unique streaming document about broadcast joins and skew"),
        ],
        ["doc_id", "text"],
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("doc_id long, text string").parquet(src)
    q2 = streaming_curate(stream2, state, out, ck, lm_quantile=0.0)
    q2.awaitTermination(180)
    assert {r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()} == {0, 1, 3}


def test_incremental_no_chaining_through_dropped_docs(spark, tmp_path):
    """A history-matched (dropped) doc must not drag its in-batch
    near-dup neighbors down with it: if the dropped doc were the cluster
    min, the cluster would keep NO representative. Policy: survivors
    cluster among themselves only."""
    from neosemantics_spark.curation import CurationCheckpoint

    base = (
        "the quick brown fox jumps over the lazy dog while a busy crew "
        "loads data into one big table before our nightly batch run starts"
    )
    a_text = base.replace("lazy", "rapid")              # ~0.77 vs base
    b_text = a_text.replace("before", "ahead")          # ~0.77 vs A, ~0.59 vs base
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    r1 = cp.run(
        spark.createDataFrame([(0, base)], ["doc_id", "text"]),
        lm_quantile=0.0, jaccard_threshold=0.7,
    )
    assert r1.metrics["n_accepted"] == 1

    r2 = cp.run(
        spark.createDataFrame([(10, a_text), (11, b_text)], ["doc_id", "text"]),
        lm_quantile=0.0, jaccard_threshold=0.7,
    )
    # doc 10 matches historical rep 0 -> dropped; doc 11 is near 10 but
    # NOT near 0 -> must survive as its own representative
    assert {r["doc_id"] for r in r2.curated.select("doc_id").collect()} == {11}


def test_checkpoint_crash_before_commit_replays_idempotently(spark, tmp_path):
    """Batch-scoped commit protocol: if a batch crashes AFTER its state
    subdirectories are written but BEFORE the commit marker lands, the
    committed state is untouched (readers never see uncommitted dirs)
    and a replay of the same batch recomputes it, overwrites its own
    partial output, and commits exactly once — no duplicated reps, no
    hash-without-reps window (the round-3 partial-append bug class)."""
    from neosemantics_spark.curation import CurationCheckpoint

    b1 = spark.createDataFrame(
        [(i, f"committed batch doc {i} spark shuffle join agg variant {i}") for i in range(5)],
        ["doc_id", "text"],
    )
    b2 = spark.createDataFrame(
        [(10, "a post crash document about watermark state and recovery"),
         (11, "another post crash document about bucket index replay")],
        ["doc_id", "text"],
    )
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    cp.run(b1, lm_quantile=0.0)

    crashing = CurationCheckpoint(spark, str(tmp_path / "state"))
    crashing._commit = lambda bid, metrics=None: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError, match="crash"):
        crashing.run(b2, lm_quantile=0.0)
    # committed state still shows only batch 1
    assert {r["doc_id"] for r in cp._table(cp.p_reps).select("doc_id").collect()} == set(range(5))

    # replay of the SAME batch converges: full output, state consistent
    r2 = cp.run(b2, lm_quantile=0.0)
    assert {r["doc_id"] for r in r2.curated.select("doc_id").collect()} == {10, 11}
    reps = cp._table(cp.p_reps)
    assert reps.filter(F.col("doc_id").isin(10, 11)).count() == 2
    assert reps.count() == 7  # no duplicated rows from the crashed attempt
    # every accepted rep is present in the bucket index (the invariant
    # the old append ordering could break)
    buck_ids = {r["doc_id"] for r in cp._table(cp.p_buckets).select("doc_id").distinct().collect()}
    assert {10, 11} <= buck_ids
    # and both state batches are committed exactly once
    assert len(cp._committed()) == 2


def test_checkpoint_custom_id_col(spark, tmp_path):
    """id_col is honored end-to-end: state keys on 'doc_id' internally,
    the returned curated frame carries the caller's column name."""
    from neosemantics_spark.curation import CurationCheckpoint, curate_corpus

    docs = spark.createDataFrame(
        [(1, "custom id column doc about spark joins and shuffles"),
         (2, "custom id column doc about spark joins and shuffles"),  # exact dup
         (3, "a different custom id document about windows and state")],
        ["page_id", "text"],
    )
    res = curate_corpus(docs, None, lm_quantile=0.0, id_col="page_id")
    assert {r["page_id"] for r in res.curated.select("page_id").collect()} == {1, 3}

    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    r1 = cp.run(docs, lm_quantile=0.0, id_col="page_id")
    assert "page_id" in r1.curated.columns and "doc_id" not in r1.curated.columns
    assert {r["page_id"] for r in r1.curated.select("page_id").collect()} == {1, 3}
    # resubmission is a no-op through the hash state
    r2 = cp.run(docs, lm_quantile=0.0, id_col="page_id")
    assert r2.metrics["n_fresh"] == 0 and "page_id" in r2.curated.columns


def test_checkpoint_compaction_preserves_semantics(spark, tmp_path):
    """compact() merges all committed batch dirs into one snapshot:
    the active-batch list shrinks to 1, and every cross-batch behavior
    (hash resubmission no-op, bucket-index near-dup matching) is
    unchanged against the compacted state."""
    from neosemantics_spark.curation import CurationCheckpoint

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega last"
    )
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    cp.run(spark.createDataFrame([(0, base)], ["doc_id", "text"]), lm_quantile=0.0, jaccard_threshold=0.7)
    cp.run(
        spark.createDataFrame(
            [(10, "a totally separate second batch document about joins")],
            ["doc_id", "text"],
        ),
        lm_quantile=0.0, jaccard_threshold=0.7,
    )
    assert len(cp._committed()) == 2
    pre_reps = {r["doc_id"] for r in cp._table(cp.p_reps).select("doc_id").collect()}

    assert cp.compact() == 2
    assert len(cp._committed()) == 1 and cp._committed()[0].startswith("compact-")
    assert {r["doc_id"] for r in cp._table(cp.p_reps).select("doc_id").collect()} == pre_reps

    # hash memory intact: resubmitting batch-1 text is a no-op
    r = cp.run(spark.createDataFrame([(20, base)], ["doc_id", "text"]), lm_quantile=0.0, jaccard_threshold=0.7)
    assert r.metrics["n_fresh"] == 0
    # bucket index intact: a near-dup of the compacted rep is dropped
    r2 = cp.run(
        spark.createDataFrame([(30, base.replace("sigma", "sigmaprime"))], ["doc_id", "text"]),
        lm_quantile=0.0, jaccard_threshold=0.7,
    )
    assert r2.metrics["n_fresh"] == 1 and r2.metrics["n_after_near_dedup"] == 0
    # and new batches keep committing on top of the compacted snapshot
    r3 = cp.run(
        spark.createDataFrame([(40, "yet another brand new doc about watermarks")], ["doc_id", "text"]),
        lm_quantile=0.0, jaccard_threshold=0.7,
    )
    # both post-compaction batches commit on top of the snapshot (batch
    # 30 accepted nothing but its hash memory must persist)
    assert r3.metrics["n_accepted"] == 1 and len(cp._committed()) == 3


def test_checkpoint_metrics_history_survives_compaction(spark, tmp_path):
    """Every committed batch leaves an audit ledger row (metrics) in
    commit order; compaction rewrites the ACTIVE snapshot but preserves
    the history — the curation twin of ImportCheckpoint's per-run
    metrics table."""
    from neosemantics_spark.curation import CurationCheckpoint

    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    cp.run(spark.createDataFrame([(0, "first audit ledger document about spark")], ["doc_id", "text"]), lm_quantile=0.0)
    cp.run(spark.createDataFrame([(1, "second audit ledger document about state")], ["doc_id", "text"]), lm_quantile=0.0)
    h = cp.history()
    assert len(h) == 2
    assert all(m["n_accepted"] == 1 and m["batch_id"] == bid for bid, m in h)

    cp.compact()
    assert len(cp._committed()) == 1  # active snapshot compacted...
    assert [bid for bid, _ in cp.history()] == [bid for bid, _ in h]  # ...history intact

    cp.run(spark.createDataFrame([(2, "third audit ledger document about manifest")], ["doc_id", "text"]), lm_quantile=0.0)
    assert len(cp.history()) == 3


def test_checkpoint_rejects_remote_root(spark, tmp_path):
    """The snapshot-commit protocol is driver-local POSIX; a remote
    state root would make historical state silently invisible (manifest
    read returns empty -> duplicates re-accepted). Refuse at __init__."""
    from neosemantics_spark.curation import CurationCheckpoint

    for bad in ("hdfs://nn:8020/state", "s3a://bucket/state", "abfss://c@a/state"):
        with pytest.raises(ValueError, match="URI scheme"):
            CurationCheckpoint(spark, bad)
    # file: is driver-local; accepted and normalized to the plain path
    cp = CurationCheckpoint(spark, f"file://{tmp_path}/state")
    assert cp.root == f"{tmp_path}/state"
    # windows-drive-free plain relative/absolute paths untouched
    assert CurationCheckpoint(spark, str(tmp_path / "s2")).root == str(tmp_path / "s2")


# ---------------------------------------------------------- chunk/semantic
def _block(prefix, n=32):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_curate_corpus_chunk_dedup_and_semantic_decontam(spark):
    """chunk_dedup rewrites a shared boilerplate block out of the later
    doc (not a near-dup — doc-level dedup passes both); semantic_bench +
    embeddings drop the doc planted at the bench vector."""
    boiler = _block("boiler")
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + _block("uniqa")),
            (2, boiler + " " + _block("uniqb")),
            (3, _block("plain")),
            (4, _block("planted")),
        ],
        ["doc_id", "text"],
    )
    dim = 8
    e = [0.0] * dim
    bench_vec = [1.0] + e[1:]
    ortho = [0.0, 1.0] + e[2:]
    embeddings = spark.createDataFrame(
        [(1, ortho), (2, ortho), (3, ortho), (4, bench_vec)],
        ["doc_id", "embedding"],
    )
    semantic_bench = spark.createDataFrame([(900, bench_vec)], ["doc_id", "embedding"])
    res = curate_corpus(
        docs,
        lm_quantile=0.0,
        chunk_dedup=True,
        semantic_bench=semantic_bench,
        embeddings=embeddings,
    )
    m = res.metrics
    assert m["n_after_near_dedup"] == 4
    assert m["chunks_dropped"] == 1  # doc 2's boilerplate chunk
    assert m["n_after_chunk_dedup"] == 4
    assert m["n_after_semantic_decontam"] == 3  # doc 4 dropped
    texts = {r["doc_id"]: r["text"] for r in res.curated.collect()}
    assert set(texts) == {1, 2, 3}
    assert texts[1].startswith("boiler0 ")
    assert "boiler0" not in texts[2] and texts[2].startswith("uniqb0 ")


def test_checkpoint_cross_batch_chunk_dedup(spark, tmp_path):
    """A later batch's copy of a historical boilerplate block is dropped
    via the persisted chunk_hashes state even though the carrier docs
    are nowhere near doc-level duplicates; stage metrics land in the
    manifest ledger."""
    from neosemantics_spark.curation import CurationCheckpoint

    boiler = _block("shared")
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame(
        [(1, boiler + " " + _block("first"))], ["doc_id", "text"]
    )
    r1 = cp.run(b1, lm_quantile=0.0, chunk_dedup=True)
    assert r1.metrics["chunks_dropped"] == 0
    b2 = spark.createDataFrame(
        [(100, boiler + " " + _block("second")), (101, _block("other"))],
        ["doc_id", "text"],
    )
    r2 = cp.run(b2, lm_quantile=0.0, chunk_dedup=True)
    assert r2.metrics["n_after_near_dedup"] == 2
    assert r2.metrics["chunks_dropped"] == 1
    texts = {r["doc_id"]: r["text"] for r in r2.curated.collect()}
    assert "shared0" not in texts[100] and texts[100].startswith("second0 ")
    assert texts[101].startswith("other0 ")
    # ledger carries the stage metrics for every committed batch
    hist = dict(cp.history())
    assert hist[r2.metrics["batch_id"]]["chunks_dropped"] == 1
    # chunk ownership toggling is parameter drift — refused
    with pytest.raises(ValueError, match="parameter"):
        cp.run(b2, lm_quantile=0.0, chunk_dedup=False)
    # compaction preserves the chunk state: a batch-3 copy of the
    # boilerplate is still chunk-dropped after compact()
    cp.compact()
    b3 = spark.createDataFrame(
        [(200, boiler + " " + _block("third"))], ["doc_id", "text"]
    )
    r3 = cp.run(b3, lm_quantile=0.0, chunk_dedup=True)
    assert r3.metrics["chunks_dropped"] == 1
    t3 = {r["doc_id"]: r["text"] for r in r3.curated.collect()}
    assert "shared0" not in t3[200]


def test_checkpoint_semantic_decontam(spark, tmp_path):
    from neosemantics_spark.curation import CurationCheckpoint

    dim = 8
    bench_vec = [1.0] + [0.0] * (dim - 1)
    ortho = [0.0, 1.0] + [0.0] * (dim - 2)
    docs = spark.createDataFrame(
        [(1, _block("keepme")), (2, _block("contam"))], ["doc_id", "text"]
    )
    embeddings = spark.createDataFrame(
        [(1, ortho), (2, bench_vec)], ["doc_id", "embedding"]
    )
    semantic_bench = spark.createDataFrame([(900, bench_vec)], ["doc_id", "embedding"])
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    r = cp.run(
        docs,
        lm_quantile=0.0,
        semantic_bench=semantic_bench,
        embeddings=embeddings,
    )
    assert r.metrics["n_after_semantic_decontam"] == 1
    assert {x["doc_id"] for x in r.curated.collect()} == {1}
    # missing embeddings is a loud error, not a silent keep-all
    with pytest.raises(ValueError, match="embeddings"):
        cp.run(
            spark.createDataFrame([(5, _block("late"))], ["doc_id", "text"]),
            lm_quantile=0.0,
            semantic_bench=semantic_bench,
        )


def test_curate_corpus_semantic_dedup(spark):
    """SemDeDup stage in the one-shot pipeline: embedding clones
    collapse to their min-id doc even when the texts share nothing."""
    from neosemantics_spark.curation import curate_corpus

    dim = 8
    a = [1.0] + [0.0] * (dim - 1)
    a2 = [2.0] + [0.0] * (dim - 1)  # cosine exactly 1.0 with a
    b = [0.0, 1.0] + [0.0] * (dim - 2)
    docs = spark.createDataFrame(
        [(1, _block("one")), (2, _block("two")), (3, _block("three"))],
        ["doc_id", "text"],
    )
    embeddings = spark.createDataFrame(
        [(1, a), (2, a2), (3, b)], ["doc_id", "embedding"]
    )
    res = curate_corpus(
        docs,
        lm_quantile=0.0,
        semantic_dedup_threshold=0.95,
        embeddings=embeddings,
    )
    assert res.metrics["n_after_semantic_dedup"] == 2
    assert {r["doc_id"] for r in res.curated.collect()} == {1, 3}
    # missing embeddings is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError, match="embeddings"):
        curate_corpus(docs, lm_quantile=0.0, semantic_dedup_threshold=0.95)


def test_checkpoint_cross_batch_semantic_dedup(spark, tmp_path):
    """Embedding-space dedup against the persisted emb state: a later
    batch's doc at the SAME embedding direction as an accepted doc is
    dropped though the texts are unrelated; the no-chaining policy and
    compaction both hold."""
    from neosemantics_spark.curation import CurationCheckpoint

    dim = 8
    a = [1.0] + [0.0] * (dim - 1)
    a_clone = [3.0] + [0.0] * (dim - 1)
    b = [0.0, 1.0] + [0.0] * (dim - 2)
    b_clone = [0.0, 2.0] + [0.0] * (dim - 2)
    c = [0.0, 0.0, 1.0] + [0.0] * (dim - 3)

    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame([(1, _block("first"))], ["doc_id", "text"])
    e1 = spark.createDataFrame([(1, a)], ["doc_id", "embedding"])
    r1 = cp.run(b1, lm_quantile=0.0, semantic_dedup_threshold=0.95, embeddings=e1)
    assert r1.metrics["n_after_semantic_dedup"] == 1

    # batch 2: 100 clones accepted doc 1 (dropped cross-batch); 101/102
    # are in-batch clones of each other (min id 101 survives); 103 is a
    # doc with NO embedding row (passes through as a singleton)
    b2 = spark.createDataFrame(
        [(100, _block("alpha")), (101, _block("beta")), (102, _block("gamma")),
         (103, _block("delta"))],
        ["doc_id", "text"],
    )
    e2 = spark.createDataFrame(
        [(100, a_clone), (101, b), (102, b_clone)], ["doc_id", "embedding"]
    )
    r2 = cp.run(b2, lm_quantile=0.0, semantic_dedup_threshold=0.95, embeddings=e2)
    assert r2.metrics["n_after_semantic_dedup"] == 2
    assert {r["doc_id"] for r in r2.curated.collect()} == {101, 103}

    # parameter drift (disabling semantic dedup) is refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="parameter"):
        cp.run(b2, lm_quantile=0.0)

    # compaction preserves the embedding state: a batch-3 clone of the
    # batch-2 accepted direction is still dropped afterwards
    cp.compact()
    b3 = spark.createDataFrame(
        [(200, _block("third")), (201, _block("fourth"))], ["doc_id", "text"]
    )
    e3 = spark.createDataFrame(
        [(200, b_clone), (201, c)], ["doc_id", "embedding"]
    )
    r3 = cp.run(b3, lm_quantile=0.0, semantic_dedup_threshold=0.95, embeddings=e3)
    assert {r["doc_id"] for r in r3.curated.collect()} == {201}
    # ledger carries the stage metric
    hist = dict(cp.history())
    assert hist[r3.metrics["batch_id"]]["n_after_semantic_dedup"] == 1


def test_checkpoint_nb_filter(spark, tmp_path):
    """The classifier filter through the incremental path: junk-class
    docs are dropped and the stage metric lands in the ledger."""
    from neosemantics_spark.curation import CurationCheckpoint
    from neosemantics_spark.operators import classify

    labeled = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta fine prose words", "good"),
            (2, "zzz zzz spam spam zzz spam", "junk"),
        ],
        ["doc_id", "text", "label"],
    )
    model = classify.train_nb(labeled, "label")
    cp = CurationCheckpoint(spark, str(tmp_path / "state"))
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma fine prose delta words here"),
            (11, "spam zzz spam zzz zzz spam"),
        ],
        ["doc_id", "text"],
    )
    r = cp.run(batch, lm_quantile=0.0, nb_model=model, nb_keep_label="good")
    assert r.metrics["n_after_nb_filter"] == 1
    assert {x["doc_id"] for x in r.curated.collect()} == {10}
    assert dict(cp.history())[r.metrics["batch_id"]]["n_after_nb_filter"] == 1
