"""BM25 retrieval + corpus n-gram stats (operators/search.py)."""

import math

import pytest
from pyspark.sql import functions as F

from neosemantics_spark.operators import search


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "spark shuffle join join join"),
        (1, "spark shuffle"),
        (2, "join once here"),
        (3, "nothing relevant at all"),
        (4, "spark spark spark spark spark spark spark spark"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_build_postings_tf_and_dl(docs):
    postings, doclens = search.build_postings(docs)
    tf = {(r["term"], r["id"]): r["tf"] for r in postings.collect()}
    assert tf[("join", 0)] == 3 and tf[("spark", 4)] == 8 and tf[("shuffle", 1)] == 1
    dl = {r["id"]: r["dl"] for r in doclens.collect()}
    assert dl == {0: 5, 1: 2, 2: 3, 3: 4, 4: 8}


def test_tokenize_query_normalizes_and_dedupes():
    assert search.tokenize_query("Join, JOIN  shuffle!") == ["join", "shuffle"]
    with pytest.raises(ValueError):
        search.bm25_topk(None, "!!!")


def test_bm25_ranking(docs):
    out = search.bm25_topk(docs, "join shuffle", k=5).collect()
    ranks = {r["doc_id"]: r["rank"] for r in out}
    # doc 0 matches both terms with tf(join)=3 — must rank first; doc 3
    # matches nothing and doc 4 matches nothing -> absent
    assert ranks[0] == 1
    assert 3 not in ranks and 4 not in ranks
    assert set(ranks) == {0, 1, 2}
    # scores strictly ordered by rank
    by_rank = sorted(out, key=lambda r: r["rank"])
    scores = [r["score"] for r in by_rank]
    assert scores == sorted(scores, reverse=True)


def test_bm25_matches_manual_formula(docs):
    # single-term query so the formula is easy to check by hand
    out = {r["doc_id"]: r["score"] for r in search.bm25_topk(docs, "shuffle", k=5).collect()}
    n, avgdl = 5, (5 + 2 + 3 + 4 + 8) / 5
    df_t, k1, b = 2, 1.2, 0.75
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    def s(tf, dl):
        val = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return math.floor(val * 10000 + 0.5) / 10000
    assert out[0] == pytest.approx(s(1, 5))
    assert out[1] == pytest.approx(s(1, 2))


def test_bm25_takeordered_plan(docs):
    """The top-k must be a TakeOrdered/limit, not a global sort of the
    scored set."""
    plan = search.bm25_topk(docs, "join", k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_top_ngrams(spark):
    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x"), (2, "zz")], ["doc_id", "text"]
    )
    got = [(r["ngram"], r["cnt"]) for r in search.top_ngrams(df, n=2, k=3).collect()]
    # 'a b' x3; then 'b a' / 'b c' / 'b x' all x1 — lexicographic tiebreak
    assert got == [("a b", 3), ("b a", 1), ("b c", 1)]


def test_bm25_empty_corpus_guard(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = search.bm25_topk(empty, "join shuffle")
    assert out.columns == ["doc_id", "score", "rank"] and out.count() == 0
    # corpus where every doc tokenizes to zero words (avgdl == 0)
    blank = spark.createDataFrame([(0, "!!!"), (1, "...")], ["doc_id", "text"])
    assert search.bm25_topk(blank, "join").count() == 0


def test_persisted_index_matches_inline_and_prunes(spark, docs, tmp_path):
    """The persisted-index path returns the same ranking as the inline
    path, skips the per-query scalar jobs, and its postings scan carries
    a partition filter on the term bucket (true partition pruning)."""
    path = str(tmp_path / "idx")
    search.write_postings(docs, path, n_buckets=16)
    idx = search.read_postings(spark, path)
    assert idx.n_docs == 5 and idx.n_buckets == 16 and idx.avgdl == pytest.approx(22 / 5)

    inline = search.bm25_topk(docs, "join shuffle", k=5).collect()
    via_idx = search.bm25_topk(None, "join shuffle", k=5, index=idx).collect()
    assert [(r["doc_id"], r["score"], r["rank"]) for r in inline] == [
        (r["doc_id"], r["score"], r["rank"]) for r in via_idx
    ]

    # driver-side and Spark-side bucket hashes agree term by term
    spark_tb = {
        r["term"]: r["tb"] for r in idx.postings.select("term", "tb").collect()
    }
    for t, tb in spark_tb.items():
        assert search.term_bucket(t, 16) == tb

    # partition pruning: the scan's PartitionFilters mention tb and the
    # executed plan reads only the queried buckets' directories
    q = search.bm25_topk(None, "join", k=3, index=idx)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "tb" in plan
    want = search.term_bucket("join", 16)
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and str(want) in m.group(1), plan[:2000]


def test_append_postings_equals_rebuild(spark, docs, tmp_path):
    """Incremental index maintenance: build on half the corpus, append
    the other half — queries through the appended index rank exactly
    like a from-scratch rebuild over the union, and the stats fold
    exactly."""
    a = docs.filter("doc_id < 2")
    b = docs.filter("doc_id >= 2")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    search.write_postings(a, inc, n_buckets=16)
    bid = search.append_postings(b, inc)
    assert bid in search._idx_manifest(inc)["batches"]
    search.write_postings(docs, full, n_buckets=16)
    i_inc = search.read_postings(spark, inc)
    i_full = search.read_postings(spark, full)
    assert i_inc.n_docs == i_full.n_docs == 5
    assert i_inc.avgdl == pytest.approx(i_full.avgdl)
    for q in ("join shuffle", "spark partitions", "join"):
        r1 = [(r["doc_id"], r["score"], r["rank"])
              for r in search.bm25_topk(None, q, k=5, index=i_inc).collect()]
        r2 = [(r["doc_id"], r["score"], r["rank"])
              for r in search.bm25_topk(None, q, k=5, index=i_full).collect()]
        assert r1 == r2, q
    # postings themselves match row-for-row
    p1 = sorted(map(tuple, i_inc.postings.select("term", "id", "tf", "tb").collect()))
    p2 = sorted(map(tuple, i_full.postings.select("term", "id", "tf", "tb").collect()))
    assert p1 == p2


def test_append_postings_guards(spark, docs, tmp_path):
    import os

    path = str(tmp_path / "g")
    # appending to a non-existent index is refused
    with pytest.raises(ValueError, match="write_postings first"):
        search.append_postings(docs, path)
    search.write_postings(docs.filter("doc_id < 3"), path, n_buckets=16)
    # overlapping doc ids are refused (re-index needs a rebuild)
    with pytest.raises(ValueError, match="already indexed"):
        search.append_postings(docs.filter("doc_id >= 1"), path)
    # a crashed append (batch dirs written, no commit) is invisible
    before = search.read_postings(spark, path).n_docs
    os.makedirs(os.path.join(path, "postings", "batch=dead"), exist_ok=True)
    assert search.read_postings(spark, path).n_docs == before
    # replaying the same append twice commits once (idempotent)
    b = docs.filter("doc_id >= 3")
    bid1 = search.append_postings(b, path)
    bid2 = search.append_postings(b, path, validate_ids=False)
    assert bid1 == bid2
    assert search._idx_manifest(path)["batches"].count(bid1) == 1
    assert search.read_postings(spark, path).n_docs == 5
    # remote schemes are refused — POSIX manifest + Spark parquet would
    # silently split across filesystems (ADVICE r5 guard)
    for fn in (
        lambda: search.write_postings(docs, "s3a://bucket/idx"),
        lambda: search.append_postings(docs, "hdfs://nn/idx"),
        lambda: search.read_postings(spark, "s3a://bucket/idx"),
    ):
        with pytest.raises(ValueError, match="URI scheme"):
            fn()
