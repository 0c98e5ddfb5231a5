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
