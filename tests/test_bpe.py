"""Distributed BPE (operators/bpe.py) pinned against a pure-Python
reference implementation of the same histogram formulation."""

import re
from collections import Counter

import pytest

from neosemantics_spark.operators.bpe import (
    EOW,
    PRETOKEN_PATTERN,
    encode_bpe,
    merges_table,
    train_bpe,
    word_histogram,
)

_RE = re.compile(PRETOKEN_PATTERN, re.ASCII)


def _train_ref(texts, n_merges, min_freq=2):
    """Reference trainer: word histogram, per-position pair counts,
    (freq desc, pair asc) argmax, greedy left-to-right rewrite."""
    hist = Counter()
    for t in texts:
        for w in _RE.findall(t):
            hist[w] += 1
    hist = {tuple(list(w) + [EOW]): f for w, f in hist.items()}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for sym, f in hist.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += f
        if not counts:
            break
        pair, freq = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < min_freq:
            break
        merges.append((pair[0], pair[1], freq))
        new_hist = {}
        for sym, f in hist.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_hist[tuple(out)] = new_hist.get(tuple(out), 0) + f
        hist = new_hist
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wide wider widest",
    "a aaaa ab, ab! 12 12 12",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_word_histogram(spark, docs):
    got = {r["word"]: r["freq"] for r in word_histogram(docs).collect()}
    assert got["low"] == 5
    assert got["newest"] == 6
    assert got[","] == 1 and got["!"] == 1   # punctuation split off
    assert got["12"] == 3                    # digit runs stay whole
    assert got["aaaa"] == 1


def test_train_matches_reference(spark, docs):
    want = _train_ref(CORPUS, 12)
    got = train_bpe(docs, n_merges=12)
    assert got == want
    # sanity on content: 'newest' (freq 6) drives the earliest merges
    assert got[0][2] >= got[-1][2]           # freqs non-increasing? not
    # guaranteed in general BPE, but holds for this corpus via reference
    assert ("w", EOW) not in [(m[0], m[1]) for m in got[:1]]


def test_train_overlap_and_stop(spark):
    docs = spark.createDataFrame([(0, "aaaa aaaa")], ["doc_id", "text"])
    got = train_bpe(docs, n_merges=50, min_freq=2)
    want = _train_ref(["aaaa aaaa"], 50)
    assert got == want
    # first merge: (a,a) counted per position = 3*2 = 6, greedy rewrite
    assert got[0] == ("a", "a", 6)
    # min_freq=2 stops before unique pairs; n_merges=0 trains nothing
    assert train_bpe(docs, n_merges=0) == []
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(docs, n_merges=-1)


def test_encode_matches_training_segmentation(spark, docs):
    merges = train_bpe(docs, n_merges=12)
    enc = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in encode_bpe(docs, merges).collect()
    }
    # encoding the training corpus reproduces the trained segmentation:
    # re-counting encoded tokens of 'low low ...' gives 5 copies of the
    # same segmentation of 'low'
    toks0, n0 = enc[0]
    assert n0 == len(toks0) and n0 % 5 == 0
    seg = toks0[: n0 // 5]
    assert toks0 == seg * 5
    assert "".join(seg) == "low" + EOW
    # every doc round-trips to its pretokenized text
    for i, text in enumerate(CORPUS):
        assert "".join(enc[i][0]) == "".join(
            w + EOW for w in _RE.findall(text)
        )


def test_encode_unseen_and_empty(spark, docs):
    merges = train_bpe(docs, n_merges=8)
    extra = spark.createDataFrame(
        [(100, "lowest zzz"), (101, ""), (102, None)],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["tokens"] for r in encode_bpe(extra, merges).collect()}
    assert "".join(got[100]) == "lowest" + EOW + "zzz" + EOW
    assert got[101] == [] and got[102] == []


def test_merges_table(spark, docs):
    merges = train_bpe(docs, n_merges=5)
    tbl = merges_table(spark, merges)
    rows = tbl.orderBy("rank").collect()
    assert [(r["left"], r["right"], r["freq"]) for r in rows] == merges
    assert [r["rank"] for r in rows] == list(range(len(merges)))


def test_save_load_bpe_roundtrip(spark, tmp_path):
    from neosemantics_spark.operators.bpe import (
        EOW,
        encode_bpe,
        load_bpe,
        save_bpe,
        train_bpe,
        vocab_table,
    )

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "low low new newer")], ["doc_id", "text"]
    )
    merges = train_bpe(docs, n_merges=6, min_freq=1)
    root = str(tmp_path / "tok")
    save_bpe(spark, merges, root)
    loaded = load_bpe(spark, root)
    assert loaded == merges
    # encoding through the loaded tokenizer is identical
    a = {r["doc_id"]: r["tokens"] for r in encode_bpe(docs, merges).collect()}
    b = {r["doc_id"]: r["tokens"] for r in encode_bpe(docs, loaded).collect()}
    assert a == b
    # vocab: base chars + EOW first (lexicographic), merges after
    vocab = vocab_table(spark, merges, docs=docs).collect()
    toks = [r["token"] for r in sorted(vocab, key=lambda r: r["token_id"])]
    n_base = len(toks) - len(merges)
    assert toks[:n_base] == sorted(set("lowernst") | {EOW})
    assert toks[n_base:] == [m[0] + m[1] for m in merges]
    # ids are dense from 0
    assert sorted(r["token_id"] for r in vocab) == list(range(len(vocab)))


def test_load_bpe_refuses_mismatched_pretokenizer(spark, tmp_path):
    import json
    import os

    import pytest

    from neosemantics_spark.operators.bpe import load_bpe, save_bpe

    root = str(tmp_path / "tok2")
    save_bpe(spark, [("a", "b", 3)], root)
    meta = json.load(open(os.path.join(root, "meta.json")))
    meta["pretoken_pattern"] = "[a-z]+"
    json.dump(meta, open(os.path.join(root, "meta.json"), "w"))
    with pytest.raises(ValueError, match="pretokenizer"):
        load_bpe(spark, root)


def test_save_bpe_refuses_remote_scheme(spark):
    import pytest

    from neosemantics_spark.operators.bpe import save_bpe

    with pytest.raises(ValueError, match="scheme"):
        save_bpe(spark, [("a", "b", 3)], "s3a://bucket/tok")
