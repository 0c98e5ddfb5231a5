"""Bigram-LM quality scoring (operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from neosemantics_spark.operators import lm


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (2, "the cat ate the fish"),
        (4, "one-word"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_doc_bigrams_guard_and_pairs(corpus):
    bg = lm._doc_bigrams(corpus, "doc_id", "text")
    # doc 4 normalizes to ['one', 'word'] → exactly one bigram
    assert [(r["w1"], r["w2"]) for r in bg.filter("id = 4").collect()] == [("one", "word")]
    assert bg.filter("id = 0").count() == 5


def test_train_counts(corpus):
    model = lm.train_bigram_lm(corpus)
    c2 = {(r["w1"], r["w2"]): r["c2"] for r in model.bigrams.collect()}
    assert c2[("the", "cat")] == 2 and c2[("cat", "sat")] == 1
    c1 = {r["w1"]: r["c1"] for r in model.unigrams.collect()}
    assert c1["the"] == 4 and c1["cat"] == 2
    assert model.vocab_size == len(c1)


def test_lm_score_formula_and_ordering(spark, corpus):
    model = lm.train_bigram_lm(corpus)
    scored_docs = spark.createDataFrame(
        [(1, "the cat sat"), (3, "zebra quark flux")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in lm.lm_score(scored_docs, model).collect()}
    # in-domain text scores far above fully-OOV text
    assert out[1]["avg_logp"] > out[3]["avg_logp"]
    assert out[1]["n_bigrams"] == 2 and out[3]["n_bigrams"] == 2
    # manual check: P(cat|the) = (2+0.1)/(4+0.1*V), P(sat|cat) = (1+0.1)/(2+0.1*V)
    v = model.vocab_size
    expect = (
        math.log(2.1 / (4 + 0.1 * v)) + math.log(1.1 / (2 + 0.1 * v))
    ) / 2
    assert out[1]["avg_logp"] == pytest.approx(
        math.floor(expect * 10000 + 0.5) / 10000, abs=1e-9
    )
    # fully-OOV bigrams: c2 = c1 = 0 → ln(0.1 / (0.1 * V))
    oov = math.log(0.1 / (0.1 * v))
    assert out[3]["avg_logp"] == pytest.approx(
        math.floor(oov * 10000 + 0.5) / 10000, abs=1e-9
    )


def test_trigram_interpolated_matches_manual(spark, corpus):
    """Hand-check one scored trigram against the Jelinek-Mercer formula."""
    model = lm.train_trigram_lm(corpus)
    # corpus tokens: doc0 = the cat sat on the mat, doc2 = the cat ate
    # the fish, doc4 = one word → V distinct, T total
    assert model.vocab_size == 9 and model.total_tokens == 13
    c3 = {(r["w1"], r["w2"], r["w3"]): r["c3"] for r in model.trigrams.collect()}
    assert c3[("the", "cat", "sat")] == 1 and c3[("the", "cat", "ate")] == 1

    probe = spark.createDataFrame([(100, "the cat sat")], ["doc_id", "text"])
    out = lm.lm_score_trigram(probe, model).collect()[0]
    assert out["n_trigrams"] == 1
    # p3 = c(the cat sat)/c(the cat) = 1/2; p2 = c(cat sat)/c(cat) = 1/2;
    # p1 = (c(sat)+.1)/(T+.1*V)
    p3, p2 = 1 / 2, 1 / 2
    p1 = (1 + 0.1) / (13 + 0.1 * 9)
    want = math.floor(math.log(0.6 * p3 + 0.3 * p2 + 0.1 * p1) * 10000 + 0.5) / 10000
    assert out["avg_logp"] == pytest.approx(want, abs=1e-9)


def test_trigram_oov_scores_low_but_finite(spark, corpus):
    model = lm.train_trigram_lm(corpus)
    gib = spark.createDataFrame([(7, "zxq wvut plonk")], ["doc_id", "text"])
    row = lm.lm_score_trigram(gib, model).collect()[0]
    # all components 0 except the unigram floor: ln(0.1 * 0.1/(T+0.1V))
    want = math.log(0.1 * 0.1 / (13 + 0.1 * 9))
    assert row["avg_logp"] == pytest.approx(want, abs=1e-3)
    # short docs emit no trigrams at all
    assert lm.lm_score_trigram(
        spark.createDataFrame([(8, "two words")], ["doc_id", "text"]), model
    ).count() == 0


def test_kn_matches_manual(spark, corpus):
    """Hand-check one trigram against the interpolated Kneser-Ney
    formula (D=0.75, add-α continuation floor)."""
    model = lm.train_trigram_lm(corpus)
    stats = lm.kn_stats(model)
    # corpus: doc0 = the cat sat on the mat, doc2 = the cat ate the fish
    probe = spark.createDataFrame([(100, "the cat sat")], ["doc_id", "text"])
    out = lm.lm_score_kn(probe, model, stats).collect()[0]
    assert out["n_trigrams"] == 1
    D, a = 0.75, 0.1
    V = model.vocab_size            # 9
    B = stats.n_bigram_types        # distinct bigram types
    # continuation unigram for 'sat': N1+(• sat) = 1 ('cat sat' only)
    pc = (1 + a) / (B + a * V)
    # level 2 (w2='cat', w3='sat'): N1+(• cat sat)=1, N1+(• cat •)=2
    # ('the cat sat', 'the cat ate'), N1+(cat •)=2 ('cat sat','cat ate')
    p2 = max(1 - D, 0) / 2 + D * 2 / 2 * pc
    # level 3: c(the cat sat)=1, c(the cat)=2, N1+(the cat •)=2
    p3 = max(1 - D, 0) / 2 + D * 2 / 2 * p2
    want = math.floor(math.log(p3) * 10000 + 0.5) / 10000
    assert out["avg_logp"] == pytest.approx(want, abs=1e-9)


def test_kn_oov_and_ordering(spark, corpus):
    model = lm.train_trigram_lm(corpus)
    stats = lm.kn_stats(model)
    seen = spark.createDataFrame([(1, "the cat sat on the mat")], ["doc_id", "text"])
    gib = spark.createDataFrame([(2, "zxq wvut plonk blarg fnord")], ["doc_id", "text"])
    s = lm.lm_score_kn(seen, model, stats).collect()[0]["avg_logp"]
    g = lm.lm_score_kn(gib, model, stats).collect()[0]["avg_logp"]
    assert s > g  # in-distribution text outscores gibberish
    assert math.isfinite(g)  # α floor keeps OOV finite
    # unseen middle word w2 backs off to the continuation floor:
    # p2 = pc, p3 = p2 (both contexts unseen) — still finite
    part = spark.createDataFrame([(3, "the zzz cat")], ["doc_id", "text"])
    assert math.isfinite(lm.lm_score_kn(part, model, stats).collect()[0]["avg_logp"])


def _kn5_reference(train_texts, probe_tokens, alpha=0.1):
    """Pure-Python replay of train_kn5_lm + lm_score_kn5 for one probe
    5-gram list — independent dict-based implementation of the same
    modified-KN definition, used to pin the Spark join program."""
    import collections
    import re

    def toks(t):
        return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]

    def ngrams(ts, n):
        out = collections.Counter()
        for t in ts:
            tk = toks(t)
            for i in range(len(tk) - n + 1):
                out[tuple(tk[i : i + n])] += 1
        return out

    t5 = ngrams(train_texts, 5)
    c4r = ngrams(train_texts, 4)
    t3 = ngrams(train_texts, 3)
    t2 = ngrams(train_texts, 2)
    vocab = set()
    for t in train_texts:
        vocab.update(toks(t))

    def conts(types):  # c'(suffix) = #distinct first words
        out = collections.Counter()
        for g in types:
            out[g[1:]] += 1
        return out

    c4p, c3p, c2p, c1p = conts(t5), conts(c4r), conts(t3), conts(t2)

    def discounts(counts):
        cc = collections.Counter(counts.values())
        n1, n2, n3, n4 = (float(cc.get(i, 0)) for i in (1, 2, 3, 4))
        if min(n1, n2, n3, n4) <= 0:
            return (0.75, 0.75, 0.75)
        y = n1 / (n1 + 2 * n2)
        return (
            max(1 - 2 * y * n2 / n1, 0.05),
            max(2 - 3 * y * n3 / n2, 0.05),
            max(3 - 4 * y * n4 / n3, 0.05),
        )

    ds = {5: discounts(t5), 4: discounts(c4p), 3: discounts(c3p), 2: discounts(c2p)}
    nb = float(sum(c1p.values()))

    def buckets(counts, ctx_len):
        out = collections.defaultdict(lambda: [0.0, 0.0, 0.0])
        for g, c in counts.items():
            b = out[g[:ctx_len]]
            if c == 1:
                b[0] += 1
            elif c == 2:
                b[1] += 1
            else:
                b[2] += 1
        return out

    g5b = buckets(t5, 4)
    d4b, d3b, d2b = buckets(c4p, 3), buckets(c3p, 2), buckets(c2p, 1)
    dens = {
        4: collections.Counter(),
        3: collections.Counter(),
        2: collections.Counter(),
    }
    for g, c in c4p.items():
        dens[4][g[:3]] += c
    for g, c in c3p.items():
        dens[3][g[:2]] += c
    for g, c in c2p.items():
        dens[2][g[:1]] += c

    def level(c, den, bkt, d, lower):
        n1, n2, n3p = bkt
        if den <= 0 or (n1 + n2 + n3p) <= 0:
            return lower
        disc = d[2] if c >= 3 else (d[1] if c == 2 else d[0])
        gamma = d[0] * n1 + d[1] * n2 + d[2] * n3p
        return max(c - disc, 0.0) / den + gamma / den * lower

    g = tuple(probe_tokens)
    p = (c1p.get(g[4:], 0) + alpha) / (nb + alpha * len(vocab))
    p = level(c2p.get(g[3:], 0), dens[2].get(g[3:4], 0), d2b.get(g[3:4], [0, 0, 0]), ds[2], p)
    p = level(c3p.get(g[2:], 0), dens[3].get(g[2:4], 0), d3b.get(g[2:4], [0, 0, 0]), ds[3], p)
    p = level(c4p.get(g[1:], 0), dens[4].get(g[1:4], 0), d4b.get(g[1:4], [0, 0, 0]), ds[4], p)
    p = level(
        t5.get(g, 0), c4r.get(g[:4], 0),
        g5b.get(g[:4], [0, 0, 0]), ds[5], p,
    )
    return p


def test_kn5_matches_python_reference(spark):
    """lm_score_kn5's ten-table join program must agree with an
    independent dict-based modified-KN implementation on every scored
    5-gram shape: seen, partially-seen, doc-final-context, fully OOV."""
    train = [
        "the cat sat on the mat by the door near the cat sat on a rug",
        "the cat sat on the rug in the hall and the dog lay on the mat",
        "a dog ran through the field and the cat sat on the mat again",
        "one two three four five six seven one two three four five",
    ]
    corpus = spark.createDataFrame(
        [(i * 2, t) for i, t in enumerate(train)], ["doc_id", "text"]
    )
    model = lm.train_kn5_lm(corpus)
    probes = [
        (1, "the cat sat on the"),      # fully seen
        (3, "by the door near zzz"),    # OOV last word
        (5, "zzz qqq www eee rrr"),     # fully OOV
        (7, "five six seven one two"),  # seen via second doc
        (9, "a rug the cat sat"),       # doc-final 4-gram context
    ]
    scored = {
        r["doc_id"]: r
        for r in lm.lm_score_kn5(
            spark.createDataFrame(probes, ["doc_id", "text"]), model
        ).collect()
    }
    for pid, text in probes:
        want_p = _kn5_reference(train, text.split())
        want = math.floor(math.log(want_p) * 10000 + 0.5) / 10000
        got = scored[pid]["avg_logp"]
        assert scored[pid]["n_5grams"] == 1
        assert got is not None and math.isfinite(got), (pid, text)
        assert got == pytest.approx(want, abs=1e-9), (pid, text, got, want)


def test_kn5_ordering_and_guards(spark):
    train = [
        (0, "the cat sat on the mat by the door and the dog lay near the rug"),
        (2, "a cat ran over the mat and sat on the rug by the door again"),
    ]
    corpus = spark.createDataFrame(train, ["doc_id", "text"])
    model = lm.train_kn5_lm(corpus)
    seen = spark.createDataFrame([(1, "the cat sat on the mat")], ["doc_id", "text"])
    gib = spark.createDataFrame([(3, "zxq wvut plonk blarg fnord grot")], ["doc_id", "text"])
    s = lm.lm_score_kn5(seen, model).collect()[0]["avg_logp"]
    g = lm.lm_score_kn5(gib, model).collect()[0]["avg_logp"]
    assert s > g and math.isfinite(g)
    # short docs emit no 5-grams
    assert lm.lm_score_kn5(
        spark.createDataFrame([(5, "one two three four")], ["doc_id", "text"]), model
    ).count() == 0


def test_kn_doc_final_bigram_context_backs_off(spark, corpus):
    """A context bigram seen ONLY document-finally has c(w1w2)>0 but
    N1+(w1w2•)=0; with c3=0 the top level must back off to p2 instead of
    yielding probability 0 → ln NULL (ADVICE r5, lm.py p3 guard).
    'the mat' ends doc 0, so ('the','mat') is in the bigram table with
    no trigram continuation."""
    model = lm.train_trigram_lm(corpus)
    stats = lm.kn_stats(model)
    ctx = {(r["w1"], r["w2"]): r["c2"] for r in model.bigrams.collect()}
    assert ctx[("the", "mat")] == 1  # the context exists in training
    n3t = {(r["w1"], r["w2"]): r["n3t"] for r in stats.ctx_types.collect()}
    assert ("the", "mat") not in n3t  # ...but has zero continuations
    probe = spark.createDataFrame([(9, "the mat zzz")], ["doc_id", "text"])
    row = lm.lm_score_kn(probe, model, stats).collect()[0]
    assert row["n_trigrams"] == 1
    assert row["avg_logp"] is not None and math.isfinite(row["avg_logp"])
    # p3 == p2 == pc here (no middle-'mat' trigrams either): the add-α
    # continuation floor for OOV w3='zzz'
    D, a = 0.75, 0.1
    pc = (0 + a) / (stats.n_bigram_types + a * model.vocab_size)
    want = math.floor(math.log(pc) * 10000 + 0.5) / 10000
    assert row["avg_logp"] == pytest.approx(want, abs=1e-9)


def test_kn5_derived_lower_order_tables_match_direct_explosion(spark):
    """r7 optimization: train_kn5_lm derives the 4/3/2-gram raw tables
    from the 5-gram table + per-doc tails instead of re-exploding the
    corpus. Pin equality against the direct formulation on a corpus of
    awkward lengths (0..6 tokens — doc-final tails, below-order docs,
    an empty doc)."""
    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "alpha"),
            (2, "alpha beta"),
            (3, "beta gamma alpha"),
            (4, "a b c d"),
            (5, "a b c d e"),
            (6, "a b c d e a b"),
            (7, "x x x x x x"),
        ],
        ["doc_id", "text"],
    )
    model = lm.train_kn5_lm(docs)
    c4r_direct = (
        lm._doc_ngrams(docs, 4, "doc_id", "text")
        .groupBy("w1", "w2", "w3", "w4")
        .agg(F.count("*").alias("c"))
    )
    assert sorted(map(tuple, model.c4r.collect())) == sorted(
        map(tuple, c4r_direct.collect())
    )
    c3_direct = (
        lm._doc_ngrams(docs, 3, "doc_id", "text")
        .groupBy("w1", "w2", "w3").agg(F.count("*").alias("c"))
        .select("w1", "w2", "w3")
    )
    c2_direct = (
        lm._doc_bigrams(docs, "doc_id", "text")
        .groupBy("w1", "w2").agg(F.count("*").alias("c")).select("w1", "w2")
    )
    c2p_direct = sorted(
        (r["w4"], r["w5"], r["cc"])
        for r in c3_direct.groupBy("w2", "w3").agg(F.count("*").alias("cc"))
        .select(F.col("w2").alias("w4"), F.col("w3").alias("w5"), "cc").collect()
    )
    assert sorted(map(tuple, model.c2p.collect())) == c2p_direct
    c1p_direct = sorted(
        (r["w5"], r["cc"])
        for r in c2_direct.groupBy("w2").agg(F.count("*").alias("cc"))
        .select(F.col("w2").alias("w5"), "cc").collect()
    )
    assert sorted(map(tuple, model.c1p.collect())) == c1p_direct
    uni_direct = (
        docs.select(F.explode(lm.norm_tokens(F.col("text"))).alias("w"))
        .distinct().count()
    )
    assert model.vocab_size == uni_direct
