"""Dataset-curation ops (operators/datasets.py) + multi-probe LSH."""

import pytest
from pyspark.sql import functions as F

from neosemantics_spark.operators import datasets as ds
from neosemantics_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the sleepy cat", "en"),
        (2, "completely different words here nothing shared at all", "en"),
        (3, "der schnelle braune fuchs springt gern", "de"),
        (4, "Short doc", "en"),
        (5, "the quick brown fox naps", "en"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_shingle_set_short_doc_guard(docs):
    sh = ds.shingle_set(docs, n=4)
    # doc 4 has 2 tokens < n → contributes nothing (and must NOT trip
    # Spark's descending sequence(0, negative))
    assert sh.filter(F.col("id") == 4).count() == 0
    # doc 0 has 9 tokens → 6 windows, all distinct
    assert sh.filter(F.col("id") == 0).count() == 6


def test_shingle_set_normalizes(spark):
    df = spark.createDataFrame([(0, "Foo, BAR!  baz-qux one"), (1, "foo bar baz qux one")],
                               ["doc_id", "text"])
    a = {r["shingle"] for r in ds.shingle_set(df, n=4).filter("id = 0").collect()}
    b = {r["shingle"] for r in ds.shingle_set(df, n=4).filter("id = 1").collect()}
    assert a == b == {"foo bar baz qux", "bar baz qux one"}


def test_decontaminate(docs):
    train = docs.filter(F.col("doc_id") != 0)
    bench = docs.filter(F.col("doc_id") == 0)
    out = {r["doc_id"]: r["shared_shingles"] for r in ds.decontaminate(train, bench, n=4).collect()}
    # doc 1 shares 'the quick brown fox' + 'quick brown fox jumps' +
    # 'fox jumps over the'... count the exact overlap
    assert 1 in out and out[1] >= 3
    assert 2 not in out and 3 not in out and 4 not in out
    # doc 5: 'the quick brown fox' only
    assert out.get(5) == 1


def test_hash_split_deterministic_partition(spark):
    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = ds.hash_split(df)
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    n = sum(counts.values())
    assert n == 2000
    assert abs(counts["train"] / n - 0.9) < 0.03
    # deterministic: second evaluation identical
    b = ds.hash_split(df)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_split_thresholds_cumulative():
    cuts = ds.split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    # final cutoff is the 'ffffg' sentinel: every 4-hex-digit prefix
    # compares lexicographically below it (the documented contract)
    assert cuts == [("train", "e666"), ("val", "f333"), ("test", "ffffg")]
    assert all(f"{p:04x}" < "ffffg" for p in (0, 0xFFFF))


def test_stratified_sample_full_fraction_keeps_all(spark):
    # fraction >= 1.0 must keep the ENTIRE stratum (regression: the 1.0
    # cutoff formatted to 5 hex digits and lexicographic comparison kept
    # only ~6% — prefixes starting with '0')
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    assert ds.stratified_sample(df, {"en": 1.0}).count() == 1000
    # fraction 0.0 drops the stratum entirely
    assert ds.stratified_sample(df, {"en": 0.0}).count() == 0
    # default_fraction=1.0 keeps all unlisted strata
    mixed = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    out = ds.stratified_sample(mixed, {"en": 0.0}, default_fraction=1.0)
    assert out.count() == 500 and out.filter("lang = 'de'").count() == 500


def test_stratified_sample_rates_and_decorrelation(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de")
         .otherwise("zh").alias("lang"),
    )
    out = ds.stratified_sample(df, {"en": 0.5, "de": 0.2}, default_fraction=0.05)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 1000 - 0.5) < 0.06
    assert abs(counts["de"] / 1000 - 0.2) < 0.05
    assert counts.get("zh", 0) / 1000 < 0.1
    # hash keyed on (stratum, id): the SAME ids sampled under a different
    # stratum label give a different (decorrelated) subset
    ids = df.filter("doc_id % 3 = 0").select("doc_id")
    s1 = {r["doc_id"] for r in
          ds.stratified_sample(ids.withColumn("lang", F.lit("en")), {"en": 0.5}).collect()}
    s2 = {r["doc_id"] for r in
          ds.stratified_sample(ids.withColumn("lang", F.lit("de")), {"de": 0.5}).collect()}
    assert s1 and s2 and s1 != s2


def test_probe_buckets_expansion(spark):
    df = spark.createDataFrame([("1010",)], ["b"])
    got = df.select(sim._probe_buckets(F.col("b"), 4, 1).alias("p")).collect()[0]["p"]
    assert got == ["1010", "0010", "1110", "1000", "1011"]
    got2 = df.select(sim._probe_buckets(F.col("b"), 4, 2).alias("p")).collect()[0]["p"]
    assert len(got2) == 1 + 4 + 6 and len(set(got2)) == 11


def test_lsh_topk_multiprobe_superset(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = list(range(4))
    # k larger than the corpus so rank truncation can't hide candidates:
    # probing only ADDS buckets, so base candidates ⊆ probed candidates
    base = sim.lsh_topk(emb, qids, k=10**6, nbits=6, bands=2, probe_bits=0)
    probed = sim.lsh_topk(emb, qids, k=10**6, nbits=6, bands=2, probe_bits=1)
    b = {(r["query_id"], r["neighbor_id"]) for r in base.collect()}
    p = {(r["query_id"], r["neighbor_id"]) for r in probed.collect()}
    assert b and b <= p


def test_ivf_multi_assignment(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a2 = sim.ivf_assign(emb, n_centroids=8, assign_k=2)
    rows = a2.collect()
    n_vecs = emb.count()
    assert len(rows) == 2 * n_vecs
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    a1 = {r["id"]: r for r in sim.ivf_assign(emb, n_centroids=8).collect()}
    for vid, pair in by_id.items():
        pair.sort(key=lambda r: r["assign_rank"])
        # rank 1 equals the single-assignment argmin; rank 2 is a
        # DIFFERENT centroid at >= distance
        assert pair[0]["centroid_id"] == a1[vid]["centroid_id"]
        assert pair[1]["centroid_id"] != pair[0]["centroid_id"]
        assert pair[1]["dist"] >= pair[0]["dist"]


def test_ivf_topk_multi_assign_no_duplicates_and_superset(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = list(range(4))
    base = sim.ivf_topk(emb, qids, k=10**6, n_centroids=8, n_probe=2)
    multi = sim.ivf_topk(emb, qids, k=10**6, n_centroids=8, n_probe=2, assign_k=2)
    mrows = multi.collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in mrows]
    assert len(pairs) == len(set(pairs))  # deduped despite replication
    b = {(r["query_id"], r["neighbor_id"]) for r in base.collect()}
    # replication only ADDS reachable candidates
    assert b <= set(pairs)


def test_token_budget_sample(spark):
    # 40 docs x 10 tokens per lang stratum -> 400 tokens each
    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.lit("ten little words pad pad pad pad pad pad pad").alias("text"),
    )
    # en capped at half its tokens, de uncapped, no budget -> dropped
    out = ds.token_budget_sample(docs, {"en": 200, "de": 100_000})
    n = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert n["de"] == 40  # budget >= total keeps the whole stratum
    assert 10 <= n.get("en", 0) <= 30  # ~half in expectation
    # deterministic across evaluations
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in ds.token_budget_sample(docs, {"en": 200, "de": 100_000}).collect()}
    assert a == b
    # zero/absent budgets drop strata entirely
    assert ds.token_budget_sample(docs, {"en": 0}).count() == 0


def test_token_budget_unrepresentable_budget_not_dropped(spark):
    """budget/total below 16^-digits used to floor the cutoff to 0 and
    silently drop the whole stratum despite a positive budget; the
    cutoff now clamps to one prefix slot. doc_id 16843 has
    md5('en:16843') prefix '0000' (precomputed), so the one-slot cutoff
    '0001' keeps exactly that doc here."""
    wide = "word " * 700  # 700 tokens/doc
    rows = [(16843, "en", wide)] + [(i, "en", wide) for i in range(99)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    # total = 70_000 tokens; budget 1 -> 1/70000*65536 < 1 -> clamped slot
    out = {r["doc_id"] for r in ds.token_budget_sample(docs, {"en": 1}).collect()}
    assert out == {16843}


def test_ngram_containment(spark):
    from neosemantics_spark.operators import dedup

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    docs = spark.createDataFrame(
        [
            (0, big),
            (1, "alpha beta gamma delta epsilon zeta"),  # prefix: contained
            (2, "totally unrelated words about other things entirely here"),
        ],
        ["doc_id", "text"],
    )
    rows = {(r["a"], r["b"]): (r["cont_a"], r["cont_b"])
            for r in dedup.ngram_containment_pairs(docs, threshold=0.9).collect()}
    assert (0, 1) in rows
    ca, cb = rows[(0, 1)]
    # doc 1's 4 shingles are all inside doc 0's 10 -> cont_b = 1.0,
    # cont_a = 4/10 (Jaccard would be 0.4: below any dedup threshold)
    assert cb == 1.0 and abs(ca - 0.4) < 1e-9
    assert not any(2 in p for p in rows)
    # candidate-driven path agrees with the posting path
    cand = spark.createDataFrame([(0, 1)], ["a", "b"])
    got = dedup.ngram_containment_pairs(docs, threshold=0.9, candidates=cand).collect()
    assert [(r["a"], r["b"], r["cont_a"], r["cont_b"]) for r in got] == [(0, 1, ca, cb)]


def test_temperature_budgets_formula():
    totals = {"a": 10000, "b": 100}
    # alpha=1: proportional
    b1 = ds.temperature_budgets(totals, 1000, alpha=1.0)
    assert abs(b1["a"] - 1000 * 10000 / 10100) < 1e-9
    # alpha=0: uniform
    b0 = ds.temperature_budgets(totals, 1000, alpha=0.0)
    assert abs(b0["a"] - 500) < 1e-9 and abs(b0["b"] - 500) < 1e-9
    # alpha=0.5: small source upsampled vs proportional
    bh = ds.temperature_budgets(totals, 1000, alpha=0.5)
    assert bh["b"] / (bh["a"] + bh["b"]) > 100 / 10100
    # budgets always sum to the total
    assert abs(sum(bh.values()) - 1000) < 1e-9
    # zero/empty strata dropped
    assert ds.temperature_budgets({"a": 0}, 1000) == {}


def test_temperature_mix(spark):
    rows = [(i, "tok " * (i % 7 + 3), "big" if i % 10 else "small") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = ds.temperature_mix(df, total_budget=300, alpha=0.5, strata_col="source")
    got = out.groupBy("source").count().toPandas().set_index("source")
    # both sources represented (temperature flattens the mix)
    assert set(got.index) == {"big", "small"}
    # deterministic
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in ds.temperature_mix(
            df, total_budget=300, alpha=0.5, strata_col="source"
        )
        .select("doc_id")
        .collect()
    )
    assert a == b
    # budget >= corpus: everything kept
    assert (
        ds.temperature_mix(df, total_budget=10_000_000, alpha=0.5, strata_col="source").count()
        == 200
    )


def test_pack_sequences_layout(spark):
    rows = [(i, "w " * (5 + (i * 7) % 40)) for i in range(100)] + [(100, "   ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ds.pack_sequences(df, seq_tokens=64, n_shards=4).toPandas()
    # zero-token doc excluded
    assert 100 not in set(out.doc_id)
    assert len(out) == 100
    # shard assignment matches the portable md5 hash
    import hashlib

    for r in out.itertuples():
        expect = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16) % 4
        assert r.shard == expect
    # offsets are a contiguous stream per shard: reconstruct and check
    for shard, grp in out.groupby("shard"):
        grp = grp.copy()
        grp["h"] = [
            hashlib.md5(str(d).encode()).hexdigest() for d in grp.doc_id
        ]
        grp = grp.sort_values(["h", "doc_id"])
        pos = 0
        for r in grp.itertuples():
            assert r.seq_id == pos // 64
            assert r.seq_offset == pos % 64
            pos += r.n_tokens
    # every offset is inside a sequence
    assert (out.seq_offset < 64).all() and (out.seq_offset >= 0).all()


def test_pack_sequences_deterministic(spark):
    rows = [(i, "alpha beta gamma " * (1 + i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = ds.pack_sequences(df, seq_tokens=32, n_shards=8).toPandas().sort_values("doc_id")
    b = ds.pack_sequences(df, seq_tokens=32, n_shards=8).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_quality_weighted_sample(spark):
    import hashlib

    rows = [(i, float(i)) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "score"])
    out = ds.quality_weighted_sample(df, "score", lo=100.0, hi=300.0)
    got = {r["doc_id"] for r in out.collect()}
    # exact per-row replay of the predicate
    for i, s in rows:
        p = min(1.0, max(0.0, (s - 100.0) / 200.0))
        pref = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
        assert (i in got) == (pref < p * 65536), i
    # score >= hi always kept, score <= lo never kept (floor 0)
    assert all(i in got for i in range(300, 400))
    assert all(i not in got for i in range(0, 101))
    # floor_frac keeps a base rate even at the bottom
    out2 = ds.quality_weighted_sample(
        df, "score", lo=100.0, hi=300.0, floor_frac=0.5
    )
    low_kept = sum(1 for r in out2.collect() if r["doc_id"] <= 100)
    assert 30 <= low_kept <= 70  # ~50% of the 101 bottom rows
    with pytest.raises(ValueError, match="hi > lo"):
        ds.quality_weighted_sample(df, "score", lo=1.0, hi=1.0)


def test_corpus_profile(spark):
    from neosemantics_spark.operators.datasets import corpus_profile

    rows = [
        (1, "alpha beta", "en", "web"),
        (2, "alpha beta", "en", "web"),     # exact dup of 1
        (3, "gamma delta epsilon", "en", "web"),
        (4, "uno dos", "es", "web"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    got = {(r["lang"], r["source"]): r for r in corpus_profile(df).collect()}
    en = got[("en", "web")]
    assert en["n_docs"] == 3 and en["n_unique"] == 2
    assert en["dup_ratio"] == 0.3333
    assert en["total_tokens"] == 7 and en["avg_tokens"] == 2.3333
    assert en["min_chars"] == 10 and en["max_chars"] == 19
    es = got[("es", "web")]
    assert es["n_docs"] == 1 and es["dup_ratio"] == 0.0
