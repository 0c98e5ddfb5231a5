"""Training-data pipeline operators: dedup, similarity, text, multimodal,
scalar functions, inference."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neosemantics_spark.operators import dedup, inference, similarity, text
from neosemantics_spark.operators.multimodal import (
    extract_features,
    media_stats,
    synthetic_media,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    groups = dedup.exact_dup_groups(docs).toPandas()
    kept = dedup.dedup_exact(docs)
    total = docs.count()
    dup_extra = int((groups["cnt"] - 1).sum()) if len(groups) else 0
    assert kept.count() == total - dup_extra
    # representative is the min doc_id of its group
    if len(groups):
        g = groups.iloc[0]
        same = docs.join(
            docs.select(F.col("doc_id").alias("k"), F.md5("text").alias("h")).filter(
                F.col("h") == g["text_hash"]
            ),
            F.md5(docs.text) == F.col("h"),
        )
        assert kept.join(same.select(F.col("k").alias("doc_id")), "doc_id", "left_semi").count() == 1


def test_minhash_lsh_finds_dups(spark, docs):
    # plant exact + near duplicates (one word changed) of the first docs
    base = docs.limit(10)
    exact = base.select((F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars")
    near = base.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extraword")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(exact).unionByName(near)
    cands = dedup.minhash_lsh_candidates(corpus, num_hashes=8, bands=4).toPandas()
    pairs = {(a, b) for a, b in zip(cands.a, cands.b)}
    # identical texts share every band → always candidates
    for i in range(10):
        assert (i, i + 100000) in pairs
    # near-dups (tail shingle change) collide on at least one band
    near_hits = sum((i, i + 200000) in pairs for i in range(10))
    assert near_hits >= 7


def test_ngram_jaccard(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs.limit(80), threshold=0.999)
    pdf = pairs.toPandas()
    # jaccard 1.0 pairs are exactly the exact-duplicate pairs in the slice
    sub = docs.limit(80).toPandas()
    texts = sub.groupby("text").doc_id.apply(sorted)
    expected = set()
    for ids in texts:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                expected.add((ids[i], ids[j]))
    got = {(a, b) for a, b in zip(pdf.a, pdf.b) if round(1 - 0, 4)}
    assert expected <= got


def test_simhash_similarity(spark, docs):
    s = dedup.simhash(docs.limit(50)).toPandas()
    assert set(s.simhash.str.len()) == {32}
    # identical docs → identical simhash
    d = docs.limit(50).toPandas().merge(s, on="doc_id")
    for _, grp in d.groupby("text"):
        assert grp.simhash.nunique() == 1


def test_brute_force_topk(spark, emb):
    res = similarity.brute_force_topk(emb, [0, 1, 2], k=5).toPandas()
    assert sorted(res.query_id.unique()) == [0, 1, 2]
    assert all(res.groupby("query_id").size() == 5)
    # ranks ordered by score desc
    for _, g in res.groupby("query_id"):
        scores = list(g.sort_values("rank").score)
        assert scores == sorted(scores, reverse=True)


def test_lsh_topk_overlaps_brute_force(spark, emb):
    bf = similarity.brute_force_topk(emb, [0], k=50).toPandas()
    ap = similarity.lsh_topk(emb, [0], k=10, nbits=2).toPandas()
    # approximate neighbors come from the query's bucket; with a 2-bit
    # bucket (~1/4 of corpus) the ap top-10 must intersect the true top-50
    assert len(ap) > 0
    assert len(set(ap.neighbor_id) & set(bf.neighbor_id)) >= 1
    # ap scores can never exceed the true best
    assert ap.score.max() <= bf.score.max() + 1e-9


def test_language_id(spark, docs):
    out = text.language_id(docs).toPandas()
    assert set(out.columns) == {"doc_id", "pred_lang", "score"}
    assert out.pred_lang.isin(["en", "es", "fr", "de", "und"]).all()
    assert len(out) == docs.count()


def test_quality_and_tokens(spark, docs):
    q = text.quality_features(docs.limit(20)).toPandas()
    assert ((q.quality_score >= 0) & (q.quality_score <= 1)).all()
    t = text.token_counts(docs.limit(20)).toPandas()
    assert (t.ws_tokens > 0).all() and (t.bpe_ish_tokens >= t.ws_tokens).all()


def test_fingerprints(spark, docs):
    fp = text.fingerprints(docs.limit(30)).toPandas()
    d = docs.limit(30).toPandas().merge(fp, on="doc_id")
    for _, grp in d.groupby("text"):
        assert grp.exact_fp.nunique() == 1 and grp.shingle_fp.nunique() == 1
    assert set(fp.shingle_fp.str.len()) == {128}


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 32)
    feats = extract_features(media)
    pdf = feats.toPandas()
    assert len(pdf) == 32
    assert all(len(f) == 8 for f in pdf.features)
    # deterministic: same payload → same features
    pdf2 = extract_features(synthetic_media(spark, 32)).toPandas()
    assert list(pdf.sort_values("media_id").payload_sha) == list(
        pdf2.sort_values("media_id").payload_sha
    )
    stats = media_stats(media).toPandas()
    assert sorted(stats.kind) == ["audio", "image", "video"]


def test_scalar_functions(spark):
    from neosemantics_spark.functions import (
        get_datatype,
        get_iri_local_name,
        get_iri_namespace,
        get_lang_tag,
        get_value,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "v": [
                    "http://example.org/voc#name",
                    "3.14^^http://www.w3.org/2001/XMLSchema#decimal",
                    "320^^ns1__horsepower",
                    "hola@es",
                    "plain",
                ]
            }
        )
    )
    out = df.select(
        get_iri_local_name(F.col("v")).alias("local"),
        get_iri_namespace(F.col("v")).alias("ns"),
        get_value(F.col("v")).alias("val"),
        get_datatype(F.col("v")).alias("dt"),
        get_lang_tag(F.col("v")).alias("tag"),
    ).collect()
    assert out[0]["local"] == "name" and out[0]["ns"] == "http://example.org/voc#"
    assert out[1]["val"] == "3.14" and out[1]["dt"].endswith("decimal")
    assert out[2]["val"] == "320" and out[2]["dt"] == "ns1__horsepower"
    assert out[3]["val"] == "hola" and out[3]["tag"] == "es"
    assert out[4]["val"] == "plain" and out[4]["dt"].endswith("string")


def test_inference_closure(spark):
    edges = spark.createDataFrame(
        pd.DataFrame(
            [
                {"src": "Cat", "rel": "SCO", "dst": "Mammal"},
                {"src": "Mammal", "rel": "SCO", "dst": "Animal"},
                {"src": "Dog", "rel": "SCO", "dst": "Mammal"},
            ]
        )
    )
    clo = inference.transitive_closure(edges).toPandas()
    anc = set(clo[clo.descendant == "Cat"].ancestor)
    assert anc == {"Cat", "Mammal", "Animal"}
    nodes = spark.createDataFrame(
        pd.DataFrame(
            [
                {"uri": "u1", "labels": ["Cat"]},
                {"uri": "u2", "labels": ["Animal"]},
                {"uri": "u3", "labels": ["Robot"]},
            ]
        )
    )
    got = inference.nodes_labelled_with_inference(
        nodes, inference.transitive_closure(edges), "Animal"
    ).toPandas()
    assert sorted(got.uri) == ["u1", "u2"]
