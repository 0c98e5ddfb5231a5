"""Embedding min-max int-n quantization (operators/embed.py)."""

import pytest

from neosemantics_spark.operators.embed import (
    dimension_stats,
    quantization_error,
    quantize_embeddings,
)


@pytest.fixture()
def emb(spark):
    rows = [
        (1, [0.0, 10.0, 5.0]),
        (2, [1.0, 20.0, 5.0]),
        (3, [2.0, 15.0, 5.0]),
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<float>")


def test_dimension_stats(emb):
    got = {r["pos"]: (r["dmin"], r["dmax"]) for r in dimension_stats(emb).collect()}
    assert got == {0: (0.0, 2.0), 1: (10.0, 20.0), 2: (5.0, 5.0)}


def test_quantize_basic(emb):
    got = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(emb, bits=8).collect()}
    # dim0: range [0,2] -> 0, 128 (0.5*255 rounded up), 255
    # dim1: range [10,20] -> 0, 255, 128 ; dim2 degenerate -> 0
    assert got[1] == [0, 0, 0]
    assert got[2] == [128, 255, 0]
    assert got[3] == [255, 128, 0]


def test_quantize_bits_and_frozen_stats(spark, emb):
    got = {r["vec_id"]: r["qvec"] for r in quantize_embeddings(emb, bits=1).collect()}
    assert got == {1: [0, 0, 0], 2: [1, 1, 0], 3: [1, 1, 0]}
    # frozen stats from a narrower "training" batch: out-of-range clamps
    train = emb.filter("vec_id < 3")
    stats = dimension_stats(train)
    q = {
        r["vec_id"]: r["qvec"]
        for r in quantize_embeddings(emb, bits=8, stats=stats).collect()
    }
    assert q[3][0] == 255  # 2.0 beyond training max 1.0 -> clamped
    with pytest.raises(ValueError, match="bits"):
        quantize_embeddings(emb, bits=0)


def test_quantization_error_bound(emb):
    errs = {r["vec_id"]: r["max_err"] for r in quantization_error(emb, bits=8).collect()}
    # bound: half a quantization step = range/(2*255); widest range is 10
    assert all(e <= 10.0 / (2 * 255) + 1e-9 for e in errs.values())
    # 1-bit: dim1 of vec 3 (15 in [10,20]) dequantizes to 10 or 20 -> err 5
    errs1 = {r["vec_id"]: r["max_err"] for r in quantization_error(emb, bits=1).collect()}
    assert errs1[3] == 5.0


def test_quantize_frozen_stats_width_mismatch_fails_loudly(spark):
    """ADVICE r6: a batch whose vector width disagrees with a persisted
    quantizer must raise, not silently emit null codes."""
    import pytest
    from py4j.protocol import Py4JJavaError

    train = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0]), (2, [1.0, 2.0, 3.0])], ["vec_id", "embedding"]
    )
    stats = dimension_stats(train)
    wide = spark.createDataFrame([(3, [0.0, 1.0, 2.0, 3.0])], ["vec_id", "embedding"])
    with pytest.raises((Py4JJavaError, Exception), match="quantizer width"):
        quantize_embeddings(wide, bits=8, stats=stats).collect()
    # matching width through the same frozen path still works
    ok = quantize_embeddings(train, bits=8, stats=stats)
    assert ok.count() == 2
