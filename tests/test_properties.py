"""Property-based tests (hypothesis) for the driver-side deterministic
primitives the oracles lean on: hex cutoffs, split thresholds, term
buckets, query tokenization. Pure Python — no SparkSession, so the
whole module runs in milliseconds and can afford wide input spaces."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from neosemantics_spark.operators.datasets import _hex_cutoff, split_thresholds
from neosemantics_spark.operators.search import term_bucket, tokenize_query


@given(st.integers(min_value=-10, max_value=2 * 16**4), st.integers(min_value=1, max_value=6))
def test_hex_cutoff_order_isomorphism(cut, digits):
    """prefix < cutoff (lexicographic) must equal prefix_value < cut
    (numeric, clamped to [0, space]) for EVERY possible prefix width —
    the contract that makes the same cutoffs work in Spark, DuckDB, and
    plain Python."""
    space = 16**digits
    cutoff = _hex_cutoff(cut, digits)
    clamped = min(max(cut, 0), space)
    # spot-check the full boundary neighborhood + edges instead of all
    # 16^digits prefixes
    probes = {0, space - 1, clamped - 1, clamped, clamped + 1}
    for p in probes:
        if 0 <= p < space:
            assert ((format(p, "x").rjust(digits, "0")) < cutoff) == (p < clamped)


@given(
    st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=8),
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        min_size=1,
        max_size=6,
    ).filter(lambda d: sum(d.values()) > 0)
)
def test_split_thresholds_monotone_and_complete(weights):
    """Cutoffs are monotonically non-decreasing in weight order and the
    final cutoff admits every possible prefix (no row can fall through
    the when-chain into nothing)."""
    cuts = split_thresholds(weights, digits=4)
    assert len(cuts) == len(weights)
    vals = [c for _, c in cuts]
    assert vals == sorted(vals)
    # every 4-hex prefix compares below the last cutoff
    assert "ffff" < vals[-1] and "0000" < vals[-1]


@given(st.text(min_size=0, max_size=40), st.integers(min_value=1, max_value=4096))
def test_term_bucket_range_and_determinism(term, n):
    b = term_bucket(term, n)
    assert 0 <= b < n
    assert b == term_bucket(term, n)
    # definition pinned: md5 prefix mod n — the exact expression the
    # Spark side reproduces with conv(substring(md5(term),1,8),16,10)
    assert b == int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % n


@settings(max_examples=200)
@given(st.text(max_size=60))
def test_tokenize_query_idempotent_and_normalized(q):
    toks = tokenize_query(q)
    # deduped, order-stable, normalized to [a-z0-9]
    assert len(toks) == len(set(toks))
    assert all(t and all(c.islower() or c.isdigit() for c in t) for t in toks)
    # tokenizing the join of the tokens is a fixpoint
    assert tokenize_query(" ".join(toks)) == toks
