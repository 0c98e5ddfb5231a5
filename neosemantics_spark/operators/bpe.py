"""Distributed byte-pair-encoding tokenizer training and encoding — the
corpus-scale tokenizer job a training-data pipeline runs before anything
else (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units").

Scale shape. The classic formulation trains on the WORD HISTOGRAM, not
the corpus: the only corpus-sized stage is the initial word count (one
regexp-extract + explode + map-side-combined groupBy — the same profile
as `text.token_counts`, linear in the 100 TB input). The merge loop then
runs over the distinct-word table, which is orders of magnitude smaller
but still far too large to collect at web scale — so it stays a
DataFrame throughout: each merge round is

  1. one pair-count aggregation (explode adjacent symbol pairs weighted
     by word freq, map-side-combined sum),
  2. a single-row argmax reduce (min over struct(-freq, pair) — one
     scalar to the driver per round, never the table),
  3. a rewrite of ONLY the words containing the winning pair (a cheap
     JVM-side exists() predicate routes the untouched majority around
     the Arrow-batched pandas UDF that does the greedy left-to-right
     merge).

The histogram is localCheckpoint-pinned per round (bounded two-column
table) so the union lineage never compounds — the `operators/cc.py`
iterative-plan hygiene. Driver round-trips are O(n_merges) scalars,
which is the irreducible sequential core of BPE (merge t+1's counts
depend on merge t's rewrite).

Pre-tokenization uses one regex on both sides (JVM regexp_extract_all
for training, Python `re` with re.ASCII for encoding — the ASCII flag
pins \\s to the same character set Java's default \\s matches):
letter runs | digit runs | single punctuation. Each word ends with the
end-of-word sentinel so merges can't bridge word boundaries.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PRETOKEN_RE = re.compile(PRETOKEN_PATTERN, re.ASCII)
EOW = "</w>"


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the pretokenized corpus — the one corpus-sized
    stage of BPE training (everything after runs on this table)."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_PATTERN), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _symbols_expr(word_col):
    """word → initial symbol array: one char per symbol, EOW appended."""
    return F.concat(F.split(word_col, ""), F.array(F.lit(EOW)))


def _merge_pair_udf(left: str, right: str):
    merged = left + right

    @pandas_udf("array<string>")
    def _merge(sym: pd.Series) -> pd.Series:
        def one(symbols):
            out, i, n = [], 0, len(symbols)
            while i < n:
                if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            return out

        return sym.map(one)

    return _merge


def _pair_struct(col):
    """Adjacent symbol pairs of an array column (empty for 1-symbol
    arrays — slice(x, 1, 0) is the empty slice, never negative)."""
    n = F.size(col)
    return F.arrays_zip(
        F.slice(col, 1, n - 1).alias("l"), F.slice(col, 2, n - 1).alias("r")
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to `n_merges` BPE merges; returns [(left, right, freq)]
    in rank order. Stops early when the best remaining pair's weighted
    frequency drops below `min_freq` (or no pairs remain). Adjacent
    overlapping occurrences count per position and merge greedily
    left-to-right ('aaaa' counts (a,a) three times, merges to (aa,aa)),
    matching the reference subword-nmt behavior. Ties on frequency break
    to the lexicographically smallest (left, right) pair, so training is
    deterministic regardless of partitioning."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    hist = (
        word_histogram(docs, text_col)
        .select(_symbols_expr(F.col("word")).alias("symbols"), "freq")
        .localCheckpoint(eager=True)
    )
    # union doubles the partition count, so without this pin round t has
    # 2^t times the tasks of round 0 (each paying an Arrow worker round
    # trip — measured: rewrite time doubled per round, 74 s by round 12
    # on a 31-row histogram). coalesce is shuffle-free: both union
    # branches partition-align with the checkpoint they filter.
    n_part = hist.rdd.getNumPartitions()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            hist.select(F.explode(_pair_struct(F.col("symbols"))).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("f"))
            .agg(
                F.min(
                    F.struct((-F.col("f")).alias("nf"), "l", "r")
                ).alias("b")
            )
            .first()["b"]
        )
        if best is None or -best["nf"] < min_freq:
            break
        left, right, freq = best["l"], best["r"], int(-best["nf"])
        merges.append((left, right, freq))
        has_pair = F.exists(
            _pair_struct(F.col("symbols")),
            lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)),
        )
        touched = hist.filter(has_pair).withColumn(
            "symbols", _merge_pair_udf(left, right)(F.col("symbols"))
        )
        hist = (
            hist.filter(~has_pair)
            .unionByName(touched)
            .coalesce(n_part)
            .localCheckpoint(eager=True)
        )
    return merges


def merges_table(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """[(left, right, freq)] → (rank, left, right, freq) DataFrame."""
    return spark.createDataFrame(
        [(i, l, r, f) for i, (l, r, f) in enumerate(merges)],
        "rank int, left string, right string, freq bigint",
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        pairs = [(symbols[i], symbols[i + 1]) for i in range(len(symbols) - 1)]
        ranked = [(ranks[p], p) for p in set(pairs) if p in ranks]
        if not ranked:
            break
        _, (left, right) = min(ranked)
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — apply learned merges in
    rank order (lowest rank first, all occurrences per step — the
    classic encode loop). The rank table rides to executors inside the
    UDF closure (a tokenizer is KBs — broadcast-by-closure is the right
    size class); per-batch memoization collapses repeated words so the
    loop runs once per DISTINCT word per Arrow batch."""
    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(text):
            out: list[str] = []
            for w in _PRETOKEN_RE.findall(text or ""):
                toks = cache.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    cache[w] = toks
                out.extend(toks)
            return out

        return texts.map(one)

    return docs.select(
        F.col(id_col),
        _encode(F.col(text_col)).alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens"))


def save_bpe(spark, merges: list[tuple[str, str, int]], path: str) -> None:
    """Persist a trained tokenizer: the rank-ordered merge table as
    parquet + meta.json with the pretokenizer pattern and EOW sentinel
    (so a loader can verify it is decoding with the same pretokenizer
    the merges were learned under). Same layout discipline as save_nb /
    the BM25 index: Spark writer for the table, POSIX for the metadata,
    so the root must be driver-local (`require_local_root`). A
    tokenizer is re-trained, not appended — overwrite semantics."""
    import json
    import os

    from ..utils import require_local_root

    path = require_local_root(path, "save_bpe tokenizer")
    merges_table(spark, merges).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "merges")
    )
    meta = {
        "n_merges": len(merges),
        "pretoken_pattern": PRETOKEN_PATTERN,
        "eow": EOW,
    }
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.rename(tmp, os.path.join(path, "meta.json"))


def load_bpe(spark, path: str) -> list[tuple[str, str, int]]:
    """Load a tokenizer persisted by `save_bpe`, in rank order.
    Refuses a tokenizer trained under a different pretokenizer pattern
    or sentinel than this module applies at encode time (the silent
    mismatch would tokenize every word differently)."""
    import json
    import os

    from ..utils import require_local_root

    path = require_local_root(path, "load_bpe tokenizer")
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    if meta.get("pretoken_pattern") != PRETOKEN_PATTERN or meta.get("eow") != EOW:
        raise ValueError(
            f"tokenizer at {path!r} was trained with pretokenizer "
            f"{meta.get('pretoken_pattern')!r} / eow {meta.get('eow')!r}; "
            f"this build encodes with {PRETOKEN_PATTERN!r} / {EOW!r}"
        )
    rows = (
        spark.read.parquet(os.path.join(path, "merges"))
        .orderBy("rank")
        .collect()  # bounded: a tokenizer is n_merges rows (KBs)
    )
    if len(rows) != int(meta["n_merges"]):
        raise ValueError(
            f"tokenizer at {path!r}: meta says {meta['n_merges']} merges, "
            f"table has {len(rows)}"
        )
    return [(r["left"], r["right"], int(r["freq"])) for r in rows]


def vocab_table(spark, merges: list[tuple[str, str, int]], docs: DataFrame | None = None, text_col: str = "text"):
    """(token_id, token) — the encoder's output alphabet: every base
    symbol (corpus characters + EOW when `docs` is given, else the
    merges' constituent symbols) plus one token per merge, ids assigned
    base-alphabet-first in lexicographic order, then merges in rank
    order (the subword-nmt vocab convention)."""
    from pyspark.sql import functions as F

    if docs is not None:
        base = (
            docs.select(F.explode(F.split(F.col(text_col), "")).alias("ch"))
            .filter(F.col("ch") != "")
            .filter(~F.col("ch").rlike(r"\s"))
            .distinct()
        )
        base_syms = sorted({r["ch"] for r in base.collect()} | {EOW})
    else:
        syms: set[str] = set()
        for left, right, _ in merges:
            syms.add(left)
            syms.add(right)
        base_syms = sorted(syms)
    rows = [(i, s) for i, s in enumerate(base_syms)]
    off = len(rows)
    rows += [(off + i, m[0] + m[1]) for i, m in enumerate(merges)]
    return spark.createDataFrame(rows, "token_id int, token string")
