"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (JVM-side); every
formula is engine-portable so the DuckDB oracle can replicate it exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..utils import round4

# small, fixed stopword marker sets per language (heuristic language-ID)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "une"],
    "de": ["der", "die", "und", "das", "von", "den", "mit", "ist", "des", "ein"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "on", "as", "at", "by", "be", "are"]


def _words(col: Column) -> Column:
    return F.filter(F.split(F.trim(F.lower(col)), r"\s+"), lambda w: w != "")


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit count over the token list. Pass an
    already-materialized word-array column where possible — each returned
    expression references the input independently, so handing in the raw
    tokenizer expression re-runs it once per language."""
    w = col
    return {
        lang: F.size(F.filter(w, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, score): argmax language by marker hits;
    deterministic tie-break on language code asc; 'und' when zero hits.
    The token array is projected once, then every per-language filter
    references the attribute (one tokenizer run per row, not per
    language)."""
    docs = docs.select("doc_id", _words(F.col(text_col)).alias("_w"))
    scores = lang_scores(F.col("_w"))
    pairs = F.array(
        *[
            F.struct(
                (-scores[lang]).alias("neg"), F.lit(lang).alias("lang"), scores[lang].alias("score")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    best = F.array_sort(pairs)[0]
    return docs.select(
        "doc_id",
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias("pred_lang"),
        best["score"].alias("score"),
    )


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]:
    n_tokens, mean token length, punctuation ratio, stopword ratio,
    distinct-token ratio. All portable to SQL. Token array projected once
    (5 features reference it; inlining would re-tokenize per feature)."""
    docs = docs.select("doc_id", text_col, _words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    n_tok = F.size(w)
    n_chars = F.length(F.col(text_col))
    mean_len = round4((F.aggregate(w, F.lit(0), lambda a, t: a + F.length(t)) / F.greatest(n_tok, F.lit(1))))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    punct_ratio = round4((n_punct / F.greatest(n_chars, F.lit(1))))
    stop_ratio = round4((F.size(F.filter(w, lambda t: t.isin(EN_STOPWORDS))) / F.greatest(n_tok, F.lit(1))))
    distinct_ratio = round4((F.size(F.array_distinct(w)) / F.greatest(n_tok, F.lit(1))))
    score = round4(
        F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - punct_ratio) * 0.25
        + F.least(stop_ratio * 4, F.lit(1.0)) * 0.25
        + distinct_ratio * 0.25
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality_score"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, bpe_ish_tokens): whitespace token count + a
    BPE-ish estimate = Σ ceil(len(word)/4) + count of non-alnum-non-space
    chars (a subword-piece proxy; pure arithmetic so every engine agrees)."""
    docs = docs.select("doc_id", text_col, _words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    ws = F.size(w)
    pieces = F.aggregate(
        w, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int")
    ) + (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9 ]", ""))
    )
    return docs.select("doc_id", ws.alias("ws_tokens"), pieces.alias("bpe_ish_tokens"))


def fingerprints(docs: DataFrame, text_col: str = "text", k: int = 3, top: int = 4) -> DataFrame:
    """Document fingerprint: md5 of normalized text (exact id) + winnowing-
    lite shingle fingerprint = the `top` lexicographically-smallest md5s of
    k-shingles, concatenated. Deterministic, portable."""
    from .dedup import shingles_of_words

    # word array materialized once — the shingle transform would re-split
    # the text per window otherwise (no CSE through lambda HOFs)
    base = docs.select("doc_id", _words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    hashes = F.array_sort(F.transform(shingles_of_words(w, k), lambda s: F.md5(s)))
    return base.select(
        "doc_id",
        F.md5(F.concat_ws(" ", w)).alias("exact_fp"),
        F.array_join(F.slice(hashes, 1, top), "").alias("shingle_fp"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 100,
    overlap: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking — the context-window preparation step
    of an LLM training pipeline. Windows of `chunk_tokens` tokens advance
    by `chunk_tokens - overlap`; the trailing partial window is kept, and
    an empty/short doc yields exactly one chunk. Returns
    (doc_id, chunk_idx, chunk_text, n_tokens).

    Pure columnar narrow stage — tokenize → sequence → explode → slice,
    no shuffle, no UDF: at 100 TB this is a map-only pass whose output
    stays partition-local (chunks inherit the parent doc's partition)."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    base = docs.select(id_col, _words(F.col(text_col)).alias("_toks"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size("_toks") - F.lit(overlap)) / F.lit(step)).cast("int"),
    )
    ex = base.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
    )
    window = F.slice(F.col("_toks"), F.col("chunk_idx") * step + F.lit(1), chunk_tokens)
    return ex.select(
        id_col,
        "chunk_idx",
        F.array_join(window, " ").alias("chunk_text"),
        F.size(window).alias("n_tokens"),
    )


# PII patterns shared with the DuckDB oracle (RE2/Java-compatible subset)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ip": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Training-corpus scrubbing: emails / URLs / IPv4 literals replaced
    with type tokens, with per-kind match counts for observability.
    Order matters (emails before URLs would corrupt mailto-like URLs, so
    URLs go first). Pure regexp_replace/regexp_count column expressions —
    JVM-side, codegen, no UDF."""
    redacted = F.col(text_col)
    counts = {}
    for kind in ("url", "email", "ip"):
        pat = PII_PATTERNS[kind]
        counts[kind] = F.regexp_count(F.col(text_col), F.lit(pat))
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return df.withColumn("redacted", redacted).withColumn(
        "n_emails", counts["email"]
    ).withColumn("n_urls", counts["url"]).withColumn("n_ips", counts["ip"])


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style n-gram repetition signals (Rae et al. 2021 §A1.2, the
    standard "repetitious document" pretraining filters), re-expressed so
    every value is engine-deterministic:

    - `top_bigram_char_frac` — max over word 2-grams of
      count·len(gram) / Σ count·len(gram): the character share the single
      most repeated bigram would claim. Using max of the PRODUCT avoids
      the tie-break ambiguity of "chars of the most frequent n-gram"
      when counts tie across grams of different lengths.
    - `dup_trigram_char_frac` — Σ over 3-grams with count > 1 of
      count·len / Σ count·len: the character share of ALL repeated
      trigrams. Boilerplate-heavy documents score near 1.

    Plan: the guarded n-gram expansion (token array materialized once —
    no CSE through lambda HOFs) explodes to (id, n, gram) rows, one
    map-side-combined groupBy counts occurrences, and one conditional
    aggregation per doc folds both metrics — two n-gram-keyed shuffles,
    no windows, no UDFs. Documents with < 3 tokens carry a null
    trigram fraction (< 2 tokens emit nothing at all)."""
    from .datasets import norm_tokens

    base = docs.select(
        F.col(id_col).alias("id"), norm_tokens(F.col(text_col)).alias("toks")
    )
    toks = F.col("toks")

    def grams(n: int):
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    rows = base.select(
        "id", F.lit(2).alias("n"), F.explode(grams(2)).alias("gram")
    ).unionByName(
        base.select("id", F.lit(3).alias("n"), F.explode(grams(3)).alias("gram"))
    )
    counts = rows.groupBy("id", "n", "gram").agg(F.count("*").alias("cnt"))
    wchars = (F.col("cnt") * F.length("gram")).cast("double")
    is2, is3 = F.col("n") == 2, F.col("n") == 3
    return counts.groupBy(F.col("id").alias(id_col)).agg(
        round4(
            F.max(F.when(is2, wchars)) / F.sum(F.when(is2, wchars))
        ).alias("top_bigram_char_frac"),
        round4(
            F.coalesce(
                F.sum(F.when(is3 & (F.col("cnt") > 1), wchars)), F.lit(0.0)
            )
            / F.sum(F.when(is3, wchars))
        ).alias("dup_trigram_char_frac"),
    )
