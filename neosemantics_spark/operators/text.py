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
    """Per-language marker-hit count over the token list."""
    w = _words(col)
    return {
        lang: F.size(F.filter(w, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, score): argmax language by marker hits;
    deterministic tie-break on language code asc; 'und' when zero hits."""
    scores = lang_scores(F.col(text_col))
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
    distinct-token ratio. All portable to SQL."""
    w = _words(F.col(text_col))
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
    w = _words(F.col(text_col))
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
    from .dedup import shingles

    norm = F.concat_ws(" ", _words(F.col(text_col)))
    sh = shingles(F.col(text_col), k)
    hashes = F.array_sort(F.transform(sh, lambda s: F.md5(s)))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("exact_fp"),
        F.array_join(F.slice(hashes, 1, top), "").alias("shingle_fp"),
    )
