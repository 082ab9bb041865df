"""Text-analysis operators over the documents table.

All native Catalyst expressions (regexp/split/length/aggregate) — these
run inside whole-stage codegen in the scan stage, so they cost one pass
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic
# language ID. Deterministic and SQL-expressible (matters for the
# oracle); a production system would swap in fastText/CLD3 via a Pandas
# UDF behind the same column contract.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
]


def tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words + digits + punctuation runs, the
    usual cheap proxy for BPE token counts when no tokenizer is at hand."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0))
    )


def punct_ratio(text: Column) -> Column:
    clean_len = F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    total = F.length(text)
    return F.when(total > 0, (total - clean_len).cast("double") / total).otherwise(0.0)


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return F.when(F.size(toks) > 0, n_stop.cast("double") / F.size(toks)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards reasonable length,
    penalizes punctuation soup and stopword-free (non-linguistic) text.
    Weights are arbitrary but fixed — the operator contract is the shape,
    not the constants."""
    length_component = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    punct_component = 1.0 - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    return F.round(0.6 * length_component + 0.4 * punct_component, 6)


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    """Per-language marker-hit counts over a pre-tokenized column.
    Project the token array into a real column first so tokenization
    runs once per row, not once per language."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (tokenizes inline)."""
    return lang_scores_from_tokens(tokens(text))


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """First-wins argmax over score columns: the first language (in
    LANG_MARKERS order) attaining the max; 'und' when max <= 0.

    Use after projecting ``lang_scores`` into real columns — comparing
    plain columns keeps the expression tree linear instead of nesting
    every earlier score into every later comparison."""
    langs = list(scores)
    best = F.greatest(*[scores[l] for l in langs]) if len(langs) > 1 else scores[langs[0]]
    expr = F.when(best <= 0, F.lit("und"))
    for lang in langs:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def lang_id(text: Column) -> Column:
    """Marker-word vote: language with the most lexicon hits; 'und'
    (undetermined) when nothing matches. Single-expression form; for
    wide scans prefer projecting lang_scores first (see
    lang_id_from_scores)."""
    return lang_id_from_scores(lang_scores(text))


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: lowercase, collapse whitespace, sha2.
    Two documents with the same fingerprint are exact dups modulo
    whitespace/case (the cheap pre-filter before MinHash)."""
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.sha2(normalized, 256)


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document profile with all text metrics."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subtokens"),
        F.length(t).alias("n_chars"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )
