"""Text analysis for training-data pipelines: token counts, quality scores,
language-ID, document fingerprints.

North-star extensions (no reference counterpart).  All pure Column expressions:
each returns columns to attach via ``df.select("*", ...)`` so any combination
fuses into a single scan projection under whole-stage codegen.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish word/number/punctuation segmentation — approximates subword token
# boundaries the way GPT-2's pre-tokenizer splits before byte-pair merges:
# contractions, letter runs, digit runs, punctuation runs.
BPEISH_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "at", "by", "this", "be", "are",
)

# Marker-token tables for the n-gram/stopword language-ID heuristic. Ordered:
# the argmax wins, and ties between languages go to the EARLIEST declared
# language; 'und' only when no marker hits at all.
LANG_MARKERS: Dict[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "is", "you", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "los", "las", "una"),
    "fr": ("le", "la", "les", "des", "est", "une", "que", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
}


def whitespace_tokens(text: Column) -> Column:
    """Array of whitespace-delimited tokens, empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace token count (size of :func:`whitespace_tokens`)."""
    return F.size(whitespace_tokens(text))


def bpeish_token_count(text: Column) -> Column:
    """Approximate subword token count via the BPE-ish segmentation regex.

    ``regexp_count`` is JVM-side; this over-counts vs a real BPE vocab by the
    merge factor (~1.3× for English), which is fine for length budgeting."""
    return F.regexp_count(text, F.lit(BPEISH_TOKEN_RE))


def char_count(text: Column) -> Column:
    return F.length(text)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace."""
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(text) > 0, n_punct / F.length(text)).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column, stopwords: Sequence[str] = STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are (lowercase) stopwords."""
    toks = whitespace_tokens(F.lower(text))
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(list(stopwords))))
    return F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))


def mean_token_length(text: Column) -> Column:
    toks = whitespace_tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length, punctuation and stopword signals.

    Modeled on Gopher/C4-style filters (Rae et al. 2021, §A1.1): documents that
    are very short, mostly punctuation, or stopword-free are likely boilerplate
    or non-linguistic content.
    """
    n_tok = token_count(text)
    len_ok = F.when(n_tok >= 50, 1.0).otherwise(n_tok / F.lit(50.0))
    punct_ok = F.lit(1.0) - F.least(
        punct_ratio(text) * 2, F.lit(1.0)
    )
    mtl = mean_token_length(text)
    mtl_ok = F.when((mtl >= 3) & (mtl <= 10), 1.0).otherwise(0.5)
    stop_ok = F.when(stopword_ratio(text) > 0, 1.0).otherwise(0.6)
    return (len_ok * 0.4 + punct_ok * 0.3 + mtl_ok * 0.2 + stop_ok * 0.1)


def lang_marker_counts(text: Column) -> Dict[str, Column]:
    """Per-language marker-token counts over the lowercase token array."""
    toks = whitespace_tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(list(markers))))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language by marker count; 'und' only when no marker hits.

    Deterministic argmax: ties go to the earliest language in LANG_MARKERS
    declaration order (the when-cascade places earlier languages outermost) —
    the same tie-break any SQL CASE reimplementation uses.
    """
    counts = lang_marker_counts(text)
    langs = list(counts)
    best = F.greatest(*[counts[g] for g in langs]) if len(langs) > 1 else counts[langs[0]]
    expr = F.lit("und")
    # first language (in declaration order) achieving the max wins
    for lang in reversed(langs):
        expr = F.when(
            (counts[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def content_fingerprint(text: Column, window: int = 0) -> Column:
    """64-bit content fingerprint (xxhash64); with ``window`` > 0, a winnowing-
    style rolling fingerprint: min over xxhash64 of each ``window``-token
    shingle (Schleimer et al., MOSS winnowing) — robust to local edits."""
    if window <= 0:
        return F.xxhash64(text)
    toks = whitespace_tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    shingle_hash = F.transform(
        idx,
        lambda i: F.xxhash64(
            F.concat_ws(" ", F.slice(toks, i + 1, window))
        ),
    )
    return F.array_min(shingle_hash)


def text_profile(text: Column) -> Column:
    """Struct of all per-document text metrics in one projection."""
    return F.struct(
        token_count(text).alias("n_tokens"),
        bpeish_token_count(text).alias("n_bpeish"),
        char_count(text).alias("n_chars"),
        punct_ratio(text).alias("punct_ratio"),
        stopword_ratio(text).alias("stopword_ratio"),
        mean_token_length(text).alias("mean_token_len"),
        quality_score(text).alias("quality"),
        lang_id(text).alias("lang_pred"),
        content_fingerprint(text).alias("fingerprint"),
    )


def normalize_text(
    text: Column,
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    strip_zero_width: bool = True,
) -> Column:
    """Standard pre-dedup/pre-tokenization text cleanup, all JVM regex.

    The whiteSpace-facet machinery (facets.py WhiteSpace) implements the
    XSD modes for VALIDATION; this is the pipeline-side normalizer that
    actually rewrites the text column before fingerprinting/minhashing, so
    that cosmetic variation (stray control chars, zero-width joiners, run
    of spaces) doesn't defeat exact/near dedup.  Order matters: invisible
    characters are removed BEFORE whitespace collapsing so "a\\u200b b"
    collapses to "a b", then the result is trimmed.

    Each step is a ``regexp_replace`` in the projection — row-local,
    whole-stage codegen, exactly replicable in the DuckDB oracle.
    """
    out = text
    if strip_control:
        # C0/C1 controls minus \t \n \r (which are whitespace, handled below)
        out = F.regexp_replace(out, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    if strip_zero_width:
        out = F.regexp_replace(
            out, "[\\u200B\\u200C\\u200D\\u2060\\uFEFF]", ""
        )
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, "\\s+", " "))
    if lowercase:
        out = F.lower(out)
    return out
