"""Text-analysis column functions for large-scale training-data pipelines.

All JVM-side ``pyspark.sql.functions`` compositions (whole-stage codegen,
no Python in the hot path) so they survive a 100 TB scan.  Semantics are
deliberately SQL-expressible so the DuckDB oracle can mirror them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny, fixed stopword list (deterministic across engines).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty strings filtered."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Regex sub-word segmentation count (BPE-ish): words, numbers, and
    punctuation runs each count as tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(F.split(c, r"(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), lambda t: F.trim(t) != F.lit(""))
    )


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_ratio(col: Column | str) -> Column:
    toks = tokens(col)
    stop = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    presence of stopwords (prose-ness)."""
    c = F.col(col) if isinstance(col, str) else col
    len_ok = (F.length(c) >= 20) & (F.length(c) <= 20000)
    return (
        len_ok.cast("double") * 0.4
        + (punct_ratio(c) < 0.1).cast("double") * 0.3
        + (stopword_ratio(c) > 0.01).cast("double") * 0.3
    )


def lang_guess(col: Column | str) -> Column:
    """N-gram/stopword language-ID heuristic (deterministic).

    Real deployments plug a model here; the heuristic keeps the operator
    oracle-checkable: English stopword hit -> 'en', else 'other'.
    """
    return F.when(stopword_ratio(col) > 0.0, F.lit("en")).otherwise(F.lit("other"))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint (md5 of utf-8 bytes)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-gram shingle set (distinct), for Jaccard/MinHash."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(k))))


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-gram list (space-joined, NOT distinct; order preserved).

    Pure codegen expressions -- sequence/transform/slice stay JVM-side,
    so the shingling scan scales with bytes read, never Python.  Docs
    with fewer than ``n`` tokens yield an empty list (``F.sequence``
    would DESCEND for start > stop, so the short-doc case is guarded
    explicitly rather than clamped)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
