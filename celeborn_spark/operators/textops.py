"""Text-analysis operators for LLM data pipelines (SURVEY.md §2C).

All column expressions — tokenization, quality scoring, language ID,
fingerprinting — are built from `F.*` functions so they run inside
whole-stage codegen on the JVM. No Python touches the hot path; at
100 TB these are embarrassingly parallel map stages with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the n-gram language heuristic.
# Real pipelines would plug fasttext/cld3 in via a pandas_udf; the
# heuristic keeps the operator orac­le-expressible in plain SQL.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
FINGERPRINT_MOD = 1_000_000_007


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents are normalized word streams)."""
    return F.split(text, r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return F.size(F.filter(tokens(text), lambda t: t.isin(*stopwords)))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    n = token_count(text)
    return F.when(n > 0, stopword_count(text, stopwords) / n).otherwise(F.lit(0.0))


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    )
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Heuristic doc-quality score in [0, 1]: favors mid-length docs
    with a natural stopword ratio (C4/Gopher-style rule-based filter,
    reduced to oracle-expressible arithmetic)."""
    n = token_count(text)
    len_score = F.least(n / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.least(sw / F.lit(0.1), F.lit(1.0))
    return F.round(0.5 * len_score + 0.5 * sw_score, 6)


def lang_id(text: Column | str) -> Column:
    """Stopword-ratio language heuristic: 'en' if English stopwords are
    frequent enough, else 'other'. Deterministic and SQL-expressible;
    swap in a pandas_udf classifier for production multilingual data."""
    return F.when(stopword_ratio(text) >= 0.02, F.lit("en")).otherwise(F.lit("other"))


def doc_fingerprint(text: Column | str, mod: int = FINGERPRINT_MOD) -> Column:
    """Order-sensitive polynomial rolling hash over token lengths:
    fold(acc*31 + len(tok) mod p). A cheap structural fingerprint —
    robust to word substitutions of equal length, order-sensitive like
    the reference's per-batch CRC32 integrity stamp
    (PushState.getCRC32PerPartition, client/.../PushState.java:111)."""
    return F.aggregate(
        F.transform(tokens(text), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % mod,
    )
