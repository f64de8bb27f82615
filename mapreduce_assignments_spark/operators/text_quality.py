"""Text analysis operators for training-data pipelines.

North-star extensions (BASELINE.json): language ID, quality scoring,
token counting, document fingerprinting. All pure JVM expressions —
one narrow projection per operator, aggregations only where the
semantics need them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions.hashing import h60
from .text import tokens_array

__all__ = [
    "token_counts",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "LANG_MARKERS",
    "BPE_ISH_REGEX",
    "STOPWORDS",
]

# A BPE-ish pre-tokenization: letter runs, digit runs, single other
# non-space chars — the shape GPT-style tokenizers use before merges.
BPE_ISH_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# tiny n-gram/marker heuristic tables; a real pipeline would learn
# these — the operator contract (argmax over per-language evidence,
# deterministic tiebreak) is what matters at scale.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "fr": ("le", "la", "et", "est"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "los", "es", "y"),
    "zh": ("de", "shi", "le", "zhong"),
}


def _tok_count(text_col: str, regex: str) -> Column:
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(regex), F.lit(0)))


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, ws_tokens, bpe_tokens, n_chars)`` — whitespace and
    BPE-ish token counts per document."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens_array(text_col)).alias("ws_tokens"),
        _tok_count(text_col, BPE_ISH_REGEX).alias("bpe_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Composite document quality in [0,1]:
    0.4·length_score + 0.3·lexical_diversity + 0.3·stopword_signal.

    All three components are integer-count ratios, so the double
    arithmetic is order-free and matches the SQL oracle exactly.
    """
    toks = tokens_array(text_col)
    n = F.size(toks)
    distinct_ratio = F.when(n > 0, F.size(F.array_distinct(toks)) / n).otherwise(0.0)
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = F.when(n > 0, stop_hits / n).otherwise(0.0)
    # stopword signal peaks at a natural-language-ish 40% density
    stop_signal = F.lit(1.0) - F.least(
        F.lit(1.0), F.abs(stop_ratio - F.lit(0.4)) * 2.5
    )
    length_score = F.least(F.lit(1.0), n / F.lit(64.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.round(
            F.lit(0.4) * length_score
            + F.lit(0.3) * distinct_ratio
            + F.lit(0.3) * stop_signal,
            6,
        ).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """``(doc_id, pred_lang, score)`` — argmax of marker-token hits per
    language; ties break alphabetically on language code (so the SQL
    oracle's ordering matches)."""
    toks = tokens_array(text_col)
    scores = [
        F.size(F.filter(toks, lambda w: w.isin(*markers))).alias(f"s_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select(F.col(id_col).alias("doc_id"), *scores)
    langs = sorted(LANG_MARKERS)
    # argmax via struct max: (score, -alphabetical_index) — ties go to
    # the alphabetically first language, mirrored by the SQL oracle's
    # CASE chain ordering.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"s_{l}").alias("s"),
                    F.lit(-i).alias("t"),
                    F.lit(l).alias("lang"),
                )
                for i, l in enumerate(langs)
            ]
        )
    )
    return scored.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        best["s"].alias("score"),
    )


def doc_fingerprint(
    docs: DataFrame, n: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing-style fingerprint: the minimum 60-bit hash over the
    document's word n-grams (whole text if shorter than n tokens).
    ``(doc_id, fingerprint)`` — equal fingerprints are cheap
    near-duplicate evidence."""
    toks = tokens_array(text_col)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_min(F.transform(grams, lambda g: h60(g))).alias("fingerprint"),
    )
