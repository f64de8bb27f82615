"""Text-analytics operators: tokenization, word/bigram counts,
windowed co-occurrence, PMI.

Capability parity with the reference's assignment 1-2 workloads
(SURVEY.md §2.2-2.3):

- word count            reference: assignment2/src/main/WordCount.java:34-70
- bigram count          reference: assignment2/src/main/BigramCount.java:40-78
- co-occurrence ±window reference: ComputeCooccurrenceMatrixPairs.java:74-121
                        (stripes variant is a shuffle encoding, not a
                        distinct semantic — one implementation here)
- PMI                   reference: PairsPMI.java / StripesPMI.java
                        (per-document distinct counting, natural log,
                        joint-doc-count >= threshold, default 10)

Scale design: tokenization and pair generation happen with JVM-side
higher-order array functions inside a single narrow stage — the ONLY
shuffle in each operator is the final partial/final hash aggregation
(Spark's built-in replacement for the reference's hand-written
combiners, WordCount.java:138). No Python UDFs anywhere. The
reference's "order inversion" and custom partitioners (PairsPMI.java
:78-95,137-149) collapse into explicit joins of two aggregates, which
Catalyst plans with exchange reuse.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "tokens_array",
    "tokenize",
    "word_count",
    "bigram_count",
    "cooccurrence",
    "cooccurrence_stripes",
    "pmi",
    "llr",
]


def tokens_array(text_col: Column | str = "text") -> Column:
    """Whitespace tokenization → array<string>, empty tokens dropped.

    Matches the reference contract: split on ``\\s+`` only, keep
    apostrophes ("starcross'd" is one token —
    LookupPostingsCompressed.java:118).
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(col, r"\s+"), lambda w: F.length(w) > 0)


def tokens_spark_sql(text_col: str = "text") -> str:
    """Spark SQL text equivalent of :func:`tokens_array` — same
    split-on-``\\s+``, drop-empty semantics, built as a string so wide
    consumers (the 32-fold simhash/minhash signatures) can assemble
    their whole expression in ONE ``F.expr`` parse instead of one
    py4j round-trip per node (see functions.hashing.h28_spark_sql)."""
    return f"filter(split({text_col}, '\\\\s+'), w -> length(w) > 0)"


# NOTE on the *_outer explodes throughout this package: a plain
# explode/posexplode over a COMPUTED array makes the optimizer infer
# `size(arr) > 0 AND arr IS NOT NULL` (InferFiltersFromGenerate) and
# predicate pushdown then inlines the ENTIRE array expression into a
# Filter at the scan — tokenization/shingling/hashing runs twice per
# row, and for the 32-fold minhash signature it ran 33x (measured 119s
# vs 3s at sf0.1). The *_outer variants infer no filter; rows from
# empty arrays come out as a single NULL which an explicit filter on
# the GENERATED attribute removes — that filter cannot be pushed below
# the Generate, so the array expression is evaluated exactly once.


def tokenize(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode a corpus into ``(doc_id, pos, word)`` — pos is the
    0-based position within the document's token sequence."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode_outer(tokens_array(text_col)).alias("pos", "word"),
    ).where(F.col("word").isNotNull())


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` — one shuffle (partial+final hash agg)."""
    return (
        docs.select(F.explode_outer(tokens_array(text_col)).alias("word"))
        .where(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def bigram_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent-pair counts ``(w1, w2, cnt)`` within each document.

    Pairs are built by zipping the token array with itself shifted by
    one (arrays_zip of two slices) — a narrow, codegen'd projection.
    This deliberately avoids the window-function formulation
    (lead() over doc_id) which would add a shuffle+sort before the
    aggregation; at 100 TB that extra exchange dominates.
    """
    toks = tokens_array(text_col)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w1"),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))).alias("w2"),
    )
    return (
        docs.select(F.explode_outer(pairs).alias("p"))
        .where(F.col("p").isNotNull())
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("cnt"))
    )


def cooccurrence(docs: DataFrame, window: int = 2, text_col: str = "text") -> DataFrame:
    """Directed co-occurrence counts ``(a, b, cnt)`` within ±window.

    Semantics per the reference (ComputeCooccurrenceMatrixPairs.java
    :87-99): for each position i emit (w[i], w[j]) for every j in
    [i-window, i+window], j != i, in bounds. Duplicate words at
    different positions all count.

    Implementation: one flatten(transform(...)) over the token array —
    the neighborhood scan is a per-row nested loop that stays inside
    whole-stage codegen; no self-join, no window function. The only
    shuffle is the final count aggregation.
    """
    pairs = F.expr(
        f"""
        flatten(transform(__toks, (x, i) ->
          transform(
            filter(sequence(greatest(0, i - {window}),
                            least(size(__toks) - 1, i + {window})),
                   j -> j != i),
            j -> struct(x AS a, __toks[j] AS b))))
        """
    )
    return (
        docs.select(tokens_array(text_col).alias("__toks"))
        .where(F.size("__toks") > 0)
        .select(F.explode_outer(pairs).alias("p"))
        .where(F.col("p").isNotNull())
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count("*").alias("cnt"))
    )


def cooccurrence_stripes(docs: DataFrame, window: int = 2, text_col: str = "text") -> DataFrame:
    """The stripes encoding of :func:`cooccurrence`: one row per left
    word with its neighbor map — ``(a, stripe MAP<STRING,BIGINT>,
    stripe_str)``. ``stripe_str`` is the canonical sorted
    ``"b:cnt,b:cnt"`` rendering (deterministic, SQL-oracle-friendly).

    In this engine stripes are a POST-AGGREGATION re-shaping of the
    pair counts, not a separate shuffle strategy — Spark's partial
    aggregation already gives the map-side combining the reference's
    stripes pattern existed to provide (ComputeCooccurrenceMatrix
    Stripes.java). One extra shuffle on ``a`` assembles the maps.
    """
    pairs = cooccurrence(docs, window=window, text_col=text_col)
    entries = F.sort_array(
        F.collect_list(F.struct(F.col("b"), F.col("cnt")))
    )
    return (
        pairs.groupBy("a")
        .agg(entries.alias("es"))
        .select(
            "a",
            F.map_from_entries("es").alias("stripe"),
            F.array_join(
                F.transform(
                    F.col("es"), lambda e: F.concat_ws(":", e["b"], e["cnt"])
                ),
                ",",
            ).alias("stripe_str"),
        )
    )


def pmi(
    docs: DataFrame,
    min_cooccurrence: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information over per-document distinct words.

    ``pmi(x, y) = ln( c(x,y) * N / (c(x) * c(y)) )`` where c() are
    document frequencies, pairs are canonical (x < y), and only pairs
    with joint document count >= min_cooccurrence are kept — exactly
    the reference semantics (PairsPMI.java:56-135, threshold :126,
    natural log :240; doc-distinct words :63-69).

    Plan shape: the reference needs two chained MR jobs, a custom
    partitioner and the order-inversion trick, with a lossy text
    round-trip between jobs (PairsPMI.java:172-208). Here it is one
    DAG: two aggregations + two joins; Catalyst sees the whole
    pipeline, and AQE broadcasts the vocab-sized marginal aggregate
    when (and only when) it actually fits in memory.

    Returns ``(x, y, cnt, pmi)``.
    """
    return _doc_pair_marginals(docs, min_cooccurrence, text_col, id_col).select(
        "x",
        "y",
        "cnt",
        F.log((F.col("cnt") * F.col("n")) / (F.col("cx") * F.col("cy"))).alias("pmi"),
    )


def _doc_pair_marginals(
    docs: DataFrame, min_cooccurrence: int, text_col: str, id_col: str
) -> DataFrame:
    """Shared collocation statistics: canonical per-document-distinct
    pairs with their joint and marginal document counts —
    ``(x, y, cnt, cx, cy, n)``. :func:`pmi` and :func:`llr` are both
    one scoring projection over this frame."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_sort(F.array_distinct(tokens_array(text_col))).alias("ws"),
    )
    # canonical i<j pairs from the sorted distinct word array: a per-row
    # nested loop in codegen, no join.
    pair_expr = F.expr(
        """
        flatten(transform(ws, (x, i) ->
          transform(slice(ws, i + 2, size(ws)), y -> struct(x, y))))
        """
    )
    pair_counts = (
        words.select(F.explode_outer(pair_expr).alias("p"))
        .where(F.col("p").isNotNull())
        .select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") >= min_cooccurrence)
    )
    word_counts = (
        words.select(F.explode_outer("ws").alias("w"))
        .where(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    n_docs = docs.select(F.count("*").alias("n"))
    # word_counts is vocab-sized — small for book corpora but unbounded
    # for web-scale text (typos/URLs/ids), so no forced broadcast: AQE
    # chooses broadcast vs shuffle from the actual aggregate size.
    return (
        pair_counts.join(
            word_counts.select(F.col("w").alias("x"), F.col("wc").alias("cx")), "x"
        )
        .join(
            word_counts.select(F.col("w").alias("y"), F.col("wc").alias("cy")), "y"
        )
        .crossJoin(F.broadcast(n_docs))
    )


def llr(
    docs: DataFrame,
    min_cooccurrence: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dunning's log-likelihood-ratio collocations (Dunning 1993,
    "Accurate Methods for the Statistics of Surprise and Coincidence"
    — public literature) — the statistically robust sibling of
    :func:`pmi`: PMI overweights rare pairs (two hapaxes co-occurring
    once score maximally); LLR scores the 2x2 document-count
    contingency table, so evidence mass matters.

    ``(x, y, cnt, llr)`` with
    ``llr = 2*(Σ k·ln k − Σ rowsum·ln rowsum − Σ colsum·ln colsum
    + N·ln N)`` over k11=c(x,y), k12=c(x)−k11, k21=c(y)−k11,
    k22=N−c(x)−c(y)+k11, using the ``0·ln 0 = 0`` convention. Every
    input is an integer count and the expression tree is fixed, so
    the double math is order-free — the DuckDB oracle matches the
    6-dp rounding exactly. Same plan shape (and shared code) as PMI:
    two aggregations, two joins, one scoring projection.
    """

    def xlx(c):  # x*ln(x), defined as 0 at 0
        return F.when(c > 0, c * F.log(c.cast("double"))).otherwise(F.lit(0.0))

    m = _doc_pair_marginals(docs, min_cooccurrence, text_col, id_col)
    k11 = F.col("cnt")
    k12 = F.col("cx") - k11
    k21 = F.col("cy") - k11
    k22 = F.col("n") - F.col("cx") - F.col("cy") + k11
    n = F.col("n")
    score = 2.0 * (
        xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
        - xlx(k11 + k12) - xlx(k21 + k22)
        - xlx(k11 + k21) - xlx(k12 + k22)
        + xlx(n)
    )
    return m.select("x", "y", "cnt", F.round(score, 6).alias("llr"))
