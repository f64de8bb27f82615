"""Featurization: the hashing-trick term-frequency vectorizer.

The bridge from curated text to trainable features — the same
contract as Spark MLlib's HashingTF / sklearn's HashingVectorizer
(public APIs; implementation here is independent DataFrame algebra):
each token is hashed into one of ``n_features`` buckets and the
document becomes a sparse count vector. No vocabulary pass, no fitted
state, no driver-side dictionary — the property that makes the
hashing trick THE featurizer at 100 TB (a vocabulary join would be a
second full scan plus a giant dimension table).

Sparse output as parallel arrays ``(indices, values)`` sorted by
index — the standard sparse-vector wire format, and deterministic so
the DuckDB oracle matches element-for-element. The hash is the
engine-portable md5 family (functions/hashing.h60), not MurmurHash3 —
same trade as MinHash: bit-portability across engines over raw speed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.hashing import h60
from .text import tokens_array

__all__ = ["hashing_tf"]


def hashing_tf(
    docs: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(doc_id, indices ARRAY<INT>, values ARRAY<LONG>)`` — sparse
    hashed term-frequency vectors over whitespace tokens.

    Plan shape: explode → one partial-aggregated exchange on
    ``(doc, bucket)`` (the combiner collapses repeated tokens
    map-side) → one exchange on ``doc`` to assemble the sparse arrays
    (bounded per row by min(n_distinct_tokens, n_features) entries).
    Empty documents produce an empty vector row, not a missing row —
    downstream training joins must not silently drop examples.
    """
    if n_features < 1:
        raise ValueError("n_features must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(tokens_array(text_col)).alias("token"),
    )
    counts = (
        toks.withColumn(
            "bucket",
            F.when(
                F.col("token").isNotNull(),
                F.pmod(h60("token"), F.lit(n_features)).cast("int"),
            ),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("token").alias("tf"))  # count(token): 0 token rows -> tf 0
    )
    pairs = F.array_sort(
        F.collect_list(
            F.when(
                F.col("bucket").isNotNull(),
                F.struct(F.col("bucket").alias("i"), F.col("tf").alias("v")),
            )
        )
    )
    return counts.groupBy("doc_id").agg(
        F.transform(pairs, lambda s: s["i"]).alias("indices"),
        F.transform(pairs, lambda s: s["v"]).alias("values"),
    )
