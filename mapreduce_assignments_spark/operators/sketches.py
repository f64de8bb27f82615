"""Deterministic cardinality sketches.

Corpus curation constantly asks "how many distinct tokens / users /
shingles per group?" — at 100 TB an exact distinct is a giant
exchange keyed by the value itself, while the classic sketch answer
(HyperLogLog) is engine-specific: Spark's HLL++ and DuckDB's
approx_distinct produce different numbers, so an HLL query can never
hash-match the oracle. The K-minimum-values (KMV) sketch [Bar-Yossef
et al. 2002] threads that needle: it is an *approximation of the
cardinality* but a *deterministic function of the value set*, so two
engines computing it over the same data agree bit-for-bit. Estimator:
with u_(k) the k-th smallest of the distinct values' hashes mapped
into (0, 1], E[distinct] ≈ (k-1) / u_(k); if fewer than k distinct
values exist, the sketch degrades to the exact count.

The hash is the engine-portable md5 family (functions/hashing.h60 —
the same interop contract MinHash/SimHash use).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.hashing import h60

__all__ = ["kmv_distinct", "count_min_counters", "count_min_estimate"]


def kmv_distinct(
    df: DataFrame, key: str, group_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``key``:
    ``(<group_col>, k, n_kept, est_distinct)``.

    ``n_kept`` = min(k, true distinct count) hashes retained;
    ``est_distinct`` = (k-1)/u_(k) when the sketch is full, else the
    exact ``n_kept``.

    Scale shape: one distinct aggregation on ``(group, hash)`` (the
    unavoidable exchange — partial-aggregated map-side, and it carries
    8-byte hashes, never the values), then the per-group k smallest
    via ``row_number() <= k``. Spark ≥3.5 plans that filter as
    WindowGroupLimit: each map task keeps only its local k smallest
    per group BEFORE the window exchange, so the second shuffle is
    ≤ k rows per (group, input partition) — the sketch's whole point
    at 100 TB. Estimates are deterministic, so the DuckDB oracle
    matches exactly (unlike HLL).
    """
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by k-1)")
    # NULL keys are excluded up front: a null hash would sort first in
    # Spark but last in DuckDB, silently skewing the k-smallest set —
    # and "distinct count of a value set" has no null member anyway.
    d = (
        df.where(F.col(key).isNotNull())
        .select(F.col(group_col), h60(F.col(key).cast("string")).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("__h")
    kept = d.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)
    u_max = (F.max("__h") + 1) / F.lit(float(1 << 60))  # k-th smallest, in (0,1]
    return kept.groupBy(group_col).agg(
        F.lit(k).alias("k"),
        F.count("*").alias("n_kept"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                (F.lit(k) - 1) / u_max
            ),
            6,
        ).alias("est_distinct"),
    )


def count_min_counters(
    items: DataFrame, key: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Count-min sketch counters over the multiset of ``key`` values:
    ``(d, bucket, cnt)`` — ``depth x width`` cells [Cormode &
    Muthukrishnan, J.Alg'05]. Row ``d``'s hash is the same universal
    family MinHash uses ((a_d·h28(key)+b_d) mod p, then mod width) —
    engine-portable integer arithmetic, so the DuckDB oracle builds
    the identical sketch.

    Scale shape: the sketch is the whole point at 100 TB — the
    aggregation is keyed by (d, bucket), so the map-side partial
    combine collapses every partition to at most depth·width rows and
    the exchange carries a fixed-size sketch no matter how large or
    skewed the input (an exact per-key count would shuffle the hot
    keys themselves).
    """
    from ..functions.hashing import MINHASH_A, MINHASH_B, MINHASH_PRIME, h28

    if depth > len(MINHASH_A):
        raise ValueError(f"depth must be <= {len(MINHASH_A)}")
    base = h28(F.col(key).cast("string"))
    rows = items.where(F.col(key).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            (F.lit(MINHASH_A[d]) * base + F.lit(MINHASH_B[d]))
                            % F.lit(MINHASH_PRIME)
                            % F.lit(width)
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell")
    )
    return rows.groupBy(F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket")).agg(
        F.count("*").alias("cnt")
    )


def count_min_estimate(
    counters: DataFrame, probes: DataFrame, key: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Point-query the count-min sketch for each probe key:
    ``(<key>, estimate)`` = min over the depth rows of the probed
    cells. The estimate NEVER undercounts (every occurrence of the key
    incremented all of its cells); collisions only add. Counters are
    a fixed depth·width frame — broadcast; probing is a narrow map +
    one small join per depth row collapsed into a single equi-join on
    (d, bucket).
    """
    from ..functions.hashing import MINHASH_A, MINHASH_B, MINHASH_PRIME, h28

    base = h28(F.col(key).cast("string"))
    cells = probes.select(
        F.col(key),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            (F.lit(MINHASH_A[d]) * base + F.lit(MINHASH_B[d]))
                            % F.lit(MINHASH_PRIME)
                            % F.lit(width)
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(F.col(key), F.col("cell.d").alias("d"), F.col("cell.bucket").alias("bucket"))
    joined = cells.join(F.broadcast(counters), ["d", "bucket"])
    return joined.groupBy(key).agg(F.min("cnt").alias("estimate"))
