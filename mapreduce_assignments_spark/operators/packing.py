"""Sequence packing — documents → fixed-token-budget training shards.

The last step of every LLM pretraining pipeline: concatenate documents
into training sequences of ``budget`` tokens and record where each
document lands (shard id + starting offset) so the tokenized corpus
can be written as contiguous shards. The naive packer is a single
left-to-right scan over the corpus — inherently sequential, exactly
what does NOT scale.

The scalable formulation: documents are first routed to ``n_buckets``
deterministic hash buckets (a narrow projection — no row's routing
depends on any other row), then each bucket independently applies the
standard concatenate-and-chunk rule — documents in deterministic
(hash, id) order form one virtual token stream, cut every ``budget``
tokens; a document belongs to the chunk containing its first token
(its tail may cross the cut, exactly as GPT-style packed pretraining
batches do). Consequences:

- the only exchange is the per-bucket window sort; 100 TB packs as
  ``n_buckets`` independent streams and adding buckets adds
  parallelism;
- the assignment is a pure function of (doc set, budget, n_buckets) —
  reruns, engines, and partitionings all agree (the same determinism
  contract as operators/sampling), which is what makes resumable /
  verifiable tokenization runs possible;
- hash order doubles as shuffling: consecutive documents in a shard
  are unrelated, the property packed-batch training wants anyway.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.hashing import h60

__all__ = ["pack_sequences", "write_packed_shards", "read_shard"]


def pack_sequences(
    docs: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Assign each document a training shard:
    ``(<id_col>, <token_col>, bucket, shard_id, offset)``.

    ``shard_id`` is globally unique (``bucket * 2^32 + local chunk``);
    ``offset`` is the document's first-token position within its shard
    (always < ``budget``). With the exclusive prefix sum ``start =
    cumsum - tokens`` over the bucket's (hash, id)-ordered stream, the
    chunk rule is the closed form ``local = start // budget``,
    ``offset = start - local * budget`` — no iteration, no driver
    state. Documents with NULL ids or NULL/negative token counts are
    excluded; zero-token documents ride along at their stream
    position.

    Plan shape: one window exchange keyed on ``bucket`` (64-ary by
    default — tune toward cluster width), then narrow arithmetic.
    No collect, no skew beyond the hash's own uniformity.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    t = F.col(token_col).cast("long")
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col("__h"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = (
        docs.where(t.isNotNull() & (t >= 0) & F.col(id_col).isNotNull())
        .withColumn("__h", h60(F.col(id_col).cast("string")))
        .withColumn("bucket", F.pmod(F.col("__h"), F.lit(n_buckets)).cast("int"))
        .withColumn("__start", F.sum(t).over(w) - t)
    )
    local = (F.col("__start") / F.lit(budget)).cast("long")
    return with_cum.select(
        F.col(id_col),
        t.alias(token_col),
        "bucket",
        (F.col("bucket").cast("long") * F.lit(1 << 32) + local).alias("shard_id"),
        (F.col("__start") - local * F.lit(budget)).cast("long").alias("offset"),
    )


def write_packed_shards(
    docs: DataFrame,
    token_col: str,
    budget: int,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
    payload_cols: tuple[str, ...] = (),
) -> None:
    """Materialize :func:`pack_sequences` as a shard-addressable layout:
    zstd Parquet partitioned by ``bucket`` (one directory per packing
    stream), rows sorted by ``(shard_id, offset)`` within each file so
    a shard's documents are physically contiguous — a tokenizer
    worker streams its shard without a sort. ``payload_cols`` ride
    along (e.g. the text) so the layout is self-contained.

    The assignment join is on ``id_col`` — at scale prefer passing the
    payload columns on ``docs`` directly (they flow through the one
    window exchange) over re-joining a separate table afterwards.
    """
    assigned = pack_sequences(docs, token_col, budget, id_col, n_buckets)
    if payload_cols:
        assigned = assigned.join(
            docs.select(id_col, *payload_cols), id_col
        )
    (
        assigned.repartition("bucket")
        .sortWithinPartitions("shard_id", "offset")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .option("compression", "zstd")
        .parquet(path)
    )


def read_shard(spark, path: str, shard_id: int) -> DataFrame:
    """Read ONE training shard from a :func:`write_packed_shards`
    layout. The bucket is recoverable from the shard id
    (``shard_id >> 32``), so the filter prunes to a single partition
    directory — the scan touches 1/n_buckets of the layout no matter
    how large the corpus (asserted by plan test, same contract as the
    IVF index probe)."""
    return (
        spark.read.parquet(path)
        .where(F.col("bucket") == (shard_id >> 32))
        .where(F.col("shard_id") == shard_id)
        .orderBy("offset")
    )
