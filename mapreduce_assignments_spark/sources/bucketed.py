"""Bucketed table layout — the co-located-join primitive.

At 100 TB the single most expensive repeated cost is re-shuffling the
same fact table on the same key for every join. Spark's answer is
bucketing: write the table hash-partitioned AND sorted by the join key
(``bucketBy`` + ``sortBy``); any later equi-join or aggregation on
that key reads co-located buckets and skips the exchange entirely
(the reference gets the same effect from partition-stable
NonSplitableSequenceFileInputFormat, RunPageRankBasic.java:464-478).

``tests/test_bucketed.py`` proves the contract: a join of two tables
bucketed on the same key compiles to a SortMergeJoin with ZERO
Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    managed parquet table. ``buckets`` should be sized so one bucket
    of the LARGEST co-bucketed table fits an executor's memory."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact
    (plain ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(table)
