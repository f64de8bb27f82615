"""Parquet table loaders for the driver-generated TPC-H-ish testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.

At 100 TB each of these would be a partitioned parquet dataset; the
loader is path-based so nothing changes except the path (and Spark's
vectorized parquet reader + partition pruning take over).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The driver's parquet has stored timestamps as TIMESTAMP(NANOS) in
# some rounds and as TIMESTAMP(MICROS, isAdjustedToUTC=false) in
# others; the loader normalizes EITHER encoding to a TimestampType
# (UTC instant) column at microsecond precision, matching what DuckDB
# renders for the same file. Callers never see the physical encoding.
_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Both confs are runtime-settable SQL confs; callers' sessions
    # (the correctness harness builds its own vanilla SparkSession)
    # won't have them. Without nanosAsLong the vectorized reader
    # rejects TIMESTAMP(NANOS) columns outright [PARQUET_TYPE_ILLEGAL].
    # The UTC pin makes hour()/month()/date_format() over these
    # timestamps — and the NTZ→instant cast below — agree with the
    # tz-naive DuckDB oracles regardless of the host session's default
    # timezone: the engine's documented contract is "all timestamps
    # are UTC instants".
    if name in _TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _TS_COLS.get(name, ()):
        if col not in df.columns:
            continue
        dt = dict(df.dtypes)[col]
        if dt == "bigint":  # TIMESTAMP(NANOS) read via nanosAsLong
            df = df.withColumn(
                col, F.expr(f"timestamp_micros(CAST({col} DIV 1000 AS BIGINT))")
            )
        elif dt == "timestamp_ntz":
            # isAdjustedToUTC=false micros: the wall-clock digits ARE
            # the UTC instant; under the UTC session pin above this
            # cast is value-preserving (and unlocks unix_micros &
            # streaming event-time, which require TimestampType).
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries work."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
