"""KMV distinct-count sketch: deterministic, portable, and actually
an estimator (bounded relative error once the sketch is full)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_assignments_spark.operators.sketches import kmv_distinct


def test_kmv_exact_below_k(spark):
    rows = [(f"v{i % 10}", "g") for i in range(100)]
    df = spark.createDataFrame(rows, "key string, grp string")
    [r] = kmv_distinct(df, "key", "grp", k=64).collect()
    assert r["n_kept"] == 10
    assert r["est_distinct"] == 10.0  # degrades to exact below k


def test_kmv_estimates_within_bound(spark):
    # 5000 true distinct, k=64: KMV stderr ~ 1/sqrt(k-2) ≈ 12.7%.
    # The estimate is DETERMINISTIC (hash-driven), so this asserts a
    # fixed number lands inside a generous 3-sigma band — a real
    # statistical contract, not a tautology.
    df = spark.range(5000).select(
        F.concat(F.lit("tok"), F.col("id")).alias("key"), F.lit("g").alias("grp")
    )
    [r] = kmv_distinct(df, "key", "grp", k=64).collect()
    assert r["n_kept"] == 64
    assert abs(r["est_distinct"] - 5000) / 5000 < 0.38


def test_kmv_partitioning_invariant(spark):
    df = spark.range(2000).select(
        F.concat(F.lit("t"), F.col("id")).alias("key"),
        (F.col("id") % 3).cast("string").alias("grp"),
    )
    a = {r["grp"]: r["est_distinct"] for r in kmv_distinct(df, "key", "grp").collect()}
    b = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(df.repartition(17), "key", "grp").collect()
    }
    assert a == b
    assert len(a) == 3


def test_kmv_validates(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(ValueError):
        kmv_distinct(df, "key", "key", k=1)


def test_kmv_window_is_group_limited(spark):
    """Spark must plan the rn<=k filter as WindowGroupLimit (partial
    per-group top-k BEFORE the exchange) — the property that makes the
    sketch cheap at 100 TB."""
    df = spark.range(1000).select(
        F.concat(F.lit("t"), F.col("id")).alias("key"),
        (F.col("id") % 3).cast("string").alias("grp"),
    )
    plan = kmv_distinct(df, "key", "grp")._jdf.queryExecution().executedPlan().toString()
    # (with a CONSTANT group the partition spec folds away and Spark
    # plans an even cheaper global TakeOrderedAndProject instead)
    assert "WindowGroupLimit" in plan


def test_count_min_never_undercounts_and_is_exact_without_collisions(spark):
    import pyspark.sql.functions as F

    from mapreduce_assignments_spark.operators.sketches import (
        count_min_counters,
        count_min_estimate,
    )

    rows = [(w,) for w in ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]]
    items = spark.createDataFrame(rows, "word string")
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "word string")
    # wide sketch: 4 keys in 4x1024 cells -> collisions vanishingly
    # unlikely, estimates are exact
    counters = count_min_counters(items, "word", width=1024, depth=4)
    est = {
        r["word"]: r["estimate"]
        for r in count_min_estimate(counters, probes, "word", 1024, 4).collect()
    }
    assert est == {"a": 5, "b": 3, "c": 2, "d": 1}
    # 1-wide sketch: everything collides into one cell per row ->
    # every estimate is the total count (the never-undercount bound,
    # saturated)
    c1 = count_min_counters(items, "word", width=1, depth=4)
    est1 = {
        r["word"]: r["estimate"]
        for r in count_min_estimate(c1, probes, "word", 1, 4).collect()
    }
    assert est1 == {"a": 11, "b": 11, "c": 11, "d": 11}
    # counter frame is the fixed sketch size, never the key space
    assert count_min_counters(items, "word", width=8, depth=4).count() <= 4 * 8
