from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mapreduce_assignments_spark.functions.telemetry import graph_counters, observed


def test_observed_counts_rows_and_bytes(spark, docs):
    obs, df = observed(
        docs,
        "scan",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.length("text")).alias("chars"),
    )
    n = df.count()
    got = obs.get
    assert got["rows"] == n == 6
    assert got["chars"] == sum(len(t) for _, t in [
        (0, "the quick brown fox jumps over the lazy dog"),
        (9, "the quick brown fox"),
        (100, "pack my box with five dozen liquor jugs"),
        (200, "the dog barks at the fox"),
        (300, ""),
        (400, "fox fox fox"),
    ])


def test_observed_requires_metrics(docs):
    with pytest.raises(ValueError):
        observed(docs, "empty")


def test_graph_counters(spark):
    g = spark.createDataFrame(
        [(1, [2, 3]), (2, [1]), (3, []), (4, [1, 2, 3])],
        "id int, adj array<int>",
    )
    obs, gdf = graph_counters(g)
    gdf.count()
    got = obs.get
    assert got == {"nodes": 4, "edges": 6, "dangling": 1}
