"""Job counters / telemetry — the Spark analogue of the reference's
Hadoop counters (RunPageRankBasic.java:79-81 enumerates nodes, edges,
massMessages, ... and reads them back in the driver at :114).

Spark's native mechanism is ``DataFrame.observe``: named aggregate
expressions evaluated as the plan streams past, collected at zero
extra cost with the first action on the observed DataFrame — no second
job, no accumulator double-count on task retry (observe metrics are
exactly-once per successful action, unlike raw accumulators).

Usage::

    from pyspark.sql import Observation
    obs, df = observed(df, "scan", F.count(F.lit(1)).alias("rows"),
                       F.sum("n_bytes").alias("bytes"))
    df.write.parquet(...)          # any action
    obs.get                       # {'rows': ..., 'bytes': ...}

``graph_counters`` reproduces the reference's PageRank preamble
counters (node/edge/dangling counts) as one observed pass.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation

__all__ = ["observed", "graph_counters"]


def observed(df: DataFrame, name: str, *metrics: Column):
    """Attach named metrics to a DataFrame plan. Returns
    ``(observation, df)``; read ``observation.get`` after any action on
    the returned DataFrame."""
    if not metrics:
        raise ValueError("at least one metric expression is required")
    obs = Observation(name)
    return obs, df.observe(obs, *metrics)


def graph_counters(graph: DataFrame):
    """Observe the reference's PageRank structural counters over a
    ``(id, adj)`` graph in a single pass: ``nodes``, ``edges``,
    ``dangling`` (outdegree-0 nodes). Returns ``(observation, df)`` —
    run any action on the df (e.g. the pagerank prepare count) and read
    ``observation.get``."""
    return observed(
        graph,
        "graph_counters",
        F.count(F.lit(1)).alias("nodes"),
        F.sum(F.size("adj")).alias("edges"),
        F.sum(F.when(F.size("adj") == 0, 1).otherwise(0)).alias("dangling"),
    )
