#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is materialized through the noop sink so the whole plan
(including final projections) executes — a bare ``count()`` would let
Catalyst prune the expensive columns.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from mapreduce_assignments_spark import workloads  # noqa: E402
from mapreduce_assignments_spark.session import get_spark  # noqa: E402

HEADLINE = (
    "word_count",
    "cooccurrence",
    "pmi",
    "inverted_index_stats",
    "boolean_retrieval",
    "hourly_counts",
    "pricing_summary",
    "top_revenue_orders",
    "revenue_by_nation",
    "user_sessions",
    "event_props_stats",
    "top_orders_per_customer",
    "exact_duplicates",
    "minhash_lsh_candidates",
    "simhash",
    "simhash_near_dupes",
    "quality_score",
    "doc_fingerprint",
    "brute_force_topk",
    "pagerank",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    # one warm-up action so JVM/codegen startup isn't billed to query 1
    workloads.q_word_count(spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        df = workloads.ALL_QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
