#!/usr/bin/env python
"""Time ONE registered query at one sf_dir in a FRESH process.

Heavy scale probes (sf1/sf3/sf10) must each run in their own JVM —
successive heavy runs in a shared local JVM hit heap pressure and
skew the reading (round-8 lesson, docs/SCALE.md). This wraps the
bench's noop-sink timing for a single (query, sf_dir, partitions)
triple and prints one JSON line.

Usage:
  python tools/probe_one.py QUERY SF_DIR [--partitions N] [--runs K]

``--partitions`` sizes ``spark.sql.shuffle.partitions`` — scale it
with the data (the local default of 32 = one per core is tuned for
sf0.1; a 30x input wants proportionally more reduce-side partitions,
exactly what AQE picks on a real cluster from map output stats).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--runs", type=int, default=1)
    args = ap.parse_args()

    from mapreduce_assignments_spark import workloads
    from mapreduce_assignments_spark.session import get_spark

    spark = get_spark("probe-one", shuffle_partitions=args.partitions)
    # warm the session the same way bench.py does (JVM + parquet
    # footer caches), on a query other than the probed one
    warm = "word_count" if args.query != "word_count" else "pricing_summary"
    workloads.ALL_QUERIES[warm](spark, args.sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    times = []
    for _ in range(args.runs):
        t0 = time.time()
        df = workloads.ALL_QUERIES[args.query](spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
    print(json.dumps({
        "query": args.query,
        "sf_dir": args.sf_dir,
        "partitions": args.partitions,
        "times": times,
        "best": min(times),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
