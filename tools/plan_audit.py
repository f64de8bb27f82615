#!/usr/bin/env python
"""Physical-plan health audit across the driver queries.

For every query in ``workloads.QUERIES``, prints one line with the
plan's scale-relevant facts:

- join strategies (broadcast vs sort-merge vs shuffled-hash),
- exchange (shuffle) count,
- whether parquet filters were pushed down (when the query filters),
- whether any Python evaluation appears in the plan (hot-path UDF
  smell — only the two sanctioned Pandas stages may show it),
- WholeStageCodegen span count.

Usage: python tools/plan_audit.py [--sf 0.001] [--only name]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mapreduce_assignments_spark import workloads  # noqa: E402
from mapreduce_assignments_spark.session import get_spark  # noqa: E402

# queries allowed to show Python evaluation in their plan (Arrow UDF
# stages by design)
# the sanctioned Arrow-batched pipelines — most touch pixels, which is
# exactly what the Pandas-UDF path is for
PYTHON_OK = {
    "image_stats", "png_decode_stats", "jpeg_decode_stats", "phash_duplicates", "frame_sample", "resize_images",
    "mjpeg_frame_stats", "mp4_frame_text",
    # real-container STAGING is an Arrow encode stage (the sniff /
    # header-parse itself stays JVM-side)
    "media_sniff", "aspect_ratio_histogram",
    # in-partition BPE trainer: the whole point is ONE mapInPandas
    # over the (memory-sized) word-count vocabulary instead of
    # O(n_merges) sequential Spark jobs
    "bpe_merges_local",
}


def audit(name: str, plan: str) -> dict:
    return {
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "shj": len(re.findall(r"ShuffledHashJoin", plan)),
        "exchange": len(re.findall(r"Exchange (hash|range|single)", plan)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", plan)),
        "python": bool(re.search(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)),
        # codegen'd operators carry a "*(n)" stage prefix in toString()
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.001")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    sf_dir = f"/root/testdata/sf{args.sf}"
    spark = get_spark("plan-audit")
    names = args.only.split(",") if args.only else list(workloads.ALL_QUERIES)
    bad = []
    for name in names:
        try:
            df = workloads.ALL_QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}"[:200])
            bad.append(name)
            continue
        a = audit(name, plan)
        flags = []
        if a["python"] and name not in PYTHON_OK:
            flags.append("UNSANCTIONED-PYTHON")
            bad.append(name)
        print(
            f"{name}: bhj={a['bhj']} smj={a['smj']} shj={a['shj']} "
            f"exchanges={a['exchange']} pushed_filters={a['pushed']} "
            f"codegen_spans={a['codegen']}"
            + (" python-stage" if a["python"] else "")
            + (" " + ",".join(flags) if flags else "")
        )
    print(f"\n{len(names) - len(bad)}/{len(names)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
