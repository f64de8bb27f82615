#!/usr/bin/env python
"""Benchmark the engine's queries.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line (the last stdout
line) with per-query seconds.

Noise-proofing (round-4 VERDICT item 1): the bench box runs under
variable load and single-shot timings swing ±40% on unchanged code,
which made round-over-round comparisons unfalsifiable. Each query now
runs ``--runs`` times (default 3) back-to-back; the reported per-query
number is the MIN (round-13 VERDICT item 4 — the same estimator the
trend gate uses, so the headline and ``--check`` can no longer tell
opposite stories about one query), with medians and every raw sample
preserved:

- stdout JSON: ``queries`` = minima, ``value`` = Σ minima,
  ``queries_median``/``value_median`` = the pre-r14 median series,
  ``runs`` = repetition count;
- ``docs/bench_trend.jsonl`` gets one appended record per invocation
  with the full raw sample matrix, so any future regression can be
  tested against the distribution, not a point.

``--full`` times EVERY registered query (ALL_QUERIES — the 50-entry
driver window plus EXTRA_QUERIES) ``--full-runs`` times each (default
2, reported number = per-query MIN — round-12 VERDICT item 2) with
per-family subtotals and writes ``docs/bench_full_sf{sf}.json`` —
perf visibility for the queries the headline never timed.

Each query is materialized through the noop sink so the whole plan
(including final projections) executes — a bare ``count()`` would let
Catalyst prune the expensive columns.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
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

# family per query for --full subtotals (name-prefix/keyword rules
# would misfile e.g. simhash vs simhash_near_dupes; explicit is safer)
FAMILIES: dict[str, tuple[str, ...]] = {
    "text": (
        "word_count", "bigram_count", "cooccurrence", "cooccurrence_stripes",
        "pmi", "llr", "zipf_fit", "length_histogram",
    ),
    "index_retrieval": (
        "inverted_index_stats", "tf_histogram", "tf_idf", "term_frequencies",
        "boolean_retrieval", "boolean_retrieval_text", "bm25_topk",
        "top_keywords", "query_likelihood", "rrf_fusion", "phrase_search",
        "prefix_search", "mrr_eval",
    ),
    "timeseries": (
        "hourly_counts", "hourly_counts_errors", "hourly_counts_tweets",
        "hourly_counts_tweets_egypt", "hypertable_rollup",
        "sliding_hourly_stats", "value_percentiles", "asof_join", "range_join",
        "dense_hourly_counts", "scd2_history", "latest_events",
        "snapshot_diff", "hourly_anomalies", "normalize_events",
        "point_in_time_state",
        "rolling_active_users", "daily_trend", "ewma_hourly",
        "seasonal_anomalies", "incremental_rollup", "interpolate_gaps",
        "hourly_top_movers", "activity_heatmap", "slo_burn_rate",
    ),
    "relational": (
        "pricing_summary", "forecast_revenue", "top_revenue_orders", "revenue_by_nation",
        "sql_revenue_by_nation", "top_orders_per_customer",
        "customers_without_orders", "salted_order_revenue",
        "bucketed_customer_orders", "user_sessions", "event_props_stats",
        "funnel_counts", "cohort_retention", "brand_nation_revenue",
        "late_orders_by_priority", "top_return_customers", "session_stats", "co_engagement",
        "event_cube", "shipping_priority", "promo_revenue", "session_paths",
        "ab_test_zscore", "order_gap_stats", "user_purge_report", "basket_lift",
        "transition_latency", "linear_attribution", "interarrival_rates",
        "conversion_by_activity",
        "nation_trade_balance", "discount_effectiveness",
        "large_volume_orders", "part_bracket_revenue", "event_transitions",
        "user_entropy", "conversion_lag", "revenue_share",
        "revenue_lag_features", "volume_shipping", "market_share",
        "customer_distribution", "top_supplier", "small_quantity_revenue",
        "revenue_rollup", "last_touch_attribution", "rfm_segments",
        "rolling_weekly_revenue", "yoy_growth", "lines_per_order_histogram",
        "customer_growth_topk", "order_size_correlation", "region_nation_share",
        "prospective_customers", "pareto_report",
    ),
    "graph": (
        "pagerank", "personalized_pagerank", "degree_histogram",
        "triangle_count", "graph_components", "kcore",
        "hits", "bfs_hops", "clustering_coefficient", "link_prediction",
        "degree_assortativity", "pagerank_convergence", "harmonic_centrality",
        "lpa_communities",
        "component_size_histogram",
    ),
    "dedup": (
        "exact_duplicates", "shingles", "ngram_jaccard", "minhash_signatures",
        "minhash_lsh_candidates", "simhash", "simhash_near_dupes",
        "dedup_clusters", "contamination_flags", "dedup_apply",
        "curated_corpus", "split_leakage", "incremental_dedup",
        "verified_near_dupes", "eval_substring_hits", "bloom_decontamination",
        "minhash_calibration", "containment_pairs", "source_overlap",
        "ngram_novelty", "record_linkage", "record_linkage_topk",
        "cluster_canonical", "dup_span_report",
        "prefix_jaccard", "dedup_savings", "semantic_decontamination",
        "winnowing_fingerprints", "winnowing_candidates",
        "dedup_threshold_curve",
    ),
    "similarity": (
        "brute_force_topk", "ivf_assign", "ivf_topk_trained",
        "ivf_index_probe", "embedding_near_dupes", "lsh_topk",
        "quantize_embeddings", "ivf_recall_report", "label_centroids",
        "centroid_confusion", "random_projection", "hard_negatives",
        "label_spread", "semantic_dedup", "knn_label_accuracy",
        "embedding_covariance", "quantization_error", "index_shard_balance",
        "nn_similarity_histogram", "margin_bitext", "matryoshka_recall",
        "embedding_pca", "mutual_knn_pairs",
    ),
    "text_quality": (
        "token_counts", "quality_score", "nb_quality_confusion", "language_id", "doc_fingerprint",
        "repetition_stats", "pii_scrub", "chunk_documents",
        "source_stats", "lang_source_matrix", "top_terms_per_source",
        "unigram_logprob", "bigram_logprob", "oov_rate",
        "sentence_stats", "heldout_logprob", "filter_funnel",
        "filter_funnel_examples", "sentence_dedup_stats",
        "vocab_coverage", "idf_drift", "char_entropy", "language_id_accuracy",
        "vocab_overlap_matrix", "quality_length_correlation",
        "perplexity_buckets", "gopher_quality_gate", "heaps_law_fit",
    ),
    "sketches": ("kmv_distinct", "countmin_words"),
    "skew_diag": ("key_skew_report",),
    "validation": ("profile_events", "robust_outliers", "length_drift_psi",
                   "k_anonymity", "winsorize_values", "dp_event_counts",
                   "numeric_percentiles_profile", "corpus_card"),
    "packing": ("pack_sequences", "packing_efficiency"),
    "features": (
        "hashing_tf", "hashing_tfidf", "hashing_tf_cells",
        "hashing_tfidf_cells", "bpe_merges", "bpe_merges_local",
        "bpe_vocab", "bpe_token_counts", "tokenizer_fertility",
        "value_buckets", "target_encoding", "span_corruption",
        "hash_collision_report",
    ),
    "sampling": (
        "hash_split", "deterministic_sample", "stratified_sample",
        "weighted_sample", "per_key_sample", "shuffle_shards",
        "balance_classes", "corpus_mix", "temporal_split", "temperature_mix",
        "dsir_weights", "unimax_allocation",
    ),
    "multimodal": (
        "image_stats", "png_decode_stats", "jpeg_decode_stats", "phash_duplicates", "media_sniff", "frame_sample",
        "audio_stats", "resize_images", "aspect_ratio_histogram",
    ),
    "streaming": (
        "streaming_hourly_counts", "streaming_user_sessions",
        "streaming_dedup", "streaming_interval_join",
        "streaming_snapshot_sink", "streaming_enriched_counts",
        "streaming_latest_events", "streaming_sliding_counts",
        "streaming_countmin", "streaming_top_users",
        "streaming_session_stats", "streaming_quality_gate",
    ),
    "sources": ("jsonl_roundtrip", "csv_roundtrip", "orc_roundtrip",
                "schema_evolution", "csv_malformed_report",
                "manifest_ingest", "compact_small_files"),
}
_FAMILY_OF = {q: fam for fam, qs in FAMILIES.items() for q in qs}


def _time_query(spark, sf_dir: str, name: str) -> float:
    t0 = time.time()
    df = workloads.ALL_QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _git_rev() -> str | None:
    try:
        import subprocess

        return subprocess.run(
            ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:  # noqa: BLE001 — telemetry only
        return None


def _append_trend(record: dict) -> None:
    try:
        record.setdefault("git_rev", _git_rev())
        out = REPO / "docs" / "bench_trend.jsonl"
        out.parent.mkdir(exist_ok=True)
        with out.open("a") as f:
            f.write(json.dumps(record) + "\n")
    except OSError as e:  # a read-only checkout must not fail the bench
        print(f"# trend append skipped: {e}", file=sys.stderr)


def check_trend(
    trend_path: Path, threshold: float = 2.0, abs_floor: float = 0.3
) -> list[str]:
    """CI-style regression gate over ``docs/bench_trend.jsonl``: for
    each query in the LATEST record, fail if its per-query MIN exceeds
    the best min of any EARLIER record **with the same git revision**
    (i.e. on unchanged code — a slowdown across a code change may be a
    deliberate trade; one on the same commit is environment or a
    Spark-conf regression) by more than ``threshold``x AND by more
    than ``abs_floor`` seconds (sub-second queries double on scheduler
    noise alone). Mins, not medians (round-12 VERDICT item 2): the
    r12 same-day full-bench runs swung ±40% per query on identical
    code, and the min of N back-to-back runs is the stable noise-floor
    estimator. Returns one message per regression; empty = pass."""
    records = []
    with trend_path.open() as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    if len(records) < 2:
        return []
    latest = records[-1]
    prior = [
        r for r in records[:-1]
        if r.get("git_rev") and r.get("git_rev") == latest.get("git_rev")
        and r.get("mode") == latest.get("mode") and r.get("sf") == latest.get("sf")
    ]
    if latest.get("mode") == "only":
        # --only runs time arbitrary subsets: two same-rev runs over
        # DIFFERENT subsets ran under different concurrent-load
        # profiles, so their medians aren't comparable — gate only
        # against priors that timed the exact same query set
        want = set(latest.get("samples", {}))
        prior = [r for r in prior if set(r.get("samples", {})) == want]
    if not prior:
        return []
    regressions = []
    for name, samples in latest.get("samples", {}).items():
        cur = min(samples)
        best = min(
            (
                min(r["samples"][name])
                for r in prior
                if name in r.get("samples", {})
            ),
            default=None,
        )
        if best is None:
            continue
        if cur > threshold * best and cur - best > abs_floor:
            regressions.append(
                f"{name}: min {cur:.3f}s vs best {best:.3f}s on "
                f"rev {latest.get('git_rev')} (> {threshold}x)"
            )
    return regressions


# Sub-2s queries swing ±25% run-to-run on this box (scheduler noise >
# real work), which made >10% regression statuses flap on queries with
# byte-identical plans (r15 VERDICT item 6). Queries whose fastest
# sample lands under the threshold get extra back-to-back runs (up to
# _FAST_QUERY_RUNS total, ~1-2s each) so the reported min is a stable
# noise-floor estimate. Additions-only: slower queries keep the base
# --runs count and the JSON shape is unchanged.
_FAST_QUERY_THRESHOLD_SEC = 2.0
_FAST_QUERY_RUNS = 5


def run_headline(spark, sf_dir: str, sf, runs: int) -> int:
    samples: dict[str, list[float]] = {}
    for name in HEADLINE:
        samples[name] = [_time_query(spark, sf_dir, name) for _ in range(runs)]
        while (
            min(samples[name]) < _FAST_QUERY_THRESHOLD_SEC
            and len(samples[name]) < _FAST_QUERY_RUNS
        ):
            samples[name].append(_time_query(spark, sf_dir, name))
        print(f"# {name}: {samples[name]}", file=sys.stderr)
    medians = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    minima = {n: round(min(s), 3) for n, s in samples.items()}
    _append_trend({
        "ts": time.time(),
        "mode": "headline",
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "runs": runs,
        "samples": samples,
    })
    # round-13 VERDICT item 4: the headline `value`/`queries` now use
    # the SAME estimator as the trend gate (per-query MIN of N
    # back-to-back runs — the standard noise-floor estimator on this
    # box's ±40% single-sample churn); medians stay as secondary keys
    # so BENCH_r13-and-earlier medians remain comparable.
    print(json.dumps({
        "metric": "headline_total",
        "value": round(sum(minima.values()), 3),
        "unit": "sec",
        "queries": minima,
        "queries_median": medians,
        "value_median": round(sum(medians.values()), 3),
        "runs": runs,
        "sf": sf,
    }))
    return 0


def run_full(
    spark, sf_dir: str, sf, only: list[str] | None = None, runs: int = 2
) -> int:
    """Time every query ``runs`` times; report the per-query MIN.

    Round-12 VERDICT item 2: the two same-day r12 full-bench runs
    moved 4.3% total with ±40% per-query swings on identical code —
    a single sample per query cannot distinguish a real 1.5x
    regression from box churn. The min of N back-to-back runs is the
    standard noise floor estimator (same rationale as the headline
    bench's min-of-3); the raw sample matrix still lands in
    ``docs/bench_trend.jsonl`` for distribution-level comparisons.
    """
    samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in (only or workloads.ALL_QUERIES):
        try:
            samples[name] = [
                _time_query(spark, sf_dir, name) for _ in range(runs)
            ]
            print(f"# {name}: {samples[name]}", file=sys.stderr)
        except Exception as e:  # keep timing the rest; surface at the end
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
    times = {n: min(s) for n, s in samples.items()}
    fam_totals: dict[str, float] = {}
    for name, t in times.items():
        fam = _FAMILY_OF.get(name, "other")
        fam_totals[fam] = round(fam_totals.get(fam, 0.0) + t, 3)
    result = {
        "metric": "full_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "families": fam_totals,
        "errors": errors,
        "n_queries": len(times),
        "runs": runs,
        "sf": sf,
    }
    if only is None:  # a partial run must not clobber the full record
        try:
            out = REPO / "docs" / f"bench_full_sf{sf}.json"
            out.parent.mkdir(exist_ok=True)
            out.write_text(json.dumps(result, indent=2) + "\n")
        except OSError as e:
            print(f"# full-bench write skipped: {e}", file=sys.stderr)
    _append_trend({
        "ts": time.time(),
        "mode": "full" if only is None else "only",
        "sf": sf,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "runs": runs,
        "samples": samples,
    })
    print(json.dumps(result))
    return 1 if errors else 0


# The sf0.1 headline cannot show scaling: at that size every query is
# driver/scheduling-bound (7 of 20 run FASTER on 8 cores than 32 —
# PERF_r15 scaling block). Scale evidence lives at sf1: the fixed list
# below covers the operator families whose 100 TB shape actually moves
# with input size (graph iteration loops, dedup verify joins, ANN cell
# scoring, the calibration join). Each query runs in its OWN JVM
# (tools/probe_one.py — round-8 lesson: successive heavy probes in a
# shared local JVM hit heap pressure), min-of---full-runs, recorded to
# docs/scale_probe_sf1.json + the trend file (mode "scale-probe").
SCALE_PROBE_QUERIES = (
    "pagerank", "kcore", "bfs_hops", "harmonic_centrality",
    "record_linkage", "minhash_calibration", "verified_near_dupes",
    "ivf_topk_trained", "mutual_knn_pairs", "embedding_near_dupes",
    "dedup_savings",
)


def run_scale_probe(sf_dir: str, runs: int) -> int:
    import subprocess

    if not Path(sf_dir).is_dir():
        print(json.dumps({
            "metric": "scale_probe", "value": None, "unit": "sec",
            "note": f"no sf1 replica at {sf_dir} — run tools/make_sf1.py",
        }))
        return 2
    samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in SCALE_PROBE_QUERIES:
        cmd = [sys.executable, str(REPO / "tools" / "probe_one.py"),
               name, sf_dir, "--runs", str(runs)]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800
            )
            # progress-bar carriage returns can dirty piped stdout:
            # take the last line that parses as JSON
            rec = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    rec = json.loads(line)
                    break
                except json.JSONDecodeError:
                    continue
            if rec is None:
                raise ValueError(
                    f"no JSON line in probe output (rc={proc.returncode})"
                )
            samples[name] = rec["times"]
            print(f"# {name}: {samples[name]}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — keep probing the rest
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
    times = {n: min(s) for n, s in samples.items()}
    result = {
        "metric": "scale_probe",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "errors": errors,
        "runs": runs,
        "sf": 1.0,
        "sf_dir": sf_dir,
    }
    try:
        out = REPO / "docs" / "scale_probe_sf1.json"
        out.parent.mkdir(exist_ok=True)
        out.write_text(json.dumps(result, indent=2) + "\n")
    except OSError as e:
        print(f"# scale-probe write skipped: {e}", file=sys.stderr)
    _append_trend({
        "ts": time.time(),
        "mode": "scale-probe",
        "sf": 1.0,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
        "runs": runs,
        "samples": samples,
    })
    print(json.dumps(result))
    return 1 if errors else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="time every registered query once")
    ap.add_argument("--runs", type=int, default=3, help="repetitions per headline query")
    ap.add_argument(
        "--full-runs", type=int, default=2,
        help="repetitions per query in --full/--only mode (reported "
        "number is the min — single samples swing ±40% on box churn)",
    )
    ap.add_argument(
        "--only", nargs="+", metavar="QUERY",
        help="time just these registered queries once each (full-mode "
        "machinery, but skips the docs/bench_full_*.json write)",
    )
    ap.add_argument(
        "--scale-probe", action="store_true",
        help="time SCALE_PROBE_QUERIES at the sf1 replica (one fresh "
        "JVM per query via tools/probe_one.py) and record "
        "docs/scale_probe_sf1.json — the scaling evidence the sf0.1 "
        "headline cannot provide (r15 VERDICT item 5)",
    )
    ap.add_argument(
        "--scale-dir", default=str(REPO / ".localdata" / "sf1"),
        help="data directory for --scale-probe (default .localdata/sf1)",
    )
    ap.add_argument(
        "--check", action="store_true",
        help="no timing: gate on docs/bench_trend.jsonl — fail if any "
        "query in the latest record regressed >2x vs its best same-"
        "git-rev median (see check_trend)",
    )
    args = ap.parse_args()

    if args.scale_probe:
        return run_scale_probe(args.scale_dir, max(1, args.full_runs))

    if args.check:
        trend = REPO / "docs" / "bench_trend.jsonl"
        if not trend.exists():
            print(json.dumps({"metric": "trend_check", "value": 0, "unit": "regressions", "note": "no trend file"}))
            return 0
        regs = check_trend(trend)
        for r in regs:
            print(f"# REGRESSION {r}", file=sys.stderr)
        print(json.dumps({"metric": "trend_check", "value": len(regs), "unit": "regressions", "regressions": regs}))
        return 1 if regs else 0

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")
    # one warm-up action so JVM/codegen startup isn't billed to query 1
    workloads.q_word_count(spark, sf_dir).write.format("noop").mode("overwrite").save()

    if args.only:
        unknown = [n for n in args.only if n not in workloads.ALL_QUERIES]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        return run_full(
            spark, sf_dir, sf, only=args.only, runs=max(1, args.full_runs)
        )
    if args.full:
        return run_full(spark, sf_dir, sf, runs=max(1, args.full_runs))
    return run_headline(spark, sf_dir, sf, max(1, args.runs))


if __name__ == "__main__":
    raise SystemExit(main())
