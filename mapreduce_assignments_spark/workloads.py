"""Driver-contract workload registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
extensions) gets a named query over the driver testdata tables and,
wherever the semantics are SQL-expressible, a DuckDB oracle query that
must match row-for-row, value-for-value.

Parity rules applied throughout (both sides identically):

- every computed column is aliased to the same name in Spark and SQL;
- doubles that pass through non-associative float math are rounded to
  6 places on BOTH sides before comparison/ranking;
- Spark INT columns are CAST to INTEGER on the DuckDB side (DuckDB
  defaults count-ish things to BIGINT/HUGEINT);
- dates are rendered as 'yyyy-MM-dd' strings (no tz/arrow ambiguity);
- all hashing is the portable md5 family from functions.hashing, which
  DuckDB reproduces exactly.

Iterative operators (PageRank, PPR, trained IVF) are not one SQL
statement; they are registered without an oracle → the driver records
its weaker rows-only check, and their numeric correctness is covered
by the NumPy/golden oracles in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

import struct

from .functions.hashing import MINHASH_A, MINHASH_B, MINHASH_PRIME, NUM_MINHASHES, h60
from .operators import (
    dedup,
    features,
    funnel,
    graph,
    index,
    multimodal,
    packing,
    profiling,
    relational,
    sampling,
    similarity,
    sketches,
    skew,
    temporal,
    text,
    text_quality,
    timeseries,
)
from .plans.rpn import BooleanQueryPlanner, rpn_to_sql
from .sources.tables import load_table, register_views

# ----------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect)

# whitespace tokens with empties dropped — mirrors text.tokens_array
_TOK = r"list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)"
_H28 = "CAST(CONCAT('0x', substring(md5(shingle), 1, 7)) AS BIGINT)"


def _h60_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


_A_SQL = "[" + ",".join(str(a) for a in MINHASH_A) + "]"
_B_SQL = "[" + ",".join(str(b) for b in MINHASH_B) + "]"

# distinct 3-gram shingles per doc — mirrors dedup.shingles(n=3)
_SHINGLES_3 = f"""
  SELECT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, len(ts) - 1),
             i -> array_to_string(ts[i:i+2], ' ')))) AS shingle
    FROM (SELECT doc_id, {_TOK} AS ts FROM documents)
    WHERE len(ts) >= 3)
"""

# 32 minhashes per doc, flattened (doc_id, i, mh)
_MINHASH_FLAT = f"""
  SELECT doc_id, CAST(g.i AS INTEGER) AS i,
         min(({_A_SQL}[g.i + 1] * h + {_B_SQL}[g.i + 1]) % {MINHASH_PRIME}) AS mh
  FROM (SELECT doc_id, {_H28} AS h FROM ({_SHINGLES_3})),
       generate_series(0, {NUM_MINHASHES - 1}) g(i)
  GROUP BY doc_id, g.i
"""

_BOOLEAN_QUERY = "hash join AND scan OR"  # (hash AND join) OR scan


# split-count memo for _parallelize: the probe physically plans the
# scan (~0.1-0.2 s of driver latency) and its result is a pure
# function of (table files, session split confs), both fixed for a
# process — so probe each table once, not once per query
# construction (r16; the full bench constructs _docs/_emb-guarded
# frames several hundred times). Metadata only — no row, plan, or
# result is cached; a table directory that gains files mid-process
# would at worst keep the old repartition decision (a perf heuristic,
# never a correctness input).
_SCAN_PARTS: dict[tuple[str, str], int] = {}


def _parallelize(df: DataFrame, _memo_key: tuple[str, str] | None = None) -> DataFrame:
    """Small-input parallelization: the testdata documents/embeddings
    parquet is ONE row group, so Spark's byte-based splitting gives a
    single partition and every CPU-heavy narrow transform (shingling,
    minhash, fingerprints, cosine folds) runs on one core. One cheap
    shuffle of the (tiny) input unlocks all cores. At real scale the
    input has far more splits than cores, the branch never fires, and
    no shuffle is added."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    n_parts = _SCAN_PARTS.get(_memo_key) if _memo_key else None
    if n_parts is None:
        # JVM-side partition count (queryExecution().rdd() — physical
        # planning only, no job, no Python-RDD serializer conversion;
        # the Python df.rdd property would bolt a javaToPython stage
        # onto every query's setup).
        n_parts = df._jdf.rdd().getNumPartitions()
        if _memo_key:
            _SCAN_PARTS[_memo_key] = n_parts
    if n_parts < max(2, target // 2):
        return df.repartition(target)
    return df


def _ptable(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """`load_table` + `_parallelize` with the split-count probe
    memoized per (sf_dir, table)."""
    return _parallelize(load_table(spark, sf_dir, name), _memo_key=(sf_dir, name))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ptable(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ptable(spark, sf_dir, "embeddings")


# ----------------------------------------------------------------------------
# queries

def q_word_count(spark, sf_dir):
    return text.word_count(_docs(spark, sf_dir))


def q_bigram_count(spark, sf_dir):
    return text.bigram_count(_docs(spark, sf_dir))


def q_cooccurrence(spark, sf_dir):
    return text.cooccurrence(_docs(spark, sf_dir), window=2)


def q_cooccurrence_stripes(spark, sf_dir):
    out = text.cooccurrence_stripes(_docs(spark, sf_dir), window=2)
    return out.select("a", "stripe_str")


def q_value_percentiles(spark, sf_dir):
    """Exact percentiles of the event value per type — the classic
    analytics rollup; Spark's exact percentile interpolates identically
    to DuckDB's quantile_cont on the same sorted input."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


def q_pmi(spark, sf_dir):
    out = text.pmi(_docs(spark, sf_dir), min_cooccurrence=10)
    return out.select("x", "y", "cnt", F.round("pmi", 6).alias("pmi"))


def q_llr(spark, sf_dir):
    return text.llr(_docs(spark, sf_dir), min_cooccurrence=10)


def q_term_frequencies(spark, sf_dir):
    return index.term_frequencies(_docs(spark, sf_dir))


def q_inverted_index_stats(spark, sf_dir):
    return index.build_inverted_index(_docs(spark, sf_dir)).select("term", "df", "cf")


def q_tf_histogram(spark, sf_dir):
    tfs = index.term_frequencies(_docs(spark, sf_dir))
    return index.tf_histogram(tfs, "join")


def q_tf_idf(spark, sf_dir):
    return index.tf_idf(_docs(spark, sf_dir))


def q_boolean_retrieval(spark, sf_dir):
    tfs = index.term_frequencies(_docs(spark, sf_dir))
    return BooleanQueryPlanner(tfs).plan(_BOOLEAN_QUERY)


def q_hourly_counts(spark, sf_dir):
    return timeseries.hourly_counts_events(_events(spark, sf_dir))


def q_hourly_counts_errors(spark, sf_dir):
    return timeseries.hourly_counts_events(_events(spark, sf_dir), type_regex="error")


def q_pricing_summary(spark, sf_dir):
    # r15: the one-row-group lineitem scan+partial-agg otherwise runs
    # on a single task (guide §2.5); decimal aggregates are
    # order-independent, so the round-robin is value-exact
    return relational.pricing_summary(
        _ptable(spark, sf_dir, "lineitem")
    )


def q_top_revenue_orders(spark, sf_dir):
    out = relational.top_revenue_orders(
        # r15: split the one-row-group big sides (decimal-exact sums,
        # see q_pricing_summary)
        _ptable(spark, sf_dir, "lineitem"),
        _ptable(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        k=10,
    )
    return out.withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))


def q_revenue_by_nation(spark, sf_dir):
    return relational.revenue_by_nation(
        # r15: split the one-row-group big sides (decimal-exact sums,
        # see q_pricing_summary)
        _ptable(spark, sf_dir, "lineitem"),
        _ptable(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_user_sessions(spark, sf_dir):
    return relational.user_sessions(_events(spark, sf_dir), gap_minutes=30)


def q_sql_revenue_by_nation(spark, sf_dir):
    """The SQL-surface twin of revenue_by_nation: the same star join
    expressed as ``spark.sql`` over registered views — demonstrates the
    engine's full SQL front-end (reference's Pig scripts analogue,
    assignment6/assignment6.md:9-55)."""
    register_views(spark, sf_dir)
    return spark.sql(_REVENUE_BY_NATION_SQL)


def q_event_props_stats(spark, sf_dir):
    return timeseries.event_props_stats(_events(spark, sf_dir))


def q_top_orders_per_customer(spark, sf_dir):
    return relational.top_orders_per_customer(load_table(spark, sf_dir, "orders"), k=3)


def q_boolean_retrieval_text(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    tfs = index.term_frequencies(docs)
    return BooleanQueryPlanner(tfs).retrieve(_BOOLEAN_QUERY, docs)


_STAGED_EVENTS: dict[str, str] = {}


def _staged_events_dir(spark, sf_dir: str) -> str:
    """Stage the events table once per (process, sf_dir) as a plain
    micros-timestamp parquet dir for streaming replays. The dir is
    removed at interpreter exit — the round-2 shape (a fresh mkdtemp
    per call, never removed) leaked a staging dir per run and re-wrote
    the table every invocation."""
    if sf_dir not in _STAGED_EVENTS:
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-stream-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        _events(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(stage)
        _STAGED_EVENTS[sf_dir] = stage
    return _STAGED_EVENTS[sf_dir]


# Streaming state-store parallelism for the replay harness. A
# Structured Streaming stateful query creates one state store per
# shuffle partition PER micro-batch; at replay scale the per-store
# setup dominates wall-clock (measured across the whole streaming
# family at sf0.1: 32 -> 8 partitions halves every query — interval
# join 11.4s -> 3.0s). On a cluster this number IS the stream's
# parallelism dial and is sized to sustained throughput, not to 8 —
# the operators themselves are unchanged; only the harness wrapper
# sets it, and restores the session conf afterwards.
_STREAM_STATE_PARTITIONS = 8


def _stream_tuned(fn):
    """Decorator: run a streaming workload with the state-partitioning
    dial set for replay scale (see _STREAM_STATE_PARTITIONS); the
    session's shuffle-partition conf is restored on exit — results are
    already materialized (memory sink / localCheckpoint) by then.

    r16: trailing no-data micro-batches are also disabled for the
    replay. After an ``availableNow`` run drains its last data batch,
    the engine schedules one extra empty batch purely to advance the
    watermark and EVICT state (update-mode aggregations, dedup,
    inner interval joins emit rows only from DATA batches — eviction
    produces no output for these shapes). The replay reads its sink
    AFTER termination and then discards the state store, so that
    final eviction pass is pure cost — measured 0.35-1.6 s per
    stateful query at sf0.1 (durationMs trace: interval_join's
    rows=0 batch was 1.57 s of its 4.2 s). A CONTINUOUS production
    stream keeps the default (eviction latency and append-mode
    finalization matter when nobody restarts the query); this dial —
    like the partition one — is replay-harness scope only and is
    restored on exit."""
    import functools

    @functools.wraps(fn)
    def wrapper(spark, sf_dir):
        prev = spark.conf.get("spark.sql.shuffle.partitions", "200")
        prev_ndb = spark.conf.get(
            "spark.sql.streaming.noDataMicroBatches.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(_STREAM_STATE_PARTITIONS)
        )
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
        try:
            return fn(spark, sf_dir)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndb
            )

    return wrapper


@_stream_tuned
def q_streaming_hourly_counts(spark, sf_dir):
    """The hourly rollup computed by the Structured Streaming engine:
    events re-staged as a micros parquet dir, replayed through the
    file source with an availableNow trigger into a memory sink. Same
    oracle as the batch query — streaming and batch must agree on a
    full replay."""
    from .streaming import read_events_stream, run_to_memory, streaming_hourly_counts

    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    run_to_memory(streaming_hourly_counts(stream), "q_stream_hourly_mem", "update")
    return spark.table("q_stream_hourly_mem")


_STAGED_DUP_EVENTS: dict[str, str] = {}


def _staged_dup_events_dir(spark, sf_dir: str) -> str:
    """Events staged TWICE (append of a second identical copy) — the
    at-least-once-delivery fixture the streaming dedup must collapse
    back to exactly-once."""
    if sf_dir not in _STAGED_DUP_EVENTS:
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-dup-events-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        ev = _events(spark, sf_dir).repartition(4)
        ev.write.mode("overwrite").parquet(stage)
        ev.write.mode("append").parquet(stage)
        _STAGED_DUP_EVENTS[sf_dir] = stage
    return _STAGED_DUP_EVENTS[sf_dir]


@_stream_tuned
def q_streaming_dedup(spark, sf_dir):
    """Streaming exactly-once dedup under the oracle: the input stream
    carries every event twice (duplicated staging); the deduped output
    must equal the plain batch projection of the events table — each
    event exactly once."""
    from .streaming import read_events_stream, run_to_memory, streaming_exact_dedup

    stream = read_events_stream(spark, _staged_dup_events_dir(spark, sf_dir))
    deduped = streaming_exact_dedup(stream).select(
        "event_id", "user_id", "event_type"
    )
    run_to_memory(deduped, "q_stream_dedup_mem", "append")
    return spark.table("q_stream_dedup_mem")


@_stream_tuned
def q_streaming_latest_events(spark, sf_dir):
    """Streaming CDC compaction: the SAME ``temporal.latest_snapshot``
    operator (groupBy + max_by — nothing batch-specific) runs over the
    duplicated event stream in complete mode; the state store IS the
    materialized latest-per-key table, so the memory sink must equal
    the batch ``latest_events`` oracle exactly (duplicates carry an
    identical (ts, event_id) order key and collapse). State is
    O(distinct keys) with no watermark — inherent to materializing
    current state, and exactly what an upsert view needs."""
    from .streaming import read_events_stream, run_to_memory

    stream = read_events_stream(
        spark, _staged_dup_events_dir(spark, sf_dir)
    ).select("user_id", "event_type", "event_id", "ts", "value")
    snap = temporal.latest_snapshot(
        stream, keys=("user_id", "event_type"), ts_col="ts", tiebreak="event_id"
    )
    run_to_memory(snap, "q_stream_latest_mem", "complete")
    return spark.table("q_stream_latest_mem").select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 6).alias("value"),
    )


_STAGED_USER_DIM: dict[str, str] = {}


def _staged_user_dim_dir(spark, sf_dir: str) -> str:
    """A small static dimension (user_id → tier = user_id % 3) staged
    as parquet — the slowly-changing dim a stream-static join enriches
    against."""
    if sf_dir not in _STAGED_USER_DIM:
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-user-dim-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        (
            _events(spark, sf_dir)
            .select("user_id")
            .distinct()
            .withColumn("tier", F.pmod("user_id", F.lit(3)).cast("int"))
            .write.mode("overwrite")
            .parquet(stage)
        )
        _STAGED_USER_DIM[sf_dir] = stage
    return _STAGED_USER_DIM[sf_dir]


@_stream_tuned
def q_streaming_enriched_counts(spark, sf_dir):
    """Stream-static enrichment join: the event stream joins the
    staged user-tier dimension (broadcast, re-resolved per
    micro-batch) and aggregates per tier in complete mode. Oracle =
    the same enrichment as one batch SQL join."""
    from .streaming import read_events_stream, run_to_memory, streaming_enriched_counts

    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    dim = spark.read.parquet(_staged_user_dim_dir(spark, sf_dir))
    run_to_memory(
        streaming_enriched_counts(stream, dim), "q_stream_enrich_mem", "complete"
    )
    return spark.table("q_stream_enrich_mem")


@_stream_tuned
def q_streaming_snapshot_sink(spark, sf_dir):
    """foreachBatch incremental upsert-to-storage: the duplicated
    event stream is replayed ONE FILE PER MICRO-BATCH (>= 8 batches),
    each batch merging into a parquet snapshot at rest via the batch
    latest_snapshot operator; the final snapshot must equal the batch
    latest_events oracle exactly."""
    import shutil
    import tempfile

    from .streaming import EVENTS_SCHEMA, maintain_snapshot

    import atexit

    snap = tempfile.mkdtemp(prefix="mras-snapshot-sink-")
    shutil.rmtree(snap, ignore_errors=True)  # first batch takes the empty path
    atexit.register(shutil.rmtree, snap, ignore_errors=True)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_dup_events_dir(spark, sf_dir))
        .select("user_id", "event_type", "event_id", "ts", "value")
    )
    maintain_snapshot(
        stream, snap, keys=("user_id", "event_type"), ts_col="ts", tiebreak="event_id"
    )
    out = spark.read.parquet(snap).select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 6).alias("value"),
    )
    # materialize before the atexit-free tmp dir could be cleaned
    return out.localCheckpoint(eager=True)


@_stream_tuned
def q_streaming_sliding_counts(spark, sf_dir):
    """Sliding 2h/1h event-time windows over the staged stream in
    complete mode; each event lands in exactly two windows, which the
    batch oracle reproduces by exploding both window starts."""
    from .streaming import read_events_stream, run_to_memory, streaming_sliding_counts

    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    run_to_memory(
        streaming_sliding_counts(stream), "q_stream_sliding_mem", "complete"
    )
    return spark.table("q_stream_sliding_mem")


@_stream_tuned
def q_streaming_user_sessions(spark, sf_dir):
    """Stateful streaming sessionization (applyInPandasWithState)
    replayed over the staged events and checked against the SAME DuckDB
    oracle as the batch ``user_sessions`` query: on a full single-batch
    replay the per-user (n_sessions, n_events) state must equal the
    batch window computation exactly."""
    from .streaming import read_events_stream, run_to_memory, streaming_user_sessions

    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    run_to_memory(
        streaming_user_sessions(stream, gap_minutes=30),
        "q_stream_sessions_mem",
        "update",
    )
    return spark.table("q_stream_sessions_mem")


_STAGED_TWEETS: dict[str, str] = {}

# deterministic message derivation so the egypt-regex oracle can
# reconstruct the exact strings the regex ran against ("Cairo" with a
# capital C exercises the reference's (?i) flag,
# ExtractHourlyCountsEgypt.java:42-44). Built lazily — Column
# construction needs a live SparkContext.
def _tweet_message() -> F.Column:
    return F.when(
        F.col("event_type") == "error", F.lit("Trouble near Cairo")
    ).otherwise(F.concat(F.lit("all quiet: "), F.col("event_type")))


_TWEET_MESSAGE_SQL = (
    "CASE WHEN event_type = 'error' THEN 'Trouble near Cairo' "
    "ELSE 'all quiet: ' || event_type END"
)


def _staged_tweets_dir(spark, sf_dir: str) -> str:
    """Render events as the reference's 4-column tweet TSV
    (``id \\t timestamp \\t user \\t message`` with the RFC-822-style
    "EEE MMM dd HH:mm:ss Z yyyy" timestamp, ExtractHourlyCountsAll
    .java:38-48) so the driver exercises the real TSV scan, the
    DROPMALFORMED parse, the positional timestamp slicing and the
    month-name map — the round-2 gaps only unit tests could reach. Two
    malformed lines are planted; the scan must drop them. Staged once
    per (process, sf_dir), removed at exit."""
    if sf_dir not in _STAGED_TWEETS:
        import atexit
        import os
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-tweets-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        (
            _events(spark, sf_dir)
            .select(
                F.col("event_id").cast("string").alias("id"),
                F.date_format("ts", "EEE MMM dd HH:mm:ss Z yyyy").alias("timestamp"),
                F.col("user_id").cast("string").alias("user"),
                _tweet_message().alias("message"),
            )
            .repartition(2)
            .write.mode("overwrite")
            .option("sep", "\t")
            .csv(stage)
        )
        with open(os.path.join(stage, "part-malformed.csv"), "w") as fh:
            fh.write("a line with no tabs at all\n")
            fh.write("42\tTue Jan 02 03:04:05 +0000 2024\n")  # 2 of 4 cols
        _STAGED_TWEETS[sf_dir] = stage
    return _STAGED_TWEETS[sf_dir]


_STAGED_JSONL: dict[str, str] = {}


def _staged_docs_jsonl_dir(spark, sf_dir: str) -> str:
    """Stage the documents table as JSONL with planted malformed lines
    (invalid JSON and a valid object with no id) — once per
    (process, sf_dir), removed at exit."""
    if sf_dir not in _STAGED_JSONL:
        import atexit
        import os
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-jsonl-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        (
            load_table(spark, sf_dir, "documents")
            .repartition(2)
            .write.mode("overwrite")
            .json(stage)
        )
        with open(os.path.join(stage, "part-malformed.json"), "w") as fh:
            fh.write("{this is not json\n")
            fh.write('{"text": "valid json, but no doc_id"}\n')
        _STAGED_JSONL[sf_dir] = stage
    return _STAGED_JSONL[sf_dir]


def q_jsonl_roundtrip(spark, sf_dir):
    """Documents → JSONL → schema-enforced read with DROPMALFORMED:
    full row parity with the original table proves the serialization
    round-trips exactly (unicode escapes, nulls) and the malformed
    plants are dropped."""
    from .sources.text_corpus import read_documents_jsonl

    docs = read_documents_jsonl(spark, _staged_docs_jsonl_dir(spark, sf_dir))
    return docs.select("doc_id", "text", "lang", "source", "n_chars")


_STAGED_CSV: dict[str, str] = {}


def _staged_docs_csv_dir(spark, sf_dir: str) -> str:
    """Stage the documents table as headerless RFC-4180 CSV with
    planted malformed lines (unparseable doc_id; a row with no id) —
    once per (process, sf_dir), removed at exit."""
    if sf_dir not in _STAGED_CSV:
        import atexit
        import os
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-csv-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        (
            load_table(spark, sf_dir, "documents")
            .repartition(2)
            .write.mode("overwrite")
            .option("quote", '"')
            .option("escape", '"')
            .csv(stage)
        )
        with open(os.path.join(stage, "part-malformed.csv"), "w") as fh:
            fh.write("notanumber,\"broken id row\",en,web,13\n")
            fh.write(",\"valid types, but no doc_id\",en,web,25\n")
        _STAGED_CSV[sf_dir] = stage
    return _STAGED_CSV[sf_dir]


def q_csv_roundtrip(spark, sf_dir):
    """Documents → headerless CSV → schema-enforced read with
    DROPMALFORMED: full row parity with the original table proves the
    Spark-writer quoting convention round-trips and the malformed
    plants are dropped (same contract as jsonl_roundtrip)."""
    from .sources.text_corpus import read_documents_csv

    docs = read_documents_csv(spark, _staged_docs_csv_dir(spark, sf_dir))
    return docs.select("doc_id", "text", "lang", "source", "n_chars")


_STAGED_ORC: dict[str, str] = {}


def _staged_docs_orc_dir(spark, sf_dir: str) -> str:
    """Stage the documents table as zstd ORC — once per (process,
    sf_dir), removed at exit."""
    if sf_dir not in _STAGED_ORC:
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-orc-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        (
            load_table(spark, sf_dir, "documents")
            .repartition(2)
            .write.mode("overwrite")
            .option("compression", "zstd")
            .orc(stage)
        )
        _STAGED_ORC[sf_dir] = stage
    return _STAGED_ORC[sf_dir]


def q_orc_roundtrip(spark, sf_dir):
    """Documents → zstd ORC → schema-enforced columnar read: full row
    parity with the original table (same oracle as the other
    interchange-format roundtrips); pruning/pushdown reach the ORC
    stripes (plan-asserted in tests)."""
    from .sources.text_corpus import read_documents_orc

    docs = read_documents_orc(spark, _staged_docs_orc_dir(spark, sf_dir))
    return docs.select("doc_id", "text", "lang", "source", "n_chars")


_STAGED_ROLLUP: dict[str, str] = {}


def q_incremental_rollup(spark, sf_dir):
    """Materialized-view maintenance: the hourly rollup built by TWO
    incremental applications (events split in half by event_id hash
    parity), each maintaining only its touched date partitions via
    dynamic partition overwrite. The oracle is the ONE-SHOT
    aggregation over all events — the merge invariant."""
    if sf_dir not in _STAGED_ROLLUP:
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-rollup-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        events = _events(spark, sf_dir)
        half = F.abs(F.xxhash64(F.col("event_id"))) % 2
        timeseries.maintain_hourly_rollup(spark, stage, events.where(half == 0))
        timeseries.maintain_hourly_rollup(spark, stage, events.where(half == 1))
        _STAGED_ROLLUP[sf_dir] = stage
    return timeseries.read_hourly_rollup(spark, _STAGED_ROLLUP[sf_dir]).select(
        "d", "hour", "n"
    )


def q_ewma_hourly(spark, sf_dir):
    """Truncated-EWMA hourly volume trend (24h window, alpha=0.3);
    the 24 lag terms are added in literal order, so parity is exact
    by construction."""
    return temporal.ewma_hourly(_events(spark, sf_dir))


def q_seasonal_anomalies(spark, sf_dir):
    """Hour-of-day seasonal anomalies with leave-one-out baselines
    from integer sufficient statistics."""
    return temporal.seasonal_anomalies(_events(spark, sf_dir))


def q_oov_rate(spark, sf_dir):
    """Out-of-vocabulary evaluation across the deterministic hash
    split: the whitespace vocabulary is built from the TRAIN split
    only; each held-out split reports its token volume and OOV rate —
    the tokenizer/coverage eval every training pipeline runs before a
    vocab freeze. The vocab anti-join is keyed by token (AQE
    broadcast-izes a small vocab); nothing is collected."""
    docs = sampling.hash_split(
        _docs(spark, sf_dir), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    toks = docs.select(
        "split", F.explode(text.tokens_array("text")).alias("tok")
    )
    vocab = toks.where(F.col("split") == "train").select("tok").distinct()
    other = toks.where(F.col("split") != "train")
    totals = other.groupBy("split").agg(F.count("*").alias("n_tokens"))
    oov = (
        other.join(vocab, "tok", "left_anti")
        .groupBy("split")
        .agg(F.count("*").alias("n_oov"))
    )
    return totals.join(oov, "split", "left").select(
        "split",
        "n_tokens",
        F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
        F.round(F.coalesce("n_oov", F.lit(0)) / F.col("n_tokens"), 6).alias(
            "oov_rate"
        ),
    )


_MIX_WEIGHTS = [("src0", 0.4), ("src1", 0.3), ("src2", 0.2), ("src3", 0.1)]
_MIX_BUDGET = 20_000  # whitespace tokens


_STAGED_EVOLVED: dict[str, str] = {}


def q_schema_evolution(spark, sf_dir):
    """Schema-evolution read: the corpus written in TWO generations —
    an old 3-column layout (even doc_ids) and a widened 5-column one
    (odd doc_ids) — into one directory, read back with
    ``mergeSchema``; columns absent from a generation surface as
    NULLs. The add-a-column-without-rewriting-history contract every
    long-lived 100 TB table depends on (per-file schema negotiation
    at the scan; no rewrite, no backfill)."""
    if sf_dir not in _STAGED_EVOLVED:
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-evolve-stage-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        docs = _docs(spark, sf_dir)
        docs.where(F.col("doc_id") % 2 == 0).select(
            "doc_id", "text", "lang"
        ).write.mode("append").parquet(stage)
        docs.where(F.col("doc_id") % 2 == 1).select(
            "doc_id", "text", "lang", "source", "n_chars"
        ).write.mode("append").parquet(stage)
        _STAGED_EVOLVED[sf_dir] = stage
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(_STAGED_EVOLVED[sf_dir])
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def q_corpus_mix(spark, sf_dir):
    """Pretraining-mix construction: deterministically sample each
    source so its expected token volume hits ``weight x budget`` —
    the source-weighting step every pretraining data recipe runs.
    Per-source keep fraction = min(1, target/T_s); the doc-level
    Bernoulli draw is the same content-hash bin stratified_sample
    uses, so the mix is reproducible and the oracle replays it. One
    row per weighted source: targets vs what the sample actually
    delivered."""
    from .operators.sampling import _bin

    w = spark.createDataFrame(_MIX_WEIGHTS, "source string, weight double")
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        F.size(text.tokens_array("text")).alias("ntok"),
        _bin("doc_id").alias("bin"),
    )
    totals = d.groupBy("source").agg(F.sum("ntok").alias("total_tokens"))
    j = d.join(F.broadcast(w), "source").join(F.broadcast(totals), "source")
    frac = F.least(
        F.lit(1.0), F.col("weight") * _MIX_BUDGET / F.col("total_tokens")
    )
    kept = F.col("bin") < frac * 1_000_000
    return j.groupBy("source", "weight", "total_tokens").agg(
        F.round(F.col("weight") * _MIX_BUDGET, 6).alias("target_tokens"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("kept_docs"),
        F.sum(F.when(kept, F.col("ntok")).otherwise(0)).alias("kept_tokens"),
    )


def q_heldout_logprob(spark, sf_dir):
    """LM-quality gate with a real train/eval separation: add-one
    unigram LM trained on the hash split's TRAIN docs, held-out
    splits scored per doc and summarized per split."""
    docs = sampling.hash_split(
        _docs(spark, sf_dir), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    scored = text_quality.heldout_logprob(
        docs.where(F.col("split") == "train"),
        docs.where(F.col("split") != "train"),
    )
    per_split = docs.where(F.col("split") != "train").select("doc_id", "split")
    return (
        scored.join(per_split, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.sum("avg_logprob") / F.count("*"), 6).alias("mean_logprob"),
        )
    )


def q_packing_efficiency(spark, sf_dir):
    """Shard fill-rate report for the sequence packer: per bucket,
    how many shards the stream chunked into and how full they are —
    the fragmentation dashboard a packing budget is tuned against."""
    packed = packing.pack_sequences(
        _docs(spark, sf_dir).select(
            "doc_id", F.size(text.tokens_array("text")).alias("ws_tokens")
        ),
        token_col="ws_tokens",
        budget=512,
        n_buckets=8,
    )
    # the bucket's stream is CONTIGUOUS (concatenate-and-chunk), so it
    # spans ceil(total/budget) physical shards and only the last one
    # is partial — counting start-shards instead would overshoot past
    # 1.0 whenever a document spills across a boundary
    shards = F.floor((F.sum("ws_tokens") + 511) / 512).cast("long")
    return packed.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("total_tokens"),
        shards.alias("n_shards"),
        F.round(
            F.sum("ws_tokens") / (F.floor((F.sum("ws_tokens") + 511) / 512) * 512),
            6,
        ).alias("utilization"),
    )


def q_bloom_decontamination(spark, sf_dir):
    """Bloom-filter decontamination triage: 4 portable hash rows x
    1024 bits built from the eval set's text digests, probed by every
    corpus document — one row of confusion counts against exact
    membership. The Bloom pass is the cheap 100 TB first stage (the
    filter is a fixed bit array broadcast to every executor; only
    flagged docs reach the exact join); its no-false-negatives
    guarantee is what the true_hits count certifies. Same universal
    hash family as MinHash/CMS, so the oracle rebuilds the identical
    filter."""
    from .functions.hashing import MINHASH_A, MINHASH_B, MINHASH_PRIME, h28

    docs = _docs(spark, sf_dir).select("doc_id", F.md5("text").alias("digest"))
    eval_docs = docs.orderBy("doc_id").limit(20).select("digest")

    def cells(df):
        base = h28(F.col("digest"))
        return df.select(
            "digest",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            (
                                (F.lit(MINHASH_A[d]) * base + F.lit(MINHASH_B[d]))
                                % F.lit(MINHASH_PRIME)
                                % F.lit(1024)
                            ).alias("bit"),
                        )
                        for d in range(4)
                    ]
                )
            ).alias("c"),
        ).select("digest", F.col("c.d").alias("d"), F.col("c.bit").alias("bit"))

    bits = cells(eval_docs).select("d", "bit").distinct()
    # probe DISTINCT digests: duplicate docs would multiply their
    # (digest, d, bit) cells and break the all-4-bits count
    probe = cells(docs.select("digest").distinct())
    matched = probe.join(F.broadcast(bits), ["d", "bit"]).groupBy("digest").agg(
        F.count("*").alias("hits")
    )
    flagged = matched.where(F.col("hits") == 4).select("digest")
    members = eval_docs.distinct()
    per_doc = docs.join(
        flagged.withColumn("flagged", F.lit(1)), "digest", "left"
    ).join(members.withColumn("member", F.lit(1)), "digest", "left")
    return per_doc.agg(
        F.sum(F.coalesce("flagged", F.lit(0))).alias("n_flagged"),
        F.sum(
            F.when((F.col("flagged") == 1) & (F.col("member") == 1), 1).otherwise(0)
        ).alias("true_hits"),
        F.sum(
            F.when((F.col("flagged") == 1) & F.col("member").isNull(), 1).otherwise(0)
        ).alias("false_positives"),
        F.sum(
            F.when((F.col("member") == 1) & F.col("flagged").isNull(), 1).otherwise(0)
        ).alias("false_negatives"),
    )


def q_revenue_lag_features(spark, sf_dir):
    """Daily-revenue ML lag features: (day, revenue, lag1, lag7,
    pct_change) — the feature-engineering step a demand forecaster
    trains on. Exact-decimal daily sums rounded to the shared grid,
    then a calendar-bounded window (days, not rows of the fact
    table); rows without a full 7-day history drop."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.orderBy("day")
    out = daily.select(
        "day",
        "revenue",
        F.lag("revenue", 1).over(w).alias("lag1"),
        F.lag("revenue", 7).over(w).alias("lag7"),
    ).where(F.col("lag7").isNotNull())
    return out.select(
        "day",
        "revenue",
        "lag1",
        "lag7",
        F.round((F.col("revenue") - F.col("lag1")) / F.col("lag1"), 6).alias(
            "pct_change"
        ),
    )


def q_eval_substring_hits(spark, sf_dir):
    """Exact-substring decontamination probe: for each eval snippet
    (the 5 lowest-id docs' first 40 chars — a stand-in for benchmark
    strings), count the corpus documents containing it verbatim. The
    n-gram decontamination's exact-match complement: snippets
    broadcast, the scan stays narrow (JVM contains per row), nothing
    shuffles but the tiny per-snippet counts."""
    docs = _docs(spark, sf_dir)
    snippets = (
        docs.orderBy("doc_id")
        .limit(5)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.substring("text", 1, 40).alias("snippet"),
        )
    )
    hits = docs.crossJoin(F.broadcast(snippets)).where(
        F.instr(F.col("text"), F.col("snippet")) > 0
    )
    return (
        snippets.join(
            hits.groupBy("eval_id").agg(F.count("*").alias("n_hits")),
            "eval_id",
            "left",
        )
        .select(
            "eval_id", "snippet", F.coalesce("n_hits", F.lit(0)).alias("n_hits")
        )
    )


def q_balance_classes(spark, sf_dir):
    """Deterministic downsample of every embedding label class to the
    minority class size — hash-ranked, WindowGroupLimit-planned."""
    return sampling.balance_classes(_emb(spark, sf_dir), "label", "vec_id")


@_stream_tuned
def q_streaming_top_users(spark, sf_dir):
    """Complete-mode streaming rank: top-10 users by event count over
    the replayed stream; the oracle is the batch ranking (sorting is
    legal in complete mode, and a full replay must agree with batch)."""
    from .streaming import read_events_stream, run_to_memory

    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    top = (
        stream.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )
    run_to_memory(top, "q_stream_topusers_mem", "complete")
    return spark.table("q_stream_topusers_mem")


def q_sentence_stats(spark, sf_dir):
    """Per-document sentence segmentation stats — narrow HOF stage."""
    return text_quality.sentence_stats(_docs(spark, sf_dir))


def q_length_drift_psi(spark, sf_dir):
    """PSI drift of the doc-length distribution between src0 and src1
    — the ingestion drift gate over exact log2 buckets."""
    return profiling.distribution_psi(
        _docs(spark, sf_dir), "n_chars", "source", ref="src0", cur="src1"
    )


def q_conversion_lag(spark, sf_dir):
    """Click→purchase time-to-convert summary within a 1h window."""
    return funnel.conversion_lag_stats(load_table(spark, sf_dir, "events"))


def q_revenue_share(spark, sf_dir):
    """Each nation's share of global revenue — window-over-aggregate
    on the star-join rollup (25 rounded summands; round-6 absorbs the
    window sum's order ulps)."""
    rev = relational.revenue_by_nation(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )
    w = Window.partitionBy()
    return rev.select(
        "n_name",
        "r_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    )


def q_record_linkage(spark, sf_dir):
    """Blocked entity resolution over customer names: same-nation
    blocks, Levenshtein <= 2 — the Fellegi–Sunter blocking shape."""
    return dedup.record_linkage_pairs(
        load_table(spark, sf_dir, "customer"),
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey"],
        max_distance=2,
    )


def q_dup_span_report(spark, sf_dir):
    """Duplicated 20-token-span coverage per document (Lee et al. 2021
    exact-substring dedup at fixed granularity)."""
    return dedup.dup_span_report(_docs(spark, sf_dir), window=20)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023) over hashed unigram
    buckets, target domain = the src0 slice of the corpus."""
    docs = _docs(spark, sf_dir)
    return sampling.dsir_weights(
        docs, docs.where(F.col("source") == "src0"), n_buckets=512
    )


def q_perplexity_buckets(spark, sf_dir):
    """CCNet-style per-language head/middle/tail quality buckets over
    the corpus unigram-LM score."""
    return text_quality.perplexity_buckets(_docs(spark, sf_dir), n_buckets=3)


def q_mrr_eval(spark, sf_dir):
    """Known-item BM25 retrieval eval: every 100th doc queries with
    its first-4-token set; per-query reciprocal rank of the source
    doc in the top-10 (mean = corpus MRR@10)."""
    return index.mrr_eval(_docs(spark, sf_dir), every=100, q_len=4, k=10)


def q_corpus_card(spark, sf_dir):
    """Per-source dataset datasheet: volume, language mix, dedup
    ratio, quality, median length (Gebru et al. 2021 shape)."""
    return profiling.corpus_card(_docs(spark, sf_dir))


def q_record_linkage_topk(spark, sf_dir):
    """record_linkage with the output-cardinality knob engaged: each
    customer keeps only its 3 closest same-nation name matches, so a
    low-entropy name column degrades to <= 2*k*n rows instead of an
    unbounded pair sink (round-7 VERDICT watch item)."""
    return dedup.record_linkage_pairs(
        load_table(spark, sf_dir, "customer"),
        id_col="c_custkey",
        name_col="c_name",
        block_cols=["c_nationkey"],
        max_distance=2,
        max_pairs_per_record=3,
    )


def q_label_centroids(spark, sf_dir):
    return similarity.label_centroids(_emb(spark, sf_dir))


def q_hourly_counts_tweets(spark, sf_dir):
    from .sources.text_corpus import read_tweets_tsv

    tweets = read_tweets_tsv(spark, _staged_tweets_dir(spark, sf_dir))
    return timeseries.hourly_counts_tweets(tweets)


def q_hourly_counts_tweets_egypt(spark, sf_dir):
    from .sources.text_corpus import read_tweets_tsv

    tweets = read_tweets_tsv(spark, _staged_tweets_dir(spark, sf_dir))
    return timeseries.hourly_counts_tweets(
        tweets, message_regex="(?i)(egypt|cairo)"
    )


def q_exact_duplicates(spark, sf_dir):
    return dedup.exact_duplicates(_docs(spark, sf_dir))


def q_shingles(spark, sf_dir):
    return dedup.shingles(_docs(spark, sf_dir), n=3)


def q_minhash_signatures(spark, sf_dir):
    sigs = dedup.minhash_signatures(_docs(spark, sf_dir), n=3)
    # posexplode_outer: sig is always 32 elements; a plain posexplode
    # made the optimizer infer size(sig)>0 and push it to the scan with
    # the WHOLE 32-fold signature inlined — 119s instead of 3s at sf0.1
    # (see operators/text.py note on InferFiltersFromGenerate).
    return sigs.select("doc_id", F.posexplode_outer("sig").alias("i", "mh"))


def q_minhash_lsh_candidates(spark, sf_dir):
    return dedup.minhash_lsh_candidates(_docs(spark, sf_dir), n=3, bands=8)


def q_ngram_jaccard(spark, sf_dir):
    out = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.1)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir), bits=32)


def q_simhash_near_dupes(spark, sf_dir):
    return dedup.simhash_near_dupes(_docs(spark, sf_dir), bits=32, max_hamming=3)


def q_deterministic_sample(spark, sf_dir):
    out = sampling.deterministic_sample(
        load_table(spark, sf_dir, "documents"), "doc_id", 0.25
    )
    return out.select("doc_id")


def q_hash_split(spark, sf_dir):
    out = sampling.hash_split(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return out.select("doc_id", "split")


def q_stratified_sample(spark, sf_dir):
    """Downsample the over-represented language: keep 25% of English,
    half of Chinese, everything else untouched."""
    out = sampling.stratified_sample(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "lang",
        {"en": 0.25, "zh": 0.5},
    )
    return out.select("doc_id", "lang")


def q_dedup_clusters(spark, sf_dir):
    """Near-dup pairs (n-gram Jaccard >= 0.1) folded into connected
    components with a keep-lowest canonical doc per cluster."""
    pairs = dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.1)
    return dedup.dedup_clusters(pairs)


def q_bm25_topk(spark, sf_dir):
    return index.bm25_scores(
        _docs(spark, sf_dir), query_terms=["spark", "table", "query"], k=20
    )


def q_query_likelihood(spark, sf_dir):
    """Jelinek–Mercer query-likelihood retrieval over the same query
    the BM25 workload runs — the LM ranking complement."""
    return index.query_likelihood_scores(
        _docs(spark, sf_dir), query_terms=["spark", "table", "query"], k=20
    )


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of the BM25
    and query-likelihood top-20 lists: rrf = Σ 1/(60+rank) over the
    lists that retrieved the doc (rank 0 = not retrieved). Both input
    rankings are deterministic (rounded scores, docid tiebreak), so
    the fused ranking is too.

    Scale shape (round-6 VERDICT item 3): both scorers consume ONE
    checkpointed (docid, term, tf) table — without it each scorer
    independently re-derived the corpus tokenization (15 exchanges,
    two full corpus scans at 100 TB for a query users run often)."""
    docs = _docs(spark, sf_dir)
    terms = ["spark", "table", "query"]
    tfs = index.term_frequencies(docs).localCheckpoint()
    w = Window.orderBy(F.desc("score"), F.asc("docid"))
    bm = index.bm25_scores(docs, terms, k=20, tfs=tfs).select(
        "docid", F.row_number().over(w).cast("int").alias("bm25_rank")
    )
    ql = index.query_likelihood_scores(docs, terms, k=20, tfs=tfs).select(
        "docid", F.row_number().over(w).cast("int").alias("ql_rank")
    )
    fused = bm.join(ql, "docid", "full_outer").select(
        "docid",
        F.coalesce("bm25_rank", F.lit(0)).alias("bm25_rank"),
        F.coalesce("ql_rank", F.lit(0)).alias("ql_rank"),
    )
    rrf = F.round(
        F.when(
            F.col("bm25_rank") > 0, F.lit(1.0) / (F.lit(60) + F.col("bm25_rank"))
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("ql_rank") > 0, F.lit(1.0) / (F.lit(60) + F.col("ql_rank"))
        ).otherwise(F.lit(0.0)),
        6,
    )
    return (
        fused.select("docid", "bm25_rank", "ql_rank", rrf.alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc("docid"))
        .limit(10)
    )


def q_dense_hourly_counts(spark, sf_dir):
    return timeseries.fill_hourly_gaps(_events(spark, sf_dir))


def q_top_terms_per_source(spark, sf_dir):
    return text_quality.top_terms_per_source(_docs(spark, sf_dir), k=5)


def q_funnel_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return funnel.funnel_counts(ev, steps=["view", "click", "purchase"])


def q_cohort_retention(spark, sf_dir):
    return funnel.cohort_retention(load_table(spark, sf_dir, "events"))


def q_dedup_apply(spark, sf_dir):
    """Close the dedup loop: the corpus AFTER near-dup removal — every
    document whose cluster keeper is some other document is dropped
    via one anti-join against the clustering's non-keeper set."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1)
    clusters = dedup.dedup_clusters(pairs)
    drop = clusters.where(F.col("doc_id") != F.col("canonical_id")).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti").select("doc_id", "source", "n_chars")


def q_curated_corpus(spark, sf_dir):
    """The curation flagship: one DAG composing three operators —
    quality scoring, language ID, and benchmark decontamination — into
    the 'what actually ships to training' query. Catalyst sees the
    whole pipeline: the three projections fuse over a single corpus
    scan, and the decontamination side is the only extra exchange."""
    docs = _docs(spark, sf_dir)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    q = text_quality.quality_score(corpus)
    lid = text_quality.language_id(corpus).select("doc_id", "pred_lang")
    flagged = dedup.contamination_flags(corpus, bench, n=4).select("doc_id")
    return (
        corpus.select("doc_id", "source")
        .join(q, "doc_id")
        .join(lid, "doc_id")
        .join(flagged, "doc_id", "left_anti")
        .where((F.col("quality") >= 0.5) & (F.col("pred_lang") == "en"))
        .select("doc_id", "source", "quality")
    )


def q_contamination_flags(spark, sf_dir):
    """Benchmark decontamination: every 97th document plays the eval
    set; flag the rest of the corpus on shared word 4-grams (the
    synthetic corpus has too few genuine 5-gram collisions to make an
    interesting check; real pipelines run n around 5-13)."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    return dedup.contamination_flags(corpus, bench, n=4)


def q_token_counts(spark, sf_dir):
    return text_quality.token_counts(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    return text_quality.quality_score(_docs(spark, sf_dir))


def q_language_id(spark, sf_dir):
    return text_quality.language_id(_docs(spark, sf_dir))


def q_source_stats(spark, sf_dir):
    return text_quality.source_stats(_docs(spark, sf_dir))


# fixed corpus language codes — declared, not discovered (see
# lang_source_matrix: explicit pivot values avoid a distinct scan)
_PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def q_lang_source_matrix(spark, sf_dir):
    return text_quality.lang_source_matrix(_docs(spark, sf_dir), _PIVOT_LANGS)


def q_hashing_tf(spark, sf_dir):
    return features.hashing_tf(_docs(spark, sf_dir), n_features=1024)


def q_hashing_tfidf(spark, sf_dir):
    return features.hashing_tfidf(_docs(spark, sf_dir), n_features=1024)


def _vector_cells(vec, value_name: str):
    """Driver-window rendering of a sparse (indices, values) vector
    frame as scalar rows ``(doc_id, pos, bucket, <value>)`` — the
    driver's pandas canonicalizer cannot sort/hash ARRAY columns
    (round-5 red rows), so the window registers this exploded view and
    the array originals live in EXTRA_QUERIES. Empty documents carry
    empty vectors and so contribute zero rows here (posexplode drops
    them); the array originals still assert the empty-vector contract."""
    z = vec.select(
        "doc_id",
        F.posexplode(F.arrays_zip("indices", "values")).alias("pos", "cell"),
    )
    return z.select(
        "doc_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("cell.indices").alias("bucket"),
        F.col("cell.values").alias(value_name),
    )


def q_hashing_tf_cells(spark, sf_dir):
    return _vector_cells(
        features.hashing_tf(_docs(spark, sf_dir), n_features=1024), "tf"
    )


def q_hashing_tfidf_cells(spark, sf_dir):
    return _vector_cells(
        features.hashing_tfidf(_docs(spark, sf_dir), n_features=1024), "tfidf"
    )


def q_kmv_distinct(spark, sf_dir):
    toks = _docs(spark, sf_dir).select(
        "source", F.explode(text.tokens_array("text")).alias("token")
    )
    return sketches.kmv_distinct(toks, key="token", group_col="source", k=64)


def q_countmin_words(spark, sf_dir):
    """Count-min sketch point queries for the corpus's top-20 words:
    (word, true_cnt, estimate) — estimate >= true always (collisions
    only add); the oracle rebuilds the identical 4x256 sketch from the
    same portable hash family."""
    words = _docs(spark, sf_dir).select(
        F.explode(text.tokens_array("text")).alias("word")
    )
    counters = sketches.count_min_counters(words, "word", width=256, depth=4)
    true_counts = words.groupBy("word").agg(F.count("*").alias("true_cnt"))
    # limit-first (top_k_nodes idiom): TakeOrderedAndProject bounds
    # the top-20 probe set — never a full-vocabulary rank window
    probes = (
        true_counts.orderBy(F.desc("true_cnt"), F.asc("word"))
        .limit(20)
        .select("word", "true_cnt")
    )
    est = sketches.count_min_estimate(
        counters, probes.select("word"), "word", width=256, depth=4
    )
    return probes.join(est, "word")


def q_key_skew_report(spark, sf_dir):
    """Skew diagnosis of orders.o_custkey — the should-I-salt report,
    with an exact Gini from the count-of-counts histogram (no global
    key sort)."""
    return skew.key_skew_report(load_table(spark, sf_dir, "orders"), "o_custkey")


def q_user_entropy(spark, sf_dir):
    """Per-user Shannon entropy of the event-type distribution."""
    return funnel.user_entropy(load_table(spark, sf_dir, "events"))


def q_pagerank_convergence(spark, sf_dir):
    """Per-iteration L1 residual of the pagerank power iteration —
    the convergence-monitoring diagnostic; the oracle recomputes every
    delta from its unrolled per-iteration CTEs."""
    rs: list = []
    graph.pagerank(
        _customer_graph(spark, sf_dir), n_iter=8, num_partitions=8, residuals=rs
    )
    return spark.createDataFrame(
        [(i + 1, round(d, 6)) for i, d in enumerate(rs)], "iter int, l1_delta double"
    )


@_stream_tuned
def q_streaming_countmin(spark, sf_dir):
    """Count-min counters built INCREMENTALLY over the event stream
    (complete-mode stateful aggregation) — the sketch is mergeable, so
    the full-replay counters must equal the batch sketch exactly; the
    oracle is the batch CMS in SQL."""
    from .streaming import read_events_stream, run_to_memory

    stream = read_events_stream(spark, _staged_events_dir(spark, sf_dir))
    counters = sketches.count_min_counters(
        stream.select("user_id"), "user_id", width=256, depth=4
    )
    run_to_memory(counters, "q_stream_cms_mem", "complete")
    return spark.table("q_stream_cms_mem")


def q_degree_assortativity(spark, sf_dir):
    """Degree-degree Pearson correlation of the customer graph —
    integer sufficient statistics, closed-form correlation replicated
    term-for-term in the oracle."""
    return graph.degree_assortativity(_customer_graph(spark, sf_dir))


def q_event_transitions(spark, sf_dir):
    """First-order Markov matrix over per-user event sequences."""
    return funnel.event_transitions(load_table(spark, sf_dir, "events"))


def q_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty (duplicate-n-gram fraction) over
    the documents table — the annotation-join curation metric."""
    return dedup.ngram_novelty(_docs(spark, sf_dir), n=3)


def q_pack_sequences(spark, sf_dir):
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(text.tokens_array("text")).alias("ws_tokens")
    )
    return packing.pack_sequences(
        docs, token_col="ws_tokens", budget=512, n_buckets=8
    )


def q_weighted_sample(spark, sf_dir):
    return sampling.weighted_sample(
        _docs(spark, sf_dir), key="doc_id", weight_col="n_chars", n=200
    ).select("doc_id", "n_chars")


def q_doc_fingerprint(spark, sf_dir):
    return text_quality.doc_fingerprint(_docs(spark, sf_dir), n=5)


def q_repetition_stats(spark, sf_dir):
    return text_quality.repetition_stats(_docs(spark, sf_dir), n=3)


def q_chunk_documents(spark, sf_dir):
    return text_quality.chunk_documents(_docs(spark, sf_dir), size=32, stride=24)


def q_pii_scrub(spark, sf_dir):
    """PII redaction over documents with deterministic synthetic PII
    (an email + a URL derived from doc_id) appended — the testdata
    itself contains none, and a zero-match regex proves nothing. The
    oracle rebuilds the identical input and re-runs the scrub."""
    docs = _docs(spark, sf_dir)
    withpii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or https://ex.am/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" now"),
        ).alias("text"),
    )
    return text_quality.pii_scrub(withpii)


def q_hard_negatives(spark, sf_dir):
    """Contrastive triplet mining — positives and hard negatives for
    the 10 lowest-id anchors in one scored pass."""
    return similarity.hard_negatives(_emb(spark, sf_dir), n_anchors=10)


def q_random_projection(spark, sf_dir):
    """64-dim embeddings reduced to 8 via the deterministic Achlioptas
    sparse sign matrix, emitted as (vec_id, dim, value) scalar rows;
    the oracle replays the identical LCG-derived matrix in SQL."""
    return similarity.random_projection(_emb(spark, sf_dir), in_dim=64, out_dim=8)


def q_brute_force_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    return similarity.brute_force_topk(emb, queries, k=10)


def q_ivf_assign(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c")
    )
    return similarity.ivf_assign(emb, centroids).select("vec_id", "cell")


def q_quantize_embeddings(spark, sf_dir):
    """Int8 scalar quantization, flattened to (vec_id, pos, code) for
    the order-insensitive oracle compare."""
    q = similarity.quantize_embeddings(_emb(spark, sf_dir))
    # posexplode_outer: codes is always dim elements; inner posexplode
    # would re-evaluate the quantization in an inferred pushed filter
    # (see operators/text.py note on InferFiltersFromGenerate).
    return q.select("vec_id", F.posexplode_outer("codes").alias("pos", "code"))


def _scaled_cell_centroids(emb):
    """Seed centroids whose COUNT grows with the corpus — the lowest
    ``max(8, n // 256)`` vec_ids. Within-cell pairwise work is
    quadratic in cell occupancy, so a FIXED cell count turns a 10x
    corpus into a 100x compare bill; targeting ~256 vectors per cell
    keeps it linear. The floor of 8 reproduces the historical seeding
    at every driver oracle scale (n <= 2048 -> 8 cells), so small-SF
    outputs are byte-identical; the oracles compute the same k in SQL."""
    k = max(8, emb.count() // 256)
    return emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c")
    )


def q_embedding_near_dupes(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return similarity.embedding_near_dupes(
        emb, _scaled_cell_centroids(emb), threshold=0.2
    )


def q_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed ANN — same query/corpus split as
    brute_force_topk so the two scale paths are directly comparable.
    The oracle reproduces the md5-derived hyperplanes as literals."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    return similarity.lsh_topk(emb, queries, k=10)


# 6 overlapping 42-hour promo windows across the events month — the
# same literals appear in the range_join oracle's VALUES list.
_PROMO_WINDOWS = [
    (i, f"2024-01-{1 + 4 * i:02d} 18:00:00", f"2024-01-{3 + 4 * i:02d} 12:00:00")
    for i in range(6)
]


def q_range_join(spark, sf_dir):
    """Point-in-interval join (events × promo windows) via the bucketed
    equi-join rewrite, rolled up per window."""
    promos = spark.createDataFrame(
        _PROMO_WINDOWS, "promo_id int, start_s string, end_s string"
    ).select(
        "promo_id",
        F.to_timestamp("start_s").alias("start_ts"),
        F.to_timestamp("end_s").alias("end_ts"),
    )
    j = temporal.range_join(_events(spark, sf_dir), promos)
    return j.groupBy("promo_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("total_value"),
    )


def q_asof_join(spark, sf_dir):
    """Each purchase event matched to the same user's most recent
    prior-or-simultaneous click (inner as-of). The oracle is DuckDB's
    native ASOF JOIN — an independent algorithm that must agree."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    j = temporal.asof_join(purchases, clicks, on="user_id", carry=["value"])
    return j.where(F.col("ts_r").isNotNull()).select(
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.round("value", 6).alias("purchase_value"),
        F.unix_micros("ts_r").alias("click_ts_us"),
        F.round("value_r", 6).alias("click_value"),
    )


def q_hypertable_rollup(spark, sf_dir):
    return temporal.hypertable_rollup(_events(spark, sf_dir))


def q_sliding_hourly_stats(spark, sf_dir):
    return temporal.sliding_hourly_stats(_events(spark, sf_dir))


def q_customers_without_orders(spark, sf_dir):
    """Anti join with a pushed-down filter on the probe side. The plain
    "no orders at all" variant is empty in this synthetic data (every
    customer ordered), so the query anti-joins against URGENT orders —
    non-empty at every sf, same plan shape."""
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return relational.customers_without_orders(
        load_table(spark, sf_dir, "customer"), urgent
    )


def q_salted_order_revenue(spark, sf_dir):
    """End-to-end salted_join demonstration: lineitem (the big,
    potentially hot-keyed side) joined to orders over an 8-way salt,
    then decimal-exact revenue per customer. The oracle is the PLAIN
    join — salting must be invisible in the result."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    joined = skew.salted_join(li, orders, on="l_orderkey", how="inner", salt=8)
    # exact double-product → decimal(18,6) term (see
    # relational._exact_product_dec for the exactness argument)
    revenue = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(18,6)")
    return joined.groupBy("o_custkey").agg(
        F.round(F.sum(revenue), 6).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


_STAGED_BUCKETED: dict[str, tuple[str, str]] = {}


def _staged_bucketed_tables(spark, sf_dir: str) -> tuple[str, str]:
    """Stage orders + customer as co-bucketed EXTERNAL parquet tables
    (8 buckets on the customer key, bucket-sorted) once per process —
    the layout that lets every later join/agg on that key skip its
    exchange. External paths (``option("path")``) keep the catalog's
    warehouse dir out of the repo CWD."""
    if sf_dir not in _STAGED_BUCKETED:
        import atexit
        import hashlib
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-bucketed-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        ot, ct = f"mras_orders_b{tag}", f"mras_customer_b{tag}"
        (
            load_table(spark, sf_dir, "orders")
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{stage}/{ot}")
            .saveAsTable(ot)
        )
        (
            load_table(spark, sf_dir, "customer")
            .write.format("parquet")
            .mode("overwrite")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{stage}/{ct}")
            .saveAsTable(ct)
        )
        _STAGED_BUCKETED[sf_dir] = (ot, ct)
    return _STAGED_BUCKETED[sf_dir]


def q_bucketed_customer_orders(spark, sf_dir):
    """Bucketed-layout demonstration under the oracle: orders ⋈
    customer on the bucket key, rolled up per market segment. With both
    sides co-bucketed the join and the aggregation read co-located
    buckets (the zero-exchange property is plan-asserted in
    tests/test_bucketed.py); values must equal the plain-layout SQL."""
    from .sources.bucketed import read_bucketed

    ot, ct = _staged_bucketed_tables(spark, sf_dir)
    orders = read_bucketed(spark, ot)
    cust = read_bucketed(spark, ct)
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("total_price"),
    )


# --- iterative / trained operators: rows-only (no single-SQL oracle) --------

def _nation_bottom_keys(cust, n: int):
    """Per-nation array of the ``n`` lowest c_custkeys — the only keys
    any member's adjacency can reference. A windowed rank keeps the
    per-group state O(1) during the scan and the collected array at
    most ``n`` long, so the frame stays broadcast-sized no matter how
    many members a nation has (the old collect_list-of-ALL-members +
    explode carried the full member array once PER MEMBER: ~3.6 GB of
    array copies at sf1, the dominant cost of every graph query)."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    return (
        cust.select("c_nationkey", "c_custkey")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .groupBy("c_nationkey")
        .agg(F.sort_array(F.collect_list("c_custkey")).alias("ms"))
    )


def _customer_graph(spark, sf_dir):
    """Deterministic graph over the customer table: each customer links
    to (up to) the 10 lowest-keyed OTHER customers of its nation.
    Adjacencies only ever reference a nation's 11 lowest keys, so the
    builder broadcast-joins that tiny per-nation array back onto the
    members instead of exploding the full member list."""
    cust = load_table(spark, sf_dir, "customer")
    bottom = _nation_bottom_keys(cust, 11)
    return cust.join(F.broadcast(bottom), "c_nationkey").select(
        F.col("c_custkey").cast("int").alias("id"),
        F.expr(
            "slice(filter(ms, m -> m != c_custkey), 1, 10)"
        ).cast("array<int>").alias("adj"),
    )


def _kcore_graph(spark, sf_dir):
    """Variable-degree deterministic graph over the customer table:
    each customer links to its nation's ``id % 12`` lowest-keyed OTHER
    customers — heterogeneous degrees, so k-core peeling actually
    cascades (the uniform _customer_graph would peel all-or-nothing).
    Same broadcast-bottom-keys shape as _customer_graph (max degree 11
    → only the 12 lowest keys per nation matter)."""
    cust = load_table(spark, sf_dir, "customer")
    bottom = _nation_bottom_keys(cust, 12)
    return cust.join(F.broadcast(bottom), "c_nationkey").select(
        F.col("c_custkey").cast("int").alias("id"),
        F.expr(
            "slice(filter(ms, m -> m != c_custkey), 1, CAST(c_custkey % 12 AS INT))"
        ).cast("array<int>").alias("adj"),
    )


def q_kcore(spark, sf_dir):
    """k-core (k=6) of the variable-degree customer graph via
    iterative simultaneous peeling; the oracle unrolls 16 peeling
    rounds in SQL (no-op rounds past the fixpoint are identities)."""
    return graph.kcore(_kcore_graph(spark, sf_dir), k=6)


def q_pagerank(spark, sf_dir):
    # partition count sized to the graph (thousands of nodes), not the
    # core count — iteration latency on a small graph is pure task-
    # scheduling overhead at 32 partitions (3x slower, measured).
    ranks = graph.pagerank(_customer_graph(spark, sf_dir), n_iter=8, num_partitions=8)
    # round BEFORE ranking: _customer_graph gives each nation's 10
    # lowest-keyed members mathematically identical pr (same in-link
    # structure), so ranking raw doubles would tie-break on float noise
    # that differs per engine; on the rounded value the id-asc
    # tiebreak is deterministic in Spark and DuckDB alike.
    rounded = ranks.select("id", F.round("pr", 6).alias("pr"))
    return graph.top_k_nodes(rounded, k=25)


def q_degree_histogram(spark, sf_dir):
    return graph.degree_histogram(_customer_graph(spark, sf_dir))


def q_triangle_count(spark, sf_dir):
    return graph.triangle_count(_customer_graph(spark, sf_dir))


def q_clustering_coefficient(spark, sf_dir):
    """Per-node local clustering coefficient — the same degree-ordered
    closed-wedge construction as triangle_count, credited to all three
    triangle corners; the oracle replays it corner-for-corner."""
    return graph.clustering_coefficient(_customer_graph(spark, sf_dir))


def q_hits(spark, sf_dir):
    """HITS top-25 authorities (with hub scores) after 8 max-rescaled
    mutual-reinforcement rounds; the oracle unrolls the identical
    update in SQL. Rounding happens BEFORE ranking — same exact-tie
    reasoning as q_pagerank (each nation's lowest-keyed members are
    mathematically tied)."""
    # partition count sized to the graph — same reasoning as q_pagerank
    scores = graph.hits(_customer_graph(spark, sf_dir), n_iter=8, num_partitions=8)
    rounded = scores.select(
        "id", F.round("auth", 6).alias("auth"), F.round("hub", 6).alias("hub")
    )
    # limit-first (top_k_nodes idiom): TakeOrderedAndProject bounds
    # the rank window's input to 25 rows — never a full-node sort
    w = Window.orderBy(F.desc("auth"), F.asc("id"))
    return (
        rounded.orderBy(F.desc("auth"), F.asc("id"))
        .limit(25)
        .select(
            F.row_number().over(w).cast("int").alias("rank"), "id", "auth", "hub"
        )
    )


def q_bfs_hops(spark, sf_dir):
    """Hop-distance histogram of a 2-source BFS (same two lowest
    custkeys as personalized_pagerank) — all-integer frontier
    expansion, so parity with the unrolled oracle is exact."""
    g = _customer_graph(spark, sf_dir)
    sources = [r["id"] for r in g.select("id").orderBy("id").limit(2).collect()]
    dist = graph.bfs_distances(g, sources=sources, max_hops=6)
    return dist.groupBy("dist").agg(F.count("*").alias("n_nodes"))


def q_link_prediction(spark, sf_dir):
    """Top-20 predicted links by neighborhood Jaccard over the
    customer graph, middle-node fan-out capped at degree 64 (the
    hot-shingle df-cap analogue; the oracle applies the same cap)."""
    return graph.link_prediction(_customer_graph(spark, sf_dir), k=20, max_degree=64)


def q_graph_components(spark, sf_dir):
    """Connected components over the customer graph via the SAME
    min-label-propagation loop the dedup pipeline uses
    (dedup.dedup_clusters — one operator, two families). The oracle is
    semantically independent: by construction every nation's members
    form one component (each links to its nation's 10 lowest keys), so
    the expected labeling is derivable with plain GROUP BY — the
    iterative algorithm must land exactly there."""
    g = _customer_graph(spark, sf_dir)
    pairs = g.select(
        F.col("id").alias("doc_a"), F.explode("adj").alias("doc_b")
    )
    return dedup.dedup_clusters(pairs).select(
        F.col("doc_id").alias("node_id"),
        F.col("canonical_id").alias("component_id"),
        F.col("cluster_size").alias("component_size"),
    )


def q_personalized_pagerank(spark, sf_dir):
    g = _customer_graph(spark, sf_dir)
    sources = [r["id"] for r in g.select("id").orderBy("id").limit(2).collect()]
    ranks = graph.personalized_pagerank(g, sources=sources, n_iter=8, num_partitions=8)
    # round before ranking — same exact-tie reasoning as q_pagerank.
    rounded = ranks.select("source", "id", F.round("pr", 6).alias("pr"))
    return graph.top_k_per_source(rounded, k=10)


def _variable_png_assets(spark, sf_dir):
    """Variable-dimension REAL grayscale PNGs per document — width
    4 + doc_id%12, height 8 — pixels = the first width*8 UTF-8 text
    bytes, zero-padded for short documents so EVERY document yields
    an asset (the dims histogram covers the whole corpus). Encoded
    executor-side in one Arrow batch; never collected."""
    import pandas as pd

    from mapreduce_assignments_spark.functions.png_codec import encode_png

    src = _docs(spark, sf_dir).select(
        "doc_id", F.expr("substring(encode(text, 'UTF-8'), 1, 128)").alias("px")
    )

    def encode(batches):
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["px"]):
                w = int(4 + doc_id % 12)
                need = w * 8
                buf = bytes(p[:need]).ljust(need, b"\x00")
                blobs.append(encode_png(w, 8, 1, buf))
                ids.append(doc_id)
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    return src.mapInPandas(encode, "asset_id long, content binary")


def q_aspect_ratio_histogram(spark, sf_dir):
    """Media-profiling without decode: dims parsed from the REAL PNG
    IHDR header only (fixed-offset u32be fields, JVM hex arithmetic —
    no Python, no decode), rolled into a (width, height) histogram
    with aspect ratios — the resolution-mix dashboard for a 100 TB
    media table."""
    dims = multimodal.image_dimensions(_variable_png_assets(spark, sf_dir))
    return dims.groupBy("width", "height").agg(
        F.count("*").alias("n_assets"),
        F.round(F.max("width") / F.max("height"), 6).alias("aspect_ratio"),
    )


def q_label_spread(spark, sf_dir):
    """Per-label embedding-norm mean/variance — encoder health."""
    return similarity.label_spread(_emb(spark, sf_dir))


def q_image_stats(spark, sf_dir):
    """Decode + feature rows over REAL PNG containers (the pure-stdlib
    codec round trip png_decode_stats also exercises — here as the
    plain image_stats registry entry, so no registry query stages a
    synthetic FAKE* container)."""
    return multimodal.image_stats(_png_assets(spark, sf_dir))


def _png_assets(spark, sf_dir):
    """REAL 8x8 grayscale PNG containers (signature, IHDR, zlib IDAT,
    CRCs — any image tool opens them) whose pixels are the first 64
    UTF-8 bytes of each document's text. Encoding is an Arrow-batched
    mapInPandas over the pure-stdlib encoder — the binary column is
    built and consumed executor-side, never collected."""
    import pandas as pd

    from mapreduce_assignments_spark.functions.png_codec import encode_png

    src = (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 64)
        .select("doc_id", F.expr("substring(encode(text, 'UTF-8'), 1, 64)").alias("px"))
    )

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "content": [encode_png(8, 8, 1, bytes(p)) for p in pdf["px"]],
                }
            )

    return src.mapInPandas(encode, "asset_id long, content binary")


def _jpeg_assets(spark, sf_dir):
    """REAL baseline JPEG containers (SOI, JFIF APP0, DQT, SOF0, DHT,
    entropy-coded scan — any image tool opens them) whose grayscale
    pixels are the document text's leading UTF-8 bytes, with per-doc
    dimensions w in {8,12,16} x h in {8..16} so the header parse is
    exercised across block-grid shapes (including partial edge
    blocks). Encoding is an Arrow-batched mapInPandas over the
    pure-stdlib encoder — the binary column is built and consumed
    executor-side, never collected."""
    import pandas as pd

    from mapreduce_assignments_spark.functions.jpeg_codec import encode_jpeg

    src = (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 256)
        .select(
            "doc_id",
            F.expr("substring(encode(text, 'UTF-8'), 1, 256)").alias("px"),
        )
    )

    def encode(batches):
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["px"]):
                w = 8 + (doc_id % 3) * 4
                h = 8 + (doc_id % 5) * 2
                blobs.append(
                    encode_jpeg(bytes(p[: w * h]), int(w), int(h), 1)
                )
                ids.append(doc_id)
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    return src.mapInPandas(encode, "asset_id long, content binary")


def q_jpeg_decode_stats(spark, sf_dir):
    """REAL-container JPEG round trip with zero third-party codecs:
    encode each document's leading bytes as an actual baseline JPEG,
    then decode it back through image_stats' DEFAULT decoder seam —
    exercising functions/jpeg_codec.py (Huffman entropy decode, DC
    prediction, dequant, batched IDCT) end-to-end inside the Arrow
    pipeline. JPEG is LOSSY, so unlike png_decode_stats the oracle
    cannot recompute pixel statistics from the text; the driver-gated
    output is the lossless-exact header facts (dimensions, channels)
    plus row PRESENCE — a row only exists when the full decode
    succeeds, since image_stats drops undecodable assets. Pixel-level
    decoder correctness is pinned in pytest against golden
    libjpeg-encoded files from CPython's public test suite plus an
    independent-DCT reference and PSNR-bounded round trips."""
    return multimodal.image_stats(_jpeg_assets(spark, sf_dir)).select(
        "asset_id", "width", "height", "channels"
    )


def _mjpeg_avi_assets(spark, sf_dir):
    """REAL AVI containers (RIFF ``hdrl``/``movi``/``idx1`` — any
    media tool opens them) carrying a 3-frame MJPG ``vids`` stream
    per document: frame f's grayscale pixels are the text's UTF-8
    bytes at offset 16·f, with the per-doc dimension formula the
    JPEG assets use, so header parse AND frame placement vary across
    rows. Built executor-side in an Arrow batch; never collected."""
    import pandas as pd

    from mapreduce_assignments_spark.functions.container_demux import mux_avi_mjpeg
    from mapreduce_assignments_spark.functions.jpeg_codec import encode_jpeg

    src = (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 288)
        .select(
            "doc_id",
            F.expr("substring(encode(text, 'UTF-8'), 1, 288)").alias("px"),
        )
    )

    def encode(batches):
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["px"]):
                w = int(8 + (doc_id % 3) * 4)
                h = int(8 + (doc_id % 5) * 2)
                frames = [
                    encode_jpeg(bytes(p[16 * f : 16 * f + w * h]), w, h, 1)
                    for f in range(3)
                ]
                blobs.append(mux_avi_mjpeg(frames, w, h))
                ids.append(doc_id)
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    return src.mapInPandas(encode, "asset_id long, content binary")


def q_mjpeg_frame_stats(spark, sf_dir):
    """REAL-container VIDEO round trip, zero third-party codecs:
    mux 3 baseline JPEGs per document into an actual AVI, then run
    video_frame_stats' DEFAULT seams — the RIFF demuxer in
    functions/container_demux.py and the JPEG entropy decoder in
    functions/jpeg_codec.py — end-to-end inside one Arrow stage.
    JPEG is lossy, so (like jpeg_decode_stats) the driver-gated
    output is the lossless-exact facts: per-frame dimensions,
    channels, and row PRESENCE (a row exists only when both demux
    and full frame decode succeed). Pixel math is golden-pinned in
    pytest; the MP4 demux path gets the value-exact check in
    mp4_frame_text."""
    return multimodal.video_frame_stats(_mjpeg_avi_assets(spark, sf_dir)).select(
        "asset_id", "frame_idx", "width", "height", "channels"
    )


def _mp4_text_assets(spark, sf_dir):
    """REAL progressive MP4 containers (ftyp/mdat/moov with full
    stsd/stts/stsc/stsz/stco sample tables) whose 5 samples are the
    document text's bytes at deterministic offsets with VARYING
    sizes (16+i), chunked 2 samples per stco chunk — so the demuxer
    must run the genuine stsc expansion + in-chunk offset walk to
    recover them. Sample payloads are raw text slices: demux
    correctness is value-checkable byte-for-byte by the oracle."""
    import pandas as pd

    from mapreduce_assignments_spark.functions.container_demux import mux_mp4

    src = (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 96)
        .select(
            "doc_id",
            F.expr("substring(encode(text, 'UTF-8'), 1, 96)").alias("b"),
        )
    )

    def encode(batches):
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["b"]):
                off, frames = 0, []
                for i in range(5):
                    ln = 16 + i
                    frames.append(bytes(b[off : off + ln]))
                    off += ln
                blobs.append(mux_mp4(frames, 8, 8, samples_per_chunk=2))
                ids.append(doc_id)
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    return src.mapInPandas(encode, "asset_id long, content binary")


def q_mp4_frame_text(spark, sf_dir):
    """MP4 sample-table demux, value-exact: every 2nd sample out of
    real ISO-BMFF containers through sample_frames' DEFAULT demuxer
    seam, payload bytes surfaced as text so the oracle verifies the
    demuxed CONTENT (not just counts) against the source documents —
    any error in the stsz/stsc/stco offset arithmetic changes the
    bytes and breaks the hash."""
    out = multimodal.sample_frames(_mp4_text_assets(spark, sf_dir), every_k=2)
    return out.select(
        "asset_id", "frame_idx", F.col("frame").cast("string").alias("frame_text")
    )


def q_lpa_communities(spark, sf_dir):
    """Deterministic min-tiebreak LPA over the variable-degree
    customer graph — community rollup after 4 synchronous rounds."""
    return graph.lpa_communities(_kcore_graph(spark, sf_dir), rounds=4)


def q_nb_quality_confusion(spark, sf_dir):
    """Confusion matrix of the silver-label NB quality classifier —
    the learned-quality-filter regression gate."""
    return text_quality.nb_quality_confusion(_docs(spark, sf_dir))


def q_png_decode_stats(spark, sf_dir):
    """REAL-container round trip with zero third-party codecs: encode
    each document's first 64 bytes as an actual PNG (zlib IDAT, CRCs),
    then decode it back through image_stats' DEFAULT decoder seam —
    exercising functions/png_codec.py end-to-end inside the Arrow
    pipeline. The oracle recomputes the pixel statistics straight from
    the document text, so any codec bug (filtering, IDAT assembly,
    chunk CRCs, scanline layout) breaks the hash match."""
    return multimodal.image_stats(_png_assets(spark, sf_dir))


def _mixed_media_assets(spark, sf_dir):
    """A REAL-container format mix per document — doc_id%3 picks
    WAV (canonical PCM), raw-DIB AVI (4 × 16-byte frames), or
    progressive MP4 (5 varying-size samples) — so the sniffer's
    magic table AND its RIFF form-type refinement (WAVE vs 'AVI ')
    are both exercised on genuine on-disk bytes. Every container
    length is deterministic (fixed frame-count/size layout), so the
    oracle re-derives n_bytes from the muxers at import time."""
    import pandas as pd

    from mapreduce_assignments_spark.functions.container_demux import (
        mux_avi_raw,
        mux_mp4,
    )

    src = (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 96)
        .select(
            "doc_id",
            F.expr("substring(encode(text, 'UTF-8'), 1, 96)").alias("b"),
        )
    )

    def encode(batches):
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["b"]):
                b = bytes(b)
                k = doc_id % 3
                if k == 0:
                    blobs.append(multimodal.make_wav(b[:64], 1, 16000))
                elif k == 1:
                    frames = [b[16 * f : 16 * f + 16] for f in range(4)]
                    blobs.append(mux_avi_raw(frames, 8, 8))
                else:
                    off, frames = 0, []
                    for i in range(5):
                        ln = 16 + i
                        frames.append(b[off : off + ln])
                        off += ln
                    blobs.append(mux_mp4(frames, 8, 8, samples_per_chunk=2))
                ids.append(doc_id)
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    return src.mapInPandas(encode, "asset_id long, content binary")


def q_media_sniff(spark, sf_dir):
    """JVM-side magic sniff over a REAL WAV/AVI/MP4 mix — format and
    byte-length per asset, no decode, no Python in the sniff stage."""
    out = multimodal.sniff_media(_mixed_media_assets(spark, sf_dir))
    return out.select("asset_id", "format", "n_bytes")


def _raw_avi_assets(spark, sf_dir):
    """REAL uncompressed AVI containers (RIFF ``hdrl``/``movi``/
    ``idx1``, ``DIB `` handler) whose 4 × 16-byte ``00dc`` frames are
    raw slices of the document text — no lossy codec in the way, so
    the demuxed bytes are value-checkable against the source text
    (the AVI analogue of _mp4_text_assets). Built executor-side in
    one Arrow batch; never collected."""
    import pandas as pd

    from mapreduce_assignments_spark.functions.container_demux import mux_avi_raw

    src = (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 64)
        .select(
            "doc_id",
            F.expr("substring(encode(text, 'UTF-8'), 1, 64)").alias("b"),
        )
    )

    def encode(batches):
        for pdf in batches:
            ids, blobs = [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["b"]):
                b = bytes(b)
                frames = [b[16 * f : 16 * f + 16] for f in range(4)]
                blobs.append(mux_avi_raw(frames, 8, 8))
                ids.append(doc_id)
            yield pd.DataFrame({"asset_id": ids, "content": blobs})

    return src.mapInPandas(encode, "asset_id long, content binary")


def q_frame_sample(spark, sf_dir):
    """Every-2nd-frame sampling out of REAL uncompressed AVIs through
    sample_frames' DEFAULT demuxer seam — the frames are raw text
    slices, so the oracle verifies the demuxed CONTENT byte-for-byte
    (any error in the RIFF movi walk or chunk padding arithmetic
    changes the bytes and breaks the hash), plus the sampled index
    arithmetic and frame sizes."""
    out = multimodal.sample_frames(_raw_avi_assets(spark, sf_dir), every_k=2)
    return out.select(
        "asset_id",
        "frame_idx",
        F.length("frame").alias("frame_bytes"),
        F.col("frame").cast("string").alias("frame_text"),
    )


def q_phash_duplicates(spark, sf_dir):
    """64-bit average-hash duplicate groups over REAL PNG containers —
    the decode seam runs the pure-stdlib PNG codec, so the hash is
    computed from genuinely decoded pixels."""
    return multimodal.phash_duplicates(_png_assets(spark, sf_dir))


def _fake_wav_assets(spark, sf_dir):
    """REAL canonical PCM WAV containers (any audio tool opens them —
    unlike FAKEIMG/FAKEVID this is the actual on-disk format) whose
    64-byte data chunk is the document's first 64 UTF-8 bytes. Even
    doc_ids get a mono 16 kHz header, odd a stereo 8 kHz one, so every
    parsed field varies across rows. Headers attached JVM-side."""
    h_mono = multimodal.make_wav(bytes(64), channels=1, sample_rate=16000)[:44]
    h_stereo = multimodal.make_wav(bytes(64), channels=2, sample_rate=8000)[:44]
    return (
        _docs(spark, sf_dir)
        .where(F.col("n_chars") >= 64)
        .select(
            F.col("doc_id").alias("asset_id"),
            F.concat(
                F.when(F.col("doc_id") % 2 == 0, F.lit(h_mono)).otherwise(
                    F.lit(h_stereo)
                ),
                F.expr("substring(encode(text, 'UTF-8'), 1, 64)"),
            ).alias("content"),
        )
    )


def q_audio_stats(spark, sf_dir):
    return multimodal.audio_stats(_fake_wav_assets(spark, sf_dir))


def q_resize_images(spark, sf_dir):
    """8×8 → 4×4 nearest-neighbor thumbnails; the resized bytes are
    summarized JVM-side (hex fold) so the oracle can re-derive the
    exact resize arithmetic from the source text bytes."""
    out = multimodal.resize_images(
        _png_assets(spark, sf_dir), out_w=4, out_h=4
    )
    hx = F.upper(F.hex("resized"))
    px = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda j: F.conv(hx.substr(j * 2 + 1, F.lit(2)), 16, 10).cast("long"),
    )
    byte_sum = F.aggregate(px, F.lit(0).cast("long"), lambda a, v: a + v)
    return out.select(
        "asset_id",
        "width",
        "height",
        "channels",
        F.round(byte_sum / F.lit(16.0), 6).alias("mean_px"),
        byte_sum.alias("byte_sum"),
    )


def q_ivf_topk_trained(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    centroids = similarity.ivf_train(emb, k=8, n_iter=2)
    queries = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"))
    return similarity.ivf_topk(emb, centroids, queries, k=10, nprobe=2)


def q_ivf_silhouette(spark, sf_dir):
    """Cluster-quality diagnostics for the fixed-centroid IVF
    assignment (same vec_id < 8 centroids as ivf_assign, so the
    oracle replays assignment without the trainer): per-cell
    simplified silhouette — the partition-health report that says
    whether an ANN index's cells are real structure or arbitrary."""
    emb = _emb(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c")
    )
    return similarity.ivf_silhouette(emb, centroids)


def q_pq_codes(spark, sf_dir):
    """PQ-compressed index: m=8 subspace k-means codebooks (k=8,
    2 Lloyd's rounds, first-k-ids init) trained in-plan, then every
    vector encoded by a zero-shuffle literal-fold argmin — the
    (vec_id, subspace, code) table IS the 64×-smaller index
    (8 one-byte codes vs 64 doubles). The
    oracle replays the whole trainer (init, both rounds, final
    assignment) in SQL CTEs, the ivf_topk_trained discipline."""
    emb = _emb(spark, sf_dir)
    codebooks = similarity.pq_train(emb, m=8, k=8, n_iter=2)
    return similarity.pq_codes(emb, codebooks)


def q_pq_adc_topk(spark, sf_dir):
    """Asymmetric-distance top-10 for the 5 eval queries over the PQ
    index — query-time reads codes only (never the vectors), per-pair
    distance = sum of m fixed-point LUT lookups (order-independent
    LONG summands), ranking by the exact integer sum."""
    emb = _emb(spark, sf_dir)
    codebooks = similarity.pq_train(emb, m=8, k=8, n_iter=2)
    return similarity.pq_adc_topk(emb, codebooks, n_queries=5, topk=10)


_STAGED_IVF_INDEX: dict[str, str] = {}


def _ivf_centroids(spark, sf_dir):
    """Fixed (untrained) centroids shared by the index write and the
    probe — vec_id < 8, same as q_ivf_assign, so the oracle can replay
    the assignment without reproducing the trainer."""
    return _emb(spark, sf_dir).where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c")
    )


def _staged_ivf_index_dir(spark, sf_dir: str) -> str:
    """Materialize the cell-partitioned IVF index once per (process,
    sf_dir) — same staging lifecycle as _staged_events_dir."""
    if sf_dir not in _STAGED_IVF_INDEX:
        import atexit
        import shutil
        import tempfile

        stage = tempfile.mkdtemp(prefix="mras-ivf-index-")
        atexit.register(shutil.rmtree, stage, ignore_errors=True)
        similarity.write_ivf_index(
            _emb(spark, sf_dir), _ivf_centroids(spark, sf_dir), stage
        )
        _STAGED_IVF_INDEX[sf_dir] = stage
    return _STAGED_IVF_INDEX[sf_dir]


def q_ivf_index_probe(spark, sf_dir):
    """ANN probe against the MATERIALIZED cell-partitioned index
    (similarity.write_ivf_index → probe_ivf_index): the at-rest scale
    path where a probe opens only its nprobe cell directories
    (partition pruning plan-asserted in tests/test_plan_shapes.py).
    Same (queries, k, nprobe) shape as ivf_topk_trained so results are
    directly comparable across the in-flight and at-rest paths."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    return similarity.probe_ivf_index(
        spark,
        _staged_ivf_index_dir(spark, sf_dir),
        queries,
        _ivf_centroids(spark, sf_dir),
        k=10,
        nprobe=2,
    )


def q_unigram_logprob(spark, sf_dir):
    """Perplexity-proxy quality scoring: mean token log-probability
    under an add-one smoothed unigram LM trained on the corpus itself
    (text_quality.unigram_logprob)."""
    return text_quality.unigram_logprob(_docs(spark, sf_dir))


def q_value_buckets(spark, sf_dir):
    """Exact equi-depth quartile bucketing of event values, reported
    as the per-bucket histogram (depths near-equal by construction)."""
    b = features.quantile_buckets(
        _events(spark, sf_dir), value_col="value", n_buckets=4
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 6).alias("vmin"),
        F.round(F.max("value"), 6).alias("vmax"),
    )


def q_hourly_anomalies(spark, sf_dir):
    """Trailing-window z-score volume anomalies per event_type (6-hour
    baseline, current hour excluded from its own baseline)."""
    return temporal.hourly_anomalies(_events(spark, sf_dir))


def q_snapshot_diff(spark, sf_dir):
    """Incremental-sync diff between two deterministic versions of the
    events table: the 'old' snapshot is missing every 17th event
    (-> inserts), the 'new' one drops every 19th (-> deletes) and bumps
    value on every 13th (-> updates); value is canonicalized to
    DECIMAL(18,6) before digesting (engine-stable rendering)."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "event_type",
        F.round("value", 6).cast("decimal(18,6)").alias("value_d"),
    )
    old = ev.where(F.col("event_id") % 17 != 0)
    new = ev.where(F.col("event_id") % 19 != 0).withColumn(
        "value_d",
        F.when(
            F.col("event_id") % 13 == 0,
            (F.col("value_d") + 1).cast("decimal(18,6)"),
        ).otherwise(F.col("value_d")),
    )
    return temporal.snapshot_diff(
        old, new, key="event_id", compare_cols=("event_type", "value_d")
    )


def q_shuffle_shards(spark, sf_dir):
    """Deterministic epoch-shuffle layout: 8 hash shards with
    reproducible within-shard positions (seed '42')."""
    return sampling.shuffle_shards(
        _docs(spark, sf_dir).select("doc_id", "source"),
        key="doc_id",
        n_shards=8,
        seed="42",
    )


def q_daily_trend(spark, sf_dir):
    """Per-event_type linear trend of daily volume via the built-in
    least-squares aggregates: slope/intercept of count ~ epoch-day.
    One pre-aggregation to daily counts, then regr_* over the tiny
    per-type day series — closed-form, no iterative fitting."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("d"),
    ).agg(F.count("*").alias("n"))
    return daily.groupBy("event_type").agg(
        F.round(F.expr("regr_slope(n, d)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(n, d)"), 6).alias("intercept"),
        F.count("*").alias("n_days"),
    )


def q_event_cube(spark, sf_dir):
    """Full CUBE over (event_type, day): every grouping-set combination
    in ONE pass (Expand + partial agg), subtotal rows labelled '(all)'
    so no real value is ambiguous with a rollup marker."""
    ev = _events(spark, sf_dir).select(
        "event_type",
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    return (
        ev.cube("event_type", "day")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("day", F.lit("(all)")).alias("day"),
            "n",
            "total_value",
        )
    )


def q_session_stats(spark, sf_dir):
    """Per-session rows via Spark's native session_window grouping
    (dynamic-gap windows; end = last event + gap, strict overlap)."""
    return relational.session_stats(_events(spark, sf_dir), gap_minutes=30)


def q_normalize_events(spark, sf_dir):
    """Per-event_type z-score + min-max scaling of event values (the
    standard-scaler pair, exact two-pass stats join)."""
    ev = _events(spark, sf_dir).select(
        "event_id", "event_type", F.col("value")
    )
    return features.normalize_values(
        ev, value_col="value", group_col="event_type"
    )


def q_co_engagement(spark, sf_dir):
    """Distinct-user co-engagement counts for every event-type pair."""
    return funnel.co_engagement(_events(spark, sf_dir))


def q_rolling_active_users(spark, sf_dir):
    """DAU / trailing-7-day WAU per observed day."""
    return funnel.rolling_active_users(_events(spark, sf_dir))


def q_length_histogram(spark, sf_dir):
    """Log2-bucketed document-length distribution — every corpus
    report's first chart. The bucket is integer bit-math
    (len(bin(n)) - 1), not float log2, so power-of-two boundaries are
    exact in both engines. Pure one-exchange aggregation."""
    d = _docs(spark, sf_dir)
    bucket = F.when(
        F.col("n_chars") > 0, F.length(F.expr("bin(n_chars)")) - 1
    ).otherwise(F.lit(-1))
    return (
        d.select(bucket.cast("int").alias("log2_bucket"), "n_chars")
        .groupBy("log2_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def q_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the corpus: least-squares slope/intercept of
    ln(freq) ~ ln(rank) over the ranked vocabulary (natural text sits
    near slope -1). The global rank window runs over the VOCABULARY
    (corpus collapses in word_count first); at extreme vocab scale the
    rank becomes a range-partitioned prefix-offset computation, but
    the single sort of a counts table is fine far past 1e8 terms."""
    from pyspark.sql.window import Window

    wc = text.word_count(_docs(spark, sf_dir))
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    ranked = wc.withColumn("rank", F.row_number().over(w))
    return ranked.agg(
        F.round(F.expr("regr_slope(ln(cnt), ln(rank))"), 6).alias("zipf_slope"),
        F.round(F.expr("regr_intercept(ln(cnt), ln(rank))"), 6).alias(
            "zipf_intercept"
        ),
        F.count("*").alias("vocab"),
    )


def q_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training: the 5 highest-count merges
    learned from the corpus vocabulary (greedy left-to-right
    application between rounds, deterministic tie-break). The oracle
    replays all 5 rounds in DuckDB — list_reduce reproduces the fold
    bit-for-bit."""
    return features.bpe_merges(_docs(spark, sf_dir), n_merges=5)


def q_bpe_vocab(spark, sf_dir):
    """Train-then-apply: encode the corpus with its own learned 5-merge
    BPE table and return the subword-frequency vocabulary. The merge
    list crossing the driver is 5 rows — bounded by construction."""
    learned = [
        (r["lhs"], r["rhs"])
        # r15: the single-job batch-argmax trainer — identical merge
        # table (same unrolled oracle; probe-pinned), 2.1 -> 0.6 s
        for r in features.bpe_merges_local(_docs(spark, sf_dir), n_merges=5)
        .orderBy("rank")
        .collect()
    ]
    return features.bpe_encode(_docs(spark, sf_dir), learned)


def q_robust_outliers(spark, sf_dir):
    """Median/MAD modified z-score outlier flags per event_type."""
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    return profiling.robust_outliers(ev, value_col="value", group_col="event_type")


def q_brand_nation_revenue(spark, sf_dir):
    """Supply-side star join (TPC-H Q9 flavor): discounted revenue per
    (supplier nation, part brand) — exercises the part and supplier
    dimension tables."""
    return relational.brand_nation_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def q_late_orders_by_priority(spark, sf_dir):
    """TPC-H Q4-shaped EXISTS semi-join: orders with at least one
    lineitem shipped > 60 days after the order date, counted by
    priority. LEFT SEMI keeps each order once regardless of how many
    lineitems qualify — no fact-side duplication ever materializes."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (orders["o_orderkey"] == li["l_orderkey"]) & (
        F.to_date(li["l_shipdate"]) > F.date_add(F.to_date(orders["o_orderdate"]), 60)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_forecast_revenue(spark, sf_dir):
    return relational.forecast_revenue(load_table(spark, sf_dir, "lineitem"))


def q_bpe_token_counts(spark, sf_dir):
    """Per-document token count under the corpus's own learned 5-merge
    BPE table — the real-tokenizer length signal (token_counts' regex
    count is a proxy); the fold runs once per distinct word and joins
    back on tf pairs."""
    docs = _docs(spark, sf_dir)
    learned = [
        (r["lhs"], r["rhs"])
        # r15: single-job trainer, identical merge table (see q_bpe_vocab)
        for r in features.bpe_merges_local(docs, n_merges=5).orderBy("rank").collect()
    ]
    return features.bpe_token_counts(docs, learned)


def q_centroid_confusion(spark, sf_dir):
    return similarity.centroid_confusion(_emb(spark, sf_dir))


def q_incremental_dedup(spark, sf_dir):
    """Steady-state ingestion dedup: docs with doc_id % 3 == 0 arrive
    as the new batch against the digest index of the rest of the
    corpus; survivors are new-batch docs whose text is unseen, one per
    within-batch duplicate group (min id)."""
    docs = _docs(spark, sf_dir)
    new_batch = docs.where(F.col("doc_id") % 3 == 0)
    seen = (
        docs.where(F.col("doc_id") % 3 != 0)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    return dedup.incremental_dedup(new_batch, seen)


def q_top_return_customers(spark, sf_dir):
    return relational.top_return_customers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        k=20,
    )


def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: top-10 in-flight BUILDING-segment orders by
    accrued revenue at the 1998-07-01 cutoff."""
    return relational.shipping_priority(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: PROMO-part revenue share for ship-month
    1998-03 — conditional aggregation over one broadcast join."""
    return relational.promo_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_large_volume_orders(spark, sf_dir):
    """TPC-H Q18 shape: aggregate-then-join — orders whose total
    quantity tops 250, with their customers."""
    return relational.large_volume_orders(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def q_part_bracket_revenue(spark, sf_dir):
    """TPC-H Q19 shape: one-pass disjunction of three
    (brand, size, quantity) brackets over the broadcast part join."""
    return relational.part_bracket_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional revenue flow between two nations
    per ship year."""
    return relational.volume_shipping(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3's share of ASIA's ECONOMY-part market
    per order year — conditional aggregation over a 5-way star."""
    return relational.market_share(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of customers by qualifying order
    count (two-level aggregation over a left outer join)."""
    return relational.customer_distribution(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
    )


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the max-revenue supplier(s) of 1996Q1, ties
    kept — aggregate, single-row max broadcast back, dimension join."""
    return relational.top_supplier(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


def q_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: decorrelated avg-quantity subquery — yearly
    revenue in Brand#23 lineitems below 20% of their part's average
    quantity."""
    return relational.small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
    )


def q_target_encoding(spark, sf_dir):
    """Smoothed mean target encoding of order priority against order
    value (m=10) — the classic leakage-resistant categorical feature."""
    return features.target_encoding(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_totalprice"
    )


def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit of the (mktsegment, nationkey)
    quasi-identifier over customers, k=5 — the re-identification risk
    gate before a data release."""
    return profiling.k_anonymity(
        load_table(spark, sf_dir, "customer"),
        ["c_mktsegment", "c_nationkey"],
        k=5,
    )


def q_temporal_split(spark, sf_dir):
    """Time-based train/val/test split of the events stream with a
    user-overlap leakage report: per split, row and user counts plus
    how many of its users also appear in train (temporal splits leak
    ENTITIES even when they cannot leak the future)."""
    s = sampling.temporal_split(
        _events(spark, sf_dir),
        "ts",
        [("train", "2024-01-20"), ("val", "2024-01-25")],
    )
    train_users = (
        s.where(F.col("split") == "train").select("user_id").distinct()
        .withColumn("__in_train", F.lit(1))
    )
    return (
        s.join(F.broadcast(train_users), "user_id", "left_outer")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct(
                F.when(F.col("__in_train").isNotNull(), F.col("user_id"))
            ).alias("n_overlap_users"),
        )
    )


def q_filter_funnel(spark, sf_dir):
    """Sequential Gopher-style quality-filter funnel over the corpus —
    where do documents die, rule by rule."""
    return text_quality.filter_funnel(_docs(spark, sf_dir))


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style per-cell semantic dedup summary over the
    embeddings table (corpus-scaled seed centroids — see
    _scaled_cell_centroids — cosine ≥ 0.9 within a cell,
    keep-lowest-id)."""
    emb = _emb(spark, sf_dir)
    return similarity.semantic_dedup(
        emb, _scaled_cell_centroids(emb), threshold=0.9
    )


_STAGED_SESSION_STREAM: dict = {}


def q_streaming_session_stats(spark, sf_dir):
    """Native session_window ON THE STREAM (append mode + watermark),
    replayed to closure in ONE availableNow run: the replay helper
    stages the events as a single file plus two mtime-ordered far-future
    sentinel files and splits the run into three micro-batches with
    maxFilesPerTrigger=1, so the watermark advances past every real
    session end WITHIN the run — no stream restarts (round-7 harness
    cost fix; see streaming.replay_sessions_to_parquet for the batch
    math). The final read must equal the BATCH session_stats oracle
    row-for-row — the batch/stream consistency contract, now for
    dynamic-gap windows. Staged once per (process, sf_dir); sentinel
    rows (user -1) filtered out."""
    from .streaming import replay_sessions_to_parquet

    if sf_dir not in _STAGED_SESSION_STREAM:
        import atexit
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="mras-session-stream-")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        out = replay_sessions_to_parquet(spark, _events(spark, sf_dir), root)
        _STAGED_SESSION_STREAM[sf_dir] = out
    return (
        spark.read.parquet(_STAGED_SESSION_STREAM[sf_dir])
        .where(F.col("user_id") != -1)
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )


def q_interpolate_gaps(spark, sf_dir):
    """Linearly interpolated dense hourly value series per event type
    — the imputation step between zero-fill and modeling."""
    return temporal.interpolate_gaps(_events(spark, sf_dir))


def q_knn_label_accuracy(spark, sf_dir):
    """1-NN leave-one-out label accuracy over the first 50 embedding
    probes — the standard embedding-quality eval."""
    return similarity.knn_label_accuracy(_emb(spark, sf_dir), n_queries=50)


def q_span_corruption(spark, sf_dir):
    """T5-style span-corruption budget sheet: deterministic 15%
    per-position masking, per-doc token/masked/span counts — all
    narrow higher-order functions, no explode."""
    return features.span_corruption_stats(_docs(spark, sf_dir))


def q_phrase_search(spark, sf_dir):
    """Positional-index phrase retrieval for "spark table" — the
    adjacency-constrained AND over term-filtered postings."""
    return index.phrase_search(_docs(spark, sf_dir), ("spark", "table"))


def q_session_paths(spark, sf_dir):
    """Top-20 session entry paths (first 3 event types per 30-minute
    session) — the how-do-sessions-start report."""
    return funnel.session_paths(_events(spark, sf_dir))


def q_csv_malformed_report(spark, sf_dir):
    """Dead-letter accounting over the SAME planted-malformed CSV
    stage the roundtrip query drops silently: PERMISSIVE read with a
    _corrupt column, one row (n_rows, n_corrupt, n_null_id, n_valid)
    — parse failures vs contract violations vs clean rows."""
    from .sources.text_corpus import read_documents_csv_permissive

    raw = read_documents_csv_permissive(spark, _staged_docs_csv_dir(spark, sf_dir))
    corrupt = F.col("_corrupt").isNotNull()
    null_id = F.col("_corrupt").isNull() & F.col("doc_id").isNull()
    return raw.agg(
        F.count("*").alias("n_rows"),
        F.sum(corrupt.cast("int")).cast("long").alias("n_corrupt"),
        F.sum(null_id.cast("int")).cast("long").alias("n_null_id"),
        F.sum((~corrupt & F.col("doc_id").isNotNull()).cast("int"))
        .cast("long")
        .alias("n_valid"),
    )


def q_user_purge_report(spark, sf_dir):
    """GDPR-style deletion dry run over every 5th user: one
    conditional-aggregation pass accounts for what a purge would
    remove — (n_purge_users, n_events_removed, n_events_kept). When
    the purge predicate is row-computable this single pass IS the
    scale shape (an external deletion list would take the
    customers_without_orders anti-join instead)."""
    flag = F.col("user_id") % 5 == 0
    return _events(spark, sf_dir).agg(
        F.count_distinct(F.when(flag, F.col("user_id"))).alias("n_purge_users"),
        F.sum(flag.cast("int")).cast("long").alias("n_events_removed"),
        F.sum((~flag).cast("int")).cast("long").alias("n_events_kept"),
    )


def q_prefix_search(spark, sf_dir):
    """Wildcard 'sp*' term retrieval: distinct matched terms and
    occurrences per document."""
    return index.prefix_search(_docs(spark, sf_dir), prefix="sp")


def q_nation_trade_balance(spark, sf_dir):
    """Exports vs imports per nation: two nation-sized star rollups,
    full-outer combined at dimension scale."""
    return relational.nation_trade_balance(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


def q_discount_effectiveness(spark, sf_dir):
    """Volume response per discount level — grid-cardinality
    conditional aggregation."""
    return relational.discount_effectiveness(load_table(spark, sf_dir, "lineitem"))


def q_hourly_top_movers(spark, sf_dir):
    """Top-10 hour-over-hour count swings per event type — the
    what-just-spiked dashboard."""
    return timeseries.hourly_top_movers(_events(spark, sf_dir))


def q_basket_lift(spark, sf_dir):
    """Session-basket association lift between event-type pairs —
    co-occurrence vs independence over 30-minute session baskets."""
    return funnel.basket_lift(_events(spark, sf_dir))


def q_filter_funnel_examples(spark, sf_dir):
    """Per-rule rejection examples for the quality funnel: the 3
    lowest-id documents each rule kills, ids k-bounded BEFORE any
    collect."""
    return text_quality.filter_funnel_examples(_docs(spark, sf_dir))


def q_quantization_error(spark, sf_dir):
    """Cosine fidelity of int8 scalar quantization per label — the
    accept/reject gate before switching ANN storage to int8."""
    return similarity.quantization_error(_emb(spark, sf_dir))


def q_sentence_dedup_stats(spark, sf_dir):
    """Sentence-mass duplication per source — the boilerplate
    dashboard below document-level dedup."""
    return text_quality.sentence_dedup_stats(_docs(spark, sf_dir))


def q_vocab_coverage(spark, sf_dir):
    """Top-k vocabulary coverage curve (k = 100/1000/10000) — the
    tokenizer-sizing readout."""
    return text_quality.vocab_coverage(_docs(spark, sf_dir))


def q_idf_drift(spark, sf_dir):
    """Top-20 IDF movers between the corpus's deterministic halves —
    lexical drift you can read."""
    return text_quality.idf_drift(_docs(spark, sf_dir))


def q_activity_heatmap(spark, sf_dir):
    """Day-of-week × hour-of-day activity with distinct users — the
    168-cell audience heatmap."""
    return timeseries.activity_heatmap(_events(spark, sf_dir))


def q_rfm_segments(spark, sf_dir):
    """Exact tercile RFM segmentation rollup over orders — the
    classic marketing segmentation without a global sort."""
    return relational.rfm_segments(load_table(spark, sf_dir, "orders"))


def q_transition_latency(spark, sf_dir):
    """Dwell-time stats per event-type transition — the latency
    companion to the Markov transition matrix."""
    return funnel.transition_latency(_events(spark, sf_dir))


def q_linear_attribution(spark, sf_dir):
    """Equal-credit multi-touch attribution of purchases across
    click/view touches — trailing running counts, no touch join."""
    return funnel.linear_attribution(_events(spark, sf_dir))


_STAGED_MANIFEST: dict = {}


def q_manifest_ingest(spark, sf_dir):
    """Exactly-once file ingestion via a persisted manifest: events
    staged as two file batches, THREE ingest calls (the third sees no
    new files and must be a no-op) — the accumulated sink then counts
    per event_type and must equal the one-shot aggregation, proving
    nothing was skipped or double-ingested."""
    from .sources.tables import manifest_ingest

    if sf_dir not in _STAGED_MANIFEST:
        import atexit
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="mras-manifest-")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        src, state = f"{root}/src", f"{root}/state"
        ev = _events(spark, sf_dir).select("event_id", "event_type")
        half = F.abs(F.xxhash64(F.col("event_id"))) % 2
        ev.where(half == 0).coalesce(1).write.mode("append").parquet(src)
        manifest_ingest(spark, src, state)
        ev.where(half == 1).coalesce(1).write.mode("append").parquet(src)
        manifest_ingest(spark, src, state)
        _STAGED_MANIFEST[sf_dir] = (src, state)
    src, state = _STAGED_MANIFEST[sf_dir]
    # the steady-state call: no new files, so this must be a no-op
    return (
        manifest_ingest(spark, src, state)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


def q_index_shard_balance(spark, sf_dir):
    """Operational skew report for the IVF index layout: per-cell
    population from the seed-centroid assignment reduced to
    (n_cells, max_cell, min_cell, balance_ratio) — the
    is-one-shard-hot check before an index ships."""
    emb = _emb(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c")
    )
    cells = (
        similarity.ivf_assign(emb, centroids)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )
    return cells.agg(
        F.count("*").alias("n_cells"),
        F.max("n").alias("max_cell"),
        F.min("n").alias("min_cell"),
        F.round(
            F.max("n") / (F.sum("n") / F.count("*")), 6
        ).alias("balance_ratio"),
    )


def q_rolling_weekly_revenue(spark, sf_dir):
    """Daily revenue with a true 7-calendar-day RANGE window over the
    day-cardinality rollup."""
    return relational.rolling_weekly_revenue(load_table(spark, sf_dir, "orders"))


def q_yoy_growth(spark, sf_dir):
    """Year-over-year monthly revenue growth via the shifted-month
    self-join (missing months yield NULL, as they must)."""
    return relational.yoy_growth(load_table(spark, sf_dir, "orders"))


def q_char_entropy(spark, sf_dir):
    """Character-entropy quality signal per source — junk detectors'
    low/high-entropy flags."""
    return text_quality.char_entropy(_docs(spark, sf_dir))


def q_language_id_accuracy(spark, sf_dir):
    """Confusion matrix of the marker-based language-ID heuristic
    against the table's ground-truth lang labels — (true_lang,
    pred_lang, n, pct_of_true). The eval that tells you whether the
    heuristic is shippable per language."""
    docs = _docs(spark, sf_dir)
    pred = text_quality.language_id(docs).select("doc_id", "pred_lang")
    truth = docs.select("doc_id", F.col("lang").alias("true_lang"))
    cm = (
        truth.join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )
    per_true = cm.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    return (
        cm.join(F.broadcast(per_true), "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.round(F.col("n") / F.col("n_true"), 6).alias("pct_of_true"),
        )
    )


def q_lines_per_order_histogram(spark, sf_dir):
    """Join fan-out profile: how many orders have exactly k lineitems
    — (n_lines, n_orders). The distribution every orders ⋈ lineitem
    cost model starts from."""
    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
    )
    return per_order.groupBy("n_lines").agg(F.count("*").alias("n_orders"))


def q_component_size_histogram(spark, sf_dir):
    """Connected-component size distribution of the customer graph —
    (component_size, n_components). The one-glance fragmentation
    readout over the same labeling graph_components produces."""
    comp = q_graph_components(spark, sf_dir)
    sizes = comp.groupBy("component_id").agg(
        F.count("*").alias("component_size")
    )
    return sizes.groupBy("component_size").agg(
        F.count("*").alias("n_components")
    )


def q_interarrival_rates(spark, sf_dir):
    """Per-event-type inter-arrival statistics within each user's
    stream of THAT type: n_gaps, mean gap seconds, and the
    exponential-MLE rate per hour (λ = 1/mean) — the load-model
    parameters capacity planning reads off."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = (
        _events(spark, sf_dir)
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("gap_s", (us - F.lag(us).over(w)) / 1_000_000.0)
        .where(F.col("gap_s").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("mean_gap_s"),
        F.round(F.lit(3600.0) / F.avg("gap_s"), 6).alias("rate_per_hour"),
    )


_STAGED_QUALITY_STREAM: dict = {}


def q_streaming_quality_gate(spark, sf_dir):
    """The quality funnel computed INCREMENTALLY on a document
    stream: each micro-batch contributes its stage-of-death counts
    (per-doc independent, hence additive) via foreachBatch partials;
    the final read sums partials and reconstructs the sequential
    funnel rows. Full replay must equal the batch filter_funnel
    oracle — curation-as-a-stream with exact batch parity, no
    stateful operator needed (the additivity IS the design point)."""
    if sf_dir not in _STAGED_QUALITY_STREAM:
        import atexit
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="mras-quality-stream-")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        src, out = f"{root}/src", f"{root}/out"
        _docs(spark, sf_dir).select("doc_id", "text").repartition(
            4
        ).write.mode("overwrite").parquet(src)

        def partials(batch_df, batch_id):
            toks = text.tokens_array("text")
            n_tok = F.size(toks)
            sum_len = F.aggregate(
                F.transform(toks, lambda t: F.length(t)),
                F.lit(0),
                lambda acc, x: acc + x,
            )
            n_chars = F.length(F.col("text"))
            upper = F.length(F.regexp_replace(F.col("text"), "[^A-Z]", ""))
            r1 = n_tok >= 5
            r2 = (sum_len >= 2 * n_tok) & (sum_len <= 12 * n_tok)
            r3 = F.lit(10) * upper <= F.lit(3) * n_chars
            batch_df.agg(
                F.count("*").alias("n0"),
                F.sum(F.when(~r1, 1).otherwise(0)).alias("f1"),
                F.sum(F.when(r1 & ~r2, 1).otherwise(0)).alias("f2"),
                F.sum(F.when(r1 & r2 & ~r3, 1).otherwise(0)).alias("f3"),
            ).write.mode("append").parquet(out)

        q = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)  # force multiple batches
            .parquet(src)
            .writeStream.outputMode("append")
            .option("checkpointLocation", f"{root}/ckpt")
            .foreachBatch(partials)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        _STAGED_QUALITY_STREAM[sf_dir] = out
    sums = spark.read.parquet(_STAGED_QUALITY_STREAM[sf_dir]).agg(
        F.sum("n0").alias("n0"),
        F.sum("f1").alias("f1"),
        F.sum("f2").alias("f2"),
        F.sum("f3").alias("f3"),
    )
    stage = lambda i, rule, n_in, f: F.struct(  # noqa: E731
        F.lit(i).alias("stage"),
        F.lit(rule).alias("rule"),
        n_in.alias("n_in"),
        f.alias("n_rejected"),
        (n_in - f).alias("n_out"),
    )
    n1 = F.col("n0") - F.col("f1")
    n2 = n1 - F.col("f2")
    return sums.select(
        F.inline(
            F.array(
                stage(1, "min_tokens", F.col("n0"), F.col("f1")),
                stage(2, "mean_token_len", n1, F.col("f2")),
                stage(3, "uppercase_ratio", n2, F.col("f3")),
            )
        )
    )


def q_customer_growth_topk(spark, sf_dir):
    """Top-15 customers by 1997-over-1996 spend growth (both years
    required): two year-filtered rollups inner-joined at customer
    cardinality, TakeOrdered top-k; ties break on custkey."""
    o = load_table(spark, sf_dir, "orders")

    def year_spend(y, alias):
        return (
            o.where(F.year("o_orderdate") == y)
            .groupBy("o_custkey")
            .agg(
                F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 6)
                .cast("double")
                .alias(alias)
            )
        )

    a = year_spend(1996, "spend_1996")
    b = year_spend(1997, "spend_1997")
    return (
        a.join(b, "o_custkey")
        .where(F.col("spend_1996") > 0)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "spend_1996",
            "spend_1997",
            F.round(
                (F.col("spend_1997") - F.col("spend_1996"))
                / F.col("spend_1996")
                * 100,
                6,
            ).alias("growth_pct"),
        )
        .orderBy(F.desc("growth_pct"), F.asc("c_custkey"))
        .limit(15)
    )


def q_order_size_correlation(spark, sf_dir):
    """Does basket size predict order value? Pearson correlation of
    lineitem count vs o_totalprice across orders — one
    sufficient-statistics aggregate, no per-pair work."""
    per_order = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
    )
    j = per_order.join(
        load_table(spark, sf_dir, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.agg(
        F.count("*").alias("n_orders"),
        F.round(F.corr(F.col("n_lines").cast("double"), "o_totalprice"), 6).alias(
            "pearson_r"
        ),
    )


def q_prefix_jaccard(spark, sf_dir):
    """PPJoin-style prefix-filtered exact Jaccard pairs at the same
    threshold as ngram_jaccard — lossless candidate pruning, so the
    oracle is ngram_jaccard's verbatim."""
    out = dedup.prefix_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.1)
    return out.select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_region_nation_share(spark, sf_dir):
    """Hierarchical percent-of-parent report: nation revenue, its
    share within the region, and the region's share of the world —
    two window-over-aggregate levels on a dimension-sized frame."""
    rev = relational.revenue_by_nation(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )
    wr = Window.partitionBy("r_name")
    wg = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        "revenue",
        F.round(F.col("revenue") / F.sum("revenue").over(wr), 6).alias(
            "share_of_region"
        ),
        F.round(
            F.sum("revenue").over(wr) / F.sum("revenue").over(wg), 6
        ).alias("region_share_of_world"),
    )


def q_nn_similarity_histogram(spark, sf_dir):
    """Distribution of nearest-neighbor cosines for the 50-probe eval
    set, bucketed at 0.05 — the embedding-collapse early-warning
    (a mass spike near 1.0 means near-duplicate embeddings)."""
    emb = _emb(spark, sf_dir)
    probes = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    top1 = similarity.brute_force_topk(emb, probes, k=1)
    return (
        top1.select(F.floor(F.col("sim") / 0.05).cast("int").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .select(
            F.round(F.col("bin") * 0.05, 2).alias("sim_bin_lo"),
            "n",
        )
    )


_STAGED_COMPACT: dict = {}


def q_compact_small_files(spark, sf_dir):
    """Small-files compaction maintenance: a deliberately fragmented
    events copy (16 part files) rewritten into 2 — the object-store
    hygiene job every table needs. Reports file counts (asserted by
    listing, constants by construction) and row count; the oracle
    pins ROW PARITY against the canonical table plus the staged
    before/after file counts — compaction must never lose or invent
    rows."""
    if sf_dir not in _STAGED_COMPACT:
        import atexit
        import os
        import shutil
        import tempfile

        root = tempfile.mkdtemp(prefix="mras-compact-")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        frag, tight = f"{root}/frag", f"{root}/tight"
        ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
        ev.repartition(16).write.mode("overwrite").parquet(frag)
        spark.read.parquet(frag).coalesce(2).write.mode("overwrite").parquet(tight)

        def n_parts(d):
            return len([f for f in os.listdir(d) if f.endswith(".parquet")])

        _STAGED_COMPACT[sf_dir] = (tight, n_parts(frag), n_parts(tight))
    tight, before, after = _STAGED_COMPACT[sf_dir]
    return (
        spark.read.parquet(tight)
        .agg(F.count("*").alias("n_rows"))
        .select(
            F.lit(before).cast("int").alias("files_before"),
            F.lit(after).cast("int").alias("files_after"),
            "n_rows",
        )
    )


def q_winsorize_values(spark, sf_dir):
    """Winsorization report at p05/p95 of event values: clip counts
    and the mean before vs after — the outlier-taming preprocessing
    step, with one exact-percentile aggregate broadcast back."""
    ev = _events(spark, sf_dir).select(F.col("value").cast("double").alias("v"))
    bounds = ev.agg(
        F.round(F.expr("percentile(v, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(v, 0.95)"), 6).alias("hi"),
    )
    j = ev.crossJoin(F.broadcast(bounds))
    wv = F.when(F.col("v") < F.col("lo"), F.col("lo")).when(
        F.col("v") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("v"))
    return j.agg(
        F.count("*").alias("n"),
        F.sum((F.col("v") < F.col("lo")).cast("int")).cast("long").alias("n_clipped_lo"),
        F.sum((F.col("v") > F.col("hi")).cast("int")).cast("long").alias("n_clipped_hi"),
        F.round(F.avg("v"), 6).alias("mean_raw"),
        F.round(F.avg(wv), 6).alias("mean_winsorized"),
    )


def q_point_in_time_state(spark, sf_dir):
    """Feature-store point-in-time join: every purchase enriched with
    the browsing-state version (SCD2 over NON-purchase events) valid
    AT the purchase timestamp — per state: purchase count and average
    state staleness. A latest-value join would leak the future;
    this one cannot."""
    ev = _events(spark, sf_dir)
    hist = temporal.scd2_history(
        ev.where(F.col("event_type") != "purchase").select(
            "user_id", "event_type", "ts", "event_id"
        ),
        keys=("user_id",),
        attrs=("event_type",),
        ts_col="ts",
        tiebreak="event_id",
    ).select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    j = temporal.point_in_time_join(
        purchases.withColumnRenamed("user_id", "k_user"),
        hist.withColumnRenamed("h_user", "k_user"),
        keys=("k_user",),
        ts_col="ts",
    )
    staleness = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.col("valid_from"))
    ) / 1_000_000.0
    return j.groupBy(
        F.coalesce(F.col("state"), F.lit("(none)")).alias("state")
    ).agg(
        F.count("*").alias("n_purchases"),
        F.round(F.avg(staleness), 6).alias("avg_staleness_s"),
    )


def q_hash_collision_report(spark, sf_dir):
    """Hashing-trick collision diagnostics at n_features=1024: how
    many buckets hold exactly k distinct vocabulary terms —
    (n_terms_in_bucket, n_buckets). The dimensioning readout for
    hashing_tf's feature-width trade."""
    vocab = (
        _docs(spark, sf_dir)
        .select(F.explode(text.tokens_array("text")).alias("term"))
        .distinct()
    )
    per_bucket = vocab.groupBy(
        F.pmod(h60("term"), F.lit(1024)).cast("int").alias("bucket")
    ).agg(F.count("*").alias("n_terms_in_bucket"))
    return per_bucket.groupBy("n_terms_in_bucket").agg(
        F.count("*").alias("n_buckets")
    )


def q_numeric_percentiles_profile(spark, sf_dir):
    """Exact percentile profile of the lineitem measures in long form
    — (column, p, value): the quartile sheet data contracts pin."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = [0.25, 0.5, 0.75, 0.95]
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    arr = ", ".join(str(p) for p in ps)
    one = li.agg(
        *[
            F.expr(f"percentile({c}, array({arr}))").alias(f"__{c}")
            for c in cols
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(p).alias("p"),
                F.round(F.col(f"__{c}")[i], 6).alias("value"),
            )
            for c in cols
            for i, p in enumerate(ps)
        ]
    )
    return one.select(F.inline(rows))


def q_slo_burn_rate(spark, sf_dir):
    """SRE burn-rate readout: hourly error rate vs its trailing-6h
    rate, and their ratio (the fast/slow burn alert pair) — lag
    windows over the hour-cardinality rollup only."""
    hourly = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == "error").cast("int")).alias("err"),
        )
    )
    w6 = Window.orderBy("h").rowsBetween(-5, 0)
    rate1 = F.round(F.col("err") / F.col("n"), 6)
    rate6 = F.round(F.sum("err").over(w6) / F.sum("n").over(w6), 6)
    return hourly.select(
        F.date_format("h", "yyyy-MM-dd HH:00:00").alias("hour_ts"),
        rate1.alias("err_rate_1h"),
        rate6.alias("err_rate_6h"),
        F.when(rate6 > 0, F.round(rate1 / rate6, 6)).alias("burn_rate"),
    )


def q_prospective_customers(spark, sf_dir):
    """TPC-H Q22 shape: per nation, customers with ABOVE-AVERAGE
    positive account balance and NO ORDER SINCE 2000 (lapsed
    prospects) — the global-average scalar subquery (one-row
    broadcast) feeding an anti-join against the date-pruned orders
    side, grouped at nation cardinality."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("ab")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("ab")
    )
    no_orders = rich.join(
        orders.select(F.col("o_custkey").alias("c_custkey")),
        "c_custkey",
        "left_anti",
    )
    return no_orders.groupBy("c_nationkey").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("total_acctbal"),
    )


def q_vocab_overlap_matrix(spark, sf_dir):
    """Vocabulary Jaccard between every source pair — how lexically
    distinct the corpus components are (the mix-design readout the
    doc-level overlap matrix can't give): (source_a, source_b,
    vocab_a, vocab_b, shared, jaccard), a < b. Distinct (source,
    term) collapses BEFORE the term self-join."""
    v = (
        _docs(spark, sf_dir)
        .select("source", F.explode(text.tokens_array("text")).alias("term"))
        .distinct()
    )
    sizes = v.groupBy("source").agg(F.count("*").alias("vocab"))
    shared = (
        v.alias("a")
        .join(v.alias("b"), "term")
        .where(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"), F.col("vocab").alias("vocab_a")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"), F.col("vocab").alias("vocab_b")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "vocab_a",
            "vocab_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )


def q_conversion_by_activity(spark, sf_dir):
    """Does activity predict conversion? Users bucketed into exact
    activity terciles (one percentile broadcast — the quantile_buckets
    convention), conversion rate per bucket: (bucket, n_users,
    n_converted, conv_rate)."""
    per_user = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
        )
    )
    bounds = per_user.agg(
        F.expr("percentile(n_events, array(0.3333333333333333, 0.6666666666666666))").alias("_b")
    )
    return (
        per_user.crossJoin(F.broadcast(bounds))
        .select(
            (
                F.size(F.filter(F.col("_b"), lambda s: F.col("n_events") > s)) + 1
            ).alias("bucket"),
            "conv",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("conv").cast("long").alias("n_converted"),
            F.round(F.sum("conv") / F.count("*"), 6).alias("conv_rate"),
        )
    )


def q_dedup_savings(spark, sf_dir):
    """The dedup budget headline: whitespace-token volume of the raw
    corpus vs the near-dup-deduplicated corpus (dedup_apply's keeper
    set) and the savings percentage — one row (raw_tokens,
    dedup_tokens, savings_pct). Composes the clustering pipeline the
    same way its oracle composes the clustering SQL."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1)
    clusters = dedup.dedup_clusters(pairs)
    # r15: ONE tokenize pass — a left-join drop marker turns the old
    # raw-agg + anti-join-agg + crossJoin (two corpus tokenizations)
    # into two conditional LONG sums over one scan; integer sums are
    # order-independent, so both totals are bit-identical to the
    # two-pass shape.
    # .distinct() guards the join against duplicate doc_id rows ever
    # appearing in the drop set (r15 ADVICE: the left-join marker
    # would silently inflate BOTH token sums, where the old left_anti
    # was duplicate-safe). Today dedup_clusters groups by id so this
    # dedups nothing — one cheap exchange over the small drop set buys
    # independence from that upstream invariant.
    drops = (
        clusters.where(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id")
        .distinct()
        .select("doc_id", F.lit(1).alias("_drop"))
    )
    t = F.size(text.tokens_array("text")).cast("long")
    return (
        docs.join(drops, "doc_id", "left")
        .agg(
            F.sum(t).alias("raw_tokens"),
            F.sum(F.when(F.col("_drop").isNull(), t).otherwise(F.lit(0))).alias(
                "dedup_tokens"
            ),
        )
        .select(
            "raw_tokens",
            "dedup_tokens",
            F.round(
                (F.col("raw_tokens") - F.col("dedup_tokens"))
                / F.col("raw_tokens")
                * 100,
                6,
            ).alias("savings_pct"),
        )
    )


def q_pareto_report(spark, sf_dir):
    """The 80/20 readout: what share of total revenue comes from the
    top quintile of customers by spend — (n_customers,
    top_quintile_share). One exact p80 broadcast splits the
    per-customer rollup; both sums come from one conditional pass."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("spend")
        )
    )
    p80 = per_cust.agg(
        F.round(F.expr("percentile(spend, 0.8)"), 6).alias("p80")
    )
    j = per_cust.crossJoin(F.broadcast(p80))
    return j.agg(
        F.count("*").alias("n_customers"),
        F.round(
            F.sum(F.when(F.col("spend") > F.col("p80"), F.col("spend")).otherwise(0.0))
            / F.sum("spend"),
            6,
        ).alias("top_quintile_share"),
    )


def q_quality_length_correlation(spark, sf_dir):
    """Does length predict quality? Pearson r between n_chars and the
    composite quality score — one sufficient-statistics aggregate."""
    docs = _docs(spark, sf_dir)
    scored = docs.select(
        F.col("n_chars").cast("double").alias("len"),
        F.round(text_quality.quality_expr("text"), 6).alias("q"),
    )
    return scored.agg(
        F.count("*").alias("n_docs"),
        F.round(F.corr("len", "q"), 6).alias("pearson_r"),
    )


def q_harmonic_centrality(spark, sf_dir):
    """Probe-based harmonic centrality top-25 from the 2 lowest
    custkeys — one BFS per probe, unreached pairs contribute 0."""
    g = _customer_graph(spark, sf_dir)
    sources = [r["id"] for r in g.select("id").orderBy("id").limit(2).collect()]
    return graph.harmonic_centrality(g, sources=sources, max_hops=6, k=25)


def q_embedding_covariance(spark, sf_dir):
    """Full 64×64 covariance matrix of the embedding distribution —
    one partial-aggregated exchange on the flattened outer product."""
    return similarity.embedding_covariance(_emb(spark, sf_dir))


def q_ab_test_zscore(spark, sf_dir):
    """Two-proportion z-test between user_id-parity A/B variants on
    purchase conversion — the experiment significance readout."""
    return funnel.ab_test_zscore(_events(spark, sf_dir))


def q_order_gap_stats(spark, sf_dir):
    """Inter-purchase day-gap distribution per market segment — the
    repeat-purchase-cadence retention metric."""
    return relational.order_gap_stats(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
    )


def q_revenue_rollup(spark, sf_dir):
    """ROLLUP revenue report: (nation, order-year) leaves plus nation
    subtotals and a grand total from ONE Expand-based aggregation."""
    return relational.revenue_rollup(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


def q_last_touch_attribution(spark, sf_dir):
    """Last-touch attribution of purchases to the user's most recent
    preceding click/view — one streaming window pass, no range join."""
    return relational.last_touch_attribution(_events(spark, sf_dir))


def q_cluster_canonical(spark, sf_dir):
    """Quality-aware canonical per near-dup cluster: the highest
    quality_score member wins (ties to lowest doc_id) — the curation
    refinement of dedup_clusters' keep-lowest-id rule."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.1)
    return dedup.cluster_canonical(
        dedup.dedup_clusters(pairs), text_quality.quality_score(docs)
    )


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-fit dashboard: per source, BPE tokens per whitespace
    token under the corpus's own learned 5-merge table — fertility is
    the standard tokenizer-evaluation metric (high fertility on a
    source means the tokenizer fragments it into many subwords)."""
    docs = _docs(spark, sf_dir)
    learned = [
        (r["lhs"], r["rhs"])
        # r15: single-job trainer, identical merge table (see q_bpe_vocab)
        for r in features.bpe_merges_local(docs, n_merges=5).orderBy("rank").collect()
    ]
    bpe = features.bpe_token_counts(docs, learned)
    ws = docs.select(
        "doc_id", "source", F.size(text.tokens_array("text")).alias("ws")
    )
    j = ws.join(bpe, "doc_id")
    return j.groupBy("source").agg(
        F.sum("ws").alias("ws_tokens"),
        F.sum("bpe_tokens").alias("bpe_tokens"),
        F.when(
            F.sum("ws") > 0,
            F.round(F.sum("bpe_tokens") / F.sum("ws"), 6),
        ).alias("fertility"),
    )


def q_bpe_merges_local(spark, sf_dir):
    """The single-job in-partition BPE trainer; checked against the
    SAME unrolled oracle as the iterative bpe_merges — the two paths
    must agree merge-for-merge."""
    return features.bpe_merges_local(_docs(spark, sf_dir), n_merges=5)


def q_split_leakage(spark, sf_dir):
    """Train/test leakage report: LSH near-dup pairs that straddle the
    hash_split train/val/test assignment, counted per split pair."""
    docs = _docs(spark, sf_dir)
    splits = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")
    cands = dedup.minhash_lsh_candidates(docs, n=3, bands=8)
    return dedup.split_leakage(cands, splits)


def q_dp_event_counts(spark, sf_dir):
    """Epsilon-DP (eps=1) release of per-event-type counts via the
    Laplace mechanism with deterministic seeded noise — the privacy
    gate a usage-telemetry release runs; k_anonymity's complement for
    aggregate (not row-level) releases."""
    return profiling.dp_noisy_counts(
        _events(spark, sf_dir), "event_type", epsilon=1.0
    )


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled (T=2) source sampling weights over the
    documents corpus — the exponential-smoothing weight DERIVATION
    step (mBERT/XLM-R recipe) whose output corpus_mix applies."""
    return sampling.temperature_weights(
        _docs(spark, sf_dir), group_col="source",
        size_col="n_chars", temperature=2.0,
    )


def q_semantic_decontamination(spark, sf_dir):
    """Embedding-level eval decontamination: every train vector whose
    cosine against the held-out eval slice (vec_id % 10 == 3, capped
    at vec_id < 2000 — benchmarks are FIXED-size; an eval set that
    grew with the corpus would make the scan corpus x eval quadratic
    in SF, and no real eval suite does that) reaches 0.35, with its
    best-matching eval item — the semantic complement of the lexical
    n-gram/Bloom/substring passes."""
    emb = _emb(spark, sf_dir)
    ev = emb.where(
        (F.col("vec_id") % 10 == 3) & (F.col("vec_id") < 2000)
    ).select(F.col("vec_id").alias("eval_id"), F.col("embedding").alias("c"))
    train = emb.where((F.col("vec_id") % 10 != 3) | (F.col("vec_id") >= 2000))
    return dedup.semantic_decontamination(train, ev, threshold=0.35)


def q_margin_bitext(spark, sf_dir):
    """Margin-based parallel-pair mining between the label-0 and
    label-1 embedding populations (Artetxe & Schwenk ratio margin over
    the exact top-4 candidates, threshold 1.2) — the bitext-mining
    shape used to build translation training corpora."""
    emb = _emb(spark, sf_dir)
    src = emb.where(F.col("label") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    tgt = emb.where(F.col("label") == 1)
    topk = similarity.brute_force_topk(tgt, src, k=4)
    return similarity.margin_mined_pairs(topk, margin_threshold=1.2)


def q_ivf_recall_report(spark, sf_dir):
    """Recall@10 of the trained-IVF search (nprobe=2) against the
    brute-force ground truth, per query — the ANN evaluation
    harness."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id")
    )
    qv = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    centroids = similarity.ivf_train(emb, k=8, n_iter=2)
    approx = similarity.ivf_topk(emb, centroids, queries, k=10, nprobe=2)
    exact = similarity.brute_force_topk(emb, qv, k=10)
    return similarity.ann_recall(exact, approx)


def q_pq_recall_report(spark, sf_dir):
    """Recall@10 of PQ asymmetric-distance search against the EXACT
    squared-L2 top-10 (ADC is an L2 method — a cosine ground truth
    would grade it on the wrong metric), per query: the compression-
    loss evaluation every PQ deployment runs before trading floats
    for codes. The exact side is a 5-row broadcast against the
    corpus; the ADC side reads codes only."""
    from .operators.similarity import _dot

    emb = _emb(spark, sf_dir)
    cb = similarity.pq_train(emb, m=8, k=8, n_iter=2)
    approx = similarity.pq_adc_topk(emb, cb, n_queries=5, topk=10)
    # r16: hoist the self-norms out of the per-pair scoring — ||v||²
    # once per corpus ROW and ||qv||² once per QUERY instead of three
    # folds per (corpus × queries) pair (guide §2.3 / the
    # brute_force_topk discipline). Same fold producing the same
    # double, combined in the same vv − 2·dot + qq order →
    # bit-identical d2.
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("vv", _dot(F.col("v"), F.col("v")))
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("vv").alias("qq"),
    )
    d2 = F.round(
        F.col("vv") - 2 * _dot(F.col("v"), F.col("qv")) + F.col("qq"),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(d2.asc(), F.col("vec_id").asc())
    exact = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return similarity.ann_recall(exact, approx)


def q_scd2_history(spark, sf_dir):
    """Type-2 dimension build over the events log: per user, the
    versioned history of event_type transitions with validity
    intervals (consecutive same-type events collapse)."""
    hist = temporal.scd2_history(
        _events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id"),
        keys=("user_id",),
        attrs=("event_type",),
        ts_col="ts",
        tiebreak="event_id",
    )
    return hist.select(
        "user_id",
        "version",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


@_stream_tuned
def q_streaming_interval_join(spark, sf_dir):
    """Stream-STREAM interval join (click → purchase attribution
    within 1 hour, per user), both sides replayed through the file
    source. Oracle = the identical batch interval join."""
    from .streaming import (
        read_events_stream,
        run_to_memory,
        streaming_interval_join,
    )

    src = _staged_events_dir(spark, sf_dir)
    clicks = read_events_stream(spark, src).where(F.col("event_type") == "click")
    purchases = read_events_stream(spark, src).where(
        F.col("event_type") == "purchase"
    )
    joined = streaming_interval_join(clicks, purchases, within="1 hour")
    out = joined.select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
    )
    run_to_memory(out, "q_stream_ij_mem", "append")
    return spark.table("q_stream_ij_mem")


def q_minhash_calibration(spark, sf_dir):
    """Sketch-quality evaluation: for every LSH candidate pair, the
    MinHash similarity ESTIMATE next to the TRUE n-gram Jaccard and
    the absolute error — the calibration report that justifies (or
    indicts) a banding configuration before running it at 100 TB."""
    docs = _docs(spark, sf_dir)
    # candidate set feeds BOTH the rejoin and the final join — one
    # materialization (lazy: plan-only consumers stay job-free)
    cands = dedup.minhash_lsh_candidates(docs, threshold=0.3).localCheckpoint(
        eager=False
    )
    # r15 (round-14 VERDICT item 3): TRUE Jaccard via the
    # candidate-bounded rejoin instead of ngram_jaccard_pairs
    # (threshold=0.0) — the uncapped threshold-0 inverted join
    # materialized the whole shingle-sharing pair universe before the
    # join below bounded the OUTPUT; compute is now bounded by the
    # LSH candidate set itself (same rows, bit-identical jaccard —
    # see exact_jaccard_for_pairs).
    exact = dedup.exact_jaccard_for_pairs(docs, cands)
    return cands.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_sim",
        F.round("jaccard", 6).alias("true_jaccard"),
        F.round(F.abs(F.col("est_sim") - F.col("jaccard")), 6).alias("abs_err"),
    )


def q_containment_pairs(spark, sf_dir):
    """Asymmetric shingle-containment near-dups (|A∩B| / |A| ≥ 0.8) —
    the quote-expansion catcher symmetric Jaccard misses."""
    return dedup.containment_pairs(_docs(spark, sf_dir), threshold=0.8)


def q_source_overlap(spark, sf_dir):
    """Exact shingle-set Jaccard between every pair of the corpus's 20
    sources — the cross-feed overlap dashboard."""
    return dedup.source_overlap(_docs(spark, sf_dir))


def q_verified_near_dupes(spark, sf_dir):
    """LSH-candidate near-dups verified by exact normalized edit
    distance (the sketch-prune → exact-measure two-stage)."""
    return dedup.verified_near_dupes(
        _docs(spark, sf_dir), est_threshold=0.5, max_dist_ratio=0.3
    )


def q_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM scoring (λ=0.75 Jelinek–Mercer): the
    transition-aware perplexity proxy."""
    return text_quality.bigram_logprob(_docs(spark, sf_dir))


def q_top_keywords(spark, sf_dir):
    """Keyword extraction: top-3 tf-idf terms per document with a
    deterministic (rounded-score, term) tie-break."""
    return index.top_keywords(_docs(spark, sf_dir), k=3)


def q_profile_events(spark, sf_dir):
    """Deequ-style one-pass data-quality profile of the events table:
    completeness, exact cardinality, and min/max per column. Engine-
    specific string renderings (timestamp, double) are canonicalized
    BEFORE profiling — ts to 'yyyy-MM-dd HH:mm:ss', value to
    DECIMAL(18,6) — so the profile itself is type-agnostic."""
    ev = _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 6).cast("decimal(18,6)").alias("value_d"),
    )
    return profiling.profile_columns(
        ev, ["event_id", "user_id", "event_type", "ts_s", "value_d"]
    )


def q_per_key_sample(spark, sf_dir):
    """Deterministic 3-document inspection sample per source: rows
    ranked by content hash of doc_id within each source group."""
    return sampling.per_key_sample(
        _docs(spark, sf_dir), group_col="source", key="doc_id", k=3
    )


def q_latest_events(spark, sf_dir):
    """CDC/upsert compaction: the most recent event per
    (user_id, event_type), event_id as the deterministic tie-break —
    a partial-aggregating max_by, not a window sort."""
    ev = _events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )
    snap = temporal.latest_snapshot(
        ev, keys=("user_id", "event_type"), ts_col="ts", tiebreak="event_id"
    )
    return snap.select(
        "user_id",
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 6).alias("value"),
    )


# ----------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; tables pre-registered as views)

_REVENUE_BY_NATION_SQL = """
SELECT n_name, r_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""

ORACLE: dict[str, str] = {}

ORACLE["word_count"] = f"""
SELECT t AS word, count(*) AS cnt
FROM (SELECT unnest({_TOK}) AS t FROM documents)
GROUP BY t
"""

ORACLE["bigram_count"] = f"""
SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cnt
FROM (
  SELECT unnest(list_transform(range(1, len(ts)),
                i -> {{'w1': ts[i], 'w2': ts[i + 1]}})) AS p
  FROM (SELECT {_TOK} AS ts FROM documents))
GROUP BY p.w1, p.w2
"""

ORACLE["cooccurrence"] = f"""
SELECT p.a AS a, p.b AS b, count(*) AS cnt
FROM (
  SELECT unnest(flatten(list_transform(range(1, len(ts) + 1), i ->
           list_transform(
             list_filter(range(greatest(1, i - 2), least(len(ts), i + 2) + 1),
                         j -> j != i),
             j -> {{'a': ts[i], 'b': ts[j]}})))) AS p
  FROM (SELECT {_TOK} AS ts FROM documents)
  WHERE len(ts) > 0)
GROUP BY p.a, p.b
"""

ORACLE["cooccurrence_stripes"] = f"""
WITH pairs AS (
  SELECT p.a AS a, p.b AS b, count(*) AS cnt
  FROM (
    SELECT unnest(flatten(list_transform(range(1, len(ts) + 1), i ->
             list_transform(
               list_filter(range(greatest(1, i - 2), least(len(ts), i + 2) + 1),
                           j -> j != i),
               j -> {{'a': ts[i], 'b': ts[j]}})))) AS p
    FROM (SELECT {_TOK} AS ts FROM documents)
    WHERE len(ts) > 0)
  GROUP BY p.a, p.b
)
SELECT a, string_agg(b || ':' || CAST(cnt AS VARCHAR), ',' ORDER BY b) AS stripe_str
FROM pairs GROUP BY a
"""

ORACLE["value_percentiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.95), 6) AS p95,
       round(min(value), 6) AS vmin,
       round(max(value), 6) AS vmax
FROM events GROUP BY event_type
"""

ORACLE["pmi"] = f"""
WITH ws AS (
  SELECT list_sort(list_distinct({_TOK})) AS ws FROM documents
), pairs AS (
  SELECT p.x AS x, p.y AS y, count(*) AS cnt
  FROM (
    SELECT unnest(flatten(list_transform(range(1, len(ws) + 1), i ->
             list_transform(range(i + 1, len(ws) + 1),
                            j -> {{'x': ws[i], 'y': ws[j]}})))) AS p
    FROM ws)
  GROUP BY p.x, p.y
  HAVING count(*) >= 10
), wc AS (
  SELECT w, count(*) AS wc FROM (SELECT unnest(ws) AS w FROM ws) GROUP BY w
), n AS (SELECT count(*) AS n FROM documents)
SELECT x, y, cnt, round(ln(cnt * n.n / (cx.wc * cy.wc)), 6) AS pmi
FROM pairs, n
JOIN wc cx ON cx.w = pairs.x
JOIN wc cy ON cy.w = pairs.y
"""

# Dunning LLR over the same pair/marginal CTEs as pmi; xlx(c) = c*ln(c)
# with the 0*ln(0)=0 convention — all inputs are integer counts, so
# the fixed expression tree matches Spark's doubles exactly at 6 dp.
def _xlx_sql(c: str) -> str:
    return f"CASE WHEN ({c}) > 0 THEN ({c}) * ln(CAST(({c}) AS DOUBLE)) ELSE 0.0 END"


ORACLE["llr"] = f"""
WITH ws AS (
  SELECT list_sort(list_distinct({_TOK})) AS ws FROM documents
), pairs AS (
  SELECT p.x AS x, p.y AS y, count(*) AS cnt
  FROM (
    SELECT unnest(flatten(list_transform(range(1, len(ws) + 1), i ->
             list_transform(range(i + 1, len(ws) + 1),
                            j -> {{'x': ws[i], 'y': ws[j]}})))) AS p
    FROM ws)
  GROUP BY p.x, p.y
  HAVING count(*) >= 10
), wc AS (
  SELECT w, count(*) AS wc FROM (SELECT unnest(ws) AS w FROM ws) GROUP BY w
), n AS (SELECT count(*) AS n FROM documents),
k AS (
  SELECT x, y, cnt,
         cnt AS k11, cx.wc - cnt AS k12, cy.wc - cnt AS k21,
         n.n - cx.wc - cy.wc + cnt AS k22, n.n AS nn
  FROM pairs, n
  JOIN wc cx ON cx.w = pairs.x
  JOIN wc cy ON cy.w = pairs.y
)
SELECT x, y, cnt,
       round(2.0 * ({_xlx_sql("k11")} + {_xlx_sql("k12")}
                    + {_xlx_sql("k21")} + {_xlx_sql("k22")}
                    - {_xlx_sql("k11 + k12")} - {_xlx_sql("k21 + k22")}
                    - {_xlx_sql("k11 + k21")} - {_xlx_sql("k12 + k22")}
                    + {_xlx_sql("nn")}), 6) AS llr
FROM k
"""

ORACLE["term_frequencies"] = f"""
SELECT t AS term, doc_id AS docid, count(*) AS tf
FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
GROUP BY t, doc_id
"""

ORACLE["inverted_index_stats"] = f"""
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
FROM (
  SELECT t AS term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY t, doc_id)
GROUP BY term
"""

ORACLE["tf_histogram"] = f"""
SELECT tf, count(*) AS n_docs
FROM (
  SELECT doc_id, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  WHERE t = 'join'
  GROUP BY doc_id)
GROUP BY tf
"""

ORACLE["tf_idf"] = f"""
WITH tfs AS (
  SELECT t AS term, doc_id AS docid, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY t, doc_id
), dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT tfs.term, docid, tf,
       round(tf * ln(CAST(n.n AS DOUBLE) / dfs.df), 6) AS tfidf
FROM tfs JOIN dfs ON tfs.term = dfs.term, n
"""

ORACLE["boolean_retrieval"] = f"""
WITH postings AS (
  SELECT t AS term, doc_id AS docid
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents))
SELECT docid FROM {rpn_to_sql(_BOOLEAN_QUERY)} q
"""

ORACLE["hourly_counts"] = """
SELECT CAST(month(ts) AS VARCHAR) || '/' || CAST(day(ts) AS VARCHAR) AS date,
       CAST(hour(ts) AS INTEGER) AS hour, count(*) AS cnt
FROM events GROUP BY 1, 2
"""

ORACLE["streaming_hourly_counts"] = ORACLE["hourly_counts"]

ORACLE["hourly_counts_errors"] = """
SELECT CAST(month(ts) AS VARCHAR) || '/' || CAST(day(ts) AS VARCHAR) AS date,
       CAST(hour(ts) AS INTEGER) AS hour, count(*) AS cnt
FROM events
WHERE regexp_matches(event_type, 'error')
GROUP BY 1, 2
"""

# tweets oracles recompute the wall-clock fields straight from ts
# (the staged TSV's rendered string is sliced positionally by the
# Spark side; month/day/hour of the render equal month/day/hour of the
# timestamp under the same UTC session zone). date is "M/dd" and hour
# "HH" — the tweet path keeps the reference's zero-padded text fields,
# unlike the events path's "M/d" + int hour.
ORACLE["hourly_counts_tweets"] = """
SELECT CAST(month(ts) AS VARCHAR) || '/' || strftime(ts, '%d') AS date,
       strftime(ts, '%H') AS hour, count(*) AS cnt
FROM events GROUP BY 1, 2
"""

ORACLE["hourly_counts_tweets_egypt"] = f"""
SELECT CAST(month(ts) AS VARCHAR) || '/' || strftime(ts, '%d') AS date,
       strftime(ts, '%H') AS hour, count(*) AS cnt
FROM events
WHERE regexp_matches({_TWEET_MESSAGE_SQL}, '(?i)(egypt|cairo)')
GROUP BY 1, 2
"""

ORACLE["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
       AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * ((CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                    * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6))))), 6)
       AS DOUBLE) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""

ORACLE["top_revenue_orders"] = """
SELECT o_orderkey, c_mktsegment, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderkey, c_mktsegment, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

ORACLE["revenue_by_nation"] = _REVENUE_BY_NATION_SQL
ORACLE["sql_revenue_by_nation"] = _REVENUE_BY_NATION_SQL

ORACLE["user_sessions"] = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM g GROUP BY user_id
"""

ORACLE["streaming_user_sessions"] = ORACLE["user_sessions"]

ORACLE["streaming_dedup"] = """
SELECT event_id, user_id, event_type FROM events
"""

ORACLE["salted_order_revenue"] = """
SELECT o_custkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
"""

ORACLE["bucketed_customer_orders"] = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE)
         AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""

ORACLE["exact_duplicates"] = """
SELECT min(doc_id) AS keeper, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""

ORACLE["shingles"] = _SHINGLES_3

ORACLE["minhash_signatures"] = _MINHASH_FLAT

ORACLE["minhash_lsh_candidates"] = f"""
WITH mh AS ({_MINHASH_FLAT}),
bands AS (
  SELECT doc_id, i // 4 AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bsig
  FROM mh GROUP BY doc_id, i // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
agree AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS ag
  FROM cand c
  JOIN mh x ON x.doc_id = c.doc_a
  JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, CAST(ag AS DOUBLE) / {NUM_MINHASHES} AS est_sim FROM agree
"""

ORACLE["ngram_jaccard"] = f"""
WITH sh AS ({_SHINGLES_3}),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.1
"""

# Connected components via a recursive label-closure CTE: `reach`
# enumerates, for every node, every label reachable over the
# undirected pair edges (UNION dedup terminates the recursion), and
# min() over that closure is exactly the component minimum the Spark
# min-label-propagation loop converges to.
# lossless prefix filtering must land exactly on the naive join
ORACLE["prefix_jaccard"] = ORACLE["ngram_jaccard"]

ORACLE["dedup_clusters"] = f"""
WITH RECURSIVE pairs AS (
{ORACLE["ngram_jaccard"]}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
lab AS (SELECT node AS doc_id, min(lab) AS canonical_id FROM reach GROUP BY node)
SELECT doc_id, canonical_id,
       count(*) OVER (PARTITION BY canonical_id) AS cluster_size
FROM lab
"""

# word 4-gram shingles (distinct per doc), mirroring dedup.shingles
# with n=4: range yields i = 1 .. len-3, the inclusive slice
# ts[i:i+3] is 4 tokens.
_SHINGLES_4 = f"""
  SELECT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, len(ts) - 2),
             i -> array_to_string(ts[i:i+3], ' ')))) AS shingle
    FROM (SELECT doc_id, {_TOK} AS ts FROM documents)
    WHERE len(ts) >= 4)
"""

ORACLE["contamination_flags"] = f"""
WITH sh AS ({_SHINGLES_4}),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
SELECT s.doc_id, count(*) AS n_hits
FROM sh s JOIN bench USING (shingle)
WHERE s.doc_id % 97 <> 0
GROUP BY s.doc_id
"""

# BM25: Lucene-variant idf, per-term contributions rounded BEFORE the
# per-doc sum (order-free summation), ranked on the rounded score with
# docid tiebreak. N = indexed docs (>= 1 token).
ORACLE["bm25_topk"] = f"""
WITH tfs AS (
  SELECT t AS term, doc_id AS docid, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY t, doc_id
),
dl AS (SELECT docid, CAST(sum(tf) AS BIGINT) AS dl FROM tfs GROUP BY docid),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
qt AS (SELECT * FROM tfs WHERE term IN ('spark', 'table', 'query')),
dfs AS (SELECT term, count(*) AS df FROM qt GROUP BY term),
c AS (
  SELECT qt.docid,
         round(ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * qt.tf * (1.2 + 1)
               / (qt.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6) AS c
  FROM qt JOIN dfs USING (term) JOIN dl USING (docid), stats
)
SELECT docid, round(sum(c), 6) AS score
FROM c GROUP BY docid
ORDER BY score DESC, docid ASC LIMIT 20
"""

_QL_CTES = f"""
tfs AS (
  SELECT t AS term, doc_id AS docid, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY t, doc_id
),
dl AS (SELECT docid, CAST(sum(tf) AS BIGINT) AS dl FROM tfs GROUP BY docid),
total AS (SELECT CAST(sum(dl) AS BIGINT) AS coll_total FROM dl),
qt AS (SELECT * FROM tfs WHERE term IN ('spark', 'table', 'query')),
cf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM qt GROUP BY term),
qlgrid AS (SELECT d.docid, d.dl, c.term, c.cf FROM dl d CROSS JOIN cf c),
qlc AS (
  SELECT g.docid,
         round(ln(0.7 * coalesce(qt.tf, 0) / g.dl
                  + (1 - 0.7) * g.cf / t.coll_total), 6) AS c
  FROM qlgrid g LEFT JOIN qt ON qt.docid = g.docid AND qt.term = g.term, total t
),
ql_scores AS (
  SELECT docid, round(sum(c), 6) AS score
  FROM qlc GROUP BY docid
)"""

ORACLE["query_likelihood"] = f"""
WITH {_QL_CTES}
SELECT docid, score FROM ql_scores
ORDER BY score DESC, docid ASC LIMIT 20
"""

ORACLE["rrf_fusion"] = f"""
WITH {_QL_CTES},
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*) AS df FROM qt GROUP BY term),
bmc AS (
  SELECT qt.docid,
         round(ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * qt.tf * (1.2 + 1)
               / (qt.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6) AS c
  FROM qt JOIN dfs USING (term) JOIN dl USING (docid), stats
),
bm_top AS (
  SELECT docid, round(sum(c), 6) AS score
  FROM bmc GROUP BY docid
  ORDER BY score DESC, docid ASC LIMIT 20
),
ql_top AS (
  SELECT docid, score FROM ql_scores ORDER BY score DESC, docid ASC LIMIT 20
),
bmr AS (
  SELECT docid, CAST(row_number() OVER (ORDER BY score DESC, docid ASC)
                     AS INTEGER) AS bm25_rank
  FROM bm_top
),
qlr AS (
  SELECT docid, CAST(row_number() OVER (ORDER BY score DESC, docid ASC)
                     AS INTEGER) AS ql_rank
  FROM ql_top
),
f AS (
  SELECT coalesce(b.docid, q.docid) AS docid,
         coalesce(b.bm25_rank, 0) AS bm25_rank,
         coalesce(q.ql_rank, 0) AS ql_rank
  FROM bmr b FULL OUTER JOIN qlr q ON q.docid = b.docid
)
SELECT docid, bm25_rank, ql_rank,
       round(CASE WHEN bm25_rank > 0 THEN 1.0 / (60 + bm25_rank) ELSE 0.0 END
             + CASE WHEN ql_rank > 0 THEN 1.0 / (60 + ql_rank) ELSE 0.0 END,
             6) AS rrf
FROM f
ORDER BY rrf DESC, docid ASC LIMIT 10
"""

# gap filling: the dense axis re-derives from generate_series over the
# same min/max hour bounds, LEFT JOIN coalesced to explicit zeros.
ORACLE["dense_hourly_counts"] = """
WITH h AS (SELECT date_trunc('hour', ts) AS h FROM events),
c AS (SELECT h, count(*) AS cnt FROM h GROUP BY h),
cal AS (
  SELECT unnest(generate_series((SELECT min(h) FROM h),
                                (SELECT max(h) FROM h),
                                INTERVAL 1 HOUR)) AS h
)
SELECT strftime(cal.h, '%Y-%m-%d %H:00:00') AS hour_ts,
       coalesce(c.cnt, 0) AS cnt
FROM cal LEFT JOIN c USING (h)
"""

ORACLE["top_terms_per_source"] = f"""
WITH tok AS (SELECT source, unnest({_TOK}) AS token FROM documents),
c AS (SELECT source, token, count(*) AS cnt FROM tok GROUP BY source, token),
r AS (
  SELECT source, token, cnt,
         CAST(row_number() OVER (PARTITION BY source
              ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank
  FROM c
)
SELECT source, token, cnt, rank FROM r WHERE rank <= 5
"""

# funnel: the oracle decides step completion by stepwise-min (earliest
# step-1 event, then earliest step-2 event strictly after it, ...) —
# a different algorithm than the operator's greedy array fold, but the
# same function (greedy earliest-first subsequence matching is exact),
# so this is a genuine cross-check, not a replay.
ORACLE["funnel_counts"] = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > t1.t GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > t2.t GROUP BY e.user_id
)
SELECT 1 AS step, 'view' AS event_type, (SELECT count(*) FROM t1) AS n_users
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM t2)
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM t3)
"""

ORACLE["cohort_retention"] = """
WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
a AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events
)
SELECT strftime(CAST(date_trunc('week', f.first_ts) AS DATE), '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', CAST(date_trunc('week', f.first_ts) AS DATE), a.wk) / 7
            AS INTEGER) AS week_offset,
       count(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
"""

# the deduplicated corpus: CTE-reuses the clustering oracle verbatim —
# the apply step is just an anti-join against its non-keeper set.
ORACLE["dedup_apply"] = f"""
WITH clusters AS (
{ORACLE["dedup_clusters"]}
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d
WHERE d.doc_id NOT IN
  (SELECT doc_id FROM clusters WHERE doc_id <> canonical_id)
"""


ORACLE["simhash"] = f"""
WITH tf AS (
  SELECT doc_id, t AS w, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY doc_id, t
), th AS (
  SELECT doc_id, tf, {_h60_sql('w')} AS h FROM tf
), c AS (
  SELECT doc_id, g.b AS b,
         CASE WHEN (h >> g.b) & 1 = 1 THEN tf ELSE -tf END AS v
  FROM th, generate_series(0, 31) g(b)
), s AS (
  SELECT doc_id, b, sum(v) AS s FROM c GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
         AS simhash
FROM s GROUP BY doc_id
"""

# pigeonhole bands: 32-bit sig, max_hamming=3 → 4 bands of 8 bits
_SIMHASH_CTE = f"""
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
           AS simhash
  FROM (
    SELECT doc_id, b, sum(v) AS s FROM (
      SELECT doc_id, g.b AS b,
             CASE WHEN (h >> g.b) & 1 = 1 THEN tf ELSE -tf END AS v
      FROM (
        SELECT doc_id, tf, {_h60_sql('w')} AS h FROM (
          SELECT doc_id, t AS w, count(*) AS tf
          FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
          GROUP BY doc_id, t)),
        generate_series(0, 31) g(b))
    GROUP BY doc_id, b)
  GROUP BY doc_id
"""
ORACLE["simhash_near_dupes"] = f"""
WITH s AS ({_SIMHASH_CTE}),
banded AS (
  SELECT doc_id, simhash, g.b AS band,
         (simhash >> (g.b * 8)) & 255 AS bval
  FROM s, generate_series(0, 3) g(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 3
"""

_DOC_BIN = (
    "CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 1000000"
)
ORACLE["deterministic_sample"] = f"""
SELECT doc_id FROM documents WHERE {_DOC_BIN} < 250000
"""

ORACLE["hash_split"] = f"""
SELECT doc_id,
       CASE WHEN {_DOC_BIN} < 800000 THEN 'train'
            WHEN {_DOC_BIN} < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

# the staging (Spark-side write + malformed plants) is invisible to
# the oracle by design: the reader's contract is that the roundtrip
# reproduces the source table exactly and drops the garbage.
ORACLE["csv_roundtrip"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""

ORACLE["orc_roundtrip"] = ORACLE["csv_roundtrip"]

ORACLE["incremental_rollup"] = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS d,
       CAST(hour(ts) AS INTEGER) AS hour,
       count(*) AS n
FROM events GROUP BY 1, 2
"""

ORACLE["ewma_hourly"] = """
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n
  FROM events GROUP BY 1
)
SELECT hour, n, round(lag(n, 0) OVER w * 0.3 + lag(n, 1) OVER w * 0.21 + lag(n, 2) OVER w * 0.14699999999999996 + lag(n, 3) OVER w * 0.10289999999999998 + lag(n, 4) OVER w * 0.07202999999999998 + lag(n, 5) OVER w * 0.05042099999999998 + lag(n, 6) OVER w * 0.035294699999999984 + lag(n, 7) OVER w * 0.02470628999999999 + lag(n, 8) OVER w * 0.01729440299999999 + lag(n, 9) OVER w * 0.012106082099999993 + lag(n, 10) OVER w * 0.008474257469999994 + lag(n, 11) OVER w * 0.005931980228999996 + lag(n, 12) OVER w * 0.0041523861602999965 + lag(n, 13) OVER w * 0.0029066703122099975 + lag(n, 14) OVER w * 0.002034669218546998 + lag(n, 15) OVER w * 0.0014242684529828986 + lag(n, 16) OVER w * 0.000996987917088029 + lag(n, 17) OVER w * 0.0006978915419616202 + lag(n, 18) OVER w * 0.0004885240793731341 + lag(n, 19) OVER w * 0.00034196685556119386 + lag(n, 20) OVER w * 0.00023937679889283567 + lag(n, 21) OVER w * 0.00016756375922498496 + lag(n, 22) OVER w * 0.00011729463145748948 + lag(n, 23) OVER w * 8.210624202024264e-05, 6) AS ewma
FROM hourly
WINDOW w AS (ORDER BY hour)
QUALIFY row_number() OVER w >= 24
"""

ORACLE["seasonal_anomalies"] = """
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         CAST(hour(ts) AS INTEGER) AS hod,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT hod, count(*) AS cnt,
         CAST(sum(n) AS BIGINT) AS s,
         CAST(sum(n * n) AS BIGINT) AS ss
  FROM hourly GROUP BY hod
),
j AS (
  SELECT h.hour, h.hod, h.n,
         (s.s - h.n) / (s.cnt - 1) AS mean,
         (s.ss - h.n * h.n) / (s.cnt - 1)
           - ((s.s - h.n) / (s.cnt - 1)) * ((s.s - h.n) / (s.cnt - 1)) AS var,
         s.cnt AS cnt
  FROM hourly h JOIN stats s USING (hod)
)
SELECT hour, hod, n, round(mean, 6) AS base_mean,
       round((n - mean) / sqrt(var), 6) AS zscore,
       abs((n - mean) / sqrt(var)) > 3.0 AS is_anomaly
FROM j
WHERE cnt >= 3 AND var > 0
"""

ORACLE["oov_rate"] = f"""
WITH split_docs AS (
  SELECT doc_id, text,
         CASE WHEN {_DOC_BIN} < 800000 THEN 'train'
              WHEN {_DOC_BIN} < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
toks AS (SELECT split, unnest({_TOK.replace("text", "text")}) AS tok FROM split_docs),
vocab AS (SELECT DISTINCT tok FROM toks WHERE split = 'train'),
other AS (SELECT * FROM toks WHERE split != 'train'),
totals AS (SELECT split, count(*) AS n_tokens FROM other GROUP BY split),
oov AS (
  SELECT split, count(*) AS n_oov FROM other
  WHERE tok NOT IN (SELECT tok FROM vocab) GROUP BY split
)
SELECT t.split, t.n_tokens, COALESCE(o.n_oov, 0) AS n_oov,
       round(COALESCE(o.n_oov, 0) / t.n_tokens, 6) AS oov_rate
FROM totals t LEFT JOIN oov o ON o.split = t.split
"""

ORACLE["schema_evolution"] = """
SELECT doc_id, text, lang,
       CASE WHEN doc_id % 2 = 1 THEN source END AS source,
       CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
FROM documents
"""

ORACLE["corpus_mix"] = f"""
WITH w AS (
  SELECT source, CAST(weight AS DOUBLE) AS weight
  FROM (VALUES ('src0', 0.4), ('src1', 0.3), ('src2', 0.2), ('src3', 0.1))
    AS t(source, weight)
),
d AS (
  SELECT doc_id, source, CAST(len({_TOK}) AS INTEGER) AS ntok,
         CAST(CONCAT('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 1000000 AS bin
  FROM documents
),
totals AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS total_tokens FROM d GROUP BY source),
j AS (
  SELECT d.*, w.weight, t.total_tokens,
         least(1.0, w.weight * 20000 / t.total_tokens) AS frac
  FROM d JOIN w USING (source) JOIN totals t USING (source)
)
SELECT source, weight, total_tokens,
       round(weight * 20000, 6) AS target_tokens,
       CAST(sum(CASE WHEN bin < frac * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
       CAST(sum(CASE WHEN bin < frac * 1000000 THEN ntok ELSE 0 END) AS BIGINT) AS kept_tokens
FROM j GROUP BY 1, 2, 3
"""

ORACLE["heldout_logprob"] = f"""
WITH split_docs AS (
  SELECT doc_id, text,
         CASE WHEN {_DOC_BIN} < 800000 THEN 'train'
              WHEN {_DOC_BIN} < 900000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
ttf AS (
  SELECT t AS term, count(*) AS cnt
  FROM (SELECT unnest({_TOK}) AS t FROM split_docs WHERE split = 'train')
  GROUP BY t
),
totals AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total, count(*) AS vocab FROM ttf),
tf AS (
  SELECT doc_id, split, t AS term, count(*) AS tf
  FROM (SELECT doc_id, split, unnest({_TOK}) AS t
        FROM split_docs WHERE split != 'train')
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT tf.doc_id, tf.split,
         round(sum(tf.tf * ln((COALESCE(ttf.cnt, 0) + 1.0)
                              / (t.n_total + t.vocab)))
               / sum(tf.tf), 6) AS avg_logprob
  FROM tf LEFT JOIN ttf ON ttf.term = tf.term, totals t
  GROUP BY 1, 2
)
SELECT split, count(*) AS n_docs,
       round(sum(avg_logprob) / count(*), 6) AS mean_logprob
FROM scored GROUP BY split
"""

ORACLE["packing_efficiency"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS ws_tokens,
         {_h60_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
b AS (SELECT *, CAST(h % 8 AS INTEGER) AS bucket FROM t),
c AS (
  SELECT doc_id, ws_tokens, bucket,
         CAST(sum(ws_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - ws_tokens AS start
  FROM b
)
SELECT bucket, count(*) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
       CAST((sum(ws_tokens) + 511) // 512 AS BIGINT) AS n_shards,
       round(CAST(sum(ws_tokens) AS BIGINT)
             / (((sum(ws_tokens) + 511) // 512) * 512), 6) AS utilization
FROM c GROUP BY bucket
"""

ORACLE["bloom_decontamination"] = f"""
WITH docs AS (SELECT doc_id, md5(text) AS digest FROM documents),
eval_docs AS (SELECT digest FROM docs ORDER BY doc_id LIMIT 20),
bits AS (
  SELECT DISTINCT t.d,
         (({_A_SQL}[t.d + 1]
           * CAST(CONCAT('0x', substring(md5(digest), 1, 7)) AS BIGINT)
           + {_B_SQL}[t.d + 1]) % 2147483647) % 1024 AS bit
  FROM eval_docs, range(0, 4) t(d)
),
probe AS (
  SELECT digest, t.d,
         (({_A_SQL}[t.d + 1]
           * CAST(CONCAT('0x', substring(md5(digest), 1, 7)) AS BIGINT)
           + {_B_SQL}[t.d + 1]) % 2147483647) % 1024 AS bit
  FROM (SELECT DISTINCT digest FROM docs), range(0, 4) t(d)
),
flagged AS (
  SELECT p.digest FROM probe p JOIN bits b ON b.d = p.d AND b.bit = p.bit
  GROUP BY p.digest HAVING count(*) = 4
),
members AS (SELECT DISTINCT digest FROM eval_docs)
SELECT
  CAST(sum(CASE WHEN f.digest IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
  CAST(sum(CASE WHEN f.digest IS NOT NULL AND m.digest IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS true_hits,
  CAST(sum(CASE WHEN f.digest IS NOT NULL AND m.digest IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
  CAST(sum(CASE WHEN m.digest IS NOT NULL AND f.digest IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives
FROM docs d
LEFT JOIN flagged f ON f.digest = d.digest
LEFT JOIN members m ON m.digest = d.digest
"""

ORACLE["revenue_lag_features"] = """
WITH daily AS (
  SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT day, revenue,
         lag(revenue, 1) OVER (ORDER BY day) AS lag1,
         lag(revenue, 7) OVER (ORDER BY day) AS lag7
  FROM daily
)
SELECT day, revenue, lag1, lag7,
       round((revenue - lag1) / lag1, 6) AS pct_change
FROM lagged WHERE lag7 IS NOT NULL
"""

ORACLE["eval_substring_hits"] = """
WITH snippets AS (
  SELECT doc_id AS eval_id, substring(text, 1, 40) AS snippet
  FROM documents ORDER BY doc_id LIMIT 5
),
hits AS (
  SELECT s.eval_id, count(*) AS n_hits
  FROM snippets s JOIN documents d ON position(s.snippet IN d.text) > 0
  GROUP BY s.eval_id
)
SELECT s.eval_id, s.snippet, COALESCE(h.n_hits, 0) AS n_hits
FROM snippets s LEFT JOIN hits h ON h.eval_id = s.eval_id
"""

ORACLE["balance_classes"] = """
WITH t AS (
  SELECT CAST(min(n) AS BIGINT) AS target FROM (
    SELECT label, count(*) AS n FROM embeddings GROUP BY label)
),
ranked AS (
  SELECT vec_id, label,
         row_number() OVER (
           PARTITION BY label
           ORDER BY CAST(CONCAT('0x', substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                         AS BIGINT) % 1000000,
                    vec_id) AS rn
  FROM embeddings
)
SELECT r.vec_id, r.label FROM ranked r, t WHERE r.rn <= t.target
"""

ORACLE["streaming_top_users"] = """
SELECT user_id, count(*) AS n_events FROM events
GROUP BY user_id ORDER BY n_events DESC, user_id ASC LIMIT 10
"""

ORACLE["sentence_stats"] = """
WITH segs AS (
  SELECT doc_id,
         list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                    s -> trim(s)),
                     s -> len(s) > 0) AS arr
  FROM documents
)
SELECT doc_id,
       CAST(len(arr) AS INTEGER) AS n_sentences,
       CAST(list_sum(list_transform(arr, s -> len(s))) AS INTEGER)
         AS total_sentence_chars,
       round(CAST(list_sum(list_transform(arr, s -> len(s))) AS BIGINT)
             / len(arr), 6) AS avg_sentence_chars,
       CAST(list_max(list_transform(arr, s -> len(s))) AS INTEGER)
         AS max_sentence_chars
FROM segs WHERE len(arr) > 0
"""

ORACLE["length_drift_psi"] = """
WITH b AS (
  SELECT CAST(CASE WHEN n_chars > 0 THEN length(bin(n_chars)) - 1
              ELSE -1 END AS INTEGER) AS bucket,
         CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_ref,
         CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_cur
  FROM documents WHERE source IN ('src0', 'src1')
  GROUP BY 1
),
t AS (SELECT CAST(sum(cnt_ref) AS BIGINT) AS ref_rows,
             CAST(sum(cnt_cur) AS BIGINT) AS cur_rows FROM b),
c AS (
  SELECT b.*, t.ref_rows, t.cur_rows,
         CASE WHEN b.cnt_ref > 0 AND b.cnt_cur > 0
              THEN round((b.cnt_ref / t.ref_rows - b.cnt_cur / t.cur_rows)
                         * ln((b.cnt_ref / t.ref_rows) / (b.cnt_cur / t.cur_rows)), 6)
         END AS contrib
  FROM b, t
)
SELECT max(ref_rows) AS ref_rows, max(cur_rows) AS cur_rows,
       count(*) AS n_buckets_union,
       count(contrib) AS n_buckets_common,
       round(COALESCE(sum(contrib), 0.0), 6) AS psi
FROM c
"""

ORACLE["conversion_lag"] = """
WITH clicks AS (
  SELECT event_id AS cid, user_id, ts AS cts FROM events
  WHERE event_type = 'click'
),
buys AS (SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
firsts AS (
  SELECT c.cid, c.cts, min(b.pts) AS first_pts
  FROM clicks c JOIN buys b ON b.user_id = c.user_id
  WHERE b.pts >= c.cts AND b.pts <= c.cts + INTERVAL 60 MINUTES
  GROUP BY 1, 2
),
lags AS (SELECT CAST(date_diff('second', cts, first_pts) AS BIGINT) AS lag_s FROM firsts)
SELECT count(*) AS n_conversions,
       round(CAST(sum(lag_s) AS BIGINT) / count(*), 6) AS mean_lag_s,
       round(quantile_cont(lag_s, 0.5), 6) AS p50_lag_s,
       max(lag_s) AS max_lag_s
FROM lags
"""

ORACLE["revenue_share"] = f"""
WITH rev AS ({_REVENUE_BY_NATION_SQL})
SELECT n_name, r_name, revenue,
       round(revenue / sum(revenue) OVER (), 6) AS share
FROM rev
"""

ORACLE["record_linkage"] = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       a.c_name AS name_a, b.c_name AS name_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS distance
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE abs(length(a.c_name) - length(b.c_name)) <= 2
  AND levenshtein(a.c_name, b.c_name) <= 2
"""

ORACLE["mrr_eval"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0) AS t
  FROM documents
), qterms AS (
  -- adaptive stride mirrors mrr_eval's max_queries=200 cap:
  -- greatest(100, n // 200); identity at every oracle-gated scale
  SELECT DISTINCT query_id, term FROM (
    SELECT doc_id AS query_id, unnest(t[1:4]) AS term
    FROM toks
    WHERE doc_id % (SELECT GREATEST(100, CAST(count(*) // 200 AS BIGINT))
                    FROM documents) = 0
  )
), tfs AS (
  SELECT docid, term, count(*) AS tf FROM (
    SELECT doc_id AS docid, unnest(t) AS term FROM toks
  ) GROUP BY 1, 2
), dl AS (SELECT docid, CAST(sum(tf) AS BIGINT) AS dl FROM tfs GROUP BY docid),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
dfs AS (
  SELECT term, count(*) AS df FROM tfs
  WHERE term IN (SELECT DISTINCT term FROM qterms) GROUP BY term
), c AS (
  SELECT q.query_id, tfs.docid,
         round(ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
               * tfs.tf * (1.2 + 1)
               / (tfs.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6)
           AS c
  FROM qterms q JOIN tfs USING (term) JOIN dfs USING (term)
       JOIN dl USING (docid), stats
), scored AS (
  SELECT query_id, docid, round(sum(c), 6) AS score FROM c GROUP BY 1, 2
), ranked AS (
  SELECT query_id, docid,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, docid ASC) AS rank
  FROM scored
), hit AS (
  SELECT query_id, rank AS rel_rank FROM ranked
  WHERE rank <= 10 AND docid = query_id
)
SELECT q.query_id, CAST(coalesce(h.rel_rank, 0) AS INTEGER) AS rel_rank,
       round(CASE WHEN h.rel_rank IS NOT NULL THEN 1.0 / h.rel_rank
                  ELSE 0.0 END, 6) AS rr
FROM (SELECT DISTINCT query_id FROM qterms) q LEFT JOIN hit h USING (query_id)
"""

ORACLE["corpus_card"] = r"""
WITH t AS (
  SELECT source, lang, text, len(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0) AS ts
  FROM documents
), m AS (
  SELECT source, lang, text, n_chars, len(ts) AS n,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) ELSE 0.0 END AS dr,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_filter(ts, w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE) / len(ts)
              ELSE 0.0 END AS sr
  FROM t)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens,
       round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 6) AS en_share,
       round(count(DISTINCT md5(text)) * 1.0 / count(*), 6) AS uniq_ratio,
       round(avg(round(0.4 * least(1.0, CAST(n AS DOUBLE) / 64.0)
                       + 0.3 * dr
                       + 0.3 * (1.0 - least(1.0, abs(sr - 0.4) * 2.5)), 6)), 6)
         AS avg_quality,
       round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6) AS p50_chars
FROM m GROUP BY source
"""

ORACLE["dup_span_report"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0) AS t
  FROM documents
), pos AS (
  SELECT doc_id, t, unnest(range(1, len(t) - 18)) AS i
  FROM toks WHERE len(t) >= 20
), wins AS (
  SELECT doc_id, md5(array_to_string(t[i:i+19], ' ')) AS fp FROM pos
), cnt AS (SELECT fp, count(*) AS c FROM wins GROUP BY fp)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_windows,
       CAST(count(*) FILTER (WHERE c > 1) AS BIGINT) AS n_dup_windows,
       round(count(*) FILTER (WHERE c > 1) * 1.0 / count(*), 6) AS dup_fraction
FROM wins JOIN cnt USING (fp)
GROUP BY doc_id
"""

ORACLE["dsir_weights"] = r"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)) AS t
  FROM documents
), bk AS (
  SELECT doc_id, source,
         CAST(CONCAT('0x', substring(md5(t), 1, 7)) AS BIGINT) % 512 AS b
  FROM tok
), doc_b AS (SELECT doc_id, b, count(*) AS tf FROM bk GROUP BY 1, 2),
corpus_b AS (SELECT b, CAST(sum(tf) AS BIGINT) AS c_cnt FROM doc_b GROUP BY 1),
target_b AS (SELECT b, count(*) AS t_cnt FROM bk WHERE source = 'src0' GROUP BY 1),
tots AS (
  SELECT (SELECT CAST(sum(c_cnt) AS BIGINT) FROM corpus_b) AS c_tot,
         (SELECT CAST(coalesce(sum(t_cnt), 0) AS BIGINT) FROM target_b) AS t_tot
)
SELECT doc_id, CAST(sum(tf) AS INTEGER) AS n_tokens,
       round(sum(tf * (ln((coalesce(t_cnt, 0) + 1.0) / (t_tot + 512.0))
                       - ln((c_cnt + 1.0) / (c_tot + 512.0)))) / sum(tf), 6)
         AS weight
FROM doc_b JOIN corpus_b USING (b) LEFT JOIN target_b USING (b), tots
GROUP BY doc_id
"""

ORACLE["perplexity_buckets"] = r"""
WITH tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0)) AS t FROM documents)
  GROUP BY doc_id, t
), cnts AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
tot AS (SELECT sum(cnt) AS n_total, count(*) AS vocab FROM cnts),
scored AS (
  SELECT doc_id,
         round(sum(tf * ln((cnt + 1.0) / (n_total + vocab))) / sum(tf), 6)
           AS avg_logprob
  FROM tf JOIN cnts USING (term), tot
  GROUP BY doc_id
), lb AS (
  SELECT d.lang, s.avg_logprob,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY s.avg_logprob DESC, s.doc_id) AS bucket
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT lang, CAST(bucket AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(avg_logprob), 6) AS avg_logprob,
       min(avg_logprob) AS min_logprob,
       max(avg_logprob) AS max_logprob
FROM lb GROUP BY 1, 2
"""

# The capped variant replays the exact pair set, ranks every pair from
# both endpoints' viewpoints, and keeps pairs either endpoint ranks in
# its 3 best (ties by partner id) — same OR-semantics as the Spark
# knob.
ORACLE["record_linkage_topk"] = """
WITH pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
         a.c_name AS name_a, b.c_name AS name_b,
         CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS distance
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
  WHERE abs(length(a.c_name) - length(b.c_name)) <= 2
    AND levenshtein(a.c_name, b.c_name) <= 2
), sym AS (
  SELECT id_a AS rid, id_b AS oid, distance FROM pairs
  UNION ALL
  SELECT id_b AS rid, id_a AS oid, distance FROM pairs
), kept AS (
  SELECT least(rid, oid) AS id_a, greatest(rid, oid) AS id_b
  FROM (
    SELECT rid, oid,
           row_number() OVER (PARTITION BY rid ORDER BY distance, oid) AS rk
    FROM sym
  ) WHERE rk <= 3
  GROUP BY 1, 2
)
SELECT p.id_a, p.id_b, p.name_a, p.name_b, p.distance
FROM pairs p JOIN kept k ON p.id_a = k.id_a AND p.id_b = k.id_b
"""

ORACLE["label_centroids"] = """
WITH e AS (
  SELECT label, unnest(generate_series(1, len(embedding))) AS dim,
         unnest(embedding) AS x
  FROM embeddings
)
SELECT label, CAST(dim AS INTEGER) AS dim,
       -- summands on the fixed 2^-20 grid as exact BIGINTs (mirrors
       -- the Spark operator): order-independent integer sums, so the
       -- hash cannot flip on a 1e-6 rounding boundary
       round(CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
                  AS DOUBLE) / 1048576.0 / count(*), 6) AS centroid
FROM e GROUP BY 1, 2
"""

ORACLE["jsonl_roundtrip"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""

ORACLE["stratified_sample"] = f"""
SELECT doc_id, lang FROM documents
WHERE {_DOC_BIN} < CASE WHEN lang = 'en' THEN 250000
                        WHEN lang = 'zh' THEN 500000
                        ELSE 1000000 END
"""

ORACLE["token_counts"] = r"""
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> len(t) > 0))
            AS INTEGER) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
            AS INTEGER) AS bpe_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM documents
"""

_STOP_IN = ", ".join(f"'{w}'" for w in text_quality.STOPWORDS)
ORACLE["quality_score"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
m AS (
  SELECT doc_id, len(ts) AS n,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) ELSE 0.0 END AS dr,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_filter(ts, w -> w IN ({_STOP_IN}))) AS DOUBLE) / len(ts)
              ELSE 0.0 END AS sr
  FROM t)
SELECT doc_id,
       round(0.4 * least(1.0, CAST(n AS DOUBLE) / 64.0)
             + 0.3 * dr
             + 0.3 * (1.0 - least(1.0, abs(sr - 0.4) * 2.5)), 6) AS quality
FROM m
"""

_LANGS = sorted(text_quality.LANG_MARKERS)
_SCORE_EXPRS = ",\n         ".join(
    "CAST(len(list_filter(ts, w -> w IN ({}))) AS INTEGER) AS s_{}".format(
        ", ".join(f"'{m}'" for m in text_quality.LANG_MARKERS[lang]), lang
    )
    for lang in _LANGS
)
_GREATEST = "greatest(" + ", ".join(f"s_{lang}" for lang in _LANGS) + ")"
_PRED_CASE = "CASE " + " ".join(
    f"WHEN s_{lang} = {_GREATEST} THEN '{lang}'" for lang in _LANGS
) + " END"
ORACLE["language_id"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
s AS (SELECT doc_id,
         {_SCORE_EXPRS}
      FROM t)
SELECT doc_id, {_PRED_CASE} AS pred_lang, {_GREATEST} AS score FROM s
"""

# curation flagship: CTE-reuses the quality, language-ID and
# decontamination oracles verbatim and composes them the same way the
# Spark DAG does.
ORACLE["curated_corpus"] = f"""
WITH q AS (
{ORACLE["quality_score"]}
),
l AS (
{ORACLE["language_id"]}
),
flagged AS (
{ORACLE["contamination_flags"]}
)
SELECT d.doc_id, d.source, q.quality
FROM documents d
JOIN q USING (doc_id)
JOIN l USING (doc_id)
WHERE d.doc_id % 97 <> 0
  AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
  AND q.quality >= 0.5
  AND l.pred_lang = 'en'
"""

ORACLE["doc_fingerprint"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents)
SELECT doc_id,
       CASE WHEN len(ts) >= 5
            THEN list_aggregate(list_transform(
                   range(1, len(ts) - 3),
                   i -> {_h60_sql("array_to_string(ts[i:i+4], ' ')")}), 'min')
            ELSE {_h60_sql("array_to_string(ts, ' ')")} END AS fingerprint
FROM t
"""

ORACLE["repetition_stats"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
ng AS (
  SELECT doc_id, g, count(*) AS c FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts) - 1),
                                 i -> array_to_string(ts[i:i+2], ' '))) AS g
    FROM t WHERE len(ts) >= 3)
  GROUP BY doc_id, g),
ns AS (
  SELECT doc_id, sum(c) AS n_ngrams,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
  FROM ng GROUP BY doc_id),
bg AS (
  SELECT doc_id, g, count(*) AS c FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts)),
                                 i -> array_to_string(ts[i:i+1], ' '))) AS g
    FROM t WHERE len(ts) >= 2)
  GROUP BY doc_id, g),
bs AS (SELECT doc_id, sum(c) AS n_bi, max(c) AS max_bi FROM bg GROUP BY doc_id)
SELECT t.doc_id,
       CAST(coalesce(ns.n_ngrams, 0) AS BIGINT) AS n_trigrams,
       round(CASE WHEN ns.n_ngrams > 0
                  THEN CAST(ns.dup AS DOUBLE) / ns.n_ngrams
                  ELSE 0.0 END, 6) AS dup_trigram_frac,
       round(CASE WHEN bs.n_bi > 0
                  THEN CAST(bs.max_bi AS DOUBLE) / bs.n_bi
                  ELSE 0.0 END, 6) AS top_bigram_share
FROM t
LEFT JOIN ns ON ns.doc_id = t.doc_id
LEFT JOIN bs ON bs.doc_id = t.doc_id
"""

ORACLE["chunk_documents"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents)
SELECT doc_id,
       CAST(s // 24 AS INTEGER) AS chunk_idx,
       array_to_string(ts[s + 1 : s + 32], ' ') AS chunk_text,
       CAST(least(32, len(ts) - s) AS INTEGER) AS n_tokens
FROM (SELECT doc_id, ts, unnest(range(0, len(ts), 24)) AS s FROM t)
"""

ORACLE["pii_scrub"] = f"""
WITH p AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS VARCHAR)
              || '@example.com or https://ex.am/p/' || CAST(doc_id AS VARCHAR)
              || ' now' AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(t, '{text_quality.EMAIL_REGEX}', '<EMAIL>', 'g'),
                      '{text_quality.URL_REGEX}', '<URL>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(t, '{text_quality.EMAIL_REGEX}')) AS INTEGER)
         AS n_emails,
       CAST(len(regexp_extract_all(t, '{text_quality.URL_REGEX}')) AS INTEGER)
         AS n_urls
FROM p
"""

_COS = (
    "round(list_dot_product(qv, v) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6)"
)
ORACLE["key_skew_report"] = """
WITH counts AS (
  SELECT o_custkey, count(*) AS cnt FROM orders
  WHERE o_custkey IS NOT NULL GROUP BY o_custkey
),
hist AS (SELECT cnt, count(*) AS k FROM counts GROUP BY cnt),
ranked AS (
  SELECT cnt, k,
         COALESCE(CAST(sum(k) OVER (ORDER BY cnt
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) + 1 AS s
  FROM hist
),
s AS (
  SELECT CAST(sum(k) AS BIGINT) AS n,
         CAST(sum(cnt * k) AS BIGINT) AS total,
         CAST(sum(cnt * (2 * s + k - 1) * k) AS BIGINT) AS weighted,
         max(cnt) AS max_cnt
  FROM ranked
)
SELECT n AS n_keys, total AS total_rows, max_cnt,
       round(max_cnt / total, 6) AS top_share,
       round(weighted / (n * total) - (n + 1) / n, 6) AS gini
FROM s
"""

ORACLE["user_entropy"] = """
WITH by_type AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events, count(*) AS n_types
  FROM by_type GROUP BY user_id
),
c AS (
  SELECT b.user_id, p.n_events, p.n_types,
         round(-(b.cnt / p.n_events * ln(b.cnt / p.n_events)), 6) AS c
  FROM by_type b JOIN per_user p USING (user_id)
)
SELECT user_id, n_events, n_types, round(sum(c), 6) AS entropy
FROM c GROUP BY 1, 2, 3
"""

ORACLE["streaming_countmin"] = f"""
WITH hashed AS (
  SELECT CAST(CONCAT('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 7))
              AS BIGINT) AS h
  FROM events WHERE user_id IS NOT NULL
)
SELECT CAST(t.d AS INTEGER) AS d,
       (({_A_SQL}[t.d + 1] * h + {_B_SQL}[t.d + 1]) % 2147483647) % 256 AS bucket,
       count(*) AS cnt
FROM hashed, range(0, 4) t(d)
GROUP BY 1, 2
"""

ORACLE["aspect_ratio_histogram"] = """
WITH dims AS (
  SELECT CAST(4 + doc_id % 12 AS INTEGER) AS width, 8 AS height
  FROM documents
)
SELECT width, CAST(height AS INTEGER) AS height,
       count(*) AS n_assets,
       round(max(width) / max(height), 6) AS aspect_ratio
FROM dims GROUP BY 1, 2
"""

ORACLE["label_spread"] = """
WITH per AS (
  SELECT label,
         round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))), 6) AS nrm
  FROM embeddings
)
SELECT label, count(*) AS n,
       round(sum(nrm) / count(*), 6) AS mean_norm,
       round(sum(nrm * nrm) / count(*)
             - (sum(nrm) / count(*)) * (sum(nrm) / count(*)), 6) AS var_norm
FROM per GROUP BY label
"""

ORACLE["hard_negatives"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
anchors AS (
  SELECT vec_id AS anchor_id, v AS qv, label AS a_label
  FROM e ORDER BY vec_id LIMIT 10
),
scored AS (
  SELECT a.anchor_id, a.a_label, e.vec_id, e.label,
         round(list_dot_product(a.qv, e.v)
               / (sqrt(list_dot_product(a.qv, a.qv))
                  * sqrt(list_dot_product(e.v, e.v))), 6) AS sim
  FROM anchors a, e WHERE e.vec_id != a.anchor_id
),
pos AS (
  SELECT anchor_id, vec_id AS pos_id, sim AS pos_sim
  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored WHERE label = a_label)
  WHERE rn = 1
),
neg AS (
  SELECT anchor_id, vec_id AS neg_id, sim AS neg_sim
  FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                                     ORDER BY sim DESC, vec_id ASC) AS rn
        FROM scored WHERE label != a_label)
  WHERE rn = 1
)
SELECT p.anchor_id, p.pos_id, p.pos_sim, n.neg_id, n.neg_sim
FROM pos p JOIN neg n ON n.anchor_id = p.anchor_id
"""

# The projection matrix entry for (i, j) is derived from the same LCG
# in both engines: high bits of (a*(i*8+j)+c) mod 2^31, folded mod 6
# into {{+1, -1, 0, 0, 0, 0}}; scaled by sqrt(3/8). list_sum folds the
# 64 products in list order, matching Spark's sequential aggregate
# fold; round(...,6) absorbs the ulps.
ORACLE["random_projection"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT vec_id, CAST(j AS INTEGER) AS dim,
       round(list_sum(list_transform(range(0, 64), i ->
               v[i + 1] * (CASE ((((1103515245 * (i * 8 + j) + 12345) % 2147483648) >> 16) % 6)
                           WHEN 0 THEN 1.0 WHEN 1 THEN -1.0 ELSE 0.0 END)))
             * sqrt(3.0 / 8), 6) AS value
FROM e, range(0, 8) t(j)
"""

ORACLE["brute_force_topk"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, {_COS} AS sim
  FROM q, e WHERE e.vec_id != q.query_id)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank,
       sim
FROM scored
QUALIFY rank <= 10
"""

# embedding_pca: the covariance CTE is the (already hash-exact)
# embedding_covariance oracle; the 8 power-iteration rounds unroll as
# matvec (list_dot_product over j-ordered row lists — the same
# left-to-right fold the driver-local Python loop uses, verified
# bit-exact) + L2 normalize + round(,6)+0.0 quantization per round,
# so both engines iterate on IDENTICAL vectors. Built after
# ORACLE["embedding_covariance"] exists (see _build_pca_oracle call
# site below that definition).
def _build_pca_oracle(n_iter: int = 8) -> str:
    # every CTE is MATERIALIZED: the rounds chain back through
    # rows_c/cov, and DuckDB's default CTE inlining re-evaluates the
    # whole upstream chain per reference — exponential blowup across
    # 8 rounds (observed as a hung oracle before this; same fix as
    # the unrolled pagerank oracles).
    parts = [
        f"WITH cov AS MATERIALIZED ({ORACLE['embedding_covariance']}),",
        "rows_c AS MATERIALIZED (SELECT i, list(cov ORDER BY j) AS ci FROM cov GROUP BY i),",
        "v0 AS MATERIALIZED (SELECT i, CAST(1.0 AS DOUBLE) AS x"
        " FROM (SELECT DISTINCT i FROM cov)),",
    ]
    for t in range(1, n_iter + 1):
        p = t - 1
        parts += [
            f"w{t} AS MATERIALIZED (SELECT r.i, list_dot_product(r.ci,"
            f" (SELECT list(x ORDER BY i) FROM v{p})) AS w FROM rows_c r),",
            f"n{t} AS MATERIALIZED (SELECT sqrt(list_dot_product(l, l)) AS nrm FROM"
            f" (SELECT list(w ORDER BY i) AS l FROM w{t})),",
            f"v{t} AS MATERIALIZED (SELECT i, round(w / (SELECT nrm FROM n{t}), 6) + 0.0"
            f" AS x FROM w{t}),",
        ]
    f = n_iter
    parts += [
        f"cv AS MATERIALIZED (SELECT r.i, list_dot_product(r.ci,"
        f" (SELECT list(x ORDER BY i) FROM v{f})) AS w FROM rows_c r),",
        f"num AS MATERIALIZED (SELECT list_dot_product((SELECT list(x ORDER BY i) FROM v{f}),"
        " (SELECT list(w ORDER BY i) FROM cv)) AS s),",
        f"den AS MATERIALIZED (SELECT list_dot_product(l, l) AS s FROM"
        f" (SELECT list(x ORDER BY i) AS l FROM v{f})),",
        "eig AS MATERIALIZED (SELECT round((SELECT s FROM num) / (SELECT s FROM den), 6)"
        " + 0.0 AS e),",
        # trace as a left-to-right dot with ones — same fold order as
        # the Python accumulation (x * 1.0 is exact)
        "tr AS MATERIALIZED (SELECT list_dot_product(dl, list_transform(dl, _ -> 1.0))"
        " AS t FROM (SELECT list(cov ORDER BY i) AS dl FROM cov WHERE i = j)),",
        "evr AS MATERIALIZED (SELECT round((SELECT e FROM eig) / (SELECT t FROM tr), 6)"
        " + 0.0 AS r)",
        f"SELECT v{f}.i AS i, v{f}.x AS loading,",
        "       (SELECT e FROM eig) AS eigenvalue,",
        "       (SELECT r FROM evr) AS explained_ratio",
        f"FROM v{f}",
        # degenerate-input mirror of similarity.embedding_pca's guards:
        # a zero norm at ANY round makes w/0 NaN, which cascades through
        # every later CTE, so finiteness of the final loading/eig/evr
        # plus trace > 0 reproduces the Spark side's empty-result
        # contract (all-zero covariance, null-space collapse, zero
        # trace) instead of emitting inf/NaN rows.
        f"WHERE isfinite(v{f}.x) AND isfinite((SELECT e FROM eig))",
        "  AND isfinite((SELECT r FROM evr)) AND (SELECT t FROM tr) > 0",
    ]
    return "\n".join(parts)


# matryoshka_recall: replays all four rankings (full + each prefix
# dim) with list slicing — the CASE keeps dim=0 on the un-sliced
# arrays so the ground truth is bit-identical to brute_force_topk's.
ORACLE["matryoshka_recall"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
dd AS (SELECT * FROM (VALUES (0), (8), (16), (32)) d(dim)),
scored AS (
  SELECT dd.dim, q.query_id, e.vec_id AS neighbor_id,
         CASE WHEN dd.dim = 0 THEN {_COS}
              ELSE round(list_dot_product(qv[1:dd.dim], v[1:dd.dim]) /
                   (sqrt(list_dot_product(qv[1:dd.dim], qv[1:dd.dim])) *
                    sqrt(list_dot_product(v[1:dd.dim], v[1:dd.dim]))), 6)
         END AS sim
  FROM dd, q, e WHERE e.vec_id != q.query_id),
topk AS (
  SELECT dim, query_id, neighbor_id FROM (
    SELECT dim, query_id, neighbor_id,
           row_number() OVER (PARTITION BY dim, query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored) WHERE rn <= 10),
truth AS (SELECT query_id, neighbor_id FROM topk WHERE dim = 0),
nq AS (SELECT count(DISTINCT query_id) AS n FROM truth),
hits AS (
  SELECT t.dim, count(*) AS h
  FROM topk t JOIN truth u USING (query_id, neighbor_id)
  WHERE t.dim != 0 GROUP BY t.dim)
-- dims scaffold left join: a prefix dim with ZERO truth hits still
-- reports recall=0.0 instead of vanishing from the curve (mirrors
-- the Spark-side scaffold in similarity.matryoshka_recall)
SELECT CAST(s.dim AS INTEGER) AS dim,
       CAST(nq.n AS INTEGER) AS n_queries,
       CAST(COALESCE(h, 0) AS BIGINT) AS hits,
       round(COALESCE(h, 0) / (nq.n * 10.0), 6) AS recall
FROM (SELECT dim FROM dd WHERE dim != 0) s
LEFT JOIN hits ON hits.dim = s.dim, nq
WHERE nq.n > 0
"""

# gopher_quality_gate: every metric re-derived from the shared _TOK
# tokenization; rules compare the ROUNDED metrics, matching Spark.
ORACLE["gopher_quality_gate"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
m AS (
  SELECT doc_id,
         CAST(len(ts) AS INTEGER) AS n_words,
         round(CASE WHEN len(ts) > 0 THEN
             CAST(list_aggregate(list_transform(ts, w -> len(w)), 'sum')
                  AS BIGINT) / len(ts)
             ELSE 0.0 END, 6) AS mean_word_len,
         CAST(len(list_filter(ts, w -> w IN ({_STOP_IN}))) AS INTEGER)
             AS stop_hits,
         round(CASE WHEN len(ts) > 0 THEN
             (len(ts) - len(list_distinct(ts))) / len(ts)
             ELSE 0.0 END, 6) AS dup_word_frac
  FROM t)
SELECT doc_id, n_words, mean_word_len, stop_hits, dup_word_frac,
       (n_words >= 50 AND n_words <= 100000) AS len_ok,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS word_len_ok,
       (stop_hits >= 2) AS stop_ok,
       (dup_word_frac <= 0.6) AS dup_ok,
       ((n_words >= 50 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND (stop_hits >= 2)
        AND (dup_word_frac <= 0.6)) AS passes
FROM m
"""

_CCOS = (
    "round(list_dot_product(c, v) / "
    "(sqrt(list_dot_product(c, c)) * sqrt(list_dot_product(v, v))), 6)"
)
ORACLE["ivf_assign"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cell_id, v AS c FROM e WHERE vec_id < 8),
scored AS (
  SELECT e.vec_id, cen.cell_id, {_CCOS} AS csim FROM e, cen)
SELECT vec_id, cell_id AS cell FROM (
  SELECT vec_id, cell_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY csim DESC, cell_id ASC) AS rn
  FROM scored)
WHERE rn = 1
"""

# ivf_silhouette: replays the ivf_assign cosine ranking, takes own
# (rn=1) and nearest-other (rn=2) centroid distances, quantizes the
# per-vector silhouette to floor(s * 2^20) BIGINT (order-independent
# mean), and normalizes the sign of zero at the final round (+ 0.0 —
# silhouettes are sign-indefinite, the exposed -0.0 class).
ORACLE["ivf_silhouette"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cell_id, v AS c FROM e WHERE vec_id < 8),
scored AS (
  SELECT e.vec_id, cen.cell_id, {_CCOS} AS csim FROM e, cen),
ranked AS (
  SELECT vec_id, cell_id, csim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY csim DESC, cell_id ASC) AS rn
  FROM scored),
per_vec AS (
  SELECT o.vec_id, o.cell_id AS cell,
         CAST(floor((CASE
             WHEN greatest(1.0 - o.csim, 1.0 - s.csim) = 0 THEN 0.0
             ELSE ((1.0 - s.csim) - (1.0 - o.csim))
                  / greatest(1.0 - o.csim, 1.0 - s.csim)
           END) * 1048576.0) AS BIGINT) AS sq
  FROM (SELECT * FROM ranked WHERE rn = 1) o
  JOIN (SELECT * FROM ranked WHERE rn = 2) s ON s.vec_id = o.vec_id)
SELECT CAST(cell AS INTEGER) AS cell, count(*) AS n_vecs,
       round(CAST(sum(sq) AS BIGINT) / 1048576.0 / count(*), 6) + 0.0
         AS mean_silhouette
FROM per_vec GROUP BY cell
"""

# Replays the WHOLE at-rest probe path: nearest-cell assignment (the
# index write), the per-query nprobe=2 probed cells, then exact cosine
# top-10 within probed cells — so a pruning bug that dropped a cell
# directory would hash-mismatch, not just slow down.
_QCOS = (
    "round(list_dot_product(c, qv) / "
    "(sqrt(list_dot_product(c, c)) * sqrt(list_dot_product(qv, qv))), 6)"
)
_PQCOS = (
    "round(list_dot_product(p.qv, a.v) / "
    "(sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(a.v, a.v))), 6)"
)
ORACLE["ivf_index_probe"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cell_id, v AS c FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cen.cell_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_CCOS} DESC, cen.cell_id ASC) AS rn
    FROM e, cen)
  WHERE rn = 1),
qt AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, cell_id AS qcell FROM (
    SELECT qt.query_id, qt.qv, cen.cell_id,
           row_number() OVER (PARTITION BY qt.query_id
                              ORDER BY {_QCOS} DESC, cen.cell_id ASC) AS rn
    FROM qt, cen)
  WHERE rn <= 2),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {_PQCOS} AS sim
  FROM probes p
  JOIN assigned a ON a.cell = p.qcell AND a.vec_id != p.query_id)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank,
       sim
FROM scored
QUALIFY rank <= 10
"""

# floor(x + 0.5) rather than round() on both engines — their round()
# tie-break conventions differ; floor agrees bit-for-bit.
ORACLE["quantize_embeddings"] = """
WITH flat AS (
  SELECT vec_id, CAST(g.i AS INTEGER) AS pos,
         CAST(embedding[CAST(g.i AS INTEGER) + 1] AS DOUBLE) AS v
  FROM embeddings, generate_series(0, 63) g(i)
),
dims AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM flat GROUP BY pos)
SELECT f.vec_id, f.pos,
       CASE WHEN d.mx = d.mn THEN 0
            ELSE CAST(floor((f.v - d.mn) / (d.mx - d.mn) * 255 + 0.5) AS INTEGER) - 128
       END AS code
FROM flat f JOIN dims d USING (pos)
"""

_PCOS = (
    "round(list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)"
)
ORACLE["embedding_near_dupes"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cell_id, v AS c FROM e
        WHERE vec_id < GREATEST(8, (SELECT COUNT(*) FROM embeddings) // 256)),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cen.cell_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_CCOS} DESC, cen.cell_id ASC) AS rn
    FROM e, cen)
  WHERE rn = 1
  -- mirror the operator's max_cell_size=4096 mega-cell exclusion
  QUALIFY count(*) OVER (PARTITION BY cell) <= 4096)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_PCOS} AS sim
FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
WHERE {_PCOS} >= 0.2
"""


def _lsh_topk_oracle_sql() -> str:
    """The sign-LSH pipeline in DuckDB: the md5-derived hyperplanes are
    embedded as a VALUES literal (identical doubles to the Spark side —
    repr() round-trips exactly), then bits → band buckets → candidate
    pairs → exact cosine → top-10, mirroring similarity.lsh_topk with
    n_planes=16, n_bands=4 term-for-term."""
    planes = similarity.lsh_hyperplanes(16, 64)
    vals = ",".join(
        f"({p},{d},{w!r})" for p, row in enumerate(planes) for d, w in enumerate(row)
    )
    return f"""
WITH planes(p, d, w) AS (VALUES {vals}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bits AS (
  SELECT vec_id, p,
         CASE WHEN round(sum(v[d + 1] * w), 6) >= 0 THEN 1 ELSE 0 END AS bit
  FROM e, planes GROUP BY vec_id, p),
buckets AS (
  SELECT vec_id, CAST(p // 4 AS INTEGER) AS band,
         CAST(sum(bit * CAST(power(2, p % 4) AS INTEGER)) AS INTEGER) AS bucket
  FROM bits GROUP BY vec_id, p // 4),
cand AS (
  SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
  FROM buckets cb JOIN buckets qb USING (band, bucket)
  WHERE qb.vec_id < 5 AND cb.vec_id != qb.vec_id),
scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(q.v, n.v) /
               (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(n.v, n.v))), 6) AS sim
  FROM cand JOIN e q ON q.vec_id = cand.query_id
            JOIN e n ON n.vec_id = cand.neighbor_id)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS INTEGER) AS rank,
       sim
FROM scored
QUALIFY rank <= 10
"""


ORACLE["lsh_topk"] = _lsh_topk_oracle_sql()

ORACLE["dp_event_counts"] = """
WITH g AS (
  SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type),
u AS (
  SELECT event_type, n,
         (CAST(CONCAT('0x', substring(md5(CONCAT('dp-v1', event_type)), 1, 15))
               AS BIGINT) + 1) / 1152921504606846978.0 AS uni
  FROM g)
SELECT event_type,
       round(n + (-1.0) * sign(uni - 0.5) * ln(1.0 - 2.0 * abs(uni - 0.5)), 6)
         AS noisy_count
FROM u
"""

ORACLE["temperature_mix"] = """
WITH g AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_units
  FROM documents GROUP BY source),
t AS (
  SELECT *, CAST(n_units AS DOUBLE) / SUM(n_units) OVER () AS nat,
         pow(CAST(n_units AS DOUBLE) / SUM(n_units) OVER (), 1.0 / 2.0) AS u
  FROM g)
SELECT source, n_units,
       round(nat, 6) AS nat_share,
       round(u / SUM(u) OVER (), 6) AS weight,
       round((u / SUM(u) OVER ()) / nat, 6) AS upsample_factor
FROM t
"""

ORACLE["semantic_decontamination"] = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ev AS (SELECT vec_id AS eval_id, v AS c FROM e
      WHERE vec_id % 10 = 3 AND vec_id < 2000),
tr AS (SELECT vec_id, v FROM e WHERE vec_id % 10 <> 3 OR vec_id >= 2000),
s AS (
  SELECT tr.vec_id, ev.eval_id,
         round(list_dot_product(ev.c, tr.v)
               / (sqrt(list_dot_product(ev.c, ev.c))
                  * sqrt(list_dot_product(tr.v, tr.v))), 6) AS sim
  FROM tr, ev),
best AS (
  SELECT vec_id, eval_id, sim,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, eval_id ASC) AS rn
  FROM s WHERE sim >= CAST(0.35 AS DOUBLE))
SELECT vec_id, CAST(eval_id AS BIGINT) AS eval_id, sim
FROM best WHERE rn = 1
"""

ORACLE["margin_bitext"] = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
src AS (SELECT vec_id AS query_id, v AS q FROM e WHERE label = 0),
tgt AS (SELECT vec_id, v FROM e WHERE label = 1),
s AS (
  SELECT src.query_id, tgt.vec_id AS neighbor_id,
         round(list_dot_product(q, tgt.v)
               / (sqrt(list_dot_product(q, q))
                  * sqrt(list_dot_product(tgt.v, tgt.v))), 6) AS sim
  FROM src, tgt),
k AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM s),
top AS (SELECT * FROM k WHERE rank <= 4),
m AS (
  SELECT query_id, neighbor_id, sim, rank,
         round(sim / (sum(sim) OVER (PARTITION BY query_id)
                      / count(*) OVER (PARTITION BY query_id)), 6) AS margin
  FROM top)
SELECT query_id, neighbor_id, sim, margin
FROM m WHERE rank = 1 AND margin >= CAST(1.2 AS DOUBLE)
"""

_PROMO_VALUES = ",".join(
    f"({i}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for i, s, e in _PROMO_WINDOWS
)

ORACLE["range_join"] = f"""
WITH promos(promo_id, start_ts, end_ts) AS (VALUES {_PROMO_VALUES})
SELECT promo_id, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_value
FROM events e JOIN promos p ON e.ts >= p.start_ts AND e.ts < p.end_ts
GROUP BY promo_id
"""

ORACLE["asof_join"] = """
WITH p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.user_id,
       epoch_us(p.ts) AS purchase_ts_us, round(p.value, 6) AS purchase_value,
       epoch_us(c.ts) AS click_ts_us, round(c.value, 6) AS click_value
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
"""

ORACLE["hypertable_rollup"] = """
SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(hour(ts) AS INTEGER) AS hr,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_value,
       CAST(GROUPING(day, hr) AS INTEGER) AS grain
FROM events GROUP BY ROLLUP (day, hr)
"""

ORACLE["sliding_hourly_stats"] = """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_value
  FROM events GROUP BY 1, 2)
SELECT event_type, hour, n, total_value,
       round(avg(n) OVER w, 6) AS moving_avg_n,
       round(sum(total_value) OVER w, 6) AS moving_total_value
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""

ORACLE["customers_without_orders"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""

ORACLE["unigram_logprob"] = f"""
WITH tf AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY doc_id, t
), cnts AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
tot AS (SELECT sum(cnt) AS n_total, count(*) AS vocab FROM cnts)
SELECT doc_id, CAST(sum(tf) AS INTEGER) AS n_tokens,
       round(sum(tf * ln((cnt + 1.0) / (n_total + vocab))) / sum(tf), 6)
         AS avg_logprob
FROM tf JOIN cnts USING (term), tot
GROUP BY doc_id
"""

ORACLE["graph_components"] = """
WITH m AS (
  SELECT c_nationkey, CAST(c_custkey AS INTEGER) AS id FROM customer
), s AS (
  SELECT c_nationkey, min(id) AS comp, count(*) AS sz
  FROM m GROUP BY c_nationkey
)
SELECT m.id AS node_id, s.comp AS component_id, s.sz AS component_size
FROM m JOIN s USING (c_nationkey)
WHERE s.sz >= 2
"""

ORACLE["value_buckets"] = """
WITH bounds AS (
  SELECT quantile_cont(value, [0.25, 0.5, 0.75]) AS bs FROM events
), assigned AS (
  SELECT e.value,
         CAST(len(list_filter(b.bs, x -> e.value > x)) + 1 AS INTEGER) AS bucket
  FROM events e, bounds b
)
SELECT bucket, count(*) AS n,
       round(min(value), 6) AS vmin, round(max(value), 6) AS vmax
FROM assigned GROUP BY bucket
"""

ORACLE["hourly_anomalies"] = """
WITH hourly AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n
  FROM events GROUP BY 1, 2
), scored AS (
  SELECT event_type, hour, n,
         round(avg(n) OVER w, 6) AS baseline_mean,
         round(stddev_samp(n) OVER w, 6) AS baseline_sd
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, hour, n, baseline_mean, baseline_sd,
       round((n - baseline_mean) / baseline_sd, 6) AS zscore,
       abs(round((n - baseline_mean) / baseline_sd, 6)) >= 3.0 AS is_anomaly
FROM scored
WHERE baseline_sd IS NOT NULL AND baseline_sd > 0
"""

ORACLE["snapshot_diff"] = """
WITH base AS (
  SELECT event_id, event_type,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS value_d
  FROM events
),
old AS (
  -- mirrors the engine digest: md5 per column (NULL -> NUL-wrapped
  -- sentinel) concatenated, then an outer md5 — per-column hashing
  -- keeps delimiter bytes in values from shifting field boundaries
  SELECT event_id,
         md5(md5(coalesce(event_type, chr(0) || 'NULL' || chr(0)))
             || md5(coalesce(CAST(value_d AS VARCHAR),
                             chr(0) || 'NULL' || chr(0)))) AS d
  FROM base WHERE event_id % 17 != 0
),
new AS (
  SELECT event_id,
         md5(md5(coalesce(event_type, chr(0) || 'NULL' || chr(0)))
             || md5(coalesce(CAST(
           CASE WHEN event_id % 13 = 0
                THEN CAST(value_d + 1 AS DECIMAL(18,6))
                ELSE value_d END AS VARCHAR),
                             chr(0) || 'NULL' || chr(0)))) AS d
  FROM base WHERE event_id % 19 != 0
)
SELECT COALESCE(o.event_id, n.event_id) AS event_id,
       CASE WHEN o.event_id IS NULL THEN 'insert'
            WHEN n.event_id IS NULL THEN 'delete'
            WHEN o.d != n.d THEN 'update' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id
WHERE (CASE WHEN o.event_id IS NULL THEN 'insert'
            WHEN n.event_id IS NULL THEN 'delete'
            WHEN o.d != n.d THEN 'update' END) IS NOT NULL
"""

ORACLE["shuffle_shards"] = f"""
WITH h AS (
  SELECT doc_id, source,
         {_h60_sql("'42|' || CAST(doc_id AS VARCHAR)")} AS hh
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT doc_id, source, CAST(hh % 8 AS INTEGER) AS shard,
       CAST(row_number() OVER (PARTITION BY hh % 8
                               ORDER BY hh, CAST(doc_id AS VARCHAR))
            AS INTEGER) AS pos
FROM h
"""

def _bpe_oracle_sql(n_merges: int = 5) -> str:
    """Unrolled BPE-trainer oracle: per round, the pair-count argmax
    (b{{i}}) and the greedy left-to-right merge fold (v{{i}}) via
    DuckDB list_reduce — same shape as the unrolled pagerank oracle."""
    parts = [
        f"""v0 AS (
  SELECT word, cnt,
         list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
  FROM (SELECT t AS word, count(*) AS cnt
        FROM (SELECT unnest({_TOK}) AS t FROM documents) GROUP BY t)
)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f"""p{i} AS (
  SELECT p.l AS l, p.r AS r, sum(cnt) AS pc
  FROM (SELECT cnt,
               unnest(list_transform(range(1, len(syms)),
                      j -> {{'l': syms[j], 'r': syms[j + 1]}})) AS p
        FROM v{i - 1} WHERE len(syms) >= 2)
  GROUP BY 1, 2
),
b{i} AS (SELECT l, r, pc FROM p{i} ORDER BY pc DESC, l, r LIMIT 1)"""
        )
        if i < n_merges:
            parts.append(
                f"""v{i} AS (
  SELECT word, cnt,
         list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE WHEN len(acc) >= 1 AND acc[len(acc)] = b{i}.l
                                 AND x[1] = b{i}.r
                       THEN acc[1:len(acc) - 1] || [b{i}.l || b{i}.r]
                       ELSE acc || x END) AS syms
  FROM v{i - 1}, b{i}
)"""
            )
    selects = "\nUNION ALL\n".join(
        # CAST: DuckDB sum() yields HUGEINT, which pandas renders as
        # float64 — the driver's value hash then misses Spark's int64
        # even when every value is equal (round-5 red row).
        f"SELECT {i} AS rank, l AS lhs, r AS rhs, CAST(pc AS BIGINT) AS pair_cnt FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


ORACLE["daily_trend"] = """
WITH daily AS (
  SELECT event_type,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       round(regr_slope(n, d), 6) AS slope,
       round(regr_intercept(n, d), 6) AS intercept,
       count(*) AS n_days
FROM daily GROUP BY event_type
"""

ORACLE["event_cube"] = """
WITH e AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, value
  FROM events
)
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(day, '(all)') AS day,
       count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_value
FROM e GROUP BY CUBE(event_type, day)
"""

ORACLE["session_stats"] = """
WITH s AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_value
FROM g GROUP BY user_id, sid
"""

# the stream must land exactly on the batch answer after full replay
ORACLE["streaming_session_stats"] = ORACLE["session_stats"]

ORACLE["normalize_events"] = """
WITH raw AS (
  -- exact decimal sufficient statistics (mirrors the Spark operator):
  -- order-independent sums, so the per-row rounded z-scores cannot
  -- flip on a 1e-6 boundary under a different partial-sum order
  SELECT event_type, count(value) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(value AS DECIMAL(18,6))
                  * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2,
         min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type
), stats AS (
  SELECT event_type, s / n AS mu,
         CASE WHEN n > 1
              THEN sqrt(greatest(0.0, (s2 - s * s / n) / (n - 1))) END AS sd,
         lo, hi
  FROM raw
)
SELECT event_id, e.event_type, round(value, 6) AS value,
       CASE WHEN sd IS NOT NULL AND sd > 0
            THEN round((value - mu) / sd, 6) END AS zscore,
       CASE WHEN hi - lo > 0 THEN round((value - lo) / (hi - lo), 6)
            ELSE 0.5 END AS minmax
FROM events e JOIN stats s ON e.event_type = s.event_type
"""

ORACLE["co_engagement"] = """
WITH ui AS (SELECT DISTINCT user_id AS u, event_type AS i FROM events)
SELECT a.i AS item_a, b.i AS item_b, count(*) AS users
FROM ui a JOIN ui b ON a.u = b.u AND a.i < b.i
GROUP BY 1, 2
"""

ORACLE["rolling_active_users"] = """
WITH daily AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM daily)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS dau,
       count(DISTINCT u.user_id) AS wau
FROM days d JOIN daily u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY 1
"""

ORACLE["bpe_merges"] = _bpe_oracle_sql(5)
# the single-job in-partition trainer has IDENTICAL semantics — one
# oracle certifies both implementations agree merge-for-merge
ORACLE["bpe_merges_local"] = ORACLE["bpe_merges"]


def _bpe_vocab_oracle_sql(n_merges: int = 5) -> str:
    """Extends the trainer oracle with the final round's fold (v{n})
    and the weighted subword explode — the encode step in SQL."""
    base = _bpe_oracle_sql(n_merges)
    with_block = base[: base.rindex("\nSELECT 1 AS rank")]
    i = n_merges
    final_fold = f""",
v{i} AS (
  SELECT word, cnt,
         list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE WHEN len(acc) >= 1 AND acc[len(acc)] = b{i}.l
                                 AND x[1] = b{i}.r
                       THEN acc[1:len(acc) - 1] || [b{i}.l || b{i}.r]
                       ELSE acc || x END) AS syms
  FROM v{i - 1}, b{i}
)
SELECT s AS subword, CAST(sum(cnt) AS BIGINT) AS cnt
FROM (SELECT cnt, unnest(syms) AS s FROM v{i})
GROUP BY s"""
    return with_block + final_fold


ORACLE["bpe_vocab"] = _bpe_vocab_oracle_sql(5)


def _bpe_token_counts_oracle_sql(n_merges: int = 5) -> str:
    """Extends the trainer oracle with the final fold and a per-doc
    tf-pair join: doc token count = Σ tf(word) * len(syms(word));
    empty docs keep a 0 row via the LEFT JOIN off documents."""
    base = _bpe_oracle_sql(n_merges)
    with_block = base[: base.rindex("\nSELECT 1 AS rank")]
    i = n_merges
    return with_block + f""",
v{i} AS (
  SELECT word, cnt,
         list_reduce(list_transform(syms, s -> [s]),
           (acc, x) -> CASE WHEN len(acc) >= 1 AND acc[len(acc)] = b{i}.l
                                 AND x[1] = b{i}.r
                       THEN acc[1:len(acc) - 1] || [b{i}.l || b{i}.r]
                       ELSE acc || x END) AS syms
  FROM v{i - 1}, b{i}
),
wl AS (SELECT word, len(syms) AS n_sub FROM v{i}),
tf AS (
  SELECT doc_id, t AS word, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY 1, 2
)
SELECT d.doc_id,
       CAST(coalesce(sum(tf.tf * wl.n_sub), 0) AS BIGINT) AS bpe_tokens
FROM documents d
LEFT JOIN tf ON tf.doc_id = d.doc_id
LEFT JOIN wl ON wl.word = tf.word
GROUP BY d.doc_id"""


ORACLE["bpe_token_counts"] = _bpe_token_counts_oracle_sql(5)

# composed: per-source fertility over the per-doc BPE counts (same
# trained-table replay, grouped against whitespace token totals)
ORACLE["tokenizer_fertility"] = f"""
WITH tc AS (SELECT doc_id, bpe_tokens FROM ({ORACLE['bpe_token_counts']}) _t),
ws AS (SELECT doc_id, source, len({_TOK}) AS ws FROM documents)
SELECT ws.source AS source,
       CAST(sum(ws.ws) AS BIGINT) AS ws_tokens,
       CAST(sum(tc.bpe_tokens) AS BIGINT) AS bpe_tokens,
       CASE WHEN sum(ws.ws) > 0
            THEN round(CAST(sum(tc.bpe_tokens) AS DOUBLE) / sum(ws.ws), 6)
       END AS fertility
FROM ws JOIN tc USING (doc_id)
GROUP BY 1
"""

ORACLE["centroid_confusion"] = f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
x AS (
  SELECT label, unnest(generate_series(1, len(v))) AS dim, unnest(v) AS xx
  FROM e
),
cm AS (SELECT label AS cell_id, dim,
              round(CAST(sum(CAST(floor(xx * 1048576.0) AS BIGINT)) AS DOUBLE)
                    / 1048576.0 / count(*), 6) AS cv
       FROM x GROUP BY 1, 2),
cen AS (SELECT cell_id, list(cv ORDER BY dim) AS c FROM cm GROUP BY cell_id),
scored AS (SELECT e.vec_id, e.label, cen.cell_id, {_CCOS} AS csim FROM e, cen),
best AS (
  SELECT vec_id, label, cell_id FROM (
    SELECT vec_id, label, cell_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY csim DESC, cell_id ASC) AS rn
    FROM scored)
  WHERE rn = 1
)
SELECT CAST(label AS INTEGER) AS label,
       CAST(cell_id AS INTEGER) AS predicted,
       count(*) AS n
FROM best GROUP BY 1, 2
"""

ORACLE["incremental_dedup"] = """
WITH batch AS (
  SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 3 = 0
),
keeper AS (SELECT digest, min(doc_id) AS doc_id FROM batch GROUP BY digest),
seen AS (
  SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 3 != 0
)
SELECT k.doc_id, k.digest
FROM keeper k LEFT JOIN seen s ON s.digest = k.digest
WHERE s.digest IS NULL
"""

ORACLE["top_return_customers"] = """
SELECT c.c_custkey, c.c_name, c.c_acctbal,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS lost_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, c.c_custkey ASC
LIMIT 20
"""

# Sketch rebuilt from the same universal hash family ((a_d·h28+b_d)
# mod p mod width) over the same 28-bit md5 base — integer-exact in
# both engines, so estimates (and their overcounts) match bit-for-bit.
ORACLE["countmin_words"] = f"""
WITH words AS (SELECT unnest({_TOK}) AS word FROM documents),
hashed AS (
  SELECT word, CAST(CONCAT('0x', substring(md5(word), 1, 7)) AS BIGINT) AS h
  FROM words
),
counters AS (
  SELECT d, (({_A_SQL}[d + 1] * h + {_B_SQL}[d + 1]) % 2147483647) % 256 AS bucket,
         count(*) AS cnt
  FROM hashed, range(0, 4) t(d)
  GROUP BY 1, 2
),
truec AS (SELECT word, count(*) AS true_cnt FROM words GROUP BY word),
probes AS (
  SELECT word, true_cnt FROM truec ORDER BY true_cnt DESC, word ASC LIMIT 20
),
probe_cells AS (
  SELECT p.word, t.d,
         (({_A_SQL}[t.d + 1] * CAST(CONCAT('0x', substring(md5(p.word), 1, 7)) AS BIGINT)
           + {_B_SQL}[t.d + 1]) % 2147483647) % 256 AS bucket
  FROM probes p, range(0, 4) t(d)
)
SELECT p.word, p.true_cnt, CAST(min(c.cnt) AS BIGINT) AS estimate
FROM probes p
JOIN probe_cells pc ON pc.word = p.word
JOIN counters c ON c.d = pc.d AND c.bucket = pc.bucket
GROUP BY 1, 2
"""

ORACLE["event_transitions"] = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type
  FROM events
),
c AS (
  SELECT prev_type, event_type, count(*) AS cnt
  FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2
)
SELECT prev_type, event_type, cnt,
       round(cnt / sum(cnt) OVER (PARTITION BY prev_type), 6) AS prob
FROM c
"""

ORACLE["ngram_novelty"] = f"""
WITH sh AS ({_SHINGLES_3}),
dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle)
SELECT s.doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared_grams,
       round(1.0 - CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   / count(*), 6) AS novelty
FROM sh s JOIN dfc d ON d.shingle = s.shingle
GROUP BY s.doc_id
"""

ORACLE["shipping_priority"] = """
SELECT l.l_orderkey, o.o_orderdate,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-07-01'
  AND l.l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY 1, 2
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""

ORACLE["promo_revenue"] = """
SELECT
  CAST(round(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                      THEN CAST(l_extendedprice AS DECIMAL(18,6))
                           * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                      ELSE CAST(0 AS DECIMAL(18,6)) END), 6) AS DOUBLE) AS promo_revenue,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                 * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
       AS DOUBLE) AS total_revenue,
  round(100.0
        * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                        THEN CAST(l_extendedprice AS DECIMAL(18,6))
                             * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                   * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE),
        6) AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1998-03-01'
  AND l.l_shipdate < TIMESTAMP '1998-04-01'
"""

ORACLE["large_volume_orders"] = """
WITH q AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > CAST(250.0 AS DECIMAL(18,6))
)
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(round(q.q, 6) AS DOUBLE) AS total_qty
FROM q
JOIN orders o ON q.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
"""

ORACLE["part_bracket_revenue"] = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""

ORACLE["volume_shipping"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""

ORACLE["market_share"] = """
WITH base AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,6))
           * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6))) AS dp,
         (sn.n_name = 'NATION_3') AS is_target
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
  JOIN region r   ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  WHERE p.p_type = 'ECONOMY'
    AND r.r_name = 'ASIA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT CAST(o_year AS INTEGER) AS o_year,
       round(CAST(sum(CASE WHEN is_target THEN dp
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(dp) AS DOUBLE), 6) AS mkt_share,
       CAST(round(sum(dp), 6) AS DOUBLE) AS total_revenue
FROM base
GROUP BY o_year
"""

ORACLE["customer_distribution"] = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
"""

ORACLE["top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,6))
             * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(round(r.rev_dec, 6) AS DOUBLE) AS total_revenue
FROM rev r
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rev_dec = (SELECT max(rev_dec) FROM rev)
"""

ORACLE["small_quantity_revenue"] = """
WITH li AS (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#23'
), caps AS (
  SELECT l_partkey,
         round(CAST(0.2 AS DOUBLE) * CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS qty_cap
  FROM li GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0, 6)
       AS avg_yearly
FROM li l
JOIN caps c ON l.l_partkey = c.l_partkey
WHERE l.l_quantity < c.qty_cap
"""

ORACLE["target_encoding"] = """
WITH pc AS (
  SELECT o_orderpriority AS category, count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,6))) AS s
  FROM orders GROUP BY 1
), g AS (
  SELECT sum(CAST(o_totalprice AS DECIMAL(18,6))) AS gs, count(*) AS gn
  FROM orders
)
SELECT category, n,
       round(CAST(s AS DOUBLE) / n, 6) AS cat_mean,
       round((CAST(s AS DOUBLE)
              + CAST(10.0 AS DOUBLE) * (CAST(gs AS DOUBLE) / gn))
             / (CAST(n AS DOUBLE) + CAST(10.0 AS DOUBLE)), 6) AS encoded
FROM pc, g
"""

ORACLE["k_anonymity"] = """
SELECT c_mktsegment, c_nationkey, count(*) AS class_size,
       count(*) < 5 AS violates
FROM customer GROUP BY 1, 2
"""

ORACLE["temporal_split"] = """
WITH s AS (
  SELECT user_id,
         CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'train'
              WHEN ts < TIMESTAMP '2024-01-25' THEN 'val'
              ELSE 'test' END AS split
  FROM events
), tu AS (SELECT DISTINCT user_id FROM s WHERE split = 'train')
SELECT s.split, count(*) AS n_rows,
       count(DISTINCT s.user_id) AS n_users,
       count(DISTINCT CASE WHEN tu.user_id IS NOT NULL
                           THEN s.user_id END) AS n_overlap_users
FROM s LEFT JOIN tu ON s.user_id = tu.user_id
GROUP BY s.split
"""

ORACLE["filter_funnel"] = f"""
WITH f AS (
  SELECT len({_TOK}) AS n_tok,
         list_sum(list_transform({_TOK}, t -> len(t))) AS sum_len,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS upper_chars
  FROM documents
), fl AS (
  SELECT (n_tok >= 5) AS r1,
         (sum_len >= 2 * n_tok AND sum_len <= 12 * n_tok) AS r2,
         (10 * upper_chars <= 3 * n_chars) AS r3
  FROM f
), agg AS (
  SELECT count(*) AS n0,
         CAST(sum(CASE WHEN NOT r1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN r1 AND NOT r2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
         CAST(sum(CASE WHEN r1 AND r2 AND NOT r3 THEN 1 ELSE 0 END) AS BIGINT) AS f3
  FROM fl
)
SELECT CAST(1 AS INTEGER) AS stage, 'min_tokens' AS rule,
       n0 AS n_in, f1 AS n_rejected, n0 - f1 AS n_out FROM agg
UNION ALL
SELECT CAST(2 AS INTEGER), 'mean_token_len', n0 - f1, f2, n0 - f1 - f2 FROM agg
UNION ALL
SELECT CAST(3 AS INTEGER), 'uppercase_ratio', n0 - f1 - f2, f3,
       n0 - f1 - f2 - f3 FROM agg
"""

# the additive streaming funnel must land exactly on the batch funnel
ORACLE["streaming_quality_gate"] = ORACLE["filter_funnel"]

ORACLE["semantic_dedup"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cell_id, v AS c FROM e
        WHERE vec_id < GREATEST(8, (SELECT COUNT(*) FROM embeddings) // 256)),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cen.cell_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_CCOS} DESC, cen.cell_id ASC) AS rn
    FROM e, cen)
  WHERE rn = 1),
capped AS (
  SELECT * FROM assigned
  QUALIFY count(*) OVER (PARTITION BY cell) <= 4096),
dupes AS (
  SELECT DISTINCT b.cell, b.vec_id
  FROM capped a JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6)
        >= CAST(0.9 AS DOUBLE)),
pc AS (SELECT cell, count(*) AS n_vecs FROM capped GROUP BY cell),
dr AS (SELECT cell, count(*) AS n_dropped FROM dupes GROUP BY cell)
SELECT CAST(pc.cell AS INTEGER) AS cell, pc.n_vecs,
       CAST(COALESCE(dr.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(pc.n_vecs - COALESCE(dr.n_dropped, 0) AS BIGINT) AS n_kept
FROM pc LEFT JOIN dr ON pc.cell = dr.cell
"""

# mutual_knn_pairs: same cell CTEs as semantic_dedup, then each
# vector's within-cell cosine top-3 (rounded 6 dp before rank, id
# tiebreak) self-joined for mutuality, emitted id_a < id_b.
ORACLE["mutual_knn_pairs"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cell_id, v AS c FROM e
        WHERE vec_id < GREATEST(8, (SELECT COUNT(*) FROM embeddings) // 256)),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cen.cell_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {{_CCOS}} DESC, cen.cell_id ASC) AS rn
    FROM e, cen)
  WHERE rn = 1),
capped AS (
  SELECT * FROM assigned
  QUALIFY count(*) OVER (PARTITION BY cell) <= 4096),
nn AS (
  SELECT id_a, id_b, sim FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS sim,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) DESC,
                              b.vec_id ASC) AS rn
    FROM capped a JOIN capped b
      ON a.cell = b.cell AND a.vec_id != b.vec_id)
  WHERE rn <= 3)
SELECT n1.id_a, n1.id_b, n1.sim
FROM nn n1 JOIN nn n2 ON n1.id_a = n2.id_b AND n1.id_b = n2.id_a
WHERE n1.id_a < n1.id_b
"""
ORACLE["mutual_knn_pairs"] = ORACLE["mutual_knn_pairs"].replace(
    "{_CCOS}", _CCOS
)

ORACLE["revenue_rollup"] = """
SELECT COALESCE(n_name, '(all)') AS n_name,
       CAST(COALESCE(year(o.o_orderdate), -1) AS INTEGER) AS o_year,
       CAST(grouping(n_name, year(o.o_orderdate)) AS INTEGER) AS lvl,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP(n_name, year(o.o_orderdate))
"""

ORACLE["last_touch_attribution"] = """
WITH t AS (
  SELECT event_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
)
SELECT COALESCE(touch, '(none)') AS touch_type,
       count(*) AS n_conversions
FROM t WHERE event_type = 'purchase'
GROUP BY 1
"""

# canonical-by-quality: CTE-reuses BOTH the clustering oracle and the
# quality oracle verbatim, so the composition can never drift from its
# parts
ORACLE["cluster_canonical"] = f"""
WITH clusters AS (
{ORACLE["dedup_clusters"]}
), q AS (
{ORACLE["quality_score"]}
)
SELECT cluster_id, keep_doc_id, keep_quality, cluster_size FROM (
  SELECT c.canonical_id AS cluster_id, c.doc_id AS keep_doc_id,
         q.quality AS keep_quality, c.cluster_size,
         row_number() OVER (PARTITION BY c.canonical_id
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn
  FROM clusters c JOIN q ON c.doc_id = q.doc_id)
WHERE rn = 1
"""

ORACLE["interpolate_gaps"] = """
WITH hourly AS (
  SELECT event_type AS grp, date_trunc('hour', ts) AS h,
         CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
), cal AS (
  SELECT grp, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM (SELECT grp, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY grp)
), dense AS (
  SELECT c.grp, c.h, hv.v
  FROM cal c LEFT JOIN hourly hv ON c.grp = hv.grp AND c.h = hv.h
), nb AS (
  SELECT grp, h, v,
    CAST(epoch(h) / 3600 AS BIGINT) AS hr,
    last_value(v IGNORE NULLS) OVER w_back AS prev_v,
    last_value(CASE WHEN v IS NOT NULL
                    THEN CAST(epoch(h) / 3600 AS BIGINT) END IGNORE NULLS)
      OVER w_back AS prev_h,
    first_value(v IGNORE NULLS) OVER w_fwd AS next_v,
    first_value(CASE WHEN v IS NOT NULL
                     THEN CAST(epoch(h) / 3600 AS BIGINT) END IGNORE NULLS)
      OVER w_fwd AS next_h
  FROM dense
  WINDOW
    w_back AS (PARTITION BY grp ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY grp ORDER BY h
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT grp AS event_type, strftime(h, '%Y-%m-%d %H:00:00') AS hour_ts,
       CASE WHEN v IS NOT NULL THEN v
            WHEN prev_v IS NULL THEN next_v
            WHEN next_v IS NULL THEN prev_v
            ELSE round(prev_v + (next_v - prev_v) * (hr - prev_h)
                       / (next_h - prev_h), 6) END AS value,
       (v IS NULL) AS filled
FROM nb
"""

_KCOS = (
    "round(list_dot_product(q.qv, e.v) / "
    "(sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))), 6)"
)
ORACLE["knn_label_accuracy"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label
      FROM e WHERE vec_id < 50),
scored AS (
  SELECT q.query_id, q.true_label, e.vec_id AS neighbor_id,
         e.label AS pred_label, {_KCOS} AS sim
  FROM q JOIN e ON e.vec_id <> q.query_id),
top1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored)
  WHERE rn = 1)
SELECT true_label AS label, count(*) AS n_queries,
       CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       round(CAST(sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS accuracy
FROM top1 GROUP BY 1
"""

ORACLE["span_corruption"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
f AS (
  SELECT doc_id, len(ts) AS n_tokens,
         list_transform(range(0, len(ts)), i ->
           (CAST(CONCAT('0x', substring(md5(doc_id::VARCHAR || ':' || i::VARCHAR), 1, 7))
                 AS BIGINT) % 100) < 15) AS fl
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(list_filter(fl, x -> x)) AS BIGINT) AS n_masked,
       CAST(COALESCE(list_sum(list_transform(range(1, len(fl) + 1), j ->
              CASE WHEN fl[j] AND (j = 1 OR NOT fl[j - 1])
                   THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_spans
FROM f
"""

ORACLE["phrase_search"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
pos AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
                        i -> {{'p': i, 'term': ts[i]}})) AS u
  FROM t),
p1 AS (SELECT doc_id, u.p AS p1 FROM pos WHERE u.term = 'spark'),
p2 AS (SELECT doc_id, u.p AS p2 FROM pos WHERE u.term = 'table')
SELECT p1.doc_id, count(*) AS n_matches
FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id AND p2.p2 = p1.p1 + 1
GROUP BY 1
"""

ORACLE["session_paths"] = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
), r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, sid
                               ORDER BY ts, event_id) AS rn
  FROM g
), paths AS (
  SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 3 GROUP BY 1, 2
)
SELECT path, count(*) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""

ORACLE["embedding_covariance"] = """
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
fl AS (
  SELECT v, flatten(list_transform(v, x -> list_transform(v, y -> x * y))) AS f
  FROM e
), flat AS (
  -- summands quantized to the 2^-20 grid as exact BIGINTs, mirroring
  -- the Spark operator: integer sums are order-independent, so the
  -- hash cannot flip on a 1e-6 rounding boundary (round-9 flake)
  SELECT (p.k - 1) // 64 AS i, (p.k - 1) % 64 AS j,
         CAST(floor(p.xy * 1048576.0) AS BIGINT) AS qxy,
         CAST(floor(v[((p.k - 1) // 64) + 1] * 1048576.0) AS BIGINT) AS qxi
  FROM (
    SELECT v, unnest(list_transform(range(1, len(f) + 1),
                     k -> {'k': k, 'xy': f[k]})) AS p
    FROM fl)
), agg AS (
  SELECT i, j, count(*) AS n,
         CAST(sum(qxy) AS BIGINT) AS sxy,
         CAST(sum(qxi) AS BIGINT) AS sxi
  FROM flat GROUP BY i, j
), m AS (
  SELECT (u.k - 1) AS j,
         CAST(sum(CAST(floor(u.xj * 1048576.0) AS BIGINT)) AS BIGINT) AS sxj
  FROM (
    SELECT unnest(list_transform(range(1, len(v) + 1),
                  k -> {'k': k, 'xj': v[k]})) AS u
    FROM e)
  GROUP BY 1
)
SELECT CAST(a.i AS INTEGER) AS i, CAST(a.j AS INTEGER) AS j,
       -- + 0.0 normalizes the sign of zero: DuckDB's multiply-based
       -- round() emits -0.0 for tiny-negative covariances while
       -- Spark's BigDecimal HALF_UP emits +0.0, and the driver's
       -- value hash covers the sign bit (round-10 driver red).
       -- IEEE round-to-nearest: -0.0 + 0.0 = +0.0.
       round(CAST(a.sxy AS DOUBLE) / 1048576.0 / a.n
             - (CAST(a.sxi AS DOUBLE) / 1048576.0 / a.n)
             * (CAST(m.sxj AS DOUBLE) / 1048576.0 / a.n), 6) + 0.0 AS cov
FROM agg a JOIN m ON a.j = m.j
"""

ORACLE["embedding_pca"] = _build_pca_oracle(n_iter=8)

ORACLE["ab_test_zscore"] = """
WITH pu AS (
  SELECT user_id, (user_id % 2 = 1) AS is_b,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
), agg AS (
  SELECT CAST(sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN NOT is_b THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
         CAST(sum(CASE WHEN is_b THEN converted ELSE 0 END) AS BIGINT) AS conv_b
  FROM pu
)
SELECT n_a, n_b, conv_a, conv_b,
       round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
       round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
       CASE WHEN (CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                 * (1.0 / n_a + 1.0 / n_b) > 0
            THEN round((CAST(conv_b AS DOUBLE) / n_b - CAST(conv_a AS DOUBLE) / n_a)
                       / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                              * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b)), 6)
       END AS zscore
FROM agg
"""

ORACLE["order_gap_stats"] = """
WITH g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM orders
)
SELECT c.c_mktsegment, count(*) AS n_gaps,
       round(CAST(sum(gap_days) AS DOUBLE) / count(*), 6) AS avg_gap_days,
       round(quantile_cont(gap_days, 0.5), 6) AS median_gap_days
FROM g JOIN customer c ON g.o_custkey = c.c_custkey
WHERE gap_days IS NOT NULL
GROUP BY 1
"""

# the stage plants exactly 2 extra lines: one type-corrupt, one
# parse-clean but id-less — so the report is derivable from the
# canonical table
ORACLE["csv_malformed_report"] = """
SELECT CAST(count(*) + 2 AS BIGINT) AS n_rows,
       CAST(1 AS BIGINT) AS n_corrupt,
       CAST(1 AS BIGINT) AS n_null_id,
       CAST(count(*) AS BIGINT) AS n_valid
FROM documents
"""

ORACLE["user_purge_report"] = """
SELECT CAST(count(DISTINCT CASE WHEN user_id % 5 = 0 THEN user_id END) AS BIGINT)
         AS n_purge_users,
       CAST(sum(CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_events_removed,
       CAST(sum(CASE WHEN user_id % 5 = 0 THEN 0 ELSE 1 END) AS BIGINT)
         AS n_events_kept
FROM events
"""

ORACLE["prefix_search"] = f"""
SELECT doc_id, count(DISTINCT t) AS n_terms, count(*) AS n_occurrences
FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
WHERE t LIKE 'sp%'
GROUP BY doc_id
"""

_DP_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,6)) "
    "* (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))"
)
ORACLE["nation_trade_balance"] = f"""
WITH exp AS (
  SELECT n.n_name, sum({_DP_SQL}) AS e
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
), imp AS (
  SELECT n.n_name, sum({_DP_SQL}) AS i
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT COALESCE(exp.n_name, imp.n_name) AS n_name,
       CAST(round(COALESCE(e, CAST(0 AS DECIMAL(18,6))), 6) AS DOUBLE) AS exports,
       CAST(round(COALESCE(i, CAST(0 AS DECIMAL(18,6))), 6) AS DOUBLE) AS imports,
       CAST(round(COALESCE(e, CAST(0 AS DECIMAL(18,6)))
                  - COALESCE(i, CAST(0 AS DECIMAL(18,6))), 6) AS DOUBLE) AS balance
FROM exp FULL OUTER JOIN imp ON exp.n_name = imp.n_name
"""

ORACLE["discount_effectiveness"] = f"""
SELECT round(l_discount, 2) AS discount,
       count(*) AS n_items,
       round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS avg_qty,
       CAST(round(sum({_DP_SQL}), 6) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY 1
"""

ORACLE["hourly_top_movers"] = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS cnt
  FROM events GROUP BY 1, 2
), moved AS (
  SELECT event_type, h, cnt,
         lag(cnt) OVER (PARTITION BY event_type ORDER BY h) AS prev_cnt
  FROM hourly
)
SELECT event_type, strftime(h, '%Y-%m-%d %H:00:00') AS hour_ts,
       cnt, prev_cnt, cnt - prev_cnt AS delta
FROM moved WHERE prev_cnt IS NOT NULL
ORDER BY abs(cnt - prev_cnt) DESC, event_type ASC, h ASC
LIMIT 10
"""

ORACLE["basket_lift"] = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), g AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
), b AS (
  SELECT DISTINCT user_id, sid, event_type FROM g
), tot AS (
  SELECT count(*) AS n_sessions
  FROM (SELECT DISTINCT user_id, sid FROM b)
), marg AS (
  SELECT event_type AS t, count(*) AS n_t FROM b GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, c.event_type AS type_b, count(*) AS n_both
  FROM b a JOIN b c
    ON a.user_id = c.user_id AND a.sid = c.sid
   AND a.event_type < c.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_both,
       round(CAST(n_both AS DOUBLE) * tot.n_sessions
             / (ma.n_t * mb.n_t), 6) AS lift
FROM pairs
JOIN marg ma ON ma.t = type_a
JOIN marg mb ON mb.t = type_b
CROSS JOIN tot
"""

ORACLE["filter_funnel_examples"] = f"""
WITH f AS (
  SELECT doc_id, len({_TOK}) AS n_tok,
         list_sum(list_transform({_TOK}, t -> len(t))) AS sum_len,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS upper_chars
  FROM documents
), d AS (
  SELECT doc_id,
         CASE WHEN NOT (n_tok >= 5) THEN 1
              WHEN NOT (sum_len >= 2 * n_tok AND sum_len <= 12 * n_tok) THEN 2
              WHEN NOT (10 * upper_chars <= 3 * n_chars) THEN 3 END AS stage
  FROM f
), dead AS (SELECT doc_id, stage FROM d WHERE stage IS NOT NULL),
ex AS (
  SELECT stage, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS example_ids
  FROM (SELECT *, row_number() OVER (PARTITION BY stage ORDER BY doc_id) AS rn
        FROM dead)
  WHERE rn <= 3 GROUP BY stage
), cnt AS (SELECT stage, count(*) AS n_rejected FROM dead GROUP BY stage)
SELECT CAST(cnt.stage AS INTEGER) AS stage,
       CASE cnt.stage WHEN 1 THEN 'min_tokens'
                      WHEN 2 THEN 'mean_token_len'
                      ELSE 'uppercase_ratio' END AS rule,
       cnt.n_rejected, ex.example_ids
FROM cnt JOIN ex ON cnt.stage = ex.stage
"""

ORACLE["quantization_error"] = """
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
flat AS (
  SELECT vec_id, CAST(g.i AS INTEGER) AS pos,
         v[CAST(g.i AS INTEGER) + 1] AS x
  FROM e, generate_series(0, 63) g(i)
),
dims AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM flat GROUP BY pos),
b AS (SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM dims),
dq AS (
  SELECT e.label,
         e.v,
         list_transform(range(1, 65), i ->
           CASE WHEN b.mxs[i] = b.mns[i] THEN b.mns[i]
                ELSE b.mns[i]
                     + floor((e.v[i] - b.mns[i]) / (b.mxs[i] - b.mns[i]) * 255
                             + 0.5)
                       / CAST(255 AS DOUBLE) * (b.mxs[i] - b.mns[i]) END) AS d
  FROM e, b
),
cosr AS (
  SELECT label,
         round(list_dot_product(v, d)
               / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(d, d))),
               6) AS cos
  FROM dq
)
SELECT label, count(*) AS n_vecs,
       round(avg(cos), 6) AS mean_cos, min(cos) AS min_cos
FROM cosr GROUP BY label
"""

ORACLE["sentence_dedup_stats"] = """
WITH inst AS (
  SELECT doc_id, source, s.sent
  FROM (
    SELECT doc_id, source,
           unnest(list_filter(list_transform(string_split_regex(text, '[.!?]+'),
                                             x -> trim(x)),
                              x -> len(x) > 0)) AS sent
    FROM documents) s(doc_id, source, sent)
), dfreq AS (
  SELECT sent, count(*) AS n_docs
  FROM (SELECT DISTINCT doc_id, sent FROM inst)
  GROUP BY sent
)
SELECT i.source, count(*) AS n_instances,
       CAST(sum(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_instances,
       round(CAST(sum(CASE WHEN d.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS dup_ratio
FROM inst i JOIN dfreq d USING (sent)
GROUP BY i.source
"""

ORACLE["vocab_coverage"] = f"""
WITH wc AS (
  SELECT t AS term, count(*) AS cnt
  FROM (SELECT unnest({_TOK}) AS t FROM documents) GROUP BY t
), tot AS (SELECT sum(cnt) AS total_tokens FROM wc),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rn FROM wc
)
SELECT k, covered_tokens, CAST(tot.total_tokens AS BIGINT) AS total_tokens,
       round(CAST(covered_tokens AS DOUBLE) / tot.total_tokens, 6) AS coverage
FROM (
  SELECT 100 AS k, CAST(sum(cnt) AS BIGINT) AS covered_tokens
  FROM ranked WHERE rn <= 100
  UNION ALL
  SELECT 1000, CAST(sum(cnt) AS BIGINT) FROM ranked WHERE rn <= 1000
  UNION ALL
  SELECT 10000, CAST(sum(cnt) AS BIGINT) FROM ranked WHERE rn <= 10000
) c CROSS JOIN tot
"""

ORACLE["idf_drift"] = f"""
WITH pairs AS (
  SELECT DISTINCT (doc_id % 2 = 0) AS is_a, doc_id, t AS term
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
), halves AS (
  SELECT term,
         CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS df_a,
         CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS df_b
  FROM pairs GROUP BY term
), tot AS (
  SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM documents
)
SELECT term, df_a, df_b,
       round(ln(CAST(n_a AS DOUBLE) / df_a) - ln(CAST(n_b AS DOUBLE) / df_b), 6)
         AS delta
FROM halves CROSS JOIN tot
WHERE (df_a >= 5 OR df_b >= 5) AND df_a > 0 AND df_b > 0
ORDER BY abs(round(ln(CAST(n_a AS DOUBLE) / df_a)
                   - ln(CAST(n_b AS DOUBLE) / df_b), 6)) DESC, term ASC
LIMIT 20
"""

ORACLE["activity_heatmap"] = """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hour,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""

ORACLE["rfm_segments"] = """
WITH pc AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), TIMESTAMP '2001-12-31')
           AS recency_days,
         count(*) AS frequency,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS monetary
  FROM orders GROUP BY 1
), b AS (
  SELECT quantile_cont(recency_days, [1.0/3, 2.0/3]) AS rb,
         quantile_cont(frequency,    [1.0/3, 2.0/3]) AS fb,
         quantile_cont(monetary,     [1.0/3, 2.0/3]) AS mb
  FROM pc
)
SELECT CAST(len(list_filter(b.rb, s -> pc.recency_days > s)) + 1 AS INTEGER)
         AS r_bucket,
       CAST(len(list_filter(b.fb, s -> pc.frequency > s)) + 1 AS INTEGER)
         AS f_bucket,
       CAST(len(list_filter(b.mb, s -> pc.monetary > s)) + 1 AS INTEGER)
         AS m_bucket,
       count(*) AS n_customers
FROM pc CROSS JOIN b
GROUP BY 1, 2, 3
"""

ORACLE["transition_latency"] = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER w AS prev_type,
         (epoch_us(ts) - epoch_us(lag(ts) OVER w))
           / CAST(1000000 AS DOUBLE) AS delta_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT prev_type AS from_type, event_type AS to_type, count(*) AS n,
       round(quantile_cont(delta_s, 0.5), 6) AS median_seconds,
       round(avg(delta_s), 6) AS avg_seconds
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""

ORACLE["linear_attribution"] = """
WITH c AS (
  SELECT event_type,
         COALESCE(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    OVER wp, 0) AS ck,
         COALESCE(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    OVER wp, 0) AS cv
  FROM events
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), conv AS (SELECT ck, cv FROM c WHERE event_type = 'purchase'),
credits AS (
  SELECT 'click' AS touch_type,
         CASE WHEN ck + cv > 0 THEN CAST(ck AS DOUBLE) / (ck + cv)
              ELSE CAST(0 AS DOUBLE) END AS credit
  FROM conv
  UNION ALL
  SELECT 'view',
         CASE WHEN ck + cv > 0 THEN CAST(cv AS DOUBLE) / (ck + cv)
              ELSE CAST(0 AS DOUBLE) END
  FROM conv
  UNION ALL
  SELECT '(none)',
         CASE WHEN ck + cv = 0 THEN CAST(1 AS DOUBLE)
              ELSE CAST(0 AS DOUBLE) END
  FROM conv
)
SELECT touch_type, round(sum(credit), 6) AS total_credit,
       CAST(sum(CASE WHEN credit > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_conversions
FROM credits GROUP BY 1
HAVING round(sum(credit), 6) > 0
"""

# three manifest-tracked ingest calls over two file batches must land
# exactly on the one-shot aggregation — no skips, no double-ingest
ORACLE["manifest_ingest"] = """
SELECT event_type, count(*) AS n FROM events GROUP BY 1
"""

ORACLE["index_shard_balance"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cen AS (SELECT vec_id AS cell_id, v AS c FROM e WHERE vec_id < 8),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cen.cell_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {_CCOS} DESC, cen.cell_id ASC) AS rn
    FROM e, cen)
  WHERE rn = 1),
cells AS (SELECT cell, count(*) AS n FROM assigned GROUP BY cell)
SELECT count(*) AS n_cells,
       CAST(max(n) AS BIGINT) AS max_cell,
       CAST(min(n) AS BIGINT) AS min_cell,
       round(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)), 6) AS balance_ratio
FROM cells
"""

ORACLE["rolling_weekly_revenue"] = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS day_revenue
  FROM orders GROUP BY 1
), keyed AS (
  SELECT d, day_revenue,
         date_diff('day', TIMESTAMP '1970-01-01', d) AS day_no
  FROM daily
)
SELECT strftime(d, '%Y-%m-%d') AS order_day, day_revenue,
       round(sum(day_revenue) OVER (ORDER BY day_no
                                    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
             6) AS week_revenue
FROM keyed
"""

ORACLE["yoy_growth"] = """
WITH monthly AS (
  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
         date_trunc('month', o_orderdate) AS m0,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1, 2
), prev AS (
  SELECT strftime(m0 + INTERVAL 12 MONTH, '%Y-%m') AS month,
         revenue AS prev_year_revenue
  FROM monthly
)
SELECT m.month, m.revenue, p.prev_year_revenue,
       CASE WHEN p.prev_year_revenue > 0
            THEN round((m.revenue - p.prev_year_revenue)
                       / p.prev_year_revenue * 100, 6) END AS yoy_pct
FROM monthly m LEFT OUTER JOIN prev p ON m.month = p.month
"""

ORACLE["char_entropy"] = """
WITH chars AS (
  SELECT doc_id, source, c.ch, count(*) AS cnt
  FROM (
    SELECT doc_id, source,
           unnest(list_filter(string_split_regex(text, ''), x -> len(x) > 0))
             AS ch
    FROM documents) c(doc_id, source, ch)
  GROUP BY 1, 2, 3
), tot AS (SELECT doc_id, sum(cnt) AS tot FROM chars GROUP BY 1),
per_doc AS (
  SELECT c.doc_id, c.source,
         round(-sum((CAST(c.cnt AS DOUBLE) / t.tot)
                    * log2(CAST(c.cnt AS DOUBLE) / t.tot)), 6) AS entropy
  FROM chars c JOIN tot t USING (doc_id)
  GROUP BY 1, 2
)
SELECT source, count(*) AS n_docs,
       round(avg(entropy), 6) AS avg_entropy,
       min(entropy) AS min_entropy
FROM per_doc GROUP BY 1
"""

# confusion of the heuristic against ground truth: CTE-reuses the
# language_id oracle verbatim
ORACLE["language_id_accuracy"] = f"""
WITH l AS (
{ORACLE["language_id"]}
), cm AS (
  SELECT d.lang AS true_lang, l.pred_lang, count(*) AS n
  FROM documents d JOIN l USING (doc_id)
  GROUP BY 1, 2
), pt AS (SELECT true_lang, sum(n) AS n_true FROM cm GROUP BY 1)
SELECT cm.true_lang, cm.pred_lang, CAST(cm.n AS BIGINT) AS n,
       round(CAST(cm.n AS DOUBLE) / pt.n_true, 6) AS pct_of_true
FROM cm JOIN pt USING (true_lang)
"""

ORACLE["lines_per_order_histogram"] = """
WITH po AS (
  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1
)
SELECT n_lines, count(*) AS n_orders FROM po GROUP BY 1
"""

# semantically independent, like graph_components' own oracle: each
# nation's members form exactly one component by construction
ORACLE["component_size_histogram"] = """
WITH sizes AS (
  SELECT count(*) AS component_size FROM customer GROUP BY c_nationkey
)
SELECT component_size, count(*) AS n_components
FROM sizes GROUP BY 1
"""

ORACLE["interarrival_rates"] = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - epoch_us(lag(ts) OVER w))
           / CAST(1000000 AS DOUBLE) AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT event_type, count(*) AS n_gaps,
       round(avg(gap_s), 6) AS mean_gap_s,
       round(CAST(3600 AS DOUBLE) / avg(gap_s), 6) AS rate_per_hour
FROM g WHERE gap_s IS NOT NULL
GROUP BY 1
"""

ORACLE["customer_growth_topk"] = """
WITH a AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS spend_1996
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
), b AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS spend_1997
  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
)
SELECT a.o_custkey AS c_custkey, a.spend_1996, b.spend_1997,
       round((b.spend_1997 - a.spend_1996) / a.spend_1996 * 100, 6)
         AS growth_pct
FROM a JOIN b USING (o_custkey)
WHERE a.spend_1996 > 0
ORDER BY growth_pct DESC, c_custkey ASC
LIMIT 15
"""

ORACLE["order_size_correlation"] = """
WITH po AS (
  SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1
)
SELECT count(*) AS n_orders,
       round(corr(CAST(po.n_lines AS DOUBLE), o.o_totalprice), 6) AS pearson_r
FROM po JOIN orders o ON po.l_orderkey = o.o_orderkey
"""

ORACLE["region_nation_share"] = """
WITH rev AS (
  SELECT n.n_name, r.r_name,
         CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                        * (CAST(1 AS DECIMAL(8,6))
                           - CAST(l_discount AS DECIMAL(8,6)))), 6)
              AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name, revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY r_name), 6)
         AS share_of_region,
       round(sum(revenue) OVER (PARTITION BY r_name)
             / sum(revenue) OVER (), 6) AS region_share_of_world
FROM rev
"""

ORACLE["nn_similarity_histogram"] = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 50),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_KCOS} AS sim
  FROM q JOIN e ON e.vec_id <> q.query_id),
top1 AS (
  SELECT sim FROM (
    SELECT sim, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored)
  WHERE rn = 1)
SELECT round(floor(sim / CAST(0.05 AS DOUBLE)) * CAST(0.05 AS DOUBLE), 2)
         AS sim_bin_lo,
       count(*) AS n
FROM top1 GROUP BY 1
"""

# 16 -> 2 files by construction; rows must match the canonical table
ORACLE["compact_small_files"] = """
SELECT CAST(16 AS INTEGER) AS files_before,
       CAST(2 AS INTEGER) AS files_after,
       count(*) AS n_rows
FROM events
"""

ORACLE["winsorize_values"] = """
WITH v AS (SELECT CAST(value AS DOUBLE) AS v FROM events),
b AS (
  SELECT round(quantile_cont(v, 0.05), 6) AS lo,
         round(quantile_cont(v, 0.95), 6) AS hi
  FROM v
)
SELECT count(*) AS n,
       CAST(sum(CASE WHEN v.v < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_lo,
       CAST(sum(CASE WHEN v.v > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_hi,
       round(avg(v.v), 6) AS mean_raw,
       round(avg(CASE WHEN v.v < b.lo THEN b.lo
                      WHEN v.v > b.hi THEN b.hi
                      ELSE v.v END), 6) AS mean_winsorized
FROM v CROSS JOIN b
"""

ORACLE["point_in_time_state"] = """
WITH chg AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS pt,
         event_id
  FROM events WHERE event_type <> 'purchase'
), versions AS (
  SELECT user_id, event_type, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to
  FROM chg WHERE pt IS NULL OR pt <> event_type
), p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT p.ts, v.event_type AS state, v.valid_from
  FROM p LEFT JOIN versions v
    ON p.user_id = v.user_id
   AND v.valid_from <= p.ts
   AND (v.valid_to IS NULL OR p.ts < v.valid_to)
)
SELECT COALESCE(state, '(none)') AS state, count(*) AS n_purchases,
       round(avg((epoch_us(ts) - epoch_us(valid_from))
                 / CAST(1000000 AS DOUBLE)), 6) AS avg_staleness_s
FROM m GROUP BY 1
"""

ORACLE["hash_collision_report"] = f"""
WITH v AS (
  SELECT DISTINCT t AS term
  FROM (SELECT unnest({_TOK}) AS t FROM documents)
), pb AS (
  SELECT {_h60_sql("term")} % 1024 AS bucket,
         count(*) AS n_terms_in_bucket
  FROM v GROUP BY 1
)
SELECT n_terms_in_bucket, count(*) AS n_buckets FROM pb GROUP BY 1
"""

ORACLE["numeric_percentiles_profile"] = """
SELECT c.column, c.p, c.value FROM (
  SELECT 'l_quantity' AS column, CAST(0.25 AS DOUBLE) AS p,
         round(quantile_cont(l_quantity, 0.25), 6) AS value FROM lineitem
  UNION ALL SELECT 'l_quantity', CAST(0.5 AS DOUBLE),
         round(quantile_cont(l_quantity, 0.5), 6) FROM lineitem
  UNION ALL SELECT 'l_quantity', CAST(0.75 AS DOUBLE),
         round(quantile_cont(l_quantity, 0.75), 6) FROM lineitem
  UNION ALL SELECT 'l_quantity', CAST(0.95 AS DOUBLE),
         round(quantile_cont(l_quantity, 0.95), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', CAST(0.25 AS DOUBLE),
         round(quantile_cont(l_extendedprice, 0.25), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', CAST(0.5 AS DOUBLE),
         round(quantile_cont(l_extendedprice, 0.5), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', CAST(0.75 AS DOUBLE),
         round(quantile_cont(l_extendedprice, 0.75), 6) FROM lineitem
  UNION ALL SELECT 'l_extendedprice', CAST(0.95 AS DOUBLE),
         round(quantile_cont(l_extendedprice, 0.95), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', CAST(0.25 AS DOUBLE),
         round(quantile_cont(l_discount, 0.25), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', CAST(0.5 AS DOUBLE),
         round(quantile_cont(l_discount, 0.5), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', CAST(0.75 AS DOUBLE),
         round(quantile_cont(l_discount, 0.75), 6) FROM lineitem
  UNION ALL SELECT 'l_discount', CAST(0.95 AS DOUBLE),
         round(quantile_cont(l_discount, 0.95), 6) FROM lineitem
) c
"""

ORACLE["slo_burn_rate"] = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*) AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
  FROM events GROUP BY 1
), r AS (
  SELECT h,
         round(CAST(err AS DOUBLE) / n, 6) AS err_rate_1h,
         round(CAST(sum(err) OVER w6 AS DOUBLE) / sum(n) OVER w6, 6)
           AS err_rate_6h
  FROM hourly
  WINDOW w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
)
SELECT strftime(h, '%Y-%m-%d %H:00:00') AS hour_ts, err_rate_1h, err_rate_6h,
       CASE WHEN err_rate_6h > 0
            THEN round(err_rate_1h / err_rate_6h, 6) END AS burn_rate
FROM r
"""

ORACLE["prospective_customers"] = """
WITH ab AS (
  SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / count(*), 6) AS ab
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, count(*) AS n_cust,
       CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 6) AS DOUBLE)
         AS total_acctbal
FROM customer c CROSS JOIN ab
WHERE c.c_acctbal > ab.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""

ORACLE["vocab_overlap_matrix"] = f"""
WITH v AS (
  SELECT DISTINCT source, t AS term
  FROM (SELECT source, unnest({_TOK}) AS t FROM documents)
), sz AS (SELECT source, count(*) AS vocab FROM v GROUP BY 1),
sh AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
  FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, sa.vocab AS vocab_a, sb.vocab AS vocab_b, shared,
       round(CAST(shared AS DOUBLE)
             / (sa.vocab + sb.vocab - shared), 6) AS jaccard
FROM sh
JOIN sz sa ON sa.source = source_a
JOIN sz sb ON sb.source = source_b
"""

ORACLE["conversion_by_activity"] = """
WITH pu AS (
  SELECT user_id, count(*) AS n_events,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), b AS (
  SELECT quantile_cont(n_events, [1.0/3, 2.0/3]) AS bs FROM pu
)
SELECT CAST(len(list_filter(b.bs, s -> pu.n_events > s)) + 1 AS INTEGER)
         AS bucket,
       count(*) AS n_users,
       CAST(sum(conv) AS BIGINT) AS n_converted,
       round(CAST(sum(conv) AS DOUBLE) / count(*), 6) AS conv_rate
FROM pu CROSS JOIN b
GROUP BY 1
"""

# reuses the dedup_apply composition verbatim for the keeper set
ORACLE["dedup_savings"] = f"""
WITH clusters AS (
{ORACLE["dedup_clusters"]}
), raw AS (
  SELECT CAST(sum(len({_TOK})) AS BIGINT) AS raw_tokens FROM documents
), kept AS (
  SELECT CAST(sum(len({_TOK})) AS BIGINT) AS dedup_tokens
  FROM documents d
  WHERE d.doc_id NOT IN
    (SELECT doc_id FROM clusters WHERE doc_id <> canonical_id)
)
SELECT raw_tokens, dedup_tokens,
       round(CAST(raw_tokens - dedup_tokens AS DOUBLE)
             / raw_tokens * 100, 6) AS savings_pct
FROM raw CROSS JOIN kept
"""

ORACLE["pareto_report"] = """
WITH pc AS (
  SELECT o_custkey,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 6) AS DOUBLE)
           AS spend
  FROM orders GROUP BY 1
), p AS (SELECT round(quantile_cont(spend, 0.8), 6) AS p80 FROM pc)
SELECT count(*) AS n_customers,
       round(sum(CASE WHEN pc.spend > p.p80 THEN pc.spend ELSE 0.0 END)
             / sum(pc.spend), 6) AS top_quintile_share
FROM pc CROSS JOIN p
"""

# correlates raw length with the SAME quality formula the quality
# oracle computes — CTE-reused verbatim
ORACLE["quality_length_correlation"] = f"""
WITH q AS (
{ORACLE["quality_score"]}
)
SELECT count(*) AS n_docs,
       round(corr(CAST(d.n_chars AS DOUBLE), q.quality), 6) AS pearson_r
FROM documents d JOIN q USING (doc_id)
"""

ORACLE["length_histogram"] = """
SELECT CAST(CASE WHEN n_chars > 0 THEN length(bin(n_chars)) - 1
            ELSE -1 END AS INTEGER) AS log2_bucket,
       count(*) AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY 1
"""

ORACLE["zipf_fit"] = f"""
WITH wc AS (
  SELECT t AS word, count(*) AS cnt
  FROM (SELECT unnest({_TOK}) AS t FROM documents) GROUP BY t
), r AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, word) AS rank FROM wc
)
SELECT round(regr_slope(ln(cnt), ln(rank)), 6) AS zipf_slope,
       round(regr_intercept(ln(cnt), ln(rank)), 6) AS zipf_intercept,
       count(*) AS vocab
FROM r
"""

ORACLE["robust_outliers"] = """
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, round(quantile_cont(adev, 0.5), 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT event_id, d.event_type, round(value, 6) AS value, med, mad,
       CASE WHEN mad > 0
            THEN round(0.6745 * (value - med) / mad, 6) END AS robust_z,
       (mad > 0 AND abs(round(0.6745 * (value - med) / mad, 6)) >= 3.5)
         AS is_outlier
FROM dev d JOIN mad USING (event_type)
"""

ORACLE["brand_nation_revenue"] = """
SELECT n_name, p_brand,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))), 6)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY n_name, p_brand
"""

ORACLE["late_orders_by_priority"] = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND CAST(l.l_shipdate AS DATE)
                    > CAST(o.o_orderdate AS DATE) + 60)
GROUP BY 1
"""

ORACLE["minhash_calibration"] = f"""
WITH mh AS ({_MINHASH_FLAT}),
bands AS (
  SELECT doc_id, i // 4 AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bsig
  FROM mh GROUP BY doc_id, i // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
agree AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS ag
  FROM cand c
  JOIN mh x ON x.doc_id = c.doc_a
  JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i
  GROUP BY c.doc_a, c.doc_b
),
est AS (
  SELECT doc_a, doc_b, CAST(ag AS DOUBLE) / {NUM_MINHASHES} AS est_sim
  FROM agree WHERE CAST(ag AS DOUBLE) / {NUM_MINHASHES} >= 0.3
),
sh AS ({_SHINGLES_3}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_a, i.doc_b,
         CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS j
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT e.doc_a, e.doc_b, e.est_sim,
       round(j, 6) AS true_jaccard,
       round(abs(e.est_sim - j), 6) AS abs_err
FROM est e JOIN jac USING (doc_a, doc_b)
"""

ORACLE["containment_pairs"] = f"""
WITH sh AS ({_SHINGLES_3}),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS container_id, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_id, container_id,
       round(CAST(inter AS DOUBLE) / sz, 6) AS containment
FROM inter i JOIN sizes s ON s.doc_id = i.doc_id
WHERE round(CAST(inter AS DOUBLE) / sz, 6) >= 0.8
"""

ORACLE["source_overlap"] = f"""
WITH sh AS (
  SELECT DISTINCT d.source AS src, s.shingle
  FROM ({_SHINGLES_3}) s JOIN documents d ON d.doc_id = s.doc_id
), sizes AS (SELECT src, count(*) AS sz FROM sh GROUP BY src),
inter AS (
  SELECT a.src AS source_a, b.src AS source_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT source_a, source_b, inter,
       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.src = source_a
JOIN sizes sb ON sb.src = source_b
"""

ORACLE["verified_near_dupes"] = f"""
WITH mh AS ({_MINHASH_FLAT}),
bands AS (
  SELECT doc_id, i // 4 AS band,
         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bsig
  FROM mh GROUP BY doc_id, i // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
agree AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS ag
  FROM cand c
  JOIN mh x ON x.doc_id = c.doc_a
  JOIN mh y ON y.doc_id = c.doc_b AND y.i = x.i
  GROUP BY c.doc_a, c.doc_b
),
est AS (
  SELECT doc_a, doc_b, CAST(ag AS DOUBLE) / {NUM_MINHASHES} AS est_sim
  FROM agree WHERE CAST(ag AS DOUBLE) / {NUM_MINHASHES} >= 0.5
),
verified AS (
  SELECT e.doc_a, e.doc_b, e.est_sim,
         levenshtein(da.text, db.text) AS dist,
         greatest(length(da.text), length(db.text)) AS maxlen
  FROM est e
  JOIN documents da ON da.doc_id = e.doc_a
  JOIN documents db ON db.doc_id = e.doc_b
  WHERE abs(length(da.text) - length(db.text))
        <= 0.3 * greatest(length(da.text), length(db.text))
)
SELECT doc_a, doc_b, est_sim, CAST(dist AS INTEGER) AS dist,
       round(CAST(dist AS DOUBLE) / maxlen, 6) AS dist_ratio
FROM verified
WHERE round(CAST(dist AS DOUBLE) / maxlen, 6) <= 0.3
"""

ORACLE["bigram_logprob"] = f"""
WITH tf AS (
  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(ts)),
                  i -> {{'w1': ts[i], 'w2': ts[i + 1]}})) AS p
    FROM (SELECT doc_id, {_TOK} AS ts FROM documents))
  GROUP BY doc_id, p.w1, p.w2
), bcnt AS (SELECT w1, w2, sum(tf) AS bcnt FROM tf GROUP BY w1, w2),
ucnt AS (
  SELECT t AS w, count(*) AS ucnt
  FROM (SELECT unnest({_TOK}) AS t FROM documents) GROUP BY t
), tot AS (SELECT sum(ucnt) AS n_total FROM ucnt)
SELECT doc_id, CAST(sum(tf) AS INTEGER) AS n_bigrams,
       round(sum(tf * ln(0.75 * (bcnt / CAST(c1.ucnt AS DOUBLE))
                         + 0.25 * (c2.ucnt / CAST(n_total AS DOUBLE))))
             / sum(tf), 6) AS avg_logprob
FROM tf
JOIN bcnt USING (w1, w2)
JOIN ucnt c1 ON tf.w1 = c1.w
JOIN ucnt c2 ON tf.w2 = c2.w, tot
GROUP BY doc_id
"""

ORACLE["top_keywords"] = f"""
WITH tfs AS (
  SELECT t AS term, doc_id AS docid, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents)
  GROUP BY t, doc_id
), dfs AS (SELECT term, count(*) AS df FROM tfs GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
w AS (
  SELECT tfs.term, docid, tf,
         round(tf * ln(CAST(n.n AS DOUBLE) / dfs.df), 6) AS tfidf
  FROM tfs JOIN dfs ON tfs.term = dfs.term, n
)
SELECT docid, rank, term, tfidf FROM (
  SELECT docid, term, tfidf,
         CAST(row_number() OVER (PARTITION BY docid
                                 ORDER BY tfidf DESC, term) AS INTEGER) AS rank
  FROM w)
WHERE rank <= 3
"""

_PROFILE_EV = """
  SELECT event_id, user_id, event_type,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
         CAST(round(value, 6) AS DECIMAL(18,6)) AS value_d
  FROM events
"""
ORACLE["profile_events"] = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column, count(*) AS n_rows, count({c}) AS non_null,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value
FROM ({_PROFILE_EV})"""
    for c in ("event_id", "user_id", "event_type", "ts_s", "value_d")
)

ORACLE["per_key_sample"] = f"""
SELECT * FROM (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY {_DOC_BIN}, CAST(doc_id AS VARCHAR)) AS INTEGER)
         AS sample_rank
  FROM documents
  WHERE source IS NOT NULL AND doc_id IS NOT NULL)
WHERE sample_rank <= 3
"""

ORACLE["latest_events"] = """
SELECT user_id, event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       round(value, 6) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""
ORACLE["streaming_latest_events"] = ORACLE["latest_events"]
ORACLE["streaming_snapshot_sink"] = ORACLE["latest_events"]

ORACLE["streaming_sliding_counts"] = """
SELECT strftime(ws, '%Y-%m-%d %H:%M') AS win_start, count(*) AS cnt
FROM (
  SELECT unnest([dt, dt - INTERVAL 1 HOUR]) AS ws
  FROM (SELECT date_trunc('hour', ts) AS dt FROM events))
GROUP BY 1
"""

ORACLE["streaming_enriched_counts"] = """
SELECT CAST(user_id % 3 AS INTEGER) AS tier, count(*) AS n,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS total_value
FROM events GROUP BY 1
"""

# batch replay of the stream-stream interval join: inner joins emit a
# match exactly once (when both sides are present), so the availableNow
# drain equals this batch join row-for-row
ORACLE["streaming_interval_join"] = """
SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""

ORACLE["forecast_revenue"] = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                      * CAST(l_discount AS DECIMAL(8,6))), 6) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLE["scd2_history"] = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE prev_type IS NULL OR prev_type != event_type
),
hist AS (
  SELECT user_id,
         CAST(row_number() OVER w AS INTEGER) AS version,
         event_type,
         ts AS vf,
         lead(ts) OVER w AS vt
  FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, version, event_type,
       strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to,
       vt IS NULL AS is_current
FROM hist
"""


# --- iterative graph oracles: the 8-iteration power method, unrolled --------
# One CTE pair per iteration over the _customer_graph derivation. The
# per-step SQL mirrors operators.graph's update rule term-for-term —
# same literal placement and operation order — so the doubles agree to
# a few ulps and round(...,6) is engine-stable; ranking happens on the
# ROUNDED value (see q_pagerank) because each nation's 10 lowest-keyed
# members are mathematically tied. Reference semantics:
# RunPageRankBasic.java:337-348, RunPersonalizedPageRankBasic.java:316-336.

_GRAPH_CTES = """
nodes AS (
  SELECT CAST(unnest(ms) AS INTEGER) AS id, ms
  FROM (SELECT list_sort(list(c_custkey)) AS ms FROM customer GROUP BY c_nationkey)
),
g AS (
  SELECT id,
         list_transform(list_filter(ms, m -> m != id)[1:10],
                        m -> CAST(m AS INTEGER)) AS adj
  FROM nodes
),
nn AS (SELECT count(*) AS n FROM g),
edges AS (SELECT id AS src, len(adj) AS outdeg, unnest(adj) AS dst FROM g)
"""


def _pagerank_oracle_sql(n_iter: int = 8, k: int = 25) -> str:
    steps = [
        "pr0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM g)"
    ]
    for i in range(1, n_iter + 1):
        steps.append(f"""
s{i} AS (
  SELECT g.id, coalesce(r.recv, CAST(0.0 AS DOUBLE)) AS recv
  FROM g LEFT JOIN (
    SELECT e.dst AS id, sum(p.pr / e.outdeg) AS recv
    FROM pr{i - 1} p JOIN edges e ON e.src = p.id
    GROUP BY e.dst) r ON r.id = g.id
),
t{i} AS (SELECT sum(recv) AS total FROM s{i}),
pr{i} AS (
  SELECT id, CAST(0.15 AS DOUBLE) / nn.n
           + CAST(0.85 AS DOUBLE)
             * (recv + (CAST(1.0 AS DOUBLE) - t.total) / nn.n) AS pr
  FROM s{i}, t{i} t, nn
)""")
    return f"""
WITH {_GRAPH_CTES},
{",".join(steps)}
SELECT CAST(row_number() OVER (ORDER BY pr DESC, id ASC) AS INTEGER) AS rank, id, pr
FROM (SELECT id, round(pr, 6) AS pr FROM pr{n_iter})
QUALIFY rank <= {k}
"""


def _ppr_oracle_sql(n_iter: int = 8, k: int = 10) -> str:
    steps = [
        """srcs AS (
  SELECT CAST(c_custkey AS INTEGER) AS source
  FROM customer ORDER BY c_custkey LIMIT 2
),
slots AS (SELECT s.source, g.id FROM g CROSS JOIN srcs s),
ppr0 AS (
  SELECT source, id,
         CASE WHEN id = source THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS pr
  FROM slots
)"""
    ]
    for i in range(1, n_iter + 1):
        steps.append(f"""
ps{i} AS (
  SELECT x.source, x.id, coalesce(r.recv, CAST(0.0 AS DOUBLE)) AS recv
  FROM slots x LEFT JOIN (
    SELECT p.source, e.dst AS id, sum(p.pr / e.outdeg) AS recv
    FROM ppr{i - 1} p JOIN edges e ON e.src = p.id
    GROUP BY p.source, e.dst) r ON r.source = x.source AND r.id = x.id
),
pt{i} AS (SELECT source, sum(recv) AS total FROM ps{i} GROUP BY source),
ppr{i} AS (
  SELECT s.source, s.id,
         CASE WHEN s.id = s.source
              THEN CAST(0.15 AS DOUBLE)
                   + CAST(0.85 AS DOUBLE)
                     * (s.recv + (CAST(1.0 AS DOUBLE) - t.total))
              ELSE CAST(0.85 AS DOUBLE) * s.recv END AS pr
  FROM ps{i} s JOIN pt{i} t ON t.source = s.source
)""")
    return f"""
WITH {_GRAPH_CTES},
{",".join(steps)}
SELECT source,
       CAST(row_number() OVER (PARTITION BY source
                               ORDER BY pr DESC, id ASC) AS INTEGER) AS rank,
       id, pr
FROM (SELECT source, id, round(pr, 6) AS pr FROM ppr{n_iter})
QUALIFY rank <= {k}
"""


def _pagerank_convergence_oracle_sql(n_iter: int = 8) -> str:
    """Per-iteration L1 residuals from the SAME unrolled update as the
    pagerank oracle — every pr{i} is MATERIALIZED because each is now
    referenced three times (next round + two deltas); inlining would
    re-expand the prefix exponentially (the kcore lesson)."""
    steps = [
        "pr0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS pr FROM g)"
    ]
    for i in range(1, n_iter + 1):
        steps.append(f"""
s{i} AS (
  SELECT g.id, coalesce(r.recv, CAST(0.0 AS DOUBLE)) AS recv
  FROM g LEFT JOIN (
    SELECT e.dst AS id, sum(p.pr / e.outdeg) AS recv
    FROM pr{i - 1} p JOIN edges e ON e.src = p.id
    GROUP BY e.dst) r ON r.id = g.id
),
t{i} AS (SELECT sum(recv) AS total FROM s{i}),
pr{i} AS MATERIALIZED (
  SELECT id, CAST(0.15 AS DOUBLE) / nn.n
           + CAST(0.85 AS DOUBLE)
             * (recv + (CAST(1.0 AS DOUBLE) - t.total) / nn.n) AS pr
  FROM s{i}, t{i} t, nn
)""")
    deltas = "\nUNION ALL\n".join(
        f"""SELECT {i} AS iter,
       round((SELECT sum(abs(a.pr - b.pr))
              FROM pr{i} a JOIN pr{i - 1} b ON b.id = a.id), 6) AS l1_delta"""
        for i in range(1, n_iter + 1)
    )
    return f"""
WITH {_GRAPH_CTES},
{",".join(steps)}
{deltas}
"""


ORACLE["pagerank_convergence"] = _pagerank_convergence_oracle_sql()

ORACLE["pagerank"] = _pagerank_oracle_sql()
ORACLE["personalized_pagerank"] = _ppr_oracle_sql()

# canonical undirected edge set over the same customer graph; degree
# and triangle oracles re-derive orientation exactly like the operator
_UNDIRECTED_CTES = f"""
{_GRAPH_CTES},
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM edges WHERE dst IS NOT NULL AND src != dst
),
udeg AS (
  SELECT id, count(*) AS d
  FROM (SELECT a AS id FROM ue UNION ALL SELECT b AS id FROM ue)
  GROUP BY id
)
"""

def _kcore_oracle_sql(k: int = 6, rounds: int = 16) -> str:
    """Unrolled simultaneous-peeling oracle over the variable-degree
    customer graph (id % 12 lowest-keyed same-nation others): each
    round recomputes induced degrees and keeps nodes with d >= k;
    rounds past the fixpoint are identities, so over-unrolling is
    harmless (same trick as the unrolled pagerank oracle)."""
    parts = [
        """vnodes AS (
  SELECT CAST(unnest(ms) AS INTEGER) AS id, ms
  FROM (SELECT list_sort(list(c_custkey)) AS ms FROM customer GROUP BY c_nationkey)
),
vg AS (
  SELECT id,
         list_transform(list_filter(ms, m -> m != id)[1:CAST(id % 12 AS BIGINT)],
                        m -> CAST(m AS INTEGER)) AS adj
  FROM vnodes
),
vedges AS (SELECT id AS src, unnest(adj) AS dst FROM vg),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM vedges WHERE dst IS NOT NULL AND src != dst
)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""d{i} AS (
  SELECT id, count(*) AS d
  FROM (SELECT a AS id FROM e{i - 1} UNION ALL SELECT b FROM e{i - 1})
  GROUP BY id
),
k{i} AS (SELECT id FROM d{i} WHERE d >= {k}),
e{i} AS MATERIALIZED (
  -- MATERIALIZED: each round is referenced 3x by the next; inlined
  -- CTEs would re-expand the whole prefix exponentially (DuckDB ran
  -- out of file handles re-scanning the parquet 3^16 times)
  SELECT e.a, e.b FROM e{i - 1} e
  JOIN k{i} x ON x.id = e.a JOIN k{i} y ON y.id = e.b
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(id AS INTEGER) AS id, count(*) AS core_degree
FROM (SELECT a AS id FROM e{rounds} UNION ALL SELECT b AS id FROM e{rounds})
GROUP BY id HAVING count(*) >= {k}"""
    )


ORACLE["kcore"] = _kcore_oracle_sql(6, 16)


def _lpa_oracle_sql(rounds: int = 4) -> str:
    """Unrolled synchronous LPA oracle over the id %-12 customer
    graph: per round, count neighbor labels, keep the max-count ties,
    take the min label. Each round's label table is referenced by the
    next round's join — AS MATERIALIZED per the unrolled-iteration
    rule (kcore lesson)."""
    parts = [
        """vnodes AS (
  SELECT CAST(unnest(ms) AS INTEGER) AS id, ms
  FROM (SELECT list_sort(list(c_custkey)) AS ms FROM customer GROUP BY c_nationkey)
),
vg AS (
  SELECT id,
         list_transform(list_filter(ms, m -> m != id)[1:CAST(id % 12 AS BIGINT)],
                        m -> CAST(m AS INTEGER)) AS adj
  FROM vnodes
),
vedges AS (SELECT id AS src, unnest(adj) AS dst FROM vg),
e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM vedges WHERE dst IS NOT NULL AND src != dst
),
sym AS MATERIALIZED (
  SELECT a AS v, b AS u FROM e0 UNION ALL SELECT b AS v, a AS u FROM e0
),
l0 AS MATERIALIZED (SELECT DISTINCT v AS id, v AS label FROM sym)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""c{i} AS (
  SELECT s.v, l.label, count(*) AS c
  FROM sym s JOIN l{i - 1} l ON s.u = l.id GROUP BY 1, 2
),
l{i} AS MATERIALIZED (
  SELECT v AS id, min(label) AS label FROM (
    SELECT v, label, c, max(c) OVER (PARTITION BY v) AS mx FROM c{i})
  WHERE c = mx GROUP BY v
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(label AS INTEGER) AS label, count(*) AS n_nodes FROM l{rounds} GROUP BY 1"""
    )


ORACLE["lpa_communities"] = _lpa_oracle_sql(4)


ORACLE["degree_histogram"] = f"""
WITH {_UNDIRECTED_CTES}
SELECT d AS degree, count(*) AS n_nodes FROM udeg GROUP BY d
"""

ORACLE["triangle_count"] = f"""
WITH {_UNDIRECTED_CTES},
oe AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.a ELSE ue.b END AS u,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.b ELSE ue.a END AS v
  FROM ue JOIN udeg da ON da.id = ue.a JOIN udeg db ON db.id = ue.b
),
w AS (
  SELECT l.v AS x, r.v AS y FROM oe l JOIN oe r ON l.u = r.u WHERE l.v < r.v
)
SELECT count(*) AS n_triangles
FROM w JOIN ue ON ue.a = least(w.x, w.y) AND ue.b = greatest(w.x, w.y)
"""

# Same oriented closed-wedge construction, but each triangle credits
# all three corners; coefficient arithmetic mirrors the operator
# term-for-term (2.0 * tri first, then the integer-product divisor).
ORACLE["clustering_coefficient"] = f"""
WITH {_UNDIRECTED_CTES},
oe AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.a ELSE ue.b END AS u,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND ue.a < ue.b)
              THEN ue.b ELSE ue.a END AS v
  FROM ue JOIN udeg da ON da.id = ue.a JOIN udeg db ON db.id = ue.b
),
w AS (
  SELECT l.u AS u, l.v AS x, r.v AS y
  FROM oe l JOIN oe r ON l.u = r.u WHERE l.v < r.v
),
cw AS (
  SELECT w.u, w.x, w.y
  FROM w JOIN ue ON ue.a = least(w.x, w.y) AND ue.b = greatest(w.x, w.y)
),
tri AS (
  SELECT id, count(*) AS triangles
  FROM (SELECT u AS id FROM cw UNION ALL SELECT x FROM cw UNION ALL SELECT y FROM cw)
  GROUP BY id
)
SELECT CAST(d.id AS INTEGER) AS id, d.d AS degree, coalesce(t.triangles, 0) AS triangles,
       round(CASE WHEN d.d >= 2
                  THEN 2.0 * coalesce(t.triangles, 0) / (d.d * (d.d - 1))
                  ELSE 0.0 END, 6) AS coeff
FROM udeg d LEFT JOIN tri t ON t.id = d.id
"""

ORACLE["link_prediction"] = f"""
WITH {_UNDIRECTED_CTES},
nb AS (SELECT a AS id, b AS nbr FROM ue UNION ALL SELECT b, a FROM ue),
mids AS (SELECT id FROM udeg WHERE d <= 64),
nb2 AS (SELECT nb.id, nb.nbr FROM nb JOIN mids m ON m.id = nb.id),
pairs AS (
  SELECT l.nbr AS a, r.nbr AS b, count(*) AS common_neighbors
  FROM nb2 l JOIN nb2 r ON l.id = r.id
  WHERE l.nbr < r.nbr
  GROUP BY l.nbr, r.nbr
),
cand AS (
  SELECT p.* FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM ue WHERE ue.a = p.a AND ue.b = p.b)
)
SELECT CAST(c.a AS INTEGER) AS a, CAST(c.b AS INTEGER) AS b, c.common_neighbors,
       round(c.common_neighbors / (da.d + db.d - c.common_neighbors), 6) AS jaccard
FROM cand c JOIN udeg da ON da.id = c.a JOIN udeg db ON db.id = c.b
ORDER BY jaccard DESC, c.a ASC, c.b ASC
LIMIT 20
"""


def _hits_oracle_sql(n_iter: int = 8, k: int = 25) -> str:
    """Unrolled HITS oracle over the _customer_graph derivation. Each
    half-round rescales by max() — bit-exact across engines regardless
    of aggregation order (the operator's normalization choice exists
    for exactly this reason); ranking happens on the ROUNDED authority
    with an id tiebreak, same as the pagerank oracle. Every per-round
    CTE is MATERIALIZED — the rescale references its input twice, and
    inlined CTEs would re-expand the whole prefix exponentially (the
    kcore lesson)."""
    steps = ["h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS hub FROM g)"]
    for i in range(1, n_iter + 1):
        steps.append(f"""
ar{i} AS MATERIALIZED (
  SELECT g.id, coalesce(r.raw, CAST(0.0 AS DOUBLE)) AS araw
  FROM g LEFT JOIN (
    SELECT e.dst AS id, sum(h.hub) AS raw
    FROM h{i - 1} h JOIN edges e ON e.src = h.id
    GROUP BY e.dst) r ON r.id = g.id
),
a{i} AS MATERIALIZED (
  SELECT id, CASE WHEN m.m != 0 THEN araw / m.m
                  ELSE CAST(0.0 AS DOUBLE) END AS auth
  FROM ar{i}, (SELECT max(araw) AS m FROM ar{i}) m
),
hr{i} AS MATERIALIZED (
  SELECT g.id, coalesce(r.raw, CAST(0.0 AS DOUBLE)) AS hraw
  FROM g LEFT JOIN (
    SELECT e.src AS id, sum(a.auth) AS raw
    FROM a{i} a JOIN edges e ON e.dst = a.id
    GROUP BY e.src) r ON r.id = g.id
),
h{i} AS MATERIALIZED (
  SELECT id, CASE WHEN m.m != 0 THEN hraw / m.m
                  ELSE CAST(0.0 AS DOUBLE) END AS hub
  FROM hr{i}, (SELECT max(hraw) AS m FROM hr{i}) m
)""")
    return f"""
WITH {_GRAPH_CTES},
{",".join(steps)}
SELECT CAST(row_number() OVER (ORDER BY auth DESC, id ASC) AS INTEGER) AS rank,
       id, auth, hub
FROM (SELECT a.id, round(a.auth, 6) AS auth, round(h.hub, 6) AS hub
      FROM a{n_iter} a JOIN h{n_iter} h ON h.id = a.id)
QUALIFY rank <= {k}
"""


ORACLE["hits"] = _hits_oracle_sql()


def _bfs_oracle_sql(rounds: int = 6) -> str:
    """Unrolled level-synchronous BFS from the 2 lowest custkeys over
    the undirected customer graph; rounds past the fixpoint add
    nothing (empty frontiers are identities), so over-unrolling is
    harmless. All-integer — no float parity concerns."""
    parts = [
        """nb AS (SELECT a AS id, b AS nbr FROM ue UNION ALL SELECT b, a FROM ue),
r0 AS MATERIALIZED (
  SELECT CAST(c_custkey AS INTEGER) AS id, 0 AS dist
  FROM customer ORDER BY c_custkey LIMIT 2
),
f0 AS (SELECT id FROM r0)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""
n{i} AS MATERIALIZED (
  SELECT DISTINCT nb.nbr AS id
  FROM nb JOIN f{i - 1} f ON f.id = nb.id
  WHERE nb.nbr NOT IN (SELECT id FROM r{i - 1})
),
r{i} AS MATERIALIZED (
  SELECT * FROM r{i - 1} UNION ALL SELECT id, {i} AS dist FROM n{i}
),
f{i} AS (SELECT id FROM n{i})""")
    return f"""
WITH {_UNDIRECTED_CTES},
{",".join(parts)}
SELECT dist, count(*) AS n_nodes FROM r{rounds} GROUP BY dist
"""


ORACLE["bfs_hops"] = _bfs_oracle_sql()


def _harmonic_oracle_sql(rounds: int = 6, k: int = 25) -> str:
    """Two independent unrolled BFS chains (one per probe source — the
    2 lowest custkeys), combined into the probe-based harmonic
    centrality top-k. Per-round CTEs consumed twice are MATERIALIZED
    (the kcore lesson); per-id sums have ≤ 2 addends so double
    addition is order-free."""
    chains = []
    for p in range(2):
        parts = [f"""s{p}_r0 AS MATERIALIZED (
  SELECT CAST(c_custkey AS INTEGER) AS id, 0 AS dist
  FROM customer ORDER BY c_custkey LIMIT 1 OFFSET {p}
),
s{p}_f0 AS (SELECT id FROM s{p}_r0)"""]
        for i in range(1, rounds + 1):
            parts.append(f"""
s{p}_n{i} AS MATERIALIZED (
  SELECT DISTINCT nb.nbr AS id
  FROM nb JOIN s{p}_f{i - 1} f ON f.id = nb.id
  WHERE nb.nbr NOT IN (SELECT id FROM s{p}_r{i - 1})
),
s{p}_r{i} AS MATERIALIZED (
  SELECT * FROM s{p}_r{i - 1} UNION ALL SELECT id, {i} AS dist FROM s{p}_n{i}
),
s{p}_f{i} AS (SELECT id FROM s{p}_n{i})""")
        chains.append(",".join(parts))
    return f"""
WITH {_UNDIRECTED_CTES},
nb AS (SELECT a AS id, b AS nbr FROM ue UNION ALL SELECT b, a FROM ue),
{chains[0]},
{chains[1]},
all_d AS (
  SELECT id, dist FROM s0_r{rounds}
  UNION ALL SELECT id, dist FROM s1_r{rounds}
),
sc AS (
  SELECT id, round(sum(CAST(1.0 AS DOUBLE) / dist), 6) AS harmonic,
         count(*) AS n_reached
  FROM all_d WHERE dist > 0 GROUP BY id
)
SELECT CAST(rn AS INTEGER) AS rank, CAST(id AS INTEGER) AS id, harmonic, n_reached FROM (
  SELECT *, row_number() OVER (ORDER BY harmonic DESC, id ASC) AS rn FROM sc)
WHERE rn <= {k}
"""


ORACLE["harmonic_centrality"] = _harmonic_oracle_sql()

ORACLE["degree_assortativity"] = f"""
WITH {_UNDIRECTED_CTES},
ann AS (
  SELECT da.d AS x, db.d AS y
  FROM ue JOIN udeg da ON da.id = ue.a JOIN udeg db ON db.id = ue.b
),
sym AS (SELECT x, y FROM ann UNION ALL SELECT y AS x, x AS y FROM ann),
s AS (
  SELECT count(*) AS m,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM sym
)
SELECT CAST(m / 2 AS BIGINT) AS n_edges,
       round(CASE WHEN (sxx / m - (sx / m) * (sx / m)) != 0.0
                  THEN (sxy / m - (sx / m) * (sx / m))
                       / (sxx / m - (sx / m) * (sx / m))
                  ELSE 0.0 END, 6) AS assortativity
FROM s
"""


# --- trained-IVF oracle: the deterministic trainer, reproduced in SQL -------
# ivf_train is deterministic by construction (hash-sampled farthest-
# first init + Lloyd's with fixed tiebreaks), so the whole
# train→assign→probe pipeline unrolls into CTEs: 7 seed-selection
# steps (k=8), n_iter=2 assignment/mean pairs, then the nprobe=2
# probe + two-phase-equivalent top-k. The 9-dp (init) and 6-dp
# (assign/score) roundings that make Spark's own runs reproducible are
# what make this cross-engine comparison stable too. Assumes the
# testdata's fixed dim=64 (generate_series cannot take a column arg in
# this DuckDB) and that the corpus fits the trainer's
# init_sample_size=4096, i.e. the hash-sample is the full table — true
# at the driver's correctness scales (50 / 500 / 5000 vectors).


def _ivf_topk_trained_oracle_sql(
    k: int = 8, n_iter: int = 2, dim: int = 64,
    topk: int = 10, nprobe: int = 2,
) -> str:
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), {p})"
    )
    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "seeds0 AS (SELECT 0 AS cell_id, v AS c FROM e ORDER BY vec_id LIMIT 1)",
    ]
    for j in range(1, k):
        ncos = cos.format(a="s.c", b="e.v", p=9)
        parts.append(f"""
near{j} AS (
  SELECT e.vec_id, max({ncos}) AS near
  FROM e, seeds{j - 1} s GROUP BY e.vec_id
),
pick{j} AS (
  SELECT e.v FROM near{j} n JOIN e ON e.vec_id = n.vec_id
  ORDER BY n.near ASC, n.vec_id ASC LIMIT 1
),
seeds{j} AS (
  SELECT * FROM seeds{j - 1}
  UNION ALL SELECT {j} AS cell_id, v AS c FROM pick{j}
)""")
    cen = f"seeds{k - 1}"
    acos = cos.format(a="c.c", b="e.v", p=6)
    for t in range(n_iter):
        parts.append(f"""
asg{t} AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {acos} DESC, c.cell_id ASC) AS rn
    FROM e, {cen} c) WHERE rn = 1
),
cen{t + 1} AS (
  SELECT cell AS cell_id, list(m ORDER BY pos) AS c
  FROM (
    SELECT cell, g.i AS pos, avg(v[g.i]) AS m
    FROM asg{t}, generate_series(1, {dim}) g(i)
    GROUP BY cell, g.i)
  GROUP BY cell
)""")
        cen = f"cen{t + 1}"
    qccos = cos.format(a="c.c", b="qv.q", p=6)
    scos = cos.format(a="qc.q", b="a.v", p=6)
    parts.append(f"""
asgF AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell_id AS cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {acos} DESC, c.cell_id ASC) AS rn
    FROM e, {cen} c) WHERE rn = 1
),
qv AS (SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < 5),
qcells AS (
  SELECT query_id, q, qcell FROM (
    SELECT qv.query_id, qv.q, c.cell_id AS qcell,
           row_number() OVER (PARTITION BY qv.query_id
                              ORDER BY {qccos} DESC, c.cell_id ASC) AS rn
    FROM qv, {cen} c) WHERE rn <= {nprobe}
),
scored AS (
  SELECT qc.query_id, a.vec_id AS neighbor_id, {scos} AS sim
  FROM asgF a JOIN qcells qc
    ON a.cell = qc.qcell AND a.vec_id != qc.query_id
)""")
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS INTEGER)
         AS rank,
       sim
FROM scored
QUALIFY rank <= {topk}
"""


ORACLE["ivf_topk_trained"] = _ivf_topk_trained_oracle_sql()


def _pq_cte(m: int = 8, k: int = 8, n_iter: int = 2, dim: int = 64) -> str:
    """Shared CTE chain replaying pq_train + pq_codes in DuckDB SQL:
    subvector explode, first-k-ids codebook init, n_iter rounds of
    (rounded-L2 argmin assign, element-wise mean update), final
    ``codes`` table. Distances decompose into list_dot_product terms
    (the cosine-oracle fold, bit-identical to the Spark F.aggregate)."""
    sd = dim // m
    subspace_vals = ", ".join(f"({j})" for j in range(m))

    def d2(c: str, sv: str) -> str:
        return (
            f"round(list_dot_product({c}, {c}) - 2 * list_dot_product({c}, {sv})"
            f" + list_dot_product({sv}, {sv}), 6)"
        )

    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""sub AS (
  SELECT vec_id, CAST(j.j AS INTEGER) AS subspace,
         v[(j.j * {sd} + 1):((j.j + 1) * {sd})] AS sv
  FROM e, (VALUES {subspace_vals}) j(j))""",
        f"""init AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS code
  FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT {k}))""",
        """cb0 AS (
  SELECT s.subspace, i.code, s.sv AS c
  FROM sub s JOIN init i ON i.vec_id = s.vec_id)""",
    ]
    cb = "cb0"
    for t in range(n_iter):
        parts.append(f"""asg{t} AS (
  SELECT vec_id, subspace, sv, code FROM (
    SELECT s.vec_id, s.subspace, s.sv, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.subspace
                              ORDER BY {d2("c.c", "s.sv")} ASC, c.code ASC) AS rn
    FROM sub s JOIN {cb} c ON c.subspace = s.subspace) WHERE rn = 1)""")
        parts.append(f"""cb{t + 1} AS (
  SELECT subspace, code, list(m ORDER BY pos) AS c
  FROM (
    SELECT subspace, code, g.i AS pos, avg(sv[g.i]) AS m
    FROM asg{t}, generate_series(1, {sd}) g(i)
    GROUP BY subspace, code, g.i)
  GROUP BY subspace, code)""")
        cb = f"cb{t + 1}"
    parts.append(f"""codes AS (
  SELECT vec_id, subspace, code FROM (
    SELECT s.vec_id, s.subspace, c.code,
           row_number() OVER (PARTITION BY s.vec_id, s.subspace
                              ORDER BY {d2("c.c", "s.sv")} ASC, c.code ASC) AS rn
    FROM sub s JOIN {cb} c ON c.subspace = s.subspace) WHERE rn = 1)""")
    return ",\n".join(parts)


ORACLE["pq_codes"] = f"""
WITH {_pq_cte()}
SELECT vec_id, subspace, code FROM codes
"""

# ADC: LUT entries fixed-point quantized to floor(d2 * 2^20) BIGINT —
# identical input bits in both engines (list_dot_product == the Spark
# fold), so floor matches exactly and the per-pair sum over subspaces
# is an order-independent LONG sum. greatest(s, 0) clamps the few
# quantized self-distance sums that land at -1 ulp below zero.
ORACLE["pq_adc_topk"] = f"""
WITH {_pq_cte()},
qsub AS (
  SELECT vec_id AS query_id, subspace, sv AS qv,
         list_dot_product(sv, sv) AS qn2
  FROM sub WHERE vec_id < 5),
lut AS (
  SELECT q.query_id, c.subspace, c.code,
         CAST(floor((list_dot_product(c.c, c.c)
                     - 2 * list_dot_product(c.c, q.qv)
                     + q.qn2) * 1048576.0) AS BIGINT) AS dq
  FROM qsub q JOIN cb2 c ON c.subspace = q.subspace),
scored AS (
  SELECT l.query_id, cd.vec_id AS neighbor_id,
         CAST(sum(l.dq) AS BIGINT) AS s
  FROM codes cd JOIN lut l ON l.subspace = cd.subspace AND l.code = cd.code
  WHERE cd.vec_id != l.query_id
  GROUP BY 1, 2)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER (PARTITION BY query_id
                               ORDER BY s ASC, neighbor_id ASC) AS INTEGER)
         AS rank,
       round(CAST(greatest(s, 0) AS DOUBLE) / 1048576.0, 6) AS adc_dist
FROM scored
QUALIFY rank <= 10
"""

# composed oracles: reuse the standalone queries' oracle SQL verbatim
# as derived tables — the composition is the check (defined here,
# after every referenced entry exists)
ORACLE["split_leakage"] = f"""
WITH cand AS (SELECT doc_a, doc_b FROM ({ORACLE['minhash_lsh_candidates']}) _c),
sp AS (SELECT doc_id, split FROM ({ORACLE['hash_split']}) _s)
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       count(*) AS n_pairs
FROM cand
JOIN sp sa ON sa.doc_id = cand.doc_a
JOIN sp sb ON sb.doc_id = cand.doc_b
WHERE sa.split != sb.split
GROUP BY 1, 2
"""

ORACLE["ivf_recall_report"] = f"""
WITH bf AS (SELECT query_id, neighbor_id FROM ({ORACLE['brute_force_topk']}) _b),
ivf AS (SELECT query_id, neighbor_id FROM ({ORACLE['ivf_topk_trained']}) _i)
SELECT bf.query_id AS query_id,
       round(CAST(count(ivf.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_at_k
FROM bf LEFT JOIN ivf
  ON ivf.query_id = bf.query_id AND ivf.neighbor_id = bf.neighbor_id
GROUP BY bf.query_id
"""

# pq_recall_report: composes the pq_adc_topk oracle with an exact
# squared-L2 top-10 ground truth (same d2 decomposition, full
# vectors) — the ann_recall left-join/count shape of
# ivf_recall_report.
ORACLE["pq_recall_report"] = f"""
WITH {_pq_cte()},
qsub AS (
  SELECT vec_id AS query_id, subspace, sv AS qv,
         list_dot_product(sv, sv) AS qn2
  FROM sub WHERE vec_id < 5),
lut AS (
  SELECT q.query_id, c.subspace, c.code,
         CAST(floor((list_dot_product(c.c, c.c)
                     - 2 * list_dot_product(c.c, q.qv)
                     + q.qn2) * 1048576.0) AS BIGINT) AS dq
  FROM qsub q JOIN cb2 c ON c.subspace = q.subspace),
adc AS (
  SELECT query_id, neighbor_id FROM (
    SELECT l.query_id, cd.vec_id AS neighbor_id,
           CAST(sum(l.dq) AS BIGINT) AS s
    FROM codes cd JOIN lut l ON l.subspace = cd.subspace AND l.code = cd.code
    WHERE cd.vec_id != l.query_id
    GROUP BY 1, 2)
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY s ASC, neighbor_id ASC) <= 10),
exact AS (
  SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id
  FROM (SELECT vec_id, v FROM e WHERE vec_id < 5) q
  JOIN e e2 ON e2.vec_id != q.vec_id
  QUALIFY row_number() OVER (
    PARTITION BY q.vec_id
    ORDER BY round(list_dot_product(e2.v, e2.v)
                   - 2 * list_dot_product(e2.v, q.v)
                   + list_dot_product(q.v, q.v), 6) ASC,
             e2.vec_id ASC) <= 10)
SELECT exact.query_id AS query_id,
       round(CAST(count(adc.neighbor_id) AS DOUBLE) / count(*), 6)
         AS recall_at_k
FROM exact LEFT JOIN adc
  ON adc.query_id = exact.query_id AND adc.neighbor_id = exact.neighbor_id
GROUP BY exact.query_id
"""

ORACLE["event_props_stats"] = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS avg_value
FROM events GROUP BY event_type
"""

ORACLE["top_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey ASC)
            AS INTEGER) AS rn
FROM orders
QUALIFY rn <= 3
"""

ORACLE["boolean_retrieval_text"] = f"""
WITH postings AS (
  SELECT t AS term, doc_id AS docid
  FROM (SELECT doc_id, unnest({_TOK}) AS t FROM documents))
SELECT q.docid, d.text
FROM {rpn_to_sql(_BOOLEAN_QUERY)} q
JOIN documents d ON d.doc_id = q.docid
"""

# Media oracles rebuild the SAME binary container the Spark query
# builds (every registry media query now stages REAL containers —
# PNG/JPEG/WAV/AVI/MP4 — built by the repo's own pure-stdlib codecs)
# and RE-DERIVE the checked facts from the SOURCE text bytes: byte
# slices via the to_hex/from_hex round-trip (this DuckDB cannot slice
# BLOBs: byte i of a blob = hex chars 2i-1..2i), deterministic
# container lengths by running the muxers at oracle-build time — the
# oracles recompute the operator's parse, not a fixture's constants.

# media_sniff: every container in the mix has a DETERMINISTIC byte
# length (fixed frame-count/size layout), so n_bytes is re-derived by
# RUNNING the muxers at oracle-build time on equal-shaped dummy input
# — the oracle tracks the muxer, not a hardcoded constant.
def _sniff_len_constants() -> tuple[int, int, int]:
    from mapreduce_assignments_spark.functions.container_demux import (
        mux_avi_raw,
        mux_mp4,
    )
    from mapreduce_assignments_spark.operators.multimodal import make_wav

    wav_len = len(make_wav(bytes(64), 1, 16000))
    avi_len = len(mux_avi_raw([bytes(16)] * 4, 8, 8))
    mp4_len = len(mux_mp4([bytes(16 + i) for i in range(5)], 8, 8,
                          samples_per_chunk=2))
    return wav_len, avi_len, mp4_len


_WAV_LEN, _AVI_LEN, _MP4_LEN = _sniff_len_constants()

ORACLE["media_sniff"] = f"""
SELECT doc_id AS asset_id,
       CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'avi'
            ELSE 'mp4' END AS format,
       CAST(CASE doc_id % 3 WHEN 0 THEN {_WAV_LEN} WHEN 1 THEN {_AVI_LEN}
            ELSE {_MP4_LEN} END AS INTEGER) AS n_bytes
FROM documents WHERE n_chars >= 96
"""

# frame_sample: the raw-DIB AVI frames are BYTE slices of the text
# (frame f = bytes 16f..16f+15), so the oracle re-derives the exact
# demuxed payload byte-based — to_hex/from_hex round-trip, since this
# DuckDB cannot slice BLOBs directly. Byte slicing on BOTH sides
# makes the offsets structural rather than ASCII-dependent; the one
# residual divergence is the final render of a slice that SPLITS a
# multi-byte codepoint: DuckDB decode() hard-errors on invalid UTF-8
# while Spark cast(binary as string) substitutes replacement chars —
# latent while the testdata is ASCII (asserted nowhere cheaper, so
# flagged here; a non-ASCII corpus would need byte-hex output
# columns instead of text).
ORACLE["frame_sample"] = """
SELECT doc_id AS asset_id,
       CAST(f.i AS INTEGER) AS frame_idx,
       CAST(16 AS INTEGER) AS frame_bytes,
       decode(from_hex(substring(to_hex(encode(text)),
                                 CAST(32 * f.i + 1 AS INTEGER), 32))) AS frame_text
FROM documents, (VALUES (0), (2)) f(i)
WHERE n_chars >= 64
"""

# 8x8 average-hash over the PNG-decoded pixels: the grayscale PNG is
# lossless, so decoded pixel i is byte i of the (ASCII) text; bit i is
# pixel > mean, packed big-endian with the MSB folded to keep the
# value in signed int64 (Spark LongType).
ORACLE["phash_duplicates"] = """
WITH px AS (
  SELECT doc_id, g.i AS i, unicode(substring(text, CAST(g.i AS INTEGER), 1)) AS px
  FROM documents, generate_series(1, 64) g(i)
  WHERE n_chars >= 64
),
pm AS (
  SELECT doc_id, i, px, avg(px) OVER (PARTITION BY doc_id) AS m FROM px
),
h AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN px > m AND i = 1
                       THEN CAST('-9223372036854775808' AS BIGINT)
                       WHEN px > m
                       THEN (CAST(1 AS BIGINT) << CAST(64 - i AS INTEGER))
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS phash
  FROM pm GROUP BY doc_id
)
SELECT min(doc_id) AS keeper, count(*) AS n_dups, phash FROM h GROUP BY phash
"""

# the grayscale PNG's pixels are the first 64 UTF-8 bytes of the
# (ASCII) document text and PNG is lossless, so the decoded mean
# pixel equals the mean codepoint.
ORACLE["image_stats"] = """
SELECT doc_id AS asset_id, 8 AS width, 8 AS height, 1 AS channels,
       round(list_aggregate(list_transform(range(1, 65),
             i -> unicode(substring(text, i, 1))), 'avg'), 6) AS mean_px
FROM documents WHERE n_chars >= 64
"""

# png_decode_stats round-trips the SAME pixels through a real PNG
# container (encode_png -> decode_png inside Spark), so the oracle is
# the identical text-derived recomputation: any codec defect breaks
# the value hash.
ORACLE["png_decode_stats"] = ORACLE["image_stats"]

# jpeg_decode_stats: JPEG is lossy, so the oracle checks the
# lossless-exact facts — per-doc dimensions/channels and row
# PRESENCE (a row exists only when the seam's decode succeeded);
# pixel math is golden-pinned in pytest (see q_jpeg_decode_stats).
ORACLE["jpeg_decode_stats"] = """
SELECT doc_id AS asset_id,
       CAST(8 + (doc_id % 3) * 4 AS INTEGER) AS width,
       CAST(8 + (doc_id % 5) * 2 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels
FROM documents WHERE n_chars >= 256
"""

# mjpeg_frame_stats: MJPEG-in-AVI is demuxed frames of LOSSY JPEG,
# so (same contract as jpeg_decode_stats) the oracle checks the
# lossless-exact facts — per-frame dimensions/channels and row
# PRESENCE: a row exists only when the AVI demux AND the frame's
# full entropy decode both succeed. Demux byte-exactness is
# value-checked on the MP4 path (mp4_frame_text); pixel math is
# golden-pinned in pytest.
ORACLE["mjpeg_frame_stats"] = """
SELECT doc_id AS asset_id,
       CAST(f.i AS INTEGER) AS frame_idx,
       CAST(8 + (doc_id % 3) * 4 AS INTEGER) AS width,
       CAST(8 + (doc_id % 5) * 2 AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels
FROM documents, (VALUES (0), (1), (2)) f(i)
WHERE n_chars >= 288
"""

# mp4_frame_text: the MP4 samples are RAW text slices (no lossy
# codec in the way), so the oracle re-derives the exact demuxed
# bytes: sample i starts at BYTE offset 16*i + i*(i-1)/2 and is 16+i
# bytes long; sample_frames keeps every 2nd sample. The slice is
# BYTE-based (to_hex/from_hex round-trip — this DuckDB cannot slice
# BLOBs directly) to mirror Spark's substring-over-encode exactly;
# same split-codepoint render caveat as the frame_sample oracle
# above (decode() errors vs cast-to-string replacement — latent
# while the testdata is ASCII).
ORACLE["mp4_frame_text"] = """
SELECT doc_id AS asset_id,
       CAST(f.i AS INTEGER) AS frame_idx,
       decode(from_hex(substring(to_hex(encode(text)),
                                 CAST(2 * (16 * f.i + f.i * (f.i - 1) / 2) + 1
                                      AS INTEGER),
                                 CAST(2 * (16 + f.i) AS INTEGER)))) AS frame_text
FROM documents, (VALUES (0), (2), (4)) f(i)
WHERE n_chars >= 96
"""

# nb_quality_confusion: the whole classifier is closed-form, so the
# oracle replays it end-to-end — silver labels from the shared quality
# formula, add-1 smoothed per-class token likelihoods over the train
# split, 6-dp rounded per-term contributions (BM25 parity discipline),
# priors from doc counts, argmax with >=-ties-to-1.
ORACLE["nb_quality_confusion"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
m AS (
  SELECT doc_id, ts, len(ts) AS n,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) ELSE 0.0 END AS dr,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_filter(ts, w -> w IN ({_STOP_IN}))) AS DOUBLE) / len(ts)
              ELSE 0.0 END AS sr
  FROM t),
labeled AS (
  SELECT doc_id, ts,
         CAST(round(0.4 * least(1.0, CAST(n AS DOUBLE) / 64.0)
               + 0.3 * dr
               + 0.3 * (1.0 - least(1.0, abs(sr - 0.4) * 2.5)), 6) >= 0.52
              AS INTEGER) AS label
  FROM m),
train AS (SELECT * FROM labeled WHERE doc_id % 5 <> 0),
evals AS (SELECT * FROM labeled WHERE doc_id % 5 = 0),
cls_tok AS (
  SELECT label, term, count(*) AS c
  FROM (SELECT label, unnest(ts) AS term FROM train) GROUP BY 1, 2),
mat AS (
  SELECT term,
         CAST(sum(CASE WHEN label = 0 THEN c ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN label = 1 THEN c ELSE 0 END) AS BIGINT) AS c1
  FROM cls_tok GROUP BY term),
scal AS (
  SELECT (SELECT CAST(coalesce(sum(c0), 0) AS BIGINT) FROM mat) AS n0,
         (SELECT CAST(coalesce(sum(c1), 0) AS BIGINT) FROM mat) AS n1,
         (SELECT count(*) FROM mat) AS v,
         (SELECT count(*) FROM train WHERE label = 0) AS d0,
         (SELECT count(*) FROM train WHERE label = 1) AS d1),
eval_tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ts) AS term FROM evals) GROUP BY 1, 2),
sums AS (
  SELECT e.doc_id,
         sum(e.tf * round(ln((coalesce(mat.c0, 0) + 1.0) / (s.n0 + s.v)), 6)) AS s0,
         sum(e.tf * round(ln((coalesce(mat.c1, 0) + 1.0) / (s.n1 + s.v)), 6)) AS s1
  FROM eval_tf e LEFT JOIN mat USING (term), scal s
  GROUP BY e.doc_id),
scored AS (
  SELECT ev.label,
         CASE WHEN s.d1 = 0 THEN 0
              WHEN s.d0 = 0 THEN 1
              ELSE CAST(coalesce(su.s1, 0.0) + round(ln(CAST(s.d1 AS DOUBLE) / (s.d0 + s.d1)), 6)
                        >= coalesce(su.s0, 0.0) + round(ln(CAST(s.d0 AS DOUBLE) / (s.d0 + s.d1)), 6)
                        AS INTEGER) END AS pred
  FROM evals ev LEFT JOIN sums su USING (doc_id), scal s)
SELECT label, pred, count(*) AS n_docs FROM scored GROUP BY 1, 2
"""


# audio_stats: the staged WAVs are REAL canonical PCM containers
# (multimodal.make_wav); the oracle re-derives every field from the
# hex bytes exactly as the operator does — RIFF/WAVE/fmt/data magics
# checked, little-endian fields decoded from hex substrings, and the
# amplitude probe re-computed over the first 16 interleaved s16le
# values. Header constants below are the staging headers, not parse
# shortcuts: the WHERE clause re-validates them byte-by-byte.
_WAV_MONO_HEX = multimodal.make_wav(bytes(64), channels=1, sample_rate=16000)[:44].hex().upper()
_WAV_STEREO_HEX = multimodal.make_wav(bytes(64), channels=2, sample_rate=8000)[:44].hex().upper()
# j-th s16le of the data chunk (hex: low byte at 89+4j, high at 91+4j)
_WAV_S16 = (
    "CAST(CONCAT('0x', substring(hex, 91 + 4*j, 2),"
    " substring(hex, 89 + 4*j, 2)) AS BIGINT)"
)
ORACLE["audio_stats"] = f"""
WITH assets AS (
  SELECT doc_id AS asset_id,
         CASE WHEN doc_id % 2 = 0 THEN '{_WAV_MONO_HEX}'
              ELSE '{_WAV_STEREO_HEX}' END
           || substring(to_hex(encode(text)), 1, 128) AS hex
  FROM documents WHERE n_chars >= 64
),
parsed AS (
  SELECT asset_id, hex,
         CAST(CONCAT('0x', substring(hex, 47, 2), substring(hex, 45, 2)) AS BIGINT) AS channels_l,
         CAST(CONCAT('0x', substring(hex, 55, 2), substring(hex, 53, 2),
                     substring(hex, 51, 2), substring(hex, 49, 2)) AS BIGINT) AS sample_rate,
         CAST(CONCAT('0x', substring(hex, 71, 2), substring(hex, 69, 2)) AS BIGINT) AS bits_l,
         CAST(CONCAT('0x', substring(hex, 67, 2), substring(hex, 65, 2)) AS BIGINT) AS block_align,
         least(CAST(CONCAT('0x', substring(hex, 87, 2), substring(hex, 85, 2),
                           substring(hex, 83, 2), substring(hex, 81, 2)) AS BIGINT),
               CAST(length(hex) / 2 - 44 AS BIGINT)) AS data_size
  FROM assets
  WHERE substring(hex, 1, 8) = '52494646'
    AND substring(hex, 17, 8) = '57415645'
    AND substring(hex, 25, 8) = '666D7420'
    AND CAST(CONCAT('0x', substring(hex, 39, 2), substring(hex, 37, 2),
                    substring(hex, 35, 2), substring(hex, 33, 2)) AS BIGINT) = 16
    AND CAST(CONCAT('0x', substring(hex, 43, 2), substring(hex, 41, 2)) AS BIGINT) = 1
    AND substring(hex, 73, 8) = '64617461'
)
SELECT asset_id,
       CAST(channels_l AS INTEGER) AS channels,
       CAST(sample_rate AS BIGINT) AS sample_rate,
       CAST(bits_l AS INTEGER) AS bits_per_sample,
       CAST(data_size // block_align AS BIGINT) AS n_samples,
       round((data_size // block_align) / sample_rate, 6) AS duration_s,
       CASE WHEN bits_l = 16 AND least(16, data_size // 2) > 0 THEN
         round(list_aggregate(list_transform(
               range(0, CAST(least(16, data_size // 2) AS BIGINT)),
               j -> abs(CASE WHEN {_WAV_S16} >= 32768
                             THEN {_WAV_S16} - 65536
                             ELSE {_WAV_S16} END)), 'avg'), 6)
       END AS mean_abs_amp
FROM parsed
"""

# resize_images: nearest-neighbor 8x8 -> 4x4; output pixel (x, y)
# copies source pixel (2x, 2y), i.e. text byte 16*(i//4) + 2*(i%4) + 1
# for flat index i — the oracle re-derives the resize arithmetic from
# the source bytes, not from the operator's output.
ORACLE["resize_images"] = """
SELECT doc_id AS asset_id, 4 AS width, 4 AS height, 1 AS channels,
       round(CAST(list_aggregate(l, 'sum') AS DOUBLE) / 16.0, 6) AS mean_px,
       CAST(list_aggregate(l, 'sum') AS BIGINT) AS byte_sum
FROM (
  SELECT doc_id,
         list_transform(range(0, 16),
           i -> unicode(substring(text,
                CAST(16 * (i // 4) + 2 * (i % 4) + 1 AS INTEGER), 1))) AS l
  FROM documents WHERE n_chars >= 64
)
"""

# source_stats re-states quality_expr + the whitespace token count
# inside a per-source aggregate; per-doc quality is rounded to 6 dp
# BEFORE averaging on both sides (order-free double sums).
ORACLE["source_stats"] = f"""
WITH t AS (SELECT source, lang, {_TOK} AS ts FROM documents),
m AS (
  SELECT source, lang, len(ts) AS n,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts) ELSE 0.0 END AS dr,
         CASE WHEN len(ts) > 0
              THEN CAST(len(list_filter(ts, w -> w IN ({_STOP_IN}))) AS DOUBLE) / len(ts)
              ELSE 0.0 END AS sr
  FROM t)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_ws_tokens,
       round(avg(round(0.4 * least(1.0, CAST(n AS DOUBLE) / 64.0)
                       + 0.3 * dr
                       + 0.3 * (1.0 - least(1.0, abs(sr - 0.4) * 2.5)), 6)), 6)
         AS avg_quality,
       count(DISTINCT lang) AS n_langs
FROM m GROUP BY source
"""

ORACLE["lang_source_matrix"] = """
SELECT source,
       CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
       CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
       CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
       CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
FROM documents GROUP BY source
"""

# hashing-trick TF vectors: sparse (indices, values) arrays sorted by
# bucket; the LEFT JOIN keeps empty documents as empty vectors (the
# operator's contract — training joins must not drop examples).
ORACLE["hashing_tf"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
c AS (
  SELECT doc_id,
         CAST({_h60_sql("token")} % 1024 AS INTEGER) AS bucket,
         count(*) AS tf
  FROM tok GROUP BY doc_id, bucket
),
agg AS (
  SELECT doc_id,
         list(bucket ORDER BY bucket) AS indices,
         list(tf ORDER BY bucket) AS "values"
  FROM c GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.indices, CAST([] AS INTEGER[])) AS indices,
       coalesce(a."values", CAST([] AS BIGINT[])) AS "values"
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# idf-weighted variant: value = round(tf * (ln((N+1)/(df+1)) + 1), 6)
# with df per hash bucket and N the corpus size, both re-derived.
ORACLE["hashing_tfidf"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
c AS (
  SELECT doc_id,
         CAST({_h60_sql("token")} % 1024 AS INTEGER) AS bucket,
         count(*) AS tf
  FROM tok GROUP BY doc_id, bucket
),
dfb AS (SELECT bucket, count(*) AS df FROM c GROUP BY bucket),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
w AS (
  SELECT c.doc_id, c.bucket,
         round(c.tf * (ln((n.n_docs + 1) / CAST(dfb.df + 1 AS DOUBLE)) + 1), 6) AS w
  FROM c JOIN dfb USING (bucket) CROSS JOIN n
),
agg AS (
  SELECT doc_id,
         list(bucket ORDER BY bucket) AS indices,
         list(w ORDER BY bucket) AS "values"
  FROM w GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.indices, CAST([] AS INTEGER[])) AS indices,
       coalesce(a."values", CAST([] AS DOUBLE[])) AS "values"
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

# scalar (exploded) renderings of the two sparse-vector queries for
# the driver window: pos = rank of the bucket within the doc's sorted
# index array; empty docs contribute zero rows (arrays stay empty in
# the originals above, which keep the empty-vector contract).
ORACLE["hashing_tf_cells"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
c AS (
  SELECT doc_id,
         CAST({_h60_sql("token")} % 1024 AS INTEGER) AS bucket,
         count(*) AS tf
  FROM tok GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bucket) - 1
            AS INTEGER) AS pos,
       bucket,
       CAST(tf AS BIGINT) AS tf
FROM c
"""

ORACLE["hashing_tfidf_cells"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
c AS (
  SELECT doc_id,
         CAST({_h60_sql("token")} % 1024 AS INTEGER) AS bucket,
         count(*) AS tf
  FROM tok GROUP BY doc_id, bucket
),
dfb AS (SELECT bucket, count(*) AS df FROM c GROUP BY bucket),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
w AS (
  SELECT c.doc_id, c.bucket,
         round(c.tf * (ln((n.n_docs + 1) / CAST(dfb.df + 1 AS DOUBLE)) + 1), 6) AS tfidf
  FROM c JOIN dfb USING (bucket) CROSS JOIN n
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bucket) - 1
            AS INTEGER) AS pos,
       bucket,
       tfidf
FROM w
"""

# KMV sketch: deterministic function of the value set, so the
# approximation itself is oracle-exact (HLL could never be).
ORACLE["kmv_distinct"] = f"""
WITH tok AS (SELECT source, unnest({_TOK}) AS token FROM documents),
d AS (SELECT DISTINCT source, {_h60_sql("CAST(token AS VARCHAR)")} AS h FROM tok),
r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM d)
SELECT source, 64 AS k, count(*) AS n_kept,
       round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                  ELSE 63.0 / ((max(h) + 1) / 1152921504606846976.0) END, 6)
         AS est_distinct
FROM r WHERE rn <= 64 GROUP BY source
"""

# sequence packing: hash-bucketed concatenate-and-chunk; the oracle
# replays the exclusive prefix sum over the same (hash, id) order.
ORACLE["pack_sequences"] = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOK}) AS BIGINT) AS ws_tokens,
         {_h60_sql("CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
),
b AS (SELECT *, CAST(h % 8 AS INTEGER) AS bucket FROM t),
c AS (
  SELECT doc_id, ws_tokens, bucket,
         CAST(sum(ws_tokens) OVER (PARTITION BY bucket ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           - ws_tokens AS start
  FROM b
)
SELECT doc_id, ws_tokens, bucket,
       CAST(bucket AS BIGINT) * 4294967296 + start // 512 AS shard_id,
       start - (start // 512) * 512 AS offset
FROM c
"""

# A-ES weighted sampling: rank on the 9-dp-rounded score with doc_id
# tiebreak (see operators/sampling.weighted_sample).
ORACLE["weighted_sample"] = f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         round(ln(({_h60_sql("CAST(doc_id AS VARCHAR)")} + 1)
                  / 1152921504606846976.0) / CAST(n_chars AS DOUBLE), 9) AS score
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
  ORDER BY score DESC, doc_id LIMIT 200)
"""


# The driver-facing registry is capped at 50 entries: the driver's
# correctness harness checks the FIRST 50 registry entries only, so
# every declared query must sit inside that window to receive a
# rows/schema/hash signal. Strict sub-plan queries (an intermediate
# stage of a registered downstream query) live in EXTRA_QUERIES —
# still runnable, benched, and pytest/oracle-covered, just not
# competing for driver check slots.
#
# Ordering inside QUERIES is defensive: queries that have never had a
# driver signal (iterative/trained/multimodal, registry positions
# 51-60 in round 3) and the round-3 red events family come first, so
# a future shrink of the check window hits long-proven entries last.
def q_matryoshka_recall(spark, sf_dir):
    """Matryoshka prefix-dim retrieval curve: recall@10 of cosine
    top-k over the first 8/16/32 embedding coordinates vs the
    full-dimension ground truth, for the same 5-query eval set
    brute_force_topk uses. One corpus scan evaluates every prefix
    (the sims are slices of the same row); the oracle replays all
    four rankings in SQL with list slicing."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    return similarity.matryoshka_recall(emb, queries, dims=(8, 16, 32), k=10)


def q_gopher_quality_gate(spark, sf_dir):
    """Gopher-rule document gate (Rae'21 A1.1 defaults): per-doc rule
    metrics + per-rule flags + the conjunction — the rule-filter
    stage every C4/FineWeb-style curation pipeline starts with."""
    return text_quality.gopher_quality_gate(_docs(spark, sf_dir))


def q_mutual_knn_pairs(spark, sf_dir):
    """Reciprocal-NN duplicate candidates within SemDeDup-style
    adaptive cells (same corpus-scaled seed centroids as
    semantic_dedup): pairs where each vector is in the other's
    within-cell cosine top-3 — the high-precision complement of the
    threshold-based semantic_dedup flagging."""
    emb = _emb(spark, sf_dir)
    return similarity.mutual_knn_pairs(
        emb, _scaled_cell_centroids(emb), k=3
    )


def q_embedding_pca(spark, sf_dir):
    """First principal component + explained-variance ratio of the
    embedding cloud (anisotropy diagnostic) — distributed exact
    covariance, then 8 driver-local power-iteration rounds on the
    collected d x d matrix with per-round 6-dp quantization so both
    engines iterate on identical inputs. The oracle unrolls all 8
    matvec/normalize rounds in SQL over the same covariance CTE."""
    return similarity.embedding_pca(_emb(spark, sf_dir), n_iter=8)


# Historical r12 window grouping — kept as one half of the full
# catalog; the LIVE window is derived from _R14_WINDOW below (the
# round-13 change that made rotation a name-list edit instead of a
# two-dict shuffle). Comments inside describe the r12 rotation.
_CATALOG_R12_WINDOW: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- round-12 rotation (round-11 VERDICT item 2): lifetime
    # driver coverage is 260/260 and the never-scored backlog is
    # ZERO, so this is a pure age-based refresh — the 50 OLDEST
    # last_scored names per docs/ROTATION_AUDIT.md: all 10 sortable
    # age-5/r6 names (hashing_tf/hashing_tfidf, the only older
    # entries, are UNSORTABLE and permanently window-ineligible —
    # their scalar _cells renderings rotate instead) plus the 40
    # alphabetically-first age-4/r7 names (the remaining 10 r7 names
    # small_quantity_revenue .. zipf_fit lead the round-13 window).
    # Every entry below was gated at sf0.001 AND sf0.01 with the
    # bit-exact --pandas-canon compare (plus --vanilla-session)
    # before rotating.
    # never-scored round-12 adds (rotation policy: never-scored
    # first) — the MRL retrieval curve, the Gopher rule gate, and
    # the PCA anisotropy diagnostic, and the reciprocal-NN pair
    # miner; they displace the 4 alphabetically-LAST age-4 names
    # (record_linkage, rrf_fusion, scd2_history, semantic_dedup
    # back to the extras pool; all four lead the r13 window with
    # the other r7 leftovers) --
    "matryoshka_recall": q_matryoshka_recall,
    "gopher_quality_gate": q_gopher_quality_gate,
    "embedding_pca": q_embedding_pca,
    "mutual_knn_pairs": q_mutual_knn_pairs,
    # age-5 (last scored r6) --
    "audio_stats": q_audio_stats,
    "bigram_logprob": q_bigram_logprob,
    "bm25_topk": q_bm25_topk,
    "brute_force_topk": q_brute_force_topk,
    "co_engagement": q_co_engagement,
    "cohort_retention": q_cohort_retention,
    "curated_corpus": q_curated_corpus,
    "verified_near_dupes": q_verified_near_dupes,
    "weighted_sample": q_weighted_sample,
    "word_count": q_word_count,
    # age-4 (last scored r7), alphabetically first 40 --
    "bfs_hops": q_bfs_hops,
    "bigram_count": q_bigram_count,
    "bloom_decontamination": q_bloom_decontamination,
    "boolean_retrieval_text": q_boolean_retrieval_text,
    "bpe_merges": q_bpe_merges,
    "bpe_vocab": q_bpe_vocab,
    "char_entropy": q_char_entropy,
    "clustering_coefficient": q_clustering_coefficient,
    "component_size_histogram": q_component_size_histogram,
    "cooccurrence": q_cooccurrence,
    "customer_distribution": q_customer_distribution,
    "degree_assortativity": q_degree_assortativity,
    "forecast_revenue": q_forecast_revenue,
    "harmonic_centrality": q_harmonic_centrality,
    "hashing_tf_cells": q_hashing_tf_cells,
    "hashing_tfidf_cells": q_hashing_tfidf_cells,
    "heldout_logprob": q_heldout_logprob,
    "hits": q_hits,
    "hourly_counts": q_hourly_counts,
    "incremental_dedup": q_incremental_dedup,
    "inverted_index_stats": q_inverted_index_stats,
    "ivf_recall_report": q_ivf_recall_report,
    "kcore": q_kcore,
    "knn_label_accuracy": q_knn_label_accuracy,
    "link_prediction": q_link_prediction,
    "market_share": q_market_share,
    "ngram_novelty": q_ngram_novelty,
    "pagerank_convergence": q_pagerank_convergence,
    "part_bracket_revenue": q_part_bracket_revenue,
    "pmi": q_pmi,
    "point_in_time_state": q_point_in_time_state,
    "prefix_jaccard": q_prefix_jaccard,
    "promo_revenue": q_promo_revenue,
    "prospective_customers": q_prospective_customers,
    "quantization_error": q_quantization_error,
    "query_likelihood": q_query_likelihood,
}


# Historical r12 extras grouping — the other half of the catalog
# (see _CATALOG_R12_WINDOW above). Strict sub-plans of registered
# queries and rotated-out entries; every entry keeps its DuckDB
# oracle and is exercised by tools/check_correctness.py --all and
# the pytest suite regardless of window membership.
_CATALOG_R12_EXTRA: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # displaced from the r12 window by the never-scored round-12 adds
    # (all driver-green in r7; still oracle-checked every round) --
    "record_linkage": q_record_linkage,
    "rrf_fusion": q_rrf_fusion,
    "scd2_history": q_scd2_history,
    "semantic_dedup": q_semantic_dedup,
    # -- rotated OUT of the driver window in round 12 (all 50 were
    # driver-green in r11; displaced by the age-based refresh —
    # still oracle-checked every round via --all and pytest) --
    "embedding_covariance": q_embedding_covariance,
    "jpeg_decode_stats": q_jpeg_decode_stats,
    "mjpeg_frame_stats": q_mjpeg_frame_stats,
    "mp4_frame_text": q_mp4_frame_text,
    "pq_codes": q_pq_codes,
    "pq_adc_topk": q_pq_adc_topk,
    "pq_recall_report": q_pq_recall_report,
    "ivf_silhouette": q_ivf_silhouette,
    "tf_idf": q_tf_idf,
    "token_counts": q_token_counts,
    "top_orders_per_customer": q_top_orders_per_customer,
    "top_revenue_orders": q_top_revenue_orders,
    "user_sessions": q_user_sessions,
    "value_percentiles": q_value_percentiles,
    "dense_hourly_counts": q_dense_hourly_counts,
    "ivf_topk_trained": q_ivf_topk_trained,
    "revenue_by_nation": q_revenue_by_nation,
    "shuffle_shards": q_shuffle_shards,
    "top_keywords": q_top_keywords,
    "value_buckets": q_value_buckets,
    "dedup_apply": q_dedup_apply,
    "dedup_clusters": q_dedup_clusters,
    "degree_histogram": q_degree_histogram,
    "funnel_counts": q_funnel_counts,
    "graph_components": q_graph_components,
    "hourly_anomalies": q_hourly_anomalies,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "kmv_distinct": q_kmv_distinct,
    "lang_source_matrix": q_lang_source_matrix,
    "latest_events": q_latest_events,
    "llr": q_llr,
    "normalize_events": q_normalize_events,
    "pack_sequences": q_pack_sequences,
    "pagerank": q_pagerank,
    "per_key_sample": q_per_key_sample,
    "personalized_pagerank": q_personalized_pagerank,
    "profile_events": q_profile_events,
    "quantize_embeddings": q_quantize_embeddings,
    "resize_images": q_resize_images,
    "rolling_active_users": q_rolling_active_users,
    "snapshot_diff": q_snapshot_diff,
    "source_overlap": q_source_overlap,
    "source_stats": q_source_stats,
    "stratified_sample": q_stratified_sample,
    "streaming_enriched_counts": q_streaming_enriched_counts,
    "streaming_latest_events": q_streaming_latest_events,
    "streaming_snapshot_sink": q_streaming_snapshot_sink,
    "top_terms_per_source": q_top_terms_per_source,
    "triangle_count": q_triangle_count,
    "unigram_logprob": q_unigram_logprob,
    # -- rotated out in earlier rounds (each driver-green in its own
    # window; still oracle-checked every round via --all and pytest) --
    "csv_roundtrip": q_csv_roundtrip,
    "orc_roundtrip": q_orc_roundtrip,
    "incremental_rollup": q_incremental_rollup,
    "schema_evolution": q_schema_evolution,
    "png_decode_stats": q_png_decode_stats,
    "nb_quality_confusion": q_nb_quality_confusion,
    "lpa_communities": q_lpa_communities,
    "boolean_retrieval": q_boolean_retrieval,
    "cooccurrence_stripes": q_cooccurrence_stripes,
    "deterministic_sample": q_deterministic_sample,
    "hourly_counts_errors": q_hourly_counts_errors,
    "hourly_counts_tweets": q_hourly_counts_tweets,
    "ivf_assign": q_ivf_assign,
    "minhash_signatures": q_minhash_signatures,
    "shingles": q_shingles,
    "simhash": q_simhash,
    "term_frequencies": q_term_frequencies,
    "asof_join": q_asof_join,
    "bucketed_customer_orders": q_bucketed_customer_orders,
    "chunk_documents": q_chunk_documents,
    "customers_without_orders": q_customers_without_orders,
    "doc_fingerprint": q_doc_fingerprint,
    "embedding_near_dupes": q_embedding_near_dupes,
    "event_props_stats": q_event_props_stats,
    "exact_duplicates": q_exact_duplicates,
    "frame_sample": q_frame_sample,
    "hash_split": q_hash_split,
    "hourly_counts_tweets_egypt": q_hourly_counts_tweets_egypt,
    "hypertable_rollup": q_hypertable_rollup,
    "image_stats": q_image_stats,
    "language_id": q_language_id,
    "lsh_topk": q_lsh_topk,
    "media_sniff": q_media_sniff,
    "minhash_lsh_candidates": q_minhash_lsh_candidates,
    "ngram_jaccard": q_ngram_jaccard,
    "phash_duplicates": q_phash_duplicates,
    "pii_scrub": q_pii_scrub,
    "pricing_summary": q_pricing_summary,
    "quality_score": q_quality_score,
    "range_join": q_range_join,
    "repetition_stats": q_repetition_stats,
    "salted_order_revenue": q_salted_order_revenue,
    "simhash_near_dupes": q_simhash_near_dupes,
    "sliding_hourly_stats": q_sliding_hourly_stats,
    "sql_revenue_by_nation": q_sql_revenue_by_nation,
    "streaming_dedup": q_streaming_dedup,
    "streaming_hourly_counts": q_streaming_hourly_counts,
    "streaming_user_sessions": q_streaming_user_sessions,
    "tf_histogram": q_tf_histogram,
    # -- earlier extras (each driver-green in a past window or
    # covered by --all; see docs/ROTATION_AUDIT.md ages) --
    "record_linkage_topk": q_record_linkage_topk,
    "dup_span_report": q_dup_span_report,
    "dsir_weights": q_dsir_weights,
    "perplexity_buckets": q_perplexity_buckets,
    "mrr_eval": q_mrr_eval,
    "corpus_card": q_corpus_card,
    "phrase_search": q_phrase_search,
    "prefix_search": q_prefix_search,
    "ivf_index_probe": q_ivf_index_probe,
    "bpe_merges_local": q_bpe_merges_local,
    "bpe_token_counts": q_bpe_token_counts,
    "oov_rate": q_oov_rate,
    "vocab_overlap_matrix": q_vocab_overlap_matrix,
    "idf_drift": q_idf_drift,
    "countmin_words": q_countmin_words,
    "hash_collision_report": q_hash_collision_report,
    "minhash_calibration": q_minhash_calibration,
    "cluster_canonical": q_cluster_canonical,
    "dedup_savings": q_dedup_savings,
    "containment_pairs": q_containment_pairs,
    "contamination_flags": q_contamination_flags,
    "eval_substring_hits": q_eval_substring_hits,
    "sentence_dedup_stats": q_sentence_dedup_stats,
    "nn_similarity_histogram": q_nn_similarity_histogram,
    "random_projection": q_random_projection,
    "hard_negatives": q_hard_negatives,
    "label_centroids": q_label_centroids,
    "centroid_confusion": q_centroid_confusion,
    "label_spread": q_label_spread,
    "language_id_accuracy": q_language_id_accuracy,
    "sentence_stats": q_sentence_stats,
    "length_histogram": q_length_histogram,
    "length_drift_psi": q_length_drift_psi,
    "quality_length_correlation": q_quality_length_correlation,
    "span_corruption": q_span_corruption,
    "balance_classes": q_balance_classes,
    "corpus_mix": q_corpus_mix,
    "key_skew_report": q_key_skew_report,
    "aspect_ratio_histogram": q_aspect_ratio_histogram,
    "packing_efficiency": q_packing_efficiency,
    "index_shard_balance": q_index_shard_balance,
    "compact_small_files": q_compact_small_files,
    "manifest_ingest": q_manifest_ingest,
    "csv_malformed_report": q_csv_malformed_report,
    "filter_funnel_examples": q_filter_funnel_examples,
    "streaming_session_stats": q_streaming_session_stats,
    "streaming_countmin": q_streaming_countmin,
    "streaming_sliding_counts": q_streaming_sliding_counts,
    "streaming_top_users": q_streaming_top_users,
    "volume_shipping": q_volume_shipping,
    "top_supplier": q_top_supplier,
    "small_quantity_revenue": q_small_quantity_revenue,
    "top_return_customers": q_top_return_customers,
    "split_leakage": q_split_leakage,
    "vocab_coverage": q_vocab_coverage,
    "tokenizer_fertility": q_tokenizer_fertility,
    "zipf_fit": q_zipf_fit,
    "streaming_interval_join": q_streaming_interval_join,
    "streaming_quality_gate": q_streaming_quality_gate,
    "hashing_tf": q_hashing_tf,
    "hashing_tfidf": q_hashing_tfidf,
    "semantic_decontamination": q_semantic_decontamination,
    "margin_bitext": q_margin_bitext,
    "temperature_mix": q_temperature_mix,
    "dp_event_counts": q_dp_event_counts,
    "shipping_priority": q_shipping_priority,
    "large_volume_orders": q_large_volume_orders,
    "target_encoding": q_target_encoding,
    "k_anonymity": q_k_anonymity,
    "temporal_split": q_temporal_split,
    "revenue_rollup": q_revenue_rollup,
    "nation_trade_balance": q_nation_trade_balance,
    "discount_effectiveness": q_discount_effectiveness,
    "region_nation_share": q_region_nation_share,
    "pareto_report": q_pareto_report,
    "brand_nation_revenue": q_brand_nation_revenue,
    "late_orders_by_priority": q_late_orders_by_priority,
    "rfm_segments": q_rfm_segments,
    "customer_growth_topk": q_customer_growth_topk,
    "order_size_correlation": q_order_size_correlation,
    "order_gap_stats": q_order_gap_stats,
    "lines_per_order_histogram": q_lines_per_order_histogram,
    "winsorize_values": q_winsorize_values,
    "numeric_percentiles_profile": q_numeric_percentiles_profile,
    "robust_outliers": q_robust_outliers,
    "revenue_share": q_revenue_share,
    "revenue_lag_features": q_revenue_lag_features,
    "conversion_lag": q_conversion_lag,
    "conversion_by_activity": q_conversion_by_activity,
    "last_touch_attribution": q_last_touch_attribution,
    "linear_attribution": q_linear_attribution,
    "transition_latency": q_transition_latency,
    "session_paths": q_session_paths,
    "activity_heatmap": q_activity_heatmap,
    "event_transitions": q_event_transitions,
    "event_cube": q_event_cube,
    "session_stats": q_session_stats,
    "daily_trend": q_daily_trend,
    "interarrival_rates": q_interarrival_rates,
    "ab_test_zscore": q_ab_test_zscore,
    "user_entropy": q_user_entropy,
    "filter_funnel": q_filter_funnel,
    "basket_lift": q_basket_lift,
    "user_purge_report": q_user_purge_report,
    "seasonal_anomalies": q_seasonal_anomalies,
    "ewma_hourly": q_ewma_hourly,
    "slo_burn_rate": q_slo_burn_rate,
    "hourly_top_movers": q_hourly_top_movers,
    "yoy_growth": q_yoy_growth,
    "rolling_weekly_revenue": q_rolling_weekly_revenue,
    "interpolate_gaps": q_interpolate_gaps,
}


# -- round-13 new-operator oracles --

# unimax_allocation: the per-row cap test over raw-capacity prefix
# sums (valid by the monotone-failure argument in the operator
# docstring); all arithmetic is exact-integer-in-double until the
# final level division, so both engines agree bit-for-bit pre-round.
ORACLE["unimax_allocation"] = """
WITH g AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_units
           FROM documents GROUP BY source),
t AS (SELECT source, n_units,
        n_units * 4.0 AS capacity,
        0.5 * SUM(n_units) OVER () AS b,
        COUNT(*) OVER () AS n_src,
        ROW_NUMBER() OVER (ORDER BY n_units * 4.0 ASC, source ASC) AS r,
        COALESCE(SUM(n_units * 4.0) OVER (
          ORDER BY n_units * 4.0 ASC, source ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
          AS cum_prev
      FROM g),
c AS (SELECT *,
        (capacity * (n_src - r + 1) <= b - cum_prev) AS capped
      FROM t),
s AS (SELECT *,
        COALESCE(SUM(CASE WHEN capped THEN capacity END) OVER (), 0.0)
          AS capped_sum,
        SUM(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS n_capped
      FROM c)
SELECT source, n_units, round(capacity, 6) AS capacity, capped,
       round(CASE WHEN capped THEN capacity
             ELSE (b - capped_sum) / (n_src - n_capped) END, 6)
         AS allocation,
       CASE WHEN n_units > 0 THEN
         round(CASE WHEN capped THEN capacity
               ELSE (b - capped_sum) / (n_src - n_capped) END / n_units, 6)
       END AS epochs
FROM s
"""

# heaps_law_fit: id-range buckets (integer div — no global window on
# data-sized input), first occurrence = min(doc_id) per type,
# cumulative sums + regr fit on the 10-row scaffold.
ORACLE["heaps_law_fit"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS ts FROM documents),
mx AS (SELECT max(doc_id) AS m FROM documents),
d AS (SELECT least(9, (doc_id * 10) // (m + 1)) AS bucket,
             len(ts) AS n_tok
      FROM t, mx),
tk AS (SELECT bucket, SUM(n_tok) AS n_tok FROM d GROUP BY bucket),
fo AS (SELECT min(doc_id) AS first_id
       FROM (SELECT doc_id, unnest(ts) AS token FROM t)
       GROUP BY token),
nv AS (SELECT least(9, (first_id * 10) // (m + 1)) AS bucket,
              count(*) AS new_types
       FROM fo, mx GROUP BY 1),
sc AS (SELECT r AS bucket FROM range(0, 10) t(r)),
c AS (SELECT sc.bucket,
        CAST(SUM(COALESCE(tk.n_tok, 0)) OVER (ORDER BY sc.bucket)
             AS BIGINT) AS cum_tokens,
        CAST(SUM(COALESCE(nv.new_types, 0)) OVER (ORDER BY sc.bucket)
             AS BIGINT) AS cum_vocab
      FROM sc LEFT JOIN tk ON tk.bucket = sc.bucket
              LEFT JOIN nv ON nv.bucket = sc.bucket),
fit AS (SELECT round(regr_slope(ln(cum_vocab), ln(cum_tokens)), 6)
          AS heaps_beta,
        round(regr_intercept(ln(cum_vocab), ln(cum_tokens)), 6)
          AS heaps_logk
        FROM c WHERE cum_tokens > 0 AND cum_vocab > 0)
SELECT CAST(c.bucket AS INTEGER) AS bucket, cum_tokens, cum_vocab,
       heaps_beta, heaps_logk
FROM c, fit
"""

# winnowing: positional 3-gram h28 hashes, min of every 4-hash
# window (short docs = one whole-doc window), distinct per doc —
# mirrored list_transform/list_min lambdas.
_WINNOW_FPS = """
  SELECT doc_id, len(ts) - 2 AS n_kgrams,
         list_distinct(list_transform(
           range(1, greatest(1, (len(ts) - 2) - 4 + 1) + 1),
           p -> list_min(hs[p:p+3]))) AS fps
  FROM (SELECT doc_id, ts,
          list_transform(range(1, len(ts) - 1),
            i -> CAST(CONCAT('0x',
                   substring(md5(array_to_string(ts[i:i+2], ' ')), 1, 7))
                 AS BIGINT)) AS hs
        FROM (SELECT doc_id, {tok} AS ts FROM documents)
        WHERE len(ts) >= 3)
""".format(tok=_TOK)

ORACLE["winnowing_fingerprints"] = f"""
SELECT doc_id, CAST(n_kgrams AS INTEGER) AS n_kgrams,
       CAST(len(fps) AS INTEGER) AS n_fingerprints,
       round(len(fps) / CAST(n_kgrams AS DOUBLE), 6) AS density
FROM ({_WINNOW_FPS})
"""

ORACLE["winnowing_candidates"] = f"""
WITH fp0 AS (SELECT doc_id, unnest(fps) AS fp FROM ({_WINNOW_FPS})),
hot AS (SELECT fp FROM fp0 GROUP BY fp HAVING count(*) > 50),
fp AS (SELECT * FROM fp0 WHERE fp NOT IN (SELECT fp FROM hot))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM fp a JOIN fp b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


# -- round-13 new operators (public literature; see each docstring) --
def q_unimax_allocation(spark, sf_dir):
    """UniMax water-filling budget allocation (Chung'23) across the
    documents corpus's sources: budget = half the total characters,
    epoch cap 4 — the closed-form fair-sampling complement of
    temperature_mix's exponential smoothing."""
    return sampling.unimax_allocation(
        _docs(spark, sf_dir), group_col="source", size_col="n_chars",
        budget_frac=0.5, max_epochs=4.0,
    )


def q_heaps_law_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve + log-log fit over the
    documents corpus in doc_id order — the dual diagnostic of
    zipf_fit (dup-heavy corpora bend early; OCR-garbage corpora
    stay near-linear)."""
    return text_quality.heaps_law_fit(_docs(spark, sf_dir), n_buckets=10)


def q_winnowing_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprint density per document: 3-gram
    hashes, window 4 — the guaranteed-recall deterministic sampling
    stage for substring-level duplicate detection."""
    return dedup.winnowing_fingerprints(_docs(spark, sf_dir), n=3, w=4)


def q_winnowing_candidates(spark, sf_dir):
    """MOSS matching stage: candidate pairs sharing >= 2 winnowed
    fingerprints, document-frequency cap 50 on boilerplate
    fingerprints."""
    return dedup.winnowing_candidates(
        _docs(spark, sf_dir), n=3, w=4, min_shared=2, fp_df_cap=50
    )


# dedup_threshold_curve: the pairs CTE replicates ngram_jaccard
# exactly (base filter on the UNROUNDED jaccard at the loosest
# threshold), then every curve compare runs on the 6dp-rounded value
# against CAST-to-DOUBLE threshold literals — identical boundary
# semantics in both engines.
ORACLE["dedup_threshold_curve"] = f"""
WITH sh AS ({_SHINGLES_3}),
sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT doc_a, doc_b,
         round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
  FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.1
),
th AS (SELECT CAST(t AS DOUBLE) AS threshold
       FROM (VALUES (0.1), (0.3), (0.5), (0.7), (0.9)) v(t)),
cand AS (SELECT th.threshold, p.doc_b
         FROM th JOIN pairs p ON p.jaccard >= th.threshold),
np AS (SELECT threshold, count(*) AS n_pairs FROM cand GROUP BY threshold),
fd AS (SELECT DISTINCT threshold, doc_b FROM cand),
tc AS (SELECT doc_id, len({_TOK}) AS n_tok FROM documents),
tot AS (SELECT SUM(n_tok) AS total FROM tc),
fl AS (SELECT threshold, count(*) AS n_docs, SUM(tc.n_tok) AS toks
       FROM fd JOIN tc ON tc.doc_id = fd.doc_b GROUP BY threshold)
SELECT th.threshold,
       CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(fl.n_docs, 0) AS BIGINT) AS n_docs_flagged,
       CAST(COALESCE(fl.toks, 0) AS BIGINT) AS tokens_flagged,
       round(COALESCE(fl.toks, 0) / CAST((SELECT total FROM tot) AS DOUBLE), 6)
         AS savings_pct
FROM th LEFT JOIN np ON np.threshold = th.threshold
        LEFT JOIN fl ON fl.threshold = th.threshold
"""


def q_dedup_threshold_curve(spark, sf_dir):
    """Savings-vs-threshold calibration sweep over the exact n-gram
    Jaccard pairs: ONE candidate join at the loosest threshold feeds
    all five curve points; zero-hit thresholds emit zeros rows."""
    return dedup.dedup_threshold_curve(
        _docs(spark, sf_dir), thresholds=(0.1, 0.3, 0.5, 0.7, 0.9), n=3
    )


def q_cluster_aware_split(spark, sf_dir):
    """Leakage-proof split: near-dup components (the dedup_clusters
    pair graph at the same threshold) hash-split by their
    representative, so no candidate pair can straddle splits — the
    constructive fix for what split_leakage reports."""
    return dedup.cluster_aware_split(
        _docs(spark, sf_dir),
        dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.1),
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )


# hash-bin of the cluster representative — the _DOC_BIN formula (h60
# mod 1e6) keyed on rep instead of doc_id
_REP_BIN = (
    "CAST(CONCAT('0x', substring(md5(CAST(rep AS VARCHAR)), 1, 15)) AS BIGINT)"
    " % 1000000"
)

# cluster_aware_split: the dedup_clusters recursive closure feeds a
# LEFT join (singletons keep their own id as rep), then the exact
# hash_split CASE on the representative.
ORACLE["cluster_aware_split"] = f"""
WITH RECURSIVE pairs AS (
{ORACLE["ngram_jaccard"]}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lab) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
),
lab AS (SELECT node AS doc_id, min(lab) AS canonical_id FROM reach GROUP BY node),
keyed AS (
  SELECT d.doc_id, COALESCE(l.canonical_id, d.doc_id) AS rep
  FROM documents d LEFT JOIN lab l USING (doc_id)
)
SELECT doc_id, rep,
       CASE WHEN {_REP_BIN} < 800000 THEN 'train'
            WHEN {_REP_BIN} < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM keyed
"""


# Catalog additions this round: the first four enter the r13 driver
# window (never-scored-first); dedup_threshold_curve lands in
# EXTRA_QUERIES (the r13 window was already gated when it was added)
# and leads the r14 rotation as its never-scored entry.
_R13_NEW: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "unimax_allocation": q_unimax_allocation,
    "heaps_law_fit": q_heaps_law_fit,
    "winnowing_fingerprints": q_winnowing_fingerprints,
    "winnowing_candidates": q_winnowing_candidates,
    "dedup_threshold_curve": q_dedup_threshold_curve,
}


# ---------------------------------------------------------------------------
# Round-14 driver window (round-13 VERDICT item 1): never-scored
# first — dedup_threshold_curve, the registry's ONLY never-scored
# entry (committed after the r13 window froze) — then the 50-oldest
# age-based refresh per docs/ROTATION_AUDIT.md: the 23 r8-scored
# (age-6) names (led by the 4 the r13 never-scored adds displaced:
# order_size_correlation, pareto_report, region_nation_share,
# revenue_lag_features) and the 26 alphabetically-first r9-scored
# (age-5) names (the remaining r9 block — length_drift_psi onward —
# leads the r15 window). hashing_tf/hashing_tfidf stay permanently
# window-ineligible (UNSORTABLE — driver pandas canonicalizer);
# their scalar _cells renderings already rotate. Every entry below
# was gated at sf0.001 AND sf0.01 with the bit-exact --pandas-canon
# compare (plus --vanilla-session for the TIMESTAMP-rendering
# shipping_priority) before rotating in.
_R14_WINDOW: tuple[str, ...] = (
    # never-scored (rotation policy: never-scored first) --
    "dedup_threshold_curve",
    # age-6 (last scored r8) --
    "order_size_correlation",
    "pareto_report",
    "region_nation_share",
    "revenue_lag_features",
    "revenue_rollup",
    "revenue_share",
    "rfm_segments",
    "robust_outliers",
    "rolling_weekly_revenue",
    "seasonal_anomalies",
    "semantic_decontamination",
    "session_paths",
    "session_stats",
    "shipping_priority",
    "slo_burn_rate",
    "target_encoding",
    "temperature_mix",
    "temporal_split",
    "transition_latency",
    "user_entropy",
    "user_purge_report",
    "winsorize_values",
    "yoy_growth",
    # age-5 (last scored r9), alphabetically first 26 --
    "balance_classes",
    "bpe_merges_local",
    "bpe_token_counts",
    "centroid_confusion",
    "cluster_canonical",
    "compact_small_files",
    "containment_pairs",
    "contamination_flags",
    "corpus_card",
    "corpus_mix",
    "countmin_words",
    "csv_malformed_report",
    "dedup_savings",
    "dsir_weights",
    "dup_span_report",
    "eval_substring_hits",
    "filter_funnel_examples",
    "hard_negatives",
    "hash_collision_report",
    "idf_drift",
    "index_shard_balance",
    "ivf_index_probe",
    "key_skew_report",
    "label_centroids",
    "label_spread",
    "language_id_accuracy",
)

# Round-14 addition: lands in EXTRA_QUERIES (the r14 window was
# gated before it existed) and leads the r15 rotation as its
# never-scored entry.
_R14_NEW: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cluster_aware_split": q_cluster_aware_split,
}

_CATALOG: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **_CATALOG_R12_WINDOW,
    **_CATALOG_R12_EXTRA,
    **_R13_NEW,
    **_R14_NEW,
}

# The LIVE driver check window (exactly 50 entries) and the extras
# pool, derived from the catalog so a rotation is a name-list edit.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _CATALOG[name] for name in _R14_WINDOW
}
EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    k: v for k, v in _CATALOG.items() if k not in QUERIES
}

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **QUERIES,
    **EXTRA_QUERIES,
}

assert len(QUERIES) == 50, f"driver check window is 50, got {len(QUERIES)}"
assert len(_R14_WINDOW) == len(set(_R14_WINDOW)), "duplicate window name"
assert len(ALL_QUERIES) == len(_CATALOG), "window lost a catalog entry"
