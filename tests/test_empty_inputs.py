"""Every round-5 extension operator must degrade to an empty (or
zero-count) result on an empty input — not crash. The driver never
feeds empty tables, but a real pipeline's first day does."""

from __future__ import annotations

import pytest

from mapreduce_assignments_spark.operators import (
    features,
    graph,
    multimodal,
    packing,
    sampling,
    sketches,
    text_quality,
)


@pytest.fixture(scope="module")
def empties(spark):
    return {
        "docs": spark.createDataFrame(
            [], "doc_id long, text string, lang string, source string, n_chars long"
        ),
        "assets": spark.createDataFrame([], "asset_id long, content binary"),
        "graph": spark.createDataFrame([], "id int, adj array<int>"),
        "kv": spark.createDataFrame([], "key string, grp string"),
    }


def test_empty_inputs_degrade_gracefully(empties):
    d, a, g, kv = empties["docs"], empties["assets"], empties["graph"], empties["kv"]
    assert multimodal.audio_stats(a).collect() == []
    assert multimodal.resize_images(a, 4, 4).collect() == []
    assert text_quality.source_stats(d).collect() == []
    assert text_quality.lang_source_matrix(d, ["en"]).collect() == []
    assert sketches.kmv_distinct(kv, "key", "grp").collect() == []
    assert sampling.weighted_sample(d, "doc_id", "n_chars", 5).collect() == []
    assert packing.pack_sequences(
        d.selectExpr("doc_id", "n_chars AS toks"), "toks", 64
    ).collect() == []
    assert features.hashing_tf(d).collect() == []
    assert graph.degree_histogram(g).collect() == []
    [r] = graph.triangle_count(g).collect()  # global agg: one zero row
    assert r["n_triangles"] == 0


def test_batch4_operators_degrade_gracefully(spark, empties):
    from mapreduce_assignments_spark.operators import (
        index,
        profiling,
        temporal,
    )

    d = empties["docs"]
    ev = spark.createDataFrame(
        [], "user_id long, event_type string, event_id long, ts timestamp, value double"
    )
    assert text_quality.unigram_logprob(d).collect() == []
    assert text_quality.bigram_logprob(d).collect() == []
    assert index.top_keywords(d).collect() == []
    assert sampling.per_key_sample(d, "source", "doc_id", 3).collect() == []
    assert temporal.latest_snapshot(
        ev, keys=("user_id", "event_type"), tiebreak="event_id"
    ).collect() == []
    # profile of an empty table: one row per column, all-zero counts,
    # NULL bounds — not an empty frame (the report shape is the contract)
    rows = {r["column"]: r for r in profiling.profile_columns(ev, ["user_id", "value"]).collect()}
    assert set(rows) == {"user_id", "value"}
    for r in rows.values():
        assert (r["n_rows"], r["non_null"], r["n_distinct"]) == (0, 0, 0)
        assert r["min_value"] is None and r["max_value"] is None


def test_batch6_operators_degrade_gracefully(spark, empties):
    from mapreduce_assignments_spark.operators import features, funnel

    d = empties["docs"]
    ev = spark.createDataFrame(
        [], "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    assert features.bpe_merges(d).collect() == []
    assert features.bpe_encode(d, [("a", "b")]).collect() == []
    assert features.normalize_values(ev, "value", "event_type").collect() == []
    assert funnel.co_engagement(ev).collect() == []
    assert funnel.rolling_active_users(ev).collect() == []


def test_round8_operators_degrade_gracefully(spark, empties):
    from mapreduce_assignments_spark.operators import dedup, index, profiling
    from mapreduce_assignments_spark.operators import sampling as smp

    d = empties["docs"]
    assert dedup.dup_span_report(d, window=5).collect() == []
    assert smp.dsir_weights(d, d, n_buckets=16).collect() == []
    from mapreduce_assignments_spark.operators.text_quality import (
        perplexity_buckets,
    )
    assert perplexity_buckets(d).collect() == []
    assert index.mrr_eval(d).collect() == []
    assert profiling.corpus_card(d).collect() == []
    cust = spark.createDataFrame([], "id long, name string, blk string")
    assert dedup.record_linkage_pairs(
        cust, "id", "name", ["blk"], max_pairs_per_record=3
    ).collect() == []


def test_round12_operators_degrade_gracefully(spark, empties):
    from mapreduce_assignments_spark.operators import similarity

    d = empties["docs"]
    emb = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    cen = spark.createDataFrame([], "cell_id long, c array<double>")
    q = spark.createDataFrame([], "query_id long, q array<double>")
    assert text_quality.gopher_quality_gate(d).collect() == []
    assert similarity.matryoshka_recall(emb, q, dims=(2,), k=3).collect() == []
    assert similarity.mutual_knn_pairs(emb, cen, k=3).collect() == []
    assert similarity.embedding_pca(emb).collect() == []
