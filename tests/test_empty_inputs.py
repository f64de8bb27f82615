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
