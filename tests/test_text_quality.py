from __future__ import annotations

import pytest

from mapreduce_assignments_spark.operators.text_quality import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_counts,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello, world! x2 go"), (2, ""), (3, "a  b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_counts(df).collect()}
    assert out[1]["ws_tokens"] == 4
    # hello , world ! x 2 go
    assert out[1]["bpe_tokens"] == 7
    assert out[2]["ws_tokens"] == 0 and out[2]["bpe_tokens"] == 0
    assert out[3]["ws_tokens"] == 2


def test_quality_score_bounds_and_order(spark):
    rows = [
        (1, " ".join(["the word of a story and it is here to stay"] * 8)),  # long, stopword-rich
        (2, "x"),  # degenerate
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    assert all(0.0 <= v <= 1.0 for v in out.values())
    assert out[1] > out[2] >= out[3]


def test_language_id(spark):
    rows = [
        (1, "the cat and the dog is here"),
        (2, "le chat et la maison est grande"),
        (3, "der hund und die katze ist hier"),
        (4, "el problema es que los datos y mas"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "fr"
    assert out[3] == "de"
    assert out[4] == "es"


def test_language_id_tiebreak_alphabetical(spark):
    df = spark.createDataFrame([(1, "xyzzy plugh")], "doc_id long, text string")
    out = language_id(df).collect()[0]
    assert out["score"] == 0
    assert out["pred_lang"] == "de"  # alphabetically first on all-zero scores


def test_doc_fingerprint_deterministic_and_dup_sensitive(spark):
    text = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now ok yes")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"] for r in doc_fingerprint(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    # short doc: whole-text fingerprint, no crash
    short = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    assert doc_fingerprint(short).collect()[0]["fingerprint"] is not None
