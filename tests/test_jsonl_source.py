"""JSONL document source: schema enforcement + malformed-line policy."""

from __future__ import annotations

import json

from mapreduce_assignments_spark.sources.text_corpus import read_documents_jsonl


def test_jsonl_reader_drops_garbage_keeps_unicode(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "plain ascii", "lang": "en", "source": "s", "n_chars": 11},
        {"doc_id": 2, "text": "unicode é中文 \"quoted\"\ttab", "lang": "zh", "source": "s", "n_chars": 15},
        {"doc_id": 3, "text": None, "lang": None, "source": "s", "n_chars": 0},
    ]
    with open(p, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.write("{definitely not json\n")          # parse error: dropped
        fh.write('{"text": "no id here"}\n')        # no doc_id: dropped
        fh.write('[1, 2, 3]\n')                     # not an object: dropped
    out = {r["doc_id"]: r for r in read_documents_jsonl(spark, str(p)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["text"] == rows[1]["text"]  # exact unicode/escape roundtrip
    assert out[3]["text"] is None and out[3]["lang"] is None
    assert [f.name for f in read_documents_jsonl(spark, str(p)).schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
