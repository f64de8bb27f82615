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


def test_csv_reader_quoting_and_malformed(spark, tmp_path):
    """RFC-4180 round-trip: fields containing commas, quotes, and the
    quote-escape sequence survive write->read; malformed rows drop."""
    import pyspark.sql.functions as F

    from mapreduce_assignments_spark.sources.text_corpus import (
        read_documents_csv,
    )

    rows = [
        (1, 'comma, inside', "en", "web", 13),
        (2, 'she said "hi" twice', "en", "web", 19),
        (3, 'both, "quoted, and" commas', "fr", "books", 26),
        (4, "", "de", "web", 0),
    ]
    src = str(tmp_path / "docs_csv")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.option("quote", '"').option("escape", '"').csv(src)
    import os

    with open(os.path.join(src, "part-malformed.csv"), "w") as fh:
        fh.write("oops,not a number first,en,web,3\n")
        fh.write(',"no id",en,web,5\n')
    got = {
        r["doc_id"]: (r["text"], r["lang"], r["source"], r["n_chars"])
        for r in read_documents_csv(spark, src).collect()
    }
    # Spark's CSV writer emits empty string as an empty unquoted field,
    # which reads back as NULL (the documented CSV ambiguity) — text
    # equality is asserted on the non-empty rows, presence on all four
    assert set(got) == {1, 2, 3, 4}
    for doc_id, (text, lang, source, n_chars) in list(got.items()):
        if doc_id != 4:
            assert (text, lang, source, n_chars) == rows[doc_id - 1][1:]


def test_orc_roundtrip_unicode_and_pushdown(spark, tmp_path):
    """ORC write→read preserves exact values (incl. unicode/NULLs) and
    the columnar contract holds: projection prunes ReadSchema and the
    doc_id predicate is pushed into the ORC scan."""
    from mapreduce_assignments_spark.sources.text_corpus import read_documents_orc

    rows = [
        (1, "plain ascii", "en", "s", 11),
        (2, 'unicode é中文 "quoted"\ttab', "zh", "s", 15),
        (3, None, None, "s", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "docs_orc")
    df.write.option("compression", "zstd").orc(p)
    back = read_documents_orc(spark, p)
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
    plan = back.where("doc_id = 2").select("lang")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,2)]" in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_permissive_csv_reader_quarantines(spark, tmp_path):
    """PERMISSIVE reader keeps malformed rows with _corrupt set and
    leaves the strict readers' shared schema untouched."""
    from mapreduce_assignments_spark.sources.text_corpus import (
        DOCUMENTS_JSONL_SCHEMA,
        read_documents_csv_permissive,
    )

    p = tmp_path / "docs.csv"
    p.write_text(
        '1,"good row",en,web,8\n'
        'notanumber,"bad id",en,web,6\n'
        ',"no id",en,web,5\n'
    )
    rows = read_documents_csv_permissive(spark, str(p)).collect()
    assert len(rows) == 3
    by_text = {r["text"]: r for r in rows}
    assert by_text["good row"]["_corrupt"] is None
    assert by_text["bad id"]["_corrupt"] is not None      # type failure
    assert by_text["no id"]["_corrupt"] is None           # contract, not parse
    assert by_text["no id"]["doc_id"] is None
    assert len(DOCUMENTS_JSONL_SCHEMA.fields) == 5        # no .add() mutation


def test_manifest_ingest_exactly_once(spark, tmp_path):
    from mapreduce_assignments_spark.sources.tables import manifest_ingest

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    spark.range(0, 10).coalesce(1).write.mode("append").parquet(src)
    assert manifest_ingest(spark, src, state).count() == 10
    # second batch arrives
    spark.range(10, 15).coalesce(1).write.mode("append").parquet(src)
    assert manifest_ingest(spark, src, state).count() == 15
    # steady state: same files, no double-ingest
    assert manifest_ingest(spark, src, state).count() == 15
    got = sorted(r["id"] for r in manifest_ingest(spark, src, state).collect())
    assert got == list(range(15))
