from __future__ import annotations

import pyspark.sql.functions as F

from mapreduce_assignments_spark.operators import index
from mapreduce_assignments_spark.plans.rpn import BooleanQueryPlanner, rpn_to_sql


def test_term_frequencies(docs):
    tfs = {(r["term"], r["docid"]): r["tf"] for r in index.term_frequencies(docs).collect()}
    assert tfs[("the", 0)] == 2
    assert tfs[("fox", 400)] == 3
    assert tfs[("dog", 200)] == 1
    assert ("", 0) not in tfs


def test_build_inverted_index_postings_sorted(docs):
    idx = {r["term"]: r for r in index.build_inverted_index(docs).collect()}
    fox = idx["fox"]
    assert fox["df"] == 4
    assert fox["cf"] == 6
    docids = [p["docid"] for p in fox["postings"]]
    assert docids == sorted(docids) == [0, 9, 200, 400]
    assert {p["docid"]: p["tf"] for p in fox["postings"]}[400] == 3


def test_tf_histogram(docs):
    tfs = index.term_frequencies(docs)
    hist = {r["tf"]: r["n_docs"] for r in index.tf_histogram(tfs, "fox").collect()}
    assert hist == {1: 3, 3: 1}


def test_boolean_retrieval_and_or(docs):
    tfs = index.term_frequencies(docs)
    planner = BooleanQueryPlanner(tfs)
    # fox AND dog
    hits = sorted(r["docid"] for r in planner.plan("fox dog AND").collect())
    assert hits == [0, 200]
    # (quick OR barks) AND the
    hits = sorted(r["docid"] for r in planner.plan("quick barks OR the AND").collect())
    assert hits == [0, 9, 200]


def test_boolean_retrieval_fetches_text(docs):
    tfs = index.term_frequencies(docs)
    planner = BooleanQueryPlanner(tfs)
    rows = planner.retrieve("liquor jugs AND", docs).collect()
    assert len(rows) == 1
    assert rows[0]["docid"] == 100
    assert "liquor" in rows[0]["text"]


def test_rpn_malformed_queries(docs):
    tfs = index.term_frequencies(docs)
    planner = BooleanQueryPlanner(tfs)
    for bad in ["AND", "fox dog", "fox AND", ""]:
        try:
            planner.plan(bad)
            raise AssertionError(f"expected ValueError for {bad!r}")
        except ValueError:
            pass


def test_rpn_to_sql_matches_duckdb(docs):
    import duckdb

    tfs = index.term_frequencies(docs).toPandas()
    sql = rpn_to_sql("quick barks OR the AND")
    con = duckdb.connect()
    con.register("postings", tfs)
    oracle = sorted(r[0] for r in con.execute(sql).fetchall())
    planner = BooleanQueryPlanner(index.term_frequencies(docs))
    spark_hits = sorted(r["docid"] for r in planner.plan("quick barks OR the AND").collect())
    assert spark_hits == oracle == [0, 9, 200]


def test_build_inverted_index_max_postings_chunks(docs):
    from mapreduce_assignments_spark.operators.index import build_inverted_index

    full = {r["term"]: r for r in build_inverted_index(docs).collect()}
    chunked = build_inverted_index(docs, max_postings=2).collect()
    assert set(r["term"] for r in chunked) == set(full)
    by_term = {}
    for r in chunked:
        assert len(r["postings"]) <= 2
        assert r["df"] == full[r["term"]]["df"]
        assert r["cf"] == full[r["term"]]["cf"]
        by_term.setdefault(r["term"], []).append(r)
    for term, rows in by_term.items():
        rows.sort(key=lambda r: r["chunk"])
        assert [r["chunk"] for r in rows] == list(range(len(rows)))
        merged = [p for r in rows for p in r["postings"]]
        assert merged == list(full[term]["postings"])


def test_write_index_roundtrip_and_pruned_lookup(docs, tmp_path):
    from mapreduce_assignments_spark.operators.index import (
        build_inverted_index,
        lookup_postings,
        write_index,
    )

    idx = build_inverted_index(docs)
    path = str(tmp_path / "index.parquet")
    write_index(idx, path)
    spark = docs.sparkSession
    back = spark.read.parquet(path)
    assert sorted(r["term"] for r in back.collect()) == sorted(
        r["term"] for r in idx.collect()
    )
    hit = lookup_postings(back, "fox").collect()
    assert len(hit) == 1
    assert [p["docid"] for p in hit[0]["postings"]] == [0, 9, 200, 400]
    # the point lookup must push the term predicate into the scan
    plan = lookup_postings(back, "fox")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,fox)]" in plan


# ---------------------------------------------------------------------------
# BM25 ranked retrieval

def test_bm25_matches_reference_formula(spark):
    import math

    from mapreduce_assignments_spark.operators.index import bm25_scores

    rows = [
        (1, "cat dog cat"),      # tf(cat)=2, dl=3
        (2, "cat"),              # tf(cat)=1, dl=1
        (3, "bird bird bird"),   # no query terms, dl=3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["docid"]: r["score"] for r in bm25_scores(docs, ["cat"], k=10).collect()}

    n, avgdl, df = 3, 7 / 3, 2
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def bm25(tf, dl, k1=1.2, b=0.75):
        return round(round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6), 6)

    assert got == {1: bm25(2, 3), 2: bm25(1, 1)}
    # length normalization at work: the 1-token doc (tf=1, dl=1)
    # outranks the longer doc despite its higher raw tf=2
    assert got[2] > got[1]


def test_bm25_rare_term_outweighs_common(spark):
    from mapreduce_assignments_spark.operators.index import bm25_scores

    rows = [(i, "common filler words") for i in range(1, 20)] + [
        (20, "common rare"),
        (21, "common unique-term"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    [top] = bm25_scores(docs, ["common", "rare"], k=1).collect()
    assert top["docid"] == 20  # the doc with the rare term dominates


def test_bm25_validates(spark):
    from mapreduce_assignments_spark.operators.index import bm25_scores

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_scores(docs, [])
    with _pytest.raises(ValueError):
        bm25_scores(docs, ["x"], k=0)


def test_top_keywords_ranks_and_ties(spark):
    import math

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "y z")], "doc_id long, text string"
    )
    rows = sorted(
        (r["docid"], r["rank"], r["term"], r["tfidf"])
        for r in index.top_keywords(df, k=3).collect()
    )
    ln2 = round(math.log(2.0), 6)
    assert rows == [
        (1, 1, "x", round(2 * math.log(2.0), 6)),
        (1, 2, "y", 0.0),
        (2, 1, "z", ln2),
        (2, 2, "y", 0.0),
    ]


def test_query_likelihood_hand_checked(spark):
    """Two docs, one query term: tf/dl dominates with lambda=0.7 —
    the doc with higher term density ranks first; a doc missing the
    term still scores (collection smoothing) but lower."""
    import math

    import pytest

    from mapreduce_assignments_spark.operators.index import query_likelihood_scores

    docs = spark.createDataFrame(
        [(1, "cat cat dog"), (2, "cat bird bird"), (3, "fish fish fish")],
        "doc_id long, text string",
    )
    rows = query_likelihood_scores(docs, ["cat"], k=10, lam=0.7).collect()
    got = {r["docid"]: r["score"] for r in rows}
    # collection stats: cf(cat)=3, C=9
    def score(tf, dl):
        return round(round(math.log(0.7 * tf / dl + 0.3 * 3 / 9), 6), 6)

    assert got == {
        1: score(2, 3),
        2: score(1, 3),
        3: score(0, 3),
    }
    assert [r["docid"] for r in rows] == [1, 2, 3]  # density order
    # query terms absent from the corpus are dropped, not -inf
    rows2 = query_likelihood_scores(docs, ["cat", "unicorn"], k=10).collect()
    assert {r["docid"]: r["score"] for r in rows2} == got
    with pytest.raises(ValueError):
        query_likelihood_scores(docs, [], k=10)


def test_phrase_search_adjacency_only(spark):
    from mapreduce_assignments_spark.operators.index import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "spark table scan"),        # match
            (2, "table spark"),             # wrong order
            (3, "spark big table"),         # not adjacent
            (4, "spark table spark table"), # two matches
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["n_matches"]
            for r in phrase_search(docs, ("spark", "table")).collect()}
    assert rows == {1: 1, 4: 2}


def test_prefix_search_counts(spark):
    from mapreduce_assignments_spark.operators.index import prefix_search

    docs = spark.createDataFrame(
        [(1, "spark spam other spark"), (2, "nothing here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["n_terms"], r["n_occurrences"])
            for r in prefix_search(docs, "sp").collect()}
    assert rows == {1: (2, 3)}


def test_mrr_eval_known_item(spark):
    """Self-retrieval: a doc with distinctive vocabulary ranks itself
    first (rr = 1); a query doc whose first tokens are corpus-wide
    boilerplate shared with higher-scoring docs can rank lower but
    must still be found; rel_rank = 0 only when the doc misses the
    top-k entirely."""
    from mapreduce_assignments_spark.operators.index import mrr_eval

    docs = spark.createDataFrame(
        [
            # query doc (id 0): unique vocabulary -> must self-rank #1
            (0, "zebra quark nebula fjord extra words here"),
            # query doc (100): its 4-token prefix is boilerplate...
            (100, "the the the the filler"),
            # ...that doc 7 repeats MORE densely (higher tf, shorter)
            (7, "the the the the the the"),
            (8, "unrelated content entirely"),
        ],
        "doc_id long, text string",
    )
    rows = {r["query_id"]: r for r in mrr_eval(docs, every=100, q_len=4, k=10).collect()}
    assert set(rows) == {0, 100}
    assert rows[0]["rel_rank"] == 1 and rows[0]["rr"] == 1.0
    assert rows[100]["rel_rank"] >= 1  # found, possibly behind doc 7
    assert rows[100]["rr"] == round(1.0 / rows[100]["rel_rank"], 6)


def test_mrr_eval_adaptive_stride_caps_eval_set(spark):
    """max_queries bounds the eval set as the corpus grows: with
    every=1 on 1,000 docs and max_queries=10, the effective stride is
    greatest(1, floor(1000/10)) = 100, so exactly ids 0,100,...,900
    become queries; max_queries=None keeps the fixed stride."""
    import pyspark.sql.functions as F

    from mapreduce_assignments_spark.operators.index import mrr_eval

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id")).alias("text"),
    )
    got = {r["query_id"] for r in
           mrr_eval(docs, every=1, q_len=1, k=3, max_queries=10).collect()}
    assert got == {i * 100 for i in range(10)}
    # the cap is inactive when n/max_queries < every
    few = docs.where(F.col("doc_id") < 300)
    got_few = {r["query_id"] for r in
               mrr_eval(few, every=100, q_len=1, k=3, max_queries=200).collect()}
    assert got_few == {0, 100, 200}
