from __future__ import annotations

import math

import pyspark.sql.functions as F

from mapreduce_assignments_spark.operators import text


def as_dict(df, *keycols):
    rows = df.collect()
    if len(keycols) == 1:
        return {r[keycols[0]]: r for r in rows}
    return {tuple(r[k] for k in keycols): r for r in rows}


def test_word_count(docs):
    wc = as_dict(text.word_count(docs), "word")
    assert wc["the"]["cnt"] == 5
    assert wc["fox"]["cnt"] == 6
    assert wc["dog"]["cnt"] == 2
    assert wc["jugs"]["cnt"] == 1
    assert "" not in wc


def test_word_count_handles_messy_whitespace(spark):
    df = spark.createDataFrame([(0, "  a  b\t c "), (1, "   ")], "doc_id long, text string")
    wc = as_dict(text.word_count(df), "word")
    assert {w: r["cnt"] for w, r in wc.items()} == {"a": 1, "b": 1, "c": 1}


def test_bigram_count(docs):
    bg = as_dict(text.bigram_count(docs), "w1", "w2")
    assert bg[("the", "quick")]["cnt"] == 2
    assert bg[("quick", "brown")]["cnt"] == 2
    assert bg[("fox", "fox")]["cnt"] == 2  # "fox fox fox"
    assert bg[("lazy", "dog")]["cnt"] == 1
    assert ("dog", "the") not in bg  # no cross-document bigrams


def test_cooccurrence_window(spark):
    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    co = as_dict(text.cooccurrence(df, window=2), "a", "b")
    # position 0 ('a') sees b,c; position 1 ('b') sees a,c,d; etc.
    assert co[("a", "b")]["cnt"] == 1
    assert co[("a", "c")]["cnt"] == 1
    assert ("a", "d") not in co  # outside ±2
    assert co[("b", "a")]["cnt"] == 1  # directed
    total = sum(r["cnt"] for r in co.values())
    assert total == 2 + 3 + 3 + 2


def test_cooccurrence_counts_duplicate_positions(spark):
    df = spark.createDataFrame([(0, "x x y")], "doc_id long, text string")
    co = as_dict(text.cooccurrence(df, window=2), "a", "b")
    assert co[("x", "x")]["cnt"] == 2  # both directions of the x-pair
    assert co[("x", "y")]["cnt"] == 2  # from each x position
    assert co[("y", "x")]["cnt"] == 2


def test_pmi_matches_hand_computation(spark):
    # 10 docs where p,q always co-occur; r appears alone in 5.
    rows = [(i, "p q filler%d" % (i % 3)) for i in range(10)]
    rows += [(100 + i, "r filler%d" % (i % 3)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = as_dict(text.pmi(df, min_cooccurrence=10), "x", "y")
    n = 20
    expected = math.log(10 * n / (10 * 10))
    got = out[("p", "q")]["pmi"]
    assert abs(got - expected) < 1e-12
    assert out[("p", "q")]["cnt"] == 10
    # per-document distinct semantics: duplicated words count once
    assert all(r["cnt"] >= 10 for r in out.values())


def test_pmi_threshold(spark):
    rows = [(i, "a b") for i in range(9)]  # only 9 joint docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert text.pmi(df, min_cooccurrence=10).count() == 0
    assert text.pmi(df, min_cooccurrence=9).count() == 1


def test_pmi_canonical_order(spark):
    rows = [(i, "zeta alpha") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.pmi(df, min_cooccurrence=10).collect()
    assert len(out) == 1
    assert (out[0]["x"], out[0]["y"]) == ("alpha", "zeta")


def test_read_text_corpus_unique_is_pure_dataframe(spark, tmp_path):
    from mapreduce_assignments_spark.sources.text_corpus import read_text_corpus

    p = tmp_path / "corpus.txt"
    p.write_text("alpha beta\ngamma\ndelta epsilon zeta\n")
    df = read_text_corpus(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3
    assert len({r["doc_id"] for r in rows}) == 3
    assert {r["text"] for r in rows} == {"alpha beta", "gamma", "delta epsilon zeta"}
    # scale contract: no Python evaluation anywhere in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_cooccurrence_stripes_consistent_with_pairs(docs):
    from mapreduce_assignments_spark.operators.text import (
        cooccurrence,
        cooccurrence_stripes,
    )

    pairs = {
        (r["a"], r["b"]): r["cnt"] for r in cooccurrence(docs, window=2).collect()
    }
    stripes = cooccurrence_stripes(docs, window=2).collect()
    rebuilt = {}
    for r in stripes:
        assert dict(r["stripe"]) == {
            b: c for (a, b), c in pairs.items() if a == r["a"]
        }
        for part in r["stripe_str"].split(","):
            b, c = part.rsplit(":", 1)
            rebuilt[(r["a"], b)] = int(c)
    assert rebuilt == pairs


def test_llr_matches_scipy_free_reference(spark):
    """LLR against a NumPy-free closed-form reference on a corpus with
    a planted strong collocation and an incidental weak one."""
    import math

    from mapreduce_assignments_spark.operators.text import llr

    rows = (
        [(i, "alpha beta") for i in range(20)]          # always together
        + [(100 + i, "alpha gamma") for i in range(10)]  # alpha alone-ish
        + [(200 + i, "gamma delta") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["x"], r["y"]): (r["cnt"], r["llr"]) for r in llr(docs, min_cooccurrence=10).collect()}

    def xlx(c):
        return c * math.log(c) if c > 0 else 0.0

    def ref(k11, cx, cy, n):
        k12, k21, k22 = cx - k11, cy - k11, n - cx - cy + k11
        return round(2.0 * (
            xlx(k11) + xlx(k12) + xlx(k21) + xlx(k22)
            - xlx(k11 + k12) - xlx(k21 + k22)
            - xlx(k11 + k21) - xlx(k12 + k22) + xlx(n)
        ), 6)

    n = 40
    assert got[("alpha", "beta")] == (20, ref(20, 30, 20, n))
    # (these two tables are cell-permutations of alpha-beta's, so LLR's
    # symmetry makes all three scores equal — the exact values are the
    # assertion, not their ordering)
    assert got[("alpha", "gamma")] == (10, ref(10, 30, 20, n))
    assert got[("delta", "gamma")] == (10, ref(10, 10, 20, n))


def test_llr_and_pmi_share_pair_semantics(spark):
    """Same pairs survive the same threshold in both scorers (shared
    _doc_pair_marginals) — a refactor guard."""
    from mapreduce_assignments_spark.operators.text import llr, pmi

    rows = [(i, "a b c" if i % 2 else "a b") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p = {(r["x"], r["y"]) for r in pmi(docs, 10).collect()}
    l = {(r["x"], r["y"]) for r in llr(docs, 10).collect()}
    assert p == l and p
