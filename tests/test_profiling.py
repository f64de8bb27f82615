from __future__ import annotations

from mapreduce_assignments_spark.operators.profiling import profile_columns


def test_profile_columns_exact_metrics(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", None),
            (3, "a", 30.0),
            (4, None, 20.0),
        ],
        "id long, cat string, v double",
    )
    out = {r["column"]: r for r in profile_columns(df, ["id", "cat", "v"]).collect()}
    assert set(out) == {"id", "cat", "v"}
    for r in out.values():
        assert r["n_rows"] == 4
    assert (out["id"]["non_null"], out["id"]["n_distinct"]) == (4, 4)
    assert (out["cat"]["non_null"], out["cat"]["n_distinct"]) == (3, 2)
    assert (out["v"]["non_null"], out["v"]["n_distinct"]) == (3, 3)
    assert (out["id"]["min_value"], out["id"]["max_value"]) == ("1", "4")
    assert (out["cat"]["min_value"], out["cat"]["max_value"]) == ("a", "b")
    # min/max are computed on the NATIVE type, then rendered: 30.0 > 20.0
    assert (out["v"]["min_value"], out["v"]["max_value"]) == ("10.0", "30.0")


def test_profile_columns_approx_mode_same_shape(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(500)], "a long, b long")
    exact = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    approx = {
        r["column"]: r for r in profile_columns(df, ["a", "b"], exact=False).collect()
    }
    assert set(approx) == set(exact)
    assert approx["b"]["n_distinct"] == 7  # HLL is exact at tiny cardinality
    # 2% default relative error bound, generous slack
    assert abs(approx["a"]["n_distinct"] - 500) <= 25
    for col in ("a", "b"):
        assert approx[col]["non_null"] == exact[col]["non_null"] == 500


def test_robust_outliers_flags_spike_not_baseline(spark):
    from mapreduce_assignments_spark.operators.profiling import robust_outliers

    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 1000])]
    rows += [(100, "b", 5.0), (101, "b", 5.0)]  # MAD = 0: unscorable
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_id"]: r for r in robust_outliers(df, "value", "event_type").collect()}
    assert out[7]["is_outlier"] and out[7]["robust_z"] > 100
    assert not any(out[i]["is_outlier"] for i in range(7))
    # median is robust: the 1000 outlier did not drag the baseline
    assert out[0]["med"] == 10.5
    assert out[100]["robust_z"] is None and not out[100]["is_outlier"]


def test_distribution_psi_identical_and_drifted(spark):
    from mapreduce_assignments_spark.operators.profiling import distribution_psi

    same = spark.createDataFrame(
        [(v, s) for s in ("a", "b") for v in [1, 2, 4, 8, 8, 8]],
        "v long, seg string",
    )
    [row] = distribution_psi(same, "v", "seg", ref="a", cur="b").collect()
    assert row["psi"] == 0.0  # identical distributions
    assert row["n_buckets_common"] == row["n_buckets_union"]
    drifted = spark.createDataFrame(
        [(1, "a")] * 9 + [(1024, "a")] + [(1, "b")] + [(1024, "b")] * 9,
        "v long, seg string",
    )
    [r2] = distribution_psi(drifted, "v", "seg", ref="a", cur="b").collect()
    assert r2["psi"] > 0.25  # well past the 'drifted' gate
    # segment-disjoint buckets are excluded but surfaced in the counts
    disj = spark.createDataFrame(
        [(1, "a"), (2, "a"), (1024, "b"), (1, "b")], "v long, seg string"
    )
    [r3] = distribution_psi(disj, "v", "seg", ref="a", cur="b").collect()
    assert r3["n_buckets_union"] == 3 and r3["n_buckets_common"] == 1


def test_k_anonymity_flags_small_classes(spark):
    from mapreduce_assignments_spark.operators.profiling import k_anonymity

    df = spark.createDataFrame(
        [("x", 1)] * 5 + [("x", 2)] * 2 + [(None, 2)],
        "seg string, nat int",
    )
    rows = {(r["seg"], r["nat"]): (r["class_size"], r["violates"])
            for r in k_anonymity(df, ["seg", "nat"], k=5).collect()}
    assert rows[("x", 1)] == (5, False)
    assert rows[("x", 2)] == (2, True)
    assert rows[(None, 2)] == (1, True)  # NULLs form their own class


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    """The Laplace release is a pure function of (seed, group): two
    runs agree exactly, a different seed draws different noise, and
    noise magnitude behaves like Lap(1/eps) (bigger eps -> closer to
    the true count)."""
    from mapreduce_assignments_spark.operators.profiling import dp_noisy_counts

    df = spark.createDataFrame(
        [("a",)] * 100 + [("b",)] * 50, "k string"
    )
    r1 = {r["k"]: r["noisy_count"] for r in dp_noisy_counts(df, "k").collect()}
    r2 = {r["k"]: r["noisy_count"] for r in dp_noisy_counts(df, "k").collect()}
    assert r1 == r2                       # reproducible release
    r3 = {r["k"]: r["noisy_count"]
          for r in dp_noisy_counts(df, "k", seed="dp-v2").collect()}
    assert r3 != r1                       # seed rotation redraws
    tight = {r["k"]: r["noisy_count"]
             for r in dp_noisy_counts(df, "k", epsilon=100.0).collect()}
    assert abs(tight["a"] - 100) < abs(r1["a"] - 100) or abs(r1["a"] - 100) < 1e-9
    assert abs(tight["a"] - 100) < 0.5    # eps=100 -> scale 0.01


def test_corpus_card_per_source_grid(spark):
    from mapreduce_assignments_spark.operators.profiling import corpus_card

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", "a"),
            (2, "the quick brown fox", "en", "a"),   # exact dup of 1
            (3, "le chat noir", "fr", "a"),
            (4, "x y", "en", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r["source"]: r for r in corpus_card(docs).collect()}
    a, b = rows["a"], rows["b"]
    assert a["n_docs"] == 3 and a["total_tokens"] == 11
    assert a["en_share"] == round(2 / 3, 6)
    assert a["uniq_ratio"] == round(2 / 3, 6)  # one dup pair
    assert b["n_docs"] == 1 and b["uniq_ratio"] == 1.0
    assert a["p50_chars"] == 19.0  # median of (19, 19, 12)
    assert 0.0 < a["avg_quality"] < 1.0
