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
