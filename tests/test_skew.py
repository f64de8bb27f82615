from __future__ import annotations

import pytest

from mapreduce_assignments_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    big = spark.createDataFrame(
        [(1 if i % 10 else i, f"v{i}") for i in range(1000)], "k long, v string"
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(0, 1000, 7)], "k long, d string"
    )
    return big, small


def test_salted_join_equals_plain_join(skewed):
    big, small = skewed
    plain = sorted(tuple(r) for r in big.join(small, "k").collect())
    salted = sorted(tuple(r) for r in salted_join(big, small, "k", salt=8).collect())
    assert salted == plain
    assert len(plain) > 0


def test_salted_join_left_outer(skewed):
    big, small = skewed
    plain = sorted(
        tuple(r) for r in big.join(small, "k", "left").collect()
    )
    salted = sorted(
        tuple(r) for r in salted_join(big, small, "k", "left", salt=4).collect()
    )
    assert salted == plain


def test_salted_join_spreads_hot_key(skewed):
    big, small = skewed
    out = salted_join(big, small, "k", salt=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the physical join key must include the salt column
    assert "__salt" in plan

    with pytest.raises(ValueError):
        salted_join(big, small, "k", salt=0)


def test_key_skew_report_hand_checked(spark):
    from mapreduce_assignments_spark.operators.skew import key_skew_report

    df = spark.createDataFrame(
        [("a",)] * 4 + [("b",)] * 1 + [("c",)] * 1 + [(None,)], "k string"
    )
    [row] = key_skew_report(df, "k").collect()
    # sorted counts [1,1,4]: G = 2*(1+2+12)/(3*6) - 4/3 = 1/3
    assert row["n_keys"] == 3
    assert row["total_rows"] == 6
    assert row["max_cnt"] == 4
    assert row["top_share"] == round(4 / 6, 6)
    assert row["gini"] == round(1 / 3, 6)
    # perfectly even distribution -> gini exactly 0
    even = spark.createDataFrame([("a",), ("b",), ("c",)] * 2, "k string")
    [r2] = key_skew_report(even, "k").collect()
    assert r2["gini"] == 0.0 and r2["top_share"] == round(2 / 6, 6)
