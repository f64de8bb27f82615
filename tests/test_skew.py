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
