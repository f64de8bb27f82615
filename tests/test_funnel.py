"""Funnel + cohort retention: greedy ordered-subsequence semantics."""

from __future__ import annotations

import datetime as dt

import pytest

from mapreduce_assignments_spark.operators.funnel import cohort_retention, funnel_counts

T = dt.datetime.fromisoformat


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, T("2024-01-01 10:00"), "view"),
        (1, T("2024-01-01 11:00"), "click"),
        (1, T("2024-01-02 09:00"), "purchase"),
        (2, T("2024-01-01 09:00"), "click"),    # click BEFORE view: no step 2
        (2, T("2024-01-01 12:00"), "view"),
        (3, T("2024-01-01 10:00"), "view"),
        (3, T("2024-01-01 10:00"), "click"),    # same ts: strict > blocks
        (4, T("2024-01-08 10:00"), "error"),    # no funnel events at all
        (5, T("2024-01-03 10:00"), "purchase"),  # purchase alone: no steps
        (5, T("2024-01-09 10:00"), "view"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_greedy_ordered_match(events):
    got = {r["step"]: (r["event_type"], r["n_users"]) for r in funnel_counts(
        events, ["view", "click", "purchase"]).collect()}
    assert got == {1: ("view", 4), 2: ("click", 1), 3: ("purchase", 1)}


def test_funnel_order_matters(events):
    # reversing the steps finds user 2 (click then view) and user 5? no -
    # user 5's purchase precedes its view, so [purchase, view] matches it
    got = {r["step"]: r["n_users"] for r in funnel_counts(
        events, ["purchase", "view"]).collect()}
    assert got == {1: 2, 2: 1}  # purchasers: users 1, 5; then view after: 5


def test_funnel_validates(events):
    with pytest.raises(ValueError):
        funnel_counts(events, [])


def test_cohort_retention_weekly_offsets(events):
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in cohort_retention(events).collect()}
    # users 1,2,3,5 first seen week of Mon 2024-01-01; user 4 week of 01-08
    assert got[("2024-01-01", 0)] == 4
    assert got[("2024-01-08", 0)] == 1
    assert got[("2024-01-01", 1)] == 1  # user 5 active again in week offset 1


def test_rolling_active_users_dau_wau(spark):
    import pyspark.sql.functions as F

    from mapreduce_assignments_spark.operators.funnel import rolling_active_users

    rows = [
        # day 1: users 1,2 ; day 3: user 2 ; day 10: user 3 (window resets)
        ("2024-01-01 10:00:00", 1),
        ("2024-01-01 11:00:00", 1),  # same user twice: still dau 2
        ("2024-01-01 12:00:00", 2),
        ("2024-01-03 09:00:00", 2),
        ("2024-01-10 09:00:00", 3),
    ]
    ev = spark.createDataFrame(rows, "ts string, user_id long").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r["day"]: (r["dau"], r["wau"]) for r in rolling_active_users(ev).collect()}
    assert out == {
        "2024-01-01": (2, 2),
        "2024-01-03": (1, 2),   # trailing 7 days still sees users {1,2}
        "2024-01-10": (1, 1),   # older activity aged out
    }


def test_co_engagement_pairs(spark):
    from mapreduce_assignments_spark.operators.funnel import co_engagement

    rows = [
        (1, "click"), (1, "view"), (1, "click"),    # dup event collapses
        (2, "click"), (2, "view"), (2, "error"),
        (3, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        (r["item_a"], r["item_b"]): r["users"] for r in co_engagement(ev).collect()
    }
    assert got == {
        ("click", "view"): 2,
        ("click", "error"): 1,
        ("error", "view"): 1,
    }
    assert co_engagement(ev, min_support=2).count() == 1


def test_event_transitions_hand_checked(spark):
    from datetime import datetime

    from mapreduce_assignments_spark.operators.funnel import event_transitions

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: view -> click -> view
        ("e1", t(0), 1, "view"),
        ("e2", t(1), 1, "click"),
        ("e3", t(2), 1, "view"),
        # user 2: view -> view (ties on ts break by event_id)
        ("e4", t(0), 2, "view"),
        ("e5", t(0), 2, "view"),
    ]
    events = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id long, event_type string"
    )
    got = {
        (r["prev_type"], r["event_type"]): (r["cnt"], r["prob"])
        for r in event_transitions(events).collect()
    }
    assert got == {
        ("view", "click"): (1, 0.5),
        ("view", "view"): (1, 0.5),
        ("click", "view"): (1, 1.0),
    }


def test_user_entropy_hand_checked(spark):
    import math
    from datetime import datetime

    from mapreduce_assignments_spark.operators.funnel import user_entropy

    t = datetime(2024, 1, 1)
    rows = [
        ("e1", t, 1, "a"), ("e2", t, 1, "a"), ("e3", t, 1, "b"), ("e4", t, 1, "b"),
        ("e5", t, 2, "a"), ("e6", t, 2, "a"),
    ]
    events = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id long, event_type string"
    )
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["entropy"])
        for r in user_entropy(events).collect()
    }
    # user 1: uniform over 2 types -> ln 2 (as the sum of two
    # pre-rounded halves); user 2: single type -> 0
    half = round(-(0.5 * math.log(0.5)), 6)
    assert got[1] == (4, 2, round(2 * half, 6))
    assert got[2] == (2, 1, 0.0)


def test_conversion_lag_first_purchase_within_window(spark):
    from datetime import datetime

    from mapreduce_assignments_spark.operators.funnel import conversion_lag_stats

    from datetime import timedelta

    t = lambda m, s=0: datetime(2024, 1, 1) + timedelta(minutes=m, seconds=s)
    rows = [
        ("c1", t(0), 1, "click"),
        ("p1", t(0, 30), 1, "purchase"),   # first: 30s
        ("p2", t(5), 1, "purchase"),       # later purchase ignored
        ("c2", t(10), 2, "click"),
        ("p3", t(80), 2, "purchase"),      # outside 60min window
        ("c3", t(20), 3, "click"),
        ("p4", t(20, 90), 3, "purchase"),  # 90s
    ]
    events = spark.createDataFrame(
        rows, "event_id string, ts timestamp, user_id long, event_type string"
    )
    [row] = conversion_lag_stats(events).collect()
    assert row["n_conversions"] == 2
    assert row["mean_lag_s"] == 60.0   # (30 + 90) / 2
    assert row["p50_lag_s"] == 60.0    # interpolated median of {30, 90}
    assert row["max_lag_s"] == 90


def test_session_paths_depth_and_truncation(spark):
    from datetime import datetime
    from mapreduce_assignments_spark.operators.funnel import session_paths

    ev = spark.createDataFrame(
        [
            # user 1, session 1: view > click > purchase > error (depth 3 cut)
            (1, 1, "view", datetime(2024, 1, 1, 0, 0)),
            (2, 1, "click", datetime(2024, 1, 1, 0, 5)),
            (3, 1, "purchase", datetime(2024, 1, 1, 0, 10)),
            (4, 1, "error", datetime(2024, 1, 1, 0, 15)),
            # user 1, session 2 (2h later): lone view -> truncated path
            (5, 1, "view", datetime(2024, 1, 1, 3, 0)),
            # user 2: same entry path as user 1 session 1
            (6, 2, "view", datetime(2024, 1, 1, 0, 0)),
            (7, 2, "click", datetime(2024, 1, 1, 0, 1)),
            (8, 2, "purchase", datetime(2024, 1, 1, 0, 2)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    rows = {r["path"]: r["n_sessions"] for r in session_paths(ev).collect()}
    assert rows == {"view>click>purchase": 2, "view": 1}


def test_ab_test_zscore_hand_checked(spark):
    from datetime import datetime
    from mapreduce_assignments_spark.operators.funnel import ab_test_zscore

    ts = datetime(2024, 1, 1)
    # variant A (even ids): users 0,2 -> 1 converts; variant B: users 1,3 -> both convert
    ev = spark.createDataFrame(
        [
            (0, "purchase", ts), (0, "view", ts),
            (2, "view", ts),
            (1, "purchase", ts),
            (3, "purchase", ts),
        ],
        "user_id long, event_type string, ts timestamp",
    )
    [r] = ab_test_zscore(ev).collect()
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (2, 2, 1, 2)
    assert r["rate_a"] == 0.5 and r["rate_b"] == 1.0
    # pooled p = 3/4, var = .75*.25*(1/2+1/2) = 0.1875, z = .5/sqrt(.1875)
    assert r["zscore"] == pytest.approx(0.5 / 0.1875 ** 0.5, abs=1e-6)


def test_ab_test_zscore_degenerate_null(spark):
    from datetime import datetime
    from mapreduce_assignments_spark.operators.funnel import ab_test_zscore

    ev = spark.createDataFrame(
        [(0, "view", datetime(2024, 1, 1)), (1, "view", datetime(2024, 1, 1))],
        "user_id long, event_type string, ts timestamp",
    )
    [r] = ab_test_zscore(ev).collect()
    assert r["zscore"] is None  # zero conversions -> zero pooled variance


def test_basket_lift_hand_checked(spark):
    from datetime import datetime
    from mapreduce_assignments_spark.operators.funnel import basket_lift

    t0 = datetime(2024, 1, 1, 0, 0)
    t1 = datetime(2024, 1, 1, 0, 10)
    far = datetime(2024, 1, 1, 5, 0)
    ev = spark.createDataFrame(
        [
            # u1 session 1: {click, view}; u1 session 2: {click}
            (1, 1, "click", t0), (2, 1, "view", t1), (3, 1, "click", far),
            # u2 session 1: {view}
            (4, 2, "view", t0),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    [r] = basket_lift(ev).collect()
    # 3 sessions; click in 2, view in 2, both in 1 -> lift = 1*3/(2*2)
    assert (r["type_a"], r["type_b"], r["n_both"]) == ("click", "view", 1)
    assert r["lift"] == 0.75


def test_transition_latency_deltas(spark):
    from datetime import datetime
    from mapreduce_assignments_spark.operators.funnel import transition_latency

    ev = spark.createDataFrame(
        [
            (1, 1, "view", datetime(2024, 1, 1, 0, 0, 0)),
            (2, 1, "click", datetime(2024, 1, 1, 0, 0, 30)),
            (3, 1, "view", datetime(2024, 1, 1, 0, 1, 0)),
            (4, 1, "click", datetime(2024, 1, 1, 0, 2, 30)),
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    rows = {(r["from_type"], r["to_type"]): r for r in transition_latency(ev).collect()}
    vc = rows[("view", "click")]
    assert vc["n"] == 2
    assert vc["median_seconds"] == 60.0  # deltas 30 and 90
    assert vc["avg_seconds"] == 60.0
    assert rows[("click", "view")]["n"] == 1


def test_linear_attribution_splits_and_none(spark):
    from datetime import datetime
    from mapreduce_assignments_spark.operators.funnel import linear_attribution

    ev = spark.createDataFrame(
        [
            (1, 1, "click", datetime(2024, 1, 1, 0, 0)),
            (2, 1, "view", datetime(2024, 1, 1, 0, 1)),
            (3, 1, "view", datetime(2024, 1, 1, 0, 2)),
            (4, 1, "purchase", datetime(2024, 1, 1, 0, 3)),  # 1/3 click, 2/3 view
            (5, 2, "purchase", datetime(2024, 1, 1, 0, 0)),  # no touches
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    rows = {r["touch_type"]: r for r in linear_attribution(ev).collect()}
    assert rows["click"]["total_credit"] == pytest.approx(1 / 3, abs=1e-6)
    assert rows["view"]["total_credit"] == pytest.approx(2 / 3, abs=1e-6)
    assert rows["(none)"]["total_credit"] == 1.0
    assert rows["(none)"]["n_conversions"] == 1


def test_interarrival_rates_per_type_stream(spark):
    from datetime import datetime
    from mapreduce_assignments_spark import workloads
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window
    from mapreduce_assignments_spark.operators import funnel  # noqa: F401

    # drive the workload shape directly on a tiny frame via the same
    # window logic: one user, clicks at 0s/60s/180s -> gaps 60, 120
    ev = spark.createDataFrame(
        [
            (1, 1, "click", datetime(2024, 1, 1, 0, 0, 0)),
            (2, 1, "click", datetime(2024, 1, 1, 0, 1, 0)),
            (3, 1, "click", datetime(2024, 1, 1, 0, 3, 0)),
            (4, 1, "view", datetime(2024, 1, 1, 0, 2, 0)),  # single: no gap
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = (
        ev.withColumn("gap_s", (us - F.lag(us).over(w)) / 1_000_000.0)
        .where(F.col("gap_s").isNotNull())
    )
    out = {r["event_type"]: r for r in gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_s"), 6).alias("mean_gap_s"),
    ).collect()}
    assert out["click"]["n_gaps"] == 2
    assert out["click"]["mean_gap_s"] == 90.0
    assert "view" not in out


def test_conversion_by_activity_buckets_partition_users(spark):
    from mapreduce_assignments_spark import workloads

    rows = workloads.ALL_QUERIES["conversion_by_activity"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert sum(r["n_users"] for r in rows) == 15  # all users partitioned
    for r in rows:
        assert 0.0 <= r["conv_rate"] <= 1.0
        assert r["n_converted"] <= r["n_users"]
