"""Hand-checked unit tests for the round-6 TPC-H-shape operators
(Q3 / Q14 / Q18 / Q19). Oracle parity over the real testdata runs in
tools/check_correctness.py; these pin the semantics on tiny frames
where the expected answer is computable by hand."""

from __future__ import annotations

from datetime import datetime

import pytest

from mapreduce_assignments_spark.operators import relational


def _ts(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d")


def _li(spark, rows):
    rows = [(*r[:-1], _ts(r[-1])) for r in rows]
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate timestamp",
    )


def test_shipping_priority_in_flight_only(spark):
    li = _li(
        spark,
        [
            # order 1: ships after cutoff (counts), placed before cutoff
            (1, 1, 1.0, 100.0, 0.0, "1998-08-01"),
            (1, 1, 1.0, 50.0, 0.5, "1998-09-01"),
            # order 1 lineitem shipped BEFORE cutoff: excluded from revenue
            (1, 1, 1.0, 999.0, 0.0, "1998-01-01"),
            # order 2: placed after cutoff -> excluded entirely
            (2, 1, 1.0, 77.0, 0.0, "1998-08-01"),
        ],
    )
    orders = spark.createDataFrame(
        [(1, 10, _ts("1998-06-01")), (2, 10, _ts("1998-07-02"))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    cust = spark.createDataFrame(
        [(10, "BUILDING"), (11, "MACHINERY")],
        "c_custkey long, c_mktsegment string",
    )
    rows = relational.shipping_priority(li, orders, cust).collect()
    assert len(rows) == 1
    assert rows[0]["l_orderkey"] == 1
    assert rows[0]["revenue"] == pytest.approx(100.0 + 25.0)


def test_promo_revenue_share(spark):
    li = _li(
        spark,
        [
            (1, 1, 1.0, 100.0, 0.0, "1998-03-05"),  # PROMO part
            (1, 2, 1.0, 300.0, 0.0, "1998-03-06"),  # non-promo
            (1, 1, 1.0, 500.0, 0.0, "1998-04-01"),  # outside month
        ],
    )
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "ECONOMY")], "p_partkey long, p_type string"
    )
    [row] = relational.promo_revenue(li, part).collect()
    assert row["promo_revenue"] == 100.0
    assert row["total_revenue"] == 400.0
    assert row["promo_pct"] == 25.0


def test_large_volume_orders_threshold_and_order(spark):
    li = _li(
        spark,
        [(1, 1, 300.0, 1.0, 0.0, "1998-01-01")]
        + [(2, 1, 100.0, 1.0, 0.0, "1998-01-01")] * 3  # order 2: 300 total
        + [(3, 1, 200.0, 1.0, 0.0, "1998-01-01")],  # below threshold
    )
    orders = spark.createDataFrame(
        [(1, 10, _ts("1998-01-01"), 500.0), (2, 10, _ts("1998-01-02"), 900.0),
         (3, 10, _ts("1998-01-03"), 999.0)],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    cust = spark.createDataFrame(
        [(10, "Customer#10")], "c_custkey long, c_name string"
    )
    rows = relational.large_volume_orders(li, orders, cust, min_qty=250.0).collect()
    assert [r["o_orderkey"] for r in rows] == [2, 1]  # o_totalprice desc
    assert [r["total_qty"] for r in rows] == [300.0, 300.0]


def test_volume_shipping_directions_and_years(spark):
    li = spark.createDataFrame(
        [
            # supp 1 (NATION_1) -> cust 20 (NATION_2), 1996
            (1, 1, 100.0, 0.0, _ts("1996-05-01")),
            # supp 2 (NATION_2) -> cust 10 (NATION_1), 1997
            (2, 2, 200.0, 0.5, _ts("1997-05-01")),
            # supp 1 -> cust 10: both NATION_1, excluded
            (3, 1, 999.0, 0.0, _ts("1996-05-01")),
            # outside ship range
            (1, 1, 888.0, 0.0, _ts("1995-05-01")),
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )
    orders = spark.createDataFrame(
        [(1, 20), (2, 10), (3, 10)], "o_orderkey long, o_custkey long"
    )
    cust = spark.createDataFrame(
        [(10, 1), (20, 2)], "c_custkey long, c_nationkey long"
    )
    supp = spark.createDataFrame(
        [(1, 1), (2, 2)], "s_suppkey long, s_nationkey long"
    )
    nation = spark.createDataFrame(
        [(1, "NATION_1"), (2, "NATION_2")], "n_nationkey long, n_name string"
    )
    rows = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in relational.volume_shipping(li, orders, cust, supp, nation).collect()
    }
    assert rows == {
        ("NATION_1", "NATION_2", 1996): 100.0,
        ("NATION_2", "NATION_1", 1997): 100.0,
    }


def test_customer_distribution_zero_bucket_and_exclusion(spark):
    cust = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [
            (100, 1, "5-LOW"),
            (101, 1, "1-URGENT"),  # excluded: cust 1 counts 1, not 2
            (102, 2, "1-URGENT"),  # excluded: cust 2 drops to the 0 bucket
        ],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    rows = {
        r["c_count"]: r["custdist"]
        for r in relational.customer_distribution(cust, orders).collect()
    }
    assert rows == {1: 1, 0: 2}


def test_top_supplier_keeps_ties(spark):
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, _ts("1996-02-01")),
            (2, 50.0, 0.0, _ts("1996-02-01")),
            (2, 50.0, 0.0, _ts("1996-03-01")),
            (3, 999.0, 0.0, _ts("1996-06-01")),  # outside quarter
        ],
        "l_suppkey long, l_extendedprice double, l_discount double, "
        "l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    )
    rows = sorted(
        (r["s_suppkey"], r["total_revenue"])
        for r in relational.top_supplier(li, supp).collect()
    )
    assert rows == [(1, 100.0), (2, 100.0)]


def test_small_quantity_revenue_threshold(spark):
    # part 1 avg qty = 10 -> cap 2.0; only the qty-1 row qualifies
    li = spark.createDataFrame(
        [
            (1, 1.0, 70.0),
            (1, 19.0, 999.0),
            (2, 1.0, 555.0),  # wrong brand
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "Brand#23"), (2, "Brand#9")], "p_partkey long, p_brand string"
    )
    [row] = relational.small_quantity_revenue(li, part).collect()
    assert row["avg_yearly"] == pytest.approx(10.0)


def test_market_share_conditional_split(spark):
    li = spark.createDataFrame(
        [
            (1, 1, 1, 100.0, 0.0),  # target supplier
            (1, 1, 2, 300.0, 0.0),  # non-target supplier
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, 10, _ts("1996-06-01"))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    cust = spark.createDataFrame([(10, 5)], "c_custkey long, c_nationkey long")
    supp = spark.createDataFrame(
        [(1, 3), (2, 4)], "s_suppkey long, s_nationkey long"
    )
    part = spark.createDataFrame([(1, "ECONOMY")], "p_partkey long, p_type string")
    nation = spark.createDataFrame(
        [(3, "NATION_3", 0), (4, "NATION_4", 0), (5, "NATION_5", 2)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    region = spark.createDataFrame([(2, "ASIA")], "r_regionkey long, r_name string")
    [row] = relational.market_share(
        li, orders, cust, supp, part, nation, region
    ).collect()
    assert row["o_year"] == 1996
    assert row["mkt_share"] == pytest.approx(0.25)
    assert row["total_revenue"] == 400.0


def test_part_bracket_revenue_disjunction(spark):
    li = _li(
        spark,
        [
            (1, 1, 5.0, 100.0, 0.0, "1998-01-01"),   # bracket 1 hit
            (1, 1, 30.0, 999.0, 0.0, "1998-01-01"),  # qty outside bracket 1
            (1, 2, 15.0, 200.0, 0.5, "1998-01-01"),  # bracket 2 hit
            (1, 3, 25.0, 400.0, 0.0, "1998-01-01"),  # bracket 3 hit
            (1, 4, 5.0, 888.0, 0.0, "1998-01-01"),   # brand matches nothing
        ],
    )
    part = spark.createDataFrame(
        [(1, "Brand#12", 3), (2, "Brand#23", 9), (3, "Brand#3", 15),
         (4, "Brand#9", 1)],
        "p_partkey long, p_brand string, p_size int",
    )
    [row] = relational.part_bracket_revenue(li, part).collect()
    assert row["revenue"] == pytest.approx(100.0 + 100.0 + 400.0)


def test_revenue_rollup_levels(spark):
    li = spark.createDataFrame(
        [(1, 100.0, 0.0), (2, 50.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame(
        [(1, 10, _ts("1996-03-01")), (2, 11, _ts("1997-03-01"))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    cust = spark.createDataFrame(
        [(10, 1), (11, 1)], "c_custkey long, c_nationkey long"
    )
    nation = spark.createDataFrame([(1, "N1")], "n_nationkey long, n_name string")
    from mapreduce_assignments_spark.operators.relational import revenue_rollup

    rows = {(r["n_name"], r["o_year"], r["lvl"]): r["revenue"]
            for r in revenue_rollup(li, orders, cust, nation).collect()}
    assert rows[("N1", 1996, 0)] == 100.0
    assert rows[("N1", 1997, 0)] == 50.0
    assert rows[("N1", -1, 1)] == 150.0      # nation subtotal
    assert rows[("(all)", -1, 3)] == 150.0   # grand total
    assert len(rows) == 4


def test_last_touch_attribution_window(spark):
    from datetime import datetime
    from mapreduce_assignments_spark.operators.relational import last_touch_attribution

    ev = spark.createDataFrame(
        [
            (1, "u1", "click", datetime(2024, 1, 1, 0)),
            (2, "u1", "error", datetime(2024, 1, 1, 1)),
            (3, "u1", "purchase", datetime(2024, 1, 1, 2)),  # -> click
            (4, "u1", "view", datetime(2024, 1, 1, 3)),
            (5, "u1", "purchase", datetime(2024, 1, 1, 4)),  # -> view
            (6, "u2", "purchase", datetime(2024, 1, 1, 0)),  # -> (none)
        ],
        "event_id long, user_id string, event_type string, ts timestamp",
    )
    rows = {r["touch_type"]: r["n_conversions"]
            for r in last_touch_attribution(ev).collect()}
    assert rows == {"click": 1, "view": 1, "(none)": 1}


def test_order_gap_stats_hand_checked(spark):
    from mapreduce_assignments_spark.operators.relational import order_gap_stats

    orders = spark.createDataFrame(
        [
            (1, 10, _ts("1996-01-01")),
            (2, 10, _ts("1996-01-11")),  # gap 10
            (3, 10, _ts("1996-01-31")),  # gap 20
            (4, 11, _ts("1996-01-01")),  # single order: no gap
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    cust = spark.createDataFrame(
        [(10, "BUILDING"), (11, "BUILDING")], "c_custkey long, c_mktsegment string"
    )
    [r] = order_gap_stats(orders, cust).collect()
    assert r["n_gaps"] == 2
    assert r["avg_gap_days"] == 15.0
    assert r["median_gap_days"] == 15.0


def test_nation_trade_balance_two_sides(spark):
    li = spark.createDataFrame(
        [(1, 1, 100.0, 0.0), (2, 2, 40.0, 0.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    orders = spark.createDataFrame([(1, 10), (2, 11)], "o_orderkey long, o_custkey long")
    cust = spark.createDataFrame([(10, 2), (11, 1)], "c_custkey long, c_nationkey long")
    supp = spark.createDataFrame([(1, 1), (2, 2)], "s_suppkey long, s_nationkey long")
    nation = spark.createDataFrame(
        [(1, "N1"), (2, "N2")], "n_nationkey long, n_name string"
    )
    from mapreduce_assignments_spark.operators.relational import nation_trade_balance

    rows = {r["n_name"]: r for r in nation_trade_balance(li, orders, cust, supp, nation).collect()}
    # N1 exports 100 (supp 1), imports 40 (cust 11); N2 mirror
    assert (rows["N1"]["exports"], rows["N1"]["imports"], rows["N1"]["balance"]) == (100.0, 40.0, 60.0)
    assert (rows["N2"]["exports"], rows["N2"]["imports"], rows["N2"]["balance"]) == (40.0, 100.0, -60.0)


def test_rfm_segments_buckets(spark):
    from mapreduce_assignments_spark.operators.relational import rfm_segments

    orders = spark.createDataFrame(
        # three customers with clearly separated R, F, M profiles
        [(1, 10, _ts("2001-12-01"), 900.0)] * 3        # recent, frequent, big
        + [(2, 11, _ts("2000-06-01"), 100.0)]          # middling
        + [(3, 12, _ts("1995-01-01"), 10.0)],          # stale, rare, small
        "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = {(r["r_bucket"], r["f_bucket"], r["m_bucket"]): r["n_customers"]
            for r in rfm_segments(orders).collect()}
    assert rows[(1, 3, 3)] == 1   # cust 10: most recent, most orders, most spend
    assert rows[(3, 1, 1)] == 1   # cust 12: stalest, fewest, smallest
    assert sum(rows.values()) == 3


def test_rolling_weekly_revenue_range_frame_bridges_gaps(spark):
    from mapreduce_assignments_spark.operators.relational import (
        rolling_weekly_revenue,
    )

    orders = spark.createDataFrame(
        [
            (1, _ts("1996-01-01"), 10.0),
            (2, _ts("1996-01-03"), 20.0),
            (3, _ts("1996-01-10"), 40.0),  # 7+ days after day 1
        ],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = {r["order_day"]: r["week_revenue"]
            for r in rolling_weekly_revenue(orders).collect()}
    assert rows["1996-01-01"] == 10.0
    assert rows["1996-01-03"] == 30.0
    # RANGE frame: Jan 10 window is Jan 4-10 -> only its own revenue
    # (a ROWS frame would wrongly include Jan 3 and Jan 1)
    assert rows["1996-01-10"] == 40.0


def test_yoy_growth_missing_month_is_null(spark):
    from mapreduce_assignments_spark.operators.relational import yoy_growth

    orders = spark.createDataFrame(
        [
            (1, _ts("1996-03-15"), 100.0),
            (2, _ts("1997-03-02"), 150.0),
            (3, _ts("1997-05-02"), 70.0),  # no 1996-05 -> NULL prev
        ],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double",
    )
    rows = {r["month"]: r for r in yoy_growth(orders).collect()}
    assert rows["1997-03"]["prev_year_revenue"] == 100.0
    assert rows["1997-03"]["yoy_pct"] == 50.0
    assert rows["1997-05"]["prev_year_revenue"] is None
    assert rows["1997-05"]["yoy_pct"] is None


def test_customer_growth_requires_both_years(spark):
    from mapreduce_assignments_spark import workloads

    out = workloads.ALL_QUERIES["customer_growth_topk"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    assert all(r["spend_1996"] > 0 and r["spend_1997"] is not None for r in out)
    pcts = [r["growth_pct"] for r in out]
    assert pcts == sorted(pcts, reverse=True)


def test_region_nation_share_sums_to_one(spark):
    from mapreduce_assignments_spark import workloads
    import collections

    rows = workloads.ALL_QUERIES["region_nation_share"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    per_region = collections.defaultdict(float)
    world = 0.0
    for r in rows:
        per_region[r["r_name"]] += r["share_of_region"]
    for rname, s in per_region.items():
        assert abs(s - 1.0) < 1e-4, (rname, s)
    region_shares = {r["r_name"]: r["region_share_of_world"] for r in rows}
    assert abs(sum(region_shares.values()) - 1.0) < 1e-4


def test_prospective_customers_workload(spark):
    """Q22 shape on the real testdata: every reported group holds
    above-average-balance customers with zero orders."""
    from mapreduce_assignments_spark import workloads

    rows = workloads.ALL_QUERIES["prospective_customers"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert all(r["n_cust"] >= 1 and r["total_acctbal"] > 0 for r in rows)


def test_pareto_report_share_bounds(spark):
    from mapreduce_assignments_spark import workloads

    [r] = workloads.ALL_QUERIES["pareto_report"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    # top quintile by definition holds < 20% of customers but must
    # carry at least its proportional share of revenue
    assert 0.15 <= r["top_quintile_share"] <= 1.0
    assert r["n_customers"] > 0
