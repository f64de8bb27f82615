"""Product/event analytics: funnels and cohort retention.

The two queries every event table gets asked first. Both are pure
DataFrame algebra — no window over the raw event stream, no Python.

Funnel semantics (the standard greedy ordered-subsequence match):
a user completes step k iff there exist events e1 < e2 < ... < ek
(strictly increasing timestamps) with the step types in order.
Greedy earliest-first matching decides this exactly (matching each
step to its earliest admissible event can never prevent a later
step from matching), which is what both the fold here and the
stepwise-min SQL oracle compute — two different algorithms, same
function, cross-checked.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

__all__ = ["funnel_counts", "cohort_retention", "rolling_active_users", "co_engagement", "event_transitions", "user_entropy", "conversion_lag_stats", "session_paths", "ab_test_zscore", "basket_lift", "transition_latency", "linear_attribution"]


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(step INT, event_type STRING, n_users LONG)`` — how many users
    reach each funnel step (strictly-ordered event subsequence,
    greedy match).

    Scale shape: events are filtered to the funnel's types at the
    scan (pushdown), collected per user as a sorted (ts, type) array
    — bounded by that user's funnel-relevant events only — and the
    greedy match runs as a JVM ``aggregate`` fold over the array.
    One exchange on user, then a single-row global aggregate; the
    per-step output rows are exploded from that one row (no second
    pass). Strictly-increasing timestamps are enforced in the fold
    state (step, last_matched_ts), so a same-timestamp pair can
    never satisfy two consecutive steps — matching the SQL oracle's
    stepwise strict ``>``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    arr = F.array_sort(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("et")))
    )
    init = F.struct(
        F.lit(0).alias("step"),
        F.lit("1900-01-01 00:00:00").cast("timestamp").alias("t"),
    )
    step_of = F.array(*[F.lit(s) for s in steps])

    def advance(acc, e):
        # index clamped: element_at past the end THROWS under ANSI
        # mode (Spark 4 default) and when() does not short-circuit
        nxt = F.element_at(step_of, F.least(acc["step"] + 1, F.lit(len(steps))))
        may = (acc["step"] < len(steps)) & (e["et"] == nxt) & (
            (acc["step"] == 0) | (e["t"] > acc["t"])
        )
        return F.when(
            may, F.struct((acc["step"] + 1).alias("step"), e["t"].alias("t"))
        ).otherwise(acc)

    per_user = (
        events.where(F.col(type_col).isin(*steps))
        .groupBy(user_col)
        .agg(F.aggregate(arr, init, advance)["step"].alias("matched"))
    )
    counts = per_user.agg(
        *[
            F.sum((F.col("matched") >= i + 1).cast("long")).alias(f"s{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                F.col(f"s{i}").alias("n_users"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """``(cohort_week STRING, week_offset INT, n_users LONG)`` —
    classic weekly retention: users grouped by the Monday-truncated
    week of their FIRST event, counted once per (cohort, offset) week
    they are active in.

    Scale shape: one aggregate for first-seen per user (partial,
    map-side), a user-keyed join back onto the (user, week) distinct
    activity — AQE broadcasts the first-seen side when it fits — and
    a final small aggregate. The offset arithmetic is day-difference
    of week-truncated dates / 7: integer-exact, timezone-stable, and
    reproduced verbatim by the SQL oracle.
    """
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    firsts = events.groupBy(user_col).agg(F.min(ts_col).alias("first_ts"))
    active = events.select(user_col, wk(F.col(ts_col)).alias("active_wk")).distinct()
    return (
        active.join(firsts, user_col)
        .select(
            F.date_format(wk(F.col("first_ts")), "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.col("active_wk"), wk(F.col("first_ts"))) / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


def rolling_active_users(
    events: DataFrame, ts_col: str = "ts", window_days: int = 7
) -> DataFrame:
    """Rolling engagement: for every observed day, the distinct users
    active that day (``dau``) and over the trailing ``window_days``
    window including it (``wau``) — the DAU/WAU dashboard pair.

    Scale: raw events first collapse to the DISTINCT (day, user) set —
    one partial-aggregated exchange does the heavy lifting — and the
    trailing window is a bounded theta-join: each (day, user) row fans
    into at most ``window_days`` anchor days, and the anchor-day side
    is calendar-sized (years → thousands of rows, always the broadcast
    side). No sliding distinct-count state, no window function over
    raw events.
    """
    daily = (
        events.select(F.to_date(ts_col).alias("day"), "user_id").distinct()
    )
    days = daily.select("day").distinct()
    j = days.alias("d").join(
        daily.alias("u"),
        (F.col("u.day") <= F.col("d.day"))
        & (F.col("u.day") >= F.date_sub(F.col("d.day"), window_days - 1)),
    )
    return (
        j.groupBy(F.col("d.day").alias("anchor"))
        .agg(
            F.count_distinct(
                F.when(F.col("u.day") == F.col("d.day"), F.col("u.user_id"))
            ).alias("dau"),
            F.count_distinct("u.user_id").alias("wau"),
        )
        .select(
            F.date_format("anchor", "yyyy-MM-dd").alias("day"), "dau", "wau"
        )
    )


def co_engagement(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 1,
) -> DataFrame:
    """Market-basket pair counts: for every pair of items (event
    types), the number of distinct users engaging with BOTH —
    ``(item_a, item_b, users)``, canonical ``item_a < item_b`` order,
    pairs below ``min_support`` dropped.

    Scale: raw events collapse to the DISTINCT (user, item) set first;
    the self-join fans each user into C(k, 2) pairs for k items per
    user — bounded by the ITEM vocabulary (event types are dozens),
    never by event volume. The classic hot-user hazard (a user
    touching every item) is capped at C(|items|, 2).
    """
    ui = events.select(F.col(user_col).alias("u"), F.col(item_col).alias("i")).distinct()
    a, b = ui.alias("a"), ui.alias("b")
    return (
        a.join(b, "u")
        .where(F.col("a.i") < F.col("b.i"))
        .groupBy(F.col("a.i").alias("item_a"), F.col("b.i").alias("item_b"))
        .agg(F.count("*").alias("users"))
        .where(F.col("users") >= min_support)
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``(prev_type, event_type, cnt, prob)`` — for each
    ordered pair of consecutive events by the same user, how often
    ``event_type`` follows ``prev_type``, and the row-normalized
    transition probability (the what-do-users-do-next matrix).

    Ordering within a user is ``(ts, event_id)`` so simultaneous
    events sequence deterministically in every engine. ``prob`` is an
    exact integer ratio evaluated in doubles — bit-identical across
    engines — rounded to 6.

    Scale shape: one shuffle on user_id for the lag window (the same
    exchange sessionization uses — AQE skew-splits a celebrity user),
    then a hash aggregation on the (prev, next) pair whose
    cardinality is |event types|² — tiny — and a broadcast-sized
    window for the row normalization.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    row_total = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(row_total), 6).alias("prob"),
    )


def user_entropy(events: DataFrame) -> DataFrame:
    """Per-user behavioral diversity: ``(user_id, n_events, n_types,
    entropy)`` — the Shannon entropy (nats) of each user's event-type
    distribution. 0 = monomaniac (one event type); ln(n_types) =
    perfectly uniform. The engagement-breadth signal cohort dashboards
    segment on.

    Engine parity: per-type contributions ``-p·ln(p)`` round to 6 dp
    BEFORE the per-user sum (the bm25 discipline — float addition is
    order-dependent), then the sum rounds again.

    Scale shape: one exchange keyed by (user, type) with map-side
    partial aggregation, then a per-user rollup that reuses the same
    hash partitioning prefix. Nothing is windowed over raw events.
    """
    by_type = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    per_user = by_type.groupBy("user_id").agg(
        F.sum("cnt").alias("n_events"), F.count("*").alias("n_types")
    )
    p = F.col("cnt") / F.col("n_events")
    contrib = F.round(-(p * F.log(p)), 6)
    return (
        by_type.join(per_user, "user_id")
        .select("user_id", "n_events", "n_types", contrib.alias("c"))
        .groupBy("user_id", "n_events", "n_types")
        .agg(F.round(F.sum("c"), 6).alias("entropy"))
    )


def conversion_lag_stats(
    events: DataFrame,
    from_type: str = "click",
    to_type: str = "purchase",
    max_lag_minutes: int = 60,
) -> DataFrame:
    """Time-to-convert report: for every ``from_type`` event, the lag
    to that user's FIRST ``to_type`` event within ``max_lag_minutes``
    — one row ``(n_conversions, mean_lag_s, p50_lag_s, max_lag_s)``.
    The batch analogue of the stream-stream interval join's
    attribution window, summarized.

    Lags are integer seconds (engine-exact); the mean divides the
    integer sum, and the median is linear-interpolated
    (``percentile`` / ``quantile_cont`` agree on sorted integers).

    Scale shape: the candidate join is an equi-join on user_id with
    the two time bounds as post-conditions (per-user fan-out is the
    user's purchase count inside the window — bounded; AQE
    skew-splits a bot); the first-purchase collapse is a min
    aggregation on the click's own key.
    """
    clicks = events.where(F.col("event_type") == from_type).select(
        F.col("event_id").alias("cid"),
        F.col("user_id"),
        F.col("ts").alias("cts"),
    )
    buys = events.where(F.col("event_type") == to_type).select(
        "user_id", F.col("ts").alias("pts")
    )
    j = clicks.join(buys, "user_id").where(
        (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr(f"interval {max_lag_minutes} minutes"))
    )
    firsts = j.groupBy("cid", "cts").agg(F.min("pts").alias("first_pts"))
    lag = (
        F.unix_timestamp("first_pts") - F.unix_timestamp("cts")
    ).alias("lag_s")
    lags = firsts.select(lag)
    return lags.agg(
        F.count("*").alias("n_conversions"),
        F.round(F.sum("lag_s") / F.count("*"), 6).alias("mean_lag_s"),
        F.round(F.expr("percentile(lag_s, 0.5)"), 6).alias("p50_lag_s"),
        F.max("lag_s").alias("max_lag_s"),
    )


def session_paths(
    events: DataFrame, gap_minutes: int = 30, depth: int = 3, k: int = 20
) -> DataFrame:
    """Top-k session entry paths: sessionize per user (``gap_minutes``
    inactivity gap), take each session's first ``depth`` event types
    in time order, and count sessions per ``'a>b>c'`` path — the
    product-analytics "how do sessions start" report.

    Scale: one shuffle on user_id for the sessionizing lag/cumsum and
    the per-session rank (three window passes share the sort), then a
    partial-aggregated count on the path string (path cardinality is
    event-type^depth — tiny). Ordering ties break on event_id so the
    path is deterministic across engines; sessions shorter than
    ``depth`` keep their truncated path.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col("ts"))
    brk = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > gap_us), 1
    ).otherwise(0)
    sess = events.select("user_id", "ts", "event_id", "event_type").withColumn(
        "sid", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    firsts = (
        sess.withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") <= depth)
        .groupBy("user_id", "sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        firsts.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def ab_test_zscore(
    events: DataFrame, convert_type: str = "purchase"
) -> DataFrame:
    """Two-proportion z-test between deterministic A/B variants
    (``user_id % 2``): did variant 1 convert (≥1 ``convert_type``
    event) at a different rate than variant 0? One row ``(n_a, n_b,
    conv_a, conv_b, rate_a, rate_b, zscore)`` — the experiment
    dashboard's significance readout.

    Scale: per-user conversion is a partial-aggregated bool-max on
    user_id (one exchange), the 2×2 contingency reduces to a single
    row, and the z arithmetic is driver-free scalar math on exact
    integer counts — so the statistic is bit-stable across engines.
    Zero-conversion or single-variant corpora yield NULL z (the
    pooled variance is 0), never a divide-by-zero.
    """
    per_user = (
        events.select(
            "user_id",
            (F.pmod(F.col("user_id"), F.lit(2)) == 1).alias("is_b"),
            (F.col("event_type") == convert_type).cast("int").alias("c"),
        )
        .groupBy("user_id", "is_b")
        .agg(F.max("c").alias("converted"))
    )
    agg = per_user.agg(
        F.sum(F.when(~F.col("is_b"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("is_b"), 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~F.col("is_b"), F.col("converted")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("is_b"), F.col("converted")).otherwise(0)).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    var = pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.when(var > 0, F.round((p_b - p_a) / F.sqrt(var), 6)).alias("zscore"),
    )


def basket_lift(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Market-basket association over sessions: treating each
    user session (``gap_minutes`` inactivity gap) as a basket of
    DISTINCT event types, the lift of every ordered type pair —
    ``(type_a, type_b, n_both, lift)`` with
    ``lift = P(a,b) / (P(a)·P(b))`` over sessions. Lift > 1 means the
    events co-occur in a session more than independence predicts.

    Scale: sessionization is the shared lag/cumsum window; baskets
    collapse to DISTINCT (session, type) rows (≤ type-domain per
    session) before the within-basket pair join, so pair fan-out is
    bounded by the type domain squared per session — never events².
    Marginals and the session total are type-domain-sized frames
    broadcast back; all probabilities are exact integer ratios.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    brk = F.when(
        F.lag(us).over(w).isNull()
        | (us - F.lag(us).over(w) > gap_minutes * 60 * 1_000_000),
        1,
    ).otherwise(0)
    # localCheckpoint: baskets feed four consumers (marginals, both
    # pair sides, session total) — and the total rides a broadcast
    # crossJoin, which over an un-checkpointed plan would re-execute
    # the whole sessionization per consumer
    baskets = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "sid", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .select("user_id", "sid", "event_type")
        .distinct()
        # eager=False: plan-only consumers fire no jobs; still runs
        # exactly once on first action across all four consumers
        .localCheckpoint(eager=False)
    )
    total = baskets.select("user_id", "sid").distinct().agg(
        F.count("*").alias("n_sessions")
    )
    marg = baskets.groupBy(F.col("event_type").alias("t")).agg(
        F.count("*").alias("n_t")
    )
    a = baskets.select("user_id", "sid", F.col("event_type").alias("type_a"))
    b = baskets.select("user_id", "sid", F.col("event_type").alias("type_b"))
    both = (
        a.join(b, ["user_id", "sid"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    ma = marg.select(F.col("t").alias("type_a"), F.col("n_t").alias("n_a"))
    mb = marg.select(F.col("t").alias("type_b"), F.col("n_t").alias("n_b"))
    return (
        both.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(total))
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(
                (F.col("n_both").cast("double") * F.col("n_sessions"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def transition_latency(events: DataFrame) -> DataFrame:
    """How long do users dwell between consecutive event types? Per
    directed transition (prev_type → next_type): ``(from_type,
    to_type, n, median_seconds, avg_seconds)`` over each user's
    time-ordered stream. The latency companion to
    :func:`event_transitions`' probability matrix.

    Scale: one lag window per user (the shared sessionization sort),
    integer second deltas, then a type²-cardinality rollup whose
    exact median aggregates per-transition multisets — never a global
    sort. Ties in ts order by event_id, so deltas are deterministic.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    step = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("delta_s", ((us - F.lag(us).over(w)) / 1_000_000.0))
        .where(F.col("prev_type").isNotNull())
    )
    return (
        step.groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(delta_s, 0.5)"), 6).alias("median_seconds"),
            F.round(F.avg("delta_s"), 6).alias("avg_seconds"),
        )
    )


def linear_attribution(
    events: DataFrame,
    touch_types: tuple = ("click", "view"),
    convert_type: str = "purchase",
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution: each conversion
    splits one unit of credit equally across ALL of the user's
    preceding touches, aggregated by touch type — ``(touch_type,
    total_credit, n_conversions)``. The fairness-spectrum counterpart
    of :func:`relational.last_touch_attribution`.

    Scale: running per-type touch counts are trailing windows over
    the SAME user sort (one shuffle, one sort, k window expressions
    for k touch types — never a conversions × touches join, which is
    quadratic in active users); per-conversion credits are exact
    integer ratios rounded at the end. Conversions with zero
    preceding touches appear as ``'(none)'`` with whole credits.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    counts = {
        t: F.sum(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).over(w)
        for t in touch_types
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    # an empty trailing frame sums to NULL, not 0 — coalesce so a
    # first-event conversion lands in '(none)' instead of nowhere
    conv = (
        events.select("user_id", "ts", "event_id", "event_type")
        .select(
            "*",
            *[
                F.coalesce(counts[t], F.lit(0)).alias(f"__c_{t}")
                for t in touch_types
            ],
            F.coalesce(total, F.lit(0)).alias("__tot"),
        )
        .where(F.col("event_type") == convert_type)
    )
    per_type = None
    for t in touch_types:
        r = conv.select(
            F.lit(t).alias("touch_type"),
            F.when(
                F.col("__tot") > 0, F.col(f"__c_{t}") / F.col("__tot")
            ).otherwise(F.lit(0.0)).alias("credit"),
        )
        per_type = r if per_type is None else per_type.unionAll(r)
    none_credit = conv.select(
        F.lit("(none)").alias("touch_type"),
        F.when(F.col("__tot") == 0, F.lit(1.0)).otherwise(F.lit(0.0)).alias("credit"),
    )
    return (
        per_type.unionAll(none_credit)
        .groupBy("touch_type")
        .agg(
            F.round(F.sum("credit"), 6).alias("total_credit"),
            F.sum(F.when(F.col("credit") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_conversions"),
        )
        .where(F.col("total_credit") > 0)
    )
