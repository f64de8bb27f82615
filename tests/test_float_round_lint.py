"""Round-10 hash-stability lint (VERDICT r9 item 4): no oracle may
round() a cross-row FLOAT aggregate without either fixed-point
quantized summands (the embedding_covariance/label_centroids fix) or
an explicit cell-bounded ALLOWLIST entry in tools/float_round_lint.py
— the flake probability multiplies by output cardinality, and 4096
unguarded cells is how round 9 got its first driver-red row in four
rounds."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "float_round_lint", REPO / "tools" / "float_round_lint.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_unguarded_float_agg_roundings():
    mod = _load()
    bad = mod.run()
    assert not bad, (
        "round() over an order-dependent float aggregate without a "
        "determinism guard — quantize the summands to a fixed-point "
        "grid (see embedding_covariance) or add a justified cell-bound "
        f"ALLOWLIST entry: {bad}"
    )


def test_lint_detects_the_round9_failure_class():
    """The lint must actually fire on the exact pattern that flaked:
    round over a plain double sum (pre-fix embedding_covariance)."""
    mod = _load()
    sites = mod.float_agg_sites(
        "SELECT round(a.sxy / a.n - (a.sxi / a.n) * (m.sxj / a.n), 6) "
        "AS cov FROM (SELECT sum(xy) AS sxy, sum(xi) AS sxi, "
        "count(*) AS n FROM t) a, (SELECT sum(xj) AS sxj FROM t) m"
    )
    # alias indirection: the sums live in a subquery and only their
    # ALIASES appear under round() — the literal pre-fix oracle shape
    assert sites, "alias-indirected float sums must be flagged"
    sites = mod.float_agg_sites("SELECT round(sum(xy) / count(*), 6) FROM t")
    assert sites, "plain float-sum under round() must be flagged"
    sites = mod.float_agg_sites(
        "SELECT round(CAST(sum(CAST(floor(xy * 1048576.0) AS BIGINT)) "
        "AS DOUBLE) / 1048576.0 / count(*), 6) FROM t"
    )
    assert not sites, "fixed-point-quantized sums are exact"
    sites = mod.float_agg_sites(
        "SELECT round(sum(CAST(x AS DECIMAL(18,6))), 6) FROM t"
    )
    assert not sites, "decimal sums are exact"
    sites = mod.float_agg_sites(
        "SELECT round(avg(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END), 6) FROM t"
    )
    assert not sites, "integer-literal CASE arms are exact"


def test_allowlist_entries_all_name_live_queries():
    import sys

    sys.path.insert(0, str(REPO))
    from mapreduce_assignments_spark import workloads

    mod = _load()
    stale = sorted(set(mod.ALLOWLIST) - set(workloads.ORACLE))
    assert not stale, f"ALLOWLIST names unknown queries: {stale}"

def test_lint_catches_round10_advice_false_negatives():
    """Round-10 advice: (a) CAST(sum(x) AS DOUBLE) AS s in a CTE,
    rounded later by alias, evaded the alias tracker (the non-greedy
    AS match captured DOUBLE and stopped); (b) exact-making wrappers
    that do not sit at the argument root (sum(x * floor(y))) were
    treated as exact."""
    mod = _load()
    sites = mod.float_agg_sites(
        "WITH a AS (SELECT CAST(sum(x) AS DOUBLE) AS s, count(*) AS n "
        "FROM t) SELECT round(s / n, 6) AS m FROM a"
    )
    assert sites, "double-cast float sum rounded by alias must be flagged"
    sites = mod.float_agg_sites("SELECT round(sum(x * floor(y)), 6) FROM t")
    assert sites, "floor() must wrap the WHOLE summand to count as exact"
    sites = mod.float_agg_sites(
        "SELECT round(sum(x + CAST(y AS BIGINT)), 6) FROM t"
    )
    assert sites, "a raw double term in the summand must be flagged"
    # but int/decimal value-casts of exact CTE sums stay unflagged
    # (the shipped embedding_covariance oracle shape)
    sites = mod.float_agg_sites(
        "WITH a AS (SELECT CAST(sum(qxy) AS BIGINT) AS sxy, count(*) AS n "
        "FROM t) SELECT round(CAST(sxy AS DOUBLE) / 1048576.0 / n, 6) "
        "AS cov FROM a"
    )
    assert not sites, "int-cast aggregate values keep the exact convention"
    sites = mod.float_agg_sites(
        "SELECT round(sum(CAST(p AS DECIMAL(18,6)) * (CAST(1 AS "
        "DECIMAL(8,6)) - CAST(d AS DECIMAL(8,6)))), 6) FROM t"
    )
    assert not sites, "decimal arithmetic compositions are exact"


def test_allowlist_has_no_dead_entries():
    """Every ALLOWLIST entry must correspond to a query the lint
    actually flags — dead entries would silently pre-approve a future
    risky rewrite (round-10 advice)."""
    import sys

    sys.path.insert(0, str(REPO))
    from mapreduce_assignments_spark import workloads

    mod = _load()
    flagged = {
        name
        for name, sql in workloads.ORACLE.items()
        if mod.float_agg_sites(sql)
    }
    dead = sorted(set(mod.ALLOWLIST) - flagged)
    assert not dead, f"ALLOWLIST entries never flagged by the lint: {dead}"


def test_zero_sign_sweep_clean_at_driver_scale():
    """Empirical sign-of-zero gate (round-10 driver red): every
    oracle executed in DuckDB at the driver's sf0.01, every zeroed
    float cell signbit-checked. Textual lints cannot see this class
    (an embedding-component mean is sign-indefinite with no '-' in
    the SQL) and the exposure is data-dependent — sf0.001 shows zero
    hits while sf0.01 had six live -0.0 cells pre-fix."""
    spec = importlib.util.spec_from_file_location(
        "zero_sign_sweep", REPO / "tools" / "zero_sign_sweep.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    hits, errs = mod.sweep("/root/testdata/sf0.01")
    assert not errs, f"oracles failed to execute in the sweep: {errs}"
    assert not hits, (
        f"negative-zero cells in oracle output: {hits} — append a "
        "'+ 0.0' zero-sign normalizer to the rounded expression in "
        "BOTH the oracle SQL and the Spark operator"
    )


def test_taint_propagates_through_list_alias():
    """round-11: avg(..) AS m -> list(m ..) AS c -> round(f(c.c)..)
    must flag — the trainer-centroid chain the lint was blind to
    through round 10."""
    from tools.float_round_lint import float_agg_sites

    sql = """
    WITH cen AS (
      SELECT cell, list(m ORDER BY pos) AS c
      FROM (SELECT cell, pos, avg(v) AS m FROM t GROUP BY cell, pos)
      GROUP BY cell)
    SELECT round(list_dot_product(c.c, e.v), 6) AS d FROM cen c, e
    """
    assert float_agg_sites(sql), "list-alias taint chain not flagged"
    # min/max SELECT one input value — no new reorder error, but a
    # ulp-divergent avg stays divergent through them, so the chain
    # below must also flag
    sql_minmax = """
    WITH w AS (SELECT k, max(m) AS c
               FROM (SELECT k, avg(v) AS m FROM t GROUP BY k) GROUP BY k)
    SELECT round(c + 1.5, 6) FROM w
    """
    assert float_agg_sites(sql_minmax)
    # an untainted chain through the same shapes stays clean
    sql_clean = """
    WITH w AS (SELECT k, max(q) AS c
               FROM (SELECT k, CAST(v AS BIGINT) AS q FROM t) GROUP BY k)
    SELECT round(c / 64.0, 6) FROM w
    """
    assert not float_agg_sites(sql_clean)


def test_window_minmax_does_not_spread_taint():
    """round-11 ADVICE item 4: _PASSTHRU matched any min(/max( call
    textually, so a running min/max WINDOW frame over an untainted
    column could acquire statement-wide taint from an unrelated
    avg() elsewhere, forcing spurious ALLOWLIST entries. A windowed
    min(x) OVER (...) must no longer act as a passthrough."""
    from tools.float_round_lint import float_agg_sites

    # the taint map is statement-wide by name, so a window min over a
    # DIFFERENT table's column that happens to share the tainted
    # alias's name ('m') used to taint its own output alias ('mn')
    # through the passthrough rule and flag the round() downstream —
    # the exact spurious-ALLOWLIST class. (round() DIRECTLY around a
    # same-named identifier still over-flags; that is the documented
    # statement-wide coarseness, out of scope here.)
    sql = """
    WITH a AS (SELECT k, avg(v) AS m FROM t GROUP BY k),
         b AS (SELECT k, min(m) OVER (PARTITION BY k) AS mn FROM u_table)
    SELECT round(mn + 0.5, 6) FROM b
    """
    assert not float_agg_sites(sql), "window min acquired unrelated taint"
    # same but with PARENTHESES inside the window min's argument — a
    # regex lookahead cannot skip nested parens, so the OVER check
    # must run after the BALANCED closing paren (round-12 review)
    sql_nested = """
    WITH a AS (SELECT k, avg(v) AS m FROM t GROUP BY k),
         b AS (SELECT k, min(coalesce(m, 0.0))
                   OVER (PARTITION BY k) AS mn FROM u_table)
    SELECT round(mn + 0.5, 6) FROM b
    """
    assert not float_agg_sites(sql_nested), "nested-paren window min tainted"
    # a plain (non-window) min over a tainted alias still propagates
    sql_plain = """
    WITH a AS (SELECT k, avg(v) AS m FROM t GROUP BY k),
         b AS (SELECT min(m) AS c FROM a)
    SELECT round(c + 0.5, 6) FROM b
    """
    assert float_agg_sites(sql_plain)
