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
