#!/usr/bin/env python
"""Hash-stability lint for ``round()`` over cross-row float aggregates
(the round-9 ``embedding_covariance`` driver-flake class).

Background: the driver's correctness gate hashes query output values.
A column like ``round(sum(x), 6)`` over DOUBLE ``x`` is only
*probabilistically* hash-stable — double addition is not associative,
so Spark's task-scheduling-ordered partial sums and DuckDB's scan-
ordered sums can differ by ~n·ulp, and when a cell's true value lands
within that error of a 0.5e-6 rounding boundary the two engines
legitimately round apart. The per-cell probability is tiny (~1e-6 per
output cell at bench scales), but it multiplies by output cardinality:
``embedding_covariance``'s 4096 cells made it the first driver-red row
in four rounds.

This lint scans every ``workloads.ORACLE`` SQL (the oracle mirrors the
operator formula by contract — hash equality in the gates enforces
that) and classifies each ``round(...)`` site whose argument contains
a cross-row aggregate:

- **decimal-exact** — the aggregate argument is DECIMAL-cast; decimal
  sums are fixed-point-exact, hence order-independent. Safe.
- **integer-exact** — the aggregate argument is integer (explicit
  BIGINT/INTEGER cast, ``floor(...)`` fixed-point quantization, or a
  CASE over integer literals). Safe.
- **float-agg** — a genuine double sum/avg/corr/regr under round():
  order-dependent. Must either be fixed (quantize summands like
  ``embedding_covariance``/``label_centroids``) or appear in
  ``ALLOWLIST`` below with its output-cell bound; the residual risk
  budget is enforced as cells × 2e-5 < 0.2% per driver round.

Per-row ``round()`` (no aggregate inside) is inherently deterministic
— same input row, same IEEE ops, same value in both engines — and is
not flagged.

Alias taint propagates through value-passthrough functions
(``list``/``array_agg``/``first``/``min``/``max`` — selections add
no reorder error but a ulp-divergent input stays divergent through
them) to a fixpoint — round 11 closed
the ``avg(..) AS m`` → ``list(m ..) AS c`` → ``round(f(c)..)`` blind
spot, which surfaced the trainer-centroid class (IVF/PQ oracles
whose Lloyd's-mean codebooks feed rounded distance argmins); those
carry reasoned ALLOWLIST entries instead of hiding.

Known limitations (documented, round-10 advice):

- A textual lint cannot see CTE column types, so ``CAST(sum(col) AS
  BIGINT)`` over an upstream-quantized LONG column is accepted as
  exact by convention (the shipped embedding_covariance shape). If
  ``col`` were secretly DOUBLE, the value-cast would NOT make the sum
  order-independent — keep quantization in the same statement.
- Taint is statement-wide, not scope-aware: a tainted alias name
  taints every same-named identifier in the statement (e.g. a table
  alias ``s`` vs a column ``s``) — coarse, but it only ever
  over-flags, never under-flags.
- The SIGN OF ZERO is invisible to this lint: DuckDB's multiply-based
  ``round()`` emits ``-0.0`` for tiny-negative results where Spark's
  BigDecimal HALF_UP emits ``+0.0``, and the driver's value hash
  covers the sign bit (round-10 driver red on embedding_covariance).
  Sign-indefiniteness is data-dependent (zero hits at sf0.001, live
  at the driver's sf0.01), so it is gated EMPIRICALLY by
  ``tools/zero_sign_sweep.py`` — every oracle run in DuckDB at the
  driver's scale, every zeroed float cell signbit-checked — wired
  into pytest alongside this lint.

Exit 1 (and the pytest wrapper fails) on any float-agg site that is
neither fixed nor allowlisted, so new queries can't silently re-add
the flake class.

Usage: python tools/float_round_lint.py [-v]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

AGG = re.compile(
    r"\b(sum|avg|corr|covar_pop|covar_samp|stddev|stddev_pop|stddev_samp"
    r"|var_pop|var_samp|regr_slope|regr_intercept)\s*\(",
    re.I,
)
# Exact-making wrappers must sit at the argument ROOT (round-10
# advice: `sum(x * floor(y))` is NOT order-independent even though
# floor( appears somewhere inside). Roots accepted as exact: a
# CAST/TRY_CAST of the whole argument to a decimal/integer type, a
# floor() of the whole argument, or a CASE over integer literals.
_EXACT_CAST_TYPES = r"(?:DECIMAL|BIGINT|INTEGER|HUGEINT|INT|SMALLINT|TINYINT)"
_INT_CASE = re.compile(
    r"^CASE\s+WHEN\b.*\bTHEN\s+\d+\s+ELSE\s+\d+\s+END$", re.I | re.S
)


def _wraps_whole(arg: str, m: re.Match) -> bool:
    """True when the paren opened at m.end()-1 closes at arg's end."""
    depth = 0
    for i in range(m.end() - 1, len(arg)):
        if arg[i] == "(":
            depth += 1
        elif arg[i] == ")":
            depth -= 1
            if depth == 0:
                return not arg[i + 1 :].strip()
    return False


def _split_top(a: str, ops: str) -> list[str] | None:
    """Split on top-level (paren-depth-0) binary operators; None when
    no top-level operator exists."""
    parts: list[str] = []
    depth, last = 0, 0
    for i, ch in enumerate(a):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in ops and a[last:i].strip():
            parts.append(a[last:i])
            last = i + 1
    if not parts:
        return None
    parts.append(a[last:])
    return parts


def _arg_is_exact(arg: str) -> bool:
    """Structural exactness: the summand is a fixed-point value —
    an integer literal, a decimal/integer CAST, a floor(), or a
    +/-/* composition / CASE / COALESCE of such terms. Decimal and
    integer arithmetic is fixed-point-exact, hence order-independent;
    division and any bare column/alias reference are NOT (the textual
    lint cannot see CTE column types). The wrapper must sit at the
    argument ROOT: ``sum(x * floor(y))`` is order-dependent even
    though floor( appears inside (round-10 advice)."""
    a = arg.strip()
    if not a:
        return False
    while True:  # strip fully-wrapping paren groups
        m = re.match(r"\(", a)
        if m and _wraps_whole(a, m):
            a = a[1:-1].strip()
        else:
            break
    # CASE root first: branch expressions sit at paren-depth 0, so
    # the operator split below would otherwise cut through them
    if re.match(r"CASE\b", a, re.I) and re.search(r"\bEND\s*$", a, re.I):
        branches = re.findall(
            r"\b(?:THEN|ELSE)\b(.*?)(?=\bWHEN\b|\bELSE\b|\bEND\b)",
            a,
            re.I | re.S,
        )
        return bool(branches) and all(_arg_is_exact(b) for b in branches)
    parts = _split_top(a, "/")
    if parts is not None:
        return False  # float division at the summand root
    parts = _split_top(a, "+-*")
    if parts is not None:
        return all(_arg_is_exact(p) for p in parts)
    if re.fullmatch(r"\d+", a):
        return True
    m = re.match(r"(?:TRY_)?CAST\s*\(", a, re.I)
    if m and _wraps_whole(a, m):
        inner = a[m.end() : len(a) - 1]
        return bool(
            re.search(
                rf"\bAS\s+{_EXACT_CAST_TYPES}\s*(?:\([\d\s,]*\))?\s*$",
                inner,
                re.I,
            )
        )
    m = re.match(r"floor\s*\(", a, re.I)
    if m and _wraps_whole(a, m):
        return True
    m = re.match(r"COALESCE\s*\(", a, re.I)
    if m and _wraps_whole(a, m):
        inner = a[m.end() : len(a) - 1]
        args = _split_top(inner, ",") or [inner]
        return all(_arg_is_exact(p) for p in args)
    return False

# Float-agg sites accepted as-is: every entry bounds its output cells
# (the flake probability multiplier). Budget: cells × 2e-5 — the
# conservative per-cell boundary width at bench scale — must stay
# under 0.2% per driver round. Large-cell-grid queries are NOT
# allowlistable; quantize their summands instead (see
# embedding_covariance / label_centroids, round 10).
ALLOWLIST: dict[str, str] = {
    "bigram_logprob": "20 rows, one logprob cell each",
    "ivf_recall_report": "trainer-centroid class (see "
    "ivf_topk_trained); recall output is <=5 rows of integer-count "
    "ratios",
    "ivf_topk_trained": "trainer-centroid class: Lloyd's-mean "
    "centroids (cross-row avg) feed 6dp-rounded distance argmins — a "
    "reorder-ulp flip needs a knife-edge tie at 1e-6 resolution in "
    "one of k=8 cells; empirically green since r5 across driver "
    "rotations and both local gates; exposure surfaced (not hidden) "
    "by the round-11 taint propagation",
    "pq_adc_topk": "trainer-centroid class (codebook means feed "
    "rounded assignment); the ADC sums themselves are fixed-point "
    "LONG — exposure is (a) the knife-edge argmin of "
    "ivf_topk_trained AND (b) the LUT quantization itself: entries "
    "are floor((cc - 2*c.q + qn2) * 2^20) over avg-derived "
    "codewords, so a cross-engine ulp in any codeword flips floor() "
    "whenever d2*2^20 sits within a ulp of an integer — a surface "
    "on every (query, codeword) cell, broader than argmin ties "
    "alone (round-11 ADVICE); gated by the same empirical rotation",
    "pq_codes": "trainer-centroid class; output is (vec_id, "
    "subspace, code) ints — a flip needs a 1e-6 distance tie",
    "pq_recall_report": "trainer-centroid class via the shared PQ "
    "CTEs; output is 5 rows of integer-count ratios",
    "ivf_silhouette": "sq is floor(s * 2^20) BIGINT in the upstream "
    "CTE — the sum is an exact integer (order-independent), float "
    "only at the final division; <=8 cells, zero-sign normalized",
    "conversion_lag": "lag_s is an integer epoch-second diff; the sum "
    "is exact, float only at the final division",
    "hourly_anomalies": "avg over integer hourly counts (exact sums); "
    "float only at division",
    "market_share": "dp is DECIMAL(18,6) in the upstream CTE; both "
    "sums are decimal-exact (textual lint can't see CTE types)",
    "packing_efficiency": "ws_tokens is an integer token count; "
    "sums exact",
    "pareto_report": "spend is a DECIMAL o_totalprice sum upstream; "
    "<=5 output rows regardless",
    "region_nation_share": "share = rounded-decimal revenue / <=25-"
    "term window sum of 6dp-rounded doubles; <=25 cells",
    "revenue_share": "same shape as region_nation_share; <=25 cells",
    "rolling_weekly_revenue": "7-term ordered-frame window sums over "
    "6dp-rounded day revenues; frame order is the ORDER BY in both "
    "engines",
    "sliding_hourly_stats": "window avg over integer event counts; "
    "sums exact",
    "bm25_topk": "<=50 (query,doc) score rows",
    "char_entropy": "20 rows (top-20 langs/sources)",
    "conversion_by_activity": "<=10 activity buckets",
    "corpus_card": "20 datasheet rows, 2 float cells",
    "daily_trend": "1 regression row",
    "dsir_weights": "500 rows but weight = 2 log-sums over "
    "vocab-bounded (512-bucket) tables -> reorder error ~1e-13 on "
    "O(100)-term sums; risk 500*2e-7 ~ 1e-4",
    "event_transitions": "cnt/sum(cnt): integer sums, float only at "
    "the final division — deterministic given exact sums",
    "harmonic_centrality": "25 rows, <=6-hop bounded sums",
    "heldout_logprob": "1 row",
    "index_shard_balance": "1 row (max/mean over integer sums)",
    "interarrival_rates": "<=20 rows",
    "label_spread": "10 rows",
    "language_id_accuracy": "n/n_true are confusion-matrix counts; "
    "integer sums, float only at the division",
    "repetition_stats": "n_ngrams/dup/n_bi are ngram counts; integer "
    "sums, float only at the ratios",
    "vocab_coverage": "covered/total_tokens are token counts; integer "
    "sums",
    "length_drift_psi": "1 row",
    "linear_attribution": "<=20 channel rows",
    "lsh_topk": "per-row hyperplane dot products (cross-row only in "
    "the <=10-row top-k), <=10 rows",
    "margin_bitext": "<=50 pair rows, k<=4-term window means",
    "mrr_eval": "5 rows",
    "order_gap_stats": "1 row",
    "order_size_correlation": "1 corr row",
    "pagerank_convergence": "<=10 residual rows (one per iteration)",
    "perplexity_buckets": "15 rows (per-lang ntile buckets)",
    "point_in_time_state": "1 row",
    "quality_length_correlation": "1 corr row",
    "quantization_error": "<=10 label rows, per-row cosines rounded "
    "before the group mean",
    "query_likelihood": "<=50 score rows",
    "rrf_fusion": "<=50 fused rows, <=2-term sums",
    "slo_burn_rate": "integer err/n sums, float only at division",
    "source_stats": "4 source rows, per-row scores rounded before "
    "the group mean",
    "temperature_mix": "4 rows, 4-term softmax denominator",
    "tokenizer_fertility": "4 source rows, integer token sums",
    "transition_latency": "<=25 rows",
    "unigram_logprob": "500 rows but per-doc sums are "
    "vocab-bounded short (<=64-term) -> risk ~1e-4",
    "user_entropy": "<=20 rows",
    "winsorize_values": "2 rows",
    "zipf_fit": "1 regression row",
    "dedup_threshold_curve": "toks and total are sums of integer "
    "whitespace token counts (exact at any order); float only at the "
    "final savings division; 5 threshold rows, 1 float cell each",
    "heaps_law_fit": "2 fit cells over a 10-point ln curve whose "
    "inputs are exact integer cumulative sums (BIGINT token/type "
    "counts) — the zipf_fit class with a fixed 10-row domain",
    "unimax_allocation": "every summand is an exact "
    "integer-in-double (BIGINT n_units, x4.0 capacity, 0.5x budget "
    "— all < 2^53), so the window sums are order-independent "
    "exactly; float arithmetic only at the final water-level "
    "division; #sources (= 20) cells",
}


def _balanced(s: str, open_idx: int) -> str:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx + 1 : i]
    return s[open_idx + 1 :]


_TYPE_WORDS = frozenset(
    "double bigint integer int hugeint decimal real float varchar"
    " boolean date timestamp smallint tinyint text".split()
)


def _expr_tail(sql: str, pos: int) -> str:
    """Text from ``pos`` to the end of the enclosing SELECT-list
    expression: stops at a top-level comma/newline. A ``)`` at depth 0
    closes a wrapper that opened BEFORE pos — it is consumed (and the
    scan continues) only when the text so far ends in an ``AS <type>``
    cast tail, so ``CAST(sum(x) AS DOUBLE) AS s`` keeps its real alias
    ``s`` inside the segment (round-10 advice: the old non-greedy
    match captured DOUBLE and stopped)."""
    depth = 0
    i = pos
    while i < len(sql):
        ch = sql[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                if re.search(r"\bAS\s+\w+[^(),]*$", sql[pos:i], re.I):
                    i += 1
                    continue
                break
            depth -= 1
        elif ch in ",\n" and depth == 0:
            break
        i += 1
    return sql[pos:i]


# Value-passthrough functions: their output carries whatever error
# their tainted inputs carry — list/array_agg re-package element
# values, first/min/max select ONE input value, but a selected value
# that diverged upstream by a ulp is still divergent (selection adds
# no reorder error yet propagates existing value divergence).
# WINDOW min/max (``min(..) OVER (..)``) is excluded in
# _propagate_taint by checking the text after the BALANCED closing
# paren (a regex lookahead cannot skip nested parens in the
# argument) — a windowed selection is still a selection, but the
# dominant false-positive class was running-min/max frames over
# untainted same-named columns acquiring statement-wide taint
# (round-11 ADVICE: over-flag-only, but each spurious flag costs an
# ALLOWLIST entry as the oracle corpus grows).
_PASSTHRU = re.compile(r"\b(list|array_agg|first|min|max)\s*\(", re.I)
_OVER_AFTER = re.compile(r"\s*OVER\s*\(", re.I)


def _propagate_taint(sql: str, aliases: set[str]) -> set[str]:
    """One-hop-per-pass fixpoint: an alias bound to a passthrough
    call over tainted identifiers is itself tainted — closes the
    ``avg(..) AS m`` → ``list(m ..) AS c`` → ``round(f(c.c)..)``
    chain the IVF/PQ trainer oracles use (pre-round-11 the lint was
    blind past the first alias)."""
    changed = True
    while changed:
        changed = False
        for pm in _PASSTHRU.finditer(sql):
            arg = _balanced(sql, pm.end() - 1)
            if _OVER_AFTER.match(sql, pm.end() + len(arg) + 1):
                continue  # windowed min/max: not a passthrough here
            idents = {w.lower() for w in re.findall(r"\b[a-zA-Z_]\w*\b", arg)}
            if not (idents & aliases):
                continue
            tail = _expr_tail(sql, pm.end() - 1 + len(arg) + 2)
            cands = [
                w
                for w in re.findall(r"\bAS\s+(\w+)", tail, re.I)
                if w.lower() not in _TYPE_WORDS
            ]
            if cands and cands[-1].lower() not in aliases:
                aliases.add(cands[-1].lower())
                changed = True
    return aliases


def _float_agg_aliases(sql: str) -> set[str]:
    """Aliases bound to non-exact float aggregates anywhere in the
    statement (``sum(x) AS sxy`` in a CTE, rounded later by alias —
    the exact shape of the pre-fix embedding_covariance oracle).
    Taint then propagates through value-passthrough aliases
    (:func:`_propagate_taint`)."""
    aliases = set()
    for am in AGG.finditer(sql):
        arg = _balanced(sql, am.end() - 1)
        if am.group(1).lower() not in ("corr", "regr_slope", "regr_intercept") \
                and _arg_is_exact(arg):
            continue
        # what follows the aggregate's closing paren: OVER (...), a
        # cast/arithmetic tail, then an optional AS alias
        tail = _expr_tail(sql, am.end() - 1 + len(arg) + 2)
        # a cast of the aggregate VALUE to an integer/decimal type
        # keeps the lint's existing exactness convention (the sum is
        # over a CTE column the textual lint can't type) — but a cast
        # to DOUBLE/REAL/FLOAT stays float and the downstream alias
        # must be tracked
        if re.search(
            rf"\bAS\s+{_EXACT_CAST_TYPES}\w*\s*\)", tail, re.I
        ):
            continue
        cands = [
            w
            for w in re.findall(r"\bAS\s+(\w+)", tail, re.I)
            if w.lower() not in _TYPE_WORDS
        ]
        if cands:
            aliases.add(cands[-1].lower())
    return _propagate_taint(sql, aliases)


def float_agg_sites(sql: str) -> list[str]:
    """Snippets of round() sites whose argument holds a non-exact
    cross-row aggregate — inline, or by reference to an alias a float
    aggregate was bound to upstream in the same statement."""
    aliases = _float_agg_aliases(sql)
    out = []
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        inner = _balanced(sql, m.end() - 1)
        flagged = False
        for am in AGG.finditer(inner):
            arg = _balanced(inner, am.end() - 1)
            if am.group(1).lower() in ("corr", "regr_slope", "regr_intercept"):
                flagged = True
                break
            if not _arg_is_exact(arg):
                flagged = True
                break
        if not flagged and aliases:
            idents = {
                w.lower()
                for w in re.findall(r"\b[a-zA-Z_]\w*\b", inner)
            }
            flagged = bool(idents & aliases)
        if flagged:
            out.append(re.sub(r"\s+", " ", inner).strip()[:100])
    return out


def run(verbose: bool = False) -> list[tuple[str, str]]:
    """Returns [(query, snippet)] for UNGUARDED float-agg roundings
    (not fixed, not allowlisted)."""
    from mapreduce_assignments_spark import workloads

    bad = []
    n_float = 0
    flagged_names = set()
    for name, sql in sorted(workloads.ORACLE.items()):
        sites = float_agg_sites(sql)
        if not sites:
            continue
        n_float += 1
        flagged_names.add(name)
        if name in ALLOWLIST:
            if verbose:
                print(f"[allow] {name}: {ALLOWLIST[name]}")
            continue
        bad.append((name, sites[0]))
    stale = sorted(set(ALLOWLIST) - set(workloads.ORACLE))
    for name in stale:
        bad.append((name, "ALLOWLIST entry for unknown query"))
    # dead entries: allowlisted but never flagged — they would
    # silently pre-approve a future risky rewrite (round-10 advice)
    for name in sorted(set(ALLOWLIST) & set(workloads.ORACLE) - flagged_names):
        bad.append((name, "ALLOWLIST entry but no float-agg site (dead)"))
    if verbose:
        print(f"{n_float} float-agg-rounding queries, "
              f"{len(bad)} unguarded, {len(ALLOWLIST)} allowlisted")
    return bad


def main() -> int:
    verbose = "-v" in sys.argv
    bad = run(verbose=verbose)
    for name, snippet in bad:
        print(f"[UNGUARDED] {name}: round over float aggregate -> "
              f"quantize summands or allowlist with a cell bound | {snippet}")
    if not bad:
        print("float-round lint clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
