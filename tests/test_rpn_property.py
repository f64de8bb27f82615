"""Property-based check of the RPN boolean query front-end: for random
query trees, the Spark DataFrame plan, the compiled SQL on DuckDB, and
a pure-Python set-algebra oracle must all agree."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_assignments_spark.operators.index import term_frequencies
from mapreduce_assignments_spark.plans.rpn import BooleanQueryPlanner, rpn_to_sql

# vocabulary drawn from the conftest docs fixture, plus a term that
# matches nothing (empty-set algebra must hold)
TERMS = ("the", "quick", "brown", "fox", "dog", "pack", "jugs", "ghostterm")

rpn = st.deferred(
    lambda: st.one_of(
        st.sampled_from(TERMS).map(lambda t: [t]),
        st.tuples(rpn, rpn, st.sampled_from(["AND", "OR"])).map(
            lambda t: t[0] + t[1] + [t[2]]
        ),
    )
)


def py_eval(tokens: list[str], doc_sets: dict[str, set]) -> set:
    stack: list[set] = []
    for tok in tokens:
        if tok in ("AND", "OR"):
            r, l = stack.pop(), stack.pop()
            stack.append(l & r if tok == "AND" else l | r)
        else:
            stack.append(doc_sets.get(tok, set()))
    return stack[0]


@pytest.fixture(scope="module")
def harness(spark, docs):
    tfs = term_frequencies(docs).cache()
    planner = BooleanQueryPlanner(tfs)
    rows = tfs.collect()
    doc_sets: dict[str, set] = {}
    for r in rows:
        doc_sets.setdefault(r["term"], set()).add(r["docid"])
    con = duckdb.connect()
    con.execute("CREATE TABLE postings (term VARCHAR, docid BIGINT)")
    con.executemany(
        "INSERT INTO postings VALUES (?, ?)",
        [(r["term"], r["docid"]) for r in rows],
    )
    return planner, doc_sets, con


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(tokens=rpn)
def test_rpn_three_way_agreement(harness, tokens):
    planner, doc_sets, con = harness
    query = " ".join(tokens)
    want = py_eval(tokens, doc_sets)
    got_spark = {r["docid"] for r in planner.plan(query).collect()}
    got_duck = {r[0] for r in con.execute(f"SELECT docid FROM {rpn_to_sql(query)} q").fetchall()}
    assert got_spark == want
    assert got_duck == want
