"""RPN boolean-retrieval query front-end.

The reference evaluates postfix boolean queries over the inverted
index: a bare term pushes its doc-id set; ``AND`` / ``OR`` pop two
sets and push intersection / union; the final set is printed with the
matching lines (BooleanRetrievalCompressed.java:47-102, canned queries
at :177-178, e.g. ``"white red OR rose AND pluck AND"``).

This module is the engine's equivalent query-language surface: it
lowers an RPN string to

- a DataFrame plan over the flattened postings table (term ->
  distinct-docid DataFrames combined with intersect/union — Catalyst
  turns these into semi-join / union-distinct physical plans), and
- an equivalent ANSI-SQL string (nested INTERSECT/UNION), used by the
  DuckDB oracle harness.

Scale: each term's doc-id set is a filter over the term-sorted
postings parquet (row-group pruned); intersections of k terms become
a tree of shuffle-or-broadcast semi-joins that AQE sizes at runtime.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_OPS = {"AND", "OR"}


def _tokens(query: str) -> list[str]:
    toks = query.split()
    if not toks:
        raise ValueError("empty query")
    return toks


class BooleanQueryPlanner:
    """Lower RPN boolean queries to DataFrame plans.

    ``postings`` is the flattened ``(term, docid, tf)`` table from
    :func:`mapreduce_assignments_spark.operators.index.term_frequencies`.
    """

    def __init__(self, postings: DataFrame):
        self.postings = postings

    def _term_docs(self, term: str) -> DataFrame:
        return self.postings.where(F.col("term") == term).select("docid").distinct()

    def plan(self, query: str) -> DataFrame:
        """Evaluate an RPN query → DataFrame of matching ``docid``."""
        stack: list[DataFrame] = []
        for tok in _tokens(query):
            if tok in _OPS:
                if len(stack) < 2:
                    raise ValueError(f"operator {tok} with <2 operands in {query!r}")
                right, left = stack.pop(), stack.pop()
                stack.append(
                    left.intersect(right) if tok == "AND" else left.union(right).distinct()
                )
            else:
                stack.append(self._term_docs(tok))
        if len(stack) != 1:
            raise ValueError(f"malformed RPN query {query!r}: {len(stack)} operands left")
        return stack[0]

    def retrieve(self, query: str, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
        """Full retrieval: matching docids joined back to text,
        ascending docid (reference prints TreeSet order,
        BooleanRetrievalCompressed.java:76)."""
        hits = self.plan(query)
        return (
            hits.join(docs, hits["docid"] == docs[id_col])
            .select(F.col("docid"), F.col("text"))
            .orderBy("docid")
        )


def rpn_to_sql(
    query: str,
    postings_rel: str = "postings",
    term_col: str = "term",
    doc_col: str = "docid",
) -> str:
    """Compile the same RPN query to an ANSI-SQL doc-id set expression
    (used to build DuckDB oracle queries)."""
    stack: list[str] = []
    for tok in _tokens(query):
        if tok in _OPS:
            if len(stack) < 2:
                raise ValueError(f"operator {tok} with <2 operands in {query!r}")
            right, left = stack.pop(), stack.pop()
            op = "INTERSECT" if tok == "AND" else "UNION"
            stack.append(f"({left} {op} {right})")
        else:
            t = tok.replace("'", "''")
            stack.append(
                f"(SELECT DISTINCT {doc_col} FROM {postings_rel} WHERE {term_col} = '{t}')"
            )
    if len(stack) != 1:
        raise ValueError(f"malformed RPN query {query!r}: {len(stack)} operands left")
    return stack[0]
