"""Bit-identity pins for the r15 SQL-string expression builders.

Round-15 rebuilt the widest signature expressions (simhash's 62-fold
vote, minhash's num_hashes-fold signature, the LSH band structs) as
single ``F.expr`` SQL parses instead of per-node py4j Column
composition — a CONSTRUCTION-time optimization (~1.1-1.6 s of driver
time per call at 32+ folds) that must not change a single bit of
output.  These tests rebuild the HISTORICAL Column-API forms inline
(copied from the pre-r15 ``operators/dedup.py``) and assert row-exact
equality, so any future drift between the SQL text and the Column
semantics fails loudly instead of silently changing signatures.
"""

import pyspark.sql.functions as F
import pytest

from mapreduce_assignments_spark.functions.hashing import (
    h28,
    h60,
    minhash_value,
)
from mapreduce_assignments_spark.operators.dedup import (
    _shingle_array,
    minhash_signatures,
    simhash,
)
from mapreduce_assignments_spark.operators.text import tokens_array


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumped over a lazy dog today"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow"),
        (4, "a b c d e f g h i j k l m n o p"),
        (5, ""),
        (6, "   "),
        (7, "one-token"),
        (8, "repeat repeat repeat repeat repeat repeat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _simhash_column_form(docs, bits=62, text_col="text", id_col="doc_id"):
    """The pre-r15 Column-API simhash, verbatim."""
    toks = tokens_array(text_col)
    base = docs.where(F.size(toks) >= 1).select(
        F.col(id_col).alias("doc_id"), F.transform(toks, h60).alias("hs")
    )

    def vote(b):
        return F.aggregate(
            F.col("hs"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == F.lit(1), F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    sig = None
    for b in range(bits):
        term = F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return base.select("doc_id", sig.alias("simhash"))


def _minhash_column_form(docs, n=3, num_hashes=16, text_col="text", id_col="doc_id"):
    """The pre-r15 Column-API minhash_signatures, verbatim."""

    def mh(i):
        return lambda h: minhash_value(h, i)

    toks = tokens_array(text_col)
    base = docs.where(F.size(toks) >= n).select(
        F.col(id_col).alias("doc_id"),
        F.transform(_shingle_array(n, text_col), h28).alias("hs"),
    )
    sig = F.array(
        *[F.array_min(F.transform(F.col("hs"), mh(i))) for i in range(num_hashes)]
    )
    return base.select("doc_id", sig.alias("sig"))


def test_simhash_sql_matches_column_form(docs):
    for bits in (1, 7, 62):
        new = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=bits).collect()}
        old = {
            r["doc_id"]: r["simhash"]
            for r in _simhash_column_form(docs, bits=bits).collect()
        }
        assert new == old, f"simhash bits={bits} drifted from Column form"


def test_minhash_sql_matches_column_form(docs):
    for num_hashes in (1, 16):
        new = {
            r["doc_id"]: r["sig"]
            for r in minhash_signatures(docs, num_hashes=num_hashes).collect()
        }
        old = {
            r["doc_id"]: r["sig"]
            for r in _minhash_column_form(docs, num_hashes=num_hashes).collect()
        }
        assert new == old, f"minhash num_hashes={num_hashes} drifted from Column form"
