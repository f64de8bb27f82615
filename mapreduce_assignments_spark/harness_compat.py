"""Driver-harness compatibility checks for driver-window queries.

The per-round driver compares each registered query against its DuckDB
oracle by converting BOTH results to pandas and canonicalizing with
``sort_values`` before value-hashing. That contract is stricter than
plain value equality, and two classes of exact-answer queries have
failed it historically (round 5):

1. ARRAY/MAP/STRUCT output columns — pandas ``sort_values`` raises
   ``TypeError: unhashable type: 'list'`` on list cells, so the driver
   records an err row even though every value matches.
2. dtype drift — DuckDB ``sum(BIGINT)`` returns HUGEINT, which pandas
   renders as float64; the driver then hashes ``5968.0`` against
   Spark's int64 ``5968`` and records hash_match=false.

This module replicates the driver's canonicalization faithfully enough
to catch both classes BEFORE a rotation ships:

- :func:`lint_spark_schema` — flags driver-unsortable output columns.
- :func:`pandas_canon` — the driver-style canonical frame (columns
  sorted by name, rows sorted by all columns, index dropped).
- :func:`pandas_canon_compare` — dtype equality + canonical value
  equality between the Spark result and the oracle result, both as
  pandas frames; returns a list of human-readable issues (empty =
  driver-compatible).

Used by ``tools/check_correctness.py --pandas-canon`` and the pytest
suite; run it for every query you plan to rotate INTO the 50-entry
driver window.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["lint_spark_schema", "pandas_canon", "pandas_canon_compare"]

# type prefixes pandas sort_values cannot order (unhashable cells) —
# exactly the shapes that crashed the driver canonicalizer in round 5
_UNSORTABLE_PREFIXES = ("array", "map", "struct")


def lint_spark_schema(df: DataFrame) -> list[str]:
    """Return one issue per output column whose Spark type would crash
    or destabilize the driver's pandas canonicalizer."""
    issues = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t.startswith(_UNSORTABLE_PREFIXES):
            issues.append(
                f"column '{f.name}' has driver-unsortable type {t} "
                "(pandas sort_values raises on unhashable cells)"
            )
    return issues


def pandas_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize a result frame the way the driver does: columns
    sorted by name, rows sorted by every column, positional index.
    Raises (like the driver) if any column holds unhashable cells."""
    out = pdf[sorted(pdf.columns)]
    if len(out.columns):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def pandas_canon_compare(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> list[str]:
    """Driver-faithful comparison of a Spark result and a DuckDB
    oracle result (both already pandas). Returns issues; empty means
    the driver's rows/schema/value-hash checks would all pass."""
    issues: list[str] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"schema mismatch: spark {s_cols} vs oracle {o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        issues.append(
            f"row count {len(spark_pdf)} vs {len(oracle_pdf)}"
        )
    for c in s_cols:
        sd, od = str(spark_pdf[c].dtype), str(oracle_pdf[c].dtype)
        if sd.startswith("datetime64") and od.startswith("datetime64"):
            # resolution-only difference (Spark toPandas = ns, DuckDB
            # .df() = us): equal instants hash equal after pandas'
            # own comparison coercion — normalized below before canon
            continue
        if sd != od:
            issues.append(
                f"column '{c}' dtype drift: spark {sd} vs oracle {od} "
                "(the driver hashes raw pandas values, so float64 vs "
                "int64 breaks the value hash even when equal — CAST "
                "the oracle expression)"
            )
    if issues:
        return issues
    spark_pdf, oracle_pdf = spark_pdf.copy(), oracle_pdf.copy()
    for c in s_cols:
        if str(spark_pdf[c].dtype).startswith("datetime64"):
            spark_pdf[c] = spark_pdf[c].astype("datetime64[us]")
            oracle_pdf[c] = oracle_pdf[c].astype("datetime64[us]")
    try:
        sc = pandas_canon(spark_pdf)
        oc = pandas_canon(oracle_pdf)
    except TypeError as e:  # unhashable cells — the driver errs here
        return [f"driver canonicalization would fail: {e}"]
    # Bit-exact compare via the driver's own hash primitive.
    # Series.equals treats -0.0 == +0.0 as equal, but the driver's
    # pd.util.hash_pandas_object hashes the raw sign bit — round 10
    # shipped "re-gated exact" on exactly that gap (DuckDB round()
    # emitting -0.0 where Spark emits +0.0). Hash digests see what
    # the driver sees; nothing weaker is allowed here.
    diff_cols = []
    for c in sc.columns:
        sh = pd.util.hash_pandas_object(sc[c], index=False).to_numpy()
        oh = pd.util.hash_pandas_object(oc[c], index=False).to_numpy()
        if sh.shape != oh.shape or not (sh == oh).all():
            diff_cols.append(c)
    if diff_cols:
        issues.append(
            f"canonical values differ (bit-exact hash) in columns {diff_cols}"
        )
    return issues
