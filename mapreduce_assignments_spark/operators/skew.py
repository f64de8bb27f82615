"""Skew-mitigation utilities.

AQE's skew-join splitting handles most hot keys at runtime, but it
only applies to sort-merge joins and only splits the PROBE side. When
a key is so hot that one task would still take the stage hostage — or
when the join must be shuffled-hash — the classic fix is salting:

- the big (skewed) side gets a deterministic salt in [0, salt),
- the small side is replicated once per salt value,
- the join key becomes (key, salt), spreading each hot key over
  ``salt`` tasks.

Cost: small side inflates ×salt — use only when the small side is
modest and broadcast is infeasible (e.g. it exceeds driver/executor
broadcast budget). For the supported join types (inner / left /
left_semi / left_anti) results are exactly equal to the unsalted join;
right/full joins are rejected because the replicated small side would
emit every unmatched small row once per salt value.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with hot-key salting. ``big`` is the skewed side;
    ``small`` is replicated ``salt`` times. Deterministic: the salt is
    a hash of the big side's whole row (xxhash64), not rand().

    Returns exactly the columns a plain ``big.join(small, on, how)``
    would. ``how`` is restricted to join types that preserve the big
    side only — an outer-preserved small side would surface each
    unmatched small row ``salt`` times."""
    if salt < 1:
        raise ValueError("salt must be >= 1")
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports only big-side-preserving joins "
            f"{sorted(allowed)}; got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    salts = big.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
    small_s = small.crossJoin(F.broadcast(salts))
    joined = big_s.join(small_s, [*keys, "__salt"], how)
    return joined.drop("__salt")
