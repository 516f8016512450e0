"""Skew-handling join utilities (SURVEY.md §4.2 / 100 TB posture).

AQE's skew-join splitting handles most cases at runtime; these utilities
cover the two places AQE can't: (a) a known-hot key set you want salted
deterministically regardless of runtime stats, and (b) broadcast-side
replication when the dimension is small enough to replicate but the fact
side's hot keys would still hash to one reducer.

Salting scheme: fact side gets ``salt = pmod(hash(<spread col>), n)``; the
small side is exploded n ways (one copy per salt). Join on (key, salt) —
the hot key's rows spread over n reducers. Pure column operations, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def salt_fact(df: DataFrame, spread_col: str, n: int = DEFAULT_SALT_BUCKETS,
              salt_col: str = "__salt__") -> DataFrame:
    """Add a deterministic salt derived from a high-cardinality column (NOT
    the join key — the point is to spread identical join keys apart)."""
    return df.withColumn(salt_col, F.pmod(F.hash(F.col(spread_col)), F.lit(n)))


def explode_dim(df: DataFrame, n: int = DEFAULT_SALT_BUCKETS,
                salt_col: str = "__salt__") -> DataFrame:
    """Replicate the small side once per salt bucket."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Column,
    spread_col: str,
    n: int = DEFAULT_SALT_BUCKETS,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: fact salted, dim replicated n ways, join on
    (key, salt). Result equals the plain join (each fact row matches exactly
    the dim copy carrying its salt)."""
    key = on if isinstance(on, str) else None
    if key is None:
        raise ValueError("salted_join requires a column-name join key")
    f = salt_fact(fact, spread_col, n)
    d = explode_dim(dim, n)
    joined = f.join(d, [key, "__salt__"], how)
    return joined.drop("__salt__")
