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


def _register_q25() -> None:
    """q25: the salted-join path proved equivalent to the plain join.

    The oracle is the UNSALTED join — the whole point of salting is that the
    result is identical while the hot key's rows spread over n reducers. At
    100 TB this is the mitigation for a power-law fact key that AQE's
    skew-split can't fix (e.g. when the skew is in the *build* of a
    downstream agg, not the join itself)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from spark_streaming_logservice_spark.registry import query
    from spark_streaming_logservice_spark.tables import load_table

    @query(
        "q25_salted_skew_join",
        oracle="""
        SELECT o_orderpriority,
               count(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
    )
    def q25_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
        )
        dim = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        j = salted_join(l, dim, on="l_orderkey", spread_col="l_partkey", n=8)
        return (
            j.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )


_register_q25()
