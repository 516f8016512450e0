"""Salted-join equivalence: the skew-resistant plan must produce exactly the
plain join's result."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.operators.skew import salted_join
from spark_streaming_logservice_spark.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_orderkey", "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")

    plain = (
        l.join(p, "p_partkey")
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(l, p, on="p_partkey", spread_col="l_orderkey", n=8)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    a = {r["p_brand"]: (r["n"], r["q"]) for r in plain.collect()}
    b = {r["p_brand"]: (r["n"], r["q"]) for r in salted.collect()}
    assert a == b and len(a) > 0


def test_salted_join_left_outer(spark, sf_dir):
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_orderkey"
    )
    plain = p.join(l, "p_partkey", "left").where(F.col("l_orderkey").isNull()).count()
    # left side = "fact" here to exercise outer semantics with salt
    salted = (
        salted_join(p, l.distinct(), on="p_partkey", spread_col="p_partkey", n=4, how="left")
    )
    # NOTE: outer-salted join multiplies unmatched rows? No: unmatched fact
    # rows carry one salt value, so they appear exactly once.
    assert salted.where(F.col("l_orderkey").isNull()).count() == plain
