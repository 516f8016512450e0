"""Round-6 wave: column profiling, window battery plan shape."""

from __future__ import annotations


def test_profile_counts_nulls_and_distincts(spark):
    from spark_streaming_logservice_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [
            (1, "a", 1.5),
            (2, None, 2.5),
            (3, "a", None),
            (4, "b", None),
            (5, None, 1.5),
        ],
        "id BIGINT, tag STRING, score DOUBLE",
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["tag", "score", "id"]).collect()}
    assert set(rows) == {"tag", "score", "id"}
    t = rows["tag"]
    assert (t["n_rows"], t["n_null"], t["n_distinct"]) == (5, 2, 2)
    assert (t["min_str"], t["max_str"]) == ("a", "b")
    assert t["min_num"] is None and t["max_num"] is None
    s = rows["score"]
    assert (s["n_rows"], s["n_null"], s["n_distinct"]) == (5, 2, 2)
    assert (s["min_num"], s["max_num"]) == (1.5, 2.5)
    assert s["min_str"] is None
    i = rows["id"]
    assert (i["n_null"], i["n_distinct"], i["min_num"], i["max_num"]) == (0, 5, 1.0, 5.0)


def test_profile_single_scan(spark):
    """All metrics for all columns come from ONE aggregate over ONE scan —
    the physical plan must contain exactly one LocalTableScan/Scan source."""
    from spark_streaming_logservice_spark.operators.profile import profile_columns

    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS STRING) AS tag")
    plan = profile_columns(df, ["id", "tag"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_countmin_never_undercounts(spark):
    from pyspark.sql import functions as F

    from spark_streaming_logservice_spark.operators.sketch import (
        countmin_estimate,
        countmin_sketch,
    )

    # skewed key distribution: key k appears k times
    rows = [(k,) for k in range(1, 30) for _ in range(k)]
    df = spark.createDataFrame(rows, "k BIGINT")
    sk = countmin_sketch(df, F.col("k"), depth=3, width=16)  # tiny: collisions certain
    keys = df.distinct()
    est = {r["k"]: r["est_n"] for r in countmin_estimate(sk, keys, "k", depth=3, width=16).collect()}
    for k in range(1, 30):
        assert est[k] >= k, f"CM undercounted key {k}: {est[k]}"


def test_bloom_no_false_negatives(spark):
    """Every exact positive must also be bloom-positive (d14 invariant)."""
    from spark_streaming_logservice_spark import registry

    registry.load_all()
    df = registry.QUERIES["d14_bloom_decontamination"](spark, "/root/testdata/sf0.001")
    for r in df.collect():
        assert r["n_bloom_positive"] >= r["n_exact_positive"]
        # no false negatives => every exact positive is bloom-positive, so
        # the false positives are exactly the surplus
        assert r["n_false_positive"] == r["n_bloom_positive"] - r["n_exact_positive"]
