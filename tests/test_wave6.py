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


def test_upsert_with_deletes_semantics(spark):
    from spark_streaming_logservice_spark.operators.cdc import upsert_with_deletes

    rows = [
        # key 1: update then delete -> absent
        (1, 1, 10.0, 1, "U"), (1, 2, 11.0, 2, "D"),
        # key 2: delete then re-create -> present with final value
        (2, 3, 20.0, 1, "D"), (2, 4, 21.0, 2, "U"),
        # key 3: same-ts tie -> higher tiebreak wins (here a delete)
        (3, 5, 30.0, 5, "U"), (3, 6, 31.0, 5, "D"),
        # key 4: plain latest-wins
        (4, 7, 40.0, 1, "U"), (4, 8, 41.0, 9, "U"),
    ]
    df = spark.createDataFrame(
        rows, "k BIGINT, id BIGINT, v DOUBLE, ts BIGINT, op STRING"
    )
    got = {
        (r["k"], r["v"])
        for r in upsert_with_deletes(df, key="k", ts="ts", tiebreak="id").collect()
    }
    assert got == {(2, 21.0), (4, 41.0)}


def test_bpe_merge_transform_semantics(spark):
    from spark_streaming_logservice_spark.operators.vocab import apply_bpe_merge

    rows = [
        (1, ["x", "y", "x", "y"]),      # back-to-back occurrences both merge
        (2, ["x", "y", "y", "x"]),      # only the leading pair
        (3, ["a", "x", "y", "b"]),      # interior occurrence
        (4, ["x"]),                      # single token untouched
        (5, ["y", "x"]),                 # reversed order: no merge
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, a ARRAY<STRING>")
    got = {r["doc_id"]: r["a"] for r in apply_bpe_merge(df, "x", "y").collect()}
    assert got[1] == ["x_y", "x_y"]
    assert got[2] == ["x_y", "y", "x"]
    assert got[3] == ["a", "x_y", "b"]
    assert got[4] == ["x"]
    assert got[5] == ["y", "x"]


def test_audio_silence_run_edges(spark):
    """All-silent, no-silent, and boundary-touching runs."""
    from spark_streaming_logservice_spark.functions import media

    rows = [
        (1, media.make_wav(20, fill=lambda i: 0)),            # all silent
        (2, media.make_wav(20, fill=lambda i: 500)),          # none silent
        (3, media.make_wav(6, fill=lambda i: [0, 0, 500, 0, 500, 0][i])),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, blob BINARY")
    got = {
        r["doc_id"]: (r["n_samples"], r["n_silent"], r["n_runs"], r["longest_run"])
        for r in media.decode_audio_silence(df, threshold=50).collect()
    }
    assert got[1] == (20, 20, 1, 20)
    assert got[2] == (20, 0, 0, 0)
    assert got[3] == (6, 4, 3, 2)  # runs [0,1], [3], [5]
