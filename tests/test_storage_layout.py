"""Storage-layout scale proofs: bucketed tables make co-located joins
shuffle-free; partitioned layouts prune at the directory level. These are
the techniques that keep the 100 TB fact-fact joins and time-range scans
viable (SURVEY.md §4.2, session.py design notes)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_streaming_logservice_spark.plans import inspect as pi
from spark_streaming_logservice_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    # the in-memory catalog forgets tables across sessions but their files
    # survive in spark-warehouse/ — clear orphaned locations
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_b", "o_b"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("li_b")
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("o_b")
    yield "li_b", "o_b"


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    li, o = bucketed
    plain_l = spark.table(li)
    plain_o = spark.table(o)
    joined = plain_l.join(plain_o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    # both sides bucketed on the join key with equal bucket counts:
    # no Exchange may appear in the plan
    assert pi.exchange_count(joined) == 0, pi.formatted_plan(joined)[:1500]
    assert joined.count() > 0


def test_unbucketed_join_shuffles_for_contrast(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    # disable broadcast so the contrast isolates bucketing, not size
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "o_totalprice"
        )
        assert pi.exchange_count(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    e.write.partitionBy("day").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).where(F.col("day") == "2024-01-02")
    assert pi.partition_filters(back), "day filter must prune partitions"
    n = back.count()
    expected = e.where(F.col("day") == "2024-01-02").count()
    assert n == expected > 0


def test_dynamic_partition_overwrite_backfill(spark, sf_dir, tmp_path):
    """Backfill correctness: re-computing ONE day of a day-partitioned table
    with partitionOverwriteMode=dynamic must replace exactly that partition
    — other days' rows survive untouched — and a day-filtered read after
    the backfill still prunes to one partition directory. This is the
    maintenance pattern for fixing a bad day at 100 TB without rewriting
    the table."""
    from spark_streaming_logservice_spark.plans import inspect as pi

    out = str(tmp_path / "events_by_day")
    e = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    e.write.partitionBy("day").mode("overwrite").parquet(out)

    days = [r["day"] for r in e.select("day").distinct().orderBy("day").collect()]
    target, other = days[0], days[1]
    before_other = (
        spark.read.parquet(out).where(F.col("day") == other).count()
    )

    # backfill: day-0 recomputed with a corrected value column
    fixed = e.where(F.col("day") == F.lit(target)).withColumn(
        "value", F.col("value") * 0.0
    )
    fixed.write.partitionBy("day").mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(out)

    after = spark.read.parquet(out)
    assert after.where(F.col("day") == other).count() == before_other, (
        "untouched partitions must survive a dynamic overwrite"
    )
    assert (
        after.where(F.col("day") == F.lit(target))
        .agg(F.sum(F.abs(F.col("value"))))
        .first()[0]
        == 0.0
    ), "backfilled partition must carry the recomputed rows"

    pruned = after.where(F.col("day") == F.lit(target)).select("event_id")
    filters = pi.partition_filters(pruned)
    assert filters and any("day" in f for f in filters), (
        f"day filter must prune partitions, got {filters}"
    )
