"""Change-data-capture / slowly-changing-dimension operators.

A training-data or analytics store ingests changelogs: per-key streams of
updates that must be collapsed into (a) the current snapshot ("upsert
latest wins") and (b) SCD-type-2 validity intervals for time-travel joins.
The reference engine leaves this to downstream consumers of its log
(UserGuide's Hive-sink recipes); here both shapes are first-class
DataFrame operators.

Spark-first shape: one window per key ordered by (event time, tiebreak id)
— a single hash-partition shuffle on the key, no self-join, no collect.
``lead(ts)`` closes each interval; the current row is the one with no
successor. At 100 TB the shuffle is keyed by user_id (high cardinality, no
hot keys in a changelog), and the window never materializes more than one
partition's rows per task — the same plan Spark uses for sessionization
(operators/log_queries.py l07).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

# Event types treated as attribute updates in the changelog interpretation
# of the events table (signup sets the initial value, purchase updates it).
_UPDATE_TYPES = ("signup", "purchase")


def scd2_intervals(changes: DataFrame, key: str, ts: str, tiebreak: str) -> DataFrame:
    """SCD-2: each change row becomes a validity interval
    ``[valid_from, valid_to)``; the open interval (``valid_to IS NULL``) is
    the current row. Deterministic under same-timestamp updates via the
    ``tiebreak`` column (a unique id)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
    nxt = F.lead(F.col(ts)).over(w)
    return changes.select(
        key,
        tiebreak,
        F.col(ts).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def upsert_latest(changes: DataFrame, key: str, ts: str, tiebreak: str) -> DataFrame:
    """Current snapshot: the last change per key wins (MERGE INTO ...
    WHEN MATCHED UPDATE collapsed over a whole changelog). One window +
    filter — at scale this beats ``groupBy(max_by)`` only when the full
    row must survive; Spark plans both as a single shuffle."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return (
        changes.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )


@query(
    "c01_scd2_intervals",
    oracle="""
    SELECT user_id, event_id, value,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type IN ('signup', 'purchase')
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def c01_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a changelog of a per-user attribute → SCD-2 intervals."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(*_UPDATE_TYPES)
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "c02_upsert_latest",
    oracle="""
    SELECT user_id, event_id, event_type, value, ts
    FROM (
      SELECT user_id, event_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE event_type IN ('signup', 'purchase')
    )
    WHERE rn = 1
    """,
)
def c02_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins snapshot of the same changelog (MERGE INTO semantics)."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(*_UPDATE_TYPES))
        .select("user_id", "event_id", "event_type", "value", "ts")
    )
    return upsert_latest(e, key="user_id", ts="ts", tiebreak="event_id")


def upsert_with_deletes(
    changes: DataFrame, key: str, ts: str, tiebreak: str, op: str = "op"
) -> DataFrame:
    """MERGE semantics with tombstones: latest change per key wins, and if
    that change is a delete ('D') the key vanishes from the snapshot.
    Same single keyed-window shuffle as upsert_latest — the delete filter
    is a post-window predicate, not a second pass."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    return (
        changes.withColumn("__rn__", F.row_number().over(w))
        .where((F.col("__rn__") == 1) & (F.col(op) != "D"))
        .drop("__rn__")
    )


@query(
    "c03_upsert_with_deletes",
    oracle="""
    SELECT user_id, event_id, value, ts
    FROM (
      SELECT user_id, event_id, value, ts,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE event_type IN ('signup', 'purchase', 'error')
    )
    WHERE rn = 1 AND op <> 'D'
    """,
)
def c03_upsert_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog with tombstones: errors are per-user deletes; a user whose
    LATEST change is a delete is absent from the snapshot (keys deleted
    then re-created survive — only the final state matters)."""
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("signup", "purchase", "error"))
        .select(
            "user_id",
            "event_id",
            "value",
            "ts",
            F.when(F.col("event_type") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
    )
    return upsert_with_deletes(e, key="user_id", ts="ts", tiebreak="event_id").select(
        "user_id", "event_id", "value", "ts"
    )


def snapshot_asof(
    changes: DataFrame, key: str, ts: str, tiebreak: str, asof
) -> DataFrame:
    """Time travel: the table state as of ``asof`` — the latest change per
    key at or before the cut. Semantically a filter + upsert_latest; the
    ts predicate is pushed below the keyed window shuffle, so history after
    the cut is pruned at the scan (at 100 TB, on a time-partitioned
    changelog, entire partitions drop before any shuffle)."""
    return upsert_latest(
        changes.where(F.col(ts) <= asof), key=key, ts=ts, tiebreak=tiebreak
    )


@query(
    "c04_snapshot_asof",
    oracle="""
    WITH cut AS (
      SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2)
               AS t0
      FROM events
    ), snap AS (
      SELECT user_id, event_id, event_type, value, ts
      FROM (
        SELECT e.*, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
        FROM events e, cut
        WHERE event_type IN ('signup', 'purchase') AND ts <= cut.t0
      )
      WHERE rn = 1
    )
    SELECT event_type,
           count(*) AS n_users,
           round(sum(value), 2) AS total_value,
           round(avg(value), 4) AS avg_value,
           min(user_id) AS min_user,
           max(user_id) AS max_user
    FROM snap
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def c04_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read at the midpoint of the changelog's time range,
    summarized per latest-state type. The cut timestamp is computed from a
    1-row bounds aggregate and broadcast-joined (no driver round-trip, no
    literal in the plan — the codegen cache keeps one compiled shape across
    sf_dirs). Both engines derive the cut by integer-µs midpoint so the
    boundary row set is identical."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    # unix_micros rejects NTZ; localtimestamp arithmetic keeps everything
    # NTZ-typed: midpoint = min + (max - min) / 2 at integer-µs precision,
    # identical to the oracle's epoch_us floor-div midpoint.
    bounds = e.agg(
        F.expr(
            "timestampadd(MICROSECOND,"
            " timestampdiff(MICROSECOND, min(ts), max(ts)) div 2, min(ts))"
        ).alias("t0")
    )
    changes = (
        e.where(F.col("event_type").isin(*_UPDATE_TYPES))
        .join(F.broadcast(bounds))
        .where(F.col("ts") <= F.col("t0"))
    )
    snap = upsert_latest(changes, key="user_id", ts="ts", tiebreak="event_id")
    return (
        snap.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
        )
        .orderBy("event_type")
    )
