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


# --- c05: temporal (SCD-2) dimension join -----------------------------------
# The time-travel warehouse join c01's intervals exist FOR: each fact event
# enriched with the dimension version valid AT ITS OWN timestamp (not the
# current snapshot, not a fixed as-of cut). Spark-first shape: NO interval
# join and NO per-row subquery — dimension changes and facts interleave in
# ONE user-keyed window ordered by (ts, dim-first, id), and
# last_value(ignorenulls) carries the in-effect version onto every fact
# row (the j01/e09 as-of trick). One corpus shuffle, state bounded per
# task; ties at the same timestamp resolve dim-before-fact then by the
# unique event_id, so the join is deterministic. The report aggregates in
# integer cents so the hash is partition-order-stable.

@query(
    "c05_scd2_temporal_join",
    oracle="""
    WITH u AS (
      SELECT user_id, event_id, ts, value, 1 AS is_dim,
             CAST(NULL AS VARCHAR) AS fact_type
      FROM events WHERE event_type IN ('signup', 'purchase')
      UNION ALL
      SELECT user_id, event_id, ts, CAST(NULL AS DOUBLE), 0, event_type
      FROM events WHERE event_type IN ('click', 'error', 'view')
    ), carried AS (
      SELECT *,
             last_value(CASE WHEN is_dim = 1 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY ts, is_dim DESC, event_id
                     ROWS UNBOUNDED PRECEDING) AS dim_value
      FROM u
    )
    SELECT fact_type,
           (dim_value IS NOT NULL) AS dim_known,
           count(*) AS n_events,
           CAST(coalesce(sum(CAST(floor(dim_value * 100 + 0.5) AS BIGINT)), 0)
                AS BIGINT) AS dim_value_cents,
           CAST(sum(event_id) AS BIGINT) AS event_checksum
    FROM carried
    WHERE is_dim = 0
    GROUP BY fact_type, dim_known
    ORDER BY fact_type, dim_known
    """,
)
def c05_scd2_temporal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dim = e.where(F.col("event_type").isin(*_UPDATE_TYPES)).select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lit(1).alias("is_dim"),
        F.lit(None).cast("string").alias("fact_type"),
    )
    fact = e.where(F.col("event_type").isin("click", "error", "view")).select(
        "user_id",
        "event_id",
        "ts",
        F.lit(None).cast("double").alias("value"),
        F.lit(0).alias("is_dim"),
        F.col("event_type").alias("fact_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.desc("is_dim"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = dim.unionByName(fact).withColumn(
        "dim_value",
        F.last(
            F.when(F.col("is_dim") == 1, F.col("value")), ignorenulls=True
        ).over(w),
    )
    return (
        carried.where(F.col("is_dim") == 0)
        .groupBy(
            "fact_type", F.col("dim_value").isNotNull().alias("dim_known")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.coalesce(
                F.sum(F.floor(F.col("dim_value") * 100 + 0.5).cast("bigint")),
                F.lit(0),
            ).cast("bigint").alias("dim_value_cents"),
            F.sum("event_id").cast("bigint").alias("event_checksum"),
        )
        .orderBy("fact_type", "dim_known")
    )


# --- c06: changelog net-effect compaction ----------------------------------
# Debezium/Kafka-compacted-topic semantics: collapse the tail of a changelog
# into ONE net operation per key relative to the snapshot at a cut point —
# the operator an incremental view maintainer or compacted CDC sink runs
# per merge cycle. signup/purchase rows are upserts, error rows are
# deletes; the cut is the integer-µs midpoint of the stream (the c04
# bounds-agg trick, no driver round-trip). A key whose post-cut tail nets
# out (insert+delete) reports NOOP rather than vanishing, so the output is
# an audit of the compaction, not just its survivors.

@query(
    "c06_cdc_net_effect",
    oracle="""
    WITH cut AS (
      SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2)
               AS t0
      FROM events WHERE event_type IN ('signup', 'purchase', 'error')
    ), ch AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             cut.t0
      FROM events, cut
      WHERE event_type IN ('signup', 'purchase', 'error')
    ), ranked AS (
      SELECT user_id, op, value, ts, t0,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             last_value(CASE WHEN ts <= t0 THEN op END IGNORE NULLS)
               OVER wasc AS old_op,
             last_value(CASE WHEN ts <= t0 THEN value END IGNORE NULLS)
               OVER wasc AS old_raw,
             sum(CASE WHEN ts > t0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS n_tail_ops
      FROM ch
      WINDOW wasc AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id,
           CASE WHEN old_op = 'U' AND op = 'U' THEN 'UPDATE'
                WHEN old_op = 'U' THEN 'DELETE'
                WHEN op = 'U' THEN 'INSERT'
                ELSE 'NOOP' END AS net_op,
           CAST(n_tail_ops AS BIGINT) AS n_tail_ops,
           CASE WHEN old_op = 'U' THEN old_raw END AS old_value,
           CASE WHEN op = 'U' THEN value END AS new_value
    FROM ranked
    WHERE rn = 1 AND ts > t0
    ORDER BY user_id
    LIMIT 300
    """,
)
def c06_cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net effect of each key's post-cut changelog tail vs its pre-cut
    state: INSERT / UPDATE / DELETE / NOOP with before/after values.

    100 TB shape: ONE user-keyed shuffle carries both the pre-cut state
    (running last_value IGNORE NULLS over the ascending window — the
    c05/j01 carry-forward trick) and the tail's final row (row_number over
    the same partition, opposite order) — no self-join of the changelog,
    no second corpus pass, and the 1-row cut bounds-aggregate broadcasts.
    Values pass through untouched (no float aggregation), so the report is
    deterministic at any partitioning."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    ch = e.where(F.col("event_type").isin("signup", "purchase", "error"))
    bounds = ch.agg(
        F.expr(
            "timestampadd(MICROSECOND,"
            " timestampdiff(MICROSECOND, min(ts), max(ts)) div 2, min(ts))"
        ).alias("t0")
    )
    tagged = ch.join(F.broadcast(bounds)).select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "t0",
    )
    wdesc = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wasc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("user_id")
    pre = F.col("ts") <= F.col("t0")
    ranked = tagged.select(
        "user_id",
        "op",
        "value",
        "ts",
        "t0",
        F.row_number().over(wdesc).alias("rn"),
        F.last(F.when(pre, F.col("op")), ignorenulls=True)
        .over(wasc)
        .alias("old_op"),
        F.last(F.when(pre, F.col("value")), ignorenulls=True)
        .over(wasc)
        .alias("old_raw"),
        F.sum(F.when(~pre, 1).otherwise(0)).over(wall).alias("n_tail_ops"),
    )
    old_is_u = F.col("old_op") == "U"
    new_is_u = F.col("op") == "U"
    return (
        ranked.where((F.col("rn") == 1) & (F.col("ts") > F.col("t0")))
        .select(
            "user_id",
            F.when(old_is_u & new_is_u, "UPDATE")
            .when(old_is_u, "DELETE")
            .when(new_is_u, "INSERT")
            .otherwise("NOOP")
            .alias("net_op"),
            "n_tail_ops",
            F.when(old_is_u, F.col("old_raw")).alias("old_value"),
            F.when(new_is_u, F.col("value")).alias("new_value"),
        )
        .orderBy("user_id")
        .limit(300)
    )
