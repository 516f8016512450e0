"""Log-model queries over the ``events`` stream table.

These reproduce the reference's data model and ingest-time operators
(SURVEY.md §1, §2.2) as batch queries over the events fixture:

- default 8-column schema packing (__value__ JSON) —
  SQL/LoghubSourceProvider.scala:264-274, SQL/LoghubSourceRDD.scala:154-176
- envelope-column synthesis (__shard__/__time__/__topic__/__source__) —
  SQL/LoghubSourceRDD.scala:196-219
- string→typed converter battery — SQL/Utils.scala:101-164
- event-time tumbling window aggregation —
  TEST/LoghubMicroBatchSourceSuite.scala:381-424
- wordcount (explode/split → groupBy → count) —
  EX/sql/streaming/StructuredLoghubWordCount.scala:77
- sessionization (stateful streaming analog, expressed with window
  functions batch-side)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table


# --- l01: event counts by type (wordcount shape: groupBy().count()) --------

@query(
    "l01_event_type_counts",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           round(sum(value), 2) AS total_value,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def l01_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type")
    )


# --- l02: tumbling event-time window agg -----------------------------------
# Batch analog of withWatermark + window(ts, '1 hour') — the streaming variant
# lives in streaming/queries.py and is tested in tests/test_streaming.py.

@query(
    "l02_tumbling_window_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def l02_tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# --- l03: top-k users by total value ---------------------------------------

@query(
    "l03_topk_users",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 10
    """,
)
def l03_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(10)
    )


# --- l04: JSON payload extraction (props column) ---------------------------
# The default schema packs contents into a JSON __value__; the inverse
# operation — extracting typed fields from a JSON payload — is the bread and
# butter of log queries.

@query(
    "l04_json_extract",
    oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def l04_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .orderBy("k_bucket")
    )


# --- l05: default 8-column schema packing (F2 fixture) ---------------------
# SQL/LoghubSourceProvider.scala:255-274: __logProject__, __logStore__,
# __shard__, __time__, __topic__, __source__, __value__, __sequence_number__
# — all strings; __value__ is the JSON-packed payload
# (SQL/LoghubSourceRDD.scala:154-176). Shard = hash-partition of the record;
# here derived deterministically as user_id % 4. All payload values are
# stringified before packing, matching "all wire values are strings".

@query(
    "l05_default_schema_pack",
    oracle="""
    SELECT '__logProject__' AS k_project, * FROM (
      SELECT
        'proj'                                   AS __logProject__,
        'events'                                 AS __logStore__,
        CAST(user_id % 4 AS VARCHAR)             AS __shard__,
        CAST(ts AS VARCHAR)                      AS __time__,
        event_type                               AS __topic__,
        'src-' || CAST(user_id AS VARCHAR)       AS __source__,
        '{"event_id":"' || CAST(event_id AS VARCHAR) ||
          '","value":"' || CAST(value AS VARCHAR) ||
          '","__tag__:k":"' || CAST(props->>'$.k' AS VARCHAR) || '"}'
                                                 AS __value__,
        CAST(CAST(floor(epoch(ts)) AS BIGINT) AS VARCHAR) || '-' || CAST(event_id AS VARCHAR)
                                                 AS __sequence_number__
      FROM events
      WHERE event_id < 100
    ) ORDER BY __sequence_number__
    """,
)
def l05_default_schema_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 100)
    packed = e.select(
        F.lit("proj").alias("__logProject__"),
        F.lit("events").alias("__logStore__"),
        (F.col("user_id") % 4).cast("string").alias("__shard__"),
        F.col("ts").cast("string").alias("__time__"),
        F.col("event_type").alias("__topic__"),
        F.concat(F.lit("src-"), F.col("user_id").cast("string")).alias("__source__"),
        F.to_json(
            F.struct(
                F.col("event_id").cast("string").alias("event_id"),
                F.col("value").cast("string").alias("value"),
                F.get_json_object("props", "$.k").alias("__tag__:k"),
            )
        ).alias("__value__"),
        F.concat(
            F.unix_timestamp(F.col("ts").cast("timestamp")).cast("string"),
            F.lit("-"),
            F.col("event_id").cast("string"),
        ).alias("__sequence_number__"),
    )
    return packed.select(F.lit("__logProject__").alias("k_project"), "*").orderBy(
        "__sequence_number__"
    )


# --- l06: converter battery (string→typed casts, SQL/Utils.scala:101-164) --
# All wire values are strings; the engine types them with native casts
# (Catalyst codegen) instead of per-value interpreted converters.

@query(
    "l06_converter_battery",
    oracle="""
    SELECT
      CAST(s_int AS INTEGER)                    AS c_int,
      CAST(s_long AS BIGINT)                    AS c_long,
      CAST(s_double AS DOUBLE)                  AS c_double,
      CAST(s_bool AS BOOLEAN)                   AS c_bool,
      CAST(replace(s_decimal, ',', '') AS DECIMAL(12,2)) AS c_decimal,
      CAST(s_ts AS TIMESTAMP)                   AS c_ts,
      CAST(CAST(s_date AS DATE) AS VARCHAR)     AS c_date_str,
      s_str                                     AS c_str
    FROM (
      SELECT
        CAST(event_id AS VARCHAR)           AS s_int,
        CAST(user_id  AS VARCHAR)           AS s_long,
        CAST(value    AS VARCHAR)           AS s_double,
        CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END AS s_bool,
        '1,234.56'                          AS s_decimal,
        '2026-01-02 03:04:05'               AS s_ts,
        '2026-01-02'                        AS s_date,
        event_type                          AS s_str
      FROM events WHERE event_id < 50
    )
    ORDER BY c_int
    """,
)
def l06_converter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 50)
    wire = e.select(
        F.col("event_id").cast("string").alias("s_int"),
        F.col("user_id").cast("string").alias("s_long"),
        F.col("value").cast("string").alias("s_double"),
        F.when(F.col("event_id") % 2 == 0, "true").otherwise("false").alias("s_bool"),
        F.lit("1,234.56").alias("s_decimal"),
        F.lit("2026-01-02 03:04:05").alias("s_ts"),
        F.lit("2026-01-02").alias("s_date"),
        F.col("event_type").alias("s_str"),
    )
    return wire.select(
        F.col("s_int").cast("int").alias("c_int"),
        F.col("s_long").cast("bigint").alias("c_long"),
        F.col("s_double").cast("double").alias("c_double"),
        F.col("s_bool").cast("boolean").alias("c_bool"),
        # Reference strips commas before Decimal(p,s): SQL/Utils.scala:126-130
        F.regexp_replace("s_decimal", ",", "").cast("decimal(12,2)").alias("c_decimal"),
        F.col("s_ts").cast("timestamp_ntz").alias("c_ts"),
        F.col("s_date").cast("date").cast("string").alias("c_date_str"),
        F.col("s_str").alias("c_str"),
    ).orderBy("c_int")


# --- l07: sessionization (30-min inactivity gap), gaps-and-islands ---------
# Batch analog of session_window / applyInPandasWithState; at scale this is
# one shuffle on user_id + a sort within partitions (window function).

@query(
    "l07_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def l07_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-precision gap (matches the oracle's interval comparison exactly);
    # session tz is UTC (set by load_table) so ntz→ltz is wall-clock-stable.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            # session_id is the running sum of the new-session marker, so
            # per user the ids are exactly 1..k — max == countDistinct,
            # without the Expand/two-phase distinct aggregate the latter
            # plans (guide §2.3: cheaper aggregate, same result; the first
            # row's marker is always 1, so max ≥ 1 whenever the group
            # exists)
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("user_id")
    )


# --- l08: typed projection + CAST on a selective filter --------------------
# Mirrors the reference's most-exercised pattern:
# spark.readStream...select($"msg".cast(IntegerType) + 1)
# (TEST/LoghubMicroBatchSourceSuite.scala:142-145).

@query(
    "l08_projection_cast",
    oracle="""
    SELECT event_id, CAST(CAST(value AS VARCHAR) AS DOUBLE) + 1 AS value_plus_one,
           upper(event_type) AS event_type_uc
    FROM events
    WHERE event_type = 'error' AND value > 150
    ORDER BY event_id
    """,
)
def l08_projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.where((F.col("event_type") == "error") & (F.col("value") > 150))
        .select(
            "event_id",
            (F.col("value").cast("string").cast("double") + 1).alias("value_plus_one"),
            F.upper("event_type").alias("event_type_uc"),
        )
        .orderBy("event_id")
    )


# --- l09: stream-stream self-join shape (batch analog) ---------------------
# TEST/LoghubMicroBatchSourceSuite.scala:426-459 joins a stream with itself
# on a derived key. Batch analog: self equi-join of events on a derived key,
# counting matched pairs per key.

@query(
    "l09_self_join_derived_key",
    oracle="""
    WITH keyed AS (
      SELECT event_id, user_id % 5 AS key, value FROM events WHERE event_id < 500
    )
    SELECT a.key AS key, count(*) AS n_pairs,
           round(sum(a.value + b.value), 2) AS pair_value
    FROM keyed a JOIN keyed b ON a.key = b.key
    GROUP BY a.key
    ORDER BY a.key
    """,
)
def l09_self_join_derived_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    keyed = e.select("event_id", (F.col("user_id") % 5).alias("key"), "value")
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, F.col("a.key") == F.col("b.key"))
        .groupBy(F.col("a.key").alias("key"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum(F.col("a.value") + F.col("b.value")), 2).alias("pair_value"),
        )
        .orderBy("key")
    )


# --- l10: wordcount over documents (explode + split) -----------------------
# EX/sql/streaming/StructuredLoghubWordCount.scala:77:
# flatMap(split(' ')) → groupBy(value) → count. JVM-side explode/split, no
# Python in the loop.

@query(
    "l11_session_window_native",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id < 5
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def l11_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-min inactivity gap) must agree with
    the SQL gaps-and-islands definition — the batch twin of the streaming
    session operator."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 5)
    return (
        e.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), F.col("user_id")
        )
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
    )


@query(
    "l12_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def l12_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event type — the sketch path
    for cardinality at 100 TB. HLL sketch values are engine-specific, so the
    estimate itself can't hash-match a DuckDB oracle; instead the query emits
    the exact cardinality (SQL-expressible) plus ``approx_ok`` — whether the
    HLL estimate landed within 5× its configured 1% rsd. A broken sketch path
    flips the flag and fails the driver's hash check."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_ok"),
        )
        .orderBy("event_type")
    )


@query(
    "l13_from_json_permissive",
    oracle="""
    WITH parsed AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0 THEN NULL
                  ELSE CAST(props->>'$.k' AS BIGINT) END AS k
      FROM events
    )
    SELECT count(*) AS n_total,
           count(k) AS n_parsed,
           CAST(sum(k) AS BIGINT) AS k_sum
    FROM parsed
    """,
)
def l13_from_json_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema in PERMISSIVE mode: corrupt payloads
    (simulated for every 97th record) parse to null instead of failing the
    job — the reference's dirty-data tolerance (P8,
    SQL/LoghubSourceRDD.scala:224-228) expressed natively."""
    e = load_table(spark, sf_dir, "events")
    corrupted = e.withColumn(
        "payload",
        F.when(F.col("event_id") % 97 == 0, F.lit("{corrupt")).otherwise(
            F.col("props")
        ),
    )
    parsed = corrupted.withColumn(
        "j", F.from_json("payload", "k BIGINT", {"mode": "PERMISSIVE"})
    ).withColumn("k", F.col("j.k"))
    return parsed.agg(
        F.count("*").alias("n_total"),
        F.count("k").alias("n_parsed"),
        F.sum("k").cast("bigint").alias("k_sum"),
    )


@query(
    "l10_wordcount",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def l10_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@query(
    "l14_hof_battery",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tok,
           CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                AS BIGINT) AS total_chars,
           CAST(list_max(list_transform(toks, x -> length(x))) AS BIGINT)
             AS max_len,
           array_to_string(list_sort(toks)[1:3], '|') AS first3
    FROM t
    ORDER BY doc_id
    LIMIT 200
    """,
)
def l14_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions end-to-end: filter → transform →
    aggregate → array_sort → slice, all JVM lambda expressions inside
    whole-stage codegen (the array never round-trips to Python). DuckDB's
    list_* family is the oracle."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    lens = F.transform(toks, lambda t: F.length(t))
    return (
        d.select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tok"),
            F.aggregate(lens, F.lit(0), lambda a, x: a + x)
            .cast("long")
            .alias("total_chars"),
            F.array_max(lens).cast("long").alias("max_len"),
            F.concat_ws("|", F.slice(F.array_sort(toks), 1, 3)).alias("first3"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


# --- l16: windowed heavy hitters -------------------------------------------
# Top-3 event types per hour — the standard "what's hot right now" log
# dashboard query. The rank filter compiles to WindowGroupLimit: each map
# task keeps a 3-row heap per (hour) group before the shuffle, so the
# window shuffle carries O(hours × k), not the per-type counts. The count
# agg underneath is the only corpus-sized shuffle.

@query(
    "l16_windowed_heavy_hitters",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), ranked AS (
      SELECT hour, event_type, n,
             row_number() OVER (PARTITION BY hour
                                ORDER BY n DESC, event_type) AS rk
      FROM hourly
    )
    SELECT hour, event_type, n, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY hour, rk
    """,
)
def l16_windowed_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # date_trunc on a TIMESTAMP_NTZ returns LTZ, and PySpark renders LTZ in
    # the PROCESS timezone at collect — cast back to NTZ (identity under the
    # loader's pinned UTC session) so results don't depend on the host TZ
    hourly = e.groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("hour").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        hourly.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .orderBy("hour", "rk")
    )


# --- l17: log template extraction -------------------------------------------
# Drain-lite log pattern mining: render each record as a log line, mask the
# variable fields (numbers — ids, counts, durations) to <NUM>, and count
# occurrences per surviving template. This is the workhorse behind log
# clustering / anomaly surfacing ("which message SHAPES dominate, and did a
# new shape appear?"). Whole pipeline is regexp_replace + one template-keyed
# aggregate: codegen-resident, and the agg key space is the (tiny) template
# set, so partial aggregation collapses the corpus map-side — the classic
# wordcount bound, same as l10.

@query(
    "l17_log_templates",
    oracle="""
    WITH lines AS (
      SELECT event_type || ' user=' || CAST(user_id AS VARCHAR) || ' ' || props
               AS msg,
             user_id
      FROM events
    ), templ AS (
      SELECT regexp_replace(msg, '[0-9]+(\\.[0-9]+)?', '<NUM>', 'g') AS template,
             user_id
      FROM lines
    )
    SELECT template,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users
    FROM templ
    GROUP BY template
    ORDER BY n_events DESC, template
    LIMIT 20
    """,
)
def l17_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 masked log templates with occurrence and distinct-user counts.

    Number masking covers decimals as one token (``12.5`` → ``<NUM>``, not
    ``<NUM>.<NUM>``) so engine-specific float→string formatting can never
    leak into the template text. Spark's regexp_replace replaces all
    matches by default; DuckDB needs the explicit 'g' flag — both sides
    use the same RE2-safe pattern."""
    e = load_table(spark, sf_dir, "events")
    msg = F.concat(
        F.col("event_type"),
        F.lit(" user="),
        F.col("user_id").cast("string"),
        F.lit(" "),
        F.col("props"),
    )
    template = F.regexp_replace(msg, r"[0-9]+(\.[0-9]+)?", "<NUM>")
    return (
        e.select(template.alias("template"), "user_id")
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_events"), F.asc("template"))
        .limit(20)
    )


# --- l18: error-burst detection (gaps and islands) ---------------------------
# Alerting-grade burst detection: maximal runs of CONSECUTIVE error-bearing
# minutes, reported with span and magnitude when the run is long enough.
# The classic gaps-and-islands rewrite: island id = minute index minus the
# row_number over the error minutes — constant within a consecutive run.
#
# 100 TB: the corpus shuffle is the minute rollup (same bound as e07's base
# aggregate); islands are computed over the error-minute AGGREGATE with the
# window partitioned BY DAY (bursts are defined within a day), so there is
# no partition-less window and no single task ever sees more than one day
# of minutes. Minute indexes use integer epoch arithmetic — identical in
# both engines.

BURST_MIN_MINUTES = 3


@query(
    "l18_error_bursts",
    oracle=f"""
    WITH em AS (
      SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) // 60
               AS minute_idx,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n_errors
      FROM events WHERE event_type = 'error'
      GROUP BY 1, 2
    ), isl AS (
      SELECT day, minute_idx, n_errors,
             minute_idx - row_number() OVER (PARTITION BY day
                                             ORDER BY minute_idx) AS island
      FROM em
    )
    SELECT day,
           CAST(min(minute_idx) AS BIGINT) AS start_minute,
           CAST(count(*) AS BIGINT) AS run_minutes,
           CAST(sum(n_errors) AS BIGINT) AS total_errors
    FROM isl
    GROUP BY day, island
    HAVING count(*) >= {BURST_MIN_MINUTES}
    ORDER BY day, start_minute
    """,
)
def l18_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    em = (
        e.where(F.col("event_type") == "error")
        .groupBy(
            (
                F.unix_timestamp(
                    F.date_trunc("minute", "ts").cast("timestamp")
                )
                / 60
            )
            .cast("bigint")
            .alias("minute_idx"),
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n_errors"))
    )
    w = Window.partitionBy("day").orderBy("minute_idx")
    isl = em.withColumn(
        "island", F.col("minute_idx") - F.row_number().over(w)
    )
    return (
        isl.groupBy("day", "island")
        .agg(
            F.min("minute_idx").alias("start_minute"),
            F.count(F.lit(1)).alias("run_minutes"),
            F.sum("n_errors").alias("total_errors"),
        )
        .where(F.col("run_minutes") >= BURST_MIN_MINUTES)
        .drop("island")
        .orderBy("day", "start_minute")
    )


# --- l20: hopping (sliding) event-time window agg ---------------------------
# The overlapping-window sibling of l02: duration 2h, slide 1h, so every
# event lands in exactly TWO windows. Spark's window() emits the overlap
# row-locally (an Expand of the covering window set — no self-join, no
# re-scan); the oracle unnests the same two covering starts per event.
# Scale shape: the Expand doubles rows BEFORE one (window, type)-keyed
# aggregate with map-side partials — same wordcount bound as l02, 2x the
# shuffle rows, which is the honest cost of overlap semantics.

@query(
    "l20_hopping_window",
    oracle="""
    SELECT ws AS window_start, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                     date_trunc('hour', ts)]) AS ws,
             event_type, value
      FROM events
    )
    GROUP BY ws, event_type
    ORDER BY ws, event_type
    """,
)
def l20_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# --- l21: top event trigram paths (user-journey mining) ---------------------
# e04 counts 2-step transitions; l21 mines 3-step paths — one user-keyed
# window (single shuffle) with two leads, then a path-keyed wordcount agg.
# At 100 TB: the window never holds more than one user's events per task;
# the path vocabulary is |types|³ (tiny), so the count agg collapses
# map-side.

@query(
    "l21_event_trigram_paths",
    oracle="""
    SELECT t1, t2, t3, count(*) AS n
    FROM (
      SELECT event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n DESC, t1, t2, t3
    LIMIT 10
    """,
)
def l21_event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        paths.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(10)
    )


# --- l22: equi-depth histogram (distributed quantile binning) ---------------
# Feature binning for ML pipelines: 10 equal-count buckets over the value
# distribution. NOT a global ntile window (a partition-less WindowExec is
# the v04-class scale-killer); rank comes from the two-pass range-partition
# `distributed_row_number` (O(partitions) driver array + broadcast offsets),
# bucket = floor(rank*10 / n) is then row-local, and per-bucket stats are
# one wordcount-bound aggregate. The (value, event_id) sort key is unique,
# which both engines need for identical bucket boundaries at ties.

@query(
    "l22_equidepth_histogram",
    oracle="""
    WITH ranked AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) - 1 AS rk,
             count(*) OVER () AS n
      FROM events
    )
    SELECT CAST(rk * 10 // n AS INTEGER) AS bucket,
           count(*) AS n_rows,
           round(min(value), 4) AS lo,
           round(max(value), 4) AS hi,
           round(sum(value), 2) AS total
    FROM ranked
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def l22_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        distributed_row_number,
    )

    e = load_table(spark, sf_dir, "events").select("event_id", "value")
    ranked = distributed_row_number(e, ["value", "event_id"], out="rn")
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.floor((F.col("rn") - 1) * 10 / F.col("n")).cast("int").alias("bucket"),
            "value",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .orderBy("bucket")
    )


# --- l23: time-series gap fill + forward fill -------------------------------
# Observability dashboards need dense series: every (event_type, hour) slot
# between that type's first and last activity, with empty hours filled by
# the last observed value (LOCF). Spark-first: ONE corpus-sized rollup to
# the hourly grain, then the grid is generated from the O(types) span
# relation via sequence() explode — grid size is types × hours, independent
# of corpus row count, so at 100 TB the fill stage costs the same as at
# sf0.01. The LOCF window partitions by event_type (bounded rows per task;
# never the v04-class partition-less WindowExec).
#
# The carried value goes through EXACT integer arithmetic end-to-end:
# per-row micro-units floor(value·10⁶ + ½), a BIGINT sum (associative —
# double sums depend on partition merge order, and at sf0.1 three hourly
# means landed on round(4) boundaries where the last ulp flipped the
# digit), and the 4-dp rounding itself as an integer division
# (m + 50n) // (100n): engines also disagree on rounding EXACT .5 doubles
# (Spark rounds the decimal string, DuckDB the binary value), so the round
# must never see one.

@query(
    "l23_hourly_gap_fill",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             count(*) AS n_events,
             CAST((sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                   + 50 * count(*)) // (100 * count(*)) AS DOUBLE)
               / 10000.0 AS avg_value
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ), grid AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM span
    )
    SELECT g.event_type, g.h,
           coalesce(hr.n_events, 0) AS n_events,
           (hr.n_events IS NULL) AS is_gap,
           last_value(hr.avg_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled_value
    FROM grid g LEFT JOIN hourly hr
      ON hr.event_type = g.event_type AND hr.h = g.h
    ORDER BY g.event_type, g.h
    """,
)
def l23_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    micro = F.floor(F.col("value") * 1000000 + 0.5).cast("bigint")
    n = F.count(F.lit(1))
    hourly = e.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("h"),
    ).agg(
        n.alias("n_events"),
        (
            F.expr(
                "(sum(cast(floor(value * 1000000 + 0.5) as bigint))"
                " + 50 * count(1)) div (100 * count(1))"
            ).cast("double")
            / 10000.0
        ).alias("avg_value"),
    )
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.col("n_events").isNull().alias("is_gap"),
            F.last("avg_value", ignorenulls=True)
            .over(w)
            .alias("filled_value"),
        )
        .orderBy("event_type", "h")
    )


# --- l24: dynamic-gap session windows ---------------------------------------
# Spark 4's session_window accepts a PER-EVENT gap expression (a purchase
# holds the session open for 60 min, anything else 30) — the
# engagement-aware sessionization the fixed-gap l11 can't express. Native
# semantics: each event contributes [ts, ts+gap); overlapping intervals
# merge. The oracle states the same thing as interval merging: a session
# breaks when ts exceeds the running max of previous interval ends (the
# running max matters — with variable gaps an EARLIER event can hold the
# session open longer than the latest one; lag(ts) alone is wrong).
# Same 100 TB shape as l11: one user-keyed shuffle, state bounded per key.

@query(
    "l24_dynamic_session_window",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN INTERVAL 60 MINUTE
                  ELSE INTERVAL 30 MINUTE END AS gap
      FROM events WHERE user_id < 5
    ), m AS (
      SELECT user_id, ts,
             max(ts + gap) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS max_prev_end
      FROM ev
    ), flagged AS (
      SELECT user_id, ts,
             CASE WHEN max_prev_end IS NULL OR ts > max_prev_end
                  THEN 1 ELSE 0 END AS new_session
      FROM m
    ), sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def l24_dynamic_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native dynamic-gap session_window pinned against the SQL
    interval-merge definition."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 5)
    gap = F.when(F.col("event_type") == "purchase", F.lit("60 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        e.groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
        .orderBy("user_id", "session_start")
    )


# --- l27: day-over-day template-mix drift ----------------------------------
# The "did the shape of our logs change overnight" monitor: each day's
# masked-template mix (l17 templates) as exact 4-dp integer shares,
# L1-compared to the previous day's mix. New and vanished templates
# contribute their full share, so a deploy that swaps one template for
# another moves the metric even when volume is flat.

@query(
    "l27_template_drift",
    oracle="""
    WITH templ AS (
      SELECT CAST(ts AS DATE) AS day,
             regexp_replace(event_type || ' user=' || CAST(user_id AS VARCHAR)
                              || ' ' || props,
                            '[0-9]+(\\.[0-9]+)?', '<NUM>', 'g') AS template
      FROM events
    ), cnt AS (
      SELECT day, template, count(*) AS n FROM templ GROUP BY 1, 2
    ), tot AS (
      SELECT day, sum(n) AS tot FROM cnt GROUP BY 1
    ), shares AS (
      SELECT c.day, c.template,
             (20000 * c.n + t.tot) // (2 * t.tot) AS s
      FROM cnt c JOIN tot t USING (day)
    ), contrib AS (
      SELECT day, template, s AS s_cur, 0 AS s_prev, 1 AS pc FROM shares
      UNION ALL
      SELECT day + 1 AS day, template, 0 AS s_cur, s AS s_prev, 0 AS pc
      FROM shares
    ), diffs AS (
      SELECT day, template, sum(s_cur) AS sc, sum(s_prev) AS sp,
             sum(pc) AS pcs
      FROM contrib GROUP BY 1, 2
    ), drift AS (
      SELECT day,
             sum(pcs) AS n_templates,
             CAST(sum(abs(sc - sp)) AS DOUBLE) / 10000.0 AS l1_drift
      FROM diffs GROUP BY 1
    ), days AS (
      SELECT DISTINCT day FROM cnt
    )
    SELECT d.day, CAST(d.n_templates AS BIGINT) AS n_templates, d.l1_drift
    FROM drift d
      JOIN days today ON today.day = d.day
      JOIN days prev ON prev.day + 1 = d.day
    ORDER BY d.day
    """,
)
def l27_template_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day L1 drift of the masked-template share mix vs the previous
    day (exact: shares are integer half-up 1e-4 units, the L1 sum is an
    integer before the single final division). First day is excluded (no
    previous mix); a day's row also requires the previous day to have data.

    100 TB shape: template counting is the l17 wordcount bound (map-side
    combine to O(days x templates) rows); everything after — shares,
    the +1-day share union, diffs, drift — runs on that tiny relation.
    The union-of-contributions trick replaces a full-outer self-join so
    appear/disappear cases need no null handling, and no window function
    is used at all. ``n_templates`` is the count of templates SEEN that
    day (a presence indicator carried through the union), independent of
    whether their 1e-4-unit rounded share is nonzero — a template rarer
    than ~1/20000 of a day's volume still counts."""
    e = load_table(spark, sf_dir, "events")
    msg = F.concat(
        F.col("event_type"),
        F.lit(" user="),
        F.col("user_id").cast("string"),
        F.lit(" "),
        F.col("props"),
    )
    template = F.regexp_replace(msg, r"[0-9]+(\.[0-9]+)?", "<NUM>")
    cnt = (
        e.select(F.to_date("ts").alias("day"), template.alias("template"))
        .groupBy("day", "template")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("day").agg(F.sum("n").alias("tot"))
    shares = cnt.join(tot, "day").select(
        "day",
        "template",
        F.expr("(20000 * n + tot) DIV (2 * tot)").alias("s"),
    )
    cur = shares.select(
        "day",
        "template",
        F.col("s").alias("s_cur"),
        F.lit(0).cast("bigint").alias("s_prev"),
        F.lit(1).cast("bigint").alias("pc"),
    )
    prv = shares.select(
        F.date_add("day", 1).alias("day"),
        "template",
        F.lit(0).cast("bigint").alias("s_cur"),
        F.col("s").alias("s_prev"),
        F.lit(0).cast("bigint").alias("pc"),
    )
    diffs = (
        cur.unionByName(prv)
        .groupBy("day", "template")
        .agg(
            F.sum("s_cur").alias("sc"),
            F.sum("s_prev").alias("sp"),
            F.sum("pc").alias("pcs"),
        )
    )
    drift = diffs.groupBy("day").agg(
        F.sum("pcs").alias("n_templates"),
        (F.sum(F.abs(F.col("sc") - F.col("sp"))).cast("double") / 10000.0).alias(
            "l1_drift"
        ),
    )
    days = cnt.select("day").distinct()
    prev_ok = days.select(F.date_add("day", 1).alias("day"))
    return (
        drift.join(days, "day").join(prev_ok, "day").orderBy("day")
    )


# --- l28: shard-balance / routing-skew report --------------------------------
# The sink routes rows to shards by an md5 key hash (sources/logstore.py
# _route, mirroring the reference's writer.scala:24-40); this is the
# capacity-planning report that checks the routing is actually balanced:
# per-shard ingest counts, 4-dp load share, and the exact-integer Gini
# coefficient of the shard distribution stamped on every row (Gini ~ 0 =>
# balanced; a hot key space shows up here before it shows up as a straggler
# executor). Same md5 hash family as the sink (60-bit prefix), replayed
# bit-identically in DuckDB.
#
# 100 TB shape: ONE key-hashed count with map-side combine is the only
# corpus-sized stage; everything after (rank window, Gini aggregate,
# share division) runs on O(shards)=16 rows, and the 1-row Gini aggregate
# broadcasts back. Gini numerator/denominator are exact bigints; the 4-dp
# values use integer half-up division — deterministic at any partitioning.

L28_SHARDS = 16


def _register_l28() -> None:
    from spark_streaming_logservice_spark.operators.sketch import _hash60

    oracle = f"""
    WITH s AS (
      SELECT ('0x' || substr(md5('shard:' || CAST(user_id AS VARCHAR)), 1, 15))
               ::BIGINT % {L28_SHARDS} AS shard
      FROM events
    ), c0 AS (
      SELECT shard, count(*) AS n_rows FROM s GROUP BY shard
    ), c AS (
      -- scaffold EVERY shard slot: an empty shard is maximal imbalance
      -- evidence, not a missing row (one hot shard must read gini -> 1,
      -- which requires the 15 zero rows to be present)
      SELECT g.shard, coalesce(c0.n_rows, 0) AS n_rows
      FROM (SELECT unnest(range({L28_SHARDS})) AS shard) g
        LEFT JOIN c0 ON c0.shard = g.shard
    ), r AS (
      SELECT shard, n_rows,
             row_number() OVER (ORDER BY n_rows, shard) AS rk
      FROM c
    ), t AS (
      SELECT CAST(sum(n_rows) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_sh
      FROM c
    ), g AS (
      SELECT CAST((20000 * (2 * sum(rk * n_rows)
                            - (count(*) + 1) * sum(n_rows))
                   + count(*) * sum(n_rows))
                  // (2 * count(*) * sum(n_rows)) AS DOUBLE) / 10000.0
               AS gini
      FROM r
    )
    SELECT r.shard, r.n_rows,
           CAST((20000 * r.n_rows + t.total) // (2 * t.total) AS DOUBLE)
             / 10000.0 AS share,
           g.gini
    FROM r CROSS JOIN g CROSS JOIN t
    ORDER BY r.shard
    """

    @query("l28_shard_balance", oracle=oracle)
    def l28_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events").select(
            (_hash60("shard:", F.col("user_id")) % L28_SHARDS).alias("shard")
        )
        c0 = ev.groupBy("shard").agg(F.count(F.lit(1)).alias("n_rows"))
        # scaffold every shard slot: an empty shard is maximal-imbalance
        # evidence (one hot shard must read gini -> 1, which needs the
        # zero rows present), and the scaffold is O(L28_SHARDS) rows
        scaffold = spark.range(L28_SHARDS).select(
            F.col("id").cast("bigint").alias("shard")
        )
        c = (
            scaffold.join(c0, "shard", "left")
            .na.fill({"n_rows": 0})
            .select("shard", F.col("n_rows").cast("bigint").alias("n_rows"))
        )
        # bounded global window: exactly L28_SHARDS rows by construction
        r = c.withColumn(
            "rk", F.row_number().over(Window.orderBy("n_rows", "shard"))
        )
        g = r.agg(
            (
                F.expr(
                    "(20000 * (2 * sum(rk * n_rows)"
                    " - (count(*) + 1) * sum(n_rows))"
                    " + count(*) * sum(n_rows))"
                    " DIV (2 * count(*) * sum(n_rows))"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("gini")
        )
        t = c.agg(F.sum("n_rows").cast("bigint").alias("total"))
        return (
            r.crossJoin(F.broadcast(g))
            .crossJoin(F.broadcast(t))
            .select(
                "shard",
                "n_rows",
                (
                    F.expr("(20000 * n_rows + total) DIV (2 * total)").cast(
                        "double"
                    )
                    / F.lit(10000.0)
                ).alias("share"),
                "gini",
            )
            .orderBy("shard")
        )


_register_l28()


# --- l29: error incidents (gaps-and-islands over the minute rollup) ---------
# l18 finds bursty MINUTES; operators teams page on INCIDENTS — maximal
# runs of consecutive error minutes merged into one row with start/end/
# duration/volume. This is the classic gaps-and-islands pattern, keyed by
# event_type: a minute starts a new island when it is not exactly one
# minute after its predecessor, and the island id is the running count of
# starts — one lag + one cumulative sum over the SAME type-keyed window.
#
# 100 TB shape: the corpus collapses to the (type, minute) rollup first
# (map-side combine), so the windows run over O(types × minutes-in-
# retention) rows — bounded by the calendar, not the event volume — and
# each type's series is an independent partition (the e13 bounded-window
# argument, but keyed). All outputs are integers/timestamps; no floats
# anywhere.

def _register_l29() -> None:
    oracle = """
    WITH m AS (
      SELECT event_type, date_trunc('minute', ts) AS minute,
             count(*) AS n_errors
      FROM events WHERE event_type = 'error'
      GROUP BY 1, 2
    ), flagged AS (
      SELECT event_type, minute, n_errors,
             CASE WHEN lag(minute) OVER w IS NULL
                    OR minute > lag(minute) OVER w + INTERVAL 1 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM m WINDOW w AS (PARTITION BY event_type ORDER BY minute)
    ), islands AS (
      SELECT event_type, minute, n_errors,
             sum(is_start) OVER (PARTITION BY event_type ORDER BY minute
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged
    )
    SELECT event_type,
           CAST(min(minute) AS TIMESTAMP) AS incident_start,
           CAST(max(minute) AS TIMESTAMP) AS incident_end,
           CAST(count(*) AS BIGINT) AS n_minutes,
           CAST(sum(n_errors) AS BIGINT) AS n_errors
    FROM islands
    GROUP BY event_type, island
    ORDER BY event_type, incident_start
    """

    @query("l29_error_incidents", oracle=oracle)
    def l29_error_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = load_table(spark, sf_dir, "events")
        m = (
            e.where(F.col("event_type") == "error")
            .groupBy(
                "event_type",
                F.date_trunc("minute", "ts")
                .cast("timestamp_ntz")
                .alias("minute"),
            )
            .agg(F.count(F.lit(1)).alias("n_errors"))
        )
        w = Window.partitionBy("event_type").orderBy("minute")
        flagged = m.withColumn(
            "is_start",
            F.when(
                F.lag("minute").over(w).isNull()
                | (
                    F.col("minute")
                    > F.lag("minute").over(w) + F.expr("INTERVAL 1 MINUTE")
                ),
                1,
            ).otherwise(0),
        )
        islands = flagged.withColumn(
            "island",
            F.sum("is_start").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        return (
            islands.groupBy("event_type", "island")
            .agg(
                F.min("minute").alias("incident_start"),
                F.max("minute").alias("incident_end"),
                F.count(F.lit(1)).alias("n_minutes"),
                F.sum("n_errors").alias("n_errors"),
            )
            .drop("island")
            .orderBy("event_type", "incident_start")
        )


_register_l29()


# --- l30: hour-of-week volume forecast + backtest ----------------------------
# Capacity planning for the log platform: predict each test day's volume
# with the seasonal-naive hour-of-week estimator (the mean of the SAME
# weekday+hour over the 3 preceding weeks), then report the backtest
# absolute-percentage error per day. No dow() functions anywhere — the
# weekday alignment is pure date arithmetic (day-7/-14/-21 contribute to
# day's forecast), which sidesteps the Spark-vs-DuckDB weekday-numbering
# mismatch entirely, and the contribution union replaces three self-joins
# (the l27 trick). The test window is the LAST 7 days of data (derived,
# not hardcoded — a regenerated fixture with shifted dates must not
# silently empty the backtest).
#
# 100 TB shape: ONE (day, hour) corpus aggregate with map-side combine
# (O(days x 24) rows out); the shift-union, DIV-3 estimator, daily sums
# and APE all run on that tiny relation. APE is integer half-up 4-dp.

@query(
    "l30_volume_forecast",
    oracle="""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, CAST(extract(hour FROM ts) AS BIGINT) AS hr,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), mx AS (
      SELECT max(day) AS md FROM c
    ), contrib AS (
      SELECT day + 7 AS day, hr, n FROM c
      UNION ALL SELECT day + 14 AS day, hr, n FROM c
      UNION ALL SELECT day + 21 AS day, hr, n FROM c
    ), pred AS (
      SELECT day, hr, sum(n) // 3 AS p
      FROM contrib GROUP BY 1, 2
    ), test_days AS (
      SELECT day, sum(n) AS n_actual FROM c CROSS JOIN mx
      WHERE day > md - 7
      GROUP BY day
    ), pred_days AS (
      SELECT day, sum(p) AS n_pred FROM pred CROSS JOIN mx
      WHERE day > md - 7 AND day <= md
      GROUP BY day
    )
    SELECT t.day, CAST(t.n_actual AS BIGINT) AS n_actual,
           CAST(coalesce(p.n_pred, 0) AS BIGINT) AS n_pred,
           CAST((20000 * abs(t.n_actual - coalesce(p.n_pred, 0)) + t.n_actual)
                // (2 * t.n_actual) AS DOUBLE) / 10000.0 AS ape
    FROM test_days t LEFT JOIN pred_days p USING (day)
    ORDER BY t.day
    """,
)
def l30_volume_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = (
        e.groupBy(
            F.to_date("ts").alias("day"),
            F.hour("ts").cast("bigint").alias("hr"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    mx = c.agg(F.max("day").alias("md"))
    contrib = None
    for k in (7, 14, 21):
        part = c.select(F.date_add("day", k).alias("day"), "hr", "n")
        contrib = part if contrib is None else contrib.unionByName(part)
    pred = contrib.groupBy("day", "hr").agg(
        F.expr("sum(n) DIV 3").alias("p")
    )
    test_days = (
        c.join(F.broadcast(mx), how="cross")
        .where(F.col("day") > F.date_sub("md", 7))
        .groupBy("day")
        .agg(F.sum("n").alias("n_actual"))
    )
    pred_days = (
        pred.join(F.broadcast(mx), how="cross")
        .where(
            (F.col("day") > F.date_sub("md", 7)) & (F.col("day") <= F.col("md"))
        )
        .groupBy("day")
        .agg(F.sum("p").alias("n_pred"))
    )
    ape = F.expr(
        "(20000 * abs(n_actual - n_pred) + n_actual) DIV (2 * n_actual)"
    ).cast("double") / F.lit(10000.0)
    return (
        test_days.join(pred_days, "day", "left")
        .na.fill({"n_pred": 0})
        .select(
            "day",
            F.col("n_actual").cast("bigint").alias("n_actual"),
            F.col("n_pred").cast("bigint").alias("n_pred"),
            ape.alias("ape"),
        )
        .orderBy("day")
    )
