"""Second wave of event-analytics queries: funnels, daily error rates,
distinct users, event-sequence analysis — typical production log queries
over the stream table, expressed declaratively."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table


# --- e01: signup→purchase funnel -------------------------------------------

@query(
    "e01_signup_purchase_funnel",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'signup')   AS first_signup,
             min(ts) FILTER (WHERE event_type = 'purchase') AS first_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) FILTER (WHERE first_signup IS NOT NULL) AS n_signed_up,
           count(*) FILTER (WHERE first_signup IS NOT NULL
                              AND first_purchase > first_signup) AS n_converted
    FROM firsts
    """,
)
def e01_signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return firsts.agg(
        F.count(F.when(F.col("first_signup").isNotNull(), 1)).alias("n_signed_up"),
        F.count(
            F.when(
                F.col("first_signup").isNotNull()
                & (F.col("first_purchase") > F.col("first_signup")),
                1,
            )
        ).alias("n_converted"),
    )


# --- e02: daily error rate -------------------------------------------------

@query(
    "e02_daily_error_rate",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'error') AS n_errors,
           round(CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE)
                 / count(*), 4) AS error_rate
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def e02_daily_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    errors = F.count(F.when(F.col("event_type") == "error", 1))
    return (
        e.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            errors.alias("n_errors"),
            F.round(errors.cast("double") / F.count("*"), 4).alias("error_rate"),
        )
        .orderBy("day")
    )


# --- e03: distinct users per type + value percentiles ----------------------

@query(
    "e03_type_user_stats",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value,
           round(median(value), 2) AS median_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def e03_type_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.expr("median(value)"), 2).alias("median_value"),
        )
        .orderBy("event_type")
    )


# --- e04: per-user event-sequence bigrams (next-event transition counts) ---

@query(
    "e04_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
)
def e04_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "next_type")
    )


# --- e05: cohort retention -------------------------------------------------

@query(
    "e05_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(floor(CAST(floor(epoch(date_trunc('week', e.ts))) AS BIGINT)
                        / 604800.0
                  - CAST(floor(epoch(f.cohort_week)) AS BIGINT) / 604800.0)
                  AS BIGINT) AS week_n
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week, week_n, count(*) AS n_active
    FROM activity
    WHERE week_n <= 4
    GROUP BY cohort_week, week_n
    ORDER BY cohort_week, week_n
    """,
)
def e05_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted as
    active N weeks later — the standard product-analytics rollup. Two passes
    over events (first-seen aggregate, then a distinct activity join); the
    firsts side is per-user and broadcasts at test scale, shuffles by
    user_id at 100 TB (AQE picks)."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    wk = 604_800
    week_n = F.floor(
        F.unix_timestamp(F.date_trunc("week", F.col("ts")).cast("timestamp")) / wk
        - F.unix_timestamp(F.col("cohort_week").cast("timestamp")) / wk
    ).cast("long")
    activity = (
        e.join(firsts, "user_id")
        .select("user_id", "cohort_week", week_n.alias("week_n"))
        .distinct()
    )
    return (
        activity.where(F.col("week_n") <= 4)
        .groupBy(F.col("cohort_week").cast("date").alias("cohort_week"), "week_n")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_n")
    )


# --- e06: trailing-window anomaly flags ------------------------------------

@query(
    "e06_daily_anomalies",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, day, n,
             avg(n) OVER w AS t_avg,
             stddev_samp(n) OVER w AS t_sd,
             count(*) OVER w AS t_cnt
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, day, n,
           round(t_avg, 4) AS trailing_avg,
           round((n - t_avg) / t_sd, 4) AS zscore,
           abs((n - t_avg) / t_sd) > 2 AS is_anomaly
    FROM stats
    WHERE t_cnt = 7 AND t_sd > 0
    ORDER BY event_type, day
    """,
)
def e06_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-type event volumes flagged against a trailing 7-day
    baseline (z-score > 2) — the standard ops-dashboard anomaly query.

    Scale: the windowed stats run on the DAILY AGGREGATE (types × days
    rows), not the raw events — one shuffle to build the daily rollup with
    map-side combine, then a per-type window over a tiny relation."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "event_type",
        "day",
        "n",
        F.avg("n").over(w).alias("t_avg"),
        F.stddev_samp("n").over(w).alias("t_sd"),
        F.count(F.lit(1)).over(w).alias("t_cnt"),
    )
    z = (F.col("n") - F.col("t_avg")) / F.col("t_sd")
    return (
        stats.where((F.col("t_cnt") == 7) & (F.col("t_sd") > 0))
        .select(
            "event_type",
            "day",
            "n",
            F.round("t_avg", 4).alias("trailing_avg"),
            F.round(z, 4).alias("zscore"),
            (F.abs(z) > 2).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


# --- e07: hypertable-style multi-resolution rollup -------------------------
# TimescaleDB-style continuous-aggregate hierarchy: minute → {hour, day},
# where the coarser levels are computed FROM the minute-grain base
# aggregate, not from raw rows. At 100 TB this is the difference between
# ONE corpus scan + one corpus shuffle (minute grain) plus one shuffle over
# ~minutes-of-history (tiny), versus a corpus scan+shuffle per level for
# independent groupBys. Counts are decomposable (sum of partials), so the
# rollup is exact.

@query(
    "e07_multires_rollup",
    oracle="""
    WITH minute AS (
      SELECT date_trunc('minute', ts) AS bucket,
             count(*) AS n_events,
             count(*) FILTER (WHERE event_type = 'error') AS n_errors
      FROM events GROUP BY 1
    ), hour AS (
      SELECT date_trunc('hour', bucket) AS bucket,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(sum(n_errors) AS BIGINT) AS n_errors
      FROM minute GROUP BY 1
    ), day AS (
      SELECT date_trunc('day', bucket) AS bucket,
             CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(sum(n_errors) AS BIGINT) AS n_errors
      FROM hour GROUP BY 1
    )
    SELECT 'hour' AS resolution, bucket, n_events, n_errors FROM hour
    UNION ALL
    SELECT 'day' AS resolution, bucket, n_events, n_errors FROM day
    ORDER BY resolution, bucket
    """,
)
def e07_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minute-grain base aggregate, then hour and day rolled up from it in
    one pass (explode to level keys + re-aggregate). The minute relation is
    the only corpus-sized scan/shuffle. Emits hour+day levels (the minute
    level is the internal base table, analogous to a hypertable's raw
    chunks)."""
    e = load_table(spark, sf_dir, "events")
    # every date_trunc is cast back to NTZ: trunc on NTZ yields LTZ, which
    # PySpark renders in the host TZ at collect (identity cast under the
    # loader's pinned UTC session; keeps results host-TZ-independent)
    minute = e.groupBy(
        F.date_trunc("minute", "ts").cast("timestamp_ntz").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )
    # A naive union of per-level groupBys re-scans the corpus once per level;
    # instead every minute row fans out to its (resolution, bucket) pairs —
    # a row-local 2-way explode over the already-tiny base aggregate — and
    # one second (tiny) shuffle produces all coarser levels together.
    levels = minute.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hour").alias("resolution"),
                    F.date_trunc("hour", "bucket")
                    .cast("timestamp_ntz")
                    .alias("bucket"),
                ),
                F.struct(
                    F.lit("day").alias("resolution"),
                    F.date_trunc("day", "bucket")
                    .cast("timestamp_ntz")
                    .alias("bucket"),
                ),
            )
        ).alias("rb"),
        "n_events",
        "n_errors",
    )
    return (
        levels.groupBy(
            F.col("rb.resolution").alias("resolution"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.sum("n_events").alias("n_events"), F.sum("n_errors").alias("n_errors"))
        .orderBy("resolution", "bucket")
    )


# --- e08: time-bounded multi-step conversion funnel -------------------------
# signup → click (≤7d) → purchase (≤7d after the click): each stage joins
# the event stream against the previous stage's per-user anchor timestamp.
# All three stages key on user_id, so Spark plans ONE hash partitioning
# reused across the chained joins/aggregates (no re-shuffle between
# stages); the stage relations shrink monotonically, and at 100 TB the
# later joins are anchor-sized, not corpus-sized.

@query(
    "e08_conversion_funnel_7d",
    oracle="""
    WITH s0 AS (
      SELECT user_id, min(ts) AS t0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s1 AS (
      SELECT e.user_id, min(e.ts) AS t1
      FROM events e JOIN s0 ON e.user_id = s0.user_id
      WHERE e.event_type = 'click'
        AND e.ts > s0.t0 AND e.ts <= s0.t0 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s0) AS n_signup,
           (SELECT count(*) FROM s1) AS n_click_7d,
           (SELECT count(*) FROM s2) AS n_purchase_7d
    """,
)
def e08_conversion_funnel_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    week = F.expr("INTERVAL 7 DAY")
    s0 = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    s1 = (
        e.where(F.col("event_type") == "click")
        .join(s0, "user_id")
        .where((F.col("ts") > F.col("t0")) & (F.col("ts") <= F.col("t0") + week))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.where(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .where((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + week))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((s0, "n_signup"), (s1, "n_click_7d"), (s2, "n_purchase_7d"))
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


# --- e09: last-touch attribution --------------------------------------------
# Marketing-style attribution: each purchase is credited to the user's most
# recent click no older than 7 days; the report is the daily count of
# attributed vs unattributed purchases and the revenue credited. The as-of
# lookup is the j01 window-carry-forward rewrite (no join at all): clicks
# and purchases interleave in ONE user-keyed window ordered by time, and
# last_value(click_ts, ignorenulls) carries the latest click forward onto
# every purchase row.
#
# 100 TB: one user_id hash partitioning for the window (the only corpus
# shuffle), then a day-keyed aggregate over the purchase subset. No
# stream-sized join, no driver round-trips; ties at identical timestamps
# are ordered by (ts, event_id) so both engines agree deterministically.

@query(
    "e09_last_touch_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ), carried AS (
      SELECT user_id, ts, event_type, value,
             last_value(click_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_click
      FROM tagged
    ), purchases AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, value,
             (last_click IS NOT NULL
              AND ts - last_click <= INTERVAL 7 DAY) AS attributed
      FROM carried WHERE event_type = 'purchase'
    )
    SELECT day,
           count(*) AS n_purchases,
           CAST(count(*) FILTER (WHERE attributed) AS BIGINT) AS n_attributed,
           round(COALESCE(sum(value) FILTER (WHERE attributed), 0.0), 2)
             AS attributed_revenue
    FROM purchases
    GROUP BY day
    ORDER BY day
    """,
)
def e09_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    tagged = e.where(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "last_click", F.last("click_ts", ignorenulls=True).over(w)
    )
    week = F.expr("INTERVAL 7 DAY")
    purchases = carried.where(F.col("event_type") == "purchase").select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "value",
        (
            F.col("last_click").isNotNull()
            & (F.col("ts") <= F.col("last_click") + week)
        ).alias("attributed"),
    )
    return (
        purchases.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count(F.when(F.col("attributed"), 1)).alias("n_attributed"),
            F.round(
                F.coalesce(F.sum(F.when(F.col("attributed"), F.col("value"))), F.lit(0.0)),
                2,
            ).alias("attributed_revenue"),
        )
        .orderBy("day")
    )


# --- e10: rolling DAU/WAU stickiness ----------------------------------------
# Product-analytics engagement ratio: daily active users over trailing-7-day
# weekly active users. Rolling COUNT(DISTINCT) does not decompose into a
# window aggregate, so the standard distributed rewrite is used: collapse to
# distinct (user, day) pairs once (the only corpus shuffle), then each pair
# contributes row-locally to the 7 target days it covers, and a distinct +
# count per target day yields WAU. Everything after the first shuffle is
# pair-aggregate-sized, O(users × days).

@query(
    "e10_dau_wau_stickiness",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), dau AS (
      SELECT day, count(*) AS dau FROM pairs GROUP BY day
    ), contrib AS (
      SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS target_day
      FROM (SELECT user_id, day, unnest(range(0, 7)) AS i FROM pairs)
    ), wau AS (
      SELECT target_day AS day, count(*) AS wau FROM contrib GROUP BY 1
    )
    SELECT d.day, d.dau, w.wau,
           round(CAST(d.dau AS DOUBLE) / w.wau, 4) AS stickiness
    FROM dau d JOIN wau w USING (day)
    ORDER BY d.day
    """,
)
def e10_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    dau = pairs.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    contrib = (
        pairs.select(
            "user_id", "day", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i")
        )
        .select("user_id", F.date_add("day", F.col("i")).alias("target_day"))
        .distinct()
    )
    wau = contrib.groupBy(F.col("target_day").alias("day")).agg(
        F.count(F.lit(1)).alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# --- e11: A/B experiment lift (Welch's t) -----------------------------------
# Deterministic md5 arm assignment (the sampling family's hash discipline),
# per-user purchase totals, then the two-sample comparison from Σx/Σx² —
# the closed form both engines compute identically (per-user totals are
# doubles, so parity holds at 4 dp). Shape: one user-keyed agg (corpus
# shuffle), then a 2-row arm agg and a 1-row pivot — O(users) after the
# first aggregate, nothing collected.

@query(
    "e11_ab_test_lift",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             ('0x' || substr(md5('e11:' || CAST(user_id AS VARCHAR)), 1, 2))::INTEGER
               % 2 AS arm,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS x
      FROM events
      GROUP BY user_id
    ), arms AS (
      SELECT arm, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2
      FROM per_user GROUP BY arm
    ), stats AS (
      SELECT arm, n, s1 / n AS mean,
             (s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1) AS var
      FROM arms
    )
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.mean, 4) AS mean_a,
           round(b.mean, 4) AS mean_b,
           round(b.mean - a.mean, 4) AS lift,
           round((b.mean - a.mean)
                 / sqrt(a.var / a.n + b.var / b.n), 4) AS t_stat
    FROM stats a JOIN stats b ON a.arm = 0 AND b.arm = 1
    """,
)
def e11_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("e11:"), F.col("user_id").cast("string"))), 1, 2
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ).alias("x")
        )
        .select(arm.alias("arm"), "x")
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    stats = arms.select(
        "arm",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) ** 2)
            * F.col("n")
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = stats.where(F.col("arm") == 0).alias("a")
    b = stats.where(F.col("arm") == 1).alias("b")
    return a.crossJoin(b).select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        F.round("a.mean", 4).alias("mean_a"),
        F.round("b.mean", 4).alias("mean_b"),
        F.round(F.col("b.mean") - F.col("a.mean"), 4).alias("lift"),
        F.round(
            (F.col("b.mean") - F.col("a.mean"))
            / F.sqrt(F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")),
            4,
        ).alias("t_stat"),
    )


# --- e12: RFM segmentation --------------------------------------------------
# Classic customer segmentation: per-user Recency (days since last
# purchase), Frequency (purchase count), Monetary (purchase value), each
# quartiled, then segment counts. Shape: ONE user-keyed aggregate over the
# corpus, then THREE range-partitioned global ranks (distributed_row_number
# — two-pass: range shuffle + broadcast prefix offsets) over the O(users)
# relation. A partition-less ntile(4) window would squeeze hundreds of
# millions of users through one task at 100× scale — the v04-class bug —
# so each quartile is computed as the exact ntile bucket of the global
# rank: with n rows, the first n%4 buckets hold n//4+1 rows, the rest
# n//4. Quartile ties: the rank needs a total order, so every sort carries
# user_id (unique), which keeps the bucketing deterministic.

@query(
    "e12_rfm_segments",
    oracle="""
    WITH anchor AS (
      SELECT max(ts) AS mx FROM events
    ), per_user AS (
      SELECT user_id,
             CAST(date_diff('day', max(ts), (SELECT mx FROM anchor)) AS BIGINT)
               AS recency_days,
             count(*) AS frequency,
             round(sum(value), 2) AS monetary
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
    ), scored AS (
      SELECT user_id,
             ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m
      FROM per_user
    )
    SELECT r, f, m, count(*) AS n_users,
           CAST(sum(user_id) AS BIGINT) AS user_checksum
    FROM scored
    GROUP BY r, f, m
    ORDER BY r, f, m
    """,
)
def e12_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        distributed_row_number,
    )

    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    anchor = e.agg(F.max("ts").alias("mx"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("mx"), F.col("last_ts")).cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    ranked = distributed_row_number(
        per_user, [F.asc("recency_days"), F.asc("user_id")], out="ri"
    )
    ranked = distributed_row_number(
        ranked, [F.desc("frequency"), F.asc("user_id")], out="fi"
    )
    ranked = distributed_row_number(
        ranked, [F.desc("monetary"), F.asc("user_id")], out="mi"
    )
    tot = ranked.agg(F.count(F.lit(1)).alias("nn"))

    def ntile4(i):
        # exact ntile(4) bucket of 1-based rank i over nn rows: the first
        # nn%4 buckets hold nn//4+1 rows each, the remaining ones nn//4.
        n, base, rem = F.col("nn"), F.floor(F.col("nn") / 4), F.col("nn") % 4
        head = rem * (base + 1)
        return (
            F.when(F.col(i) <= head, F.ceil(F.col(i) / (base + 1)))
            .otherwise(
                rem
                + F.ceil((F.col(i) - head) / F.greatest(base, F.lit(1)))
            )
            .cast("int")
        )

    scored = ranked.crossJoin(F.broadcast(tot)).select(
        "user_id",
        ntile4("ri").alias("r"),
        ntile4("fi").alias("f"),
        ntile4("mi").alias("m"),
    )
    return (
        scored.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("user_id").alias("user_checksum"),
        )
        .orderBy("r", "f", "m")
    )


# --- e13: cumulative reach (distinct users ever seen, by day) ---------------
# The batch face of streaming/first_seen.py: per-user first-seen day (one
# user-keyed aggregate), users counted per acquisition day, then a running
# sum over the O(days) relation — cumulative COUNT(DISTINCT) without ever
# windowing the corpus (the naive rolling-distinct form is quadratic).

@query(
    "e13_cumulative_reach",
    oracle="""
    WITH fs AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS day0
      FROM events GROUP BY user_id
    ), daily AS (
      SELECT day0 AS day, count(*) AS n_new FROM fs GROUP BY day0
    )
    SELECT day, n_new,
           CAST(sum(n_new) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS total_reach
    FROM daily
    ORDER BY day
    """,
)
def e13_cumulative_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").select("user_id", "ts")
    fs = e.groupBy("user_id").agg(F.min("ts").cast("date").alias("day"))
    daily = fs.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    w = (
        Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        daily.select(
            "day", "n_new", F.sum("n_new").over(w).alias("total_reach")
        )
        .orderBy("day")
    )


# --- e14: metric cross-correlation ------------------------------------------
# "Do errors depress purchases?" — Pearson r between two event-rate series
# on the hourly grid. One corpus rollup (hour × conditional counts — single
# wordcount-bound shuffle), then corr() over the O(hours) relation. Both
# engines compute sample correlation; 4-dp rounding absorbs their
# accumulation-order differences (the iterative-float discipline).

@query(
    "e14_metric_correlation",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             count(CASE WHEN event_type = 'error' THEN 1 END) AS n_err,
             count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_buy,
             count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click
      FROM events GROUP BY h
    )
    SELECT count(*) AS n_hours,
           round(corr(CAST(n_err AS DOUBLE), CAST(n_buy AS DOUBLE)), 4)
             AS err_buy_corr,
           round(corr(CAST(n_click AS DOUBLE), CAST(n_buy AS DOUBLE)), 4)
             AS click_buy_corr
    FROM hourly
    """,
)
def e14_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_buy"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
    )
    return hourly.agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.round(
            F.corr(F.col("n_err").cast("double"), F.col("n_buy").cast("double")), 4
        ).alias("err_buy_corr"),
        F.round(
            F.corr(F.col("n_click").cast("double"), F.col("n_buy").cast("double")), 4
        ).alias("click_buy_corr"),
    )


# --- e15: hour-of-day seasonality profile -----------------------------------
# Capacity planning / anomaly baselines need the diurnal shape per metric:
# how is each event type distributed over the 24 clock hours, and where is
# its peak? One corpus rollup to (type, hour-of-day) — 5×24 rows — then
# share-of-type and peak flags are windows partitioned by type over ≤24
# rows per task. The corpus pass is a single wordcount-bound shuffle.

@query(
    "e15_seasonality_profile",
    oracle="""
    WITH prof AS (
      SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hod, n,
           round(n / sum(n) OVER (PARTITION BY event_type), 4) AS share,
           (n = max(n) OVER (PARTITION BY event_type)) AS is_peak
    FROM prof
    ORDER BY event_type, hod
    """,
)
def e15_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    prof = e.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type")
    return prof.select(
        "event_type",
        "hod",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("share"),
        (F.col("n") == F.max("n").over(w)).alias("is_peak"),
    ).orderBy("event_type", "hod")


# --- e16: single-changepoint detection (binary segmentation step) -----------
# "When did the error rate shift?" — the first step of binary segmentation:
# for every candidate split day k, score |mean(rate[..k]) - mean(rate[k+1..])|
# scaled by sqrt(k(n-k)/n) (the two-sample t numerator under equal
# variance). Everything after the daily rollup runs over the O(days)
# relation: running sums give both side means from ONE ordered pass — no
# per-split rescan, no self-join. The ordered window is over ~days (tiny by
# construction, not a v04-class corpus window). Scores are rounded to 6dp
# BEFORE the argmax so both engines agree on the winning split even when
# float accumulation differs in the last ulp; ties break to the earliest
# day via the (score DESC, day) rank.

@query(
    "e16_changepoint_detection",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             count(*) AS n_total,
             count(*) FILTER (WHERE event_type = 'error') AS n_err
      FROM events GROUP BY 1
    ), seq AS (
      SELECT day, n_total, n_err,
             CAST(n_err AS DOUBLE) / n_total AS rate,
             row_number() OVER (ORDER BY day) AS k,
             count(*) OVER () AS n,
             sum(CAST(n_err AS DOUBLE) / n_total) OVER (
               ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum,
             sum(CAST(n_err AS DOUBLE) / n_total) OVER () AS tot
      FROM daily
    ), scored AS (
      SELECT day, round(rate, 4) AS rate,
             CASE WHEN k < n THEN
               round(abs(cum / k - (tot - cum) / (n - k))
                     * sqrt(CAST(k AS DOUBLE) * (n - k) / n), 6)
             END AS score
      FROM seq
    )
    SELECT day, rate, score,
           coalesce(row_number() OVER (ORDER BY score DESC NULLS LAST, day) = 1,
                    FALSE) AS is_changepoint
    FROM scored
    ORDER BY day
    """,
)
def e16_changepoint_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
    )
    rate = F.col("n_err").cast("double") / F.col("n_total")
    wo = Window.orderBy("day")
    seq = daily.select(
        "day",
        rate.alias("rate"),
        F.row_number().over(wo).alias("k"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum(rate)
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum(rate).over(Window.partitionBy()).alias("tot"),
    )
    k, n, cum, tot = F.col("k"), F.col("n"), F.col("cum"), F.col("tot")
    scored = seq.select(
        "day",
        F.round("rate", 4).alias("rate"),
        F.when(
            k < n,
            F.round(
                F.abs(cum / k - (tot - cum) / (n - k))
                * F.sqrt(k.cast("double") * (n - k) / n),
                6,
            ),
        ).alias("score"),
    )
    wr = Window.orderBy(F.desc_nulls_last("score"), F.asc("day"))
    return scored.select(
        "day",
        "rate",
        "score",
        F.coalesce(F.row_number().over(wr) == 1, F.lit(False)).alias(
            "is_changepoint"
        ),
    ).orderBy("day")


# --- e17: growth accounting (new / retained / resurrected / churned) --------
# The canonical weekly growth-accounting decomposition: every active user in
# week w is exactly one of new (first-ever week), retained (also active in
# w-1), or resurrected (active before, but not in w-1); churned(w) counts
# users active in w-1 and not in w. One corpus pass to distinct
# (user, week); the per-user lag is a user-partitioned window (bounded rows
# per task); the churn identity n_churned(w) = n_active(w-1) - n_retained(w)
# is computed over the O(weeks) rollup, so no user-level anti-join is
# needed — the algebra replaces the second shuffle.

@query(
    "e17_growth_accounting",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ), lagged AS (
      SELECT user_id, wk,
             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk
      FROM uw
    ), states AS (
      SELECT wk,
             count(*) AS n_active,
             count(*) FILTER (WHERE prev_wk IS NULL) AS n_new,
             count(*) FILTER (WHERE date_diff('day', prev_wk, wk) = 7)
               AS n_retained,
             count(*) FILTER (WHERE prev_wk IS NOT NULL
                              AND date_diff('day', prev_wk, wk) > 7)
               AS n_resurrected
      FROM lagged GROUP BY wk
    )
    SELECT wk, n_active, n_new, n_retained, n_resurrected,
           coalesce(lag(n_active) OVER (ORDER BY wk) - n_retained, 0)
             AS n_churned
    FROM states
    ORDER BY wk
    """,
)
def e17_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id",
        F.date_trunc("week", "ts").cast("date").alias("wk"),
    ).distinct()
    lagged = uw.select(
        "user_id",
        "wk",
        F.lag("wk").over(Window.partitionBy("user_id").orderBy("wk")).alias(
            "prev_wk"
        ),
    )
    gap = F.datediff(F.col("wk"), F.col("prev_wk"))
    states = lagged.groupBy("wk").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.count(F.when(F.col("prev_wk").isNull(), 1)).alias("n_new"),
        F.count(F.when(gap == 7, 1)).alias("n_retained"),
        F.count(F.when(F.col("prev_wk").isNotNull() & (gap > 7), 1)).alias(
            "n_resurrected"
        ),
    )
    # churn from the O(weeks) rollup: active(w-1) - retained(w)
    return states.select(
        "wk",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(
            F.lag("n_active").over(Window.orderBy("wk")) - F.col("n_retained"),
            F.lit(0),
        ).alias("n_churned"),
    ).orderBy("wk")


# --- e18: robust (MAD) anomaly detection ------------------------------------
# e06 flags anomalies with mean/stddev z-scores, which an outlier itself
# inflates (masking); the robust version uses median and MAD with the
# Iglewicz–Hoaglin modified z-score 0.6745·(x−med)/MAD and the standard 3.5
# cut. Shape: one corpus rollup to (type, day), then two exact interpolated
# medians per type over the O(days) relation (type-partitioned aggregates,
# not windows) joined back type-keyed. Both engines interpolate medians
# identically (percentile == percentile_cont).

MAD_Z_CUT = 3.5


@query(
    "e18_mad_anomalies",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ), med AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY n) AS med_n
      FROM daily GROUP BY event_type
    ), mad AS (
      SELECT d.event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(d.n - m.med_n))
               AS mad_n
      FROM daily d JOIN med m ON m.event_type = d.event_type
      GROUP BY d.event_type
    ), scored AS (
      SELECT d.event_type, d.n, m.med_n, md.mad_n,
             0.6745 * (d.n - m.med_n) / md.mad_n AS rz
      FROM daily d
      JOIN med m ON m.event_type = d.event_type
      JOIN mad md ON md.event_type = d.event_type
      WHERE md.mad_n > 0
    )
    SELECT event_type,
           count(*) AS n_days,
           round(any_value(med_n), 4) AS median_daily,
           round(any_value(mad_n), 4) AS mad_daily,
           count(*) FILTER (WHERE abs(rz) > {MAD_Z_CUT}) AS n_anomalies,
           round(max(abs(rz)), 4) AS max_robust_z
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def e18_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med_n")
    )
    mad = (
        daily.join(med, "event_type")
        .groupBy("event_type")
        .agg(F.expr("percentile(abs(n - med_n), 0.5)").alias("mad_n"))
    )
    rz = 0.6745 * (F.col("n") - F.col("med_n")) / F.col("mad_n")
    scored = (
        daily.join(med, "event_type")
        .join(mad, "event_type")
        .where(F.col("mad_n") > 0)
        .select("event_type", "n", "med_n", "mad_n", rz.alias("rz"))
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.any_value("med_n"), 4).alias("median_daily"),
            F.round(F.any_value("mad_n"), 4).alias("mad_daily"),
            F.count(F.when(F.abs(F.col("rz")) > MAD_Z_CUT, 1)).alias(
                "n_anomalies"
            ),
            F.round(F.max(F.abs(F.col("rz"))), 4).alias("max_robust_z"),
        )
        .orderBy("event_type")
    )


# --- e19: inter-event time distribution -------------------------------------
# Arrival-process profiling: per event type, the distribution of per-user
# gaps between consecutive events on a log10 scale (arrivals are
# heavy-tailed; linear bins waste resolution) plus the exact median gap.
# One user-keyed window for the lag (bounded per task), then a
# (type, decade)-keyed wordcount agg and a type-partitioned exact median —
# nothing global, nothing corpus-windowed.

@query(
    "e19_interevent_gaps",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    ), ok AS (
      SELECT event_type, gap_us,
             CAST(floor(log10(gap_us / 1000000.0)) AS INTEGER) AS decade
      FROM gaps WHERE gap_us > 0
    )
    SELECT event_type, decade,
           count(*) AS n_gaps,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY gap_us)
                 / 1000000.0, 4) AS median_gap_s
    FROM ok
    GROUP BY event_type, decade
    ORDER BY event_type, decade
    """,
)
def e19_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = e.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).where(F.col("gap_us") > 0)
    ok = gaps.select(
        "event_type",
        "gap_us",
        F.floor(F.log10(F.col("gap_us") / 1000000.0)).cast("int").alias(
            "decade"
        ),
    )
    return (
        ok.groupBy("event_type", "decade")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(
                F.expr("percentile(gap_us, 0.5)") / 1000000.0, 4
            ).alias("median_gap_s"),
        )
        .orderBy("event_type", "decade")
    )


# --- e20: multi-window SLO burn rate ----------------------------------------
# The SRE alerting classic (Google SRE workbook ch.5): page when the error
# budget burns fast on BOTH a long and a short window — the long window
# filters blips, the short one guarantees the page clears quickly once the
# incident ends. Budget here: 2% errors; burn = window error rate / budget.
# Shape: ONE corpus rollup to 5-minute grain, hour and peak-5m both derive
# from it (the e07 hierarchy discipline); everything after is O(hours).

SLO_BUDGET = 0.02
BURN_THRESHOLD = 3.0


@query(
    "e20_slo_burn_rate",
    oracle=f"""
    WITH m5 AS (
      SELECT date_trunc('hour', ts)
               + INTERVAL 5 MINUTE * CAST(floor(minute(ts) / 5) AS INTEGER)
               AS bucket,
             count(*) AS n,
             count(*) FILTER (WHERE event_type = 'error') AS n_err
      FROM events GROUP BY 1
    ), hourly AS (
      SELECT date_trunc('hour', bucket) AS hour,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(n_err) AS BIGINT) AS n_err,
             max(CASE WHEN n > 0 THEN CAST(n_err AS DOUBLE) / n END)
               AS peak_5m_rate
      FROM m5 GROUP BY 1
    )
    SELECT hour,
           round(CAST(n_err AS DOUBLE) / n / {SLO_BUDGET}, 4) AS burn_1h,
           round(peak_5m_rate / {SLO_BUDGET}, 4) AS peak_burn_5m,
           (CAST(n_err AS DOUBLE) / n / {SLO_BUDGET} > {BURN_THRESHOLD}
            AND peak_5m_rate / {SLO_BUDGET} > {BURN_THRESHOLD}) AS page
    FROM hourly
    ORDER BY hour
    """,
)
def e20_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    m5 = e.groupBy(
        F.expr(
            "date_trunc('hour', ts) + make_interval(0,0,0,0,0,"
            "5 * cast(floor(minute(ts) / 5) as int), 0)"
        )
        .cast("timestamp_ntz")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_err"),
    )
    hourly = m5.groupBy(
        F.date_trunc("hour", "bucket").cast("timestamp_ntz").alias("hour")
    ).agg(
        F.sum("n").alias("n"),
        F.sum("n_err").alias("n_err"),
        F.max(
            F.when(
                F.col("n") > 0, F.col("n_err").cast("double") / F.col("n")
            )
        ).alias("peak_5m_rate"),
    )
    burn_1h = F.col("n_err").cast("double") / F.col("n") / SLO_BUDGET
    peak_5m = F.col("peak_5m_rate") / SLO_BUDGET
    return hourly.select(
        "hour",
        F.round(burn_1h, 4).alias("burn_1h"),
        F.round(peak_5m, 4).alias("peak_burn_5m"),
        ((burn_1h > BURN_THRESHOLD) & (peak_5m > BURN_THRESHOLD)).alias(
            "page"
        ),
    ).orderBy("hour")


# --- e21: cohort LTV curve ---------------------------------------------------
# The revenue companion to e05's retention counts: for each signup-week
# cohort, cumulative purchase value per week-of-life — the curve a
# growth team reads payback periods from. Revenue runs in EXACT integer
# cents (the q31 discipline: purchase values quantized row-locally,
# BIGINT sums are associative, so the curve is bit-stable at any
# partitioning). Shapes: one user-keyed min-agg (cohort key), one
# (cohort, age)-keyed rollup, then the running sum is a cohort-partitioned
# window over O(weeks) rows per cohort.

@query(
    "e21_cohort_ltv",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), purchases AS (
      SELECT e.user_id,
             f.cohort,
             CAST(date_diff('day', f.cohort,
                            CAST(date_trunc('week', e.ts) AS DATE)) // 7
                  AS INTEGER) AS week_age,
             CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ), weekly AS (
      SELECT cohort, week_age,
             count(*) AS n_purchases,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM purchases GROUP BY cohort, week_age
    )
    SELECT cohort, week_age, n_purchases,
           round(cents / 100.0, 2) AS week_value,
           round(CAST(sum(cents) OVER (
             PARTITION BY cohort ORDER BY week_age
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100.0, 2) AS cum_value
    FROM weekly
    ORDER BY cohort, week_age
    """,
)
def e21_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort")
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", "ts").cast("date"), F.col("cohort")
                )
                / 7
            )
            .cast("int")
            .alias("week_age"),
            cents.alias("cents"),
        )
    )
    weekly = purchases.groupBy("cohort", "week_age").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("cents"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("week_age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return weekly.select(
        "cohort",
        "week_age",
        "n_purchases",
        F.round(F.col("cents") / 100.0, 2).alias("week_value"),
        F.round(F.sum("cents").over(w).cast("double") / 100.0, 2).alias(
            "cum_value"
        ),
    ).orderBy("cohort", "week_age")


# --- e22: user-lifetime survival curve ---------------------------------------
# Kaplan-Meier product-limit estimate of user lifetime (days between a
# user's first and last event). With no censoring the product TELESCOPES —
# survival(k) = prod_{j<=k}(1 - c_j/r_j) = (r_k - c_k)/N, the empirical
# survivor function — so every statistic here is an exact integer ratio:
# no log/exp chain, no float drift, deterministic at any partitioning.
#
# 100 TB shape: one user-keyed aggregate (min/max date per user — the only
# corpus shuffle, map-side combined), then everything runs on the
# O(observed-lifetimes) histogram: the reverse-cumulative at-risk count is
# a window over that bounded-by-calendar relation (allowlisted global
# window, e13's class), and the 4-dp hazard/survival derive from integer
# counts by integer half-up division.

@query(
    "e22_survival_curve",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
               AS k
      FROM events GROUP BY user_id
    ), hist AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_churned FROM pu GROUP BY k
    ), t AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM pu
    ), r AS (
      SELECT k, n_churned,
             CAST(sum(n_churned) OVER (ORDER BY k DESC
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS n_at_risk
      FROM hist
    )
    SELECT CAST(k AS INTEGER) AS lifetime_days, n_at_risk, n_churned,
           ((20000 * n_churned + n_at_risk) // (2 * n_at_risk)) / 10000.0
             AS hazard,
           ((20000 * (n_at_risk - n_churned) + (SELECT n FROM t))
            // (2 * (SELECT n FROM t))) / 10000.0 AS survival
    FROM r
    ORDER BY lifetime_days
    """,
)
def e22_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    pu = e.groupBy("user_id").agg(
        F.datediff(F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))).alias("k")
    )
    hist = pu.groupBy("k").agg(F.count(F.lit(1)).alias("n_churned"))
    total = pu.agg(F.count(F.lit(1)).alias("n"))
    # bounded global window: the histogram has one row per OBSERVED
    # lifetime — O(calendar days), corpus-size-independent
    w = Window.orderBy(F.desc("k")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    r = hist.withColumn("n_at_risk", F.sum("n_churned").over(w))
    hazard = (
        F.expr("(20000 * n_churned + n_at_risk) DIV (2 * n_at_risk)")
        .cast("double")
        / F.lit(10000.0)
    )
    survival = (
        F.expr("(20000 * (n_at_risk - n_churned) + n) DIV (2 * n)")
        .cast("double")
        / F.lit(10000.0)
    )
    return (
        r.crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("int").alias("lifetime_days"),
            "n_at_risk",
            "n_churned",
            hazard.alias("hazard"),
            survival.alias("survival"),
        )
        .orderBy("lifetime_days")
    )


# --- e23: event-type transition matrix -------------------------------------

@query(
    "e23_event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), trans AS (
      SELECT prev_type, event_type, count(*) AS n_transitions
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ), tot AS (
      SELECT prev_type, sum(n_transitions) AS tot FROM trans GROUP BY 1
    )
    SELECT t.prev_type, t.event_type, t.n_transitions,
           CAST((20000 * t.n_transitions + x.tot) // (2 * x.tot) AS DOUBLE)
             / 10000.0 AS prob
    FROM trans t JOIN tot x USING (prev_type)
    ORDER BY t.prev_type, t.event_type
    """,
)
def e23_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    lag within a user-keyed window (ts, event_id tiebreak — fully
    deterministic), then one (prev, curr)-keyed count with partial
    combine. Row-transition probabilities use the integer half-up 4-dp
    division (20000n + t) DIV 2t so Spark and DuckDB round identically
    even on exact .xxxx5 boundaries. 100 TB shape: the window is
    partitioned by user_id (no global window), the aggregate output is
    |event types|^2 rows, and the per-prev totals join is
    broadcast-sized."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n_transitions").alias("tot"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "event_type",
            "n_transitions",
            (
                F.expr("(20000 * n_transitions + tot) DIV (2 * tot)")
                .cast("double")
                / F.lit(10000.0)
            ).alias("prob"),
        )
        .orderBy("prev_type", "event_type")
    )


# --- e24: peak concurrent sessions ----------------------------------------
# Capacity-planning headline: per day, the maximum number of user sessions
# active in any one minute, and the (earliest) minute of day it happened.
# Sessions are l07's 30-min-gap islands; concurrency is measured at minute
# granularity by landing each session on the minute buckets it covers
# (the j03 interval→bucket trick) — an aggregate pipeline, not a global
# sweep-line, so no partition-less window ever touches corpus-sized data.

@query(
    "e24_peak_concurrency",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, epoch_us(ts) AS ts_us,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ), spans AS (
      SELECT user_id, session_id,
             min(ts_us) // 60000000 AS m0, max(ts_us) // 60000000 AS m1
      FROM sess GROUP BY 1, 2
    ), mins AS (
      SELECT unnest(range(m0, m1 + 1)) AS minute FROM spans
    ), conc AS (
      SELECT minute, count(*) AS n FROM mins GROUP BY 1
    ), daily AS (
      SELECT minute // 1440 AS day_idx, max(n) AS peak_concurrent
      FROM conc GROUP BY 1
    )
    SELECT DATE '1970-01-01' + CAST(d.day_idx AS INTEGER) AS day,
           d.peak_concurrent,
           min(c.minute) % 1440 AS peak_minute_of_day
    FROM daily d
      JOIN conc c ON c.minute // 1440 = d.day_idx
                 AND c.n = d.peak_concurrent
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def e24_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max per-minute concurrent sessions per day (30-min-gap sessions).

    100 TB shape: sessionization is one user-keyed shuffle + sorted window
    (l07); spans collapse to O(sessions) rows; the bucket explode fans each
    session out only to the minutes it covers (bounded — consecutive events
    within a session are <=30 min apart, so minutes <= 30 x events); minute
    concurrency and the daily peak are plain keyed aggregates with map-side
    combine over a bounded key space (minutes in retention). The peak-minute
    argmax is an aggregate==aggregate equi-join on (day, count) over
    O(minutes) rows — never a corpus-wide window."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.lag(ts_us).over(w)
    sess = (
        e.select("user_id", "ts", "event_id")
        .withColumn("ts_us", ts_us)
        .withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > 1800 * 1_000_000), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    spans = sess.groupBy("user_id", "session_id").agg(
        F.expr("min(ts_us) DIV 60000000").alias("m0"),
        F.expr("max(ts_us) DIV 60000000").alias("m1"),
    )
    conc = (
        spans.select(F.explode(F.sequence("m0", "m1")).alias("minute"))
        .groupBy("minute")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = conc.groupBy(F.expr("minute DIV 1440").alias("day_idx")).agg(
        F.max("n").alias("peak_concurrent")
    )
    cd = conc.withColumn("day_idx", F.expr("minute DIV 1440"))
    return (
        daily.join(cd, ["day_idx"])
        .where(F.col("n") == F.col("peak_concurrent"))
        .groupBy("day_idx", "peak_concurrent")
        .agg((F.min("minute") % 1440).alias("peak_minute_of_day"))
        .select(
            F.date_add(
                F.to_date(F.lit("1970-01-01")), F.col("day_idx").cast("int")
            ).alias("day"),
            "peak_concurrent",
            "peak_minute_of_day",
        )
        .orderBy("day")
    )


# --- e25: bot / automation detection --------------------------------------
# Scripted clients fire on a fixed timer, so their inter-event gaps pile on
# one modal value; humans spread out. Score = share of a user's gaps equal
# to the (second-granularity) modal gap, exact 4-dp; flag when the mode
# holds a majority.

@query(
    "e25_bot_regularity",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             (epoch_us(ts) - epoch_us(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)))
               // 1000000 AS gap_s
      FROM events
    ), byg AS (
      SELECT user_id, gap_s, count(*) AS n FROM gaps
      WHERE gap_s IS NOT NULL GROUP BY 1, 2
    ), per_user AS (
      SELECT user_id, sum(n) AS n_gaps, max(n) AS modal_n FROM byg GROUP BY 1
    )
    SELECT p.user_id, CAST(p.n_gaps AS BIGINT) AS n_gaps,
           min(b.gap_s) AS modal_gap_s,
           CAST((20000 * p.modal_n + p.n_gaps) // (2 * p.n_gaps) AS DOUBLE)
             / 10000.0 AS modal_share,
           CASE WHEN 2 * p.modal_n >= p.n_gaps THEN 1 ELSE 0 END AS is_bot
    FROM per_user p
      JOIN byg b ON b.user_id = p.user_id AND b.n = p.modal_n
    WHERE p.n_gaps >= 30
    GROUP BY 1, p.n_gaps, p.modal_n
    ORDER BY modal_share DESC, p.user_id
    LIMIT 100
    """,
)
def e25_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user timer-regularity score: modal inter-event gap (seconds)
    share of all gaps, 4-dp by integer half-up division; is_bot when the
    modal gap covers a majority of gaps.

    100 TB shape: one user-keyed window for the lag, then everything is
    keyed aggregation — (user, gap)-keyed counts with map-side combine,
    user-keyed rollup to O(users) rows, and the modal-gap argmax as an
    aggregate==aggregate join on (user, count). Gap histograms, not event
    rows, cross the later shuffles."""
    e = load_table(spark, sf_dir, "events")
    byg = (
        e.select("user_id", "ts", "event_id")
        .withColumn("gap_s", F.expr(
            "(unix_micros(cast(ts as timestamp)) - "
            "lag(unix_micros(cast(ts as timestamp))) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id)) DIV 1000000"
        ))
        .where(F.col("gap_s").isNotNull())
        .groupBy("user_id", "gap_s")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_user = byg.groupBy("user_id").agg(
        F.sum("n").alias("n_gaps"), F.max("n").alias("modal_n")
    )
    share = (
        F.expr("(20000 * modal_n + n_gaps) DIV (2 * n_gaps)").cast("double")
        / F.lit(10000.0)
    )
    return (
        per_user.join(byg, ["user_id"])
        .where(F.col("n") == F.col("modal_n"))
        .groupBy("user_id", "n_gaps", "modal_n")
        .agg(F.min("gap_s").alias("modal_gap_s"))
        .select(
            "user_id",
            "n_gaps",
            "modal_gap_s",
            share.alias("modal_share"),
            F.when(2 * F.col("modal_n") >= F.col("n_gaps"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_bot"),
        )
        .where(F.col("n_gaps") >= 30)
        .orderBy(F.desc("modal_share"), F.asc("user_id"))
        .limit(100)
    )


# --- e26: autocorrelation periodicity profile ------------------------------
# Does a metric have a weekly/daily rhythm? Lag-k Pearson autocorrelation
# of the per-type daily event-count series for k = 1..7 — the capacity
# planner's seasonality detector (a peak at k=7 says weekly). All six
# Pearson sufficient statistics are INTEGER sums over the O(days x types)
# rollup, so the correlation is exact up to one final double expression —
# deterministic at any partitioning.

AC_MAX_LAG = 7


@query(
    "e26_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ), lags AS (
      SELECT CAST(unnest(range(1, {AC_MAX_LAG} + 1)) AS INTEGER) AS lag
    ), pairs AS (
      SELECT a.event_type, l.lag, a.n AS x, b.n AS y
      FROM daily a
        CROSS JOIN lags l
        JOIN daily b ON b.event_type = a.event_type
                    AND b.day = a.day + l.lag
    ), stats AS (
      SELECT event_type, lag,
             count(*) AS n_pairs,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag, n_pairs,
           round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
                 + 0.0, 6) AS autocorr
    FROM stats
    WHERE n_pairs * sxx > sx * sx AND n_pairs * syy > sy * sy
    ORDER BY event_type, lag
    """,
)
def e26_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type lag-1..7 autocorrelation of the daily count series.

    100 TB shape: the only corpus-sized stage is the (type, day) rollup
    (map-side combine); the lag alignment is a self-join of that tiny
    relation against itself shifted by k — O(days x types x lags) rows —
    and every Pearson term is an exact bigint sum, so the result is
    bit-stable at any partitioning. Zero-variance series (constant counts)
    are excluded rather than divided by zero."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lags = spark.range(1, AC_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.crossJoin(F.broadcast(lags))
    b = daily.select(
        F.col("event_type").alias("event_type_b"),
        F.col("day").alias("day_b"),
        F.col("n").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("event_type_b") == F.col("event_type"))
        & (F.col("day_b") == F.date_add(F.col("day"), F.col("lag"))),
    ).select("event_type", "lag", F.col("n").alias("x"), "y")
    stats = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return (
        stats.where(
            (F.col("n_pairs") * F.col("sxx") > F.col("sx") * F.col("sx"))
            & (F.col("n_pairs") * F.col("syy") > F.col("sy") * F.col("sy"))
        )
        .select(
            "event_type",
            "lag",
            "n_pairs",
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)) + F.lit(0.0), 6).alias(
                "autocorr"
            ),
        )
        .orderBy("event_type", "lag")
    )


# --- e27: robust daily-volume trend (Theil-Sen estimator) -------------------
# The outlier-immune answer to "is traffic growing": the Theil-Sen slope
# (median of all pairwise day-over-day slopes) of each type's daily count
# series. A single incident day that would wreck an OLS fit moves at most
# one pairwise slope past the median. Pair enumeration is over the
# O(days) rollup — days^2/2 slope rows per type, corpus-independent.

@query(
    "e27_theilsen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      FROM events GROUP BY 1, 2
    ), d0 AS (
      SELECT event_type, min(day) AS day0 FROM daily GROUP BY 1
    ), pts AS (
      SELECT d.event_type, d.day - z.day0 AS x, d.n AS y
      FROM daily d JOIN d0 z USING (event_type)
    ), slopes AS (
      SELECT a.event_type,
             CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
      FROM pts a JOIN pts b ON b.event_type = a.event_type AND b.x > a.x
    ), agg AS (
      SELECT event_type, count(*) AS n_pairs,
             list(s ORDER BY s) AS ss
      FROM slopes GROUP BY 1
    )
    SELECT event_type, n_pairs,
           round(CASE WHEN n_pairs % 2 = 1
                      THEN ss[(n_pairs + 1) // 2]
                      ELSE (ss[n_pairs // 2] + ss[n_pairs // 2 + 1]) / 2.0
                 END + 0.0, 6) AS slope_per_day,
           CASE WHEN CASE WHEN n_pairs % 2 = 1
                           THEN ss[(n_pairs + 1) // 2]
                           ELSE (ss[n_pairs // 2] + ss[n_pairs // 2 + 1]) / 2.0
                      END > 0.05 THEN 'up'
                WHEN CASE WHEN n_pairs % 2 = 1
                           THEN ss[(n_pairs + 1) // 2]
                           ELSE (ss[n_pairs // 2] + ss[n_pairs // 2 + 1]) / 2.0
                      END < -0.05 THEN 'down'
                ELSE 'flat' END AS trend
    FROM agg
    ORDER BY event_type
    """,
)
def e27_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of the per-type daily count series + an up/down/flat
    call at a ±0.05 events/day threshold.

    100 TB shape: the corpus collapses to the (type, day) rollup first
    (map-side combine); pairwise slopes are a self-join of that O(days)
    relation per type (days²/2 rows — hundreds, corpus-independent), and
    the exact median comes from a per-type sorted array built from those
    few hundred values, never from corpus rows. Every slope is an exact
    double of two integers (same division both engines), so the median —
    including the even-count two-value mean — is bit-identical."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    d0 = daily.groupBy("event_type").agg(F.min("day").alias("day0"))
    pts = daily.join(F.broadcast(d0), "event_type").select(
        "event_type", F.datediff("day", "day0").alias("x"), F.col("n").alias("y")
    )
    b = pts.select(
        F.col("event_type").alias("et_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    slopes = pts.join(
        b, (F.col("et_b") == F.col("event_type")) & (F.col("xb") > F.col("x"))
    ).select(
        "event_type",
        ((F.col("yb") - F.col("y")).cast("double") / (F.col("xb") - F.col("x"))).alias(
            "s"
        ),
    )
    agg = slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.array_sort(F.collect_list("s")).alias("ss"),
    )
    n = F.col("n_pairs")
    med = F.when(
        n % 2 == 1, F.element_at("ss", ((n + 1) / 2).cast("int"))
    ).otherwise(
        (
            F.element_at("ss", (n / 2).cast("int"))
            + F.element_at("ss", (n / 2 + 1).cast("int"))
        )
        / 2.0
    )
    return (
        agg.select(
            "event_type",
            "n_pairs",
            F.round(med + F.lit(0.0), 6).alias("slope_per_day"),
            F.when(med > 0.05, "up")
            .when(med < -0.05, "down")
            .otherwise("flat")
            .alias("trend"),
        )
        .orderBy("event_type")
    )


# --- e28: conversion latency percentiles by signup cohort -------------------
# e01/e08 count WHO converts; this measures HOW FAST — the signup→first-
# purchase latency distribution per signup cohort month, the activation
# metric growth teams actually watch. Latency lands in whole integer
# seconds (floor-epoch subtraction, identical in both engines), and the
# exact interpolated percentiles run per cohort group — integer inputs, so
# the result is deterministic at any partitioning (the q32 pattern).
#
# 100 TB shape: two user-keyed aggregates (first signup, first qualifying
# purchase) and one user-keyed join — three shuffles on the same key, no
# windows, no correlated subquery; the percentile aggregate runs over
# O(converted users) grouped into O(months) rows.

@query(
    "e28_conversion_latency",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS s FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), pu AS (
      SELECT e.user_id, min(e.ts) AS p
      FROM events e JOIN su ON e.user_id = su.user_id AND e.ts >= su.s
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    ), lat AS (
      SELECT strftime(su.s, '%Y-%m') AS cohort,
             CAST(floor(epoch(pu.p)) AS BIGINT)
               - CAST(floor(epoch(su.s)) AS BIGINT) AS sec
      FROM su LEFT JOIN pu ON su.user_id = pu.user_id
    )
    SELECT cohort,
           count(*) AS n_signups,
           count(sec) AS n_converted,
           ((20000 * count(sec) + count(*)) // (2 * count(*))) / 10000.0
             AS conv_rate,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY sec), 4) AS p50_sec,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY sec), 4) AS p90_sec,
           CAST(max(sec) AS BIGINT) AS max_sec
    FROM lat
    GROUP BY cohort
    ORDER BY cohort
    """,
)
def e28_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    su = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    pu = (
        e.where(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .where(F.col("ts") >= F.col("s"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p"))
    )
    lat = su.join(pu, "user_id", "left").select(
        F.date_format("s", "yyyy-MM").alias("cohort"),
        (
            F.unix_timestamp("p") - F.unix_timestamp("s")
        ).alias("sec"),
    )
    conv = F.expr(
        "(20000 * count(sec) + count(*)) DIV (2 * count(*))"
    ).cast("double") / F.lit(10000.0)
    return (
        lat.groupBy("cohort")
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count("sec").alias("n_converted"),
            conv.alias("conv_rate"),
            F.round(F.expr("percentile(sec, 0.5)"), 4).alias("p50_sec"),
            F.round(F.expr("percentile(sec, 0.9)"), 4).alias("p90_sec"),
            F.max("sec").cast("bigint").alias("max_sec"),
        )
        .orderBy("cohort")
    )


# --- e29: cohort retention matrix --------------------------------------------
# The product-analytics staple the reference's users graduate to after e10
# stickiness / e17 growth accounting: a (signup-cohort week x week-offset)
# matrix of "what fraction of the cohort was still active k weeks later".
#
# 100 TB shape: the only corpus-sized stage is the distinct (user, week)
# projection (map-side combine, O(users x weeks) out); cohort assignment is
# a user-keyed min, and the matrix itself is O(weeks^2) rows. Retention is
# integer half-up 4-dp division; every user is active in their cohort week
# by construction, so the offset-0 column doubles as the cohort size.

@query(
    "e29_retention_matrix",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ), cohort AS (
      SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id
    ), active AS (
      SELECT c.cw AS cohort_week,
             datediff('day', c.cw, u.wk) // 7 AS week_offset,
             count(*) AS n_active
      FROM uw u JOIN cohort c USING (user_id)
      GROUP BY 1, 2
    ), sizes AS (
      SELECT cohort_week, n_active AS n_cohort FROM active WHERE week_offset = 0
    )
    SELECT a.cohort_week, CAST(a.week_offset AS BIGINT) AS week_offset,
           a.n_active, s.n_cohort,
           CAST((20000 * a.n_active + s.n_cohort)
                // (2 * s.n_cohort) AS DOUBLE) / 10000.0 AS retention
    FROM active a JOIN sizes s USING (cohort_week)
    ORDER BY a.cohort_week, a.week_offset
    """,
)
def e29_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cw"))
    active = (
        uw.join(cohort, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.datediff("wk", "cw") / 7).cast("bigint").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = active.where(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("n_cohort")
    )
    ret = F.expr("(20000 * n_active + n_cohort) DIV (2 * n_cohort)").cast(
        "double"
    ) / F.lit(10000.0)
    return (
        active.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            ret.alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# --- e30: anomaly attribution -------------------------------------------------
# e18 flags WHICH days are anomalous (robust z over daily totals); the
# on-call question is WHY — which event type drove the excursion. Per day:
# the total's robust z (same 0.6745*(n-med)/MAD estimator as e18, proven
# cross-engine there), plus the top-contributing type by excess over its
# own median daily volume. Excess is kept in exact x2 integer units
# (2*count - 2*median is an exact-integer-valued double at these
# magnitudes: percentile_cont interpolation is (a+b)/2 over bigints), so
# the argmax tie-break (excess desc, type asc) is bit-deterministic.
#
# 100 TB shape: one (day, type) corpus aggregate with map-side combine;
# medians, MAD, z and the per-day argmax all run on O(days x types) rows.

E30_Z_CUT = 2.5


@query(
    "e30_anomaly_attribution",
    oracle=f"""
    WITH dt AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), daily AS (
      SELECT day, sum(n) AS n_total FROM dt GROUP BY day
    ), med AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY n_total) AS med_n
      FROM daily
    ), mad AS (
      SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY abs(d.n_total - m.med_n)) AS mad_n
      FROM daily d CROSS JOIN med m
    ), tmed AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY n) AS tmed_n
      FROM dt GROUP BY event_type
    ), excess AS (
      SELECT dt.day, dt.event_type,
             CAST(2 * dt.n - 2 * t.tmed_n AS BIGINT) AS ex2
      FROM dt JOIN tmed t USING (event_type)
    ), top AS (
      SELECT day, event_type AS top_type, ex2 FROM (
        SELECT day, event_type, ex2,
               row_number() OVER (
                 PARTITION BY day ORDER BY ex2 DESC, event_type ASC
               ) AS rk
        FROM excess
      ) WHERE rk = 1
    )
    SELECT d.day, CAST(d.n_total AS BIGINT) AS n_total,
           round(0.6745 * (d.n_total - m.med_n) / md.mad_n, 4) + 0.0 AS robust_z,
           abs(0.6745 * (d.n_total - m.med_n) / md.mad_n) > {E30_Z_CUT}
             AS is_anomaly,
           t.top_type,
           CAST(t.ex2 AS DOUBLE) / 2.0 AS top_excess
    FROM daily d CROSS JOIN med m CROSS JOIN mad md
      JOIN top t USING (day)
    WHERE md.mad_n > 0
    ORDER BY d.day
    """,
)
def e30_anomaly_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dt = (
        e.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
    )
    daily = dt.groupBy("day").agg(F.sum("n").alias("n_total"))
    med = daily.agg(F.expr("percentile(n_total, 0.5)").alias("med_n"))
    mad = (
        daily.join(F.broadcast(med), how="cross")
        .agg(
            F.expr("percentile(abs(n_total - med_n), 0.5)").alias("mad_n")
        )
    )
    tmed = dt.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("tmed_n")
    )
    excess = dt.join(F.broadcast(tmed), "event_type").select(
        "day",
        "event_type",
        (2 * F.col("n") - 2 * F.col("tmed_n")).cast("bigint").alias("ex2"),
    )
    top = (
        excess.groupBy("day")
        .agg(
            F.min_by(
                F.struct(
                    F.col("event_type").alias("top_type"),
                    F.col("ex2"),
                ),
                F.struct((-F.col("ex2")).alias("nx"), F.col("event_type")),
            ).alias("t")
        )
        .select("day", F.col("t.top_type").alias("top_type"), F.col("t.ex2"))
    )
    rz = 0.6745 * (F.col("n_total") - F.col("med_n")) / F.col("mad_n")
    return (
        daily.join(F.broadcast(med), how="cross")
        .join(F.broadcast(mad), how="cross")
        .join(top, "day")
        .where(F.col("mad_n") > 0)
        .select(
            "day",
            F.col("n_total").cast("bigint").alias("n_total"),
            (F.round(rz, 4) + 0.0).alias("robust_z"),
            (F.abs(rz) > E30_Z_CUT).alias("is_anomaly"),
            "top_type",
            (F.col("ex2").cast("double") / 2.0).alias("top_excess"),
        )
        .orderBy("day")
    )


# --- e31: experiment power / minimum detectable effect ------------------------
# The experimentation-platform question that comes BEFORE e11's lift
# readout: at this sample size and variance, what's the smallest true
# effect this A/B could reliably detect (alpha=0.05 two-sided, power=0.8)?
# MDE = (z_{alpha/2} + z_{power}) * SE of the mean difference — the Welch
# standard error from the same per-arm sufficient statistics e11 uses
# (same 'e11:' hash salt, so this audits the SAME experiment assignment).
# `powered` says whether the observed lift clears the detectability bar.
#
# 100 TB shape: one user-keyed corpus aggregate; everything after runs on
# the 2-row arm relation. Float arithmetic mirrors e11's proven
# cross-engine expressions (same sums, one extra sqrt), 4-dp rounding.

E31_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
E31_Z_POWER = 0.841621  # power = 0.8


@query(
    "e31_experiment_power",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             ('0x' || substr(md5('e11:' || CAST(user_id AS VARCHAR)), 1, 2))::INTEGER
               % 2 AS arm,
             sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS x
      FROM events
      GROUP BY user_id
    ), arms AS (
      SELECT arm, count(*) AS n, sum(x) AS s1, sum(x * x) AS s2
      FROM per_user GROUP BY arm
    ), stats AS (
      SELECT arm, n, s1 / n AS mean,
             (s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1) AS var
      FROM arms
    )
    SELECT a.n AS n_a, b.n AS n_b,
           round(a.mean, 4) AS mean_a,
           round(sqrt(a.var / a.n + b.var / b.n), 4) AS se,
           round(({E31_Z_ALPHA} + {E31_Z_POWER})
                 * sqrt(a.var / a.n + b.var / b.n), 4) AS mde_abs,
           round(({E31_Z_ALPHA} + {E31_Z_POWER})
                 * sqrt(a.var / a.n + b.var / b.n) / a.mean, 4) AS mde_rel,
           abs(b.mean - a.mean) >= ({E31_Z_ALPHA} + {E31_Z_POWER})
                 * sqrt(a.var / a.n + b.var / b.n) AS powered
    FROM stats a JOIN stats b ON a.arm = 0 AND b.arm = 1
    """,
)
def e31_experiment_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("e11:"), F.col("user_id").cast("string"))
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ).alias("x")
        )
        .select(arm.alias("arm"), "x")
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    stats = arms.select(
        "arm",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) ** 2)
            * F.col("n")
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = stats.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a_raw"),
        F.col("var").alias("var_a"),
    )
    b = stats.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b_raw"),
        F.col("var").alias("var_b"),
    )
    z = F.lit(E31_Z_ALPHA) + F.lit(E31_Z_POWER)
    se = F.sqrt(
        F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b")
    )
    return (
        a.crossJoin(b)
        .select(
            "n_a",
            "n_b",
            F.round(F.col("mean_a_raw"), 4).alias("mean_a"),
            F.round(se, 4).alias("se"),
            F.round(z * se, 4).alias("mde_abs"),
            F.round(z * se / F.col("mean_a_raw"), 4).alias("mde_rel"),
            (
                F.abs(F.col("mean_b_raw") - F.col("mean_a_raw")) >= z * se
            ).alias("powered"),
        )
    )


# --- e32: burstiness (Fano factor) per event type -----------------------------
# Traffic-shape classifier: Fano factor = variance/mean of per-minute event
# counts. ~1 = Poisson (organic traffic), >> 1 = bursty (incidents,
# batch jobs, retry storms), << 1 = metronomic (bots, schedulers) —
# complements e25 (per-user regularity) with the per-TYPE arrival-process
# view an SRE dashboard tracks.
#
# Exactness: minute counts are integers; Fano over the observed minutes is
# the rational (n·Σx² − (Σx)²) / (n·Σx), computed entirely in exact
# integer sufficient statistics with one half-up integer division to 1e-4
# units — bit-stable at any partitioning, no float sums anywhere. The
# statistics are DECIMAL(38,0) on the Spark side (HUGEINT in DuckDB —
# both exact integer arithmetic): int64 would wrap at Σx ≈ 3e9 events per
# type (sx² term), i.e. within 100 TB reach, and Spark 4's ANSI default
# turns that into a runtime ArithmeticException; 38 digits of headroom
# moves the bound to ~1e17 events per type through the quantized
# expression.
#
# 100 TB shape: the corpus collapses to the (type, minute) rollup in ONE
# aggregate (map-side partials; output is O(types × observed minutes) —
# calendar-bounded, not corpus-bounded); the sufficient statistics are a
# second tiny aggregate over that rollup.


def _register_e32() -> None:
    from pyspark.sql import SparkSession

    from spark_streaming_logservice_spark.registry import query
    from spark_streaming_logservice_spark.tables import load_table

    oracle = """
    WITH m AS (
      SELECT event_type, date_trunc('minute', ts) AS minute,
             count(*) AS x
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(x * x) AS sxx,
             max(x) AS peak
      FROM m GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_minutes,
           CAST(sx AS BIGINT) AS n_events,
           CAST((20000 * sx + n) // (2 * n) AS DOUBLE) / 10000.0
             AS mean_per_minute,
           CAST((20000 * (n * sxx - sx * sx) + n * sx) // (2 * n * sx)
                AS DOUBLE) / 10000.0 AS fano_factor,
           CAST(peak AS BIGINT) AS peak_minute
    FROM st
    ORDER BY event_type
    """

    @query("e32_burstiness_fano", oracle=oracle)
    def e32_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
        e = load_table(spark, sf_dir, "events")
        m = e.groupBy(
            "event_type",
            F.date_trunc("minute", "ts")
            .cast("timestamp_ntz")
            .alias("minute"),
        ).agg(F.count(F.lit(1)).alias("x"))
        dec = "decimal(38,0)"
        st = m.groupBy("event_type").agg(
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum(F.col("x").cast(dec)).cast(dec).alias("sx"),
            F.sum(F.col("x").cast(dec) * F.col("x").cast(dec))
            .cast(dec)
            .alias("sxx"),
            F.max("x").alias("peak"),
        )
        return st.select(
            "event_type",
            F.col("n").cast("bigint").alias("n_minutes"),
            F.col("sx").cast("bigint").alias("n_events"),
            (
                F.expr("(20000 * sx + n) DIV (2 * n)").cast("double")
                / F.lit(10000.0)
            ).alias("mean_per_minute"),
            (
                F.expr(
                    "(20000 * (n * sxx - sx * sx) + n * sx) DIV (2 * n * sx)"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("fano_factor"),
            F.col("peak").cast("bigint").alias("peak_minute"),
        ).orderBy("event_type")


_register_e32()


# --- e33: sessionized funnel attribution (native session_window) -------------
# The missing family (r13 VERDICT item 7): conversion funnel measured PER
# SESSION (30-min inactivity gap, Spark's native session_window — the
# same operator the streaming face runs with a watermark) and attributed
# to the session's LANDING event type (first-touch attribution). A
# session "converts" when a purchase happens strictly AFTER its first
# view in the session's (ts, event_id) order — order inside the session
# matters, which is what distinguishes this from e08's per-user 7-day
# funnel. Arithmetic follows the integer-unit discipline: revenue sums as
# floor(value*1e6+0.5) BIGINT micro-units, the conversion rate derives by
# exact integer division; the oracle replays sessionization as
# gaps-and-islands (l11's proven equivalence, same `>` gap convention —
# Spark merges at an exactly-30-min gap) and the same integer arithmetic.
# 100 TB shape: ONE user-keyed shuffle for sessionization (sessions are
# user-local), then an O(event_types)-key rollup; no window over the
# corpus, no join at all.

@query(
    "e33_session_funnel_attribution",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    ), per_session AS (
      SELECT user_id, sid,
             (min({'t': ts, 'i': event_id, 'e': event_type})).e AS landing,
             min(CASE WHEN event_type = 'view'
                      THEN {'t': ts, 'i': event_id} END) AS first_view,
             max(CASE WHEN event_type = 'purchase'
                      THEN {'t': ts, 'i': event_id} END) AS last_purchase,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
                      ELSE 0 END) AS rev_micro
      FROM sess GROUP BY user_id, sid
    ), flagged AS (
      SELECT landing,
             CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END AS has_view,
             CASE WHEN first_view IS NOT NULL AND last_purchase IS NOT NULL
                       AND last_purchase > first_view
                  THEN 1 ELSE 0 END AS converted,
             rev_micro
      FROM per_session
    )
    SELECT landing,
           count(*) AS n_sessions,
           CAST(SUM(has_view) AS BIGINT) AS n_view_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((2 * 10000 * SUM(converted) + count(*))
                // (2 * count(*)) AS BIGINT) / 10000.0 AS conv_rate,
           CAST(SUM(CASE WHEN converted = 1 THEN rev_micro ELSE 0 END)
                AS BIGINT) / 1000000.0 AS conv_revenue
    FROM flagged
    GROUP BY landing
    ORDER BY landing
    """,
)
def e33_session_funnel_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    per_session = e.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(*session_funnel_aggs())
    return funnel_serving(funnel_partials(per_session)).orderBy("landing")


def session_funnel_aggs() -> list:
    """The per-session aggregate battery — shared verbatim by the batch
    query above and the streaming face (streaming/funnel.py runs the SAME
    exprs under session_window + watermark, so stream==batch is a property
    of one expression list, not two implementations)."""
    order_key = F.struct(F.col("ts").alias("t"), F.col("event_id").alias("i"))
    return [
        F.min_by("event_type", order_key).alias("landing"),
        F.min(
            F.when(F.col("event_type") == "view", order_key)
        ).alias("first_view"),
        F.max(
            F.when(F.col("event_type") == "purchase", order_key)
        ).alias("last_purchase"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("rev_micro"),
    ]


def funnel_partials(per_session: DataFrame) -> DataFrame:
    """Per-landing ADDITIVE partials of finalized sessions — the exact
    decomposable shape merge_additive's sum-combiner needs, so the
    streaming store accumulates these across micro-batches."""
    converted = (
        F.col("first_view").isNotNull()
        & F.col("last_purchase").isNotNull()
        & (F.col("last_purchase") > F.col("first_view"))
    )
    flagged = per_session.select(
        "landing",
        F.when(F.col("first_view").isNotNull(), 1).otherwise(0)
        .alias("has_view"),
        F.when(converted, 1).otherwise(0).alias("converted"),
        "rev_micro",
    )
    return flagged.groupBy("landing").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("has_view").cast("bigint").alias("n_view_sessions"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.sum(
            F.when(F.col("converted") == 1, F.col("rev_micro"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("conv_rev_micro"),
    )


def funnel_serving(partials: DataFrame) -> DataFrame:
    """Derive the reported metrics from the additive counters by exact
    integer arithmetic — applied identically to the batch partials and to
    the streaming store's merged state."""
    return partials.select(
        "landing",
        "n_sessions",
        "n_view_sessions",
        "n_converted",
        (
            F.expr(
                "(2 * 10000 * n_converted + n_sessions)"
                " div (2 * n_sessions)"
            ).cast("bigint")
            / F.lit(1e4)
        ).alias("conv_rate"),
        (F.col("conv_rev_micro") / F.lit(1e6)).alias("conv_revenue"),
    )
