"""Training-data pipeline operators: deterministic sampling / splits /
mixture weighting / sequence packing, plus the two advanced join shapes a
log-analytics engine needs (as-of join, bucketed range join).

Everything here is hash-deterministic (md5, never builtin ``hash`` or RNG) so
results are reproducible across engines, processes, and restarts — the same
property the sink's shard routing relies on — and every operator is fully
SQL-expressible, so each carries a DuckDB oracle for the driver's hash check.

Scale notes (100 TB):
- Sampling/split/mixture are stateless row-local filters on an md5 prefix —
  they run inside whole-stage codegen on the scan, shuffle nothing, and
  sample rates hold per-partition without coordination.
- Sequence packing uses one window (partitionBy lang, orderBy doc_id): a
  single shuffle by lang; bin assignment is a running sum, no iteration.
- The as-of join is one window over a union — NOT a per-row subquery; state
  is one column carried along the sort. This is the standard Spark rewrite
  of ``ASOF JOIN`` (which Catalyst lacks).
- The range join pre-buckets both sides on coarse time buckets and
  equi-joins bucket-to-bucket with a residual predicate, avoiding the
  BroadcastNestedLoopJoin a naive inequality join plans — candidate pairs
  scale with bucket width, not |events| × |windows|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

PACK_BUDGET = 2048  # tokens per packed context window


def hash_bucket(prefix: str, key: Column) -> Column:
    """First md5 hex byte of ``prefix:key`` as 0..255 — a deterministic,
    engine-portable uniform bucket (DuckDB: ascii-compatible via substr)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix + ":"), key.cast("string"))), 1, 2),
        16,
        10,
    ).cast("int")


def sample_deterministic(df: DataFrame, key: Column, rate_256: int, salt: str) -> DataFrame:
    """Keep rows whose md5 bucket < rate_256 (rate = rate_256/256)."""
    return df.where(hash_bucket(salt, key) < rate_256)


# --- p01: deterministic stratified sample ----------------------------------

@query(
    "p01_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE ('0x' || substr(md5('p01:' || CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER < 64
    ORDER BY doc_id
    """,
)
def p01_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~25% doc sample, reproducible byte-for-byte anywhere: membership is a
    pure function of doc_id. The full sample (not an aggregate) goes through
    the driver's hash check."""
    d = load_table(spark, sf_dir, "documents")
    return (
        sample_deterministic(d, F.col("doc_id"), 64, "p01")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


# --- p02: train/test split ---------------------------------------------------

@query(
    "p02_train_test_split",
    oracle="""
    SELECT lang,
           CASE WHEN ('0x' || substr(md5('p02:' || CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER < 230
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
    FROM documents
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def p02_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~90/10 split keyed on doc_id. doc_id_sum pins the exact membership of
    each side, not just its size."""
    d = load_table(spark, sf_dir, "documents")
    split = F.when(hash_bucket("p02", F.col("doc_id")) < 230, "train").otherwise("test")
    return (
        d.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars_total"),
            F.sum("doc_id").alias("doc_id_sum"),
        )
        .orderBy("lang", "split")
    )


# --- p03: sequence packing ---------------------------------------------------

@query(
    "p03_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM documents
    ), packed AS (
      SELECT lang, n_tok,
             CAST(floor(
               CAST(coalesce(sum(n_tok) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
               / {PACK_BUDGET}) AS BIGINT) AS bin
      FROM toks
    )
    SELECT lang, bin,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM packed
    GROUP BY lang, bin
    ORDER BY lang, bin
    """,
)
def p03_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~PACK_BUDGET-token context windows per language:
    bin = floor(exclusive-prefix-sum / budget) over a deterministic doc order
    — contiguous packing as one window + one aggregation, no iteration. (A
    bin may overflow by at most one document, like the rate limiter's
    whole-bucket overshoot; an exact first-fit would serialize.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "bin",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)).cast("double") / PACK_BUDGET
        ),
    )
    return (
        packed.groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .orderBy("lang", "bin")
    )


# --- p04: mixture weighting --------------------------------------------------

MIXTURE_RATES_256 = {"en": 64, "de": 128, "fr": 128, "es": 192, "zh": 256}


@query(
    "p04_mixture_weights",
    oracle="""
    WITH rates AS (
      SELECT * FROM (VALUES ('en', 64), ('de', 128), ('fr', 128),
                            ('es', 192), ('zh', 256)) AS t(lang, rate)
    )
    SELECT d.lang,
           count(*) AS n_total,
           count(*) FILTER (
             WHERE ('0x' || substr(md5('p04:' || CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER
                   < coalesce(r.rate, 256)
           ) AS n_kept
    FROM documents d LEFT JOIN rates r ON d.lang = r.lang
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def p04_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source downsampling to a target data mixture: each language keeps
    a deterministic hash fraction (en 25%, de/fr 50%, es 75%, zh 100%).
    Rates ride a broadcast map column, so the filter stays row-local."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        F.create_map(
            *[x for k, v in MIXTURE_RATES_256.items() for x in (F.lit(k), F.lit(v))]
        )[F.col("lang")],
        F.lit(256),
    )
    kept = hash_bucket("p04", F.col("doc_id")) < rate
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(kept, 1)).alias("n_kept"),
        )
        .orderBy("lang")
    )


# --- j01: as-of join ---------------------------------------------------------

@query(
    "j01_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    ORDER BY p.event_id
    LIMIT 300
    """,
)
def j01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (every purchase ← the user's most recent strictly-prior
    click), an operator Spark lacks natively. Rewrite: union both streams,
    one window per user ordered by event time with a strict-past range frame,
    carry the last click timestamp forward — O(n log n) in the sort, one
    shuffle by user_id, no per-row subquery. DuckDB's native ASOF JOIN is the
    oracle."""
    e = load_table(spark, sf_dir, "events")
    ev = e.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)  # strictly earlier
    )
    asof = ev.withColumn(
        "last_click_us",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts_us")), ignorenulls=True
        ).over(w),
    )
    return (
        asof.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            (F.col("ts_us") - F.col("last_click_us")).alias("gap_us"),
        )
        .orderBy("event_id")
        .limit(300)
    )


# --- j04: forward as-of join -------------------------------------------------

@query(
    "j04_asof_forward",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
      FROM events WHERE event_type IN ('error', 'click')
    ), marked AS (
      SELECT event_id, user_id, event_type, ts_us,
             min(CASE WHEN event_type = 'click' THEN ts_us END) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_click_us
      FROM ev
    )
    SELECT event_id, user_id,
           next_click_us - ts_us AS recovery_us
    FROM marked WHERE event_type = 'error'
    ORDER BY event_id
    LIMIT 300
    """,
)
def j04_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: every error ← the user's next strictly-later
    click ("time to recovery"), the mirror of j01's backward lookup.
    DuckDB's native ASOF only looks backward, so BOTH engines run the same
    window rewrite: one user-keyed window ordered by event time with a
    strict-future range frame, min(click ts) over the frame — a single
    shuffle, no join, no per-row subquery. Same 100 TB shape as j01/e09."""
    e = load_table(spark, sf_dir, "events")
    ev = e.where(F.col("event_type").isin("error", "click")).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(1, Window.unboundedFollowing)  # strictly later
    )
    marked = ev.withColumn(
        "next_click_us",
        F.min(
            F.when(F.col("event_type") == "click", F.col("ts_us"))
        ).over(w),
    )
    return (
        marked.where(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            (F.col("next_click_us") - F.col("ts_us")).alias("recovery_us"),
        )
        .orderBy("event_id")
        .limit(300)
    )


# --- j02: bucketed range join ------------------------------------------------

INCIDENT_WINDOW_S = 300  # each error opens a 5-minute incident window


@query(
    "j02_range_join_bucketed",
    oracle=f"""
    WITH windows AS (
      SELECT ts AS w_start, ts + INTERVAL {INCIDENT_WINDOW_S} SECOND AS w_end
      FROM events WHERE event_type = 'error'
    )
    SELECT e.event_type,
           count(DISTINCT e.event_id) AS n_in_incident
    FROM events e JOIN windows w
      ON e.ts >= w.w_start AND e.ts < w.w_end
    WHERE e.event_type <> 'error'
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def j02_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join (events inside any error-incident window)
    executed as a BUCKETED range join: both sides key on coarse time buckets
    of the window width — each window spans ≤2 buckets (explode), each event
    exactly 1 — then a bucket equi-join applies the residual range predicate.
    Catalyst turns a naive t BETWEEN lo AND hi join into
    BroadcastNestedLoopJoin (candidate pairs = |events|×|windows|); bucketing
    makes candidates local to a bucket, the plan a plain hash join that AQE
    can rebalance. Same rewrite the dedup/ANN family uses: bucket first,
    verify the exact predicate inside the bucket."""
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    width_us = INCIDENT_WINDOW_S * 1_000_000
    windows = (
        ev.where(F.col("event_type") == "error")
        .select(
            F.col("ts_us").alias("w_start"),
            (F.col("ts_us") + width_us).alias("w_end"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("w_start") / width_us),
                    F.floor((F.col("w_end") - 1) / width_us),
                )
            ),
        )
    )
    candidates = (
        ev.where(F.col("event_type") != "error")
        .withColumn("bucket", F.floor(F.col("ts_us") / width_us))
        .join(windows, "bucket")
        .where((F.col("ts_us") >= F.col("w_start")) & (F.col("ts_us") < F.col("w_end")))
    )
    return (
        candidates.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n_in_incident"))
        .orderBy("event_type")
    )


# --- p05: curriculum buckets -------------------------------------------------

@query(
    "p05_curriculum_buckets",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ntile(4) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
               AS quartile
      FROM documents
    )
    SELECT lang, quartile,
           count(*) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM ranked
    GROUP BY lang, quartile
    ORDER BY lang, quartile
    """,
)
def p05_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling: per-language difficulty quartiles (n_chars as
    the proxy, doc_id as the deterministic tiebreak) — the bucketing a
    training loader consumes easy-to-hard. One window shuffle by lang, then
    the aggregation reuses the same partitioning."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        d.select("lang", "n_chars", F.ntile(4).over(w).alias("quartile"))
        .groupBy("lang", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "quartile")
    )


# --- p06: mixture upsampling (fractional-epoch materialization) ------------
# p04 *measures* a target mixture by downsampling; a training run also needs
# the opposite: materializing fractional epochs (weight 2.75 = every doc
# twice, plus a deterministic 75% hash slice a third time). Copies carry a
# copy_idx so downstream packing/shuffling can salt on it.

@query(
    "p06_mixture_upsample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             0.5 + (CAST(substr(source, 4) AS INTEGER) % 4) * 0.75 AS wt
      FROM documents
    ), nc AS (
      SELECT doc_id, source,
             CAST(floor(wt) AS INTEGER)
             + CASE WHEN ('0x' || substr(md5('p06:' || CAST(doc_id AS VARCHAR)), 1, 2))::INTEGER
                         < CAST(round((wt - floor(wt)) * 256) AS INTEGER)
                    THEN 1 ELSE 0 END AS n_copies
      FROM w
    )
    SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy_idx
    FROM nc WHERE n_copies >= 1
    ORDER BY doc_id, copy_idx
    LIMIT 300
    """,
)
def p06_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fractional upsampling: source srcN gets weight
    0.5 + (N % 4) * 0.75 ∈ {0.5, 1.25, 2.0, 2.75}; every doc yields
    floor(w) copies plus one more for a hash-selected frac(w) slice.

    Scale shape: row-local expressions end-to-end (bucket test + explode of
    a ≤3-element sequence) — no shuffle at all before the presentation
    sort; the fractions (.0/.25/.5/.75) are exact in binary, so both
    engines compute identical copy counts.
    """
    d = load_table(spark, sf_dir, "documents")
    wt = 0.5 + (F.substring("source", 4, 8).cast("int") % 4) * 0.75
    frac_rate = F.round((wt - F.floor(wt)) * 256).cast("int")
    n_copies = F.floor(wt).cast("int") + F.when(
        hash_bucket("p06", F.col("doc_id")) < frac_rate, 1
    ).otherwise(0)
    return (
        d.select("doc_id", "source", n_copies.alias("n_copies"))
        .where(F.col("n_copies") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(F.lit(1).cast("bigint"), F.col("n_copies").cast("bigint"))
            ).alias("copy_idx"),
        )
        .orderBy("doc_id", "copy_idx")
        .limit(300)
    )


# --- p07: token-balanced output sharding -----------------------------------
# Writing a training corpus as N shards balanced by token count (so every
# data-loader worker reads the same amount of text, not the same number of
# documents). Sorted round-robin: rank docs by token count descending and
# stripe rank mod N — the classic LPT-style approximation, fully
# deterministic and SQL-expressible.

N_OUT_SHARDS = 8


@query(
    "p07_balanced_shards",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tok,
             row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rn
      FROM sized
    )
    SELECT CAST((rn - 1) % {N_OUT_SHARDS} AS INTEGER) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           min(n_tok) AS min_tok,
           max(n_tok) AS max_tok
    FROM ranked
    GROUP BY 1
    ORDER BY shard
    """,
)
def p07_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to N output shards balanced by token count; report
    the per-shard load so the imbalance is auditable.

    Ranking runs through ``distributed_row_number`` — range-partition on
    (n_tok DESC, doc_id), local row_number per range, broadcast prefix-sum
    offsets — so there is NO single-partition global sort anywhere in the
    plan (pinned by test_plans.test_p07_no_global_window); the striping is
    identical to ``row_number() OVER (ORDER BY n_tok DESC, doc_id)``. The
    final per-shard aggregate is O(N) rows.
    """
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias(
            "n_tok"
        ),
    )
    ranked = distributed_row_number(
        sized, [F.desc("n_tok"), F.asc("doc_id")], out="rn"
    )
    return (
        ranked.withColumn("shard", ((F.col("rn") - 1) % N_OUT_SHARDS).cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.min("n_tok").alias("min_tok"),
            F.max("n_tok").alias("max_tok"),
        )
        .orderBy("shard")
    )


def distributed_row_number(
    df: DataFrame,
    sort_cols: list,
    out: str = "rn",
    partitions: int = 0,
    cumsum_col: str | None = None,
    cumsum_out: str = "cum",
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY sort_cols)`` — and
    optionally the running ``sum(cumsum_col)`` over the same order — without
    a single-partition sort; the 100 TB form of p07's ranking and v04's
    coverage cumsum.

    Two passes: (1) range-partition on the sort key so partition i holds
    keys strictly before partition i+1, count rows (and sum ``cumsum_col``)
    per partition — an O(partitions) driver array, same bounded round-trip
    the IVF centroid table uses; (2) local row_number / running sum inside
    each range partition plus the broadcast prefix offsets. Requires the
    sort key to be unique (ties that straddle a range boundary would
    otherwise order arbitrarily — callers append a unique id, as p07 does
    with doc_id and v04 with token).
    """
    n = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # Eagerly materialize the range partitioning BEFORE collecting the
    # per-partition stats: repartitionByRange samples the data to pick its
    # boundaries, and a re-execution in a later job may sample differently —
    # local ranks would then combine with STALE offsets (observed as
    # overlapping/gapped global ranks on double-valued keys). The
    # checkpoint pins one set of boundaries for both the stats job and
    # every downstream use.
    ranged = (
        df.repartitionByRange(int(n), *sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if cumsum_col is not None:
        aggs.append(F.sum(cumsum_col).alias("s"))
    stats = {
        r["__pid"]: r for r in ranged.groupBy("__pid").agg(*aggs).collect()
    }
    row_off, sum_off = {}, {}
    acc_rows, acc_sum = 0, 0
    for pid in sorted(stats):
        row_off[pid] = acc_rows
        acc_rows += stats[pid]["cnt"]
        if cumsum_col is not None:
            sum_off[pid] = acc_sum
            acc_sum += stats[pid]["s"] or 0
    omap = F.create_map(
        *[F.lit(x) for pid in sorted(row_off) for x in (pid, row_off[pid])]
    )
    pw = Window.partitionBy("__pid").orderBy(*sort_cols)
    local = F.row_number().over(pw)
    ranked = ranged.withColumn(out, (local + omap[F.col("__pid")]).cast("long"))
    if cumsum_col is not None:
        smap = F.create_map(
            *[F.lit(x) for pid in sorted(sum_off) for x in (pid, sum_off[pid])]
        )
        local_cum = F.sum(cumsum_col).over(
            pw.rowsBetween(Window.unboundedPreceding, 0)
        )
        ranked = ranked.withColumn(
            cumsum_out, local_cum + smap[F.col("__pid")]
        )
    return ranked.drop("__pid")


# --- j03: interval-overlap join (interval x interval) ----------------------
# j02 joins points into intervals; j03 is the harder shape — two interval
# sets joined on OVERLAP (a_start <= b_end AND b_start <= a_end). Naive
# Catalyst planning for that predicate is a nested-loop join; the bucketed
# rewrite explodes each interval onto coarse time buckets and equi-joins
# bucket-to-bucket, so candidates are local to a bucket.

OVERLAP_BUCKET_US = 3_600 * 1_000_000  # 1h buckets
INCIDENT_HALF_US = 1_800 * 1_000_000   # ±30min incident half-width
INCIDENT_MIN_VALUE = 100.0
DAY_US = 86_400 * 1_000_000


@query(
    "j03_interval_overlap_join",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us
      FROM events
    ), spans AS (
      SELECT user_id, CAST(floor(ts_us / {DAY_US}) AS BIGINT) AS day,
             min(ts_us) AS a_start, max(ts_us) AS a_end
      FROM ev GROUP BY 1, 2
    ), inc AS (
      SELECT event_id AS inc_id,
             ts_us - {INCIDENT_HALF_US} AS i_start,
             ts_us + {INCIDENT_HALF_US} AS i_end
      FROM ev WHERE event_type = 'error' AND value > {INCIDENT_MIN_VALUE}
    )
    SELECT s.user_id, s.day, count(*) AS n_incidents
    FROM spans s JOIN inc i ON s.a_start <= i.i_end AND i.i_start <= s.a_end
    GROUP BY 1, 2
    ORDER BY s.user_id, s.day
    LIMIT 300
    """,
)
def j03_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily activity spans overlapped with high-severity incident
    windows: how many incidents touched each user's active period.

    At 100 TB both interval sets are large (neither broadcasts), so the
    bucket id is the shuffle key: each interval lands on the hour buckets it
    covers, the bucket equi-join localizes candidates, the exact overlap
    predicate filters inside the bucket, and a distinct collapses intervals
    that share several buckets. The oracle states the same join naively —
    correct at test SF, nested-loop at scale — which is exactly the rewrite
    this operator exists to avoid.
    """
    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    spans = ev.groupBy(
        "user_id", F.floor(F.col("ts_us") / DAY_US).cast("bigint").alias("day")
    ).agg(F.min("ts_us").alias("a_start"), F.max("ts_us").alias("a_end"))
    inc = ev.where(
        (F.col("event_type") == "error") & (F.col("value") > INCIDENT_MIN_VALUE)
    ).select(
        F.col("event_id").alias("inc_id"),
        (F.col("ts_us") - INCIDENT_HALF_US).alias("i_start"),
        (F.col("ts_us") + INCIDENT_HALF_US).alias("i_end"),
    )

    def buckets(lo: str, hi: str) -> Column:
        return F.explode(
            F.sequence(
                F.floor(F.col(lo) / OVERLAP_BUCKET_US),
                F.floor(F.col(hi) / OVERLAP_BUCKET_US),
            )
        )

    spans_b = spans.withColumn("bucket", buckets("a_start", "a_end"))
    inc_b = inc.withColumn("bucket", buckets("i_start", "i_end"))
    pairs = (
        spans_b.join(inc_b, "bucket")
        .where(
            (F.col("a_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("a_end"))
        )
        .select("user_id", "day", "inc_id")
        .distinct()
    )
    return (
        pairs.groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_incidents"))
        .orderBy("user_id", "day")
        .limit(300)
    )


# --- p08: deterministic per-group exact-k sample ---------------------------

PER_GROUP_K = 10


@query(
    "p08_pergroup_sample",
    oracle=f"""
    SELECT doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('p08:' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
               ) AS INTEGER) AS rk
        FROM documents
    ) WHERE rk <= {PER_GROUP_K}
    ORDER BY lang, rk
    """,
)
def p08_pergroup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k docs per language, chosen by md5 rank — the deterministic
    equivalent of per-stratum reservoir sampling (same uniform-without-
    replacement distribution, but reproducible across engines and runs).

    Scale: one shuffle keyed by lang; the rank-filter window compiles to
    Spark 4's WindowGroupLimit, which keeps a k-row heap per group on the
    MAP side before the shuffle — so shuffle volume is O(groups × k), not
    O(corpus), even when one language dominates (plan-pinned in
    tests/test_plans.py)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("p08:"), F.col("doc_id").cast("string"))).asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= PER_GROUP_K)
        .orderBy("lang", "rk")
    )


# --- p09: Z-order (Morton) layout key --------------------------------------

Z_BITS = 16


def _interleave_expr(a: str, b: str, bits: int = Z_BITS) -> str:
    """SQL expression interleaving the low ``bits`` of two ints: bit i of
    ``a`` lands at 2i, of ``b`` at 2i+1 — the Morton / Z-order curve key.
    Flat shift-and-mask sum (codegen-resident; same arithmetic runs in
    DuckDB exactly, 64-bit throughout)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({a} >> {i}) & 1)) * {1 << (2 * i)})")
        terms.append(f"(((({b} >> {i}) & 1)) * {1 << (2 * i + 1)})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@query(
    "p09_zorder_key",
    oracle=f"""
    SELECT event_id,
           CAST(user_id & 65535 AS BIGINT) AS a,
           CAST(CAST(floor(epoch(ts)) AS BIGINT) & 65535 AS BIGINT) AS b,
           {_interleave_expr('(user_id & 65535)', '(CAST(floor(epoch(ts)) AS BIGINT) & 65535)')} AS zval
    FROM events
    WHERE event_id < 500
    ORDER BY zval, event_id
    """,
)
def p09_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, event-time): writing
    files sorted by zval gives every file a narrow min/max envelope on BOTH
    dimensions, so parquet row-group stats prune scans filtered on either —
    the multi-dimensional analog of partition pruning (Delta/Iceberg
    OPTIMIZE ZORDER does exactly this).

    Scale shape: the key is pure row-local bit arithmetic inside
    whole-stage codegen; the layout job is one range-partitioned sort by
    zval (repartitionByRange + sortWithinPartitions — no global sort
    barrier). Correctness of the interleave is oracle-exact; the locality
    property is pinned in tests/test_pipeline_ops2.py."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    a = F.col("user_id").bitwiseAND(F.lit(65535)).cast("bigint")
    b = (
        F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000)
    ).cast("bigint").bitwiseAND(F.lit(65535))
    keyed = e.select(
        "event_id",
        a.alias("a"),
        b.alias("b"),
        F.expr(_interleave_expr("(user_id & 65535)", "(CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000 AS BIGINT) & 65535)")).alias("zval"),
    )
    return keyed.orderBy("zval", "event_id")


# --- p10: weighted sampling without replacement -----------------------------
# Efraimidis–Spirakis (IPL 2006) exponential-key reservoir: each row draws a
# key ln(u)/w (u uniform, w its weight) and the k LARGEST keys form an exact
# weighted sample without replacement. Distributed shape: the key is a
# row-local expression and the top-k is TakeOrdered (per-partition heap +
# driver merge of k) — no global sort, no shuffle of the corpus, and the
# sample is a pure function of doc_id so any engine reproduces it
# byte-for-byte. Weight here = n_chars (longer docs proportionally more
# likely — the shape of quality- or token-weighted subset selection).

@query(
    "p10_weighted_sample",
    oracle="""
    SELECT doc_id, n_chars,
           ln((('0x' || substr(md5('p10:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
              / 4294967296.0) / n_chars AS es_key
    FROM documents
    WHERE n_chars > 0
    ORDER BY es_key DESC, doc_id
    LIMIT 100
    """,
)
def p10_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("p10:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + 1) / F.lit(4294967296.0)  # (0, 1]: +1 avoids ln(0)
    key = F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(100)
    )


# --- p11: Neyman allocation (variance-proportional stratified budgets) ------
# Optimal stratified sampling allocates budget ∝ N_h·σ_h (Neyman 1934): a
# stratum that is big AND internally varied gets more of the sample. Shape:
# one lang-keyed aggregate (sums, not avg — σ from Σx/Σx² keeps both engines
# on the identical closed form; all inputs are integers < 2^53 so the double
# sums are exact), then a 1-row scalar total broadcast back. The corpus is
# read once; everything downstream is O(strata).

@query(
    "p11_neyman_allocation",
    oracle="""
    WITH st AS (
      SELECT lang,
             count(*) AS n_docs,
             sum(CAST(n_chars AS DOUBLE)) AS s1,
             sum(CAST(n_chars AS DOUBLE) * n_chars) AS s2
      FROM documents GROUP BY lang
    ), sig AS (
      SELECT lang, n_docs,
             sqrt(s2 / n_docs - (s1 / n_docs) * (s1 / n_docs)) AS sigma
      FROM st
    ), tot AS (
      SELECT sum(n_docs * sigma) AS t FROM sig
    )
    SELECT lang, n_docs,
           round(sigma, 4) AS sigma,
           CAST(floor(1000 * n_docs * sigma / t) AS BIGINT) AS alloc
    FROM sig CROSS JOIN tot
    ORDER BY lang
    """,
)
def p11_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sample-budget allocation for a 1000-doc budget,
    n_h ∝ N_h·σ_h over document length."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", F.col("n_chars").cast("double").alias("x")
    )
    st = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    sig = st.select(
        "lang",
        "n_docs",
        F.sqrt(
            F.col("s2") / F.col("n_docs")
            - (F.col("s1") / F.col("n_docs")) * (F.col("s1") / F.col("n_docs"))
        ).alias("sigma"),
    )
    tot = sig.agg(F.sum(F.col("n_docs") * F.col("sigma")).alias("t"))
    return (
        sig.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.round("sigma", 4).alias("sigma"),
            F.floor(1000 * F.col("n_docs") * F.col("sigma") / F.col("t"))
            .cast("long")
            .alias("alloc"),
        )
        .orderBy("lang")
    )


# --- p12: deterministic k-fold cross-validation assignment ------------------
# p02's train/test split generalized: fold = md5-bucket % k, engine-portable
# and RNG-free, so every engine (and every re-run) agrees on membership.
# Row-local assignment, one fold-keyed count agg; membership is pinned the
# same way p02 pins it — per-fold doc_id sums, so a single misassigned row
# shifts a fold's checksum.

K_FOLDS = 5


@query(
    "p12_kfold_assignment",
    oracle=f"""
    SELECT ('0x' || substr(md5('p12:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             % {K_FOLDS} AS fold,
           count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM documents
    GROUP BY fold
    ORDER BY fold
    """,
)
def p12_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("p12:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % K_FOLDS
    ).alias("fold")
    return (
        d.select(fold, "doc_id", "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("fold")
    )


# --- p13: temperature-scaled mixture weights (N^alpha sampling) -------------
# The multilingual-corpus sampling rule (mBERT/XLM-R): sample language h
# with probability ∝ N_h^α, α < 1, boosting low-resource strata. Same
# O(strata) shape as p11: one lang-keyed count (the only corpus work), a
# scalar normalizer broadcast back, closed-form weights both engines
# compute identically.

ALPHA_TEMP = 0.7


@query(
    "p13_temperature_mixture",
    oracle=f"""
    WITH st AS (
      SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(pow(CAST(n_docs AS DOUBLE), {ALPHA_TEMP})) AS z,
             CAST(sum(n_docs) AS BIGINT) AS n_total
      FROM st
    )
    SELECT lang, n_docs,
           round(n_docs / CAST(n_total AS DOUBLE), 6) AS raw_share,
           round(pow(CAST(n_docs AS DOUBLE), {ALPHA_TEMP}) / z, 6) AS temp_share,
           round(pow(CAST(n_docs AS DOUBLE), {ALPHA_TEMP}) / z
                 / (n_docs / CAST(n_total AS DOUBLE)), 4) AS boost
    FROM st CROSS JOIN tot
    ORDER BY lang
    """,
)
def p13_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("lang")
    st = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = st.agg(
        F.sum(F.pow(F.col("n_docs").cast("double"), ALPHA_TEMP)).alias("z"),
        F.sum("n_docs").alias("n_total"),
    )
    p_temp = F.pow(F.col("n_docs").cast("double"), ALPHA_TEMP) / F.col("z")
    p_raw = F.col("n_docs") / F.col("n_total").cast("double")
    return (
        st.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.round(p_raw, 6).alias("raw_share"),
            F.round(p_temp, 6).alias("temp_share"),
            F.round(p_temp / p_raw, 4).alias("boost"),
        )
        .orderBy("lang")
    )


# --- p14: group-aware train/test split (leakage prevention) -----------------
# p02 splits DOCUMENTS; evaluation hygiene for user-generated data demands
# splitting by GROUP (all of a user's events land on one side, or the test
# set leaks the train users' behavior). Assignment hashes the group key, so
# it is row-local on each event — no join against a user table — and
# engine-portable. The output pins both the split sizes and the leakage
# invariant itself (n_users_both_sides is part of the hashed result, so a
# leaky split cannot pass).

@query(
    "p14_group_split",
    oracle="""
    WITH assigned AS (
      SELECT user_id, event_id,
             CASE WHEN ('0x' || substr(md5('p14:' || CAST(user_id AS VARCHAR)), 1, 2))::INTEGER
                       < 204 THEN 'train' ELSE 'test' END AS split
      FROM events
    ), sides AS (
      SELECT split,
             count(*) AS n_events,
             count(DISTINCT user_id) AS n_users,
             CAST(sum(user_id) AS BIGINT) AS user_checksum
      FROM assigned GROUP BY split
    ), leak AS (
      SELECT count(*) AS n_users_both_sides FROM (
        SELECT user_id FROM assigned GROUP BY user_id
        HAVING count(DISTINCT split) > 1
      )
    )
    SELECT s.split, s.n_events, s.n_users, s.user_checksum, l.n_users_both_sides
    FROM sides s CROSS JOIN leak l
    ORDER BY s.split
    """,
)
def p14_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    assigned = e.select(
        "user_id",
        F.when(hash_bucket("p14", F.col("user_id")) < 204, "train")
        .otherwise("test")
        .alias("split"),
    )
    sides = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("user_id").alias("user_checksum"),
    )
    leak = (
        assigned.groupBy("user_id")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("n_users_both_sides"))
    )
    return (
        sides.crossJoin(F.broadcast(leak))
        .select("split", "n_events", "n_users", "user_checksum", "n_users_both_sides")
        .orderBy("split")
    )


# --- p15: end-to-end curation manifest --------------------------------------
# The integration query: one pass from raw documents to a training-shard
# manifest — exact-dup keeper (first doc_id per content digest), quality
# gate (token-count and mean-token-length bounds, the t02 family), then
# deterministic shard assignment — composed exactly the way the individual
# operators run (digest window = d01's keeper, md5 bucket = p01's
# discipline). Shape: one digest-keyed window shuffle + one shard-keyed
# aggregate; everything else row-local. Per-shard id checksums pin every
# membership decision, so a wrong dedup keeper, a quality off-by-one, or a
# routing change all fail the hash.

N_MANIFEST_SHARDS = 8


@query(
    "p15_curation_manifest",
    oracle=f"""
    WITH keep AS (
      SELECT doc_id, n_chars, text,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ), quality AS (
      SELECT doc_id, n_chars,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM keep WHERE rn = 1
    ), gated AS (
      SELECT doc_id, n_chars,
             ('0x' || substr(md5('p15:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
               % {N_MANIFEST_SHARDS} AS shard
      FROM quality
      WHERE n_tok >= 10
        AND n_chars / CAST(n_tok AS DOUBLE) BETWEEN 2.0 AND 12.0
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum
    FROM gated
    GROUP BY shard
    ORDER BY shard
    """,
)
def p15_curation_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .withColumn(
            "n_tok", F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        )
    )
    gated = kept.where(
        (F.col("n_tok") >= 10)
        & (F.col("n_chars") / F.col("n_tok").cast("double")).between(2.0, 12.0)
    ).select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("p15:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % N_MANIFEST_SHARDS
        ).alias("shard"),
        "doc_id",
        "n_chars",
    )
    return (
        gated.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("shard")
    )


# --- p16: deterministic mixture interleave schedule -------------------------
# Training runs don't just SELECT a mixture (p04/p06) — they need a global
# feed ORDER that interleaves sources proportionally to weight, stably and
# reproducibly, so step k of the run always sees the same document. The
# stride schedule does this with no RNG: source position p (1-based, in a
# deterministic per-source order) is fed at key (p - 0.5) / weight; sorting
# by key yields each source at a rate proportional to its weight
# (weight 3 appears 3× as often as weight 1 in any key interval).
#
# 100 TB shape: the per-source position is a source-partitioned window
# (bounded per task, never a global window); the schedule key is row-local;
# the global head is TakeOrdered (k rows to the driver, no full sort). The
# full materialized schedule would be written out range-partitioned by key
# (distributed_row_number's two-pass discipline); the query exposes the
# head, which is what a resume-from-step-0 consumer reads first.

SCHEDULE_HEAD = 60


@query(
    "p16_mixture_schedule",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             1 + CAST(substr(source, 4) AS INTEGER) % 3 AS wt
      FROM documents
    ), pos AS (
      SELECT doc_id, source, wt,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS p
      FROM w
    )
    SELECT doc_id, source,
           round((p - 0.5) / wt, 6) AS sched_key,
           CAST(row_number() OVER (ORDER BY round((p - 0.5) / wt, 6), doc_id)
                AS INTEGER) AS step
    FROM pos
    ORDER BY step
    LIMIT {SCHEDULE_HEAD}
    """,
)
def p16_mixture_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First {k} steps of the stride-interleaved mixture schedule with
    source weights 1..3 derived from the source id (src<n> → 1 + n%3)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    wt = 1 + F.substring("source", 4, 10).cast("int") % 3
    pos = d.select(
        "doc_id",
        "source",
        wt.alias("wt"),
        F.row_number()
        .over(Window.partitionBy("source").orderBy("doc_id"))
        .alias("p"),
    )
    keyed = pos.select(
        "doc_id",
        "source",
        F.round((F.col("p") - 0.5) / F.col("wt"), 6).alias("sched_key"),
    )
    head = keyed.orderBy("sched_key", "doc_id").limit(SCHEDULE_HEAD)
    # step numbering only over the k-row head (tiny ordered window)
    return head.select(
        "doc_id",
        "source",
        "sched_key",
        F.row_number()
        .over(Window.orderBy("sched_key", "doc_id"))
        .cast("int")
        .alias("step"),
    ).orderBy("step")


# --- j05: nearest-event (bidirectional as-of) join ---------------------------

NEAREST_TOLERANCE_US = 1_800_000_000  # ±30 min


@query(
    "j05_nearest_event_join",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
      FROM events WHERE event_type IN ('purchase', 'click')
    ), marked AS (
      SELECT event_id, user_id, event_type, ts_us,
             max(CASE WHEN event_type = 'click' THEN ts_us END) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_click_us,
             min(CASE WHEN event_type = 'click' THEN ts_us END) OVER (
               PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS next_click_us
      FROM ev
    ), scored AS (
      SELECT event_id, user_id,
             CASE
               WHEN prev_click_us IS NOT NULL AND (next_click_us IS NULL
                    OR ts_us - prev_click_us <= next_click_us - ts_us)
                 THEN prev_click_us - ts_us
               ELSE next_click_us - ts_us
             END AS gap_us
      FROM marked WHERE event_type = 'purchase'
    )
    SELECT event_id, user_id, gap_us,
           CASE WHEN gap_us < 0 THEN 'back' ELSE 'fwd' END AS direction
    FROM scored
    WHERE abs(gap_us) <= {NEAREST_TOLERANCE_US}
    ORDER BY event_id
    LIMIT 300
    """,
)
def j05_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor temporal join: each purchase ← the user's closest
    click in EITHER direction within ±30 min (ties break backward — the
    strictly-earlier frame). Neither engine has a native bidirectional
    ASOF, so both run the identical two-frame window rewrite: ONE user-
    keyed window shuffle carries both the carry-forward max and the
    strict-future min — still a single shuffle, no join, no per-row
    subquery (same 100 TB shape as j01/j04/e09)."""
    e = load_table(spark, sf_dir, "events")
    ev = e.where(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_us"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(1, Window.unboundedFollowing)
    )
    marked = ev.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.max(click_ts).over(wb).alias("prev_click_us"),
        F.min(click_ts).over(wf).alias("next_click_us"),
    )
    back_wins = F.col("prev_click_us").isNotNull() & (
        F.col("next_click_us").isNull()
        | (
            F.col("ts_us") - F.col("prev_click_us")
            <= F.col("next_click_us") - F.col("ts_us")
        )
    )
    gap = F.when(
        back_wins, F.col("prev_click_us") - F.col("ts_us")
    ).otherwise(F.col("next_click_us") - F.col("ts_us"))
    return (
        marked.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            gap.alias("gap_us"),
            F.when(gap < 0, "back").otherwise("fwd").alias("direction"),
        )
        .where(F.abs(F.col("gap_us")) <= NEAREST_TOLERANCE_US)
        .orderBy("event_id")
        .limit(300)
    )


# --- p17: leakage-free split under near-duplication --------------------------
# A train/test split that hashes DOC ids leaks: near-duplicate documents land
# on both sides and the test set is contaminated (the d07 decontamination
# problem, created by the split itself). The fix is splitting by NEAR-DUP
# CLUSTER: hash the cluster id (singletons hash their own doc_id), so every
# cluster lands wholly on one side. The n_leaky_clusters column pins the
# zero-leakage invariant INTO the hashed result, not just a test.
#
# 100 TB shape: cluster assignment is the d08 chain (bucketed LSH pairs +
# O(log²n) star rounds over the pair set); the corpus-side work after that
# is one left join on doc_id + row-local md5 side assignment + one grouped
# count. The leak check is a group-by over O(clustered docs).

P17_TRAIN_RATE_256 = 204  # ≈80% train


def _register_p17() -> None:
    from spark_streaming_logservice_spark.operators.dedup import (
        _duckdb_cluster_sql,
        cluster_assignments,
    )

    oracle = _duckdb_cluster_sql(
        f"""
    , grp AS (
      SELECT d.doc_id, d.source, coalesce(a.cluster_id, d.doc_id) AS gk
      FROM documents d LEFT JOIN assign a ON a.doc_id = d.doc_id
    ), sided AS (
      SELECT doc_id, source, gk,
             ('0x' || substr(md5('p17:' || CAST(gk AS VARCHAR)), 1, 2))::INTEGER
               < {P17_TRAIN_RATE_256} AS is_train
      FROM grp
    ), leaky AS (
      SELECT count(*) AS n_leaky_clusters FROM (
        SELECT gk FROM sided GROUP BY gk
        HAVING count(DISTINCT is_train) > 1
      )
    )
    SELECT source,
           count(*) FILTER (WHERE is_train) AS n_train,
           count(*) FILTER (WHERE NOT is_train) AS n_test,
           l.n_leaky_clusters
    FROM sided CROSS JOIN leaky l
    GROUP BY source, l.n_leaky_clusters
    ORDER BY source
    """
    )

    @query("p17_leakage_free_split", oracle=oracle)
    def p17_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        # the assignment is pair-bounded (orders of magnitude below the
        # corpus) — and shared session-wide via the pinned cache, so the
        # LSH+CC chain runs ONCE per application+corpus, not once per
        # consumer (unpinned, the leak check and the split each re-ran
        # the whole minhash pipeline: 147s → ~1× d08's cost)
        assign = cluster_assignments(spark, sf_dir)
        grp = d.join(assign, "doc_id", "left").select(
            "doc_id",
            "source",
            F.coalesce("cluster_id", "doc_id").alias("gk"),
        )
        sided = grp.select(
            "doc_id",
            "source",
            (hash_bucket("p17", F.col("gk")) < P17_TRAIN_RATE_256).alias(
                "is_train"
            ),
        )
        # leak check needs only clustered docs (singletons are 1-row groups
        # and cannot straddle): run it over the pinned assignment, never
        # the corpus
        leaky = (
            assign.select(
                "cluster_id",
                (
                    hash_bucket("p17", F.col("cluster_id"))
                    < P17_TRAIN_RATE_256
                ).alias("is_train"),
            )
            .groupBy("cluster_id")
            .agg(F.countDistinct("is_train").alias("nsides"))
            .agg(
                F.count(F.when(F.col("nsides") > 1, 1)).alias(
                    "n_leaky_clusters"
                )
            )
        )
        return (
            sided.groupBy("source")
            .agg(
                F.count(F.when(F.col("is_train"), 1)).alias("n_train"),
                F.count(F.when(~F.col("is_train"), 1)).alias("n_test"),
            )
            .join(F.broadcast(leaky))
            .select("source", "n_train", "n_test", "n_leaky_clusters")
            .orderBy("source")
        )


_register_p17()


# --- p18: dataset card (per-source release report) ---------------------------
# The summary block a dataset release ships: volume, token mass, language
# mix, duplication, and quality-gate pass rate per source — every number a
# consumer checks before mixing the source into a run. One tokenizing scan
# feeds the token/quality columns; duplication joins the corpus-wide digest
# counts (d01's relation) back doc-keyed; everything aggregated is a count
# or an integer sum, so the card is bit-deterministic at any partitioning.

CARD_MIN_TOKENS = 5
CARD_MAX_TOKENS = 5000


@query(
    "p18_dataset_card",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, lang, n_chars,
             len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS n_tokens,
             md5(text) AS digest
      FROM documents
    ), dupes AS (
      SELECT digest, count(*) AS dn FROM base GROUP BY digest
    ), langs AS (
      SELECT source, lang, count(*) AS ln,
             row_number() OVER (PARTITION BY source
                                ORDER BY count(*) DESC, lang) AS lrk
      FROM base GROUP BY source, lang
    )
    SELECT b.source,
           count(*) AS n_docs,
           CAST(sum(b.n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(b.n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT b.lang) AS n_langs,
           any_value((SELECT lang FROM langs l
                      WHERE l.source = b.source AND l.lrk = 1))
             AS majority_lang,
           count(*) FILTER (WHERE d.dn > 1) AS n_duplicated,
           round(count(*) FILTER (WHERE d.dn > 1)
                 / CAST(count(*) AS DOUBLE), 4) AS dup_rate,
           count(*) FILTER (WHERE b.n_tokens BETWEEN {CARD_MIN_TOKENS}
                            AND {CARD_MAX_TOKENS}) AS n_quality_pass,
           round(count(*) FILTER (WHERE b.n_tokens BETWEEN {CARD_MIN_TOKENS}
                 AND {CARD_MAX_TOKENS}) / CAST(count(*) AS DOUBLE), 4)
             AS quality_pass_rate
    FROM base b JOIN dupes d ON d.digest = b.digest
    GROUP BY b.source
    ORDER BY b.source
    """,
)
def p18_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("n_tokens"),
        F.md5("text").alias("digest"),
    )
    dupes = base.groupBy("digest").agg(F.count(F.lit(1)).alias("dn"))
    lw = Window.partitionBy("source").orderBy(F.desc("ln"), F.asc("lang"))
    majority = (
        base.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("ln"))
        .withColumn("lrk", F.row_number().over(lw))
        .where(F.col("lrk") == 1)
        .select("source", F.col("lang").alias("majority_lang"))
    )
    quality = F.col("n_tokens").between(CARD_MIN_TOKENS, CARD_MAX_TOKENS)
    return (
        base.join(dupes, "digest")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            F.count(F.when(F.col("dn") > 1, 1)).alias("n_duplicated"),
            F.round(
                F.count(F.when(F.col("dn") > 1, 1))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("dup_rate"),
            F.count(F.when(quality, 1)).alias("n_quality_pass"),
            F.round(
                F.count(F.when(quality, 1))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("quality_pass_rate"),
        )
        .join(F.broadcast(majority), "source")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "total_chars",
            "n_langs",
            "majority_lang",
            "n_duplicated",
            "dup_rate",
            "n_quality_pass",
            "quality_pass_rate",
        )
        .orderBy("source")
    )


# --- p19: curriculum ordering (difficulty-ranked shard packing) --------------
# Curriculum learning wants training shards ordered easy-to-hard: rank the
# corpus by a difficulty key (t02's quality score, descending = easiest
# first, doc_id tiebreak) and pack consecutive ranks into fixed-size
# shards. The global rank is the two-pass range-partitioned
# distributed_row_number — NEVER a partition-less window (O(corpus) rows
# through one task at 100 TB). The report aggregates per shard with
# integer 4-dp quality units, so the hash is partition-order-stable.

P19_SHARD_DOCS = 256


def _register_p19() -> None:
    from spark_streaming_logservice_spark.operators.text import QUALITY_SQL

    oracle = f"""
    WITH q AS (
      SELECT doc_id, {QUALITY_SQL} AS quality FROM documents
    ), r AS (
      SELECT doc_id, quality,
             row_number() OVER (ORDER BY quality DESC, doc_id) AS rk
      FROM q
    )
    SELECT CAST((rk - 1) // {P19_SHARD_DOCS} AS INTEGER) AS shard,
           count(*) AS n_docs,
           CAST(min(rk) AS BIGINT) AS first_rank,
           CAST(max(rk) AS BIGINT) AS last_rank,
           CAST(sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS q_sum_4dp
    FROM r
    GROUP BY shard
    ORDER BY shard
    """

    @query("p19_curriculum_order", oracle=oracle)
    def p19_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spark_streaming_logservice_spark.operators.text import (
            quality_expr,
            spread_rowlocal,
        )

        d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
        scored = d.select("doc_id", quality_expr().alias("quality"))
        ranked = distributed_row_number(
            scored, [F.desc("quality"), F.asc("doc_id")], out="rk"
        )
        return (
            ranked.groupBy(
                F.floor((F.col("rk") - 1) / P19_SHARD_DOCS)
                .cast("int")
                .alias("shard")
            )
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("rk").alias("first_rank"),
                F.max("rk").alias("last_rank"),
                F.sum(
                    F.floor(F.col("quality") * 10000 + 0.5).cast("bigint")
                ).alias("q_sum_4dp"),
            )
            .orderBy("shard")
        )


_register_p19()


# --- p20: corpus snapshot diff (dataset versioning report) -------------------
# "What changed between corpus v1 and v2?" — the release-gate report every
# versioned training-data pipeline runs before shipping a refresh. v2 is
# derived deterministically from the documents table (docs with
# doc_id % 11 == 0 removed, % 7 == 0 edited, % 13 == 0 re-ingested under
# new ids), and the diff is ONE doc_id-keyed full outer join comparing
# content digests: v1-only = removed, v2-only = added, digest mismatch =
# changed. Per source: counts + a 4-dp churn rate from exact integers.
#
# 100 TB shape: two corpus scans + one full-outer shuffle join on the id
# (both sides hash-partition once; the md5 rides the scan projection), then
# an O(sources) partial-aggregated rollup. No row ever widens beyond
# (id, source, digest).

@query(
    "p20_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT doc_id, source, md5(text) AS dg FROM documents
    ), v2 AS (
      SELECT doc_id, source,
             md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)
               AS dg
      FROM documents WHERE doc_id % 11 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, source, md5(text) AS dg
      FROM documents WHERE doc_id % 13 = 0
    ), j AS (
      SELECT coalesce(a.source, b.source) AS source,
             CASE WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.doc_id IS NULL THEN 'added'
                  WHEN a.dg <> b.dg THEN 'changed'
                  ELSE 'unchanged' END AS st,
             a.doc_id AS id1
      FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
    ), agg AS (
      SELECT source,
             CAST(count(id1) AS BIGINT) AS n_v1,
             CAST(coalesce(sum(CASE WHEN st = 'added' THEN 1 END), 0)
                  AS BIGINT) AS n_added,
             CAST(coalesce(sum(CASE WHEN st = 'removed' THEN 1 END), 0)
                  AS BIGINT) AS n_removed,
             CAST(coalesce(sum(CASE WHEN st = 'changed' THEN 1 END), 0)
                  AS BIGINT) AS n_changed,
             CAST(coalesce(sum(CASE WHEN st = 'unchanged' THEN 1 END), 0)
                  AS BIGINT) AS n_unchanged
      FROM j GROUP BY source
    )
    SELECT source, n_v1, n_added, n_removed, n_changed, n_unchanged,
           ((20000 * (n_added + n_removed + n_changed) + n_v1)
            // (2 * n_v1)) / 10000.0 AS churn_rate
    FROM agg
    ORDER BY source
    """,
)
def p20_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    v1 = d.select("doc_id", "source", F.md5("text").alias("dg"))
    edited = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
    ).otherwise(F.col("text"))
    v2 = (
        d.where(F.col("doc_id") % 11 != 0)
        .select("doc_id", "source", F.md5(edited).alias("dg"))
        .unionByName(
            d.where(F.col("doc_id") % 13 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                "source",
                F.md5("text").alias("dg"),
            )
        )
    )
    a = v1.alias("a")
    b = v2.alias("b")
    st = (
        F.when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("a.dg") != F.col("b.dg"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    j = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer").select(
        F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
        st.alias("st"),
        F.col("a.doc_id").alias("id1"),
    )
    cnt = lambda v: F.coalesce(
        F.sum(F.when(F.col("st") == v, 1)), F.lit(0)
    ).cast("bigint")
    agg = j.groupBy("source").agg(
        F.count("id1").alias("n_v1"),
        cnt("added").alias("n_added"),
        cnt("removed").alias("n_removed"),
        cnt("changed").alias("n_changed"),
        cnt("unchanged").alias("n_unchanged"),
    )
    churn = (
        F.expr(
            "(20000 * (n_added + n_removed + n_changed) + n_v1) "
            "DIV (2 * n_v1)"
        ).cast("double")
        / F.lit(10000.0)
    )
    return agg.select(
        "source",
        "n_v1",
        "n_added",
        "n_removed",
        "n_changed",
        "n_unchanged",
        churn.alias("churn_rate"),
    ).orderBy("source")


# --- p21: inspection sample (deterministic bottom-k per source) --------------
# "Show me a uniform random sample of every source" — the corpus-inspection
# table behind every data-quality dashboard and human-eval draw. Bottom-k
# hash sampling: a doc is in the sample iff its 60-bit md5 hash ranks among
# its source's k smallest — membership is a pure function of the KEY, so
# the draw is uniform over distinct docs, reproducible across engines and
# runs, and identical whether computed in one batch or maintained
# incrementally (streaming/sample_store.py serves THIS relation from a
# fixed scopes x k state; the batch query and the store share
# bottomk_sample_partial by construction).
#
# 100 TB shape: the rank<=k window is per-source WindowGroupLimit — each
# scan partition is pruned to k rows BEFORE the shuffle, so the exchange
# carries O(partitions x k) rows at any corpus size, and no RNG state or
# reservoir coordination exists anywhere.

P21_K = 5


def _register_p21() -> None:
    oracle = f"""
    WITH h AS (
      SELECT source, doc_id, lang, n_chars,
             ('0x' || substr(md5('smp:' || CAST(doc_id AS VARCHAR)), 1, 15))
               ::BIGINT AS h
      FROM documents
    ), rk AS (
      SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
               AS rank
      FROM h
    )
    SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, lang, n_chars, h
    FROM rk WHERE rank <= {P21_K}
    ORDER BY source, rank
    """

    @query("p21_inspection_sample", oracle=oracle)
    def p21_inspection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spark_streaming_logservice_spark.streaming.sample_store import (
            bottomk_sample_partial,
        )

        d = load_table(spark, sf_dir, "documents")
        smp = bottomk_sample_partial(
            d, "source", "doc_id", ["lang", "n_chars"], k=P21_K
        )
        w = Window.partitionBy("scope").orderBy("h", "sample_key")
        return smp.select(
            F.col("scope").alias("source"),
            F.row_number().over(w).alias("rank"),
            F.col("sample_key").cast("bigint").alias("doc_id"),
            "lang",
            "n_chars",
            "h",
        ).orderBy("source", "rank")


_register_p21()


# --- p22: epoch shuffle plan (reproducible per-epoch permutation) ------------
# Training loaders need a DIFFERENT document order every epoch, but the
# same order every time the job restarts — a deterministic per-epoch
# permutation, never an RNG shuffle. Rank every doc by md5(epoch:doc_id)
# within each epoch and PROVE the reshuffle: the Spearman rank correlation
# between consecutive epochs' permutations (~0 for independent orders) and
# the 4-dp mean absolute rank displacement (~N/3 for a random permutation).
#
# 100 TB shape: the only corpus-sized stages are the E-way row-local epoch
# explode and ONE two-pass range-partitioned global ranking over
# (epoch, hash) — per-epoch ranks derive from the global rank minus the
# epoch's broadcast min-rank offset (O(E) rows), so there is no
# partition-less window and no per-epoch corpus sort. All six Spearman
# sufficient statistics are exact bigint sums (rank products stay under
# 2^63 up to ~2M docs/epoch; beyond that promote to DECIMAL(38)) — the
# correlation is bit-stable at any partitioning.

P22_EPOCHS = 3


def _register_p22() -> None:
    oracle = f"""
    WITH ep AS (
      SELECT CAST(unnest(range({P22_EPOCHS})) AS INTEGER) AS epoch
    ), x AS (
      SELECT e.epoch, d.doc_id,
             ('0x' || substr(md5('ep:' || CAST(e.epoch AS VARCHAR) || ':'
                                  || CAST(d.doc_id AS VARCHAR)), 1, 15))
               ::BIGINT AS h
      FROM documents d CROSS JOIN ep e
    ), r AS (
      SELECT epoch, doc_id,
             row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS rk
      FROM x
    ), p AS (
      SELECT a.epoch AS epoch_a, b.epoch AS epoch_b,
             a.rk AS ra, b.rk AS rb
      FROM r a JOIN r b ON b.doc_id = a.doc_id AND b.epoch = a.epoch + 1
    ), s AS (
      SELECT epoch_a, epoch_b, count(*) AS n,
             sum(ra) AS sx, sum(rb) AS sy, sum(ra * rb) AS sxy,
             sum(ra * ra) AS sxx, sum(rb * rb) AS syy,
             sum(abs(ra - rb)) AS sabs
      FROM p GROUP BY 1, 2
    )
    SELECT epoch_a, epoch_b, CAST(n AS BIGINT) AS n_docs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
                 + 0.0, 6) AS rank_corr,
           CAST((20000 * sabs + n) // (2 * n) AS DOUBLE) / 10000.0
             AS mean_rank_shift
    FROM s
    ORDER BY epoch_a
    """

    @query("p22_epoch_shuffle", oracle=oracle)
    def p22_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spark_streaming_logservice_spark.operators.sketch import _hash60

        d = load_table(spark, sf_dir, "documents").select("doc_id")
        epochs = F.explode(
            F.array(*[F.lit(e) for e in range(P22_EPOCHS)])
        ).alias("epoch")
        x = d.select(epochs, "doc_id").select(
            "epoch",
            "doc_id",
            _hash60(
                "ep:",
                F.concat(
                    F.col("epoch").cast("string"),
                    F.lit(":"),
                    F.col("doc_id").cast("string"),
                ),
            ).alias("h"),
        )
        ranked = distributed_row_number(
            x, [F.asc("epoch"), F.asc("h"), F.asc("doc_id")], out="grk"
        )
        off = ranked.groupBy("epoch").agg(F.min("grk").alias("off"))
        r = ranked.join(F.broadcast(off), "epoch").select(
            "epoch", "doc_id", (F.col("grk") - F.col("off") + 1).alias("rk")
        )
        a = r.select(
            F.col("epoch").alias("epoch_a"),
            "doc_id",
            F.col("rk").alias("ra"),
        )
        b = r.select(
            (F.col("epoch") - 1).alias("epoch_a"),
            F.col("epoch").alias("epoch_b"),
            "doc_id",
            F.col("rk").alias("rb"),
        )
        p = a.join(b, ["epoch_a", "doc_id"])
        s = p.groupBy("epoch_a", "epoch_b").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("ra").alias("sx"),
            F.sum("rb").alias("sy"),
            F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
            F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
            F.sum(F.col("rb") * F.col("rb")).alias("syy"),
            F.sum(F.abs(F.col("ra") - F.col("rb"))).alias("sabs"),
        )
        num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
        return s.select(
            "epoch_a",
            "epoch_b",
            F.col("n").alias("n_docs"),
            F.round(num / (F.sqrt(vx) * F.sqrt(vy)) + F.lit(0.0), 6).alias(
                "rank_corr"
            ),
            (
                F.expr("(20000 * sabs + n) DIV (2 * n)").cast("double")
                / F.lit(10000.0)
            ).alias("mean_rank_shift"),
        ).orderBy("epoch_a")


_register_p22()


# --- p24: sequence-packing plan -----------------------------------------------
# The step between a curated corpus and a training run: concatenate each
# source's documents (doc_id order) and split into fixed-length training
# sequences (GPT-style concat-and-chunk packing). The planning report per
# source: how many sequences the corpus yields, how many documents get
# split across a sequence boundary (the attention-contamination lever),
# and how full the final ragged sequence is.
#
# 100 TB shape: the per-source running token offset is the EXACT
# distributed prefix sum (distributed_row_number's two-pass ranged
# cumsum — no single-partition window anywhere); per-source totals are an
# O(sources) relation and the source base offsets come from an
# O(sources²) broadcast self-join, so subtracting them turns the global
# cumsum into each source's own token stream. Everything else is integer
# arithmetic on (start, end) offsets.

P24_SEQ_LEN = 512


@query(
    "p24_sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM documents
    ), c AS (
      SELECT source, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS e
      FROM d
    ), sp AS (
      SELECT source, n_tok, e - n_tok AS s, e FROM c
    ), per AS (
      SELECT source, count(*) AS n_docs, sum(n_tok) AS total_tokens,
             sum(CASE WHEN n_tok > 0
                       AND s // {P24_SEQ_LEN} <> (e - 1) // {P24_SEQ_LEN}
                      THEN 1 ELSE 0 END) AS n_split
      FROM sp GROUP BY source
    )
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST((total_tokens + {P24_SEQ_LEN} - 1) // {P24_SEQ_LEN} AS BIGINT)
             AS n_sequences,
           CAST(n_split AS BIGINT) AS n_split_docs,
           CAST((20000 * n_split + n_docs) // (2 * n_docs) AS DOUBLE)
             / 10000.0 AS split_share,
           CAST((20000 * (total_tokens
                          - ((total_tokens + {P24_SEQ_LEN} - 1)
                             // {P24_SEQ_LEN} - 1) * {P24_SEQ_LEN})
                 + {P24_SEQ_LEN}) // (2 * {P24_SEQ_LEN}) AS DOUBLE)
             / 10000.0 AS tail_fill
    FROM per
    ORDER BY source
    """,
)
def p24_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    L = P24_SEQ_LEN
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).cast("bigint").alias("n_tok"),
    )
    ranked = distributed_row_number(
        d,
        [F.asc("source"), F.asc("doc_id")],
        cumsum_col="n_tok",
        cumsum_out="gcum",
    )
    # aggregate off `ranked` (pinned inside distributed_row_number), not
    # `d` — the latter re-runs the tokenize-and-count scan for the same
    # per-source totals (guide §2.4; d_r_n is 1:1, columns preserved)
    totals = ranked.groupBy("source").agg(F.sum("n_tok").alias("tot"))
    # base offset of each source's token stream inside the global order:
    # sum of strictly-earlier sources' totals (O(sources^2) broadcast join)
    t2 = totals.select(
        F.col("source").alias("src2"), F.col("tot").alias("tot2")
    )
    offs = (
        totals.join(
            F.broadcast(t2), F.col("src2") < F.col("source"), "left"
        )
        .groupBy("source")
        .agg(F.coalesce(F.sum("tot2"), F.lit(0)).alias("off"))
    )
    sp = ranked.join(F.broadcast(offs), "source").select(
        "source",
        "n_tok",
        (F.col("gcum") - F.col("off") - F.col("n_tok")).alias("s"),
        (F.col("gcum") - F.col("off")).alias("e"),
    )
    split = F.when(
        (F.col("n_tok") > 0)
        & (
            F.expr(f"s DIV {L}") != F.expr(f"(e - 1) DIV {L}")
        ),
        1,
    ).otherwise(0)
    per = sp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(split).alias("n_split"),
    )
    nseq = F.expr(f"(total_tokens + {L} - 1) DIV {L}")
    share = F.expr("(20000 * n_split + n_docs) DIV (2 * n_docs)").cast(
        "double"
    ) / F.lit(10000.0)
    fill = F.expr(
        f"(20000 * (total_tokens - ((total_tokens + {L} - 1) DIV {L} - 1)"
        f" * {L}) + {L}) DIV (2 * {L})"
    ).cast("double") / F.lit(10000.0)
    return per.select(
        "source",
        "n_docs",
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        nseq.cast("bigint").alias("n_sequences"),
        F.col("n_split").cast("bigint").alias("n_split_docs"),
        share.alias("split_share"),
        fill.alias("tail_fill"),
    ).orderBy("source")


# --- p25: mixture diversity report ---------------------------------------------
# The one-look health check of a training mixture: per-source share plus
# the Shannon entropy of the mix and its "effective number of sources"
# exp(H) — the number every mixture rebalance proposal gets compared
# against (5 sources at effective 2.1 means three of them barely matter).
#
# Float discipline: the entropy is a sum of per-source -p·ln(p) terms;
# a groupBy float sum would be partition-merge-order dependent, so BOTH
# engines fold the terms in SOURCE ORDER over an explicitly sorted list
# (array_sort + aggregate here, list(term ORDER BY source) + list_sum in
# DuckDB) — bit-stable at any partitioning. Entropy/effective are stamped
# on every row (the l28 Gini pattern).
#
# 100 TB shape: ONE per-source count with map-side combine; everything
# after runs on the O(sources) relation.

@query(
    "p25_mixture_diversity",
    oracle="""
    WITH c AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source
    ), t AS (
      SELECT sum(n) AS tot FROM c
    ), terms AS (
      SELECT source, n,
             -(CAST(n AS DOUBLE) / tot) * ln(CAST(n AS DOUBLE) / tot)
               AS term,
             tot
      FROM c CROSS JOIN t
    ), ent AS (
      SELECT list_sum(list(term ORDER BY source)) AS h FROM terms
    )
    SELECT tm.source, CAST(tm.n AS BIGINT) AS n_docs,
           CAST((20000 * tm.n + tm.tot) // (2 * tm.tot) AS DOUBLE)
             / 10000.0 AS share,
           round(e.h, 6) AS entropy,
           round(exp(e.h), 6) AS effective_sources
    FROM terms tm CROSS JOIN ent e
    ORDER BY tm.source
    """,
)
def p25_mixture_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("source")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    terms = c.join(F.broadcast(t), how="cross").select(
        "source",
        "n",
        "tot",
        (
            -(F.col("n").cast("double") / F.col("tot"))
            * F.log(F.col("n").cast("double") / F.col("tot"))
        ).alias("term"),
    )
    ent = terms.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "term"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term"],
        ).alias("h")
    )
    share = F.expr("(20000 * n + tot) DIV (2 * tot)").cast("double") / F.lit(
        10000.0
    )
    return (
        terms.join(F.broadcast(ent), how="cross")
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_docs"),
            share.alias("share"),
            F.round(F.col("h"), 6).alias("entropy"),
            F.round(F.exp(F.col("h")), 6).alias("effective_sources"),
        )
        .orderBy("source")
    )


# --- p26: data-constrained epoch allocation -----------------------------------
# The pretraining budgeting calculation (Muennighoff et al. 2023, "Scaling
# Data-Constrained Language Models"): given a total token budget, split it
# into equal per-source shares, let each source spend at most MAX_EPOCHS
# passes over its own tokens (repeating data beyond ~4 epochs stops
# helping), and report what each source actually contributes. Small
# sources hit the epoch cap (data-constrained); large sources are
# truncated to their share (budget-constrained).
#
# Exactness: everything is BIGINT — token counts, the integer equal share,
# LEAST(cap, share), and the half-up 1e-4-unit epoch ratio. 100 TB shape:
# one row-local token count + one O(sources) aggregate; the allocation
# math runs on the O(sources) rollup.


def _register_p26() -> None:
    from pyspark.sql import SparkSession

    from spark_streaming_logservice_spark.registry import query
    from spark_streaming_logservice_spark.tables import load_table

    MAX_EPOCHS = 4
    BUDGET_EPOCHS = 2  # total budget = 2x the corpus token count

    oracle = f"""
    WITH tok AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), t -> t <> ''))
               AS n_tok
      FROM documents
    ), src AS (
      SELECT source, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM tok GROUP BY source
    ), tot AS (
      -- CAST: DuckDB sum(BIGINT) is HUGEINT, which pandas can't carry
      SELECT CAST({BUDGET_EPOCHS} * sum(n_tokens) AS BIGINT) AS budget,
             count(*) AS n_sources
      FROM src
    ), alloc AS (
      SELECT s.source, s.n_tokens,
             CAST(t.budget // t.n_sources AS BIGINT) AS equal_share,
             CAST(least({MAX_EPOCHS} * s.n_tokens,
                        t.budget // t.n_sources) AS BIGINT)
               AS allocated_tokens
      FROM src s CROSS JOIN tot t
    )
    SELECT source, n_tokens, equal_share, allocated_tokens,
           -- HUGEINT multiplier: 20000 * allocated would wrap int64 at
           -- ~4.6e14 tokens (inside 100 TB reach)
           CAST((CAST(20000 AS HUGEINT) * allocated_tokens + n_tokens)
                // (2 * n_tokens) AS DOUBLE) / 10000.0 AS epochs,
           allocated_tokens = {MAX_EPOCHS} * n_tokens AS data_constrained
    FROM alloc
    ORDER BY source
    """

    @query("p26_epoch_allocation", oracle=oracle)
    def p26_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = load_table(spark, sf_dir, "documents")
        src = d.select(
            "source",
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            ).alias("n_tok"),
        ).groupBy("source").agg(
            F.sum("n_tok").cast("bigint").alias("n_tokens")
        )
        tot = src.agg(
            (F.lit(BUDGET_EPOCHS).cast("bigint") * F.sum("n_tokens")).alias(
                "budget"
            ),
            F.count(F.lit(1)).alias("n_sources"),
        )
        alloc = src.crossJoin(F.broadcast(tot)).select(
            "source",
            "n_tokens",
            F.expr("budget DIV n_sources").alias("equal_share"),
            F.least(
                F.lit(MAX_EPOCHS) * F.col("n_tokens"),
                F.expr("budget DIV n_sources"),
            ).alias("allocated_tokens"),
        )
        return alloc.select(
            "source",
            "n_tokens",
            "equal_share",
            "allocated_tokens",
            (
                # DECIMAL(38,0) multiplier mirrors the oracle's HUGEINT:
                # exact past int64's ~4.6e14-token wrap point
                F.expr(
                    "(20000 * CAST(allocated_tokens AS DECIMAL(38,0)) "
                    "+ n_tokens) DIV (2 * n_tokens)"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("epochs"),
            (
                F.col("allocated_tokens")
                == F.lit(MAX_EPOCHS) * F.col("n_tokens")
            ).alias("data_constrained"),
        ).orderBy("source")


_register_p26()


# --- p27: dedup-aware mixture reweighting --------------------------------------
# What d24's funnel means for SAMPLING: a source's real contribution to a
# training mixture is its UNIQUE document mass, not its row count — a
# crawl that re-serves the same pages 5x should not get 5x the sampling
# weight. Per source: raw docs, unique docs (exact md5-distinct), the
# naive row-count share, the dedup-aware unique-mass share, the shift
# between them (the re-weighting dedup implies), and the duplication
# factor. Companion to p13 (temperature mixture) and p26 (epoch budget):
# p27 supplies the deduped base counts those allocations should run on.
#
# 100 TB shape: one keyed aggregate where the distinct-count shuffles
# 16-byte md5 digests, never text (the d01/digest-store discipline); the
# share math runs on the O(sources) rollup. Exactness: all shares are
# half-up integer units (1e-6 for shares, 1e-4 for the factor) via
# DECIMAL(38,0) DIV — headroom past int64 at 100 TB doc counts — mirrored
# by DuckDB HUGEINT; the shift is an exact integer subtraction, so both
# engines agree bit-for-bit. NULL text is excluded on both sides (no
# content, no mixture mass — the d26/digest-store rule).


def _register_p27() -> None:
    oracle = """
    WITH src AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique
      FROM documents WHERE text IS NOT NULL GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS nd,
             CAST(sum(n_unique) AS BIGINT) AS nu
      FROM src
    ), u AS (
      SELECT s.source, s.n_docs, s.n_unique,
             CAST((CAST(2000000 AS HUGEINT) * s.n_docs + t.nd)
                  // (2 * t.nd) AS BIGINT) AS r6,
             CAST((CAST(2000000 AS HUGEINT) * s.n_unique + t.nu)
                  // (2 * t.nu) AS BIGINT) AS u6,
             CAST((CAST(20000 AS HUGEINT) * s.n_docs + s.n_unique)
                  // (2 * s.n_unique) AS BIGINT) AS dr4
      FROM src s CROSS JOIN tot t
    )
    SELECT source, n_docs, n_unique,
           CAST(r6 AS DOUBLE) / 1e6 AS raw_share,
           CAST(u6 AS DOUBLE) / 1e6 AS unique_share,
           CAST(u6 - r6 AS DOUBLE) / 1e6 AS share_shift,
           CAST(dr4 AS DOUBLE) / 1e4 AS dup_factor
    FROM u ORDER BY source
    """

    @query("p27_dedup_aware_mixture", oracle=oracle)
    def p27_dedup_aware_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = load_table(spark, sf_dir, "documents").where(
            F.col("text").isNotNull()
        )
        src = d.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            # distinct over the 128-bit digest: the shuffle carries 16-byte
            # keys, never document text
            F.countDistinct(F.md5(F.col("text")))
            .cast("bigint")
            .alias("n_unique"),
        )
        tot = src.agg(
            F.sum("n_docs").cast("bigint").alias("nd"),
            F.sum("n_unique").cast("bigint").alias("nu"),
        )
        units = src.crossJoin(F.broadcast(tot)).select(
            "source",
            "n_docs",
            "n_unique",
            F.expr(
                "(2000000 * CAST(n_docs AS DECIMAL(38,0)) + nd) DIV (2 * nd)"
            ).alias("r6"),
            F.expr(
                "(2000000 * CAST(n_unique AS DECIMAL(38,0)) + nu) "
                "DIV (2 * nu)"
            ).alias("u6"),
            F.expr(
                "(20000 * CAST(n_docs AS DECIMAL(38,0)) + n_unique) "
                "DIV (2 * n_unique)"
            ).alias("dr4"),
        )
        return units.select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("r6").cast("double") / F.lit(1e6)).alias("raw_share"),
            (F.col("u6").cast("double") / F.lit(1e6)).alias("unique_share"),
            ((F.col("u6") - F.col("r6")).cast("double") / F.lit(1e6)).alias(
                "share_shift"
            ),
            (F.col("dr4").cast("double") / F.lit(1e4)).alias("dup_factor"),
        ).orderBy("source")


_register_p27()


# --- j06: value-band join (bucketed |x - y| <= eps equi-join rewrite) -------
# "Which purchases land within ±eps of a click's value by the same user?"
# — the price-band/tolerance join every reconciliation pipeline needs
# (tick-to-trade matching, sensor cross-validation, fuzzy amount joins).
# Distinct from j03 (interval overlap) and j05 (nearest in TIME): the band
# is on a VALUE column, where a naive engine falls back to a per-user
# cross product with an abs() filter.
#
# 100 TB design: bucket = floor(value / eps); the right side keeps its one
# bucket, the left side expands to the only THREE buckets a match can live
# in (b-1, b, b+1 — any pair within eps differs by at most one bucket), so
# the join is a plain (user_id, bucket) equi-join with candidate fan-out
# STRUCTURALLY capped at 3x, never a cross join; each true pair matches in
# exactly one bucket (the right row's own), so no dedup pass is needed.
# Skew = one heavy user; the composite key keeps AQE's skew-split
# applicable. Gap sums run in integer cents (values carry 2 decimals) —
# associative, merge-order-proof.

BAND_EPS = 5.0


@query(
    "j06_value_band_join",
    oracle=f"""
    WITH clicks AS (
      SELECT user_id, event_id, value FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, event_id, value FROM events WHERE event_type = 'purchase'
    ), pairs AS (
      SELECT c.user_id,
             CAST(floor(abs(p.value - c.value) * 100 + 0.5) AS BIGINT)
                 AS gap_cents
      FROM clicks c JOIN purchases p
        ON c.user_id = p.user_id
       AND abs(p.value - c.value) <= {BAND_EPS}
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(gap_cents) AS BIGINT) AS sum_gap_cents,
           CAST((2 * CAST(sum(gap_cents) AS BIGINT) + count(*))
                // (2 * count(*)) AS BIGINT) AS avg_gap_cents
    FROM pairs
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def j06_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("value").alias("p_value"),
        F.floor(F.col("value") / BAND_EPS).cast("bigint").alias("bucket"),
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("value").alias("c_value"),
            F.floor(F.col("value") / BAND_EPS).cast("bigint").alias("b0"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(F.col("b0") - 1, F.col("b0"), F.col("b0") + 1)
            ),
        )
        .drop("b0")
    )
    pairs = clicks.join(purchases, ["user_id", "bucket"]).where(
        F.abs(F.col("p_value") - F.col("c_value")) <= BAND_EPS
    )
    gap = F.floor(
        F.abs(F.col("p_value") - F.col("c_value")) * 100 + 0.5
    ).cast("bigint")
    return (
        pairs.select("user_id", gap.alias("gap_cents"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("gap_cents").alias("sum_gap_cents"),
            F.expr(
                "(2 * sum(gap_cents) + count(1)) DIV (2 * count(1))"
            ).alias("avg_gap_cents"),
        )
        .orderBy("user_id")
    )
