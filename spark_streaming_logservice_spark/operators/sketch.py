"""Probabilistic sketch operators with deterministic, oracle-replayable
hashing: Count-Min frequency estimation and Bloom-filter membership.

Both sketches use md5-derived hash functions (the engine-portable
determinism discipline shared with pipeline_ops sampling), so DuckDB can
replay the exact same sketch bit-for-bit — the estimates are checked
EXACTLY, not just bounded.

100 TB design:
- Count-Min: the sketch is a (row, col) -> count relation with key space
  d*w (here 4*256 = 1024 cells) — the wordcount bound: partial aggregation
  absorbs any key skew map-side and the shuffle carries at most
  partitions * 1024 rows regardless of corpus size. This is why CM exists:
  heavy-hitter frequency at fixed memory. Estimation joins the tiny sketch
  (AQE broadcasts it) against the probe keys.
- Bloom: the filter is a set-bit relation (<= k*n rows, deduplicated).
  Probing is a map-side broadcast join per hash function; the corpus
  streams once. A production filter packs the bits into a bitmap inside a
  scalar; the relational form has identical semantics and lets the oracle
  replay membership exactly, false positives included.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

CM_DEPTH = 4
CM_WIDTH = 256
BLOOM_BITS = 64
BLOOM_HASHES = 2


def _md5_mod(prefix: str, j: Column, key: Column, mod: int) -> Column:
    """(first 8 md5 hex digits of '<prefix><j>:<key>') % mod — one member of
    a family of independent uniform hash functions, identical in DuckDB as
    ('0x' || substr(md5(...), 1, 8))::BIGINT % mod."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(prefix), j.cast("string"), F.lit(":"), key.cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return h % mod


def countmin_sketch(
    df: DataFrame, key: Column, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """Build the (j, col, cnt) Count-Min relation for a key column: each row
    contributes one count to ``depth`` cells (row-local explode), then one
    (j, col)-keyed aggregate — at most depth*width result rows."""
    js = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    cells = df.select(key.alias("k")).select(
        js, F.col("k")
    ).select("j", _md5_mod("cm", F.col("j"), F.col("k"), width).alias("col"))
    return cells.groupBy("j", "col").agg(F.count(F.lit(1)).alias("cnt"))


def countmin_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str,
    depth: int = CM_DEPTH, width: int = CM_WIDTH,
) -> DataFrame:
    """min over rows of the key's cell counts — the classic CM estimate
    (always >= the true count). ``keys`` is the distinct probe set."""
    js = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j")
    probe = keys.select(F.col(key_col).alias("k")).select(js, "k").select(
        "j", "k", _md5_mod("cm", F.col("j"), F.col("k"), width).alias("col")
    )
    return (
        probe.join(sketch, ["j", "col"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_n"))
    )


def _register_l19() -> None:
    oracle = f"""
    WITH cells AS (
      SELECT j,
             ('0x' || substr(md5('cm' || CAST(j AS VARCHAR) || ':'
                                  || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {CM_WIDTH} AS col
      FROM events, unnest([0, 1, 2, 3]) AS t(j)
    ), sketch AS (
      SELECT j, col, count(*) AS cnt FROM cells GROUP BY j, col
    ), probes AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 7 = 3
    ), probe_cells AS (
      SELECT user_id, j,
             ('0x' || substr(md5('cm' || CAST(j AS VARCHAR) || ':'
                                  || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {CM_WIDTH} AS col
      FROM probes, unnest([0, 1, 2, 3]) AS t(j)
    ), est AS (
      SELECT user_id, min(coalesce(s.cnt, 0)) AS est_n
      FROM probe_cells p LEFT JOIN sketch s USING (j, col)
      GROUP BY user_id
    ), exact AS (
      SELECT user_id, count(*) AS exact_n FROM events
      WHERE user_id % 7 = 3 GROUP BY user_id
    )
    SELECT e.user_id, x.exact_n, e.est_n, e.est_n - x.exact_n AS overcount
    FROM est e JOIN exact x USING (user_id)
    ORDER BY e.user_id
    """

    @query("l19_countmin_frequency", oracle=oracle)
    def l19_countmin_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Count-Min frequency estimation for a probe set of users, checked
        EXACTLY against a DuckDB replay of the same md5-hashed sketch (and
        against the true counts — overcount >= 0 is the CM guarantee)."""
        ev = load_table(spark, sf_dir, "events").select("user_id")
        sketch = countmin_sketch(ev, F.col("user_id"))
        probes = ev.where(F.col("user_id") % 7 == 3).distinct()
        est = countmin_estimate(sketch, probes, "user_id")
        exact = (
            ev.where(F.col("user_id") % 7 == 3)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("exact_n"))
        )
        return (
            est.join(exact, est["k"] == exact["user_id"])
            .select(
                "user_id",
                "exact_n",
                "est_n",
                (F.col("est_n") - F.col("exact_n")).alias("overcount"),
            )
            .orderBy("user_id")
        )


def _register_d14() -> None:
    oracle = f"""
    WITH d AS (
      SELECT doc_id, source, md5(text) AS fp FROM documents
    ), bench AS (
      SELECT DISTINCT fp FROM d WHERE doc_id % 97 = 0
    ), bits AS (
      SELECT DISTINCT
             ('0x' || substr(md5('bf' || CAST(j AS VARCHAR) || ':' || fp), 1, 8))::BIGINT
               % {BLOOM_BITS} AS bit
      FROM bench, unnest([0, 1]) AS t(j)
    ), probe AS (
      SELECT doc_id, source, fp,
             ('0x' || substr(md5('bf0:' || fp), 1, 8))::BIGINT % {BLOOM_BITS} AS bit0,
             ('0x' || substr(md5('bf1:' || fp), 1, 8))::BIGINT % {BLOOM_BITS} AS bit1
      FROM d WHERE doc_id % 97 <> 0
    ), flagged AS (
      SELECT p.source,
             (b0.bit IS NOT NULL AND b1.bit IS NOT NULL) AS bloom_pos,
             (x.fp IS NOT NULL) AS exact_pos
      FROM probe p
      LEFT JOIN bits b0 ON b0.bit = p.bit0
      LEFT JOIN bits b1 ON b1.bit = p.bit1
      LEFT JOIN bench x ON x.fp = p.fp
    )
    SELECT source,
           count(*) AS n_probed,
           count(CASE WHEN bloom_pos THEN 1 END) AS n_bloom_positive,
           count(CASE WHEN exact_pos THEN 1 END) AS n_exact_positive,
           count(CASE WHEN bloom_pos AND NOT exact_pos THEN 1 END) AS n_false_positive
    FROM flagged
    GROUP BY source
    ORDER BY source
    """

    @query("d14_bloom_decontamination", oracle=oracle)
    def d14_bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Bloom-filter pre-screen for benchmark contamination: build a
        deliberately small filter (64 bits, 2 hashes) over held-out
        document fingerprints, probe the training corpus via
        broadcast bit-set joins, and report bloom-vs-exact positives per
        source — false positives included, all replayed exactly by the
        oracle. (Production sizing makes FP ~ 0; the small filter here
        makes the FP accounting itself testable.)"""
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", F.md5(F.col("text")).alias("fp")
        )
        bench = d.where(F.col("doc_id") % 97 == 0).select("fp").distinct()
        bits = (
            bench.select(
                F.explode(F.array(*[F.lit(i) for i in range(BLOOM_HASHES)])).alias("j"),
                "fp",
            )
            .select(_md5_mod("bf", F.col("j"), F.col("fp"), BLOOM_BITS).alias("bit"))
            .distinct()
        )
        probe = d.where(F.col("doc_id") % 97 != 0).select(
            "source",
            "fp",
            _md5_mod("bf", F.lit(0), F.col("fp"), BLOOM_BITS).alias("bit0"),
            _md5_mod("bf", F.lit(1), F.col("fp"), BLOOM_BITS).alias("bit1"),
        )
        b0 = bits.select(F.col("bit").alias("bit0"), F.lit(1).alias("h0"))
        b1 = bits.select(F.col("bit").alias("bit1"), F.lit(1).alias("h1"))
        bench_mark = bench.select("fp", F.lit(1).alias("in_bench"))
        flagged = (
            probe.join(F.broadcast(b0), "bit0", "left")
            .join(F.broadcast(b1), "bit1", "left")
            .join(bench_mark, "fp", "left")
            .select(
                "source",
                (F.col("h0").isNotNull() & F.col("h1").isNotNull()).alias("bloom_pos"),
                F.col("in_bench").isNotNull().alias("exact_pos"),
            )
        )
        return (
            flagged.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_probed"),
                F.count(F.when(F.col("bloom_pos"), 1)).alias("n_bloom_positive"),
                F.count(F.when(F.col("exact_pos"), 1)).alias("n_exact_positive"),
                F.count(
                    F.when(F.col("bloom_pos") & ~F.col("exact_pos"), 1)
                ).alias("n_false_positive"),
            )
            .orderBy("source")
        )


_register_l19()
_register_d14()


# --- l25: deterministic mergeable HyperLogLog ---------------------------------
HLL_M = 64           # registers (6 bucket bits)
HLL_SCALE = 56       # integer scale: term = 2^(HLL_SCALE - rho), sum <= 2^62
# alpha_64 * m^2 * 2^HLL_SCALE, written as the same literal product in both
# engines (left-assoc, identical parse -> identical IEEE result).
_HLL_EST = "((0.709e0 * 4096e0) * 72057594037927936e0)"

KMV_K = 8            # tiny k so the SKETCH path (n > k) runs even at sf0.001


def _hash60(prefix: str, key: Column) -> Column:
    """First 15 md5 hex digits of '<prefix><key>' as a 60-bit BIGINT —
    identical in DuckDB as ('0x' || substr(md5(...), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(prefix), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def hll_registers(df: DataFrame, scope: Column, key: Column) -> DataFrame:
    """(scope, bucket, rmax) HLL register table for ``key`` within each
    ``scope`` — the decomposable partial that merges with an associative
    per-bucket max (batch l25 and streaming/hll_store share this)."""
    h = df.select(scope.alias("scope"), key.alias("k")).distinct().select(
        "scope", _hash60("hll:", F.col("k")).alias("h")
    )
    v = F.expr(f"h div {HLL_M}")
    rho = F.when(v == 0, F.lit(HLL_SCALE - 1)).otherwise(
        F.round(F.log2(F.expr(f"(h div {HLL_M}) & (-(h div {HLL_M}))"))).cast("bigint")
        + 1
    )
    return (
        h.select("scope", (F.col("h") % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("scope", "bucket")
        .agg(F.max("rho").alias("rmax"))
    )


def hll_estimates(spark: SparkSession, reg: DataFrame) -> DataFrame:
    """(scope, est_users) from a register table: scaffold the missing
    buckets to rho=0, sum exact-integer 2^(56-rho) terms, one final
    double division — plus a merged 'ALL' scope from register-max."""
    merged = reg.unionByName(
        reg.groupBy("bucket")
        .agg(F.max("rmax").alias("rmax"))
        .select(F.lit("ALL").alias("scope"), "bucket", "rmax")
    )
    scopes = reg.select("scope").distinct().unionByName(
        spark.range(1).select(F.lit("ALL").alias("scope"))
    )
    scaffold = scopes.crossJoin(
        spark.range(HLL_M).select(F.col("id").alias("bucket"))
    )
    full_reg = scaffold.join(
        merged,
        (merged["scope"] == scaffold["scope"])
        & (merged["bucket"] == scaffold["bucket"]),
        "left",
    ).select(scaffold["scope"], F.coalesce("rmax", F.lit(0)).alias("rmax"))
    return (
        full_reg.groupBy("scope")
        .agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE} - rmax)")
            ).alias("s")
        )
        .select(
            "scope",
            F.expr(f"round({_HLL_EST} / CAST(s AS DOUBLE), 2)").alias("est_users"),
        )
    )


def _register_l25() -> None:
    oracle = f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ), rho AS (
      SELECT event_type, h % {HLL_M} AS bucket, h // {HLL_M} AS v,
             CASE WHEN h // {HLL_M} = 0 THEN {HLL_SCALE - 1}
                  ELSE CAST(round(log2((h // {HLL_M}) & (-(h // {HLL_M})))) AS BIGINT) + 1
             END AS rho
      FROM h
    ), reg AS (
      SELECT event_type, bucket, max(rho) AS rmax FROM rho GROUP BY 1, 2
    ), scopes AS (
      SELECT DISTINCT event_type AS scope FROM events UNION ALL SELECT 'ALL'
    ), merged AS (
      SELECT event_type, bucket, rmax FROM reg
      UNION ALL
      SELECT 'ALL' AS event_type, bucket, max(rmax) AS rmax FROM reg GROUP BY 2
    ), scaffold AS (
      SELECT s.scope, t.bucket FROM scopes s, range({HLL_M}) t(bucket)
    ), full_reg AS (
      SELECT sc.scope, coalesce(m.rmax, 0) AS rmax
      FROM scaffold sc LEFT JOIN merged m
        ON m.event_type = sc.scope AND m.bucket = sc.bucket
    ), est AS (
      SELECT scope,
             sum(CAST(1 AS BIGINT) << ({HLL_SCALE} - rmax)) AS s
      FROM full_reg GROUP BY 1
    ), exact AS (
      SELECT event_type AS scope, count(DISTINCT user_id) AS exact_users
      FROM events GROUP BY 1
      UNION ALL
      SELECT 'ALL', count(DISTINCT user_id) FROM events
    )
    SELECT e.scope,
           round({_HLL_EST} / CAST(e.s AS DOUBLE), 2) AS est_users,
           x.exact_users,
           round(abs(round({_HLL_EST} / CAST(e.s AS DOUBLE), 2)
                     / CAST(x.exact_users AS DOUBLE) - 1.0), 4) AS rel_err
    FROM est e JOIN exact x USING (scope)
    ORDER BY scope
    """

    @query("l25_hll_cardinality", oracle=oracle)
    def l25_hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Deterministic HyperLogLog distinct-user estimate per event type
        PLUS a merged 'ALL' scope computed by register-max MERGE of the
        per-type sketches — the algebra that makes HLL the 100 TB answer to
        COUNT(DISTINCT): per-partition register tables (m=64 rows each)
        merge with an associative max, so the shuffle carries O(m) rows per
        scope regardless of corpus size, and pre-aggregated sketches roll
        up across time/sources without touching raw data. md5-derived
        60-bit hashes + integer 2^(56-rho) register terms keep the whole
        estimate bit-replayable in DuckDB (checked EXACTLY, not bounded);
        rho is trailing-zeros+1, an equally uniform geometric statistic
        that stays in exact integer/log2-of-power-of-two arithmetic.
        Native approx_count_distinct (engine-opaque sketch) is l12's path;
        this operator exposes the registers so merge is a query, not a
        library call."""
        ev = load_table(spark, sf_dir, "events")
        reg = hll_registers(ev, F.col("event_type"), F.col("user_id"))
        est = hll_estimates(spark, reg)
        exact = (
            ev.groupBy(F.col("event_type").alias("scope"))
            .agg(F.count_distinct("user_id").alias("exact_users"))
            .unionByName(
                ev.agg(F.count_distinct("user_id").alias("exact_users")).select(
                    F.lit("ALL").alias("scope"), "exact_users"
                )
            )
        )
        return (
            est.join(exact, "scope")
            .select(
                "scope",
                "est_users",
                "exact_users",
                F.round(
                    F.abs(
                        F.col("est_users") / F.col("exact_users").cast("double")
                        - 1.0
                    ),
                    4,
                ).alias("rel_err"),
            )
            .orderBy("scope")
        )


def _register_l26() -> None:
    k = KMV_K
    oracle = f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ), sk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM h
      ) WHERE rk <= {k}
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM (SELECT DISTINCT event_type FROM events) a
      JOIN (SELECT DISTINCT event_type FROM events) b ON a.event_type < b.event_type
    ), mh AS (
      SELECT DISTINCT p.type_a, p.type_b, s.h
      FROM pairs p JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
    ), kept AS (
      SELECT type_a, type_b, h FROM (
        SELECT type_a, type_b, h,
               row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rk
        FROM mh
      ) WHERE rk <= {k}
    ), pair_stats AS (
      SELECT type_a, type_b, count(*) AS k_used, max(h) AS theta
      FROM kept GROUP BY 1, 2
    ), c AS (
      SELECT kp.type_a, kp.type_b, count(*) AS n_common
      FROM kept kp
      JOIN sk sa ON sa.event_type = kp.type_a AND sa.h = kp.h
      JOIN sk sb ON sb.event_type = kp.type_b AND sb.h = kp.h
      GROUP BY 1, 2
    ), exact AS (
      SELECT ua.event_type AS type_a, ub.event_type AS type_b,
             count(*) AS exact_inter
      FROM (SELECT DISTINCT event_type, user_id FROM events) ua
      JOIN (SELECT DISTINCT event_type, user_id FROM events) ub
        ON ua.user_id = ub.user_id AND ua.event_type < ub.event_type
      GROUP BY 1, 2
    ), est AS (
      SELECT p.type_a, p.type_b, p.k_used,
             round(CASE WHEN p.k_used < {k} THEN CAST(coalesce(c.n_common, 0) AS DOUBLE)
                        ELSE (CAST(coalesce(c.n_common, 0) AS DOUBLE) / {k}e0)
                             * (({k - 1}e0 * 1152921504606846976e0)
                                / CAST(p.theta AS DOUBLE))
                   END, 2) AS est_inter
      FROM pair_stats p LEFT JOIN c USING (type_a, type_b)
    )
    SELECT e.type_a, e.type_b, e.k_used, e.est_inter,
           coalesce(x.exact_inter, 0) AS exact_inter,
           CASE WHEN coalesce(x.exact_inter, 0) = 0 THEN NULL
                ELSE round(abs(e.est_inter / CAST(x.exact_inter AS DOUBLE) - 1.0), 4)
           END AS rel_err
    FROM est e LEFT JOIN exact x USING (type_a, type_b)
    ORDER BY type_a, type_b
    """

    @query("l26_kmv_overlap", oracle=oracle)
    def l26_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
        """KMV (k-minimum-values / theta sketch) distinct-user OVERLAP
        between every event-type pair — the set operation HLL cannot do:
        keep each type's k smallest md5-hashes, merge two sketches by
        re-taking the k smallest of the union (theta = k-th value), and
        estimate |A∩B| = (|common <= theta| / k) * (k-1) * H / theta,
        checked EXACTLY against a DuckDB replay plus the true intersection.
        100 TB shape: the sketch build is one distinct + a per-type
        rank<=k window (WindowGroupLimit prunes to k rows per partition
        BEFORE the shuffle), after which every pair operation touches only
        k-row sketches — broadcast-sized regardless of corpus size, and
        mergeable across shards/days by the same min-k rule. k={KMV_K}
        (deliberately tiny so the sketch path n>k is exercised at every
        test SF; production would use k in the thousands). The exact
        intersection here is the verification side only."""
        ev = load_table(spark, sf_dir, "events")
        h = (
            ev.select("event_type", "user_id").distinct()
            .select("event_type", _hash60("kmv:", F.col("user_id")).alias("h"))
        )
        w = Window.partitionBy("event_type").orderBy("h")
        sk = (
            h.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("event_type", "h")
        )
        types = ev.select("event_type").distinct()
        pairs = (
            types.select(F.col("event_type").alias("type_a"))
            .join(
                types.select(F.col("event_type").alias("type_b")),
                F.col("type_a") < F.col("type_b"),
            )
        )
        mh = (
            pairs.join(
                F.broadcast(sk),
                (F.col("event_type") == F.col("type_a"))
                | (F.col("event_type") == F.col("type_b")),
            )
            .select("type_a", "type_b", "h")
            .distinct()
        )
        wp = Window.partitionBy("type_a", "type_b").orderBy("h")
        kept = (
            mh.withColumn("rk", F.row_number().over(wp))
            .where(F.col("rk") <= k)
            .select("type_a", "type_b", "h")
        )
        pair_stats = kept.groupBy("type_a", "type_b").agg(
            F.count(F.lit(1)).alias("k_used"), F.max("h").alias("theta")
        )
        sa = sk.select(F.col("event_type").alias("type_a"), F.col("h"))
        sb = sk.select(F.col("event_type").alias("type_b"), F.col("h"))
        c = (
            kept.join(F.broadcast(sa), ["type_a", "h"])
            .join(F.broadcast(sb), ["type_b", "h"])
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        ut = ev.select("event_type", "user_id").distinct()
        exact = (
            ut.select(F.col("event_type").alias("type_a"), "user_id")
            .join(
                ut.select(F.col("event_type").alias("type_b"), "user_id"),
                "user_id",
            )
            .where(F.col("type_a") < F.col("type_b"))
            .groupBy("type_a", "type_b")
            .agg(F.count(F.lit(1)).alias("exact_inter"))
        )
        est_inter = F.round(
            F.when(
                F.col("k_used") < k, F.coalesce("n_common", F.lit(0)).cast("double")
            ).otherwise(
                (F.coalesce("n_common", F.lit(0)).cast("double") / float(k))
                * (
                    (float(k - 1) * 1152921504606846976.0)
                    / F.col("theta").cast("double")
                )
            ),
            2,
        )
        return (
            pair_stats.join(c, ["type_a", "type_b"], "left")
            .select("type_a", "type_b", "k_used", est_inter.alias("est_inter"))
            .join(F.broadcast(exact), ["type_a", "type_b"], "left")
            .select(
                "type_a",
                "type_b",
                "k_used",
                "est_inter",
                F.coalesce("exact_inter", F.lit(0)).alias("exact_inter"),
                F.when(F.coalesce("exact_inter", F.lit(0)) == 0, F.lit(None)).otherwise(
                    F.round(
                        F.abs(
                            F.col("est_inter") / F.col("exact_inter").cast("double")
                            - 1.0
                        ),
                        4,
                    )
                ).alias("rel_err"),
            )
            .orderBy("type_a", "type_b")
        )


_register_l25()
_register_l26()
