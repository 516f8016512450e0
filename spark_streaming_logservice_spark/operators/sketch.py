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

from pyspark.sql import Column, DataFrame, SparkSession
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
