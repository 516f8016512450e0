"""Vocabulary-construction operators for a training-data pipeline:
corpus-level token frequency (the input to any tokenizer build) and
adjacent-pair counting (the first merge iteration of byte-pair encoding,
Sennrich et al. 2016).

Spark-first shape: tokens come from the same space-split the text family
uses (operators/text.py), pairs are generated ROW-LOCALLY from the token
array (no window, no self-join — ``transform(sequence(...))`` over the
array indices), and both operators end in one explode + one groupBy:
a single shuffle keyed by token/pair with map-side partial aggregation.
The top-N head is ``orderBy().limit()`` — Spark plans TakeOrdered (per
partition heap + driver merge of N), never a global sort; the rank window
runs on the N-row result, not the corpus.

100 TB notes: the aggregate's key space is the vocabulary (millions), not
the corpus (billions) — partial aggregation collapses each partition to
its local vocab before the shuffle, so shuffle volume is O(partitions ×
local_vocab), the classic wordcount bound. No broadcast, no driver
collect; min_count pruning happens post-agg where the data is already
tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.operators.pipeline_ops import (
    distributed_row_number,
)
from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

MIN_COUNT = 5
TOP_WORDS = 100
TOP_PAIRS = 50

_TOKENS = "filter(split(lower(text), ' '), t -> t != '')"


def vocab_topk(docs: DataFrame, min_count: int = MIN_COUNT, n: int = TOP_WORDS) -> DataFrame:
    """(token, cnt, rk): corpus token frequencies with a min-count floor,
    top-``n`` by count DESC / token ASC."""
    counts = (
        docs.select(F.explode(F.expr(_TOKENS)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    head = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(n)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return head.withColumn("rk", F.row_number().over(w)).orderBy("rk")


def bpe_pair_counts(docs: DataFrame, n: int = TOP_PAIRS) -> DataFrame:
    """(w1, w2, cnt, rk): adjacent-token pair frequencies — the statistic
    a BPE trainer maximizes on each merge step. Pair generation is
    row-local over the token array."""
    pairs = docs.select(
        F.explode(
            F.expr(
                f"CASE WHEN size({_TOKENS}) < 2 THEN array() "
                f"ELSE transform(sequence(1, size({_TOKENS}) - 1), "
                f"i -> struct(element_at({_TOKENS}, i) AS w1, "
                f"element_at({_TOKENS}, i + 1) AS w2)) END"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    head = counts.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2")).limit(n)
    w = Window.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
    return head.withColumn("rk", F.row_number().over(w)).orderBy("rk")


@query(
    "v01_vocab_topk",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
        FROM documents
    ),
    counts AS (
        SELECT token, count(*) AS cnt FROM tok GROUP BY token
        HAVING count(*) >= {MIN_COUNT}
    )
    SELECT token, cnt, CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS INTEGER) AS rk
    FROM counts ORDER BY cnt DESC, token ASC LIMIT {TOP_WORDS}
    """,
)
def v01_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_topk(load_table(spark, sf_dir, "documents").select("text"))


@query(
    "v02_bpe_pair_counts",
    oracle=f"""
    WITH tk AS (
        SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        FROM documents
    ),
    pairs AS (
        SELECT tk[i] AS w1, tk[i + 1] AS w2
        FROM tk, UNNEST(range(1, len(tk))) AS u(i)
    ),
    counts AS (
        SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY w1, w2
    )
    SELECT w1, w2, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, w1 ASC, w2 ASC) AS INTEGER) AS rk
    FROM counts ORDER BY cnt DESC, w1 ASC, w2 ASC LIMIT {TOP_PAIRS}
    """,
)
def v02_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_pair_counts(load_table(spark, sf_dir, "documents").select("text"))


# --- v03: TF-IDF top terms per document ------------------------------------

TFIDF_TOP = 3


@query(
    "v03_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS token
        FROM documents
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.token,
               tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, round(tfidf, 6) AS tfidf, rk FROM (
        SELECT doc_id, token, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, token ASC
               ) AS INTEGER) AS rk
        FROM scored
    ) WHERE rk <= {TFIDF_TOP}
    ORDER BY doc_id, rk
    """,
)
def v03_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} TF-IDF terms per document (smoothed idf, sklearn's
    ln((N+1)/(df+1))+1): the classic relevance/keyword-extraction statistic.

    Scale shape: tf is one (doc_id, token) shuffle with partial agg; df is
    one token shuffle over the already-aggregated tf relation (never
    re-reads the corpus); the tf-df join is token-keyed shuffle hash (both
    sides are aggregates, co-partitioned by the join key); N arrives as a
    1-row broadcast. The per-doc rank filter compiles to WindowGroupLimit,
    so only k rows per doc survive to the final shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .join(F.broadcast(n), how="cross")
        .select(
            "doc_id",
            "token",
            (
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOP)
        .select("doc_id", "token", F.round("tfidf", 6).alias("tfidf"), "rk")
        .orderBy("doc_id", "rk")
    )


# --- v04: vocabulary coverage curve -----------------------------------------
# Tokenizer sizing: what fraction of all corpus token OCCURRENCES does a
# top-N vocabulary cover (equivalently 1 - OOV rate at vocab size N)?
# One wordcount shuffle builds the frequency relation; rank + cumulative sum
# then run DISTRIBUTED via distributed_row_number (range-partition on
# (cnt DESC, token), per-range local rank/cumsum, broadcast prefix offsets)
# — a 100 TB corpus has 1e8-1e9 distinct tokens, so a partition-less
# cumulative window would funnel the whole vocabulary through ONE task
# (r5's bench-tail WindowExec warning was exactly this query). The 1-row
# total joins in as a broadcast.

_CUTS = (5, 10, 25, 50, 100, 1000)


@query(
    "v04_vocab_coverage",
    oracle=f"""
    WITH freq AS (
      SELECT token, count(*) AS cnt
      FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) AS token
            FROM documents)
      GROUP BY token
    ), ranked AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rk,
             sum(cnt) OVER (ORDER BY cnt DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM freq
    ), total AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM freq)
    SELECT CAST(rk AS INTEGER) AS vocab_size,
           round(cum / (SELECT n FROM total), 6) AS coverage
    FROM ranked
    WHERE rk IN {_CUTS}
    ORDER BY vocab_size
    """,
)
def v04_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = distributed_row_number(
        freq,
        [F.desc("cnt"), F.asc("token")],
        out="rk",
        cumsum_col="cnt",
        cumsum_out="cum",
    )
    total = freq.agg(F.sum("cnt").cast("double").alias("n"))
    return (
        ranked.where(F.col("rk").isin(*_CUTS))
        .crossJoin(F.broadcast(total))
        .select(
            F.col("rk").cast("int").alias("vocab_size"),
            F.round(F.col("cum") / F.col("n"), 6).alias("coverage"),
        )
        .orderBy("vocab_size")
    )


# --- t12 (vocab family): Zipf-law slope fit ---------------------------------
# Corpus-health statistic: the log-log slope of frequency vs rank over the
# head of the vocabulary (natural text sits near -1; synthetic or heavily
# deduplicated corpora drift). One wordcount shuffle, TakeOrdered head, and
# a closed-form least-squares fit via regr_slope/regr_r2 — both engines
# implement the identical ANSI aggregates. The rank window runs over the
# 100-row head only (post-LIMIT), never the full vocabulary.

ZIPF_HEAD = 100


@query(
    "v05_zipf_slope",
    oracle=f"""
    WITH freq AS (
      SELECT token, count(*) AS cnt
      FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
                                      t -> t <> '')) AS token
            FROM documents)
      GROUP BY token
    ), head AS (
      SELECT cnt FROM freq ORDER BY cnt DESC, token LIMIT {ZIPF_HEAD}
    ), ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC) AS rk FROM head
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tokens,
           round(regr_slope(ln(cnt), ln(rk)), 4) AS zipf_slope,
           round(regr_r2(ln(cnt), ln(rk)), 4) AS fit_r2
    FROM ranked
    """,
)
def v05_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    head = freq.orderBy(F.desc("cnt"), F.asc("token")).limit(ZIPF_HEAD)
    ranked = head.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.desc("cnt")))
    )
    ln_cnt = F.log(F.col("cnt").cast("double"))
    ln_rk = F.log(F.col("rk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.regr_slope(ln_cnt, ln_rk), 4).alias("zipf_slope"),
        F.round(F.regr_r2(ln_cnt, ln_rk), 4).alias("fit_r2"),
    )
