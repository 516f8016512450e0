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
