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
from spark_streaming_logservice_spark.operators.text import spread_rowlocal
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
    return vocab_topk(
        spread_rowlocal(load_table(spark, sf_dir, "documents").select("text"))
    )


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
    return bpe_pair_counts(
        spread_rowlocal(load_table(spark, sf_dir, "documents").select("text"))
    )


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
    docs = spread_rowlocal(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
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
    # sum off `ranked` (pinned inside distributed_row_number), not `freq`
    # — the latter re-runs the corpus tokenize + token-count aggregate for
    # one scalar (guide §2.4; d_r_n is 1:1, cnt preserved)
    total = ranked.agg(F.sum("cnt").cast("double").alias("n"))
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


# --- v06: BPE merge application (two unrolled trainer rounds) ---------------
# v02 computes the statistic a BPE trainer maximizes; v06 executes the
# trainer's actual step, twice: pick the most frequent adjacent pair
# (w1 <> w2, lexicographic tiebreak), rewrite every document ROW-LOCALLY
# replacing each occurrence with the merged token "w1_w2", recount, repeat.
# With w1 <> w2 occurrences can never overlap (a start at i and i+1 would
# need a[i+1] = w2 = w1), so the greedy left-to-right merge equals the
# simultaneous merge and is expressible as a pure index transform — no
# sequential state, no UDF.
#
# Shape per round: one pair-keyed wordcount aggregate (the v02 bound), a
# 1-row driver round-trip for the argmax pair (k-rows-by-construction, the
# IVF-centroid discipline), then a row-local array rewrite. At 100 TB each
# round is one shuffle over the (partial-agg-collapsed) pair vocabulary
# plus a full row-local pass — the same cost profile as the real trainers.

_MERGE_ROUNDS = 2


def _adjacent_pairs(docs: DataFrame, arr: str = "a") -> DataFrame:
    return docs.select(
        F.explode(
            F.when(F.size(arr) < 2, F.array().cast("array<struct<w1:string,w2:string>>"))
            .otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size(arr) - 1),
                    lambda i: F.struct(
                        F.element_at(F.col(arr), i).alias("w1"),
                        F.element_at(F.col(arr), i + 1).alias("w2"),
                    ),
                )
            )
        ).alias("p")
    ).select("p.w1", "p.w2")


def apply_bpe_merge(docs: DataFrame, w1: str, w2: str, arr: str = "a") -> DataFrame:
    """Replace every adjacent (w1, w2) with 'w1_w2' in the token-array
    column — row-local, non-overlap guaranteed by w1 != w2."""
    assert w1 != w2, "overlap-free simultaneous merge requires distinct tokens"
    a = F.col(arr)
    merged = F.filter(
        F.transform(
            F.when(F.size(arr) >= 1, F.sequence(F.lit(1), F.size(arr)))
            .otherwise(F.array().cast("array<int>")),
            lambda i: F.when(
                (F.element_at(a, i) == w1)
                & (i < F.size(arr))
                & (F.element_at(a, i + 1) == w2),
                F.lit(f"{w1}_{w2}"),
            )
            .when(
                (i > 1)
                & (F.element_at(a, i - 1) == w1)
                & (F.element_at(a, i) == w2),
                F.lit(None).cast("string"),
            )
            .otherwise(F.element_at(a, i)),
        ),
        lambda x: x.isNotNull(),
    )
    return docs.withColumn(arr, merged)


def _duck_merge_round(src: str, top: str, out: str) -> str:
    """One oracle merge round: pick argmax pair from ``src``, rewrite into
    ``out`` (same index-transform as the Spark side)."""
    return f"""
    {top} AS (
      SELECT w1, w2 FROM (
        SELECT a[i] AS w1, a[i + 1] AS w2, count(*) AS c
        FROM {src}, UNNEST(range(1, greatest(len(a), 1))) AS u(i)
        GROUP BY 1, 2
      ) WHERE w1 <> w2
      ORDER BY c DESC, w1, w2 LIMIT 1
    ), {out} AS (
      SELECT doc_id,
             list_filter(
               list_transform(range(1, len(a) + 1),
                 i -> CASE
                        WHEN a[i] = t.w1 AND i < len(a) AND a[i + 1] = t.w2
                          THEN t.w1 || '_' || t.w2
                        WHEN i > 1 AND a[i - 1] = t.w1 AND a[i] = t.w2
                          THEN NULL
                        ELSE a[i]
                      END),
               x -> x IS NOT NULL) AS a
      FROM {src} CROSS JOIN {top} t
    )"""


def _register_v06() -> None:
    from spark_streaming_logservice_spark.registry import query
    from spark_streaming_logservice_spark.tables import load_table

    oracle = f"""
    WITH tok0 AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS a
      FROM documents
    ),{_duck_merge_round("tok0", "top1", "tok1")},{_duck_merge_round("tok1", "top2", "tok2")}
    SELECT w1, w2, cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, w1, w2) AS INTEGER) AS rk
    FROM (
      SELECT a[i] AS w1, a[i + 1] AS w2, count(*) AS cnt
      FROM tok2, UNNEST(range(1, greatest(len(a), 1))) AS u(i)
      GROUP BY 1, 2
    )
    ORDER BY cnt DESC, w1, w2 LIMIT 10
    """

    @query("v06_bpe_merge_rounds", oracle=oracle)
    def v06_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Pair statistics after two executed BPE merge rounds; the merged
        tokens ('x_y') surface in the final top-10 wherever frequent."""
        d = spread_rowlocal(
            load_table(spark, sf_dir, "documents")
        ).select(
            "doc_id",
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda t: t != ""
            ).alias("a"),
        )
        # NOTE (r15 A/B, reverted — the d23 counter-rule): pinning the
        # token arrays per merge round (localCheckpoint on tok0 and after
        # each apply_bpe_merge) runs tokenize/merge exactly once each but
        # measured SLOWER (1.80 → 1.99 s at sf0.1): materializing the
        # corpus's wide string arrays to RDD rows costs more than the
        # re-tokenize it saves, the same trade d23's pre-cap checkpoint
        # lost in r14. Recompute-per-round stands.
        for _ in range(_MERGE_ROUNDS):
            top = (
                _adjacent_pairs(d)
                .groupBy("w1", "w2")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(F.col("w1") != F.col("w2"))
                .orderBy(F.desc("c"), F.asc("w1"), F.asc("w2"))
                .limit(1)
                .first()
            )
            d = apply_bpe_merge(d, top["w1"], top["w2"])
        counts = (
            _adjacent_pairs(d)
            .groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        head = counts.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2")).limit(10)
        w = Window.orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        return head.withColumn("rk", F.row_number().over(w)).orderBy("rk")


_register_v06()


# --- v07: BM25 retrieval scoring --------------------------------------------
# The lexical-retrieval scorer (Robertson–Spärck Jones; Lucene's idf form):
# score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen)).
# Shape: ONE corpus tokenization feeds both the per-doc length aggregate and
# the (doc, term) tf relation (term filter applied post-explode, so the
# term-filtered branch is tiny); df/N/avglen are O(terms)/scalar aggregates
# broadcast back. At 100 TB this is the classic map-side-join scorer — the
# corpus streams once, every model relation is small.

BM25_TERMS = ("join", "scan", "window")
BM25_K1 = 1.2
BM25_B = 0.75


def _register_v07() -> None:
    from spark_streaming_logservice_spark.registry import query
    from spark_streaming_logservice_spark.tables import load_table

    terms_sql = ", ".join(f"'{t}'" for t in BM25_TERMS)
    oracle = f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS token
      FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS len FROM tok GROUP BY doc_id
    ), corpus AS (
      SELECT count(*) AS n, avg(CAST(len AS DOUBLE)) AS avglen FROM dl
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM tok
      WHERE token IN ({terms_sql})
      GROUP BY doc_id, token
    ), df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ), scored AS (
      SELECT t.doc_id,
             sum(
               ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1)
               * t.tf * ({BM25_K1} + 1)
               / (t.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * l.len / c.avglen))
             ) AS score,
             count(*) AS n_terms_hit
      FROM tf t
      JOIN df d ON d.token = t.token
      JOIN dl l ON l.doc_id = t.doc_id
      CROSS JOIN corpus c
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_terms_hit, round(score, 4) AS bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """

    @query("v07_bm25_scoring", oracle=oracle)
    def v07_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "").alias(
                "a"
            ),
        )
        tok = d.select("doc_id", F.explode("a").alias("token"))
        dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
        corpus = dl.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("len").cast("double")).alias("avglen"),
        )
        tf = (
            tok.where(F.col("token").isin(*BM25_TERMS))
            .groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        df_rel = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(
            ((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)) + 1
        )
        contrib = (
            tf.join(F.broadcast(df_rel), "token")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(corpus))
            .select(
                "doc_id",
                (
                    idf
                    * F.col("tf")
                    * (BM25_K1 + 1)
                    / (
                        F.col("tf")
                        + BM25_K1
                        * (1 - BM25_B + BM25_B * F.col("len") / F.col("avglen"))
                    )
                ).alias("c"),
            )
        )
        return (
            contrib.groupBy("doc_id")
            .agg(
                F.round(F.sum("c"), 4).alias("bm25"),
                F.count(F.lit(1)).alias("n_terms_hit"),
            )
            .select("doc_id", "n_terms_hit", "bm25")
            .orderBy(F.desc("bm25"), F.asc("doc_id"))
            .limit(20)
        )


_register_v07()


# --- v08: Heaps'-law vocabulary growth fit ----------------------------------
# The companion corpus-health statistic to v05's Zipf slope: vocabulary size
# grows as V(N) ≈ K·N^β (Heaps' law, β ≈ 0.4-0.6 for natural text); a
# degenerate β flags template/duplicated corpora before training.
#
# The naive computation — cumulative distinct tokens in corpus order — is a
# corpus-ordered global window (the v04-class scale killer). Instead:
# growth is SAMPLED at K fixed doc_id checkpoints; N(c) = Σ tokens of docs
# ≤ c and V(c) = #tokens whose FIRST-SEEN doc (min doc_id, one token-keyed
# agg — the t15 relation) is ≤ c both come from one conditional aggregate
# against the broadcast checkpoint list. No ordered window anywhere; the
# regression runs over K points.

HEAPS_CHECKPOINTS = 20


@query(
    "v08_heaps_law",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS token
      FROM documents
    ), doc_n AS (
      SELECT doc_id, count(*) AS n_toks FROM tok GROUP BY doc_id
    ), fs AS (
      SELECT token, min(doc_id) AS d0 FROM tok GROUP BY token
    ), bounds AS (
      SELECT max(doc_id) AS mx FROM documents
    ), cps AS (
      SELECT CAST(mx * k / {HEAPS_CHECKPOINTS} AS BIGINT) AS c
      FROM bounds, (SELECT unnest(range(1, {HEAPS_CHECKPOINTS} + 1)) AS k)
    ), pts AS (
      SELECT c,
             (SELECT CAST(sum(n_toks) AS BIGINT) FROM doc_n WHERE doc_id <= c)
               AS n_total,
             (SELECT count(*) FROM fs WHERE d0 <= c) AS v_size
      FROM cps
    )
    SELECT count(*) AS n_points,
           round(regr_slope(ln(v_size), ln(n_total)), 4) AS beta,
           round(exp(regr_intercept(ln(v_size), ln(n_total))), 4) AS k_coef,
           round(regr_r2(ln(v_size), ln(n_total)), 4) AS r2
    FROM pts WHERE n_total > 0 AND v_size > 0
    """,
)
def v08_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("token"),
    )
    doc_n = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    fs = tok.groupBy("token").agg(F.min("doc_id").alias("d0"))
    bounds = d.agg(F.max("doc_id").alias("mx"))
    cps = (
        bounds.select(
            F.explode(
                F.sequence(F.lit(1), F.lit(HEAPS_CHECKPOINTS))
            ).alias("k"),
            "mx",
        )
        .select(
            (F.col("mx") * F.col("k") / HEAPS_CHECKPOINTS)
            .cast("bigint")
            .alias("c")
        )
    )
    n_at = (
        F.broadcast(cps)
        .join(doc_n, doc_n["doc_id"] <= F.col("c"))
        .groupBy("c")
        .agg(F.sum("n_toks").alias("n_total"))
    )
    v_at = (
        F.broadcast(cps)
        .join(fs, fs["d0"] <= F.col("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("v_size"))
    )
    pts = (
        n_at.join(v_at, "c")
        .where((F.col("n_total") > 0) & (F.col("v_size") > 0))
        .select(
            F.log("v_size").alias("ly"), F.log("n_total").alias("lx")
        )
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.regr_slope(F.col("ly"), F.col("lx")), 4).alias("beta"),
        F.round(
            F.exp(F.regr_intercept(F.col("ly"), F.col("lx"))), 4
        ).alias("k_coef"),
        F.round(F.regr_r2(F.col("ly"), F.col("lx")), 4).alias("r2"),
    )


# --- v09: tokenizer fertility / compression by source ------------------------
# Tokenizer-efficiency report: how many characters and whitespace words does
# one BPE-regex token cover, per source? Fertility (BPE tokens per word) and
# compression (chars per BPE token) are the two numbers a tokenizer eval
# tracks — a source with low compression (code, tables) costs more context
# budget per byte. Row-local token counting (t03's regex + the whitespace
# split) feeds one source-keyed aggregate of INTEGER sums; the two ratios
# derive from exact integers, so the report is deterministic at any
# partitioning. One corpus scan, one tiny shuffle.

def _register_v09() -> None:
    from spark_streaming_logservice_spark.operators.text import (
        TOKEN_RE,
        spread_rowlocal,
    )

    oracle = f"""
    WITH per AS (
      SELECT source,
             length(text) AS n_chars,
             len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_bpe,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_words
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_bpe) AS BIGINT) AS total_bpe_tokens,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           round(CAST(sum(n_chars) AS DOUBLE) / sum(n_bpe), 4)
             AS chars_per_token,
           round(CAST(sum(n_bpe) AS DOUBLE) / sum(n_words), 4) AS fertility
    FROM per
    GROUP BY source
    ORDER BY source
    """

    @query("v09_tokenizer_fertility", oracle=oracle)
    def v09_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
        per = d.select(
            "source",
            F.length("text").alias("n_chars"),
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0)
            ).alias("n_bpe"),
            F.size(
                F.filter(F.split(F.col("text"), " "), lambda t: t != "")
            ).alias("n_words"),
        )
        return (
            per.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
                F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
                F.sum("n_words").cast("bigint").alias("total_words"),
                F.round(
                    F.sum("n_chars").cast("double") / F.sum("n_bpe"), 4
                ).alias("chars_per_token"),
                F.round(
                    F.sum("n_bpe").cast("double") / F.sum("n_words"), 4
                ).alias("fertility"),
            )
            .orderBy("source")
        )


_register_v09()


# --- v10: cross-source vocabulary overlap (set Jaccard) ----------------------
# t14 compares source token DISTRIBUTIONS (divergence); this compares the
# SETS — "do these two crawls even speak the same vocabulary" — the
# source-pair Jaccard of distinct token vocabularies, the first number a
# mixture designer checks before weighting sources together.
#
# 100 TB shape: the d19 count-algebra pattern — the corpus collapses to the
# distinct (source, token) relation (one keyed aggregate with map-side
# combine), per-source sizes are O(sources) rows, and the intersection
# counts come from ONE token-keyed self-join of the per-source vocabulary
# whose fan-out per token is bounded by |sources|, never by corpus rows.
# No doc-pair or token-pair explosion anywhere; 4-dp Jaccard is integer
# half-up division.

def _register_v10() -> None:
    oracle = """
    WITH st AS (
      SELECT DISTINCT source, token FROM (
        SELECT source, unnest(string_split(lower(text), ' ')) AS token
        FROM documents
      ) WHERE token <> ''
    ), sz AS (
      SELECT source, count(*) AS n_tok FROM st GROUP BY source
    ), inter AS (
      SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_inter
      FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT i.source_a, i.source_b, i.n_inter,
           sa.n_tok AS n_tok_a, sb.n_tok AS n_tok_b,
           CAST((20000 * i.n_inter + (sa.n_tok + sb.n_tok - i.n_inter))
                // (2 * (sa.n_tok + sb.n_tok - i.n_inter)) AS DOUBLE)
             / 10000.0 AS jaccard
    FROM inter i
      JOIN sz sa ON sa.source = i.source_a
      JOIN sz sb ON sb.source = i.source_b
    ORDER BY jaccard DESC, i.source_a, i.source_b
    LIMIT 30
    """

    @query("v10_vocab_overlap", oracle=oracle)
    def v10_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
        st = (
            d.select(
                "source",
                F.explode(
                    F.filter(
                        F.split(F.lower("text"), " "),
                        lambda t: t != F.lit(""),
                    )
                ).alias("token"),
            )
            .distinct()
        )
        sz = st.groupBy("source").agg(F.count(F.lit(1)).alias("n_tok"))
        a = st.alias("a")
        b = st.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.token") == F.col("b.token"))
                & (F.col("a.source") < F.col("b.source")),
            )
            .groupBy(
                F.col("a.source").alias("source_a"),
                F.col("b.source").alias("source_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sa = sz.alias("sa")
        sb = sz.alias("sb")
        jac = F.expr(
            "(20000 * n_inter + (n_tok_a + n_tok_b - n_inter))"
            " DIV (2 * (n_tok_a + n_tok_b - n_inter))"
        )
        return (
            inter.join(sa, F.col("source_a") == F.col("sa.source"))
            .join(sb, F.col("source_b") == F.col("sb.source"))
            .select(
                "source_a",
                "source_b",
                "n_inter",
                F.col("sa.n_tok").alias("n_tok_a"),
                F.col("sb.n_tok").alias("n_tok_b"),
            )
            .select(
                "source_a",
                "source_b",
                "n_inter",
                "n_tok_a",
                "n_tok_b",
                (jac.cast("double") / F.lit(10000.0)).alias("jaccard"),
            )
            .orderBy(F.desc("jaccard"), F.asc("source_a"), F.asc("source_b"))
            .limit(30)
        )


_register_v10()


# --- v11: character-bigram entropy --------------------------------------------
# Compressibility proxy per source: the Shannon entropy (nats) of the
# character-bigram distribution. Low entropy = repetitive/templated text
# (compresses well, weak training signal); entropy near the uniform bound
# = diverse prose. The gzip-ratio heuristic of quality filtering without
# external codecs — pure SQL over positional substrings.
#
# Determinism: bigram counts are exact BIGINTs; each distribution term
# c·ln(c) is computed from the same integer on both engines and quantized
# to 1e-6 integer units PER BIGRAM before the associative BIGINT sum
# (the t10 ln posture); entropy = ln(N) − S/(1e6·N) with one final 4-dp
# half-up rounding on identical inputs.
#
# 100 TB shape: the positional explode is row-local (length(text)−1 rows
# per doc); the only corpus-sized shuffle is the (source, bigram)
# aggregate (map-side combined, ≤ alphabet² distinct keys per source);
# everything after runs on the O(sources × alphabet²) rollup.


def _register_v11() -> None:
    from pyspark.sql import SparkSession

    from spark_streaming_logservice_spark.registry import query

    oracle = """
    WITH bg AS (
      SELECT source, substr(text, CAST(i AS INTEGER), 2) AS bigram
      FROM documents
        CROSS JOIN LATERAL unnest(range(1, length(text))) AS t(i)
      WHERE length(text) >= 2
    ), bc AS (
      SELECT source, bigram, count(*) AS c
      FROM bg GROUP BY source, bigram
    ), st AS (
      SELECT source,
             sum(c) AS n,
             count(*) AS n_distinct,
             sum(CAST(floor(c * ln(c) * 1e6 + 0.5) AS BIGINT)) AS s_units
      FROM bc GROUP BY source
    )
    SELECT source,
           CAST(n AS BIGINT) AS n_bigrams,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           round(ln(n) - CAST(s_units AS DOUBLE) / (1e6 * n) + 0.0, 4)
             AS entropy_nats
    FROM st
    ORDER BY source
    """

    @query("v11_char_bigram_entropy", oracle=oracle)
    def v11_char_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
        from spark_streaming_logservice_spark.operators.text import (
            spread_rowlocal,
        )

        d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
        bg = d.where(F.length("text") >= 2).select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 1), "
                    "i -> substr(text, i, 2))"
                )
            ).alias("bigram"),
        )
        bc = bg.groupBy("source", "bigram").agg(F.count(F.lit(1)).alias("c"))
        st = bc.groupBy("source").agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.floor(
                    F.col("c") * F.log(F.col("c").cast("double")) * 1e6
                    + 0.5
                ).cast("bigint")
            ).alias("s_units"),
        )
        return st.select(
            "source",
            F.col("n").cast("bigint").alias("n_bigrams"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            F.round(
                F.log(F.col("n").cast("double"))
                - F.col("s_units").cast("double") / (F.lit(1e6) * F.col("n"))
                + F.lit(0.0),
                4,
            ).alias("entropy_nats"),
        ).orderBy("source")


_register_v11()
