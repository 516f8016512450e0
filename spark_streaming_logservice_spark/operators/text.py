"""Text-analysis operators over ``documents`` (north-star §2.5).

All hot-path expressions are built-in Spark SQL functions (JVM codegen —
split/transform/aggregate/regexp), no Python UDFs: at 100 TB these run inside
whole-stage codegen with full column pruning (only ``doc_id``/``text`` read
from parquet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

STOPWORDS = ("the", "a", "of", "to", "and")

# BPE-ish tokenizer regex: letter runs, digit runs, single other non-space.
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Marker words for the n-gram language-ID heuristic. Deterministic and
# engine-agnostic: score = count of marker-word hits per language.
LANG_MARKERS = {
    "en": ("the", "a", "data", "key"),
    "es": ("order", "part", "batch"),
    "de": ("window", "stream", "merge"),
    "fr": ("join", "filter", "query"),
    "zh": ("spark", "hash", "scan"),
}


def _toks() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def spread_rowlocal(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition to the core count ahead of a heavy row-local stage: a
    single parquet file scans as ONE partition on local[n], so interpreted
    token/ngram lambdas otherwise run near-sequentially (measured: v02's
    pair explode 9.0 s single-task at sf0.1 on local[32]).

    ``key=None`` (round-robin) is safe where every downstream aggregate is
    partition-order-insensitive — integer sums/counts, min/max, row-local
    projections — or runs over an exact integer relation whose own shuffle
    fixes the topology (t13's entropy, t14's KL).

    ``key="doc_id"`` (hash) additionally keeps each document's rows in ONE
    partition, so a per-doc FLOAT aggregate (t10/t11's avg log-prob, fed
    through broadcast model joins that preserve partitioning) still merges
    from a single partial — deterministic against the DuckDB oracle — and
    a following groupBy on the key reuses the partitioning (ClusteredDistribution
    is satisfied by any hash partition count: no second exchange).

    At 100 TB the scan already has thousands of partitions, so this is a
    NO-OP there (shuffling the raw corpus just to rebalance would be pure
    waste) — the repartition fires only when the source is under-parallel
    for the session's core count, i.e. the small-file local case."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, key) if key else df.repartition(par)


# --- t01: per-document stats (token count, length, stopword ratio) ---------

@query(
    "t01_text_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> ''
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(sum(length(token)) AS BIGINT) AS n_token_chars,
           round(avg(length(token)), 4) AS avg_token_len,
           round(CAST(count(*) FILTER (WHERE token IN {STOPWORDS!r}) AS DOUBLE)
                 / count(*), 4) AS stopword_ratio
    FROM toks t
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    LIMIT 200
    """,
)
def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"), key="doc_id")
    toks = d.select("doc_id", F.explode(_toks()).alias("token"))
    return (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.length("token")).alias("n_token_chars"),
            F.round(F.avg(F.length("token")), 4).alias("avg_token_len"),
            F.round(
                F.count(F.when(F.col("token").isin(*STOPWORDS), 1)).cast("double")
                / F.count("*"),
                4,
            ).alias("stopword_ratio"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


def quality_expr(text_col: str = "text") -> Column:
    """t02's composite quality score (length/punctuation/stopword mix) as a
    reusable row-local expression — also the curriculum difficulty key
    (p19)."""
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[.,!]", "")
    )
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return (
        F.least(n_chars.cast("double") / 500, F.lit(1.0)) * 0.5
        + (1 - n_punct.cast("double") / F.greatest(n_chars, F.lit(1))) * 0.3
        + F.least(
            n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)) * 5, F.lit(1.0)
        )
        * 0.2
    )


# DuckDB mirror of quality_expr, used by the t02 and p19 oracles.
QUALITY_SQL = (
    "least(CAST(length(text) AS DOUBLE) / 500, 1.0) * 0.5"
    " + (1 - CAST(length(text) - length(replace(replace(replace(text, '.', ''),"
    " ',', ''), '!', '')) AS DOUBLE)"
    " / greatest(length(text), 1)) * 0.3"
    " + least(CAST(len(list_filter(string_split(text, ' '),"
    f" t -> list_contains({list(STOPWORDS)!r}, t))) AS DOUBLE)"
    " / greatest(len(list_filter(string_split(text, ' '), t -> t <> '')), 1)"
    " * 5, 1.0) * 0.2"
)


# --- t02: quality score (length/punctuation/stopword composite) ------------

@query(
    "t02_quality_score",
    oracle=f"""
    WITH stats AS (
      SELECT doc_id,
             length(text) AS n_chars_q,
             length(text) - length(replace(replace(replace(text, '.', ''), ',', ''), '!', ''))
               AS n_punct,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                 t -> list_contains({list(STOPWORDS)!r}, t))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars_q, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(least(CAST(n_chars_q AS DOUBLE) / 500, 1.0) * 0.5
                 + (1 - CAST(n_punct AS DOUBLE) / greatest(n_chars_q, 1)) * 0.3
                 + least(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) * 5, 1.0) * 0.2,
                 4) AS quality
    FROM stats
    ORDER BY doc_id
    LIMIT 200
    """,
)
def t02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    n_chars = F.length("text")
    toks = _toks()
    n_tokens = F.size(toks)
    quality = quality_expr()
    return (
        d.select(
            "doc_id",
            n_chars.alias("n_chars_q"),
            n_tokens.cast("bigint").alias("n_tokens"),
            F.round(quality, 4).alias("quality"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


# --- t03: BPE-ish regex token counting -------------------------------------

@query(
    "t03_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_chars_est
    FROM documents
    ORDER BY doc_id
    LIMIT 200
    """,
)
def t03_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0))
            .cast("bigint")
            .alias("n_bpe_tokens"),
            F.ceil(F.length("text") / 4.0).cast("bigint").alias("n_chars_est"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


# --- t04: document fingerprint (normalized bag-of-words hash) --------------

@query(
    "t04_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(lower(text), ' '), t -> t <> ''))), ' '))
             AS fingerprint
    FROM documents
    ORDER BY doc_id
    LIMIT 200
    """,
)
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    norm = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        )
    )
    return (
        d.select(
            "doc_id", F.md5(F.concat_ws(" ", norm)).alias("fingerprint")
        )
        .orderBy("doc_id")
        .limit(200)
    )


# --- t05: language-ID heuristic (marker-word scoring) ----------------------

def _duckdb_langid_sql() -> str:
    score_cols = ",\n           ".join(
        f"len(list_filter(string_split(text, ' '), t -> list_contains({list(words)!r}, t))) AS sc_{lang}"
        for lang, words in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    # argmax with lexicographic tie-break: pick first lang (in sorted order)
    # whose score equals the row max.
    sorted_langs = sorted(langs)
    best = "CASE "
    for lang in sorted_langs:
        best += (
            f"WHEN sc_{lang} = greatest("
            + ", ".join(f"sc_{x}" for x in langs)
            + f") THEN '{lang}' "
        )
    best += "END"
    return f"""
    WITH scored AS (
      SELECT doc_id, lang,
           {score_cols}
      FROM documents
    )
    SELECT lang, {best} AS pred_lang, count(*) AS n
    FROM scored
    GROUP BY lang, pred_lang
    ORDER BY lang, pred_lang
    """


# --- t06: repetition / boilerplate metrics (Gopher-style) ------------------
# Three classic repetition signals from the Gopher data-quality rules
# (Rae et al. 2021, "Scaling Language Models", table A1): fraction of
# all 2-grams occupied by the single most frequent 2-gram, fraction of
# 3-gram occurrences that are repeats, and duplicate-token fraction.
# High values flag boilerplate/spam documents before training.

@query(
    "t06_repetition_metrics",
    oracle="""
    WITH tk AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS tk
      FROM documents
    ), g2 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                    i -> tk[i] || ' ' || tk[i+1])) AS g
      FROM tk WHERE len(tk) >= 2
    ), a2 AS (
      SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
    ), m2 AS (
      SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS top_2gram_frac
      FROM a2 GROUP BY doc_id
    ), g3 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
      FROM tk WHERE len(tk) >= 3
    ), a3 AS (
      SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g
    ), m3 AS (
      SELECT doc_id,
             round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
                   / sum(c), 4) AS dup_3gram_frac
      FROM a3 GROUP BY doc_id
    ), tokm AS (
      SELECT doc_id,
             round(1 - CAST(len(list_distinct(tk)) AS DOUBLE)
                   / greatest(len(tk), 1), 4) AS dup_token_frac
      FROM tk
    )
    SELECT d.doc_id,
           coalesce(m2.top_2gram_frac, 0) AS top_2gram_frac,
           coalesce(m3.dup_3gram_frac, 0) AS dup_3gram_frac,
           tokm.dup_token_frac
    FROM documents d
      LEFT JOIN m2 ON m2.doc_id = d.doc_id
      LEFT JOIN m3 ON m3.doc_id = d.doc_id
      JOIN tokm ON tokm.doc_id = d.doc_id
    ORDER BY d.doc_id
    LIMIT 200
    """,
)
def t06_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition metrics. Gram counting is explode → two-level
    aggregation (distributed, map-side combine); the duplicate-token
    fraction stays a pure higher-order expression — no shuffle at all for
    that column. At 100 TB the join keys are doc_id (already the corpus
    partitioning), and nothing but (doc_id, fraction) rows shuffle."""
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    toks = _toks()

    def grams(n: int) -> Column:
        parts = lambda i: [F.element_at(F.col("tk"), i + j + 1) for j in range(n)]  # noqa: E731
        full = F.transform(
            F.sequence(F.lit(0), F.size(F.col("tk")) - n),
            lambda i: F.concat_ws(" ", *parts(i)),
        )
        return F.when(F.size(F.col("tk")) >= n, full).otherwise(
            F.array().cast("array<string>")
        )

    tk = d.select("doc_id", toks.alias("tk"))
    a2 = (
        tk.select("doc_id", F.explode(grams(2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m2 = a2.groupBy("doc_id").agg(
        F.round(F.max("c").cast("double") / F.sum("c"), 4).alias("top_2gram_frac")
    )
    a3 = (
        tk.select("doc_id", F.explode(grams(3)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m3 = a3.groupBy("doc_id").agg(
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c"),
            4,
        ).alias("dup_3gram_frac")
    )
    tokm = tk.select(
        "doc_id",
        F.round(
            1
            - F.size(F.array_distinct(F.col("tk"))).cast("double")
            / F.greatest(F.size(F.col("tk")), F.lit(1)),
            4,
        ).alias("dup_token_frac"),
    )
    return (
        d.select("doc_id")
        .join(m2, "doc_id", "left")
        .join(m3, "doc_id", "left")
        .join(tokm, "doc_id")
        .select(
            "doc_id",
            F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
            F.coalesce("dup_3gram_frac", F.lit(0.0)).alias("dup_3gram_frac"),
            "dup_token_frac",
        )
        .orderBy("doc_id")
        .limit(200)
    )


# --- t07: PII detection & redaction ----------------------------------------
# The corpus is synthetic and PII-free, so the query plants deterministic
# PII first (same pattern as d01's self-union fixture): emails on
# doc_id % 7, phone numbers on % 11, IPv4s on % 13. The redactor is the
# real operator under test — regex scrub + per-type counts, all JVM-side
# regexp expressions. Patterns are written to mean the same thing in Java
# regex (Spark) and RE2 (DuckDB).

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def redact_pii(text: Column) -> Column:
    """Scrub emails, then phones, then IPv4s (email first: its local part
    may contain digits-and-dots that the IP pattern would half-match)."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4, "<IP>")


@query(
    "t07_pii_redaction",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN 'reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com ok '
                  ELSE '' END
             || CASE WHEN doc_id % 11 = 0 THEN 'call 555-867-5309 now ' ELSE '' END
             || CASE WHEN doc_id % 13 = 0
                     THEN 'host 10.0.' || CAST(doc_id % 250 AS VARCHAR) || '.7 up '
                     ELSE '' END
             || text AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(
               regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_IPV4}'))
             AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(
               text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                     '{PII_PHONE}', '<PHONE>', 'g'),
                     '{PII_IPV4}', '<IP>', 'g')) AS clean_hash
    FROM seeded
    ORDER BY doc_id
    LIMIT 200
    """,
)
def t07_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit("reach user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.example.com ok "),
                ),
            ).otherwise(""),
            F.when(F.col("doc_id") % 11 == 0, F.lit("call 555-867-5309 now ")).otherwise(
                ""
            ),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit("host 10.0."),
                    (F.col("doc_id") % 250).cast("string"),
                    F.lit(".7 up "),
                ),
            ).otherwise(""),
            F.col("text"),
        ).alias("text"),
    )
    no_email = F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>")
    return (
        seeded.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(PII_EMAIL))
            .cast("bigint")
            .alias("n_emails"),
            F.regexp_count(F.col("text"), F.lit(PII_PHONE))
            .cast("bigint")
            .alias("n_phones"),
            # count IPs after email scrub: an email's host part must not
            # double-count as a near-IP (mirrored in the oracle)
            F.regexp_count(no_email, F.lit(PII_IPV4)).cast("bigint").alias("n_ips"),
            F.md5(redact_pii(F.col("text"))).alias("clean_hash"),
        )
        .orderBy("doc_id")
        .limit(200)
    )


@query("t05_langid_confusion", oracle=_duckdb_langid_sql())
def t05_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    def marker_count(words: tuple[str, ...]):
        ws = list(words)
        return F.size(F.filter(toks, lambda t: t.isin(ws)))

    scored = d.select(
        "doc_id",
        "lang",
        *[
            marker_count(words).alias(f"sc_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    row_max = F.greatest(*[F.col(f"sc_{x}") for x in langs])
    pred = None
    for lang in sorted(langs):
        cond = F.col(f"sc_{lang}") == row_max
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return (
        scored.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pred_lang")
    )


# --- t08: Gopher-style filter-rule verdicts --------------------------------
# t02 scores quality on a continuous scale; t08 is the other shape real
# pipelines use — hard per-rule pass/fail verdicts (Gopher/MassiveText
# repetition & length rules) plus the combined keep decision, so downstream
# stages can filter on a boolean and audits can attribute every drop to a
# specific rule.

RULE_MIN_TOKENS = 20
RULE_MAX_TOKENS = 100_000
RULE_MIN_MEAN_LEN = 2.0
RULE_MAX_MEAN_LEN = 10.0
RULE_MIN_DISTINCT_STOP = 2


@query(
    "t08_filter_rules",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, token
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE token <> ''
    ), stats AS (
      SELECT doc_id,
             count(*) AS n_tokens,
             avg(length(token)) AS mean_len,
             count(DISTINCT CASE WHEN token IN {STOPWORDS!r} THEN token END)
               AS n_stop_kinds
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
           n_tokens,
           round(mean_len, 4) AS mean_token_len,
           CAST(n_stop_kinds AS BIGINT) AS n_stop_kinds,
           n_tokens BETWEEN {RULE_MIN_TOKENS} AND {RULE_MAX_TOKENS} AS ok_count,
           mean_len BETWEEN {RULE_MIN_MEAN_LEN} AND {RULE_MAX_MEAN_LEN} AS ok_mean_len,
           n_stop_kinds >= {RULE_MIN_DISTINCT_STOP} AS ok_stopwords,
           (n_tokens BETWEEN {RULE_MIN_TOKENS} AND {RULE_MAX_TOKENS})
             AND (mean_len BETWEEN {RULE_MIN_MEAN_LEN} AND {RULE_MAX_MEAN_LEN})
             AND n_stop_kinds >= {RULE_MIN_DISTINCT_STOP} AS keep
    FROM stats
    ORDER BY doc_id
    LIMIT 300
    """,
)
def t08_filter_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule verdicts + combined keep flag. One explode + one grouped
    aggregation (map-side combined); the flags are plain comparisons on the
    aggregates, so the whole operator is a single shuffle on doc_id and
    stays inside whole-stage codegen at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(_toks()).alias("token"))
    stats = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(F.length("token")).alias("mean_len"),
        F.countDistinct(
            F.when(F.col("token").isin(*STOPWORDS), F.col("token"))
        ).alias("n_stop_kinds"),
    )
    ok_count = F.col("n_tokens").between(RULE_MIN_TOKENS, RULE_MAX_TOKENS)
    ok_mean = F.col("mean_len").between(RULE_MIN_MEAN_LEN, RULE_MAX_MEAN_LEN)
    ok_stop = F.col("n_stop_kinds") >= RULE_MIN_DISTINCT_STOP
    return (
        stats.select(
            "doc_id",
            "n_tokens",
            F.round("mean_len", 4).alias("mean_token_len"),
            "n_stop_kinds",
            ok_count.alias("ok_count"),
            ok_mean.alias("ok_mean_len"),
            ok_stop.alias("ok_stopwords"),
            (ok_count & ok_mean & ok_stop).alias("keep"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


@query(
    "t09_length_percentiles",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY n_chars), 6) AS p50,
           round(percentile_cont(0.9) WITHIN GROUP (ORDER BY n_chars), 6) AS p90,
           round(percentile_cont(0.99) WITHIN GROUP (ORDER BY n_chars), 6) AS p99
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def t09_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document-length distribution: exact interpolated
    percentiles (the corpus-curation statistic behind length filters).

    Both engines define percentile_cont/percentile identically (linear
    interpolation over the sorted group), so the oracle is exact. Scale:
    exact percentiles require the group's values together — one shuffle by
    lang; for 100 TB monitoring the approx_percentile sketch (l12's HLL
    cousin) is the mergeable map-side alternative, traded here for
    oracle-exactness."""
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("n_chars", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("n_chars", F.lit(0.99)), 6).alias("p99"),
        )
        .orderBy("lang")
    )


# --- t10: unigram language-model scoring ------------------------------------
# CCNet-style perplexity filtering, reduced to its distributed skeleton: fit
# a unigram LM over the corpus (one wordcount shuffle — the model IS the
# vocab relation), then score every document by its mean token surprisal
# -ln p(token). Low-probability-dense docs are the quality-filter rejects.
#
# 100 TB: the model relation is vocabulary-sized, so the score join is
# AQE-broadcastable when the vocab is small and a plain token-keyed shuffle
# join otherwise; in a production pipeline the fitted model would be
# checkpointed once and reused across scoring runs rather than recomputed
# (here it's inline so the operator is a self-contained query).

@query(
    "t10_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS token
      FROM documents
    ), model AS (
      SELECT token, count(*) AS cnt FROM tok GROUP BY token
    ), total AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM model
    )
    SELECT t.doc_id, count(*) AS n_tokens,
           round(avg(-ln(CAST(m.cnt AS DOUBLE) / (SELECT n FROM total))), 4)
             AS avg_neg_logp
    FROM tok t JOIN model m USING (token)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def t10_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"), key="doc_id")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("token"),
    )
    model = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = model.agg(F.sum("cnt").cast("double").alias("n"))
    nlp = -F.log(F.col("cnt").cast("double") / F.col("n"))
    return (
        tok.join(model, "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", nlp.alias("nlp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nlp"), 4).alias("avg_neg_logp"),
        )
        .orderBy("doc_id")
    )


# --- t11: bigram language-model scoring --------------------------------------
# One step up the n-gram ladder from t10: fit bigram transition counts over
# the corpus and score each document by its mean conditional surprisal
# -ln P(w2|w1), P estimated as c(w1,w2)/c(w1·) over observed bigrams. The
# standard fluency signal a unigram model can't see (word-order scrambles
# score identically under t10, poorly here).
#
# 100 TB: bigram extraction is row-local (an index-sequence transform over
# the token array — no join, no self-zip shuffle); the model is one
# (w1,w2)-keyed wordcount shuffle; context totals derive from the model
# relation (bigram-vocabulary-sized, never re-reads the corpus); scoring is
# one pair-keyed join. Everything stays in built-in expressions.

@query(
    "t11_bigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS arr
      FROM documents
    ), big AS (
      SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
      FROM (SELECT doc_id, arr, unnest(range(1, len(arr))) AS i FROM tok)
    ), model AS (
      SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2
    ), ctx AS (
      SELECT w1, CAST(sum(c12) AS DOUBLE) AS c1 FROM model GROUP BY w1
    )
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           round(avg(-ln(CAST(m.c12 AS DOUBLE) / x.c1)), 4) AS avg_neg_logp
    FROM big b
    JOIN model m USING (w1, w2)
    JOIN ctx x USING (w1)
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
)
def t11_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuckDB's range(1, n) is end-exclusive and empty for n<=1; Spark's
    sequence(1, n-1) DESCENDS when n-1 < 1, so the index list is guarded to
    an empty array for sub-2-token docs — both engines then drop those docs
    identically (no bigrams, inner join)."""
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"), key="doc_id")
    arr = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
    docs = d.select("doc_id", arr.alias("arr"))
    idx = F.when(
        F.size("arr") >= 2, F.sequence(F.lit(1), F.size("arr") - 1)
    ).otherwise(F.array().cast("array<int>"))
    big = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("arr", i).alias("w1"),
                    F.element_at("arr", i + 1).alias("w2"),
                ),
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    model = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = model.groupBy("w1").agg(F.sum("c12").cast("double").alias("c1"))
    nlp = -F.log(F.col("c12").cast("double") / F.col("c1"))
    return (
        big.join(model, ["w1", "w2"])
        .join(ctx, "w1")
        .select("doc_id", nlp.alias("nlp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nlp"), 4).alias("avg_neg_logp"),
        )
        .orderBy("doc_id")
    )


# --- t13: lexical diversity (type-token ratio + token entropy) -------------
# The vocabulary-richness quality signal: low TTR / low entropy flags
# template spam and keyword stuffing that raw length or repetition rules
# (t06) miss. Shape: explode → (doc_id, token) count → doc-keyed entropy
# fold — two shuffles, both the wordcount bound (partial aggregation
# absorbs token skew map-side); everything stays in whole-stage codegen.
# Entropy sums doubles across a doc's types, so parity is pinned at 4 dp
# (the repo's iterative-float discipline, same as t10/t11/g01).

@query(
    "t13_lexical_diversity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_types,
           round(count(*) / CAST(sum(c) AS DOUBLE), 6) AS ttr,
           round(ln(CAST(sum(c) AS DOUBLE))
                 - sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE),
                 4) AS entropy
    FROM tf
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def t13_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    tf = (
        d.select("doc_id", F.explode(_toks()).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # H = ln N - (sum c*ln c)/N: entropy from the SAME doc-keyed aggregate
    # that computes the counts — no per-doc window, two shuffles total
    n = F.sum("c").cast("double")
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.count(F.lit(1)) / n, 6).alias("ttr"),
            F.round(
                F.log(n) - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / n,
                4,
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


# --- t14: per-source distribution drift (KL divergence vs corpus) -----------
# Domain-mixing QA: how far each source's token distribution sits from the
# corpus mixture — the statistic behind "this crawl slice looks nothing
# like the rest" alerts. KL(p_src ‖ q_corpus) needs no smoothing because
# the corpus marginal includes every source (q > 0 wherever p > 0; p = 0
# terms vanish). Shape: one (source, token) wordcount shuffle; the corpus
# marginal RE-AGGREGATES those counts (corpus read once), joins back
# token-keyed (co-partitioned), one source-keyed fold. Float sums → 4 dp
# parity, the iterative-float discipline.

@query(
    "t14_source_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split(text, ' '), t -> t <> ''))
               AS token
      FROM documents
    ), st AS (
      SELECT source, token, count(*) AS c FROM tok GROUP BY source, token
    ), src_tot AS (
      SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM st GROUP BY source
    ), corp AS (
      SELECT token, CAST(sum(c) AS BIGINT) AS cc FROM st GROUP BY token
    ), corp_tot AS (
      SELECT CAST(sum(cc) AS BIGINT) AS n FROM corp
    )
    SELECT s.source,
           t.ns AS n_tokens,
           count(*) AS n_types,
           round(sum((s.c / CAST(t.ns AS DOUBLE))
                     * ln((s.c / CAST(t.ns AS DOUBLE))
                          / (corp.cc / CAST(ct.n AS DOUBLE)))), 4)
             AS kl_vs_corpus
    FROM st s
    JOIN src_tot t ON t.source = s.source
    JOIN corp ON corp.token = s.token
    CROSS JOIN corp_tot ct
    GROUP BY s.source, t.ns
    ORDER BY s.source
    """,
)
def t14_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    st = (
        d.select("source", F.explode(_toks()).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    src_tot = st.groupBy("source").agg(F.sum("c").alias("ns"))
    corp = st.groupBy("token").agg(F.sum("c").alias("cc"))
    corp_tot = corp.agg(F.sum("cc").alias("n"))
    p = F.col("c") / F.col("ns").cast("double")
    q = F.col("cc") / F.col("n").cast("double")
    return (
        st.join(src_tot, "source")
        .join(corp, "token")
        .crossJoin(F.broadcast(corp_tot))
        .select("source", "ns", (p * F.log(p / q)).alias("term"))
        .groupBy("source", "ns")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.sum("term"), 4).alias("kl_vs_corpus"),
        )
        .select(
            "source",
            F.col("ns").alias("n_tokens"),
            "n_types",
            "kl_vs_corpus",
        )
        .orderBy("source")
    )


# --- t15: n-gram novelty scoring -------------------------------------------
# Data-curation signal: how much of a document's 3-gram content is NEW
# relative to everything that came before it in corpus order (doc_id)?
# Boilerplate-heavy docs score near 0; fresh content near 1 — the
# streaming-corpus novelty filter (used to down-weight recycled text when
# assembling training mixtures).
#
# Spark-first: trigram construction is ROW-LOCAL (transform over the token
# array — no window, no self-join); "first seen" is one min-agg shuffled on
# the trigram key; the verdict joins back trigram-keyed. At 100 TB both
# shuffles are n-gram-keyed (high cardinality, naturally spread); nothing
# is quadratic in docs and no corpus-ordered window exists.

@query(
    "t15_ngram_novelty",
    oracle="""
    WITH tk AS (
      SELECT doc_id, source,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
      FROM documents
    ), tri AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(range(1, len(tk) - 1),
                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
      FROM tk WHERE len(tk) >= 3
    ), first_seen AS (
      SELECT g, min(doc_id) AS d0 FROM tri GROUP BY g
    ), per_doc AS (
      SELECT t.doc_id, t.source,
             count(*) AS n_tri,
             count(*) FILTER (WHERE f.d0 = t.doc_id) AS n_novel
      FROM tri t JOIN first_seen f ON f.g = t.g
      GROUP BY t.doc_id, t.source
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tri) AS BIGINT) AS total_tri,
           CAST(sum(n_novel) AS BIGINT) AS total_novel,
           round(sum(n_novel) / CAST(sum(n_tri) AS DOUBLE), 4) AS novelty_rate
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
)
def t15_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty: share of each doc's distinct trigrams whose
    first corpus appearance (min doc_id) is that doc itself."""
    d = spread_rowlocal(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    tk = d.select(
        "doc_id",
        "source",
        F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "").alias(
            "tk"
        ),
    ).where(F.size("tk") >= 3)
    tri = tk.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("tk") - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.col("tk"), i + 1),
                    F.element_at(F.col("tk"), i + 2),
                    F.element_at(F.col("tk"), i + 3),
                ),
            )
        ).alias("g"),
    ).distinct()
    first_seen = tri.groupBy("g").agg(F.min("doc_id").alias("d0"))
    per_doc = (
        tri.join(first_seen, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tri"),
            F.count(F.when(F.col("d0") == F.col("doc_id"), 1)).alias("n_novel"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tri").alias("total_tri"),
            F.sum("n_novel").alias("total_novel"),
            F.round(
                F.sum("n_novel") / F.sum("n_tri").cast("double"), 4
            ).alias("novelty_rate"),
        )
        .orderBy("source")
    )


# --- t16: overlapping context-window chunking --------------------------------
# The training/RAG chunker's planning pass: split each document's token
# stream into fixed-size windows (CHUNK_TOKENS, sized to the synthetic
# corpus's 10-100-token docs so the report is non-degenerate; a prod run
# would use 1024/768-class windows) advancing by CHUNK_STRIDE
# (< CHUNK, so consecutive windows overlap by CHUNK - STRIDE tokens — the
# standard HF return_overflowing_tokens semantics: one window if the doc
# fits, else 1 + ceil((n_tok - CHUNK)/STRIDE) windows, last one short).
# Reported per source: chunk counts and the token-duplication cost of the
# overlap (total chunked tokens / raw tokens).
#
# 100 TB shape: everything before the O(sources) aggregate is row-local
# integer arithmetic inside whole-stage codegen — no explode row blow-up
# (the per-window token counts fold in-row over a sequence), one scan, one
# partial-aggregated shuffle keyed by source. The 4-dp ratio is derived
# from the two exact bigint sums by integer half-up division, so the
# result is identical at any partitioning and in both engines.

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@query(
    "t16_overlap_chunking",
    oracle=f"""
    WITH d AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok
      FROM documents
    ), c AS (
      SELECT source, n_tok,
             CASE WHEN n_tok <= 0 THEN 0
                  ELSE 1 + (greatest(n_tok - {CHUNK_TOKENS}, 0)
                            + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}
             END AS n_chunks
      FROM d
    ), s AS (
      SELECT source, n_tok, n_chunks,
             CASE WHEN n_chunks = 0 THEN 0 ELSE
               list_sum(list_transform(range(0, CAST(n_chunks AS BIGINT)),
                 i -> least({CHUNK_TOKENS}, n_tok - i * {CHUNK_STRIDE})))
             END AS chunk_toks
      FROM c
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
           CAST(coalesce(sum(CASE WHEN n_chunks > 1 THEN 1 END), 0) AS BIGINT)
             AS multi_chunk_docs,
           CAST(sum(chunk_toks) AS BIGINT) AS total_chunk_tokens,
           ((20000 * CAST(sum(chunk_toks) AS BIGINT)
             + CAST(sum(n_tok) AS BIGINT))
            // (2 * CAST(sum(n_tok) AS BIGINT))) / 10000.0 AS overlap_ratio
    FROM s
    GROUP BY source
    ORDER BY source
    """,
)
def t16_overlap_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select("source", F.size(_toks()).alias("n_tok"))
    n_chunks = (
        F.when(F.col("n_tok") <= 0, F.lit(0))
        .otherwise(
            F.lit(1)
            + F.expr(
                f"(greatest(n_tok - {CHUNK_TOKENS}, 0) "
                f"+ {CHUNK_STRIDE - 1}) DIV {CHUNK_STRIDE}"
            )
        )
        .cast("bigint")
    )
    c = base.withColumn("n_chunks", n_chunks)
    # per-window token counts fold IN-ROW over the window-index sequence —
    # integer, no explode; sequence() is guarded (it descends when end <
    # start, the round-6 gotcha)
    chunk_toks = F.when(F.col("n_chunks") <= 0, F.lit(0).cast("bigint")).otherwise(
        F.aggregate(
            F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int")),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.least(
                F.lit(CHUNK_TOKENS), F.col("n_tok") - i * CHUNK_STRIDE
            ),
        )
    )
    s = c.withColumn("chunk_toks", chunk_toks)
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.sum("n_chunks").cast("bigint").alias("n_chunks"),
            F.coalesce(F.sum(F.when(F.col("n_chunks") > 1, 1)), F.lit(0))
            .cast("bigint")
            .alias("multi_chunk_docs"),
            F.sum("chunk_toks").cast("bigint").alias("total_chunk_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "n_chunks",
            "multi_chunk_docs",
            "total_chunk_tokens",
            (
                F.expr(
                    "(20000 * total_chunk_tokens + total_tokens) "
                    "DIV (2 * total_tokens)"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("overlap_ratio"),
        )
        .orderBy("source")
    )


# --- t18: quality deciles (perplexity-filter planning) ------------------------
# t10 scores each document's mean unigram surprisal; the filter DESIGN
# question is "where do I put the cutoff, and what do I lose": rank all
# documents by score and report each decile's population, score range and
# average length. Decile 0 = most predictable (kept by a CCNet-style
# filter), decile 9 = the gibberish tail.
#
# 100 TB shape: scoring is t10's one model shuffle + one token join; the
# global ranking is the EXACT distributed two-pass row_number (no
# single-partition sort); scores are hardened to half-up 1e-4 integer
# units BEFORE ranking and aggregation, so everything downstream of the
# quantization (the decile cut, every reported figure) is deterministic.
# The per-doc avg(nlp) feeding the quantizer is itself an order-dependent
# float mean (same accepted posture as t10): a score within an ulp of a
# .00005 boundary could in principle flip a unit across partitionings —
# kept because both engines agree on these fixtures and the alternative
# (order-fixed folds over collected per-doc terms) is corpus-sized.

@query(
    "t18_quality_deciles",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), t -> t <> ''))
               AS token
      FROM documents
    ), model AS (
      SELECT token, count(*) AS cnt FROM tok GROUP BY token
    ), total AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM model
    ), scored AS (
      SELECT t.doc_id, count(*) AS n_tokens,
             CAST(floor(avg(-ln(CAST(m.cnt AS DOUBLE) / (SELECT n FROM total)))
                        * 10000.0 + 0.5) AS BIGINT) AS units
      FROM tok t JOIN model m USING (token)
      GROUP BY t.doc_id
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY units ASC, doc_id ASC) AS rn,
             count(*) OVER () AS nd
      FROM scored
    ), dec AS (
      SELECT ((rn - 1) * 10) // nd AS decile, units, n_tokens FROM ranked
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           count(*) AS n_docs,
           CAST(min(units) AS DOUBLE) / 10000.0 AS min_score,
           CAST(max(units) AS DOUBLE) / 10000.0 AS max_score,
           CAST((2 * sum(units) + count(*)) // (2 * count(*)) AS DOUBLE)
             / 10000.0 AS avg_score,
           CAST((20000 * sum(n_tokens) + count(*))
                // (2 * count(*)) AS DOUBLE) / 10000.0 AS avg_tokens
    FROM dec
    GROUP BY decile
    ORDER BY decile
    """,
)
def t18_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        distributed_row_number,
    )

    d = spread_rowlocal(load_table(spark, sf_dir, "documents"), key="doc_id")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("token"),
    )
    model = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = model.agg(F.sum("cnt").cast("double").alias("n"))
    nlp = -F.log(F.col("cnt").cast("double") / F.col("n"))
    scored = (
        tok.join(model, "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", nlp.alias("nlp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.floor(F.avg("nlp") * 10000.0 + 0.5).cast("bigint").alias(
                "units"
            ),
        )
    )
    ranked = distributed_row_number(
        scored, [F.asc("units"), F.asc("doc_id")], out="rn"
    )
    # count off `ranked` (already pinned inside distributed_row_number),
    # not `scored` — the latter re-runs the whole tokenize+model+join
    # chain for one scalar (guide §2.4; row count is identical by
    # construction: d_r_n is a 1:1 rank attachment)
    nd = ranked.agg(F.count(F.lit(1)).alias("nd"))
    dec = ranked.join(F.broadcast(nd), how="cross").select(
        F.expr("((rn - 1) * 10) DIV nd").alias("decile"),
        "units",
        "n_tokens",
    )
    return (
        dec.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.min("units").cast("double") / 10000.0).alias("min_score"),
            (F.max("units").cast("double") / 10000.0).alias("max_score"),
            (
                F.expr("(2 * sum(units) + count(1)) DIV (2 * count(1))").cast(
                    "double"
                )
                / 10000.0
            ).alias("avg_score"),
            (
                F.expr(
                    "(20000 * sum(n_tokens) + count(1)) DIV (2 * count(1))"
                ).cast("double")
                / 10000.0
            ).alias("avg_tokens"),
        )
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n_docs",
            "min_score",
            "max_score",
            "avg_score",
            "avg_tokens",
        )
        .orderBy("decile")
    )


# --- t19: positional vocabulary drift ----------------------------------------
# Template/boilerplate detector: compare the token distribution of the
# FIRST half of each document against the SECOND half, per source, as an
# L1 distance. Sources whose docs open with fixed headers/navigation
# (or end with fixed footers/license blocks) show high drift; organically
# written prose shows low drift — a cheap structural-quality signal a
# crawl pipeline uses to pick boilerplate-stripping candidates.
#
# Determinism: per-token |c1/N1 − c2/N2| is computed from exact BIGINT
# counts (both engines produce the identical correctly-rounded doubles),
# quantized to integer 1e-6 units PER TOKEN, then summed as BIGINT — the
# corpus-wide aggregate is associative, immune to partition merge order,
# and overflow-safe at any corpus size (unlike a cross-multiplied
# |c1·N2 − c2·N1| numerator, which overflows int64 near N1·N2 ≈ 6e14).
#
# 100 TB shape: one row-local posexplode + half-flag, one (source, token)
# aggregate (the only corpus-sized shuffle, map-side combined), then
# O(sources)-row joins.


def _register_t19() -> None:
    from pyspark.sql import SparkSession

    from spark_streaming_logservice_spark.registry import query

    oracle = """
    WITH arrs AS (
      SELECT source,
             list_filter(string_split(lower(text), ' '), t -> t <> '') AS arr
      FROM documents
    ), toks AS (
      SELECT source, unnest(arr) AS token,
             unnest(range(0, len(arr))) AS pos, len(arr) AS n
      FROM arrs
    ), tc AS (
      SELECT source, token,
             sum(CASE WHEN 2 * pos < n THEN 1 ELSE 0 END) AS c1,
             sum(CASE WHEN 2 * pos < n THEN 0 ELSE 1 END) AS c2
      FROM toks GROUP BY source, token
    ), tot AS (
      SELECT source, greatest(sum(c1), 1) AS n1, greatest(sum(c2), 1) AS n2,
             count(*) AS n_terms
      FROM tc GROUP BY source
    ), units AS (
      SELECT t.source, tt.n1, tt.n2, tt.n_terms,
             CAST(floor(abs(CAST(t.c1 AS DOUBLE) / tt.n1
                            - CAST(t.c2 AS DOUBLE) / tt.n2) * 1e6 + 0.5)
                  AS BIGINT) AS u
      FROM tc t JOIN tot tt USING (source)
    )
    SELECT source,
           CAST(max(n1) AS BIGINT) AS n_first_half,
           CAST(max(n2) AS BIGINT) AS n_second_half,
           CAST(max(n_terms) AS BIGINT) AS n_terms,
           CAST(sum(u) AS DOUBLE) / 1e6 AS l1_drift
    FROM units
    GROUP BY source
    ORDER BY source
    """

    @query("t19_positional_drift", oracle=oracle)
    def t19_positional_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = spread_rowlocal(
            load_table(spark, sf_dir, "documents"), key="doc_id"
        )
        arrs = d.select(
            "source",
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda t: t != ""
            ).alias("arr"),
        )
        toks = arrs.select(
            "source",
            F.size("arr").alias("n"),
            F.posexplode("arr").alias("pos", "token"),
        )
        tc = toks.groupBy("source", "token").agg(
            F.sum(
                F.when(2 * F.col("pos") < F.col("n"), 1).otherwise(0)
            ).alias("c1"),
            F.sum(
                F.when(2 * F.col("pos") < F.col("n"), 0).otherwise(1)
            ).alias("c2"),
        )
        tot = tc.groupBy("source").agg(
            F.greatest(F.sum("c1"), F.lit(1)).alias("n1"),
            F.greatest(F.sum("c2"), F.lit(1)).alias("n2"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        diff = F.abs(
            F.col("c1").cast("double") / F.col("n1")
            - F.col("c2").cast("double") / F.col("n2")
        )
        units = tc.join(F.broadcast(tot), "source").select(
            "source",
            "n1",
            "n2",
            "n_terms",
            F.floor(diff * 1e6 + 0.5).cast("bigint").alias("u"),
        )
        return (
            units.groupBy("source")
            .agg(
                F.max("n1").cast("bigint").alias("n_first_half"),
                F.max("n2").cast("bigint").alias("n_second_half"),
                F.max("n_terms").cast("bigint").alias("n_terms"),
                (F.sum("u").cast("double") / F.lit(1e6)).alias("l1_drift"),
            )
            .orderBy("source")
        )


_register_t19()
