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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col("text"), r"[.,!]", "")
    )
    toks = _toks()
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    quality = (
        F.least(n_chars.cast("double") / 500, F.lit(1.0)) * 0.5
        + (1 - n_punct.cast("double") / F.greatest(n_chars, F.lit(1))) * 0.3
        + F.least(
            n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)) * 5, F.lit(1.0)
        )
        * 0.2
    )
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
    d = load_table(spark, sf_dir, "documents")
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
    d = load_table(spark, sf_dir, "documents")
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
