"""Deduplication operators over the ``documents`` table (north-star §2.5).

Design for 100 TB:
- Exact dedup: one hash-shuffle on a 16-byte content digest — never on the
  raw text. Map-side partial aggregation keeps the shuffle at
  O(distinct digests); AQE handles digest skew.
- N-gram Jaccard: the all-pairs verify is quadratic in docs-per-shingle, so
  at scale it only runs on LSH candidates (d04); the standalone variant (d02)
  demonstrates semantics and is oracle-checked at test SF.
- MinHash+LSH: signatures are an 8-way min-aggregate over exploded tokens
  (one shuffle, map-side combine); banding turns near-dup search into an
  equi-join on band keys — Spark's hash join, broadcast-able when the
  candidate side is small.

Hash discipline: md5 on both engines (DuckDB md5() == Spark F.md5()), so
signatures and band keys hash-match the oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table
from spark_streaming_logservice_spark.operators.text import spread_rowlocal

N_MINHASH = 8


def _tokens(col: str = "text") -> Column:
    """Distinct non-empty whitespace tokens."""
    return F.array_distinct(F.filter(F.split(F.col(col), " "), lambda t: t != ""))


def content_digest(col: str = "text") -> Column:
    """Stable content digest for exact dedup (md5 of raw text)."""
    return F.md5(F.col(col))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group on content digest, keep the lowest id.

    At 100 TB this is the canonical first pass: digest on the map side,
    shuffle 16-byte keys only.
    """
    return (
        df.withColumn("content_hash", content_digest(text_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def minhash_signature(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      k: int = N_MINHASH) -> DataFrame:
    """MinHash signature: mh_i = min over tokens of md5(f"{i}:{token}").

    Using k keyed md5s instead of k permutations of one hash keeps the
    computation expressible as pure built-in expressions (JVM codegen, no
    Python) and bit-reproducible in any engine with md5.
    """
    # single-file scans are ONE partition on local[n]; the k keyed md5s per
    # token are the hot row-local stage, and min() is order-insensitive
    toks = spread_rowlocal(df, key=id_col).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("token")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("token")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return toks.groupBy(id_col).agg(*aggs)


# --- d01: exact dedup ------------------------------------------------------
# Input = documents unioned with a re-keyed copy of itself, so every text has
# exactly one duplicate — exercises the keeper/copy-count semantics.

@query(
    "d01_exact_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    ORDER BY keeper
    LIMIT 100
    """,
)
def d01_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.union(d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text"))
    return (
        exact_dedup(corpus)
        .select("content_hash", "keeper", "n_copies")
        .orderBy("keeper")
        .limit(100)
    )


# --- d02: n-gram (3-word shingle) Jaccard near-dup -------------------------

@query(
    "d02_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 4) AS jaccard
    FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.1
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 50
    """,
)
def d02_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    sh = (
        d.select("doc_id", F.explode(_shingles3()).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_inter")
    )
    # No broadcast hint on the sizes joins: sizes is a per-document relation
    # (O(corpus) rows at 100 TB), so forcing a broadcast would OOM executors.
    # Left to AQE, the join is a shuffled hash/sort-merge join at scale and
    # still auto-broadcasts when the runtime size is actually small.
    return (
        pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(50)
    )


# --- d03: MinHash signatures ----------------------------------------------

def _duckdb_minhash_cte(k: int = N_MINHASH) -> str:
    mins = ",\n             ".join(
        f"min(md5('{i}:' || token)) AS mh{i}" for i in range(k)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), filtered AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), sig AS (
      SELECT doc_id,
             {mins}
      FROM filtered
      GROUP BY doc_id
    )
    """


@query(
    "d03_minhash_signatures",
    oracle=_duckdb_minhash_cte()
    + """
    SELECT * FROM sig WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def d03_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_signature(d).where(F.col("doc_id") < 100).orderBy("doc_id")


# --- d04: LSH banding → candidate pairs → verified Jaccard -----------------

# Shared CTE chain (appended after _duckdb_minhash_cte()): banding →
# capped buckets → candidate pairs → token-intersection → sizes. d04's
# final SELECT scores pairs; d08/d09 build clusters on top of it.
_DUCKDB_LSH_PAIR_CTES = """
    , bands AS (
      SELECT doc_id, 0 AS band, mh0 || '|' || mh1 AS bkey FROM sig
      UNION ALL SELECT doc_id, 1, mh2 || '|' || mh3 FROM sig
      UNION ALL SELECT doc_id, 2, mh4 || '|' || mh5 FROM sig
      UNION ALL SELECT doc_id, 3, mh6 || '|' || mh7 FROM sig
    ), band_ok AS (
      -- LSH bucket cap: oversized buckets are non-discriminative and only
      -- inflate the candidate set; skip them (classic LSH practice).
      SELECT band, bkey FROM bands GROUP BY band, bkey
      HAVING count(*) BETWEEN 2 AND 50
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
        JOIN band_ok k ON a.band = k.band AND a.bkey = k.bkey
        JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    ), sizes AS (
      SELECT doc_id, count(*) AS n_tok FROM filtered GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_inter
      FROM cand c
        JOIN filtered fa ON fa.doc_id = c.doc_a
        JOIN filtered fb ON fb.doc_id = c.doc_b AND fa.token = fb.token
      GROUP BY c.doc_a, c.doc_b
    )
"""


@query(
    "d04_minhash_lsh_pairs",
    oracle=_duckdb_minhash_cte()
    + _DUCKDB_LSH_PAIR_CTES
    + """
    SELECT i.doc_a, i.doc_b,
           round(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 4) AS jaccard
    FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
    ORDER BY jaccard DESC, i.doc_a, i.doc_b
    LIMIT 100
    """,
)
def d04_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        lsh_verified_pairs(d)
        .select(
            "doc_a", "doc_b", F.round(F.col("jaccard"), 4).alias("jaccard")
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(100)
    )


def lsh_verified_pairs(d: DataFrame) -> DataFrame:
    """MinHash-LSH candidate pairs with exact verified token Jaccard:
    (doc_a, doc_b, jaccard) with doc_a < doc_b, one row per candidate pair.

    This is the scale path for near-dup pair generation: banding turns the
    all-pairs problem into an equi-join on band keys, the bucket cap keeps
    candidates linear in corpus size, and verification touches only the
    candidate pairs.
    """
    o = lsh_pair_overlap(d)
    jac = F.col("n_inter").cast("double") / (
        F.col("n_tok_a") + F.col("n_tok_b") - F.col("n_inter")
    )
    return o.select("doc_a", "doc_b", jac.alias("jaccard"))


def lsh_pair_overlap(d: DataFrame) -> DataFrame:
    """The raw overlap relation behind the verified-pair scores:
    (doc_a, doc_b, n_inter, n_tok_a, n_tok_b) per LSH candidate pair —
    Jaccard (d04), calibration (d12) and containment (d13) all derive from
    these three integers."""
    sig = minhash_signature(d)
    # ONE row-local explode of the per-band keys — NOT a 10-way union of
    # per-band projections: Catalyst does no common-subexpression
    # elimination across union branches, and column pruning makes each
    # branch's pruned signature aggregate canonically DIFFERENT, so the
    # union form re-ran the tokenize+explode+shuffle pipeline once PER
    # BAND per consumer (measured 2.4 s of the 4.5 s chain at sf0.1; the
    # explode form leaves one token shuffle that ReusedExchange shares
    # across all three bands consumers).
    band_structs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.concat(
                    F.col(f"mh{2 * band}"),
                    F.lit("|"),
                    F.col(f"mh{2 * band + 1}"),
                ).alias("bkey"),
            )
            for band in range(N_MINHASH // 2)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey")
    )
    # LSH bucket cap (matches the oracle): buckets with >50 docs carry no
    # near-dup signal but cost O(c²) pairs — at 100 TB this cap is what keeps
    # banding linear in corpus size.
    band_ok = (
        bands.groupBy("band", "bkey")
        .agg(F.count("*").alias("bsz"))
        .where((F.col("bsz") >= 2) & (F.col("bsz") <= 50))
        .select("band", "bkey")
    )
    # band_ok is O(buckets) = O(corpus) rows at 100 TB — no broadcast hint;
    # AQE broadcasts it only when the runtime size permits.
    pruned = bands.join(band_ok, ["band", "bkey"])
    a = pruned.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    toks = spread_rowlocal(d, key="doc_id").select(
        "doc_id", F.explode(_tokens()).alias("token")
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n_tok"))
    fa = toks.alias("fa")
    fb = toks.alias("fb")
    inter = (
        cand.join(fa, F.col("doc_a") == F.col("fa.doc_id"))
        .join(
            fb,
            (F.col("doc_b") == F.col("fb.doc_id"))
            & (F.col("fa.token") == F.col("fb.token")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    # sizes is per-document (O(corpus) at 100 TB): never force-broadcast it.
    # AQE picks broadcast only when the runtime size is genuinely small.
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            F.col("sa.n_tok").alias("n_tok_a"),
            F.col("sb.n_tok").alias("n_tok_b"),
        )
    )


# --- d05: SimHash (16-bit, frequency-weighted) -----------------------------

_HEX = "0123456789abcdef"


def _duckdb_hex4_to_int(h: str) -> str:
    """DuckDB expression: first-4-hex-chars of md5 → 0..65535."""
    terms = [
        f"(strpos('{_HEX}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    ]
    return "(" + " + ".join(terms) + ")"


def _duckdb_simhash_sql() -> str:
    val = _duckdb_hex4_to_int("md5(token)")
    sums = ",\n             ".join(
        f"sum(CASE WHEN (v >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(16)
    )
    bits = " + ".join(f"(CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END)" for j in range(16))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ), vals AS (
      SELECT doc_id, {val} AS v FROM toks WHERE token <> ''
    ), sums AS (
      SELECT doc_id,
             {sums}
      FROM vals GROUP BY doc_id
    )
    SELECT doc_id, CAST({bits} AS BIGINT) AS simhash
    FROM sums
    WHERE doc_id < 200
    ORDER BY doc_id
    """


@query("d05_simhash", oracle=_duckdb_simhash_sql())
def d05_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias(
            "token"
        ),
    )
    v = F.conv(F.substring(F.md5("token"), 1, 4), 16, 10).cast("int")
    vals = toks.select("doc_id", v.alias("v"))
    sums = vals.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("v"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(16)
        ]
    )
    simhash = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, F.lit(2**j)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    return (
        sums.select("doc_id", simhash.cast("bigint").alias("simhash"))
        .where(F.col("doc_id") < 200)
        .orderBy("doc_id")
    )


# --- d06: per-source dedup report ------------------------------------------

@query(
    "d06_dedup_report",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / count(*), 4)
             AS dup_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def d06_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup *reporting*: per-source document counts, unique-content counts,
    and duplication rate — the measurement side of the dedup pipeline (what
    fraction of each crawl/source is redundant before spending compute on
    it). Shuffles 16-byte digests, never text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(content_digest()).alias("n_unique"),
            F.round(
                1.0 - F.countDistinct(content_digest()).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# --- d07: benchmark decontamination ----------------------------------------

def _shingles3(text_col: str = "text") -> Column:
    """Distinct 3-token shingles; documents shorter than 3 tokens yield NO
    shingles (concat_ws would otherwise silently emit a degenerate 1-2-token
    shingle the SQL oracles never produce)."""
    toks = F.split(F.col(text_col), " ")
    full = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )
    return F.when(F.size(toks) >= 3, F.array_distinct(full)).otherwise(
        F.array().cast("array<string>")
    )


@query(
    "d07_decontamination",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      )
    ), bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0
    )
    SELECT s.doc_id, count(DISTINCT s.shingle) AS n_bench_shingles
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % 97 <> 0
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
)
def d07_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any 3-token
    shingle with the held-out benchmark set (here: doc_id % 97 == 0). The
    benchmark shingle set is tiny by construction, so it broadcasts and the
    check is one map-side semi-join over the training shingles — at 100 TB
    the corpus streams once, nothing shuffles but the per-doc hit counts."""
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    sh = d.select(
        "doc_id", F.explode(_shingles3()).alias("shingle")
    ).distinct()
    bench = sh.where(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    return (
        sh.where(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_bench_shingles"))
        .orderBy("doc_id")
    )


# --- d08/d09: near-dup clusters via connected components -------------------
# Pairs alone don't collapse a corpus: similarity is not transitive, but
# dedup policy IS — if a~b and b~c, keeping both a and c still leaves
# near-dups in the training set. The standard pipeline closes the pair
# relation into clusters (connected components) and keeps one canonical doc
# per cluster.

_CLUSTER_MIN_JACCARD = 0.8

# DuckDB oracle for the transitive closure: recursive label spreading. A
# label (candidate component id) walks outward from every node, but only
# onto larger-id nodes — the component minimum therefore reaches every
# member, and min(label) per node is exactly the component id that the
# large-star/small-star Spark operator computes. Aggregation isn't allowed
# inside the recursion, so the min is taken after the walk.
_DUCKDB_CLUSTER_CTES = (
    """
    , verified AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter) >= """
    + str(_CLUSTER_MIN_JACCARD)
    + """
    ), cnodes AS (
      SELECT DISTINCT doc_a AS id FROM verified
      UNION SELECT DISTINCT doc_b FROM verified
    ), cedges AS (
      SELECT doc_a AS s, doc_b AS d FROM verified
      UNION ALL SELECT doc_b AS s, doc_a AS d FROM verified
    ), walk(id, label) AS (
      SELECT id, id FROM cnodes
      UNION
      SELECT e.d, w.label FROM walk w JOIN cedges e ON e.s = w.id
      WHERE w.label < e.d
    ), assign AS (
      SELECT id AS doc_id, min(label) AS cluster_id FROM walk GROUP BY id
    )
"""
)


def _duckdb_cluster_sql(tail: str) -> str:
    """Full oracle: minhash CTEs (recursive variant) + LSH pair CTEs +
    connected-components CTEs + the query-specific ``tail``."""
    head = _duckdb_minhash_cte().replace("WITH toks", "WITH RECURSIVE toks", 1)
    return head + _DUCKDB_LSH_PAIR_CTES + _DUCKDB_CLUSTER_CTES + tail


def neardup_clusters(d: DataFrame, min_jaccard: float = _CLUSTER_MIN_JACCARD) -> DataFrame:
    """(doc_id, cluster_id) for every doc in a near-dup cluster, where
    cluster_id is the minimum doc_id of the cluster. Docs without any
    qualifying pair are absent (singleton clusters)."""
    from spark_streaming_logservice_spark.operators.graph import (
        connected_components,
    )

    pairs = lsh_verified_pairs(d).where(F.col("jaccard") >= min_jaccard)
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


# One pinned (doc_id, cluster_id) assignment per (application, corpus):
# the LSH+CC chain is the single most expensive intermediate in the repo
# (~8 s at sf0.1) and five consumers (d08/d09/d18/d20/p17) each need the
# SAME relation — unshared, a bench sweep paid the chain 4×+ (VERDICT r7
# item 2). The cache key includes the documents file's identity+mtime so a
# regenerated corpus rebuilds; entries from dead sessions are purged on
# miss (their checkpointed blocks died with the JVM). Bounded: ≤4 corpora.
_ASSIGN_CACHE: dict[tuple, DataFrame] = {}


def cluster_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup cluster assignment for a corpus dir, materialized once
    per Spark application (eager localCheckpoint) and shared by every
    consumer. Semantically identical to
    ``neardup_clusters(load_table(spark, sf_dir, "documents"))``."""
    import os as _os

    from spark_streaming_logservice_spark.tables import dataset_content_key

    app = spark.sparkContext.applicationId
    key = (app,) + dataset_content_key(
        _os.path.join(sf_dir, "documents.parquet")
    )
    df = _ASSIGN_CACHE.get(key)
    if df is None:

        def _evict(k: tuple) -> None:
            old = _ASSIGN_CACHE.pop(k)
            if k[0] == app:  # dead sessions' blocks died with their JVM
                try:
                    # DataFrame.unpersist only clears cacheManager entries;
                    # the localCheckpoint's RDD blocks live on the
                    # checkpointed RDD itself (LogicalRDD.rdd), so unpersist
                    # THAT to actually reclaim executor storage (ADVICE r9).
                    old._jdf.queryExecution().analyzed().rdd().unpersist(False)
                except Exception:
                    pass
                try:
                    old.unpersist(blocking=False)
                except Exception:
                    pass

        for k in [k for k in _ASSIGN_CACHE if k[0] != app]:
            _evict(k)
        while len(_ASSIGN_CACHE) >= 4:
            _evict(next(iter(_ASSIGN_CACHE)))
        d = load_table(spark, sf_dir, "documents")
        df = neardup_clusters(d).localCheckpoint(eager=True)
        _ASSIGN_CACHE[key] = df
    return df


@query(
    "d08_dedup_clusters",
    oracle=_duckdb_cluster_sql(
        """
    SELECT a.doc_id, a.cluster_id, c.cluster_size,
           a.doc_id = a.cluster_id AS is_canonical
    FROM assign a
      JOIN (SELECT cluster_id, count(*) AS cluster_size
            FROM assign GROUP BY cluster_id) c
        ON c.cluster_id = a.cluster_id
    ORDER BY a.cluster_id, a.doc_id
    """
    ),
)
def d08_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: LSH pairs (jaccard >= 0.8) closed transitively via
    large-star/small-star connected components (operators/graph.py). The
    canonical member is the minimum doc_id.

    At 100 TB: pair generation is the bucketed LSH path (linear in corpus),
    and the closure runs O(log^2 n) shuffle rounds over the pair set — which
    is orders of magnitude smaller than the corpus. The cluster-size join is
    per-cluster (O(clusters) rows) and left to AQE.
    """
    cc = cluster_assignments(spark, sf_dir)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


@query(
    "d09_dedup_survivors",
    oracle=_duckdb_cluster_sql(
        """
    , dropped AS (
      SELECT doc_id FROM assign WHERE doc_id <> cluster_id
    )
    SELECT d.source,
           count(*) AS n_docs,
           count(*) FILTER (WHERE dr.doc_id IS NULL) AS n_kept,
           round(1.0 - CAST(count(*) FILTER (WHERE dr.doc_id IS NULL)
                            AS DOUBLE) / count(*), 4) AS drop_rate
    FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """
    ),
)
def d09_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collapse report: per source, how many docs survive near-dup
    clustering (canonical members + singletons) — the acceptance metric a
    pipeline operator reads before shipping a deduped corpus.

    The anti-join key set (non-canonical cluster members) is bounded by the
    pair set, not the corpus; the corpus itself streams through once.
    """
    d = load_table(spark, sf_dir, "documents")
    dropped = (
        cluster_assignments(spark, sf_dir)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    kept = d.join(dropped, "doc_id", "left_anti")
    per_source = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    kept_source = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        per_source.join(kept_source, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round(
                1.0 - F.coalesce("n_kept", F.lit(0)).cast("double") / F.col("n_docs"),
                4,
            ).alias("drop_rate"),
        )
        .orderBy("source")
    )


# --- d10: exact substring (token-window) dedup -----------------------------
# The Lee et al. ("Deduplicating Training Data Makes Language Models
# Better") exact-substring pass, at token granularity: any W-token window
# that appears verbatim in more than one document marks duplicated text.
# Unlike MinHash (document-level, approximate), this catches copied
# passages inside otherwise-distinct documents.

WINDOW_W = 8


def _window_hashes(text_col: str = "text", w: int = WINDOW_W) -> Column:
    """md5 of every overlapping w-token window (step 1); docs shorter than
    w tokens yield no windows."""
    toks = F.split(F.col(text_col), " ")
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (w - 1), F.lit(1))),
        lambda i: F.md5(
            F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(w)])
        ),
    )
    return F.when(F.size(toks) >= w, wins).otherwise(
        F.array().cast("array<string>")
    )


@query(
    "d10_window_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(toks) - {WINDOW_W - 2}, 1)),
                    i -> md5(array_to_string(toks[i:i+{WINDOW_W - 1}], ' ')))) AS wh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    ), per AS (
      SELECT doc_id, wh, count(*) AS n_pos FROM w GROUP BY doc_id, wh
    ), dup AS (
      SELECT wh FROM per GROUP BY wh HAVING count(*) >= 2
    ), stats AS (
      SELECT p.doc_id, sum(n_pos) AS n_dup FROM per p JOIN dup USING (wh)
      GROUP BY p.doc_id
    ), tot AS (
      SELECT doc_id, count(*) AS n_windows FROM w GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_windows,
           CAST(coalesce(s.n_dup, 0) AS BIGINT) AS n_dup_windows,
           round(CAST(coalesce(s.n_dup, 0) AS DOUBLE) / t.n_windows, 4) AS dup_frac
    FROM tot t LEFT JOIN stats s ON s.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
)
def d10_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-text fraction via exact token-window matching:
    a window is duplicated when its hash occurs in >= 2 distinct documents.

    At 100 TB: windows never leave the map side as text — only 16-byte md5
    digests shuffle, and both aggregations (per-doc-per-window, then
    per-window doc count) get map-side partial combine. The corpus streams
    exactly once; the dup-window set is joined back as a semi-join on the
    digest (bounded by the duplicated subset, not the corpus).
    """
    d = load_table(spark, sf_dir, "documents")
    # Window hashing is the expensive row-local stage (W element_at's + md5
    # per window, interpreted transform lambda); a single parquet file scans
    # as ONE partition on local mode, so spread the corpus across cores
    # first. Row-local ⇒ any partitioning is oracle-equivalent.
    par = spark.sparkContext.defaultParallelism
    w = d.repartition(par, "doc_id").select(
        "doc_id", F.explode(_window_hashes()).alias("wh")
    )
    per = w.groupBy("doc_id", "wh").agg(F.count(F.lit(1)).alias("n_pos"))
    dup = (
        per.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("wh")
    )
    stats = (
        per.join(dup, "wh", "left_semi")
        .groupBy("doc_id")
        .agg(F.sum("n_pos").alias("n_dup"))
    )
    tot = per.groupBy("doc_id").agg(F.sum("n_pos").alias("n_windows"))
    return (
        tot.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce("n_dup", F.lit(0)).alias("n_dup_windows"),
            F.round(
                F.coalesce("n_dup", F.lit(0)).cast("double") / F.col("n_windows"),
                4,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# --- d11: incremental dedup (new batch vs historical corpus) ---------------

@query(
    "d11_incremental_dedup",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id % 3 <> 0
    ), inc AS (
      SELECT doc_id, source, md5(text) AS digest FROM documents
      WHERE doc_id % 3 = 0
    )
    SELECT i.source,
           count(*) AS n_incoming,
           count(*) FILTER (WHERE h.digest IS NULL) AS n_novel,
           round(CAST(count(*) FILTER (WHERE h.digest IS NOT NULL) AS DOUBLE)
                 / count(*), 4) AS hist_dup_rate
    FROM inc i LEFT JOIN hist h ON h.digest = i.digest
    GROUP BY i.source
    ORDER BY i.source
    """,
)
def d11_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: a new batch (here doc_id % 3 == 0) checked
    against the historical corpus's digest set, reported per source.

    This is how dedup actually runs in production — nobody re-deduplicates
    100 TB per day. History is kept as a digest-only table (16 bytes/doc);
    at scale it is bucketed by digest so the daily increment co-partitions
    and the lookup join shuffles only the new batch. The full corpus is
    never re-read.
    """
    d = load_table(spark, sf_dir, "documents")
    hist = (
        d.where(F.col("doc_id") % 3 != 0)
        .select(content_digest().alias("digest"))
        .distinct()
    )
    inc = d.where(F.col("doc_id") % 3 == 0).select(
        "source", content_digest().alias("digest")
    )
    h = hist.withColumn("hit", F.lit(1))
    return (
        inc.join(h, "digest", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.count(F.when(F.col("hit").isNull(), 1)).alias("n_novel"),
            F.round(
                F.count(F.when(F.col("hit").isNotNull(), 1)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("hist_dup_rate"),
        )
        .orderBy("source")
    )


# --- d12: MinHash estimate vs exact Jaccard (LSH calibration) ---------------
# Dedup-parameter engineering: for every LSH candidate pair, compare the
# signature-agreement estimate (fraction of k MinHash positions that agree —
# an unbiased estimator of Jaccard) against the exact token Jaccard. The
# abs-error column is what you tune k and the banding scheme against before
# committing to a 100 TB run. Reuses the d04 candidate/verification chain;
# the signature relation joins in twice (O(candidates) rows each side).

@query(
    "d12_minhash_calibration",
    oracle=_duckdb_minhash_cte()
    + _DUCKDB_LSH_PAIR_CTES
    + """
    , scored AS (
      SELECT i.doc_a, i.doc_b,
             CAST((CASE WHEN sa2.mh0 = sb2.mh0 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh1 = sb2.mh1 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh2 = sb2.mh2 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh3 = sb2.mh3 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh4 = sb2.mh4 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh5 = sb2.mh5 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh6 = sb2.mh6 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh7 = sb2.mh7 THEN 1 ELSE 0 END) AS DOUBLE)
               / 8.0 AS est_jaccard,
             CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter)
               AS exact_jaccard
      FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        JOIN sig sa2 ON sa2.doc_id = i.doc_a
        JOIN sig sb2 ON sb2.doc_id = i.doc_b
    )
    SELECT doc_a, doc_b,
           round(est_jaccard, 4) AS est_jaccard,
           round(exact_jaccard, 4) AS exact_jaccard,
           round(abs(est_jaccard - exact_jaccard), 4) AS abs_err
    FROM scored
    ORDER BY abs_err DESC, doc_a, doc_b
    LIMIT 100
    """,
)
def d12_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(d)
    sig = minhash_signature(d)
    agree = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = agree.cast("double") / float(N_MINHASH)
    scored = (
        pairs.join(sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            est.alias("est_raw"),
            F.col("jaccard").alias("exact_raw"),
        )
    )
    return (
        scored.select(
            "doc_a",
            "doc_b",
            F.round("est_raw", 4).alias("est_jaccard"),
            F.round("exact_raw", 4).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_raw") - F.col("exact_raw")), 4).alias("abs_err"),
        )
        .orderBy(F.desc("abs_err"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(100)
    )


# --- d13: asymmetric containment (subset duplication) ------------------------
# Jaccard under-scores SUBSET duplication: a paragraph fully contained in a
# much longer document scores |A|/|B| (small) on Jaccard but 1.0 on
# containment C(A,B) = |A∩B| / |A|. Containment is the statistic behind
# quote/boilerplate inclusion detection (Broder's original resemblance vs
# containment distinction). Same LSH candidate chain as d04/d12 — the only
# new work is two divisions over the already-computed overlap integers,
# O(candidates) rows end-to-end.

@query(
    "d13_containment_pairs",
    oracle=_duckdb_minhash_cte()
    + _DUCKDB_LSH_PAIR_CTES
    + """
    SELECT i.doc_a, i.doc_b,
           round(CAST(n_inter AS DOUBLE) / sa.n_tok, 4) AS contain_a,
           round(CAST(n_inter AS DOUBLE) / sb.n_tok, 4) AS contain_b,
           round(greatest(CAST(n_inter AS DOUBLE) / sa.n_tok,
                          CAST(n_inter AS DOUBLE) / sb.n_tok), 4)
             AS max_containment,
           round(CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter), 4)
             AS jaccard
    FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
    ORDER BY max_containment DESC, i.doc_a, i.doc_b
    LIMIT 100
    """,
)
def d13_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    o = lsh_pair_overlap(d)
    inter_d = F.col("n_inter").cast("double")
    ca = inter_d / F.col("n_tok_a")
    cb = inter_d / F.col("n_tok_b")
    jac = inter_d / (F.col("n_tok_a") + F.col("n_tok_b") - F.col("n_inter"))
    return (
        o.select(
            "doc_a",
            "doc_b",
            F.round(ca, 4).alias("contain_a"),
            F.round(cb, 4).alias("contain_b"),
            F.round(F.greatest(ca, cb), 4).alias("max_containment"),
            F.round(jac, 4).alias("jaccard"),
        )
        .orderBy(F.desc("max_containment"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(100)
    )


# --- d16: b-bit minwise hashing (compressed signatures) ----------------------
# Li & König (WWW'10): store only the lowest b bits of each MinHash value —
# b=1 shrinks the d03 signature 128× — and correct the estimator for the
# random-agreement floor: with 1 bit, unrelated values still agree half the
# time, so E[agree] = J + (1-J)/2 and Ĵ = 2·agree − 1 (clamped at 0). The
# at-scale story: signature storage/shuffle volume is THE cost of minhash
# dedup at 100 TB, and this is the standard compression; the query reports
# the accuracy price next to the full-width estimate over the same d04
# candidate chain (everything O(candidates)).

@query(
    "d16_bbit_minhash",
    oracle=_duckdb_minhash_cte()
    + _DUCKDB_LSH_PAIR_CTES
    + """
    , scored AS (
      SELECT i.doc_a, i.doc_b,
             CAST((CASE WHEN sa2.mh0 = sb2.mh0 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh1 = sb2.mh1 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh2 = sb2.mh2 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh3 = sb2.mh3 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh4 = sb2.mh4 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh5 = sb2.mh5 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh6 = sb2.mh6 THEN 1 ELSE 0 END
                 + CASE WHEN sa2.mh7 = sb2.mh7 THEN 1 ELSE 0 END) AS DOUBLE)
               / 8.0 AS est_full,
             CAST((CASE WHEN ('0x' || substr(sa2.mh0, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh0, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END
                 + CASE WHEN ('0x' || substr(sa2.mh1, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh1, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END
                 + CASE WHEN ('0x' || substr(sa2.mh2, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh2, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END
                 + CASE WHEN ('0x' || substr(sa2.mh3, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh3, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END
                 + CASE WHEN ('0x' || substr(sa2.mh4, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh4, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END
                 + CASE WHEN ('0x' || substr(sa2.mh5, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh5, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END
                 + CASE WHEN ('0x' || substr(sa2.mh6, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh6, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END
                 + CASE WHEN ('0x' || substr(sa2.mh7, 32, 1))::INTEGER % 2
                           = ('0x' || substr(sb2.mh7, 32, 1))::INTEGER % 2 THEN 1 ELSE 0 END)
               AS DOUBLE) / 8.0 AS agree_1bit,
             CAST(n_inter AS DOUBLE) / (sa.n_tok + sb.n_tok - n_inter)
               AS exact_jaccard
      FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        JOIN sig sa2 ON sa2.doc_id = i.doc_a
        JOIN sig sb2 ON sb2.doc_id = i.doc_b
    )
    SELECT doc_a, doc_b,
           round(greatest(2 * agree_1bit - 1, 0), 4) AS est_1bit,
           round(est_full, 4) AS est_full,
           round(exact_jaccard, 4) AS exact_jaccard,
           round(abs(greatest(2 * agree_1bit - 1, 0) - exact_jaccard), 4)
             AS err_1bit
    FROM scored
    ORDER BY err_1bit DESC, doc_a, doc_b
    LIMIT 100
    """,
)
def d16_bbit_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(d)
    sig = minhash_signature(d)

    def bit(col: str):
        return F.conv(F.substring(F.col(col), 32, 1), 16, 10).cast("int") % 2

    agree_full = sum(
        F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    agree_1bit = sum(
        F.when(bit(f"sa.mh{i}") == bit(f"sb.mh{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est_full = agree_full.cast("double") / float(N_MINHASH)
    a1 = agree_1bit.cast("double") / float(N_MINHASH)
    est_1bit = F.greatest(2 * a1 - 1, F.lit(0.0))
    scored = (
        pairs.join(sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sig.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            est_1bit.alias("e1"),
            est_full.alias("ef"),
            F.col("jaccard").alias("ex"),
        )
    )
    return (
        scored.select(
            "doc_a",
            "doc_b",
            F.round("e1", 4).alias("est_1bit"),
            F.round("ef", 4).alias("est_full"),
            F.round("ex", 4).alias("exact_jaccard"),
            F.round(F.abs(F.col("e1") - F.col("ex")), 4).alias("err_1bit"),
        )
        .orderBy(F.desc("err_1bit"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(100)
    )


# --- d17: fuzzy join via deletion-neighborhood blocking (SymSpell/FastSS) ---
# Edit-distance joins are the classic record-linkage primitive, and the
# naive form is an all-pairs levenshtein cross join. The FastSS trick:
# every string's candidate block is {itself} ∪ {itself minus one char} —
# two strings within edit distance 1 ALWAYS share a block key, so an
# equi-join on the (row-locally generated) variants finds every candidate
# with shuffle volume O(rows · avg_len), never O(rows²). Exact
# levenshtein == 1 then verifies the survivors (both engines ship the same
# built-in). 100 TB shape: variant explode is row-local; the join is a
# plain hash equi-join on the variant key; verification runs only on
# O(candidates).

@query(
    "d17_fuzzy_name_join",
    oracle="""
    WITH names AS (
      SELECT DISTINCT s_name AS nm FROM supplier
    ), variants AS (
      SELECT nm, unnest(list_prepend(nm,
               list_transform(range(1, len(nm) + 1),
                 i -> substr(nm, 1, i - 1) || substr(nm, i + 1)))) AS v
      FROM names
    ), cand AS (
      SELECT DISTINCT a.nm AS name_a, b.nm AS name_b
      FROM variants a JOIN variants b ON a.v = b.v AND a.nm < b.nm
    )
    SELECT name_a, name_b,
           levenshtein(name_a, name_b) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) = 1
    ORDER BY name_a, name_b
    """,
)
def d17_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = load_table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("nm")
    ).distinct()
    variants = names.select(
        "nm",
        F.explode(
            F.concat(
                F.array(F.col("nm")),
                F.transform(
                    F.sequence(F.lit(1), F.length("nm")),
                    lambda i: F.concat(
                        F.substring(F.col("nm"), F.lit(1), i - 1),
                        F.substring(F.col("nm"), i + 1, F.length("nm")),
                    ),
                ),
            )
        ).alias("v"),
    )
    vb = variants.select(F.col("nm").alias("name_b"), F.col("v").alias("v2"))
    cand = (
        variants.join(vb, (F.col("v") == F.col("v2")) & (F.col("nm") < F.col("name_b")))
        .select(F.col("nm").alias("name_a"), "name_b")
        .distinct()
    )
    return (
        cand.where(F.levenshtein("name_a", "name_b") == 1)
        .select("name_a", "name_b", F.levenshtein("name_a", "name_b").alias("dist"))
        .orderBy("name_a", "name_b")
    )


@query(
    "d18_cluster_size_histogram",
    oracle=_duckdb_cluster_sql(
        """
    , csizes AS (
      SELECT cluster_id, count(*) AS sz FROM assign GROUP BY cluster_id
    ), corpus AS (
      SELECT count(*) AS n_docs FROM documents
    ), clustered AS (
      SELECT count(*) AS n_clustered FROM assign
    )
    SELECT sz AS cluster_size,
           count(*) AS n_clusters,
           CAST(sz * count(*) AS BIGINT) AS n_docs_in
    FROM csizes GROUP BY sz
    UNION ALL
    SELECT 1, c.n_docs - cl.n_clustered, c.n_docs - cl.n_clustered
    FROM corpus c, clustered cl
    ORDER BY cluster_size, n_clusters
    """
    ),
)
def d18_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-structure report: how big are the near-dup clusters?
    (Many size-2 clusters = boilerplate pairs; a giant cluster = template
    spam — the histogram is what a curation run inspects before choosing
    collapse policy.) Singletons (docs in no cluster) appear as the size-1
    row computed by the two-scalar identity corpus − clustered, not by
    materializing singleton rows. Reuses the pinned d08 chain; everything
    after is O(clusters)."""
    d = load_table(spark, sf_dir, "documents")
    assign = cluster_assignments(spark, sf_dir)
    sizes = assign.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    hist = sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("n_clusters"))
    hist = hist.select(
        F.col("sz").alias("cluster_size"),
        "n_clusters",
        (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs_in"),
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    n_clustered = assign.agg(F.count(F.lit(1)).alias("n_clustered"))
    singles = (
        n_docs.join(F.broadcast(n_clustered))
        .select(
            F.lit(1).cast("bigint").alias("cluster_size"),
            (F.col("n_docs") - F.col("n_clustered")).alias("n_clusters"),
            (F.col("n_docs") - F.col("n_clustered"))
            .cast("bigint")
            .alias("n_docs_in"),
        )
    )
    return hist.unionByName(singles).orderBy("cluster_size", "n_clusters")


def canonical_fingerprint(text_col: str = "text") -> Column:
    """t04's canonical-form digest: md5 of the sorted distinct lowercase
    token bag — matches reorderings and repetition variants, not just
    byte-identical copies. Row-local, codegen-only."""
    return F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(
                    F.filter(
                        F.split(F.lower(F.col(text_col)), " "),
                        lambda t: t != "",
                    )
                )
            ),
        )
    )


# --- d19: cross-source duplicate matrix --------------------------------------
# Provenance question every multi-source corpus build asks: which sources
# copy from which? Duplicates are matched on the CANONICAL-FORM fingerprint
# (t04's md5 of the sorted distinct lowercase token bag — catches
# reorderings and repetition variants, not just byte-identical copies) and
# reported as duplicate-PAIR counts per unordered source pair (diagonal =
# within-source duplication). Scale shape: NO pair self-join — per digest,
# count docs per source (one digest-keyed shuffle with partial agg), then
# pair counts come from count algebra: within a source C(n,2), across
# sources n_a * n_b, summed over digests. The only join is the per-digest
# source-count relation with itself keyed ON THE DIGEST, where each side
# holds at most |sources| rows per digest — fan-out bounded by the (tiny,
# fixed) source count, never by duplicate-group size, so a million-copy
# boilerplate digest costs |sources|^2 rows, not 1e12 pairs. All counts
# integer — deterministic at any partitioning.

@query(
    "d19_cross_source_dup_matrix",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             md5(array_to_string(list_sort(list_distinct(
                 list_filter(string_split(lower(text), ' '), t -> t <> ''))),
               ' ')) AS dg
      FROM documents
    ), per AS (
      SELECT dg, source, count(*) AS n FROM d GROUP BY dg, source
    ), within AS (
      SELECT source AS src_a, source AS src_b,
             sum(n * (n - 1) // 2) AS pairs
      FROM per GROUP BY source
    ), across AS (
      SELECT a.source AS src_a, b.source AS src_b, sum(a.n * b.n) AS pairs
      FROM per a JOIN per b ON a.dg = b.dg AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, CAST(pairs AS BIGINT) AS n_dup_pairs
    FROM (SELECT * FROM within WHERE pairs > 0
          UNION ALL SELECT * FROM across)
    ORDER BY n_dup_pairs DESC, src_a, src_b
    """,
)
def d19_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source", canonical_fingerprint().alias("dg")
    )
    per = d.groupBy("dg", "source").agg(F.count(F.lit(1)).alias("n"))
    within = (
        per.groupBy("source")
        # integer DIV keeps the whole sum in bigint (ADVICE r7: the former
        # /2 double path loses exactness past 2^53, making the result
        # partition-order dependent); n*(n-1) is always even, so DIV 2 of
        # each term is exact
        .agg(F.sum(F.expr("n * (n - 1) DIV 2")).alias("pairs"))
        .where(F.col("pairs") > 0)
        .select(
            F.col("source").alias("src_a"),
            F.col("source").alias("src_b"),
            "pairs",
        )
    )
    a = per.select("dg", F.col("source").alias("src_a"), F.col("n").alias("na"))
    b = per.select("dg", F.col("source").alias("src_b"), F.col("n").alias("nb"))
    across = (
        a.join(b, "dg")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.sum(F.col("na") * F.col("nb")).cast("bigint").alias("pairs"))
    )
    return (
        within.unionByName(across)
        .select("src_a", "src_b", F.col("pairs").alias("n_dup_pairs"))
        .orderBy(F.desc("n_dup_pairs"), F.asc("src_a"), F.asc("src_b"))
    )


# --- d20: quality-aware near-dup collapse report -----------------------------
# Collapse POLICY, not just clustering: production dedup keeps the BEST
# document per near-dup cluster (highest quality score), not the lowest
# id — boilerplate-ridden copies drop, the cleanest variant survives. Per
# source: how many docs survive the collapse. Scale shape: reuses the
# pinned d08 LSH+CC chain (per-round localCheckpoint, bucket-capped
# candidates); the keeper rank is a CLUSTER-partitioned window over the
# O(clustered docs) assignment — never the corpus, never partition-less;
# quality is row-local and the keeper choice is a comparison (argmax),
# not a float sum, so it is deterministic at any partitioning.

def _register_d20() -> None:
    from spark_streaming_logservice_spark.operators.text import (
        QUALITY_SQL,
        quality_expr,
    )

    tail = f"""
    , q AS (
      SELECT doc_id, source, {QUALITY_SQL} AS quality FROM documents
    ), ranked AS (
      SELECT a.doc_id,
             row_number() OVER (PARTITION BY a.cluster_id
                                ORDER BY q.quality DESC, a.doc_id) AS krk
      FROM assign a JOIN q ON q.doc_id = a.doc_id
    )
    SELECT q.source,
           count(*) AS n_docs,
           CAST(coalesce(sum(CASE WHEN r.krk > 1 THEN 1 END), 0) AS BIGINT)
             AS n_dropped,
           round(1.0 - CAST(coalesce(sum(CASE WHEN r.krk > 1 THEN 1 END), 0)
                            AS DOUBLE) / count(*), 4) AS retention_rate
    FROM q LEFT JOIN ranked r ON r.doc_id = q.doc_id
    GROUP BY q.source
    ORDER BY q.source
    """

    @query("d20_quality_collapse", oracle=_duckdb_cluster_sql(tail))
    def d20_quality_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql.window import Window

        d = load_table(spark, sf_dir, "documents")
        # the shared session-pinned LSH+CC assignment (computes once per
        # application+corpus, d18's lesson generalized — VERDICT r7 item 2)
        assign = cluster_assignments(spark, sf_dir)
        q = d.select("doc_id", "source", quality_expr().alias("quality"))
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("quality"), F.asc("doc_id")
        )
        ranked = (
            assign.join(q, "doc_id")
            .withColumn("krk", F.row_number().over(w))
            .select("doc_id", "krk")
        )
        return (
            q.join(ranked, "doc_id", "left")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.coalesce(
                    F.sum(F.when(F.col("krk") > 1, 1)), F.lit(0)
                ).cast("bigint").alias("n_dropped"),
                F.round(
                    1.0
                    - F.coalesce(
                        F.sum(F.when(F.col("krk") > 1, 1)), F.lit(0)
                    ).cast("double")
                    / F.count(F.lit(1)),
                    4,
                ).alias("retention_rate"),
            )
            .orderBy("source")
        )


_register_d20()


# --- d21: sorted-neighborhood dedup ------------------------------------------
# The classic record-linkage alternative to LSH (Hernandez & Stolfo's
# sorted-neighborhood method): sort the corpus by a blocking key — here the
# canonical token-bag string, which places reorderings and near-variants
# adjacently — and compare only documents within a fixed rank window w.
# Where LSH bounds candidates probabilistically per band bucket, SNM bounds
# them STRUCTURALLY: exactly (w-1) candidate pairs per document, whatever
# the duplicate structure, so candidate volume is corpus-linear by
# construction (the known trade: duplicate clusters wider than w need
# multi-pass SNM with different keys).
#
# 100 TB shape: the global rank is the two-pass range-partitioned
# distributed_row_number (no partition-less window); the neighborhood
# self-join is an equi-join on the rank bucket (right side fans out x2 to
# its own and previous bucket — every in-window pair lands in exactly one
# bucket match); verification touches only the O(corpus x w) candidate
# pairs. The 4-dp jaccard derives from exact integer counts by integer
# half-up division — identical at any partitioning and in both engines —
# and the >= 0.5 threshold is the exact integer test 2*inter >= union.

SNM_WINDOW = 4


@query(
    "d21_sorted_neighborhood",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             list_sort(list_distinct(list_filter(
               string_split(lower(text), ' '), t -> t <> ''))) AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, array_to_string(toks, ' ') AS canon,
             len(toks) AS n_tok
      FROM d
    ), r AS (
      SELECT doc_id, n_tok,
             row_number() OVER (ORDER BY canon, doc_id) AS rn
      FROM c
    ), cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             b.rn - a.rn AS rank_gap, a.n_tok AS na, b.n_tok AS nb
      FROM r a JOIN r b
        ON b.rn > a.rn AND b.rn - a.rn < {SNM_WINDOW}
    ), tok AS (
      SELECT doc_id, unnest(toks) AS token FROM d
    ), inter AS (
      SELECT c.doc_a, c.doc_b, c.rank_gap, c.na, c.nb,
             count(*) AS n_inter
      FROM cand c
        JOIN tok ta ON ta.doc_id = c.doc_a
        JOIN tok tb ON tb.doc_id = c.doc_b AND tb.token = ta.token
      GROUP BY ALL
    )
    SELECT doc_a, doc_b, CAST(rank_gap AS INTEGER) AS rank_gap,
           ((20000 * n_inter + (na + nb - n_inter))
            // (2 * (na + nb - n_inter))) / 10000.0 AS jaccard
    FROM inter
    WHERE 2 * n_inter >= (na + nb - n_inter)
    ORDER BY jaccard DESC, doc_a, doc_b
    LIMIT 50
    """,
)
def d21_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_streaming_logservice_spark.operators.pipeline_ops import (
        distributed_row_number,
    )

    d = load_table(spark, sf_dir, "documents")
    toks_arr = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        )
    )
    base = d.select(
        "doc_id",
        F.concat_ws(" ", toks_arr).alias("canon"),
        F.size(toks_arr).alias("n_tok"),
    )
    ranked = distributed_row_number(
        base, [F.asc("canon"), F.asc("doc_id")], out="rn"
    ).select("doc_id", "n_tok", "rn")
    a_side = ranked.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_tok").alias("na"),
        F.col("rn").alias("rn_a"),
        F.expr(f"rn DIV {SNM_WINDOW}").alias("bkt"),
    )
    # right side fans out to its own and the previous bucket: a pair with
    # gap in [1, w-1] either shares a's bucket or sits in the next one, so
    # it matches on exactly one of the two keys — never zero, never twice
    b_side = ranked.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_tok").alias("nb"),
        F.col("rn").alias("rn_b"),
        F.explode(
            F.array(
                F.expr(f"rn DIV {SNM_WINDOW}"),
                F.expr(f"rn DIV {SNM_WINDOW} - 1"),
            )
        ).alias("bkt"),
    )
    cand = (
        a_side.join(b_side, "bkt")
        .where(
            (F.col("rn_b") > F.col("rn_a"))
            & (F.col("rn_b") - F.col("rn_a") < SNM_WINDOW)
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("rn_b") - F.col("rn_a")).cast("int").alias("rank_gap"),
            "na",
            "nb",
        )
    )
    tok = d.select(
        "doc_id", F.explode(toks_arr).alias("token")
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), "token")
    tb = tok.select(F.col("doc_id").alias("doc_b"), "token")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "token"])
        .groupBy("doc_a", "doc_b", "rank_gap", "na", "nb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    den = F.col("na") + F.col("nb") - F.col("n_inter")
    jac4 = (
        F.expr(
            "(20000 * n_inter + (na + nb - n_inter)) "
            "DIV (2 * (na + nb - n_inter))"
        ).cast("double")
        / F.lit(10000.0)
    )
    return (
        inter.where(2 * F.col("n_inter") >= den)
        .select("doc_a", "doc_b", "rank_gap", jac4.alias("jaccard"))
        .orderBy(F.desc("jaccard"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(50)
    )


# --- d22: n-gram train/eval contamination check ----------------------------
# The GPT-3/PaLM-style benchmark-contamination gate: a training document is
# "contaminated" if it shares any 5-token shingle with any document of the
# held-out eval sources. Reference scope: the reference engine has no
# counterpart (north-star §2.5); semantics follow the published n-gram
# overlap decontamination recipe (Brown et al. 2020, appendix C).

EVAL_SOURCES = ("src0", "src1")


def _shingles5(text_col: str = "text") -> Column:
    """Distinct 5-token shingles; documents shorter than 5 tokens yield NO
    shingles (mirrors the oracle's range() bound exactly)."""
    toks = F.split(F.col(text_col), " ")
    full = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 5, F.lit(0))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
            F.element_at(toks, i + 4),
            F.element_at(toks, i + 5),
        ),
    )
    return F.when(F.size(toks) >= 5, F.array_distinct(full)).otherwise(
        F.array().cast("array<string>")
    )


@query(
    "d22_ngram_contamination",
    oracle="""
    WITH sh AS (
      SELECT doc_id, source,
             unnest(list_transform(range(1, greatest(len(toks) - 3, 1)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                    || ' ' || toks[i+3] || ' ' || toks[i+4])) AS shingle
      FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
            FROM documents)
    ), eval_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE source IN ('src0', 'src1')
    ), hits AS (
      SELECT DISTINCT s.doc_id, s.source
      FROM sh s JOIN eval_sh e USING (shingle)
      WHERE s.source NOT IN ('src0', 'src1')
    ), tot AS (
      SELECT source, count(*) AS n_docs FROM documents
      WHERE source NOT IN ('src0', 'src1') GROUP BY 1
    ), con AS (
      SELECT source, count(*) AS n_contaminated FROM hits GROUP BY 1
    )
    SELECT t.source, t.n_docs,
           COALESCE(c.n_contaminated, 0) AS n_contaminated,
           CAST((20000 * COALESCE(c.n_contaminated, 0) + t.n_docs)
                // (2 * t.n_docs) AS DOUBLE) / 10000.0 AS contamination_rate
    FROM tot t LEFT JOIN con c USING (source)
    ORDER BY t.source
    """,
)
def d22_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: per training source, how many docs
    share at least one 5-gram with the held-out eval sources, and the 4-dp
    contamination rate (integer half-up division — engine-identical).

    100 TB shape: the only corpus-sized shuffle is the shingle-keyed
    LEFT SEMI join — the probe side never fans out (semi join emits each
    (doc, shingle) row at most once), the eval side is the distinct shingle
    set of the (much smaller) eval split, and AQE broadcasts it when it
    fits. Doc-level dedup of hits is a (doc_id, source)-keyed distinct
    bounded by the training corpus; everything after runs on O(sources)
    rows. No all-pairs stage anywhere — contamination is a membership
    test, not a similarity join."""
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    sh = d.select("doc_id", "source", F.explode(_shingles5()).alias("shingle"))
    eval_sh = sh.where(is_eval).select("shingle").distinct()
    hits = (
        sh.where(~is_eval)
        .join(eval_sh, "shingle", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    totals = (
        d.where(~is_eval).groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    )
    con = hits.groupBy("source").agg(F.count(F.lit(1)).alias("n_contaminated"))
    rate = (
        F.expr("(20000 * n_contaminated + n_docs) DIV (2 * n_docs)")
        .cast("double")
        / F.lit(10000.0)
    )
    return (
        totals.join(con, "source", "left")
        .na.fill({"n_contaminated": 0})
        .select(
            "source",
            "n_docs",
            "n_contaminated",
            rate.alias("contamination_rate"),
        )
        .orderBy("source")
    )


# --- d23: directional containment (quote / excerpt detection) ---------------
# Jaccard (d02) misses the case LLM pipelines care most about: a short doc
# substantially CONTAINED in a long one (quoted excerpt, boilerplate
# inclusion, copy-with-additions) — the union denominator drowns the
# overlap. Containment C(A→B) = |S(A) ∩ S(B)| / |S(A)| is the asymmetric
# fix (Broder's containment, the same shingle algebra).
#
# The scale lever d02 lacks: a document-frequency CAP on shingles. The pair
# join's output is sum_over_shingles(df²); one boilerplate shingle in a
# million docs is 10¹² pairs. Dropping shingles with df > D23_DF_CAP bounds
# every shingle's fan-out at CAP² and loses nothing — a shingle shared by
# half the corpus identifies boilerplate, not provenance (standard
# stop-shingle practice). Both engines apply the same cap, so the check is
# exact, and the 4-dp ratios use integer half-up division (bit-stable at
# any partitioning).

D23_DF_CAP = 20        # keep shingles appearing in <= 20 docs
D23_MIN_CONT = 0.5     # report pairs where either direction >= 0.5


def _register_d23() -> None:
    oracle = f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      )
    ), capped AS (
      SELECT doc_id, shingle FROM sh
      WHERE shingle IN (
        SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) <= {D23_DF_CAP}
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n_sh FROM capped GROUP BY doc_id
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM capped a JOIN capped b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_inter,
           sa.n_sh AS n_sh_a, sb.n_sh AS n_sh_b,
           ((20000 * n_inter + sa.n_sh) // (2 * sa.n_sh)) / 10000.0
             AS cont_a_in_b,
           ((20000 * n_inter + sb.n_sh) // (2 * sb.n_sh)) / 10000.0
             AS cont_b_in_a
    FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE 2 * n_inter >= sa.n_sh OR 2 * n_inter >= sb.n_sh
    ORDER BY greatest(
        (20000 * n_inter + sa.n_sh) // (2 * sa.n_sh),
        (20000 * n_inter + sb.n_sh) // (2 * sb.n_sh)) DESC,
      doc_a, doc_b
    LIMIT 50
    """

    @query("d23_containment", oracle=oracle)
    def d23_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
        # NOTE (r14): deliberately NOT localCheckpoint'd — the pair join's
        # two sides and the df-cap branch are IDENTICAL subplans, so
        # Spark's ReusedExchange already computes the shingle shuffle once
        # and shares it; materializing to an RDD here measured 2.4 s →
        # 8.7 s (the checkpoint write + uncodegen'd RDD rescans cost more
        # than the reuse saves).
        # r15 (guide §2.3, VERDICT r14 item 9): every downstream use of the
        # shingle — distinct, df count, pair join — is SET algebra on its
        # identity, never its text, so carry xxhash64(shingle) (8 bytes)
        # through the exchanges instead of the ~20-char string. Verified
        # exact against the string oracle at sf0.001/0.01/0.1; a collision
        # among the corpus's distinct shingles is the only way any output
        # value could move (~S²/2⁶⁵ for S distinct shingles — negligible
        # until S approaches billions; swap in a 128-bit digest if a
        # corpus that size must stay exact).
        sh = (
            d.select("doc_id", F.explode(_shingles3()).alias("sh_txt"))
            .select("doc_id", F.xxhash64("sh_txt").alias("shingle"))
            .distinct()
        )
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= D23_DF_CAP)
            .select("shingle")
        )
        # r15 (guide §2.4): `capped` feeds the pair join's PROBE side, its
        # BROADCAST build side, and both size lookups. The shuffle-exchange
        # cache shares the probe-side copies, but a BroadcastExchange can
        # never reuse a shuffle exchange — the r15 stage dump showed the
        # whole tokenize+shingle map (10 s task CPU) running a second time
        # just to build the broadcast side. Pinning the POST-CAP relation
        # (a few hundred k (doc_id, int64) rows — unlike the r14 negative
        # A/B, which materialized the corpus-sized pre-cap relation and
        # lost) runs the tokenize once; every consumer then scans the RDD.
        capped = sh.join(rare, "shingle").localCheckpoint(eager=True)
        sizes = capped.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
        a = capped.alias("a")
        b = capped.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sa = sizes.alias("sa")
        sb = sizes.alias("sb")
        # integer half-up 4-dp division: bit-identical in both engines and
        # partition-order-independent (all inputs are exact bigints)
        c_ab = F.expr("(20000 * n_inter + n_sh_a) DIV (2 * n_sh_a)")
        c_ba = F.expr("(20000 * n_inter + n_sh_b) DIV (2 * n_sh_b)")
        return (
            pairs.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
            .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                "doc_a",
                "doc_b",
                "n_inter",
                F.col("sa.n_sh").alias("n_sh_a"),
                F.col("sb.n_sh").alias("n_sh_b"),
            )
            .where(
                (2 * F.col("n_inter") >= F.col("n_sh_a"))
                | (2 * F.col("n_inter") >= F.col("n_sh_b"))
            )
            .select(
                "doc_a",
                "doc_b",
                "n_inter",
                "n_sh_a",
                "n_sh_b",
                (c_ab.cast("double") / 10000.0).alias("cont_a_in_b"),
                (c_ba.cast("double") / 10000.0).alias("cont_b_in_a"),
            )
            .orderBy(
                F.greatest(c_ab, c_ba).desc(), F.asc("doc_a"), F.asc("doc_b")
            )
            .limit(50)
        )


_register_d23()


# --- d24: end-to-end dedup funnel (exact -> near-dup -> substring) -----------
# The integration view every training-data pipeline publishes: how many
# documents survive each dedup stage, per source. Stage rules are all
# deterministic keeper functions (no RNG, no order dependence):
#   1. exact      — keep the min doc_id of each md5(text) group;
#   2. near-dup   — among stage-1 survivors, keep the min doc_id of each
#                   LSH+CC cluster (unclustered docs are their own group);
#                   reuses the PINNED cluster_assignments chain, so in a
#                   bench sweep this stage costs one join, not a rebuild;
#   3. substring  — among stage-2 survivors, drop a doc when >= 50% of its
#                   distinct W-token windows are OWNED by a lower-id
#                   survivor (owner = min doc_id per window hash) — the
#                   Lee-et-al exact-substring pass turned into a
#                   deterministic keeper rule.
#
# 100 TB shape: stage 1/2 keeper sets are digest/id aggregates (text never
# enters their shuffles; survivors re-join the corpus by id to project
# text for stage 3); stage 3 shuffles only 16-byte window digests with
# map-side combine, and the owner relation is a per-digest min. The 4-dp
# retention is integer half-up division.

def _funnel_stages(spark: SparkSession, sf_dir: str):
    """(d, s1, s2, s3): the corpus and the per-stage survivor id sets of
    the exact → near-dup → substring funnel (see d24 below for the stage
    rules). Shared by d24 (per-source survivor counts) and t17 (the token
    budget the survivors carry)."""
    d = load_table(spark, sf_dir, "documents")
    dg = d.select("doc_id", "source", F.md5("text").alias("dg"))
    k1 = dg.groupBy("dg").agg(F.min("doc_id").alias("kid"))
    s1 = dg.join(k1, "dg").where(F.col("doc_id") == F.col("kid")).select(
        "doc_id", "source"
    )
    cc = cluster_assignments(spark, sf_dir)
    s1g = s1.join(cc, "doc_id", "left").select(
        "doc_id",
        "source",
        F.coalesce("cluster_id", "doc_id").alias("grp"),
    )
    k2 = s1g.groupBy("grp").agg(F.min("doc_id").alias("kid"))
    s2 = (
        s1g.join(k2, "grp")
        .where(F.col("doc_id") == F.col("kid"))
        .select("doc_id", "source")
    )
    # survivors re-join the corpus by id so text enters only the
    # row-local window stage, never the keeper shuffles above
    par = spark.sparkContext.defaultParallelism
    s2t = d.join(s2.select("doc_id"), "doc_id", "left_semi").repartition(
        par, "doc_id"
    )
    w = s2t.select(
        "doc_id", F.explode(_window_hashes()).alias("wh")
    ).distinct()
    own = w.groupBy("wh").agg(F.min("doc_id").alias("owner"))
    ext = (
        w.join(own, "wh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("owner") < F.col("doc_id"), 1).otherwise(0)
            ).alias("n_ext"),
        )
    )
    s3 = (
        s2.join(ext, "doc_id", "left")
        .where(F.col("n").isNull() | (2 * F.col("n_ext") < F.col("n")))
        .select("doc_id", "source")
    )
    return d, s1, s2, s3


def _duckdb_funnel_ctes() -> str:
    """The dgd..s3 funnel CTE chain (appended after the cluster CTEs) —
    shared by d24's and t17's oracles."""
    W1, W2 = WINDOW_W - 2, WINDOW_W - 1
    return f"""
    , dgd AS (
      SELECT doc_id, source, text, md5(text) AS dg FROM documents
    ), s1 AS (
      SELECT d.* FROM dgd d
        JOIN (SELECT dg, min(doc_id) AS kid FROM dgd GROUP BY dg) k
          ON k.dg = d.dg AND k.kid = d.doc_id
    ), s1g AS (
      SELECT s1.*, coalesce(a.cluster_id, s1.doc_id) AS grp
      FROM s1 LEFT JOIN assign a ON a.doc_id = s1.doc_id
    ), s2 AS (
      SELECT s.doc_id, s.source, s.text FROM s1g s
        JOIN (SELECT grp, min(doc_id) AS kid FROM s1g GROUP BY grp) k
          ON k.grp = s.grp AND k.kid = s.doc_id
    ), w24 AS (
      SELECT DISTINCT doc_id, wh FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(toks) - {W1}, 1)),
                      i -> md5(array_to_string(toks[i:i+{W2}], ' ')))) AS wh
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM s2)
      )
    ), own AS (
      SELECT wh, min(doc_id) AS owner FROM w24 GROUP BY wh
    ), ext AS (
      SELECT w.doc_id, count(*) AS n,
             sum(CASE WHEN o.owner < w.doc_id THEN 1 ELSE 0 END) AS n_ext
      FROM w24 w JOIN own o USING (wh) GROUP BY w.doc_id
    ), s3 AS (
      SELECT s2.doc_id, s2.source FROM s2
        LEFT JOIN ext ON ext.doc_id = s2.doc_id
      WHERE ext.doc_id IS NULL OR 2 * ext.n_ext < ext.n
    )"""


def _register_d24() -> None:
    tail = _duckdb_funnel_ctes() + """
    , base AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), c1 AS (
      SELECT source, count(*) AS n_exact FROM s1 GROUP BY source
    ), c2 AS (
      SELECT source, count(*) AS n_neardup FROM s2 GROUP BY source
    ), c3 AS (
      SELECT source, count(*) AS n_substring FROM s3 GROUP BY source
    )
    SELECT b.source, b.n_docs,
           CAST(coalesce(c1.n_exact, 0) AS BIGINT) AS n_exact,
           CAST(coalesce(c2.n_neardup, 0) AS BIGINT) AS n_neardup,
           CAST(coalesce(c3.n_substring, 0) AS BIGINT) AS n_substring,
           CAST((20000 * coalesce(c3.n_substring, 0) + b.n_docs)
                // (2 * b.n_docs) AS DOUBLE) / 10000.0 AS retained
    FROM base b
      LEFT JOIN c1 ON c1.source = b.source
      LEFT JOIN c2 ON c2.source = b.source
      LEFT JOIN c3 ON c3.source = b.source
    ORDER BY b.source
    """

    @query("d24_dedup_funnel", oracle=_duckdb_cluster_sql(tail))
    def d24_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
        d, s1, s2, s3 = _funnel_stages(spark, sf_dir)
        base = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
        c1 = s1.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
        c2 = s2.groupBy("source").agg(F.count(F.lit(1)).alias("n_neardup"))
        c3 = s3.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_substring")
        )
        out = (
            base.join(c1, "source", "left")
            .join(c2, "source", "left")
            .join(c3, "source", "left")
            .na.fill({"n_exact": 0, "n_neardup": 0, "n_substring": 0})
        )
        return out.select(
            "source",
            "n_docs",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_neardup").cast("bigint").alias("n_neardup"),
            F.col("n_substring").cast("bigint").alias("n_substring"),
            (
                F.expr(
                    "(20000 * n_substring + n_docs) DIV (2 * n_docs)"
                ).cast("double")
                / F.lit(10000.0)
            ).alias("retained"),
        ).orderBy("source")


_register_d24()


# --- t17: funnel token budget -------------------------------------------------
# The question the training-run planner actually asks after d24: how many
# TOKENS survive the dedup funnel, per source — docs are not the budget
# unit, tokens are. Whitespace tokenization (the d-family's unit, exactly
# replayable in SQL); kept share is integer half-up 4-dp.
#
# 100 TB shape: the funnel's keeper sets are the d24 machinery (pinned
# LSH+CC chain reused — one join, not a rebuild); token counting is one
# row-local length pass over the corpus and one over the survivor
# left-semi projection, both aggregated per source with map-side combine.

def _register_t17() -> None:
    tok_expr = "len(list_filter(string_split(text, ' '), t -> t <> ''))"
    tail = _duckdb_funnel_ctes() + f"""
    , tot AS (
      SELECT source, sum({tok_expr}) AS tokens_total,
             count(*) AS n_docs
      FROM documents GROUP BY source
    ), kept AS (
      SELECT d.source, sum({tok_expr}) AS tokens_kept,
             count(*) AS n_docs_kept
      FROM documents d JOIN s3 ON s3.doc_id = d.doc_id
      GROUP BY d.source
    )
    SELECT t.source,
           CAST(t.n_docs AS BIGINT) AS n_docs,
           CAST(coalesce(k.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
           CAST(t.tokens_total AS BIGINT) AS tokens_total,
           CAST(coalesce(k.tokens_kept, 0) AS BIGINT) AS tokens_kept,
           CAST((20000 * coalesce(k.tokens_kept, 0) + t.tokens_total)
                // (2 * t.tokens_total) AS DOUBLE) / 10000.0 AS tokens_retained
    FROM tot t LEFT JOIN kept k ON k.source = t.source
    ORDER BY t.source
    """

    @query("t17_funnel_token_budget", oracle=_duckdb_cluster_sql(tail))
    def t17_funnel_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
        d, _s1, _s2, s3 = _funnel_stages(spark, sf_dir)
        n_tok = F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).cast("bigint")
        tot = d.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("tokens_total"),
        )
        kept = (
            d.join(s3.select("doc_id"), "doc_id", "left_semi")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs_kept"),
                F.sum(n_tok).alias("tokens_kept"),
            )
        )
        ret = F.expr(
            "(20000 * tokens_kept + tokens_total) DIV (2 * tokens_total)"
        ).cast("double") / F.lit(10000.0)
        return (
            tot.join(kept, "source", "left")
            .na.fill({"n_docs_kept": 0, "tokens_kept": 0})
            .select(
                "source",
                "n_docs",
                F.col("n_docs_kept").cast("bigint").alias("n_docs_kept"),
                "tokens_total",
                F.col("tokens_kept").cast("bigint").alias("tokens_kept"),
                ret.alias("tokens_retained"),
            )
            .orderBy("source")
        )


_register_t17()


# --- d25: shingle document-frequency spectrum ---------------------------------
# The boilerplate detector that calibrates d23's df-cap lever (and any
# shingle-keyed join's skew exposure): how many 3-token shingles occur in
# exactly df documents, with the share of all distinct shingles. A fat
# high-df tail means template/boilerplate text — the thing that turns a
# shingle-keyed pair join quadratic unless capped.
#
# 100 TB shape: shingling is row-local (within-doc distinct is computed
# in-row by array_distinct, no per-doc explode+distinct shuffle); df is
# ONE shingle-keyed count with map-side combine; the spectrum runs on
# O(distinct df) rows and its total is a 1-row broadcast.

@query(
    "d25_shingle_df_spectrum",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id, shingle
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      )
    ), df AS (
      SELECT shingle, count(*) AS df FROM sh GROUP BY shingle
    ), spec AS (
      SELECT df, count(*) AS n_shingles FROM df GROUP BY df
    ), tot AS (
      SELECT sum(n_shingles) AS t FROM spec
    )
    SELECT s.df, s.n_shingles,
           CAST((20000 * s.n_shingles + t.t) // (2 * t.t) AS DOUBLE)
             / 10000.0 AS shingle_share
    FROM spec s CROSS JOIN tot t
    ORDER BY s.df
    """,
)
def d25_shingle_df_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread_rowlocal(load_table(spark, sf_dir, "documents"))
    sh = d.select("doc_id", F.explode(_shingles3()).alias("shingle"))
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    spec = df.groupBy("df").agg(F.count(F.lit(1)).alias("n_shingles"))
    tot = spec.agg(F.sum("n_shingles").alias("t"))
    share = F.expr("(20000 * n_shingles + t) DIV (2 * t)").cast(
        "double"
    ) / F.lit(10000.0)
    return (
        spec.join(F.broadcast(tot), how="cross")
        .select("df", "n_shingles", share.alias("shingle_share"))
        .orderBy("df")
    )


# --- d26: boilerplate prefix collapse -----------------------------------------
# Crawl corpora carry families of documents that OPEN identically (site
# navigation, license headers, generated-page templates) even when their
# bodies differ — full-text dedup (d01) and window dedup (d10) both miss
# them. d26 keys every document on the md5 of its first PREFIX_K tokens
# and reports each non-trivial prefix family: canonical member (min
# doc_id), size, and how many sources it spans (a cross-source prefix
# family is template syndication, not coincidence).
#
# 100 TB shape: the key is row-local (slice + concat + md5 over ≤K
# tokens); ONE prefix-keyed aggregate (map-side combined) produces the
# families; output is O(families). The md5 is the grouping key exactly as
# the digest store's — 128-bit, collision-safe at corpus scale.


def _register_d26() -> None:
    from pyspark.sql import SparkSession

    from spark_streaming_logservice_spark.registry import query

    PREFIX_K = 3

    # NULL-text docs are excluded on BOTH sides: Spark's concat_ws over a
    # NULL array yields '' (merging NULLs into the empty-prefix family)
    # while DuckDB's array_to_string yields NULL (its own group) — the
    # engines only agree if NULL text never reaches the key (ADVICE r10).
    oracle = f"""
    WITH keyed AS (
      SELECT doc_id, source,
             md5(array_to_string(
                 list_filter(string_split(text, ' '), t -> t <> '')[1:{PREFIX_K}],
                 ' ')) AS pk
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT min(doc_id) AS canonical_doc_id,
           count(*) AS n_docs,
           count(DISTINCT source) AS n_sources
    FROM keyed
    GROUP BY pk
    HAVING count(*) >= 2
    ORDER BY canonical_doc_id
    """

    @query("d26_prefix_dedup", oracle=oracle)
    def d26_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
        d = load_table(spark, sf_dir, "documents").where(
            F.col("text").isNotNull()
        )
        keyed = d.select(
            "doc_id",
            "source",
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.filter(
                            F.split(F.col("text"), " "), lambda t: t != ""
                        ),
                        1,
                        PREFIX_K,
                    ),
                )
            ).alias("pk"),
        )
        return (
            keyed.groupBy("pk")
            .agg(
                F.min("doc_id").alias("canonical_doc_id"),
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("source").alias("n_sources"),
            )
            .where(F.col("n_docs") >= 2)
            .select("canonical_doc_id", "n_docs", "n_sources")
            .orderBy("canonical_doc_id")
        )


_register_d26()


# --- d27: exact duplicated-substring spans (suffix-array dedup, Spark-first)
# The classic training-data pass (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better") finds every substring of >= L tokens
# that occurs more than once in the corpus, via a giant suffix array. The
# Spark-first equivalence: a token span is covered by a duplicated substring
# of length >= L iff it is covered by an L-gram that occurs >= 2 times in
# the corpus. So exact coverage = duplicated-L-gram detection + per-doc
# interval merge (gaps-and-islands) — no suffix array, no global sort.
#
# 100 TB design: the corpus-sized shuffles are the gram stream keyed by a
# 16-byte md5 (same O(total tokens) data movement as the suffix-array sort,
# but hash-partitioned instead of globally ordered) — once map-side-combined
# into the duplicated-gram set, once for the AQE-splittable semi-join back
# (a hot boilerplate gram never pins a task; see the in-plan comment). The
# interval merge is a doc_id-partitioned window, i.e. the corpus's natural
# partitioning. Self-repeats inside one doc count as duplication, matching
# the suffix-array semantics.


def _register_d27() -> None:
    L = 5  # minimum duplicated-substring length, in tokens

    oracle = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
      SELECT doc_id, n_toks, u.g AS g, u.pos AS pos FROM (
        SELECT doc_id, len(ts) AS n_toks,
               unnest(list_transform(range(1, len(ts) - {L} + 2),
                      i -> {{'g': md5(array_to_string(ts[i:i+{L}-1], ' ')),
                             'pos': i}})) AS u
        FROM toks
      )
    ),
    hits AS (
      SELECT doc_id, n_toks, pos, count(*) OVER (PARTITION BY g) AS cnt
      FROM grams
    ),
    marked AS (
      SELECT doc_id, n_toks, pos,
             CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + {L}
                  THEN 1 ELSE 0 END AS brk
      FROM hits WHERE cnt >= 2
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    islands AS (
      SELECT doc_id, n_toks, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    spans AS (
      SELECT doc_id, any_value(n_toks) AS n_toks,
             min(pos) AS s, max(pos) + {L} - 1 AS e
      FROM islands GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens,
           CAST(max(e - s + 1) AS BIGINT) AS longest_span,
           round(CAST(sum(e - s + 1) AS DOUBLE) / any_value(n_toks), 6) AS dup_frac
    FROM spans GROUP BY doc_id ORDER BY doc_id
    """

    @query("d27_dup_substring_spans", oracle=oracle)
    def d27_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        d = spread_rowlocal(
            load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
        )
        ts = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        toks = d.select("doc_id", ts.alias("ts")).select(
            "doc_id", F.size("ts").alias("n_toks"), F.col("ts")
        )
        # row-local L-gram digests; posexplode's 0-based pos becomes the
        # 1-based token position of the gram start
        gram_list = F.when(
            F.col("n_toks") >= L,
            F.transform(
                F.sequence(F.lit(1), F.col("n_toks") - L + 1),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(F.col("ts"), i + j) for j in range(L)],
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = toks.select(
            "doc_id", "n_toks", F.posexplode(gram_list).alias("p0", "g")
        ).select(
            "doc_id", "n_toks", (F.col("p0") + 1).alias("pos"), "g"
        )
        # duplicated-gram detection as aggregate + semi-join, NOT a
        # window over g: the aggregate partial-combines per task, so a
        # hot boilerplate gram (cookie banner, license header — 10^8+
        # occurrences at 100 TB) collapses to one partial per map task,
        # and the semi-join's residual skew is AQE-splittable — a
        # PARTITION BY g window would pin every occurrence of the hot
        # gram to a single task with no split possible.
        dup_g = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= 2)
            .select("g")
        )
        hits = grams.join(dup_g, "g", "left_semi")
        # gaps-and-islands on the doc's natural partitioning
        w_doc = Window.partitionBy("doc_id").orderBy("pos")
        marked = hits.withColumn(
            "brk",
            F.when(
                F.lag("pos").over(w_doc).isNull()
                | (F.col("pos") > F.lag("pos").over(w_doc) + L),
                1,
            ).otherwise(0),
        )
        islands = marked.withColumn(
            "island",
            F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        spans = islands.groupBy("doc_id", "island").agg(
            F.first("n_toks").alias("n_toks"),
            F.min("pos").alias("s"),
            (F.max("pos") + L - 1).alias("e"),
        )
        span_len = F.col("e") - F.col("s") + 1
        return (
            spans.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                F.sum(span_len).cast("bigint").alias("dup_tokens"),
                F.max(span_len).cast("bigint").alias("longest_span"),
                F.round(
                    F.sum(span_len) / F.first("n_toks"), 6
                ).alias("dup_frac"),
            )
            .orderBy("doc_id")
        )


_register_d27()


# --- d28: duplicated-span REMOVAL (the cleaned-corpus artifact) ------------
# d27 detects duplicated-substring spans; d28 produces what the training
# pipeline actually consumes: each affected document rewritten with every
# duplicated span excised (the conservative remove-all policy — no global
# canonical-occurrence election, so the transform is embarrassingly
# doc-local once spans are known). Same L, same coverage semantics.
#
# 100 TB design: reuses d27's two gram shuffles; the removal itself is a
# doc-keyed join of the corpus against its O(spans) span lists plus a
# row-local positional filter (F.filter's index lambda) — no extra
# corpus-sized shuffle beyond the doc_id join, and only affected docs flow.


def _register_d28() -> None:
    L = 5

    oracle = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
      SELECT doc_id, u.g AS g, u.pos AS pos FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts) - {L} + 2),
                      i -> {{'g': md5(array_to_string(ts[i:i+{L}-1], ' ')),
                             'pos': i}})) AS u
        FROM toks
      )
    ),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + {L}
                  THEN 1 ELSE 0 END AS brk
      FROM grams SEMI JOIN dupg USING (g)
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {L} - 1 AS e
      FROM islands GROUP BY doc_id, island
    ),
    tokpos AS (
      SELECT doc_id, u.tok AS tok, u.pos AS pos FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts) + 1),
                      i -> {{'tok': ts[i], 'pos': i}})) AS u
        FROM toks WHERE doc_id IN (SELECT doc_id FROM spans)
      )
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM tokpos t LEFT JOIN spans sp
        ON t.doc_id = sp.doc_id AND t.pos BETWEEN sp.s AND sp.e
      WHERE sp.doc_id IS NULL
    ),
    kept_agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_kept,
             array_to_string(array_agg(tok ORDER BY pos), ' ') AS cleaned
      FROM kept GROUP BY doc_id
    ),
    removed AS (
      SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_removed
      FROM spans GROUP BY doc_id
    )
    SELECT r.doc_id,
           r.n_removed AS n_removed_tokens,
           coalesce(k.n_kept, 0) AS n_kept_tokens,
           coalesce(k.cleaned, '') AS cleaned_text
    FROM removed r LEFT JOIN kept_agg k ON r.doc_id = k.doc_id
    ORDER BY r.doc_id
    """

    @query("d28_dup_span_removal", oracle=oracle)
    def d28_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        d = spread_rowlocal(
            load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
        )
        ts = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        toks = d.select("doc_id", ts.alias("ts")).select(
            "doc_id", F.size("ts").alias("n_toks"), F.col("ts")
        )
        gram_list = F.when(
            F.col("n_toks") >= L,
            F.transform(
                F.sequence(F.lit(1), F.col("n_toks") - L + 1),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(F.col("ts"), i + j) for j in range(L)],
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = toks.select(
            "doc_id", F.posexplode(gram_list).alias("p0", "g")
        ).select("doc_id", (F.col("p0") + 1).alias("pos"), "g")
        # d27's skew-safe duplicate detection: combined aggregate + semi-join
        dup_g = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= 2)
            .select("g")
        )
        hits = grams.join(dup_g, "g", "left_semi")
        w_doc = Window.partitionBy("doc_id").orderBy("pos")
        marked = hits.withColumn(
            "brk",
            F.when(
                F.lag("pos").over(w_doc).isNull()
                | (F.col("pos") > F.lag("pos").over(w_doc) + L),
                1,
            ).otherwise(0),
        )
        islands = marked.withColumn(
            "island",
            F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        spans = islands.groupBy("doc_id", "island").agg(
            F.min("pos").alias("s"), (F.max("pos") + L - 1).alias("e")
        )
        per_doc = spans.groupBy("doc_id").agg(
            F.collect_list(F.struct("s", "e")).alias("spans"),
            F.sum(F.col("e") - F.col("s") + 1)
            .cast("bigint")
            .alias("n_removed_tokens"),
        )
        # doc-keyed join back; the excision is a row-local positional
        # filter (1-based index lambda), no further shuffle
        joined = toks.join(per_doc, "doc_id")
        kept = F.filter(
            F.col("ts"),
            lambda t, i: ~F.exists(
                F.col("spans"),
                lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]),
            ),
        )
        return (
            joined.select(
                "doc_id",
                "n_removed_tokens",
                F.size(kept).cast("bigint").alias("n_kept_tokens"),
                F.concat_ws(" ", kept).alias("cleaned_text"),
            )
            .orderBy("doc_id")
        )


_register_d28()


# --- d29: keeper-election span removal (canonical occurrence survives) -----
# d28's remove-all policy excises EVERY occurrence of a duplicated span —
# conservative, but a corpus cleaned that way loses all copies of
# legitimately repeated text (a quotation appearing twice vanishes
# entirely). d29 matches Lee et al. 2022's actual dedup semantics: each
# duplicated L-gram family elects ONE canonical occurrence — the global
# min by (doc_id, pos) — and only NON-canonical occurrences are excised,
# so a copy of every duplicated passage survives WHERE ITS CANONICAL
# LIVES (when a passage repeats across docs, the whole lowest-doc copy is
# canonical for every one of its grams and survives intact; a self-repeat
# keeps its first occurrence). Overlap caveats, documented: span excision
# is token-range based, so (a) a self-overlapping repeat ("z z z z z z")
# keeps only the tokens outside the non-canonical island, not a full L
# tokens, and (b) a canonical occurrence living in a NON-lowest doc can
# still be partially excised by an OVERLAPPING gram family whose own
# canonical sits in a lower doc — its tokens inside the other family's
# non-canonical island go with it, so for such cross-family overlaps no
# intact copy may survive corpus-wide. The guarantee is per GRAM FAMILY
# (exactly one occurrence of each duplicated L-gram is spared), not per
# maximal passage; the oracle implements the identical election, so the
# two engines agree exactly.
#
# 100 TB design: identical shuffle structure to d27/d28 — the election is
# the SAME count aggregate extended with an associative min(struct) (still
# map-side partial-combined per task, so a 10^8-occurrence boilerplate
# gram collapses to one partial per task), and the hits join on g stays
# AQE-splittable; no window over the gram key anywhere.


def _register_d29() -> None:
    L = 5

    oracle = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ts
      FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
      SELECT doc_id, u.g AS g, u.pos AS pos FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts) - {L} + 2),
                      i -> {{'g': md5(array_to_string(ts[i:i+{L}-1], ' ')),
                             'pos': i}})) AS u
        FROM toks
      )
    ),
    occ AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
             count(*) OVER (PARTITION BY g) AS cnt
      FROM grams
    ),
    hits AS (SELECT doc_id, pos FROM occ WHERE cnt >= 2 AND rn > 1),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + {L}
                  THEN 1 ELSE 0 END AS brk
      FROM hits
      WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    islands AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    spans AS (
      SELECT doc_id, min(pos) AS s, max(pos) + {L} - 1 AS e
      FROM islands GROUP BY doc_id, island
    ),
    tokpos AS (
      SELECT doc_id, u.tok AS tok, u.pos AS pos FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(ts) + 1),
                      i -> {{'tok': ts[i], 'pos': i}})) AS u
        FROM toks WHERE doc_id IN (SELECT doc_id FROM spans)
      )
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM tokpos t LEFT JOIN spans sp
        ON t.doc_id = sp.doc_id AND t.pos BETWEEN sp.s AND sp.e
      WHERE sp.doc_id IS NULL
    ),
    kept_agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_kept,
             array_to_string(array_agg(tok ORDER BY pos), ' ') AS cleaned
      FROM kept GROUP BY doc_id
    ),
    removed AS (
      SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS n_removed
      FROM spans GROUP BY doc_id
    )
    SELECT r.doc_id,
           r.n_removed AS n_removed_tokens,
           coalesce(k.n_kept, 0) AS n_kept_tokens,
           coalesce(k.cleaned, '') AS cleaned_text
    FROM removed r LEFT JOIN kept_agg k ON r.doc_id = k.doc_id
    ORDER BY r.doc_id
    """

    @query("d29_dup_span_removal_canonical", oracle=oracle)
    def d29_dup_span_removal_canonical(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from pyspark.sql import Window

        d = spread_rowlocal(
            load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
        )
        ts = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        toks = d.select("doc_id", ts.alias("ts")).select(
            "doc_id", F.size("ts").alias("n_toks"), F.col("ts")
        )
        gram_list = F.when(
            F.col("n_toks") >= L,
            F.transform(
                F.sequence(F.lit(1), F.col("n_toks") - L + 1),
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        *[F.element_at(F.col("ts"), i + j) for j in range(L)],
                    )
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = toks.select(
            "doc_id", F.posexplode(gram_list).alias("p0", "g")
        ).select("doc_id", (F.col("p0") + 1).alias("pos"), "g")
        # keeper election rides d27's skew-safe aggregate: min(struct) is
        # associative, so the canonical occurrence partial-combines on the
        # map side exactly like the count does — no window over g
        canon = (
            grams.groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min(F.struct("doc_id", "pos")).alias("c"),
            )
            .where(F.col("cnt") >= 2)
            .select(
                "g",
                F.col("c.doc_id").alias("c_doc"),
                F.col("c.pos").alias("c_pos"),
            )
        )
        hits = (
            grams.join(canon, "g")
            .where(
                (F.col("doc_id") != F.col("c_doc"))
                | (F.col("pos") != F.col("c_pos"))
            )
            .select("doc_id", "pos")
        )
        w_doc = Window.partitionBy("doc_id").orderBy("pos")
        marked = hits.withColumn(
            "brk",
            F.when(
                F.lag("pos").over(w_doc).isNull()
                | (F.col("pos") > F.lag("pos").over(w_doc) + L),
                1,
            ).otherwise(0),
        )
        islands = marked.withColumn(
            "island",
            F.sum("brk").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
        spans = islands.groupBy("doc_id", "island").agg(
            F.min("pos").alias("s"), (F.max("pos") + L - 1).alias("e")
        )
        per_doc = spans.groupBy("doc_id").agg(
            F.collect_list(F.struct("s", "e")).alias("spans"),
            F.sum(F.col("e") - F.col("s") + 1)
            .cast("bigint")
            .alias("n_removed_tokens"),
        )
        joined = toks.join(per_doc, "doc_id")
        kept = F.filter(
            F.col("ts"),
            lambda t, i: ~F.exists(
                F.col("spans"),
                lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]),
            ),
        )
        return (
            joined.select(
                "doc_id",
                "n_removed_tokens",
                F.size(kept).cast("bigint").alias("n_kept_tokens"),
                F.concat_ws(" ", kept).alias("cleaned_text"),
            )
            .orderBy("doc_id")
        )


_register_d29()
