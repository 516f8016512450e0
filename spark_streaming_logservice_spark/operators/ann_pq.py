"""Product quantization (PQ) approximate nearest neighbor.

PQ is the memory-side scale path for ANN (Jégou, Douze, Schmid — "Product
Quantization for Nearest Neighbor Search", TPAMI 2011): split each D-dim
vector into M subspaces, k-means each subspace independently to K codewords,
and store each vector as M small codes (here 64 doubles → 4 codes, a 128×
compression). Search is asymmetric distance computation (ADC): the query
stays exact, each candidate's score is the sum of M table lookups — at
100 TB the corpus never rehydrates to floats, and the per-query lookup
table (M × K dot products) is tiny by construction, so it broadcasts and
the scoring join is map-side.

Everything is DataFrame-native: subspace slicing via F.slice, Lloyd steps
as posexplode + positional means (one shuffle each, shared across all M
subspaces in a single job — ``sub`` is just another grouping key), ADC via
a (sub, code) equi-join.

Determinism mirrors ann_ivf.py: codewords seed from the K lowest vec_ids,
no RNG, both engines accumulate dot products sequentially (zip_with +
aggregate fold vs DuckDB list_dot_product/list_sum), the ADC sum is a
fixed-association t0+t1+t2+t3 expression (never a float groupBy-sum whose
partial order could differ between engines), and scores round to 6
decimals with an id tie-break before ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_streaming_logservice_spark.operators.ann_ivf import _normalize
from spark_streaming_logservice_spark.operators.similarity import _dot
from spark_streaming_logservice_spark.registry import query
from spark_streaming_logservice_spark.tables import load_table

M_SUB = 4  # subspaces
K_SUB = 8  # codewords per subspace
N_ITERS = 2  # Lloyd steps (fixed, replayable in the oracle)
TOP_K = 3
N_QUERY = 5


def _ss(a: Column) -> Column:
    """Sequential sum of squares (matches DuckDB list_sum(list_transform))."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def _subspaces(base: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, sub, svec): the M contiguous slices of each normalized vector."""
    dl = (F.size("emb") / M_SUB).cast("int")
    arr = F.array(*[F.slice(F.col("emb"), F.lit(m) * dl + 1, dl) for m in range(M_SUB)])
    return base.select(F.col(id_col), F.posexplode(arr).alias("sub", "svec"))


def _assign_codes(subs: DataFrame, codewords: DataFrame) -> DataFrame:
    """Nearest codeword per (vec_id, sub) by squared L2 distance."""
    dist2 = (
        _ss(F.col("svec")) + _ss(F.col("cvec")) - 2 * _dot(F.col("svec"), F.col("cvec"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.asc("d2"), F.asc("code"))
    return (
        subs.join(F.broadcast(codewords), "sub")
        .select("vec_id", "sub", "svec", "code", dist2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "sub", "svec", "code", "d2")
    )


def train_codebook(emb: DataFrame) -> DataFrame:
    """(sub, code, cvec) after N_ITERS Lloyd steps, seeded from the K_SUB
    lowest vec_ids per subspace. The codebook is M×K rows by construction —
    collecting/broadcasting it is the correct plan, not a shortcut."""
    subs = _subspaces(emb)
    w = Window.partitionBy("sub").orderBy("vec_id")
    codewords = (
        subs.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= K_SUB)
        .select("sub", (F.col("r") - 1).alias("code"), F.col("svec").alias("cvec"))
    )
    for _ in range(N_ITERS):
        assigned = _assign_codes(subs, codewords)
        pos = assigned.select("sub", "code", F.posexplode("svec").alias("pos", "val"))
        codewords = (
            pos.groupBy("sub", "code", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("sub", "code")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                "sub",
                "code",
                F.transform(F.col("pm"), lambda s: s.getField("m")).alias("cvec"),
            )
        )
    return codewords


def pq_search(
    emb: DataFrame, queries: DataFrame, top_k: int = TOP_K
) -> DataFrame:
    """ADC search: (q_id, n_id, adc_score, rk), top_k per query."""
    base = emb.select("vec_id", _normalize(F.col("embedding")).alias("emb"))
    codewords = train_codebook(base)
    codes = _assign_codes(_subspaces(base), codewords).select("vec_id", "sub", "code")
    qsubs = _subspaces(
        queries.select("vec_id", _normalize(F.col("embedding")).alias("emb"))
    ).select(F.col("vec_id").alias("q_id"), "sub", F.col("svec").alias("qvec"))
    # per-query lookup table: M × K_SUB rows per query — broadcast side
    tbl = qsubs.join(F.broadcast(codewords), "sub").select(
        "q_id", "sub", "code", _dot(F.col("qvec"), F.col("cvec")).alias("partial")
    )
    # one conditional-max column per subspace: each (q,n,sub) has exactly one
    # partial, so max() is exact selection, and the final sum is a
    # fixed-association expression — bit-stable across engines.
    parts = (
        codes.join(F.broadcast(tbl), ["sub", "code"])
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(
            *[
                F.max(F.when(F.col("sub") == m, F.col("partial"))).alias(f"t{m}")
                for m in range(M_SUB)
            ]
        )
    )
    adc = F.col("t0") + F.col("t1") + F.col("t2") + F.col("t3")
    w = Window.partitionBy("q_id").orderBy(F.desc("adc_score"), F.asc("n_id"))
    return (
        parts.where(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", F.round(adc, 6).alias("adc_score"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .orderBy("q_id", "rk")
    )


# --- DuckDB oracle: replay the identical pipeline ---------------------------

_PQ_ITER = """
    pa{i} AS (
        SELECT vec_id, sub, code, svec FROM (
            SELECT s.vec_id, s.sub, c.code, s.svec,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.sub
                       ORDER BY list_sum(list_transform(s.svec, x -> x * x))
                              + list_sum(list_transform(c.cvec, x -> x * x))
                              - 2 * list_dot_product(s.svec, c.cvec) ASC,
                              c.code ASC
                   ) AS rk
            FROM subs s JOIN {prev} c USING (sub)
        ) WHERE rk = 1
    ),
    pm{i} AS (
        SELECT sub, code, pos, avg(val) AS m
        FROM (SELECT sub, code, unnest(svec) AS val,
                     unnest(range(1, len(svec) + 1)) AS pos
              FROM pa{i})
        GROUP BY sub, code, pos
    ),
    pc{i} AS (
        SELECT sub, code, list(m ORDER BY pos) AS cvec
        FROM pm{i} GROUP BY sub, code
    )"""

_PQ_BASE = (
    """
    WITH raw AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    base AS (
        SELECT vec_id,
               list_transform(e, x -> x / sqrt(list_sum(list_transform(e, y -> y * y)))) AS emb
        FROM raw
    ),
    subs AS (
        SELECT vec_id, sub, emb[(sub * dl + 1):((sub + 1) * dl)] AS svec
        FROM (SELECT vec_id, emb, len(emb) // """
    + str(M_SUB)
    + """ AS dl FROM base)
          CROSS JOIN (SELECT unnest(range(0, """
    + str(M_SUB)
    + """)) AS sub) ms
    ),
    seed AS (
        SELECT sub, code, cvec FROM (
            SELECT sub, row_number() OVER (PARTITION BY sub ORDER BY vec_id) - 1 AS code,
                   svec AS cvec
            FROM subs
        ) WHERE code < """
    + str(K_SUB)
    + """
    ),"""
    + _PQ_ITER.format(i=1, prev="seed")
    + ","
    + _PQ_ITER.format(i=2, prev="pc1")
    + ","
    + """
    codes AS (
        SELECT vec_id, sub, code FROM (
            SELECT s.vec_id, s.sub, c.code,
                   row_number() OVER (
                       PARTITION BY s.vec_id, s.sub
                       ORDER BY list_sum(list_transform(s.svec, x -> x * x))
                              + list_sum(list_transform(c.cvec, x -> x * x))
                              - 2 * list_dot_product(s.svec, c.cvec) ASC,
                              c.code ASC
                   ) AS rk
            FROM subs s JOIN pc2 c USING (sub)
        ) WHERE rk = 1
    )"""
)

_S07_ORACLE = (
    _PQ_BASE
    + """,
    qsubs AS (
        SELECT vec_id AS q_id, sub, svec AS qvec FROM subs WHERE vec_id < """
    + str(N_QUERY)
    + """
    ),
    tbl AS (
        SELECT q.q_id, c.sub, c.code,
               list_dot_product(q.qvec, c.cvec) AS partial
        FROM qsubs q JOIN pc2 c USING (sub)
    ),
    parts AS (
        SELECT t.q_id, k.vec_id AS n_id,
               max(CASE WHEN t.sub = 0 THEN partial END) AS t0,
               max(CASE WHEN t.sub = 1 THEN partial END) AS t1,
               max(CASE WHEN t.sub = 2 THEN partial END) AS t2,
               max(CASE WHEN t.sub = 3 THEN partial END) AS t3
        FROM codes k JOIN tbl t ON t.sub = k.sub AND t.code = k.code
        GROUP BY t.q_id, k.vec_id
    )
    SELECT q_id, n_id, adc_score, rk FROM (
        SELECT q_id, n_id, round(t0 + t1 + t2 + t3, 6) AS adc_score,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY round(t0 + t1 + t2 + t3, 6) DESC, n_id ASC
               ) AS rk
        FROM parts WHERE q_id <> n_id
    ) WHERE rk <= """
    + str(TOP_K)
    + """
    ORDER BY q_id, rk
    """
)


@query("s07_ann_pq", oracle=_S07_ORACLE)
def s07_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC neighbors for the first N_QUERY vectors, fully oracle-backed:
    the DuckDB CTE chain replays subspace split, seeding, both Lloyd steps,
    encoding, and the ADC table join."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return pq_search(e, e.where(F.col("vec_id") < N_QUERY))


@query(
    "s08_pq_code_balance",
    oracle=_PQ_BASE
    + """
    SELECT sub, code, count(*) AS n_vectors
    FROM codes
    GROUP BY sub, code
    ORDER BY sub, code
    """,
)
def s08_pq_code_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook-balance histogram: vectors per (subspace, codeword). The
    operational health metric of a PQ index — a skewed histogram means the
    codebook wastes bits and ADC scores lose resolution. Integer-only
    output, so the driver hash is float-free."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = e.select("vec_id", _normalize(F.col("embedding")).alias("emb"))
    codewords = train_codebook(base)
    codes = _assign_codes(_subspaces(base), codewords)
    return (
        codes.groupBy("sub", "code")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy("sub", "code")
    )
