"""Similarity-search surface over the embeddings table (SURVEY.md §2C).

Brute-force cosine top-k is the exact baseline and is oracle-checked
against DuckDB's list_cosine_similarity (both engines computed in
double precision, scores rounded to 6 dp, rank ties broken by vec_id).
The IVF variant is approximate by design — rows-only here, recall
tested against the brute-force result in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import similarity as S
from celeborn_spark.registry import query

N_QUERIES = 5          # query side: vec_id < 5
CENTROID_STEP = 100    # IVF centroids: every 100th vector


def _queries_df(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


@query(
    "q_cosine_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
    q AS (SELECT vec_id AS query_id, vec AS qvec FROM v WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.query_id, v.vec_id,
               round(list_cosine_similarity(v.vec, q.qvec), 6) AS cosine
        FROM v CROSS JOIN q WHERE v.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, vec_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored
    )
    SELECT query_id, vec_id, cosine, rnk FROM ranked WHERE rnk <= 10
    """,
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.brute_force_topk(emb, _queries_df(emb), k=10)


@query("q_ann_ivf_topk")  # rows-only: approximate by design, recall-tested
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % CENTROID_STEP == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    return S.ivf_topk(emb, _queries_df(emb), centroids, k=10)


@query("q_embedding_near_dup")  # rows-only: bucketing hash is engine-specific
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(emb, bits=12, threshold=0.5)


@query(
    "q_label_centroids",
    oracle="""
    WITH dims AS (
        SELECT label, unnest(list_transform(range(1, len(e)+1),
                                            i -> {'pos': i-1, 'x': e[i]})) AS u
        FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings)
    )
    SELECT label, u.pos AS pos, round(avg(u.x), 6) AS centroid_val
    FROM dims GROUP BY label, u.pos
    """,
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, one row per (label, dimension): posexplode
    + groupBy — the distributed form of vector averaging (no UDF, no
    driver-side math)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode(S.as_double_array("embedding")).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("x"), 6).alias("centroid_val"))
    )


@query(
    "q_embedding_norms",
    oracle="""
    SELECT label,
           count(*)                                                   AS n,
           round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[],
                                                  x -> x * x)))), 6) AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column aggregation: JVM-side array math + groupBy."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", S.l2_norm(S.as_double_array("embedding")).alias("norm"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("norm"), 6).alias("avg_norm"))
    )
