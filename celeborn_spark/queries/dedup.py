"""Dedup surface: exact content-hash, n-gram Jaccard pairs, MinHash+LSH,
SimHash (SURVEY.md §2C; operators in celeborn_spark.operators.dedup).

Exact + Jaccard are fully oracle-checked (md5 and word-shingle math are
reproducible in DuckDB SQL). MinHash/SimHash depend on Spark's
xxhash64, which DuckDB cannot reproduce — those register rows-only and
carry dedicated recall/property tests in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import dedup as D
from celeborn_spark.registry import query


@query(
    "q_dedup_exact",
    oracle="""
    SELECT content_hash, min(doc_id) AS doc_id, count(*) AS n_copies
    FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)
    GROUP BY content_hash
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(d, "text", "doc_id")


@query(
    "q_dedup_jaccard_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(t[i:i+2], ' '))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.8
    """,
)
def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)


@query("q_dedup_minhash_lsh")  # rows-only: xxhash64 not reproducible in DuckDB
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.verified_lsh_dedup(d, "doc_id", "text", n=3, threshold=0.8)


@query("q_simhash_fingerprints")  # rows-only: xxhash64 not reproducible in DuckDB
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.simhash(d, "doc_id", "text")


@query("q_dedup_groups")  # rows-only: iterative label propagation
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components -> dedup groups (the
    full LLM-corpus dedup pipeline end to end)."""
    from celeborn_spark.operators.components import dedup_groups

    d = load_table(spark, sf_dir, "documents")
    pairs = D.verified_lsh_dedup(d, "doc_id", "text", n=3, threshold=0.8)
    return dedup_groups(pairs)
