"""Multimodal-column surface (SURVEY.md §2C): binary payloads with
typed metadata; JVM-side byte ops oracle-checked, Arrow mapInPandas
decode plumbing rows-only (deterministic fake codec)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import multimodal as M
from celeborn_spark.registry import query


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text)               AS content_sha,
           'text/plain'               AS mime
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata extraction, all JVM-side: byte length
    and content digest of the payload column."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
        F.lit("text/plain").alias("mime"),
    )


@query("q_multimodal_decode")  # rows-only: fake codec exercises Arrow plumbing
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.fake_decode_meta(d)
