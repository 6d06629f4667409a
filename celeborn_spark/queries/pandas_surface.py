"""Grouped z-score surface.

The REGISTERED operator is the pure-JVM window form — (x - avg) /
stddev_samp over a per-user window needs no Python in the hot path, so
it stays inside whole-stage codegen (51x faster than the Arrow
grouped-map form at sf0.1). The applyInPandas variant
(operators/pandas_ops.grouped_zscore) remains the differential test of
the Arrow grouped-map path in tests/test_pandas_path.py — a test
artifact, not the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.pandas_ops import cogroup_merge_asof
from celeborn_spark.registry import query


@query(
    "q_grouped_zscore",
    oracle="""
    WITH g AS (
        SELECT user_id, event_id, value,
               count(*)            OVER w AS n,
               avg(value)          OVER w AS mu,
               stddev_samp(value)  OVER w AS sd
        FROM events
        WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id, event_id, round((value - mu) / sd, 6) AS zscore
    FROM g WHERE n >= 2 AND sd > 0
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score as one unordered window: count/avg/stddev over
    PARTITION BY user_id, then the scalar expression — a single hash
    exchange, zero Python."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id")
    stats = e.select(
        "user_id",
        "event_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
    )
    return (
        stats.filter((F.col("n") >= 2) & (F.col("sd") > 0))
        .select(
            "user_id",
            "event_id",
            F.round((F.col("value") - F.col("mu")) / F.col("sd"), 6).alias("zscore"),
        )
    )


@query(
    "q_cogroup_asof",
    oracle="""
    WITH clicks AS (
        SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts,
               max(event_id)            AS view_event_id,
               arg_max(value, event_id) AS view_value
        FROM events WHERE event_type = 'view'
        GROUP BY user_id, ts
    )
    SELECT c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           c.event_id, v.view_event_id, v.view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def q_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COGROUPED-pandas as-of join (groupBy.cogroup.applyInPandas
    + pd.merge_asof per user) against the same oracle as the JVM
    union+window form (q_asof_join) — pinning that the Arrow cogroup
    API surface reproduces ASOF semantics exactly. The JVM form stays
    the scale path; this is the per-key-pandas-kernel escape hatch
    (operators/pandas_ops.cogroup_merge_asof)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    out = cogroup_merge_asof(
        clicks, views, "user_id", "ts", ["event_id"], ["view_event_id", "view_value"]
    )
    return out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        "event_id",
        "view_event_id",
        "view_value",
    )


@query(
    "q_arrow_norms",
    oracle=__import__(
        "celeborn_spark.operators.arrow_ops", fromlist=["arrow_norms_oracle_sql"]
    ).arrow_norms_oracle_sql(),
)
def q_arrow_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm through the ARROW-NATIVE batch tier
    (mapInArrow: RecordBatch in, RecordBatch out, no pandas
    materialization) — completing the Python-API surface matrix next
    to applyInPandas (q_grouped_zscore differential), cogrouped pandas
    (q_cogroup_asof) and applyInPandasWithState (streaming). The JVM
    expression form (q_embedding_norms) stays the scale default for
    this kernel; the tier exists for numpy/pyarrow-only kernels
    (operators/arrow_ops.arrow_l2_norms)."""
    emb = load_table(spark, sf_dir, "embeddings")
    from celeborn_spark.operators.arrow_ops import arrow_l2_norms

    return arrow_l2_norms(emb, "vec_id", "embedding")


@query(
    "q_udtf_tokens",
    # The UDTF is row-at-a-time Python (the slow tier — kept OFF the
    # corpus hot path by the deterministic md5-order LIMIT-50 cut);
    # its yielded (token, idx) stream is a pure function of the text,
    # so the DuckDB split mirrors it exactly. Tokenization contract:
    # Python str.split() on the single-space corpus == split(' ').
    oracle="""
    WITH sample_d AS (
        SELECT doc_id, text FROM documents
        ORDER BY md5(concat_ws(':', CAST(doc_id AS VARCHAR), 'udtf')),
                 doc_id
        LIMIT 50
    )
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1
                AS BIGINT) AS idx,
           unnest(string_split(text, ' ')) AS token
    FROM sample_d
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+ user-defined TABLE function) in a
    LATERAL join: one input row fans out to a variable-length
    (token, idx) stream — the missing tier of the Python API matrix
    (scalar pandas_udf / applyInPandas / cogroup / mapInPandas /
    mapInArrow / applyInPandasWithState are all registered; UDTF is
    the table-valued one). The corpus never touches Python: a
    deterministic 50-doc heap-selected sample bounds the slow tier."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, idx: bigint")
    class SplitTokens:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.split()):
                    yield tok, i

    spark.udtf.register("celeborn_split_tokens", SplitTokens)
    d = load_table(spark, sf_dir, "documents")
    sample = (
        d.select("doc_id", "text")
        .orderBy(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("udtf"))),
            "doc_id",
        )
        .limit(50)
    )
    sample.createOrReplaceTempView("celeborn_udtf_sample")
    return spark.sql(
        """
        SELECT s.doc_id, t.idx, t.token
        FROM celeborn_udtf_sample s,
             LATERAL celeborn_split_tokens(s.text) t
        """
    ).select("doc_id", "idx", "token")
