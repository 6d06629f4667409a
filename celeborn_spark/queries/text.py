"""Text-analysis surface over the documents table (SURVEY.md §2C):
token stats, quality scoring, language ID, fingerprinting, word count.

Every expression is a JVM-side built-in (operators/textops.py) and each
query has an exact DuckDB oracle — the heuristics were chosen to be
reproducible in ANSI-ish SQL on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import textops as T
from celeborn_spark.registry import query

_SW = "('the','a','and','of','to','in','is','it')"


@query(
    "q_text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' '))                                    AS n_tokens,
           round(list_sum(list_transform(string_split(text, ' '), x -> len(x)))
                 / len(string_split(text, ' ')), 6)                        AS avg_tok_len,
           len(list_filter(string_split(text, ' '), t -> t IN {_SW}))      AS n_stopwords
    FROM documents
    """,
)
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.round(T.avg_token_len("text"), 6).alias("avg_tok_len"),
        T.stopword_count("text").alias("n_stopwords"),
    )


@query(
    "q_text_quality",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n,
               len(list_filter(string_split(text, ' '), t -> t IN {_SW})) AS n_sw
        FROM documents
    )
    SELECT doc_id,
           round(0.5 * least(n / 100.0, 1.0)
               + 0.5 * least((n_sw / n) / 0.1, 1.0), 6) AS quality
    FROM s WHERE n > 0
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.quality_score("text").alias("quality"))


@query(
    "q_text_lang_id",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n,
               len(list_filter(string_split(text, ' '), t -> t IN {_SW})) AS n_sw
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN n > 0 AND n_sw / n >= 0.02 THEN 'en' ELSE 'other' END AS pred_lang,
           lang AS actual_lang
    FROM s
    """,
)
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.lang_id("text").alias("pred_lang"),
        F.col("lang").alias("actual_lang"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(0::BIGINT,
                            list_transform(string_split(text, ' '), x -> len(x)::BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.doc_fingerprint("text").alias("fingerprint"))


@query(
    "q_word_count_topk",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def q_word_count_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical shuffle workload (reference IT:
    tests/flink-it/.../WordCountTest.scala) as explode -> groupBy -> topk."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(T.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@query(
    "q_bpe_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
           len(string_split(text, ' '))                                AS n_ws_tokens
    FROM documents
    """,
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish regex
    (letter runs / digit runs / single punctuation) — the cheap
    pre-tokenizer estimate a data pipeline uses before real BPE."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
        ).alias("n_bpe_tokens"),
        T.token_count("text").alias("n_ws_tokens"),
    )


@query(
    "q_shard_packing",
    oracle="""
    SELECT source, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(floor(CAST(coalesce(
               sum(len(string_split(text, ' '))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) / 2000.0) AS BIGINT) AS shard_id
    FROM documents
    """,
)
def q_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard assignment per source stream
    (operators/packing.py) — the pre-write layout step of a training
    data pipeline."""
    from celeborn_spark.operators.packing import greedy_token_shards

    d = load_table(spark, sf_dir, "documents")
    return greedy_token_shards(d, "source", "doc_id", "text", budget=2000)


@query(
    "q_corpus_clean_pipeline",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n,
               len(list_filter(string_split(text, ' '), t -> t IN {_SW})) AS n_sw
        FROM documents
    ), kept AS (
        SELECT doc_id, text,
               0.5 * least(n / 100.0, 1.0) + 0.5 * least((n_sw / n) / 0.1, 1.0) AS q
        FROM scored
        WHERE n > 0 AND n_sw / n >= 0.02
    ), deduped AS (
        SELECT md5(text) AS h, min(doc_id) AS doc_id
        FROM kept WHERE round(q, 6) >= 0.3
        GROUP BY md5(text)
    )
    SELECT doc_id FROM deduped
    """,
)
def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-corpus cleaning pipeline end to end: language filter ->
    quality filter -> exact dedup keeping the smallest doc id. Three
    composed operators, one exchange (the dedup groupBy) — filters are
    map-side and fused by codegen."""
    from celeborn_spark.operators.dedup import exact_dedup

    d = load_table(spark, sf_dir, "documents")
    kept = d.filter(
        (T.lang_id("text") == "en") & (T.quality_score("text") >= 0.3)
    )
    return exact_dedup(kept, "text", "doc_id").select("doc_id")


@query(
    "q_text_stats_by_lang",
    oracle=f"""
    WITH s AS (
        SELECT lang, source,
               len(string_split(text, ' ')) AS n,
               len(list_filter(string_split(text, ' '), t -> t IN {_SW})) AS n_sw
        FROM documents
    )
    SELECT lang, source,
           count(*)                          AS n_docs,
           round(avg(n), 4)                  AS avg_tokens,
           round(avg(n_sw / n), 6)           AS avg_sw_ratio
    FROM s WHERE n > 0
    GROUP BY lang, source
    """,
)
def q_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n = T.token_count("text")
    sw = T.stopword_count("text")
    return (
        d.select("lang", "source", n.alias("n"), sw.alias("n_sw"))
        .filter(F.col("n") > 0)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n"), 4).alias("avg_tokens"),
            F.round(F.avg(F.col("n_sw") / F.col("n")), 6).alias("avg_sw_ratio"),
        )
    )
