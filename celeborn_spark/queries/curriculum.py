"""Curriculum / data-mixture surface over the documents table
(SURVEY.md §2C): exact quantile binning of a quality score and
deterministic sampling to a target language mixture — the step between
document scoring (queries/text.py) and shard packing
(operators/packing.py) in an LLM data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import curriculum as C
from celeborn_spark.operators import textops as T
from celeborn_spark.queries.text import _SW
from celeborn_spark.registry import query

N_BINS = 10

MIX_TARGETS = {"en": 0.3, "de": 0.1, "es": 0.1, "fr": 0.2, "zh": 0.3}
MIX_BUDGET = 0.8
MIX_SALT = 7

_QUALITY_SQL = f"""
    SELECT doc_id, lang, n_chars,
           round(0.5 * least(n / 100.0, 1.0)
               + 0.5 * least((n_sw / n) / 0.1, 1.0), 6) AS q
    FROM (
        SELECT doc_id, lang, n_chars,
               len(string_split(text, ' ')) AS n,
               len(list_filter(string_split(text, ' '), t -> t IN {_SW})) AS n_sw
        FROM documents
    ) WHERE n > 0
"""


@query(
    "q_quality_curriculum",
    oracle=f"""
    WITH s AS ({_QUALITY_SQL}),
    hist AS (SELECT q, count(*) AS cnt FROM s GROUP BY q),
    edges AS (
        SELECT q, cnt,
               sum(cnt) OVER (ORDER BY q) - cnt AS cum_before,
               sum(cnt) OVER ()                 AS total
        FROM hist
    ),
    b AS (
        SELECT q,
               least({N_BINS - 1},
                     CAST(floor({N_BINS} * cum_before / total) AS BIGINT)) AS bin
        FROM edges
    )
    SELECT b.bin                  AS bin,
           count(*)               AS n_docs,
           CAST(sum(s.n_chars) AS BIGINT) AS sum_chars,
           round(min(s.q), 6)     AS min_q,
           round(max(s.q), 6)     AS max_q
    FROM s JOIN b ON s.q = b.q
    GROUP BY b.bin
    """,
)
def q_quality_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile curriculum over the quality score: exact quantile bins via
    the value-histogram method (operators/curriculum.py — no global row
    sort, unlike ntile), then per-bin corpus stats."""
    d = load_table(spark, sf_dir, "documents")
    scored = (
        d.select("doc_id", "n_chars", T.quality_score("text").alias("q"))
        .filter(F.col("q").isNotNull())
        # quantile_bins consumes the scored relation twice (histogram +
        # join-back); materialize the slim (id, chars, q) projection so
        # the tokenization-heavy scoring runs once, not per branch
        .localCheckpoint()
    )
    # quantize_dp=6 is idempotent on the already-6dp-rounded score, so
    # bins are bit-identical to the unquantized form (oracle unchanged)
    # while the histogram cardinality is contract-bounded at <= 10^6+1
    # for ANY feed — the continuous-score hardening (VERDICT r5 item 3).
    binned = C.quantile_bins(scored, "q", n_bins=N_BINS, quantize_dp=6)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.round(F.min("q"), 6).alias("min_q"),
        F.round(F.max("q"), 6).alias("max_q"),
    )


def _mix_rate_sql() -> str:
    target = "CAST(NULL AS DOUBLE)"
    for value, share in MIX_TARGETS.items():
        target = f"CASE WHEN lang = '{value}' THEN {share} ELSE {target} END"
    return target


@query(
    "q_mixture_sample",
    oracle=f"""
    WITH totals AS (
        SELECT lang, sum(n_chars) AS stratum_w FROM documents GROUP BY lang
    ),
    grand AS (SELECT sum(stratum_w) AS grand_w FROM totals),
    rates AS (
        -- targeted strata only, BEFORE least(): least(1.0, NULL) = 1.0
        -- in both engines (least skips NULLs)
        SELECT lang, least(1.0, t * {MIX_BUDGET} * grand_w / stratum_w) AS rate
        FROM (SELECT lang, stratum_w, {_mix_rate_sql()} AS t FROM totals)
        CROSS JOIN grand
        WHERE t IS NOT NULL
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {C.u01_oracle_expr("CAST(d.doc_id AS VARCHAR)", MIX_SALT)} < r.rate
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebalance the corpus to a target language mixture inside an 80%
    token budget: per-stratum keep-rates derived in-engine from the
    aggregate weights, membership by portable md5 variate
    (operators/curriculum.py mixture_sample)."""
    d = load_table(spark, sf_dir, "documents")
    return C.mixture_sample(
        d, "lang", "doc_id", "n_chars", MIX_TARGETS, MIX_BUDGET, salt=MIX_SALT
    ).select("doc_id", "lang", "n_chars")


@query(
    "q_pipeline_full",
    # the CorpusPipeline facade end to end in one oracle: quality
    # filter -> exact dedup -> mixture sample (token weights, md5
    # variate, salt 0) -> per-lang shard packing. Every stage reuses an
    # already-verified formula (q_text_quality, q_dedup_exact,
    # q_mixture_sample, q_shard_packing).
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS n,
               len(list_filter(string_split(text, ' '), t -> t IN {_SW})) AS n_sw
        FROM documents
    ),
    kept AS (
        SELECT doc_id, lang, text, n FROM scored
        WHERE n > 0
          AND round(0.5 * least(n / 100.0, 1.0)
                  + 0.5 * least((n_sw / n) / 0.1, 1.0), 6) >= 0.3
    ),
    dedup AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
    dk AS (SELECT k.* FROM kept k JOIN dedup d ON k.doc_id = d.doc_id),
    totals AS (SELECT lang, sum(n) AS stratum_w FROM dk GROUP BY lang),
    grand AS (SELECT sum(stratum_w) AS grand_w FROM totals),
    rates AS (
        SELECT lang, least(1.0, t * {MIX_BUDGET} * grand_w / stratum_w) AS rate
        FROM (SELECT lang, stratum_w, {_mix_rate_sql()} AS t FROM totals)
        CROSS JOIN grand
        WHERE t IS NOT NULL
    ),
    sampled AS (
        SELECT dk.* FROM dk JOIN rates r ON dk.lang = r.lang
        WHERE {C.u01_oracle_expr("CAST(dk.doc_id AS VARCHAR)", 0)} < r.rate
    )
    SELECT lang, doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(floor(CAST(coalesce(
               sum(n) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) / 512.0) AS BIGINT) AS shard_id
    FROM sampled
    """,
)
def q_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CorpusPipeline facade, driver-verified end to end: quality
    filter -> exact dedup -> mixture rebalance -> token-budget shard
    layout (celeborn_spark/pipeline.py)."""
    from celeborn_spark.pipeline import CorpusPipeline

    d = load_table(spark, sf_dir, "documents")
    p = (
        CorpusPipeline(d)
        .filter_quality(0.3)
        .dedup_exact()
        .sample_mixture(MIX_TARGETS, MIX_BUDGET)
    )
    return p.pack_shards(budget=512, stream_col="lang")


@query(
    "q_per_source_cap",
    oracle="""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= 10
    """,
)
def q_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain contribution cap (keep at most 10 docs per source) —
    the standard crawl-cleaning guard against a single domain
    dominating the mix. One source-keyed window; Spark's
    WindowGroupLimit prunes past the cap before the full sort."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "source")
    )
