"""Sampling surface (SURVEY.md §2C extras): deterministic hash-based
uniform and stratified sampling over the corpus tables.

All three queries are exact-oracle-checked: membership is a pure
function of md5(key), which DuckDB reproduces bit-for-bit (the same
portability trick operators/dedup.py uses for content identity). The
rand()-based statistical samplers keep tolerance tests in
tests/test_sampling.py instead — seeded PRNG streams are engine- and
partition-layout-specific, so they can never hash-match an oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.sampling import hash_sample, kfold_oracle_expr, stratified_hash_sample
from celeborn_spark.operators import sampling as S_ops
from celeborn_spark.registry import query

from celeborn_spark.operators.curriculum import u01_oracle_expr

# md5-uniform variate of doc_id at salt 3 (matches weighted_sample_topk)
_U01_DOC = u01_oracle_expr("CAST(doc_id AS VARCHAR)", 3)


@query(
    "q_hash_sample",
    oracle="""
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8) < '19999999'
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample of documents by doc id — reproducible
    across runs/engines/partitionings; fraction accuracy is pinned in
    tests/test_sampling.py."""
    d = load_table(spark, sf_dir, "documents")
    return hash_sample(d, "doc_id", 0.1).select("doc_id", "lang", "source")


@query(
    "q_uniform_sample",
    oracle="""
    SELECT event_id, event_type FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR) || ':7'), 1, 8) < '0ccccccc'
    """,
)
def q_uniform_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% uniform sample of the event stream (salt 7 —
    independent of any other sample drawn from the same keys)."""
    e = load_table(spark, sf_dir, "events")
    return hash_sample(e, "event_id", 0.05, salt=7).select("event_id", "event_type")


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 8)
          < CASE lang WHEN 'en' THEN '19999999'
                      WHEN 'zh' THEN '80000000'
                      ELSE 'ffffffff' END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing: keep 10% of dominant English, 50% of Chinese,
    all of the remaining languages — one deterministic codegen'd filter,
    zero shuffle."""
    d = load_table(spark, sf_dir, "documents")
    sampled = stratified_hash_sample(
        d, "lang", "doc_id", {"en": 0.1, "zh": 0.5}, default_fraction=1.0
    )
    return sampled.select("doc_id", "lang")


@query(
    "q_weighted_sample",
    oracle=f"""
    SELECT doc_id, n_chars, priority FROM (
        SELECT doc_id, n_chars,
               n_chars / ({_U01_DOC}) AS priority
        FROM documents
    )
    ORDER BY priority DESC, doc_id
    LIMIT 100
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted sample of 100 docs by sequential-Poisson
    priority (weight / md5-uniform — division is bit-identical across
    engines, unlike pow; operators/sampling.py weighted_sample_topk)."""
    from celeborn_spark.operators.sampling import weighted_sample_topk

    d = load_table(spark, sf_dir, "documents")
    return weighted_sample_topk(d, "doc_id", "n_chars", k=100, salt=3)


@query(
    "q_epoch_shuffle",
    oracle=S_ops.epoch_shuffle_oracle_sql(
        "documents", "doc_id", n_shards=16, epoch=5
    ),
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-5 global shuffle of the corpus into 16
    shards: every doc gets a pseudo-random (shard_id, pos) from
    md5(doc_id ':' epoch) — the reproducible per-epoch permutation of a
    training run (same epoch => identical layout on any engine; next
    epoch => uncorrelated order). One exchange + per-shard window sort;
    no global sort (operators/sampling.py epoch_shuffle)."""
    from celeborn_spark.operators.sampling import epoch_shuffle

    d = load_table(spark, sf_dir, "documents")
    return epoch_shuffle(d, "doc_id", n_shards=16, epoch=5)


@query(
    "q_per_group_sample",
    oracle="""
    SELECT lang, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY substr(md5(concat_ws(':', CAST(doc_id AS VARCHAR),
                                                 '11')), 1, 8),
                            doc_id) AS rn
        FROM documents
    ) WHERE rn <= 20
    """,
)
def q_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-language sample: exactly 20 docs per lang chosen by
    md5 variate — equal class representation regardless of language
    skew (vs fraction sampling, which keeps groups proportional, and
    first-k-by-id, which biases to early keys). WindowGroupLimit prunes
    past rank 20 before the per-group sort
    (operators/sampling.per_group_sample)."""
    from celeborn_spark.operators.sampling import per_group_sample

    d = load_table(spark, sf_dir, "documents")
    return per_group_sample(d, "lang", "doc_id", k=20, salt=11)


K_FOLDS = 5


@query(
    "q_kfold_split",
    # per-(stratum, fold) sizes — the shape a CV harness audits; the
    # fold variate is the portable md5 u01, so DuckDB reproduces every
    # assignment bit for bit
    oracle=f"""
    SELECT lang,
           {kfold_oracle_expr("CAST(doc_id AS VARCHAR)", K_FOLDS, salt=11)} AS fold,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY lang, fold
    """,
)
def q_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-fold cross-validation split audited per
    language: fold sizes and char mass per (lang, fold). The
    assignment is a zero-shuffle hash expression
    (operators/sampling.kfold_assign); at 100 TB each fold is a
    predicate, never a copy."""
    from celeborn_spark.operators.sampling import kfold_assign

    d = load_table(spark, sf_dir, "documents")
    return (
        kfold_assign(d, "doc_id", K_FOLDS, salt=11)
        .groupBy("lang", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


@query(
    "q_temporal_split",
    oracle="""
    SELECT split, event_type, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT event_type,
               CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00' THEN 'train'
                    WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
                               + INTERVAL 24 HOUR THEN 'test'
               END AS split
        FROM events
    ) WHERE split IS NOT NULL
    GROUP BY split, event_type
    """,
)
def q_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embargoed time-based train/test split of the event stream
    (cutoff Jan 20, 24h embargo): the future never leaks into
    training, and the embargo gap removes cutoff-adjacent
    autocorrelation leakage — zero-shuffle map predicates, audited per
    split and type (operators/sampling.temporal_split)."""
    from celeborn_spark.operators.sampling import temporal_split

    ev = load_table(spark, sf_dir, "events")
    out = temporal_split(ev, "ts", "2024-01-20 00:00:00", embargo_hours=24)
    return out.groupBy("split", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


@query(
    "q_rendezvous_routing",
    oracle=f"""
    WITH r AS (
        SELECT l_orderkey,
               {S_ops.rendezvous_oracle_expr("l_orderkey", 8)} AS shard
        FROM lineitem
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_keys
    FROM r GROUP BY shard
    """,
)
def q_rendezvous_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) shard routing of order keys
    to 8 shards, summarized per shard — the consistent-assignment
    primitive (stable slot routing; growing the ring relocates only
    ~1/(n+1) of keys, pinned by pytest). Zero-shuffle codegen'd md5
    argmax per row; md5 makes the oracle bit-exact
    (operators/sampling.rendezvous_assign)."""
    from celeborn_spark.operators.dedup import _spread

    # 8 md5 digests per row are the stage cost — spread the
    # single-split scan across cores before the map (conditional
    # no-op on wide scans; the operator itself stays zero-shuffle)
    li = _spread(load_table(spark, sf_dir, "lineitem"), "l_orderkey")
    routed = S_ops.rendezvous_assign(li, "l_orderkey", 8)
    return routed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct("l_orderkey").cast("long").alias("n_keys"),
    )


@query(
    "q_dense_ids",
    oracle=S_ops.dense_ids_oracle_sql("lineitem", "l_partkey", n_buckets=64),
)
def q_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous ids 0..n-1 over distinct part keys WITHOUT a global
    sort: md5-bucket each key, prefix-sum the 64-row bucket-count
    histogram into offsets, rank locally per bucket and add the
    broadcast offset — the scalable zipWithIndex. The oracle's single
    global row_number pins the exact (bucket, key) order the two-stage
    form must reproduce (operators/sampling.assign_dense_ids)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = S_ops.assign_dense_ids(li, "l_partkey", n_buckets=64)
    return out.select(F.col("l_partkey").alias("key"), "row_id")


@query(
    "q_systematic_sample",
    oracle=S_ops.systematic_sample_oracle_sql(
        "SELECT doc_id AS key FROM documents", n_buckets=50
    ),
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size systematic document sample: 50 equal-width md5
    value-range buckets, hash-minimal doc per bucket — positional-
    stride coverage of the corpus with NO global sort and no
    row-sized window (the bucket id is per-row hash arithmetic),
    bounded at 50 rows at any corpus size (the r10 fixed-rate
    lesson) (operators/sampling.systematic_sample)."""
    docs = load_table(spark, sf_dir, "documents")
    return S_ops.systematic_sample(
        docs.select(F.col("doc_id")), "doc_id", n_buckets=50
    )
