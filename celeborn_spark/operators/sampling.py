"""Sampling operators for corpus curation: deterministic hash-based
uniform and stratified sampling, plus the rand()-based statistical
forms.

Hash-based sampling is the 100 TB workhorse: membership depends only on
the row's key (md5 of key+salt compared against a hex threshold), so it
is reproducible across runs, engines, and re-partitioning — unlike
rand()-based sampling, which is seed + partition-layout dependent. md5
rather than xxhash64 because both Spark and DuckDB produce the identical
hex digest, which makes every sampler below oracle-checkable bit-for-bit
(same reason operators/dedup.py uses md5 for content identity). The
rand()-based forms are kept for statistical sampling where
key-correlation must be avoided; their accuracy is tolerance-tested in
tests/test_sampling.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Compare the first 8 hex chars of the digest (32 bits of uniformity —
# plenty for sampling) against floor(fraction * 16^8) rendered as a
# fixed-width hex literal; fixed width makes the string compare the
# numeric compare.
_HEX_DIGITS = 8
_SPACE = 16**_HEX_DIGITS


def fraction_threshold_hex(fraction: float) -> str:
    """floor(fraction * 16^8) as an 8-char lowercase hex literal."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _SPACE), _SPACE - 1), f"0{_HEX_DIGITS}x")


def hash_bucket(key: Column | str, salt: int = 0) -> Column:
    """First 8 hex chars of md5(key ':' salt) — the row's deterministic
    position in [0, 1) as a hex string, identical in any engine."""
    key_c = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat_ws(":", key_c.cast("string"), F.lit(str(salt)))),
        1,
        _HEX_DIGITS,
    )


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: int = 0) -> DataFrame:
    """Deterministic sample: keep rows whose hash bucket falls in the
    lowest `fraction` of the space. Reproducible anywhere."""
    return df.filter(hash_bucket(key_col, salt) < fraction_threshold_hex(fraction))


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum gets its own
    keep-fraction (e.g. downsample dominant languages, keep all of rare
    ones). One codegen'd filter, zero shuffle, reproducible — the
    corpus-rebalancing primitive for LLM data mixes."""
    threshold = F.lit(fraction_threshold_hex(default_fraction))
    for value, frac in fractions.items():
        threshold = (
            F.when(F.col(stratum_col) == value, F.lit(fraction_threshold_hex(frac)))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(key_col, salt) < threshold)


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (sequential
    Poisson / Ohlsson priority sampling): each row gets priority
    weight / u, u the row's md5 uniform variate, and the k highest
    priorities win — heavier rows win proportionally more often.

    Chosen over the Efraimidis-Spirakis u^(1/w) form deliberately:
    division is IEEE-exact and bit-identical across engines, while
    pow() may differ in the last ulp between libm and the JVM —
    priorities here are oracle-comparable WITHOUT rounding. One
    codegen'd map + one TakeOrderedAndProject; no shuffle of the
    losers."""
    from celeborn_spark.operators.curriculum import u01

    pri = (F.col(weight_col) / u01(key_col, salt)).alias("priority")
    return (
        df.select(F.col(key_col), F.col(weight_col), pri)
        .orderBy(F.col("priority").desc(), F.col(key_col))
        .limit(k)
    )


def per_group_sample(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: int = 0
) -> DataFrame:
    """Exactly-k-per-group deterministic random sample: rank rows
    within each group by their md5 variate and keep the k smallest —
    the balanced-class sampler (equal representation per lang/source/
    label regardless of group skew), unlike fraction-based sampling
    (k proportional to group size) or first-k-by-id (biased to early
    keys). One group-keyed window; Spark's WindowGroupLimit prunes
    past rank k before the full per-group sort."""
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(hash_bucket(key_col, salt), key_col)
    return (
        df.select(group_col, key_col, F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") <= k)
        .select(group_col, key_col)
    )


def epoch_shuffle(
    df: DataFrame, id_col: str, n_shards: int, epoch: int = 0
) -> DataFrame:
    """Deterministic per-epoch global shuffle: assign every row a
    pseudo-random (shard_id, pos) from md5(id ':' epoch) — the
    reproducible permutation a training run re-derives each epoch
    (change `epoch`, get an uncorrelated order; same epoch, identical
    layout on any engine/partitioning).

    Scale shape: one exchange (hash by shard_id) + per-shard window
    sort on the 8-hex sort key — no global sort; shards map 1:1 to
    output files via partitionBy(shard_id) at the sink. Oracle-portable
    bit-for-bit (the md5 idiom above)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql import Window as W

    k = hash_bucket(id_col, salt=epoch)
    keyed = df.select(
        F.col(id_col),
        k.alias("_k"),
        (F.conv(k, 16, 10).cast("long") % n_shards).alias("shard_id"),
    )
    w = W.partitionBy("shard_id").orderBy("_k", id_col)
    return keyed.select(
        id_col,
        "shard_id",
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )


def epoch_shuffle_oracle_sql(
    table: str, id_sql: str, n_shards: int, epoch: int = 0
) -> str:
    """DuckDB mirror of epoch_shuffle (md5 digests are identical, so
    shard assignment and within-shard order replicate exactly)."""
    return f"""
    WITH keyed AS (
        SELECT {id_sql},
               substr(md5(concat_ws(':', CAST({id_sql} AS VARCHAR), '{epoch}')),
                      1, {_HEX_DIGITS}) AS k
        FROM {table}
    )
    SELECT {id_sql},
           CAST(CAST(concat('0x', k) AS UBIGINT) % {n_shards} AS BIGINT)
               AS shard_id,
           row_number() OVER (
               PARTITION BY CAST(concat('0x', k) AS UBIGINT) % {n_shards}
               ORDER BY k, {id_sql}) - 1 AS pos
    FROM keyed
    """


def uniform_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Statistical (rand-based) sample — NOT reproducible across
    partitionings; prefer hash_sample for pipeline determinism."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Statistical per-stratum sampling (df.sampleBy); see
    stratified_hash_sample for the deterministic form."""
    return df.sampleBy(stratum_col, fractions=fractions, seed=seed)


def kfold_assign(
    df: DataFrame, key_col: str, k: int, fold_col: str = "fold", salt: int = 0
) -> DataFrame:
    """Deterministic k-fold assignment: fold = the row's md5-uniform
    variate scaled to [0, k) and floored — reproducible across runs,
    engines, and partitionings (no randomness, no shuffle; one
    codegen'd expression). Stratification is free: folds are uniform
    WITHIN any subpopulation because the hash ignores every column but
    the key. Cross-validation splits for 100 TB: each fold is a
    filter, so 'train on k-1 folds' is a pushdown predicate, not a
    materialized copy."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    u = F.conv(hash_bucket(key_col, salt), 16, 10).cast("double") / F.lit(float(_SPACE))
    return df.withColumn(fold_col, F.floor(u * k).cast("int"))


def kfold_oracle_expr(key_sql: str, k: int, salt: int = 0) -> str:
    """DuckDB expression mirroring kfold_assign's fold bit for bit."""
    return (
        f"CAST(floor(CAST(concat('0x', substr(md5(concat_ws(':', {key_sql}, "
        f"'{salt}')), 1, {_HEX_DIGITS})) AS UBIGINT) / {float(_SPACE)} * {k}) AS INTEGER)"
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    cutoff: str,
    embargo_hours: int = 0,
) -> DataFrame:
    """Add a ``split`` column: 'train' for rows strictly before
    ``cutoff``, 'test' for rows at/after cutoff + ``embargo_hours``,
    NULL (dropped) for rows inside the embargo gap. The time-based
    train/eval split for forecasting/backtest pipelines — random
    splits leak the future into training, and rows adjacent to the
    cutoff leak through autocorrelation, which the embargo removes
    (the purged/embargoed split of De Prado's backtesting protocol).

    Zero-shuffle: one codegen'd map predicate; each split is a
    pushdown-able filter, not a materialized copy."""
    c = F.to_timestamp(F.lit(cutoff))
    emb = c + F.make_interval(hours=F.lit(embargo_hours))
    return df.withColumn(
        "split",
        F.when(F.col(ts_col) < c, F.lit("train"))
        .when(F.col(ts_col) >= emb, F.lit("test"))
        .otherwise(F.lit(None).cast("string")),
    ).filter(F.col("split").isNotNull())


def rendezvous_assign(
    df: DataFrame, key_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Append the key's rendezvous (highest-random-weight) shard:
    shard = argmax over s in [0, n_shards) of md5(key ':' s) — the
    consistent-assignment primitive (stable worker/slot routing,
    cache-affinity sharding; the reference's slot-allocation concern
    re-expressed as a pure function). Unlike mod-hashing, growing the
    ring from n to n+1 relocates only the keys whose NEW shard wins
    the argmax — ~1/(n+1) of them — so 100 TB of routed state is not
    reshuffled by one topology change (pinned by
    tests/test_sampling.py).

    Zero shuffle: the argmax is a codegen'd array expression over
    n_shards md5 calls per row — built as ONE parsed SQL string (the
    CLAUDE.md lesson: composing wide Column trees costs py4j
    round-trips per node). Portable md5 makes it oracle-exact."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    digests = ", ".join(
        f"named_struct('h', md5(concat_ws(':', CAST({key_col} AS STRING), '{s}')),"
        f" 's', {s})"
        for s in range(n_shards)
    )
    expr = (
        f"array_max(array({digests})).s"
    )
    return df.withColumn(out_col, F.expr(expr).cast("int"))


def rendezvous_oracle_expr(key_sql: str, n_shards: int) -> str:
    """DuckDB expression mirroring `rendezvous_assign` — the same
    md5-per-shard argmax, expressed as a greatest-struct compare via
    list_max over (hash, shard) rows."""
    rows = ", ".join(
        f"{{'h': md5(concat_ws(':', CAST({key_sql} AS VARCHAR), '{s}')), 's': {s}}}"
        for s in range(n_shards)
    )
    return f"CAST(list_max([{rows}]).s AS INT)"


def assign_dense_ids(
    df: DataFrame, key_col: str, n_buckets: int = 64, out_col: str = "row_id"
) -> DataFrame:
    """Assign contiguous ids 0..n-1 to UNIQUE keys without a global
    sort — the scalable zipWithIndex (stable row ids for training
    shards, foreign-key surrogate generation). Order contract: ids
    follow (md5-bucket, key) order — deterministic and portable, not a
    value sort (use write_sorted_buckets for that).

    The distributed prefix-sum pattern: (1) bucket each key by its md5
    hash (portable, oracle-exact); (2) per-bucket counts -> bucket
    offsets via a running sum over the n_buckets-row count relation (a
    window over a CARDINALITY-BOUNDED histogram, never rows); (3) per
    bucket, rank keys locally (bucket-partitioned window) and add the
    broadcast offset. One exchange for the counts, one for the
    bucket-keyed rank."""
    from celeborn_spark.operators.curriculum import u01  # noqa: F401  (doc xref)

    b = F.pmod(F.conv(hash_bucket(key_col), 16, 10).cast("long"), F.lit(n_buckets))
    keyed = df.select(F.col(key_col)).distinct().withColumn("_b", b)
    counts = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    from pyspark.sql import Window as W

    off = F.coalesce(
        F.sum("_n").over(W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    offsets = counts.withColumn("_off", off).select("_b", "_off")
    rn = F.row_number().over(W.partitionBy("_b").orderBy(key_col))
    return (
        keyed.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + rn - 1).cast("long"))
        .select(key_col, out_col)
    )


def dense_ids_oracle_sql(table: str, key_sql: str, n_buckets: int = 64) -> str:
    """DuckDB mirror of `assign_dense_ids`: identical md5 buckets and
    (bucket, key) ordering via one global row_number (the semantics the
    distributed two-stage form must reproduce)."""
    return f"""
    WITH keys AS (SELECT DISTINCT {key_sql} AS k FROM {table}),
    kb AS (
        SELECT k,
               CAST(concat('0x', substr(md5(concat_ws(':', CAST(k AS VARCHAR),
                                                      '0')), 1, 8)) AS UBIGINT)
                   % {n_buckets} AS b
        FROM keys
    )
    SELECT k AS key, CAST(row_number() OVER (ORDER BY b, k) - 1 AS BIGINT)
               AS row_id
    FROM kb
    """


def systematic_sample(
    df: DataFrame, key_col: str, n_buckets: int = 200, salt: int = 0
) -> DataFrame:
    """Fixed-SIZE systematic sample: partition the md5 hash space
    into ``n_buckets`` equal-width value ranges and take the
    hash-minimal key from each — the positional-stride analogue of
    classic systematic sampling over the deterministic hash order.
    Output one row per non-empty bucket: (bucket, key).

    Fixed SIZE by construction (<= n_buckets rows regardless of N —
    the r10 fixed-rate lesson: a %-rate sample grows with the corpus
    and turns downstream self-joins quadratic). Value-range
    bucketing, NOT ntile: no global sort, no row-sized window — the
    bucket id is pure per-row hash arithmetic.

    Scale shape (100 TB): one map stage + ONE n_buckets-group
    aggregate (map-side combined min per bucket)."""
    bucketed = df.select(
        F.col(key_col).alias("key"),
        hash_bucket(key_col, salt).alias("h"),
        # integer DIV, not double-divide-then-cast: Spark's double->
        # long cast truncates while DuckDB's rounds — DIV // sidesteps
        # the disagreement entirely.
        (
            (F.conv(hash_bucket(key_col, salt), 16, 10).cast("long") * n_buckets)
            .cast("long")
        ).alias("scaled"),
    ).select(
        "key",
        "h",
        F.expr(f"CAST(scaled DIV {_SPACE} AS BIGINT)").alias("bucket"),
    )
    picks = bucketed.groupBy("bucket").agg(F.min("h").alias("h"))
    return (
        picks.join(bucketed, ["bucket", "h"])
        .groupBy("bucket")  # md5 collisions: deterministic min-key tiebreak
        .agg(F.min("key").alias("key"))
        .orderBy("bucket")
    )


def systematic_sample_oracle_sql(
    units_sql: str, n_buckets: int = 200, salt: int = 0
) -> str:
    """DuckDB mirror of `systematic_sample`. ``units_sql`` yields one
    row per unit with a ``key`` column."""
    h = f"substr(md5(concat_ws(':', CAST(key AS VARCHAR), '{salt}')), 1, 8)"
    return f"""
    WITH sys_units AS ({units_sql}),
    sys_b AS (
        SELECT key, {h} AS h,
               CAST(CAST(concat('0x', {h}) AS UBIGINT) * {n_buckets}
                    // {_SPACE} AS BIGINT) AS bucket
        FROM sys_units
    ),
    sys_min AS (SELECT bucket, min(h) AS h FROM sys_b GROUP BY 1)
    SELECT b.bucket, min(b.key) AS key
    FROM sys_b b JOIN sys_min m ON m.bucket = b.bucket AND m.h = b.h
    GROUP BY b.bucket
    ORDER BY b.bucket
    """
