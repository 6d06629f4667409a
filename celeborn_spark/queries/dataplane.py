"""Data-plane parity operators (SURVEY.md §2A, phase 2): explicit
exchange, exactly-once dedup, salted (skew-proof) aggregation, sorted
scans. Results equal their un-tuned forms — the oracle proves the
physical strategy changes nothing semantically, which is precisely the
reference's contract (Celeborn reproduces vanilla Spark's results,
tests/spark-it/.../SparkTestBase.scala:111-150).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.registry import query


@query(
    "q_exchange_repartition",
    oracle="""
    SELECT l_suppkey, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY l_suppkey
    """,
)
def q_exchange_repartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit hash exchange (df.repartition on the key) before the
    agg — the engine surface of the reference's partition-by-key push
    (HashBasedShuffleWriter.java:162-276). AQE may still coalesce tiny
    output partitions, the analogue of PushMergedData coalescing."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.repartition(32, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_exactly_once_dedup",
    oracle="""
    SELECT event_type, count(*) AS n FROM (
        SELECT DISTINCT * FROM (
            SELECT * FROM events UNION ALL SELECT * FROM events
        )
    ) GROUP BY event_type
    """,
)
def q_exactly_once_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay a source twice, deduplicate, count — the relational form
    of the reference's exactly-once batch dedup (drop replayed batchIds
    and losing attempts, CelebornInputStream.java:864-904)."""
    e = load_table(spark, sf_dir, "events")
    replayed = e.unionByName(e)  # simulated at-least-once delivery
    return (
        replayed.dropDuplicates()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for extreme key skew: stage 1
    groups on (key, salt16) spreading one hot key over 16 reducers,
    stage 2 merges partials. The manual form of the reference's skew
    partition split (CelebornPartitionUtil.java:60-130) for when AQE's
    skew handling isn't enough. Oracle = plain groupBy: salting must
    not change results."""
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), F.round(F.sum("pv"), 2).alias("total")
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
        SELECT c_custkey, c_name, c_nationkey,
               round(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 0
    ),
    kept AS (
        SELECT * FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
    )
    SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal, c_mktsegment
    FROM (SELECT * FROM kept UNION ALL SELECT * FROM updates)
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation (operators/merge.py): +100 balance update
    for every 10th customer upserted over the dimension."""
    from celeborn_spark.operators.merge import merge_upsert

    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 100, 2)
    )
    merged = merge_upsert(c, updates, "c_custkey")
    return merged.select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment"
    )


@query(
    "q_scd2_dimension",
    oracle="""
    WITH changes AS (
        SELECT c_custkey, round(c_acctbal + 50, 2) AS c_acctbal,
               DATE '2024-06-01' AS eff
        FROM customer WHERE c_custkey % 10 = 0
    ),
    closed AS (
        SELECT c.c_custkey, round(c.c_acctbal, 2) AS c_acctbal,
               DATE '2024-01-01' AS eff, ch.eff AS end_date
        FROM customer c LEFT JOIN changes ch USING (c_custkey)
    ),
    versions AS (
        SELECT * FROM closed
        UNION ALL
        SELECT c_custkey, c_acctbal, eff, NULL AS end_date FROM changes
    )
    SELECT c_custkey, c_acctbal,
           CAST(eff AS VARCHAR)      AS eff,
           CAST(end_date AS VARCHAR) AS end_date
    FROM versions
    """,
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 over the customer dimension (operators/merge.py
    scd2_close_and_append): a +50-balance change batch closes the open
    version for every 10th customer and appends the new open version.
    The lake-format sink for this surface is capability-dispatched
    (operators/merge.py merge_into_path: transactional MERGE INTO with
    jars, relational emulation without)."""
    from celeborn_spark.operators.merge import scd2_close_and_append

    c = load_table(spark, sf_dir, "customer")
    current = (
        c.select("c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"))
        .withColumn("eff", F.lit("2024-01-01").cast("date"))
        .withColumn("end_date", F.lit(None).cast("date"))
    )
    changes = (
        c.filter(F.col("c_custkey") % 10 == 0)
        .select("c_custkey", F.round(F.col("c_acctbal") + 50, 2).alias("c_acctbal"))
        .withColumn("eff", F.lit("2024-06-01").cast("date"))
    )
    out = scd2_close_and_append(current, changes, "c_custkey", "eff", "end_date")
    return out.select(
        "c_custkey",
        "c_acctbal",
        F.col("eff").cast("string").alias("eff"),
        F.col("end_date").cast("string").alias("end_date"),
    )


@query(
    "q_sorted_range_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-02-01'
    """,
)
def q_sorted_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate over a sort-friendly column. With the catalog's
    parquet layout the filter is answered by row-group min/max pruning —
    the declarative analogue of the reference's sort-on-first-range-read
    + per-range index (PartitionFilesSorter.java:208-376) and mapId
    bitmap skipping (CelebornInputStream.skipLocation:364-380)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.sortWithinPartitions("l_shipdate")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "q_snapshot_diff",
    # old snapshot = customer; new snapshot derived deterministically:
    # every 97th key dropped, every 89th key's balance bumped, every
    # 101st key re-added under key+10M. Content identity = md5 over
    # chr(1)-joined, chr(2)-null-tagged DECIMAL-normalized columns —
    # identical bytes in both engines, so statuses hash-match exactly.
    oracle="""
    WITH oldt AS (
        SELECT c_custkey,
               md5(concat_ws(chr(1), c_name,
                             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR),
                             c_mktsegment)) AS h
        FROM customer
    ),
    newt AS (
        SELECT c_custkey,
               md5(concat_ws(chr(1), c_name,
                             CAST(CAST(
                                 CASE WHEN c_custkey % 89 = 0
                                      THEN c_acctbal + 100 ELSE c_acctbal END
                                 AS DECIMAL(12,2)) AS VARCHAR),
                             c_mktsegment)) AS h
        FROM customer WHERE c_custkey % 97 != 0
        UNION ALL
        SELECT c_custkey + 10000000,
               md5(concat_ws(chr(1), c_name,
                             CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR),
                             c_mktsegment)) AS h
        FROM customer WHERE c_custkey % 101 = 0
    )
    SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.h IS NULL THEN 'added'
                WHEN n.h IS NULL THEN 'removed'
                WHEN o.h != n.h THEN 'changed' END AS status
    FROM oldt o FULL OUTER JOIN newt n USING (c_custkey)
    WHERE (CASE WHEN o.h IS NULL THEN 'added'
                WHEN n.h IS NULL THEN 'removed'
                WHEN o.h != n.h THEN 'changed' END) IS NOT NULL
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/merge.py snapshot_diff): which keys were
    added / removed / changed between two table versions — the lake
    audit primitive. Digests are computed map-side so only (key, md5)
    shuffles; unchanged keys never materialize. Balance normalized to
    DECIMAL(12,2) before stringifying (double->string formatting is
    engine-specific; decimal strings are digit-exact)."""
    from celeborn_spark.operators.merge import snapshot_diff

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "c_mktsegment",
    )
    new = (
        c.where(F.col("c_custkey") % 97 != 0)
        .withColumn(
            "bal",
            F.when(
                F.col("c_custkey") % 89 == 0,
                (F.col("bal") + 100).cast("decimal(12,2)"),
            ).otherwise(F.col("bal")),
        )
        .unionByName(
            c.where(F.col("c_custkey") % 101 == 0).withColumn(
                "c_custkey", F.col("c_custkey") + 10_000_000
            )
        )
    )
    return snapshot_diff(c, new, "c_custkey", ["c_name", "bal", "c_mktsegment"])


def _zorder_oracle() -> str:
    from celeborn_spark.sources.io import zorder_oracle_expr

    z = zorder_oracle_expr(
        "l.l_quantity", "l.l_extendedprice",
        "s.min_q", "s.max_q", "s.min_p", "s.max_p", bits=16,
    )
    return f"""
    WITH s AS (
        SELECT min(l_quantity) AS min_q, max(l_quantity) AS max_q,
               min(l_extendedprice) AS min_p, max(l_extendedprice) AS max_p
        FROM lineitem
    )
    SELECT CAST({z} // 16777216 AS BIGINT) AS z_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem l CROSS JOIN s
    GROUP BY 1
    """


@query("q_zorder_layout", oracle=_zorder_oracle())
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (l_quantity,
    l_extendedprice): min-max grid snap + bit interleave
    (sources/io.zorder_value), aggregated to 256 z-bucket counts so the
    interleaving is pinned digit-exact without shipping the row mass.
    The layout primitive behind write_zordered: one z-sorted key gives
    parquet min/max pruning on EITHER dimension — the multi-dim
    clustering a 100 TB lake table needs (a plain sort serves only its
    leading column). Bounds come from one stats aggregate broadcast
    back; the z expression itself is a zero-shuffle map."""
    from celeborn_spark.sources.io import zorder_value

    li = load_table(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.min("l_quantity").alias("min_q"),
        F.max("l_quantity").alias("max_q"),
        F.min("l_extendedprice").alias("min_p"),
        F.max("l_extendedprice").alias("max_p"),
    )
    z = zorder_value(
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("min_q"),
        F.col("max_q"),
        F.col("min_p"),
        F.col("max_p"),
        bits=16,
    )
    return (
        li.crossJoin(F.broadcast(stats))
        .select((z / 16_777_216).cast("long").alias("z_bucket"))
        .groupBy("z_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "q_quota_admission",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(sum(CASE WHEN rn <= 40 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
           CAST(sum(CASE WHEN rn > 40 THEN 1 ELSE 0 END) AS BIGINT)  AS n_rejected
    FROM ranked
    GROUP BY user_id
    """,
)
def q_quota_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tenant quota admission (A22/A23 analogue — the reference
    enforces per-user traffic quotas and TCP-like congestion control,
    QuotaManager.scala / CongestionController.java:41-176): admit each
    user's first 40 events in arrival order (unique (ts, event_id)
    order), reject the rest, and report the admitted/rejected audit per
    tenant. ONE user-keyed window exchange; WindowGroupLimit cannot
    prune here because rejected rows are counted, not dropped — the
    audit IS the point."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("user_id").agg(
        F.sum(F.when(F.col("rn") <= 40, 1).otherwise(0)).cast("long").alias("n_admitted"),
        F.sum(F.when(F.col("rn") > 40, 1).otherwise(0)).cast("long").alias("n_rejected"),
    )


@query(
    "q_cdc_roundtrip",
    oracle="""
    SELECT c_custkey,
           CAST(c_nationkey AS INT) AS c_nationkey,
           CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0
                ELSE c_acctbal END AS c_acctbal
    FROM customer WHERE c_custkey % 7 != 0
    """,
)
def q_cdc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff -> CDC log -> apply, closed loop: base (customers sans
    every 11th) is diffed against a mutated target (every 7th deleted,
    every 5th's balance +10), the diff rows become a Debezium-shaped
    U/D feed carrying the TARGET payload, and apply_cdc replays it
    onto base. The oracle is the target definition itself, so the
    match proves diff and apply are mutual inverses — the lake
    change-feed pipeline end to end (operators/merge.snapshot_diff +
    apply_cdc), with only (key, digest) shuffling in the diff and
    last-writer pruning in the apply."""
    from celeborn_spark.operators.merge import apply_cdc, snapshot_diff

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    base = cust.filter(F.col("c_custkey") % 11 != 0)
    target = cust.filter(F.col("c_custkey") % 7 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 5 == 0, F.col("c_acctbal") + 10.0
        ).otherwise(F.col("c_acctbal")),
    )
    diff = snapshot_diff(
        base, target, "c_custkey", ["c_nationkey", "c_acctbal"]
    )
    log = (
        diff.join(target, "c_custkey", "left")
        .select(
            "c_custkey",
            F.when(F.col("status") == "removed", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.lit(1).alias("ts"),
            "c_nationkey",
            "c_acctbal",
        )
    )
    return apply_cdc(
        base, log, key_col="c_custkey", op_col="op", ord_cols=("ts",)
    )
