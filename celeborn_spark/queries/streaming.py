"""Streaming query surface: tumbling/sliding windows, session windows,
watermarked dedup — each driven to completion over the finite events
parquet and oracle-checked against the equivalent batch SQL (streaming
and batch must agree on a bounded input; the streaming twin of the
reference's differential tests, SparkTestBase.scala:111).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.registry import query
from celeborn_spark.streaming.events import (
    read_events_stream,
    read_offset_stream,
    run_stream_to_table,
    run_stream_until,
)


@query(
    "q_stream_tumbling_counts",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation, complete mode."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total",
        )
    )
    return run_stream_to_table(agg, "stream_tumbling_counts", "complete")


@query(
    "q_stream_sliding_counts",
    oracle="""
    -- each event belongs to two 2h/1h-slide windows: the one starting
    -- at its floor-hour and the one starting an hour earlier
    SELECT strftime(date_trunc('hour', ts) - (o * INTERVAL 1 HOUR),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           count(*) AS n
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o)
    GROUP BY 1
    """,
)
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour window sliding every hour."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "n",
        )
    )
    return run_stream_to_table(agg, "stream_sliding_counts", "complete")


@query(
    "q_stream_session_window",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30 min) — F.session_window merges
    events closer than the gap; the oracle is the batch lag/cumsum
    sessionization, which defines identical sessions on bounded input."""
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )
    return run_stream_to_table(agg, "stream_session_window", "complete")


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT count(*) AS n_pairs FROM (
        SELECT 1
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND epoch_us(p.ts) >  epoch_us(c.ts)
         AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
    )
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with a time-bound condition (click ->
    purchase within 1h per user). Both sides watermarked so Spark can
    evict join state — unbounded state is the stream-join trap at
    scale. Batch SQL over the bounded input is the oracle; the count is
    aggregated in a second (batch) step because a streaming aggregation
    over a stream-stream join needs multiple stateful operators."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withColumnRenamed("ts", "c_ts")
        .withColumnRenamed("user_id", "c_user")
        .withWatermark("c_ts", "2 hours")
        .select("c_user", "c_ts", F.col("event_id").alias("c_id"))
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withColumnRenamed("ts", "p_ts")
        .withColumnRenamed("user_id", "p_user")
        .withWatermark("p_ts", "2 hours")
        .select("p_user", "p_ts", F.col("event_id").alias("p_id"))
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    # inner joins emit eagerly — the trailing no-data micro-batch only
    # evicts state (1.7 s of pure overhead on a bounded run; r13)
    pairs = run_stream_to_table(
        joined, "stream_stream_join", "append", no_data_batches=False
    )
    return pairs.agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM (SELECT DISTINCT * FROM (SELECT * FROM events
                                  UNION ALL SELECT * FROM events))
    GROUP BY event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once over an at-least-once stream: replay the source
    twice (union of two readers), watermark + dropDuplicates on the
    event id — the streaming twin of the reference's replayed-batch
    filter (CelebornInputStream.java:894-904)."""
    a = read_events_stream(spark, sf_dir)
    b = read_events_stream(spark, sf_dir)
    deduped = (
        a.unionByName(b)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return run_stream_to_table(deduped, "stream_dedup", "complete")


@query(
    "q_stream_stateful_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key state machine via applyInPandasWithState
    (streaming/stateful.py running_user_totals) — the escape hatch for
    stateful operators the built-in streaming aggregations can't
    express; state lives in the checkpointable state store (reference
    analogue: graceful-restart shuffledb, worker/.../shuffledb/DB.java).
    Update mode emits one row per key per micro-batch it changed in;
    the final state is recovered batching-invariantly by keeping each
    key's highest-count emission (the running count is strictly
    increasing), so the batch aggregate stays the oracle even if the
    source ever splits into multiple files/batches."""
    from celeborn_spark.streaming.stateful import running_user_totals

    ev = read_events_stream(spark, sf_dir)
    totals = run_stream_to_table(
        running_user_totals(ev), "stream_stateful_totals", "update"
    )
    final = totals.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("total_value", "n_events").alias("total_value"),
    )
    return final.select(
        "user_id", "n_events", F.round("total_value", 2).alias("total_value")
    )


_OFFSET_BOUND = 5000


@query(
    "q_stream_offset_replay",
    oracle="""
    SELECT value % 10                  AS bucket,
           count(*)                    AS n,
           CAST(sum(value) AS BIGINT)  AS total
    FROM (SELECT unnest(range(0, 5000)) AS value)
    GROUP BY 1
    """,
)
def q_stream_offset_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-bounded micro-batch ingestion: a rate-micro-batch source
    admits exactly 1000 offsets per trigger (Kafka maxOffsetsPerTrigger
    shape; reference analogue: credit-based read,
    CreditStreamManager.java:80-202), aggregated over the first 5000
    offsets. The offset-bound filter makes the complete-mode result a
    fixed point once all bounded offsets have arrived, so the unbounded
    source still yields a deterministic, batch-oracle-checkable answer."""
    src = read_offset_stream(spark, rows_per_batch=1000, num_partitions=4)
    agg = (
        src.filter(F.col("value") < _OFFSET_BOUND)
        .groupBy((F.col("value") % 10).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").cast("long").alias("total"),
        )
    )

    def done(t: DataFrame) -> bool:
        # Bounded collect: a 1-row scalar (sum over the <=10-row
        # bucket aggregate) polled as the stream's fixed-point check —
        # never row data.
        got = t.agg(F.sum("n")).collect()[0][0]
        return got is not None and got >= _OFFSET_BOUND

    return run_stream_until(agg, "stream_offset_replay", "complete", done)


@query(
    "q_stream_static_join",
    oracle="""
    SELECT c.c_mktsegment, count(*) AS n, round(sum(e.value), 2) AS total
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins a static dim
    (customer) per micro-batch — the dim is re-resolvable each batch,
    needs no state store (unlike stream-stream), and broadcasts. The
    standard shape for enriching a clickstream with account metadata."""
    from celeborn_spark.catalog import load_table

    ev = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    return run_stream_to_table(agg, "stream_static_join", "complete")


@query(
    "q_stream_corpus_ingest",
    oracle="""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM (
        SELECT lang, n_chars,
               row_number() OVER (PARTITION BY lang, md5(text)
                                  ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn = 1
    GROUP BY lang
    """,
)
def q_stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion: documents arrive as a file stream,
    are exact-deduped IN-STREAM (dropDuplicates state store — the
    streaming form of exact_dedup), and roll up per language. The
    dedup key is (lang, content hash), NOT the hash alone: streaming
    dropDuplicates keeps an ARRIVAL-ORDER winner, and the sf0.1 corpus
    has identical texts under different langs — keying by (lang, hash)
    makes every aggregate winner-invariant (all copies in a group share
    lang and n_chars), so the batch oracle agrees under any split
    planning or parallelism."""
    from pyspark.sql import types as T

    from celeborn_spark.catalog import table_path

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    raw = spark.readStream.schema(schema).parquet(
        table_path(sf_dir, "documents").replace("documents.parquet", "documents.*")
    )
    deduped = raw.withColumn("h", F.md5("text")).dropDuplicates(["lang", "h"])
    agg = deduped.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("sum_chars")
    )
    return run_stream_to_table(agg, "stream_corpus_ingest", "complete")


@query(
    "q_stream_stream_left_join",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events),
    c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
          FROM events WHERE event_type = 'click'),
    p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.c_id, p.p_id
    FROM c CROSS JOIN mx
    LEFT JOIN p
      ON c.c_user = p.p_user
     AND epoch_us(p.p_ts) >  epoch_us(c.c_ts)
     AND epoch_us(p.p_ts) <= epoch_us(c.c_ts) + 3600000000
    WHERE epoch_us(c.c_ts) <= epoch_us(mx.m) - 4 * 3600000000
    """,
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join: clicks with their within-1h
    purchase, or NULL once the watermark proves no purchase can still
    arrive — the state semantics inner joins never exercise (Spark
    holds the unmatched side in the state store until the watermark
    passes the join window, then emits the null row and evicts).

    Boundary discipline: a click flushes its unmatched row only when
    watermark (max ts - 2h) passes c_ts + 1h, so the bounded input's
    final watermark leaves a tail of clicks undetermined. Both engines
    apply the identical c_ts <= max_ts - 4h cutoff (one broadcast
    scalar), so the compared region is exactly the provably-flushed
    one."""
    from celeborn_spark.catalog import load_table

    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .withColumnRenamed("ts", "c_ts")
        .withColumnRenamed("user_id", "c_user")
        .withWatermark("c_ts", "2 hours")
        .select("c_user", "c_ts", F.col("event_id").alias("c_id"))
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withColumnRenamed("ts", "p_ts")
        .withColumnRenamed("user_id", "p_user")
        .withWatermark("p_ts", "2 hours")
        .select("p_user", "p_ts", F.col("event_id").alias("p_id"))
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    )
    out = run_stream_to_table(joined, "stream_stream_left_join", "append")
    mx = load_table(spark, sf_dir, "events").agg(F.max("ts").alias("m"))
    return (
        out.crossJoin(F.broadcast(mx))
        .where(F.col("c_ts") <= F.col("m") - F.expr("INTERVAL 4 HOURS"))
        .select("c_id", "p_id")
    )


@query("q_stream_dedup_watermark", oracle="SELECT event_id FROM events")
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion from an at-least-once source with BOUNDED
    state: the events stream unioned with itself (every event delivered
    twice, the redelivery failure mode of any at-least-once transport),
    deduped by dropDuplicatesWithinWatermark — unlike plain
    dropDuplicates (whose key state grows forever, the 100 TB trap),
    state here is EVICTED once the watermark passes an id's event time.
    A redelivery within the watermark lag hits live state; one after it
    is late by definition and the watermark itself drops it — either
    way each event_id is emitted exactly once, so the bounded replay
    equals SELECT event_id FROM events.

    Reference analogue: attempt/batch exactly-once dedup on shuffle
    reads, CelebornInputStream.java:864-904 (SURVEY §2A A12), with the
    state-eviction discipline the reference gets from bounded attempt
    ids."""
    s1 = read_events_stream(spark, sf_dir)
    s2 = read_events_stream(spark, sf_dir)
    deduped = (
        s1.unionAll(s2)
        .withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    return run_stream_to_table(deduped, "stream_dedup_watermark", "append")


@query(
    "q_stream_anti_static",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
    FROM events
    WHERE user_id NOT IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
    GROUP BY event_type
    """,
)
def q_stream_anti_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion filtered by a static suppression index
    (stream-static LEFT ANTI join): events from users already present
    in the 'BUILDING'-segment index are dropped in-flight — the
    incremental-ingest twin of incremental_dedup (drop rows already in
    the corpus index before they ever land). The static side broadcasts
    per micro-batch; no state store is involved, so state is ZERO
    regardless of stream length — the cheapest exactly-once-vs-index
    guard available at 100 TB ingest rates."""
    from celeborn_spark.catalog import load_table

    ev = read_events_stream(spark, sf_dir)
    index = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("user_id"))
    )
    kept = ev.join(F.broadcast(index), "user_id", "left_anti")
    agg = kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    return run_stream_to_table(agg, "stream_anti_static", "complete")


@query(
    "q_stream_user_profile",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
           CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           (count(DISTINCT CASE WHEN event_type IN ('view', 'click', 'purchase')
                                THEN event_type END) = 3) AS full_funnel
    FROM events GROUP BY user_id
    """,
)
def q_stream_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second custom stateful operator
    (streaming/stateful.user_profile_state): per-user count, first/
    last event-time and a type BITMASK, accumulated in group state.
    Every state component is a commutative monoid (sum/min/max/OR), so
    the result is exact under ANY batch split or arrival order — the
    design rule for stateful ops at scale; the batch aggregate is the
    oracle. Final state recovered batching-invariantly per key by the
    highest-count emission; the mask unpacks to distinct-type count
    and a view+click+purchase funnel-completion flag."""
    from celeborn_spark.streaming.stateful import user_profile_state

    ev = read_events_stream(spark, sf_dir)
    prof = run_stream_to_table(
        user_profile_state(ev), "stream_user_profile", "update"
    )
    final = prof.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("first_us", "n_events").alias("first_us"),
        F.max_by("last_us", "n_events").alias("last_us"),
        F.max_by("type_mask", "n_events").alias("mask"),
    )
    n_types = (
        F.bit_count(F.expr("mask & 31L"))
    )
    return final.select(
        "user_id",
        "n_events",
        "first_us",
        "last_us",
        n_types.cast("long").alias("n_types"),
        (F.expr("mask & 7L") == 7).alias("full_funnel"),
    )


@query(
    "q_stream_topk_items",
    # batch-equivalence oracle (the q_stream_corpus_ingest pattern):
    # a complete-mode streaming aggregation over the finite file
    # stream must land exactly on the batch top-k
    oracle="""
    SELECT item, n_interactions FROM (
        SELECT CAST(props->>'k' AS BIGINT) AS item,
               CAST(count(*) AS BIGINT) AS n_interactions,
               row_number() OVER (ORDER BY count(*) DESC,
                                  CAST(props->>'k' AS BIGINT)) AS rnk
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        GROUP BY 1
    ) WHERE rnk <= 10
    """,
)
def q_stream_topk_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming top-k items: a complete-mode item-count aggregation
    over the event stream (state store holds the per-item counts
    across micro-batches) with the top-10 cut applied to the final
    complete-mode table — the live leaderboard next to the windowed
    counts (q_stream_tumbling_counts) and the stateful per-user
    accumulators. The finite stream's answer must equal the batch
    aggregate exactly (the A12/A30 exactly-once discipline); ranking
    cuts on (count DESC, item) so ties are engine-deterministic."""
    ev = read_events_stream(spark, sf_dir).filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    counts = ev.select(
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("item")
    ).groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n_interactions"))
    table = run_stream_to_table(counts, "stream_topk_items", "complete")
    # heap-select the 10 (TakeOrderedAndProject — the item-count state
    # scales with the catalog); the pre-r10 row_number-then-filter form
    # serialized every item onto one partition (the q_bm25_topk lesson).
    return table.orderBy(F.col("n_interactions").desc(), F.col("item")).limit(10)
