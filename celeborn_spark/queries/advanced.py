"""Advanced relational coverage: scalar/IN/correlated subqueries,
statistical aggregates, exact percentiles, first/last window frames,
approximate sketches, and further TPC-H query shapes (Q7/Q10-like).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table, register_views
from celeborn_spark.operators import frontier as frontier_ops
from celeborn_spark.registry import query


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    )
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        )
        """
    )


@query(
    "q_correlated_exists",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > 2 * c.c_acctbal
          AND o.o_orderstatus = 'O'
    )
    """,
)
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a cross-table predicate — Catalyst
    rewrites to a left-semi join with the correlated condition."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 2 * c.c_acctbal
              AND o.o_orderstatus = 'O'
        )
        """
    )


@query(
    "q_stats_agg",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6)               AS qty_stddev,
           round(var_samp(l_quantity), 6)                  AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6)     AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 6)    AS qty_disc_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("qty_disc_covar"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    quantile_cont). The approximate sketch variant is q_approx_stats."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "q_approx_stats",
    # The raw sketch estimates are engine-specific, but the CONTRACT —
    # exact values plus "the sketch landed inside its error bound" —
    # is not: the oracle computes the exact side and states the bound
    # booleans as TRUE. A broken sketch flips a Spark-side boolean and
    # the driver hash goes red (VERDICT r10 item 2: this removes the
    # permanent rows-only hole q_approx_stats used to be).
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS hll_within_5pct,
           TRUE AS median_in_p45_p55
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB interactive profiling:
    approx_count_distinct (HLL, rsd=0.01) and percentile_approx
    (KLL-ish), emitted as BOUND CHECKS against the exact values
    computed in the same pass: hll_within_5pct (~5 sigma headroom at
    rsd=0.01) and median_in_p45_p55 (rank error ~n/10000 at default
    accuracy, far inside the p45..p55 corridor). The exact distinct
    count rides along so the oracle compare also validates the exact
    side. Also asserted in tests/test_similarity.py at every SF."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").cast("long").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", rsd=0.01)
                - F.count_distinct("l_orderkey")
            )
            / F.count_distinct("l_orderkey")
            <= 0.05
        ).alias("hll_within_5pct"),
        (
            F.percentile_approx("l_extendedprice", 0.5).between(
                F.expr("percentile(l_extendedprice, 0.45)"),
                F.expr("percentile(l_extendedprice, 0.55)"),
            )
        ).alias("median_in_p45_p55"),
    )


@query(
    "q_decimal_money",
    # Exact decimal arithmetic — the money path. Unlike the double
    # queries (which round aggregates to absorb accumulation-order
    # noise), DECIMAL sums are EXACT in both engines; results render as
    # strings so the compare is digit-for-digit with no float anywhere.
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
               AS revenue,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR)
               AS discounted
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_decimal_money(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal revenue aggregation: cast money to DECIMAL(18,2)
    at the scan and sum without any rounding workaround — the
    order-independent exact arithmetic a financial pipeline requires
    (and the reason the engine's double-based oracles need rounding
    discipline at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("revenue"),
        F.sum(price * disc).cast("string").alias("discounted"),
    )


@query(
    "q_dataset_manifest",
    oracle="""
    SELECT 'region' AS tbl, count(*) AS n_rows FROM region
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'events', count(*) FROM events
    UNION ALL SELECT 'documents', count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    """,
)
def q_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest: row count per catalog table in one
    result — the reproducibility record a training run stamps next to
    its outputs, and a whole-catalog canary (ANY table failing to load
    turns this row red). Parquet count() answers from footer metadata,
    no data scan."""
    from functools import reduce

    from celeborn_spark.catalog import TABLES, load_table

    parts = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit(t).alias("tbl"), "n_rows")
        for t in TABLES
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@query(
    "q_table_profile",
    # min/max pass raw column values through (no arithmetic, no
    # rounding needed); counts are exact integers — the whole profile
    # is engine-exact.
    oracle="""
    SELECT 'l_quantity' AS col,
           count(*)                         AS n_rows,
           count(l_quantity)                AS n_nonnull,
           count(DISTINCT l_quantity)       AS n_distinct,
           min(l_quantity)                  AS min_val,
           max(l_quantity)                  AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*), count(l_extendedprice),
           count(DISTINCT l_extendedprice), min(l_extendedprice),
           max(l_extendedprice)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*), count(l_discount),
           count(DISTINCT l_discount), min(l_discount), max(l_discount)
    FROM lineitem
    """,
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data-quality profile (row/null/distinct counts +
    value range per column) — the monitoring pass a training-data
    platform runs on every ingest. ONE scan: all per-column aggregates
    compute together, then unpivot via stack; at 100 TB this reads each
    column once where naive per-column queries scan the table k times."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}_nn"),
            F.count_distinct(F.col(c)).alias(f"{c}_nd"),
            F.min(c).alias(f"{c}_mn"),
            F.max(c).alias(f"{c}_mx"),
        ]
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}_nn, {c}_nd, {c}_mn, {c}_mx" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_args}) AS (col, n_nonnull, n_distinct, min_val, max_val)",
    ).select("col", "n_rows", "n_nonnull", "n_distinct", "min_val", "max_val")


@query(
    "q_winsorize",
    # Aggregate outputs only (counts + 4dp-rounded mean): the clamp
    # boundaries are interpolated doubles, so per-row clamped values
    # would need forbidden per-row rounding; the winsorized MEAN rounds
    # as an aggregate. Both engines interpolate (1-d)*lo + d*hi with
    # identical IEEE arithmetic, so the boundary comparisons agree.
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) FILTER (WHERE value < p05) AS BIGINT) AS n_low,
           CAST(count(*) FILTER (WHERE value > p95) AS BIGINT) AS n_high,
           round(avg(least(greatest(value, p05), p95)), 4) AS avg_winsorized
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY e.event_type
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (clamp to [p05, p95] per group) — the standard
    outlier treatment for score/reward columns before training. Exact
    percentiles per group (one partial-agg exchange over the groups),
    broadcast back to a map-side clamp, aggregate summary out."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        "p05",
        "p95",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias("w"),
    )
    return clamped.groupBy("event_type").agg(
        F.sum(F.when(F.col("value") < F.col("p05"), 1).otherwise(0))
        .cast("long")
        .alias("n_low"),
        F.sum(F.when(F.col("value") > F.col("p95"), 1).otherwise(0))
        .cast("long")
        .alias("n_high"),
        F.round(F.avg("w"), 4).alias("avg_winsorized"),
    )


@query(
    "q_sketch_accuracy",
    # Sketch internals are engine-specific (Spark HLL++ vs DuckDB HLL
    # produce different estimates), so the oracle-checkable claim is the
    # estimator's ERROR BOUND, not its value: the Spark side computes
    # both the sketch and the exact answer and emits whether the
    # relative error is inside the configured rsd; DuckDB independently
    # derives the same groups from the exact answer. A broken sketch
    # (or a broken bound) flips the boolean and fails the hash compare.
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_orderkey) AS exact_orders,
           true AS hll_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct-count sketch with a driver-verified accuracy bound:
    per group, |approx - exact| / exact <= 5%. rsd=0.01 gives ~5 sigma
    headroom (ADVICE r4: the earlier rsd=0.02 left only ~2.5 sigma, so
    a testdata regen or Spark HLL++ tweak could flip a group and fail
    the hash compare opaquely; the sketch is 4x bigger but still a
    fixed-size mergeable register set). At 100 TB the sketch replaces
    the exact count's full shuffle of distinct keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_orderkey").alias("exact_orders"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey", rsd=0.01)
                - F.count_distinct("l_orderkey")
            )
            / F.count_distinct("l_orderkey")
            <= 0.05
        ).alias("hll_within_5pct"),
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


@query(
    "q7_volume_shipping",
    oracle="""
    -- volume summed in integer cents (floor of the per-row double is
    -- bit-identical across engines; bigint sums are order-insensitive),
    -- sidestepping sum-of-doubles rounding at .005 boundaries
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS volume_cents
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey <> n2.n_nationkey
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume. Nations broadcast
    twice under different aliases; only fact-side joins shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("ck"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("sk"))
        .filter(F.col("ck") != F.col("sk"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
            ).alias("volume_cents")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by returned-item revenue."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_arg_minmax",
    oracle="""
    SELECT c_nationkey,
           arg_max(c_custkey, c_acctbal * 1000000 + c_custkey) AS richest_cust,
           arg_min(c_custkey, c_acctbal * 1000000 + c_custkey) AS poorest_cust,
           count(*) AS n
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q_arg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin) per group; the ordering value
    folds in the unique key so ties are deterministic."""
    c = load_table(spark, sf_dir, "customer")
    order_val = F.col("c_acctbal") * 1000000 + F.col("c_custkey")
    return c.groupBy("c_nationkey").agg(
        F.max_by("c_custkey", order_val).alias("richest_cust"),
        F.min_by("c_custkey", order_val).alias("poorest_cust"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    SELECT c.c_custkey, o.o_orderkey,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o
    JOIN big     ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate -> having -> join back to the fact.
    The `big` key set is small after the HAVING, so it broadcasts into
    the re-join instead of shuffling lineitem twice."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(li.select(F.col("l_orderkey").alias("lk"), "l_quantity"),
              F.col("lk") == o.o_orderkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(50)
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, metric, val FROM (
        SELECT o_orderkey,
               o_totalprice            AS total_price,
               CAST(o_custkey AS DOUBLE) AS cust_key
        FROM orders
    ) UNPIVOT (val FOR metric IN (total_price, cust_key))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt via stack()."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'total_price', o_totalprice,"
            " 'cust_key', cast(o_custkey as double)) AS (metric, val)"
        ),
    ).select("o_orderkey", "metric", "val")


@query(
    "q_lateral_topk",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey AS top_orderkey, o.o_totalprice AS top_price
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    ) o
    """,
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's single most
    expensive order. Catalyst rewrites the per-row subquery into a
    window/aggregate over the joined relation — the same plan the
    max_by form produces, but through the LATERAL SQL surface."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey AS top_orderkey, o.o_totalprice AS top_price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
        ) o
        """
    )


@query(
    "q_regression_agg",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           round(regr_avgx(l_extendedprice, l_quantity), 6)      AS avg_x,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares aggregates (regr_* family) —
    single-pass moment accumulation, map-side partials. skewness/
    kurtosis are deliberately absent: Spark uses population estimators
    where DuckDB bias-corrects, so they can never hash-match."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("regr_slope(l_extendedprice, l_quantity)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(l_extendedprice, l_quantity)"), 6).alias("intercept"),
        F.round(F.expr("regr_r2(l_extendedprice, l_quantity)"), 6).alias("r2"),
        F.round(F.expr("regr_avgx(l_extendedprice, l_quantity)"), 6).alias("avg_x"),
        F.expr("regr_count(l_extendedprice, l_quantity)").cast("long").alias("n"),
    )


@query(
    "q_bitwise_agg",
    oracle="""
    SELECT user_id,
           bit_and(event_id) AS ids_and,
           bit_or(event_id)  AS ids_or,
           bit_xor(event_id) AS ids_xor
    FROM events
    GROUP BY user_id
    """,
)
def q_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates per key — set-membership/bitmap building
    blocks (commutative+associative, so fully map-side combinable)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.expr("bit_and(event_id)").alias("ids_and"),
        F.expr("bit_or(event_id)").alias("ids_or"),
        F.expr("bit_xor(event_id)").alias("ids_xor"),
    )


K_ANON = 5


@query(
    "q_k_anonymity",
    oracle=f"""
    SELECT lang, source,
           CAST(floor(n_chars / 100.0) AS BIGINT) AS chars_bucket,
           CAST(count(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY 1, 2, 3
    HAVING count(*) < {K_ANON}
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (lang, source,
    length bucket): groups smaller than k=5 are re-identification risks
    a release pipeline must generalize or suppress — the structural
    complement of q_anonymize's value-level PII scrub. One map-combined
    exchange; the HAVING prunes reduce-side."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            "source",
            F.floor(F.col("n_chars") / F.lit(100.0)).alias("chars_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < K_ANON)
    )


@query(
    "q_pareto_frontier",
    oracle=frontier_ops.skyline_oracle_sql(
        "(SELECT p_partkey, CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,"
        " -CAST(p_size AS BIGINT) AS neg_size FROM part)",
        "price_cents",
        "neg_size",
        "p_partkey, price_cents, neg_size",
    ),
)
def q_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-optimal parts (cheapest price at each size, no part both
    cheaper AND larger exists): the multi-objective selection operator.
    Spark side runs the local-then-global skyline (per-partition prune
    via per-x-min running windows — cardinality-bounded, no quadratic
    join); the oracle is the NOT-EXISTS dominance definition itself, so
    the match proves the distributed algorithm implements the exact
    semantics (operators/frontier.skyline_2d)."""
    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        (-F.col("p_size")).cast("long").alias("neg_size"),
    )
    return frontier_ops.skyline_2d(pts, "price_cents", "neg_size")


@query(
    "q_feature_scaling",
    oracle="""
    WITH stats AS (
        SELECT l_returnflag AS grp,
               min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        FROM lineitem GROUP BY 1
    )
    SELECT l.l_orderkey, l.l_linenumber, s.grp,
           (l.l_extendedprice - s.mn) / (s.mx - s.mn) AS price_scaled
    FROM lineitem l JOIN stats s ON l.l_returnflag = s.grp
    WHERE s.mx > s.mn
    """,
)
def q_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group min-max feature scaling to [0, 1] — the ML
    preprocessing map: group stats from ONE aggregate broadcast back
    onto the rows; the scaled value is a single subtraction and
    division of identical doubles (raw, unrounded — bit-identical);
    degenerate constant groups dropped before the division."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
    )
    return (
        li.join(
            F.broadcast(stats.filter(F.col("mx") > F.col("mn"))),
            li["l_returnflag"] == F.col("grp"),
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "grp",
            (
                (F.col("l_extendedprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
            ).alias("price_scaled"),
        )
    )


@query(
    "q_group_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.user_id,
           CAST(t.tot AS BIGINT) AS n_events,
           round(-sum((c.n / CAST(t.tot AS DOUBLE))
                      * ln(c.n / CAST(t.tot AS DOUBLE))), 6) AS entropy
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id, t.tot
    """,
)
def q_group_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity signal (bots repeat one action, entropy ~ 0; organic
    users spread). Exact-integer ratios through ln, summed per user
    and rounded 6dp; two group-keyed aggregates, the second reusing
    the first's partitioning."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot").cast("double")
    return (
        c.join(t, "user_id")
        .groupBy("user_id", "tot")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
        .select(
            "user_id",
            F.col("tot").cast("long").alias("n_events"),
            "entropy",
        )
    )


L_DIVERSITY = 3


@query(
    "q_l_diversity",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT))
                AS BIGINT) AS distinct_sensitive,
           CASE WHEN count(DISTINCT CAST(floor(c_acctbal / 1000.0)
                                         AS BIGINT)) < {L_DIVERSITY}
                THEN 1 ELSE 0 END AS violates_l
    FROM customer
    GROUP BY 1, 2
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the quasi-identifier tuple (segment,
    nation): quasi-groups whose SENSITIVE attribute (account-balance
    thousand-dollar band) takes fewer than l=3 distinct values leak it
    by homogeneity even when k-anonymous — the attribute-disclosure
    complement of q_k_anonymity's group-size rule. Emits the FULL
    per-group audit with a violation flag (a violations-only form goes
    empty once groups grow past l distinct bands, which would make the
    driver row trivially green at scale). One map-combined
    count-distinct exchange over a segments-x-nations-bounded output."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.countDistinct(
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long")
        )
        .cast("long")
        .alias("distinct_sensitive"),
        F.when(
            F.countDistinct(
                F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("long")
            )
            < L_DIVERSITY,
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("violates_l"),
    )


@query(
    "q_dp_counts",
    # Deterministic-noise DP: u is an exact dyadic rational (md5 top
    # 32 bits / 2^32 — both engines parse the same hex digits), so
    # 1 - 2*|u - 0.5| is exact and ln() of it is the only irrational
    # step; the 6dp round on the noisy count is tie-safe. sign/abs/
    # ln/scale is the inverse-CDF Laplace sampler.
    oracle="""
    WITH grp AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    noised AS (
        SELECT event_type, n,
               CAST(concat('0x', substr(md5(concat_ws(':', event_type,
                                                       'dp0')), 1, 8))
                    AS UBIGINT) / 4294967296.0 - 0.5 AS u
        FROM grp
    )
    SELECT event_type,
           1.0 AS epsilon,
           round(n - (1.0 / 1.0) * sign(u) * ln(1 - 2 * abs(u)), 6)
               AS noisy_count
    FROM noised
    """,
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release counts: per-event-type counts +
    Laplace(1/epsilon) noise at epsilon=1 via the inverse-CDF sampler,
    seeded DETERMINISTICALLY from md5(group key) — reproducible
    releases (the property a data-clean-room pipeline needs: the same
    release query must publish the same number twice). Completes the
    privacy desk next to q_k_anonymity / q_l_diversity / q_t_closeness
    (those AUDIT; this RELEASES). The true count never appears in the
    output. Zero shuffle beyond the count aggregate; noise is a
    per-group scalar map."""
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("event_type"), F.lit("dp0"))), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    noise = (F.lit(1.0) / F.lit(1.0)) * F.signum(u) * F.log(1 - 2 * F.abs(u))
    return grp.select(
        "event_type",
        F.lit(1.0).alias("epsilon"),
        F.round(F.col("n") - noise, 6).alias("noisy_count"),
    )


_DPQ_B = 256
_DPQ_EPS = 1.0


@query(
    "q_dp_quantile",
    oracle=f"""
    WITH dpq_x AS (
        SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events
    ),
    dpq_b AS (SELECT min(cents) AS lo, max(cents) AS hi,
                     CAST(count(*) AS BIGINT) AS n FROM dpq_x),
    dpq_h AS (
        SELECT least({_DPQ_B - 1},
                     CAST(floor((cents - lo) * 1.0 / (hi - lo) * {_DPQ_B})
                          AS BIGINT)) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM dpq_x CROSS JOIN dpq_b
        WHERE hi > lo
        GROUP BY 1
    ),
    dpq_r AS (
        SELECT b, c,
               CAST(2 * coalesce(sum(c) OVER (ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) + c AS BIGINT) AS r2
        FROM dpq_h
    ),
    dpq_s AS (
        SELECT b, c,
               round({_DPQ_EPS} * -abs(CAST(r2 AS DOUBLE) - n) / 4.0
                     - ln(-ln({{u01}})), 6) AS score,
               lo, hi, n
        FROM dpq_r CROSS JOIN dpq_b
    )
    SELECT CAST({_DPQ_EPS} AS DOUBLE) AS epsilon,
           CAST(b AS BIGINT) AS bucket,
           lo + (b + 0.5) * (CAST(hi - lo AS DOUBLE) / {_DPQ_B})
               AS dp_median_cents
    FROM dpq_s
    ORDER BY score DESC, b LIMIT 1
    """.replace(
        "{u01}",
        "CAST(concat('0x', substr(md5(concat_ws(':', "
        "concat_ws('#', 'dpq', CAST(b AS VARCHAR)), '17')), 1, 8)) "
        "AS UBIGINT) / 4294967296.0",
    ),
)
def q_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private MEDIAN of event-value cents via the
    exponential mechanism over a 256-bucket value grid — the privacy
    desk's quantile release beside q_dp_counts' Laplace counts (the
    exponential mechanism is THE tool when the released value is a
    choice, not a number to perturb). Utility = -|doubled-rank(bucket
    midpoint) - n| (sensitivity 2 in doubled units -> eps*u/4), noise
    = md5-seeded Gumbel, winner = deterministic argmax over the
    bounded grid — reproducible releases, true median never emitted.

    All ranks are exact BIGINTs off the bounded histogram (grid-
    bounded prefix window); the Gumbel double-ln chain rounds into the
    6dp score before the argmax so a 1-ulp libm divergence cannot
    flip the winner (bucket id breaks residual ties)."""
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(F.floor(F.col("value") * 100).cast("long").alias("cents"))
    b = x.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    h = (
        x.crossJoin(F.broadcast(b))
        .filter(F.col("hi") > F.col("lo"))
        .select(
            F.least(
                F.lit(_DPQ_B - 1),
                F.floor(
                    (F.col("cents") - F.col("lo"))
                    * 1.0
                    / (F.col("hi") - F.col("lo"))
                    * _DPQ_B
                ).cast("long"),
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # grid-bounded: <= 256 bucket rows feed this prefix window
    wo = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    r = h.select(
        "b",
        "c",
        (2 * F.coalesce(F.sum("c").over(wo), F.lit(0)) + F.col("c"))
        .cast("long")
        .alias("r2"),
    )
    from celeborn_spark.operators.curriculum import u01

    g = -F.log(-F.log(u01(F.concat_ws("#", F.lit("dpq"), F.col("b").cast("string")), salt=17)))
    s = r.crossJoin(F.broadcast(b)).select(
        "b",
        F.col("lo"),
        F.col("hi"),
        F.round(
            F.lit(_DPQ_EPS)
            * -F.abs(F.col("r2").cast("double") - F.col("n"))
            / 4.0
            + g,
            6,
        ).alias("score"),
    )
    # grid-bounded argmax: <= 256 rows
    return (
        s.orderBy(F.col("score").desc(), "b")
        .limit(1)
        .select(
            F.lit(float(_DPQ_EPS)).alias("epsilon"),
            F.col("b").cast("long").alias("bucket"),
            (
                F.col("lo")
                + (F.col("b") + 0.5)
                * ((F.col("hi") - F.col("lo")).cast("double") / _DPQ_B)
            ).alias("dp_median_cents"),
        )
    )
