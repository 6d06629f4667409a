"""Spark-4 SQL frontend surface: engine-native constructs a reference
user reaches through the SQL API — recursive CTEs, pipe syntax with
session variables, ordered-set LISTAGG, and declarative SQL UDFs.

These complete the Spark-4 feature batch started in r11 (VARIANT /
collation / Python UDTF — queries/scalar.py, queries/pandas_surface.py).
The scale story of each is the same as plain SQL: everything stays
JVM-side inside whole-stage codegen (the SQL UDF is INLINED by
Catalyst into the filter/project — pinned by tests/test_sql_features.py
— unlike the Python UDF tier which pays an Arrow hop).

Reference parity: the reference is driven through Spark SQL
(client-spark/* integration), so the SQL frontend IS user-visible API
surface (SURVEY.md §2B scalar/fn tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from celeborn_spark.catalog import register_views
from celeborn_spark.registry import query


@query(
    "q_recursive_cte",
    # Identical recursion in both engines: integer-division parent
    # edges (DuckDB `//` == Spark `DIV` for non-negative ints), exact
    # integer-cents carried through the anchor, bounded depth =
    # digits(p_partkey). UNION ALL + final GROUP BY keeps the two
    # engines' recursive-dedup semantics out of the comparison.
    oracle="""
    WITH RECURSIVE anc(node, anc, cents) AS (
        SELECT p_partkey, p_partkey,
               CAST(floor(p_retailprice * 100) AS BIGINT)
        FROM part
        UNION ALL
        SELECT node, anc // 10, cents FROM anc WHERE anc >= 10
    )
    SELECT CAST(anc AS BIGINT)        AS anc,
           CAST(count(*) AS BIGINT)   AS n_desc,
           CAST(sum(cents) AS BIGINT) AS desc_cents
    FROM anc WHERE anc < 100
    GROUP BY anc
    """,
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (bill-of-materials style) roll-up via Spark 4's
    WITH RECURSIVE: parts form a synthetic tree under integer-division
    parent edges (parent(p) = p DIV 10), and each ancestor below 100
    accumulates the descendant count and retail cents of its subtree.
    Scale shape: recursion depth is digits(partkey) = O(log10 N), each
    level is one linear pass over N rows (the recursive reference is
    the PREVIOUS level only), and the output aggregation is bounded to
    <100 ancestor groups — no path explosion, no driver loop; the
    engine's native recursion operator replaces the hand-rolled
    iterative-join pattern of q_bfs_reachability where the hierarchy
    is tree-shaped. Total recursion mass is rows x depth = N log10 N —
    linear per level but above Spark's conservative 1M-row default
    safety cap from ~150k parts (found by the sf1 rung), so the
    operator declares its own budget: 64x the input row count (depth
    <= 19 digits covers any BIGINT key), a runtime conf the driver's
    vanilla session accepts at call time."""
    register_views(spark, sf_dir)
    n_parts = spark.table("part").count()  # parquet footer count — cheap
    spark.conf.set(
        "spark.sql.cteRecursionRowLimit", str(max(1_000_000, 64 * n_parts))
    )
    return spark.sql(
        """
        WITH RECURSIVE anc(node, anc, cents) AS (
            SELECT p_partkey, p_partkey,
                   CAST(floor(p_retailprice * 100) AS BIGINT)
            FROM part
            UNION ALL
            SELECT node, anc DIV 10, cents FROM anc WHERE anc >= 10
        )
        SELECT CAST(anc AS BIGINT)        AS anc,
               CAST(count(*) AS BIGINT)   AS n_desc,
               CAST(sum(cents) AS BIGINT) AS desc_cents
        FROM anc WHERE anc < 100
        GROUP BY anc
        """
    )


@query(
    "q_listagg",
    # DISTINCT collapses each segment's priority set to <=5 catalog
    # values before concatenation, so the string is bounded and the
    # WITHIN GROUP order makes it deterministic; counts are exact.
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT o_orderpriority, '|'
                      ORDER BY o_orderpriority) AS priorities,
           CAST(count(*) AS BIGINT)             AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set string aggregation via Spark 4's LISTAGG ... WITHIN
    GROUP: per market segment, the '|'-joined DISTINCT order-priority
    vocabulary plus the order count — the categorical-profile readout
    (what values appear in this slice?) emitted as one bounded string
    per group. Scale shape: the DISTINCT reduces to the <=5-value
    priority catalog per segment BEFORE concatenation (partial
    distinct map-side), the join is a plain equi-join on custkey, and
    there are 5 output rows — the aggregate string can never grow with
    row count."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(DISTINCT o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS priorities,
               CAST(count(*) AS BIGINT)                    AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


@query(
    "q_sql_pipe",
    # Plain-SQL equivalent of the pipe chain: quantities are integral
    # doubles (sums exact to 2^53), prices go through the repo's
    # floor-cents idiom, so every aggregate is hash-stable.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           sum(l_quantity)          AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                AS BIGINT)          AS price_cents
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pricing-summary shape re-expressed in Spark 4's SQL pipe
    syntax (FROM ... |> WHERE ... |> AGGREGATE ... GROUP BY), with the
    ship-date cutoff supplied through a SESSION VARIABLE (DECLARE
    VARIABLE + reference by name) — the two Spark-4 frontend features
    a migrating reference user adopts first. The pipe chain lowers to
    the IDENTICAL logical plan as the classic SELECT (filter -> partial
    agg -> exchange -> final agg), so the scale properties are q1's:
    predicate pushdown to the scan, map-side combine, 6 output rows."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        DECLARE OR REPLACE VARIABLE cs_ship_cut TIMESTAMP
            DEFAULT TIMESTAMP '1998-09-02 00:00:00'
        """
    )
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= cs_ship_cut
        |> AGGREGATE CAST(count(*) AS BIGINT) AS n,
                     sum(l_quantity)          AS sum_qty,
                     CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                          AS BIGINT)          AS price_cents
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n, sum_qty, price_cents
        """
    )


@query(
    "q_sql_udf",
    # The oracle inlines the UDF body by hand — exactly what Catalyst
    # does on the Spark side (plan pin: no BatchEvalPython, filter
    # contains the expanded expression). floor-cents on the IEEE
    # double product is bit-identical cross-engine.
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_big,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS net_cents
    FROM lineitem
    WHERE CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          > 5000000
    GROUP BY l_returnflag
    """,
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative SQL UDF (Spark 4 CREATE FUNCTION ... RETURN expr)
    used in both the filter and the aggregate: net revenue in integer
    cents. Unlike the Python UDF tier, Catalyst INLINES the body into
    the plan — the filter participates in whole-stage codegen and the
    scan still prunes columns (pinned by tests/test_sql_features.py) —
    so a shared business-logic library of SQL UDFs costs nothing at
    100 TB; this is the fast path for reusable scalar logic, with
    pandas UDFs reserved for genuinely-Python kernels."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION cs_net_cents(
            ep DOUBLE, disc DOUBLE) RETURNS BIGINT
        RETURN CAST(floor(ep * (1 - disc) * 100) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT)            AS n_big,
               CAST(sum(cs_net_cents(l_extendedprice, l_discount))
                    AS BIGINT)                     AS net_cents
        FROM lineitem
        WHERE cs_net_cents(l_extendedprice, l_discount) > 5000000
        GROUP BY l_returnflag
        """
    )
