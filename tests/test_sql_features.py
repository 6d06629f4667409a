"""Spark-4 SQL frontend features (queries/sql_features.py) + the XML
source: value checks with independent derivations, and the plan pins
that carry the scale claims (SQL UDFs inline — no Python boundary; the
pipe chain lowers to the same plan as classic SELECT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.plans import explain_formatted, read_schema_columns
from celeborn_spark.queries import sql_features


def test_recursive_cte_matches_digit_prefix_count(spark, sf_dir):
    """Independent derivation: under parent(p) = p DIV 10, the
    descendants of ancestor `a` are exactly the parts whose decimal
    key string starts with str(a) — so n_desc(1) must equal the
    startswith-'1' count (no recursion involved)."""
    from celeborn_spark.catalog import load_table

    got = {
        r.anc: r.n_desc
        for r in sql_features.q_recursive_cte(spark, sf_dir).collect()
    }
    part = load_table(spark, sf_dir, "part")
    expected = part.filter(
        F.col("p_partkey").cast("string").startswith("1")
    ).count()
    assert got[1] == expected
    # every part is its own descendant: leaf ancestors count >= 1
    assert all(n >= 1 for n in got.values())


def test_listagg_is_ordered_and_catalog_bounded(spark, sf_dir):
    rows = sql_features.q_listagg(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 5  # mktsegment catalog
    for r in rows:
        vals = r.priorities.split("|")
        assert vals == sorted(vals)
        assert len(vals) <= 5  # orderpriority catalog, DISTINCT-bounded


def test_sql_pipe_equals_classic_select(spark, sf_dir):
    """The pipe chain must lower to the same RESULT as the classic
    SELECT form (engine-internal identity, independent of the DuckDB
    oracle)."""
    from celeborn_spark.catalog import register_views

    register_views(spark, sf_dir)
    classic = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               sum(l_quantity)          AS sum_qty,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT)          AS price_cents
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    piped = sorted(
        sql_features.q_sql_pipe(spark, sf_dir).collect(),
        key=lambda r: (r.l_returnflag, r.l_linestatus),
    )
    assert [tuple(r) for r in piped] == [tuple(r) for r in classic]


def test_sql_udf_inlines_no_python_boundary(spark, sf_dir):
    """The scale claim of q_sql_udf: Catalyst inlines the SQL UDF body,
    so the plan has NO Python evaluation node, the expanded expression
    sits in the filter, and the scan prunes to the 3 needed columns."""
    df = sql_features.q_sql_udf(spark, sf_dir)
    plan = explain_formatted(df)
    assert "Python" not in plan, plan[:1500]
    assert "cs_net_cents" not in plan, plan[:1500]  # body, not a call
    (cols,) = read_schema_columns(df)
    assert set(cols) == {"l_returnflag", "l_extendedprice", "l_discount"}, cols


def test_xml_round_trip(spark, sf_dir, tmp_path):
    """XML is built into Spark 4 (spark-xml folded into core): a full
    write/read round-trip through read_any/write_any with an explicit
    schema preserves rows, column set, and integer types."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.sources.io import read_any, write_any

    src = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation.xml")
    write_any(src, path, fmt="xml")
    back = read_any(spark, path, fmt="xml", schema=src.schema)
    assert back.schema == src.schema
    assert {(r.n_nationkey, r.n_name) for r in back.collect()} == {
        (r.n_nationkey, r.n_name) for r in src.collect()
    }
