"""Differential test of the Arrow grouped-map path (applyInPandas):
the pandas z-score must agree with the registered pure-JVM window form
(q_grouped_zscore). This pins the Arrow batch path itself — the
operator users run is the window form (see queries/pandas_surface.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.pandas_ops import grouped_zscore
from celeborn_spark.queries.pandas_surface import q_grouped_zscore


def _pandas_form(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    z = grouped_zscore(e, "user_id", "value", "event_id")
    # pandas yields NaN (not NULL) for 1-row groups (ddof=1 -> std NaN)
    # and constant groups (0/0); NaN is not NULL in Spark, so both
    # filters are required to mirror the window form's n>=2 AND sd>0
    return z.filter(F.col("zscore").isNotNull() & ~F.isnan("zscore")).select(
        "user_id", "event_id", F.round("zscore", 6).alias("zscore")
    )


def test_arrow_grouped_map_matches_window_form(spark, sf_dir):
    got = {
        (r.user_id, r.event_id): r.zscore
        for r in _pandas_form(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.event_id): r.zscore
        for r in q_grouped_zscore(spark, sf_dir).collect()
    }
    assert got.keys() == want.keys()
    assert all(abs(got[k] - want[k]) < 1e-5 for k in want)


def test_constant_value_group_excluded_on_both_paths(spark):
    """A user whose events all share one value has sd == 0: the window
    form drops the group via sd > 0 and the pandas form must drop its
    NaN (0/0) rows too — NaN survives isNotNull()."""
    rows = [(1, i, 5.0) for i in range(4)] + [(2, 10, 1.0), (2, 11, 3.0)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    z = grouped_zscore(df, "user_id", "value", "event_id")
    kept = z.filter(F.col("zscore").isNotNull() & ~F.isnan("zscore")).collect()
    assert {r.user_id for r in kept} == {2}


def test_cogroup_asof_matches_jvm_asof(spark, sf_dir):
    """The cogrouped-pandas merge_asof equals the JVM union+window
    asof_join row for row on the click/view enrichment."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.asof import asof_join
    from celeborn_spark.operators.pandas_ops import cogroup_merge_asof

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("v_id"))
    )
    jvm = asof_join(clicks, views, ["user_id"], "ts", ["v_id"]).select(
        "user_id", "event_id", "v_id"
    )
    pd_form = cogroup_merge_asof(
        clicks, views, "user_id", "ts", ["event_id"], ["v_id"]
    ).select("user_id", "event_id", "v_id")
    assert sorted(map(tuple, jvm.collect())) == sorted(
        map(tuple, pd_form.collect())
    )


def test_cogroup_shared_lineage_keeps_right_ts(spark):
    """Regression: when both cogroup sides derive from ONE source, the
    shared ts attribute (same exprId) was DEDUPLICATED and the right
    pandas frame arrived without it — the operator's internal rename
    must keep the right timestamps observable (payload attaches)."""
    from celeborn_spark.operators.pandas_ops import cogroup_merge_asof

    src = spark.createDataFrame(
        [("u", 1, "l", 0.0), ("u", 5, "r", 9.9)],
        "k string, ts long, side string, val double",
    )
    left = src.filter(F.col("side") == "l").select("k", "ts", F.col("val").alias("lv"))
    right = src.filter(F.col("side") == "r").select("k", "ts", "val")
    out = cogroup_merge_asof(
        left.union(left.select("k", (F.col("ts") + 9).alias("ts"), "lv")),
        right,
        "k",
        "ts",
        ["lv"],
        ["val"],
    ).collect()
    got = {r.ts: r.val for r in out}
    assert got[1] is None and got[10] == 9.9


def test_arrow_norms_match_jvm_expression(spark, sf_dir):
    """The mapInArrow L2-norm kernel equals the JVM aggregate
    expression row for row (the Arrow-native tier's differential,
    mirroring the grouped-zscore pandas differential)."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.arrow_ops import arrow_l2_norms
    from celeborn_spark.operators.similarity import as_double_array
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    jvm = emb.select(
        "vec_id",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(as_double_array("embedding"), lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, t: acc + t,
                )
            ),
            6,
        ).alias("norm"),
    )
    arrow = arrow_l2_norms(emb, "vec_id", "embedding")
    assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, arrow.collect()))
