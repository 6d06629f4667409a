"""Known-answer tests for the round-9 ninth batch: mixture waterfill
(operators/curriculum.py), attribute assortativity
(operators/graph.py), seasonal strength / A/B power plan
(operators/stats.py), bigram conditional entropy
(operators/textops.py), and the component-size histogram query.
Hand-computed values on planted inputs; DuckDB parity on the real
tables is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math

from celeborn_spark.operators.curriculum import mixture_waterfill
from celeborn_spark.operators.graph import attribute_assortativity
from celeborn_spark.operators.stats import ab_power_plan, seasonal_strength
from celeborn_spark.operators.textops import bigram_conditional_entropy


# ---------- mixture waterfill ----------


def test_waterfill_exact_fit(spark):
    # budget 6 over 3 groups of >= 2 docs each -> 2 apiece, rate checks
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    out = {
        r["group"]: r
        for r in mixture_waterfill(
            spark.createDataFrame(rows, ["g"]), "g", budget=6
        ).collect()
    }
    assert {g: r["alloc"] for g, r in out.items()} == {"a": 2, "b": 2, "c": 2}
    assert out["c"]["fill_rate"] == 1.0


def test_waterfill_redistributes_saturated_capacity(spark):
    # budget 9, sizes a=10, b=1, c=2: base 3 each -> b caps at 1, c at
    # 2 -> leftover 3 refills a (capacity 7) -> a=6, b=1, c=2; total 9
    rows = [("a",)] * 10 + [("b",)] + [("c",)] * 2
    out = {
        r["group"]: r["alloc"]
        for r in mixture_waterfill(
            spark.createDataFrame(rows, ["g"]), "g", budget=9
        ).collect()
    }
    assert out == {"a": 6, "b": 1, "c": 2}


def test_waterfill_budget_exceeds_corpus(spark):
    rows = [("a",)] * 2 + [("b",)] * 3
    out = {
        r["group"]: r
        for r in mixture_waterfill(
            spark.createDataFrame(rows, ["g"]), "g", budget=100
        ).collect()
    }
    assert all(r["alloc"] == r["n_docs"] for r in out.values())
    assert all(r["fill_rate"] == 1.0 for r in out.values())


def test_waterfill_remainder_goes_to_first_groups(spark):
    # budget 7 over 3 big groups: quotas 3,2,2 in key order
    rows = [("a",)] * 9 + [("b",)] * 9 + [("c",)] * 9
    out = {
        r["group"]: r["alloc"]
        for r in mixture_waterfill(
            spark.createDataFrame(rows, ["g"]), "g", budget=7
        ).collect()
    }
    assert out == {"a": 3, "b": 2, "c": 2}


# ---------- attribute assortativity ----------


def test_homophily_perfectly_assortative(spark):
    # two same-attr cliques, no cross edges -> r = 1
    edges = spark.createDataFrame(
        [(1, 2), (3, 4)], ["u", "v"]
    )
    attrs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y")], ["node", "attr"]
    )
    out = attribute_assortativity(edges, attrs).collect()[0]
    assert out["n_edges"] == 2 and out["same_attr_edges"] == 2
    assert out["assortativity"] == 1.0


def test_homophily_perfectly_disassortative(spark):
    # bipartite across attributes, balanced stubs -> r = -1
    edges = spark.createDataFrame([(1, 3), (2, 4)], ["u", "v"])
    attrs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "y")], ["node", "attr"]
    )
    out = attribute_assortativity(edges, attrs).collect()[0]
    assert out["same_attr_edges"] == 0
    assert out["assortativity"] == -1.0


def test_homophily_single_attribute_null(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["u", "v"])
    attrs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], ["node", "attr"]
    )
    out = attribute_assortativity(edges, attrs).collect()[0]
    assert out["assortativity"] is None


# ---------- seasonal strength ----------


def test_seasonal_strength_pure_weekly_cycle(spark):
    import datetime as dt

    # 14 days, metric a pure function of DOW -> SSW = 0 -> strength 1
    days = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), (i % 7) * 10 + 5)
        for i in range(14)
    ]
    out = seasonal_strength(
        spark.createDataFrame(days, ["day", "m"]), "day", "m"
    ).collect()[0]
    assert out["n_days"] == 14 and out["strength"] == 1.0


def test_seasonal_strength_constant_series_null(spark):
    import datetime as dt

    days = [(dt.date(2024, 1, 1) + dt.timedelta(days=i), 7) for i in range(10)]
    out = seasonal_strength(
        spark.createDataFrame(days, ["day", "m"]), "day", "m"
    ).collect()[0]
    assert out["strength"] is None


def test_seasonal_strength_bounded(spark, sf_dir):
    from pyspark.sql import functions as F

    from celeborn_spark.catalog import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out = seasonal_strength(ev, "day", "cents").collect()[0]
    assert out["strength"] is None or 0.0 <= out["strength"] <= 1.0


# ---------- A/B power plan ----------


def test_power_plan_textbook_value(spark):
    # control values with mean 100 cents, sd 50 cents (in dollars:
    # 1.0 / 0.5), mde 5% -> delta = 5 cents
    # n = ceil(2 * 2500 * (1.96+0.84)^2 / 25) = ceil(1569.97...)
    rows = [("c", 0.5), ("c", 1.5), ("c", 0.5), ("c", 1.5)]
    out = ab_power_plan(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "c", mde_frac=0.05
    ).collect()[0]
    assert out["n_control"] == 4
    assert abs(out["mean_control"] - 1.0) < 1e-12
    # sd of (50,150,50,150) cents = 57.735 -> 0.577350 dollars
    assert abs(out["sd_control"] - 0.57735) < 1e-5
    za, zb = 1.959963984540054, 0.8416212335729143
    var = ((50**2) * 4 / 3)  # sample variance of the cents
    want = math.ceil(2 * var * (za + zb) ** 2 / (0.05 * 100) ** 2)
    assert out["n_per_arm"] == want


def test_power_plan_degenerate_null(spark):
    rows = [("c", 1.0)]  # n = 1 -> no variance estimate
    out = ab_power_plan(
        spark.createDataFrame(rows, ["g", "v"]), "g", "v", "c"
    ).collect()[0]
    assert out["n_per_arm"] is None and out["sd_control"] is None


def test_power_plan_smaller_mde_needs_more_units(spark, sf_dir):
    from celeborn_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    n5 = ab_power_plan(ev, "event_type", "value", "click", 0.05).collect()[0]
    n1 = ab_power_plan(ev, "event_type", "value", "click", 0.01).collect()[0]
    assert n1["n_per_arm"] > n5["n_per_arm"]
    # 5x smaller effect -> ~25x more units
    assert abs(n1["n_per_arm"] / n5["n_per_arm"] - 25) < 0.5


# ---------- bigram conditional entropy ----------


def test_bigram_entropy_deterministic_text_zero(spark):
    # every token fully determines its successor -> H = 0, ppl = 1
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
    )
    out = bigram_conditional_entropy(df, "text").collect()[0]
    assert out["h_cond"] == 0.0 and out["perplexity"] == 1.0
    assert out["n_bigrams"] == 4 and out["vocab"] == 2  # u in {a, b}


def test_bigram_entropy_uniform_branching(spark):
    # 'a' followed by x or y equally -> H = ln 2
    df = spark.createDataFrame(
        [(1, "a x"), (2, "a y")], ["doc_id", "text"]
    )
    out = bigram_conditional_entropy(df, "text").collect()[0]
    assert abs(out["h_cond"] - round(math.log(2), 6)) < 1e-9
    assert abs(out["perplexity"] - 2.0) < 1e-4


# ---------- component-size histogram ----------


def test_component_histogram_conserves_docs(spark, sf_dir):
    from celeborn_spark.queries.dedup import q_component_size_histogram
    from celeborn_spark.catalog import load_table

    rows = q_component_size_histogram(spark, sf_dir).collect()
    total = sum(r["group_size"] * r["n_components"] for r in rows)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert total == n_docs
    assert all(r["n_components"] > 0 for r in rows)
