"""Known-answer + property tests for the late-round-6 analytics
operators: incremental agg merge, co-occurrence lift, rolling anomaly,
EWMA trend, naive Bayes, Adamic–Adar, RRF fusion."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from celeborn_spark.operators.classify import naive_bayes_confusion
from celeborn_spark.operators.graph import adamic_adar
from celeborn_spark.operators.incremental import (
    agg_state,
    finalize_agg,
    merge_agg_states,
)
from celeborn_spark.operators.market import cooccurrence_lift
from celeborn_spark.operators.stats import ewma_trend, rolling_anomaly
from celeborn_spark.operators.textops import rrf_fuse, topk_ranks


# ---------- incremental aggregate maintenance ----------


def test_incremental_merge_equals_full_recompute(spark):
    rows = [(i % 7, float(i) + 0.25) for i in range(200)]
    df = spark.createDataFrame(rows, ["k", "v"])
    full = finalize_agg(agg_state(df, "k", "v"), "k")
    # arbitrary 3-way split, merged pairwise (associativity in action)
    a = df.filter(F.col("v") < 50)
    b = df.filter((F.col("v") >= 50) & (F.col("v") < 120))
    c = df.filter(F.col("v") >= 120)
    merged = merge_agg_states(
        merge_agg_states(agg_state(a, "k", "v"), agg_state(b, "k", "v"), "k"),
        agg_state(c, "k", "v"),
        "k",
    )
    got = {r["k"]: r.asDict() for r in finalize_agg(merged, "k").collect()}
    want = {r["k"]: r.asDict() for r in full.collect()}
    assert got == want


def test_incremental_merge_one_sided_keys_pass_through(spark):
    a = spark.createDataFrame([(1, 10.0), (1, 20.0)], ["k", "v"])
    b = spark.createDataFrame([(2, 5.0)], ["k", "v"])
    m = {
        r["k"]: r.asDict()
        for r in merge_agg_states(
            agg_state(a, "k", "v"), agg_state(b, "k", "v"), "k"
        ).collect()
    }
    assert m[1]["n_rows"] == 2 and m[1]["sum_cents"] == 3000
    assert m[1]["min_cents"] == 1000 and m[1]["max_cents"] == 2000
    assert m[2] == {"k": 2, "n_rows": 1, "sum_cents": 500, "min_cents": 500, "max_cents": 500}


def test_finalize_agg_halfway_tie_matches_duckdb(spark):
    """Regression for the repo's one driver correctness failure (r7):
    l_partkey=148 at sf0.01 has sum_cents=214062551 over n=32 rows →
    avg exactly 66894.5471875, a 6dp half-way point where Spark's
    BigDecimal HALF_UP round and DuckDB's binary-double round diverge.
    finalize_agg now emits an all-integer half-up avg_micro that both
    engines compute identically; this plants the exact tie and compares
    Spark against the oracle SQL in DuckDB."""
    import duckdb

    # 31 rows of 66894.00 + one of 66911.5471875... reconstruct exactly:
    # plant values whose floor(v*100) cents sum to 214062551 over 32 rows.
    cents = [6689454] * 31 + [214062551 - 31 * 6689454]
    rows = [(148, c / 100.0 + 0.001) for c in cents]  # +0.001 < 1 cent
    df = spark.createDataFrame(rows, ["k", "v"])
    out = finalize_agg(agg_state(df, "k", "v"), "k").collect()[0].asDict()
    assert out["sum_cents"] == 214062551 and out["n_rows"] == 32
    # exact half-up of 66894.5471875 at micro precision
    assert out["avg_micro"] == 66894547188

    from celeborn_spark.operators.incremental import incremental_agg_oracle_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k INTEGER, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = con.execute(incremental_agg_oracle_sql("t", "k", "v")).fetchdf()
    assert int(want["avg_micro"][0]) == out["avg_micro"]
    con.close()


def test_no_round_of_integer_ratio_lint():
    """Lint for the finalize_agg tie class (VERDICT r7 item 1): no
    operator/query source may apply F.round()/round() directly to a
    ratio whose numerator and denominator are both integer aggregates
    (count/sum-of-ints) — exact rationals hit half-way points where
    engines' rounding rules differ. Tie-safe form: all-integer half-up
    division `(p*2*10^k + q) div (2*q)`, then at most ONE IEEE division
    by a power of ten."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "celeborn_spark"
    # integer-valued column idioms used throughout the repo
    int_ratio = re.compile(
        r"round\(\s*(F\.col\(\"(n_|cnt|cum|total|sum_cents)|"
        r"(sum|count)\(\*?\)?.{0,40}/\s*(count\(|n_rows|n_spans|total))",
        re.IGNORECASE,
    )
    offenders = []
    for p in sorted(pkg.rglob("*.py")):
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if "round(" in line and int_ratio.search(line):
                offenders.append(f"{p.name}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)


def test_no_bare_bigint_decimal_division_lint():
    """Lint for the TPC-H q17 class (VERDICT r8 item 1): a BIGINT
    divided by a DECIMAL literal is *decimal division* in Spark SQL
    (result DECIMAL(38,6), truncated at 6 fractional digits) but
    full-precision DOUBLE division in DuckDB — values diverge wherever
    the exact quotient needs >6 decimal digits. Tie-safe form: CAST the
    integer dividend to DOUBLE first (same int64 through IEEE division
    is bit-identical in both engines). A division whose result feeds
    floor(...) then CAST(... AS BIGINT) is exempt: the output is
    integer-valued and the floor boundaries (multiples of the divisor)
    are exact in both engines' quotients."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "celeborn_spark"
    pat = re.compile(r"AS BIGINT\)\s*/\s*[0-9]+\.[0-9][0-9]*(.{0,24})", re.DOTALL)
    offenders = []
    for p in sorted(pkg.rglob("*.py")):
        text = p.read_text()
        for m in pat.finditer(text):
            tail = " ".join(m.group(1).split())
            if "AS BIGINT" in tail:  # floor(...)::BIGINT — integer-valued, exempt
                continue
            ln = text[: m.start()].count("\n") + 1
            offenders.append(f"{p.name}:{ln}: {' '.join(m.group(0).split())}")
    assert not offenders, "\n".join(offenders)


# ---------- market-basket co-occurrence ----------


def test_cooccurrence_known_answer(spark):
    # baskets: {A,B} x3, {A,C} x1, {B,C} x1, {A} x1 -> 6 baskets
    rows = (
        [(i, "A") for i in range(1, 6)]
        + [(i, "B") for i in (1, 2, 3, 5)]
        + [(4, "C"), (5, "C")]
    )
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {(r["item_a"], r["item_b"]): r.asDict() for r in
           cooccurrence_lift(df, "basket", "item", k=10).collect()}
    ab = out[("A", "B")]
    assert ab["n_both"] == 4 and ab["n_a"] == 5 and ab["n_b"] == 4
    # N=5 baskets total; lift = 4*5/(5*4) = 1.0
    assert ab["lift"] == 1.0
    assert ab["confidence_a_b"] == 4 / 5
    bc = out[("B", "C")]
    assert bc["n_both"] == 1 and bc["lift"] == (1 * 5) / (4 * 2)


def test_cooccurrence_dedups_within_basket(spark):
    # repeated item lines in one basket count once
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (1, "B"), (1, "B")], ["basket", "item"]
    )
    out = cooccurrence_lift(df, "basket", "item", k=5).collect()
    assert len(out) == 1 and out[0]["n_both"] == 1


# ---------- rolling anomaly ----------


def test_rolling_anomaly_flags_planted_spike(spark):
    # stable series then one big spike; lookback window never includes
    # the current point, so only the spike is anomalous
    vals = [10.0 + (i % 3) * 0.1 for i in range(30)] + [500.0] + [10.0] * 5
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["u", "t", "v"])
    out = rolling_anomaly(df, "u", ("t",), "v", lookback=16, k=3, min_n=8).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_events"] == 36
    # the spike itself + the first few post-spike points whose trailing
    # window now contains the spike may or may not flag; assert at least
    # the spike and no flood
    assert 1 <= r["n_anomalies"] <= 3


def test_rolling_anomaly_quiet_series_is_clean(spark):
    rows = [(1, i, 10.0 + (i % 5) * 0.2) for i in range(60)]
    df = spark.createDataFrame(rows, ["u", "t", "v"])
    r = rolling_anomaly(df, "u", ("t",), "v", lookback=16, k=3, min_n=8).collect()[0]
    assert r["n_anomalies"] == 0
    # first min_n points are unscored
    assert r["n_scored"] == 60 - 8


# ---------- EWMA ----------


def test_ewma_known_answer(spark):
    # 3 points: x = [100, 200, 400] cents = [10000, 20000, 40000]
    # at last point: num = 40000/2 + 20000/4 + 10000/8 = 26250
    # denom = 1 - 2^-3 = 0.875 -> ewma = 26250/0.875/100 = 300.0
    df = spark.createDataFrame(
        [(1, 0, 100.0), (1, 1, 200.0), (1, 2, 400.0)], ["u", "t", "v"]
    )
    r = ewma_trend(df, "u", ("t",), "v", span=8).collect()[0]
    assert r["n_events"] == 3
    assert r["ewma"] == 300.0


def test_ewma_constant_series_is_identity(spark):
    df = spark.createDataFrame([(1, i, 42.0) for i in range(20)], ["u", "t", "v"])
    r = ewma_trend(df, "u", ("t",), "v", span=8).collect()[0]
    assert r["ewma"] == 42.0


# ---------- naive Bayes ----------


def test_naive_bayes_separable_corpus_perfect_diagonal(spark):
    rows = []
    for i in range(10):
        rows.append((i, "apple banana apple", "fruit"))
        rows.append((100 + i, "carrot potato carrot", "veg"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = {(r["actual"], r["predicted"]): r["n_docs"]
           for r in naive_bayes_confusion(df, "doc_id", "text", "lang").collect()}
    assert out == {("fruit", "fruit"): 10, ("veg", "veg"): 10}


def test_naive_bayes_confusion_counts_sum_to_corpus(spark, sf_dir):
    from celeborn_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = naive_bayes_confusion(docs, "doc_id", "text", "lang").collect()
    assert sum(r["n_docs"] for r in out) == docs.count()


# ---------- Adamic–Adar ----------


def test_adamic_adar_square_graph(spark):
    # square a-b-c-d-a: non-edges (a,c) and (b,d), each with two common
    # neighbors of degree 2 -> score 2/ln(2)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"]
    )
    out = {(r["a"], r["b"]): r.asDict() for r in adamic_adar(edges, k=10).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    want = round(2 / math.log(2.0), 6)
    for v in out.values():
        assert v["n_common"] == 2 and abs(v["aa_score"] - want) < 1e-9


def test_adamic_adar_excludes_existing_edges(spark):
    # triangle + pendant: every wedge pair is already an edge except (c, p)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 9)], ["u", "v"]
    )
    out = adamic_adar(edges, k=10).collect()
    pairs = {(r["a"], r["b"]) for r in out}
    assert (1, 2) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs
    assert (2, 9) in pairs and (3, 9) in pairs


# ---------- RRF fusion ----------


def test_rrf_fusion_prefers_doubly_ranked(spark):
    r1 = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], ["id", "rnk"])
    r2 = spark.createDataFrame([(12, 1), (13, 2)], ["id", "rnk"])
    out = rrf_fuse([r1, r2], "id", c=60, k=10).collect()
    by_id = {r["id"]: r.asDict() for r in out}
    # 12 appears in both lists -> highest fused score, rank 1
    assert out[0]["id"] == 12 and out[0]["rnk"] == 1
    assert by_id[12]["n_lists"] == 2 and by_id[10]["n_lists"] == 1
    assert by_id[12]["rrf"] == 1.0 / 63 + 1.0 / 61


def test_topk_ranks_matches_window_ranking(spark):
    df = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(40)], ["id", "score"]
    )
    got = {r["id"]: r["rnk"] for r in topk_ranks(df, "id", "score", 10).collect()}
    want_rows = df.orderBy(F.col("score").desc(), F.col("id")).limit(10).collect()
    want = {r["id"]: i + 1 for i, r in enumerate(want_rows)}
    assert got == want


# --- item-item cosine neighbors (operators/market.item_neighbors) ---


def test_item_neighbors_known_cosines(spark):
    """Baskets {1:AB, 2:AB, 3:AC}: sim(A,B)=2/sqrt(3*2), sim(A,C)=
    1/sqrt(3*1); B ranks before C for A."""
    import math

    from celeborn_spark.operators.market import item_neighbors

    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    got = {
        (r.item, r.neighbor): (r.sim, r.rank)
        for r in item_neighbors(df, "basket", "item", k=5).collect()
    }
    assert abs(got[("A", "B")][0] - 2 / math.sqrt(6)) < 1e-12
    assert abs(got[("A", "C")][0] - 1 / math.sqrt(3)) < 1e-12
    assert got[("A", "B")][1] == 1 and got[("A", "C")][1] == 2
    # symmetry: sim(B, A) == sim(A, B)
    assert got[("B", "A")][0] == got[("A", "B")][0]


def test_item_neighbors_duplicate_lines_ignored(spark):
    """The same item twice in one basket counts once (distinct
    membership), so sims are unchanged by line duplication."""
    from celeborn_spark.operators.market import item_neighbors

    base = [(1, "A"), (1, "B")]
    df1 = spark.createDataFrame(base, ["basket", "item"])
    df2 = spark.createDataFrame(base + [(1, "A"), (1, "A")], ["basket", "item"])
    s1 = {(r.item, r.neighbor): r.sim for r in item_neighbors(df1, "basket", "item").collect()}
    s2 = {(r.item, r.neighbor): r.sim for r in item_neighbors(df2, "basket", "item").collect()}
    assert s1 == s2


def test_item_neighbors_topk_cuts(spark):
    from celeborn_spark.operators.market import item_neighbors

    rows = [(b, it) for b in range(4) for it in ("X", f"n{b}")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = item_neighbors(df, "basket", "item", k=2)
    assert out.filter(F.col("item") == "X").count() == 2


# --- decision stump (operators/classify.decision_stump) ---


def test_stump_perfect_split(spark):
    """Labels exactly x <= 5: the stump finds threshold 5 with a
    perfect confusion matrix and accuracy 1.0."""
    from celeborn_spark.operators.classify import decision_stump

    df = spark.createDataFrame(
        [(x, x <= 5) for x in range(1, 11) for _ in range(3)], ["x", "y"]
    )
    out = decision_stump(df, "x", F.col("y")).collect()[0]
    assert out.threshold == 5
    assert out.fp == 0 and out.fn == 0
    assert out.accuracy == 1.0


def test_stump_independent_feature_scores_zero(spark):
    """A label independent of x (y alternates within every x) gives
    split_score 0 at the best (= smallest, by tiebreak) threshold."""
    from celeborn_spark.operators.classify import decision_stump

    rows = [(x, par == 0) for x in range(1, 6) for par in (0, 1)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = decision_stump(df, "x", F.col("y")).collect()[0]
    assert out.split_score == 0
    assert out.threshold == 1  # all ties -> smallest threshold


def test_stump_inverse_rule_still_detected(spark):
    """Association magnitude |TP*TN - FP*FN| detects a NEGATIVE rule
    (positives at HIGH x) just as strongly — the stump reports the
    boundary even though the <= rule inverts the labels."""
    from celeborn_spark.operators.classify import decision_stump

    df = spark.createDataFrame(
        [(x, x > 7) for x in range(1, 11) for _ in range(2)], ["x", "y"]
    )
    out = decision_stump(df, "x", F.col("y")).collect()[0]
    assert out.threshold == 7 and out.split_score > 0
