"""Known-answer tests for the round-8 operators: KL divergence,
chi-square independence, Wilson interval, Kaplan-Meier survival,
neighbor Jaccard, RFM quintiles, n-gram novelty, sequential patterns.
Each pins hand-computed values on planted inputs; the oracle harness
(tests/test_queries_vs_oracle.py) separately pins DuckDB parity on the
real tables.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from celeborn_spark.operators.graph import neighbor_jaccard
from celeborn_spark.operators.stats import (
    chi_square_independence,
    kl_divergence,
    km_survival,
    wilson_interval,
)


# ---------- KL divergence ----------


def test_kl_identical_distributions_is_zero(spark):
    rows = [(g, w) for g in ("ref", "x") for w in ["a"] * 3 + ["b"] * 2]
    df = spark.createDataFrame(rows, ["g", "w"])
    out = {r.g: r.kl for r in kl_divergence(df, "g", "w", "ref").collect()}
    assert out == {"x": 0.0}


def test_kl_known_value(spark):
    # ref: a x4; x: a x1, b x3. V=2, n=4 both.
    # p_x = (2/6, 4/6); p_ref = (5/6, 1/6)
    rows = [("ref", "a")] * 4 + [("x", "a")] + [("x", "b")] * 3
    df = spark.createDataFrame(rows, ["g", "w"])
    want = round(
        (2 / 6) * math.log((2 / 6) / (5 / 6))
        + (4 / 6) * math.log((4 / 6) / (1 / 6)),
        6,
    )
    out = {r.g: r.kl for r in kl_divergence(df, "g", "w", "ref").collect()}
    assert out["x"] == want
    assert out["x"] > 0


def test_kl_absent_word_contributes(spark):
    # x never sees 'b': the c=0 smoothed term must still count
    rows = [("ref", "a"), ("ref", "b"), ("x", "a"), ("x", "a")]
    df = spark.createDataFrame(rows, ["g", "w"])
    # V=2; x: n=2, p=(3/4, 1/4); ref: n=2, p=(2/4, 2/4)
    want = round(
        0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5), 6
    )
    out = {r.g: r.kl for r in kl_divergence(df, "g", "w", "ref").collect()}
    assert out["x"] == want


# ---------- chi-square ----------


def test_chi_square_independent_table_is_zero(spark):
    # perfectly proportional 2x2 -> chi2 = 0
    rows = (
        [("r1", "c1")] * 10
        + [("r1", "c2")] * 20
        + [("r2", "c1")] * 30
        + [("r2", "c2")] * 60
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    out = chi_square_independence(df, "a", "b").collect()[0]
    assert out.chi2 == 0.0 and out.dof == 1 and out.n == 120


def test_chi_square_known_2x2(spark):
    # classic 2x2: [[10, 20], [30, 5]]
    rows = (
        [("r1", "c1")] * 10
        + [("r1", "c2")] * 20
        + [("r2", "c1")] * 30
        + [("r2", "c2")] * 5
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    n, r1, r2, c1, c2 = 65, 30, 35, 40, 25
    want = 0.0
    for o, r, c in ((10, r1, c1), (20, r1, c2), (30, r2, c1), (5, r2, c2)):
        e = r * c / n
        want += (o - e) ** 2 / e
    out = chi_square_independence(df, "a", "b").collect()[0]
    assert abs(out.chi2 - round(want, 4)) < 1e-9
    assert out.dof == 1


# ---------- Wilson interval ----------


def test_wilson_known_value(spark):
    # n=100, s=50, z=1.96: the textbook interval ~ (0.404, 0.596)
    rows = [("g", i < 50) for i in range(100)]
    df = spark.createDataFrame(rows, ["grp", "ok"])
    out = wilson_interval(df, "grp", "ok").collect()[0]
    z, n, p = 1.96, 100, 0.5
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert out.ci_lo == round(center - half, 6)
    assert out.ci_hi == round(center + half, 6)
    assert 0.40 < out.ci_lo < 0.41 and 0.59 < out.ci_hi < 0.60


def test_wilson_extreme_p_stays_in_unit_interval(spark):
    df = spark.createDataFrame([("g", True)] * 3, ["grp", "ok"])
    out = wilson_interval(df, "grp", "ok").collect()[0]
    # p-hat = 1 with n=3: normal approx would give hi > 1; Wilson not
    assert 0.0 <= out.ci_lo <= out.ci_hi <= 1.0
    assert out.ci_hi < 1.0 + 1e-12


# ---------- Kaplan-Meier survival ----------


def test_km_survival_hand_computed(spark):
    # durations: [1, 1, 2, 3] ->
    # t=1: n=4, d=2, S=2/4=0.5
    # t=2: n=2, d=1, S=0.5*1/2=0.25
    # t=3: n=1, d=1, S=0
    df = spark.createDataFrame([(1,), (1,), (2,), (3,)], ["t"])
    out = {r.t: r for r in km_survival(df, "t").collect()}
    assert out[1].n_at_risk == 4 and out[1].d_events == 2
    assert abs(out[1].survival - 0.5) < 1e-9
    assert out[2].n_at_risk == 2 and abs(out[2].survival - 0.25) < 1e-9
    assert out[3].survival == 0.0


def test_km_survival_monotone_nonincreasing(spark, sf_dir):
    from celeborn_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    durs = ev.groupBy("user_id").agg(
        F.datediff(
            F.max(F.col("ts")).cast("date"), F.min(F.col("ts")).cast("date")
        ).alias("t")
    )
    rows = km_survival(durs, "t").orderBy("t").collect()
    assert rows, "empty survival curve"
    last = 1.0 + 1e-12
    for r in rows:
        assert r.survival <= last + 1e-9
        last = r.survival
    assert rows[-1].survival == 0.0  # uncensored: everyone "churns"


# ---------- neighbor Jaccard ----------


def test_neighbor_jaccard_square_graph(spark):
    # cycle 1-2-3-4-1: non-edges (1,3) and (2,4), each with both
    # remaining nodes as common neighbors: jac = 2/(2+2-2) = 1.0
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], ["u", "v"])
    out = {(r.a, r.b): (r.n_common, r.jac) for r in neighbor_jaccard(e).collect()}
    assert out == {(1, 3): (2, 1.0), (2, 4): (2, 1.0)}


def test_neighbor_jaccard_excludes_existing_edges(spark):
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["u", "v"])
    # triangle: every 2-path endpoint pair is already an edge
    assert neighbor_jaccard(e).count() == 0


# ---------- RFM / novelty / seq patterns (query level) ----------


def test_rfm_bins_partition_customers(spark, sf_dir):
    from celeborn_spark.queries.curriculum import q_rfm_segments

    out = q_rfm_segments(spark, sf_dir)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0 <= r.r_bin <= 4 and 0 <= r.f_bin <= 4 and 0 <= r.m_bin <= 4
        assert r.rfm_code == r.r_bin * 100 + r.f_bin * 10 + r.m_bin
    # quintiles of a discrete value histogram: no bin may hold more
    # than the worst tie block + 1/5 of customers; sanity: >= 2 bins hit
    assert len({r.m_bin for r in rows}) >= 2


def test_ngram_novelty_bounds(spark, sf_dir):
    from celeborn_spark.queries.text import q_ngram_novelty

    rows = q_ngram_novelty(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert -1e-9 <= r.novel_frac <= 1.0 + 1e-9


def test_seq_pattern_counts_match_manual(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: a b c b c  -> trigrams a>b>c, b>c>b, c>b>c
    for i, t in enumerate(["a", "b", "c", "b", "c"]):
        rows.append((1, i, base + datetime.timedelta(minutes=i), t))
    # user 2: a b c -> a>b>c
    for i, t in enumerate(["a", "b", "c"]):
        rows.append((2, 100 + i, base + datetime.timedelta(minutes=i), t))
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type"])
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        df.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .select(F.concat_ws(">", "event_type", "t2", "t3").alias("p"))
    )
    got = {r.p: r.n for r in tri.groupBy("p").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"a>b>c": 2, "b>c>b": 1, "c>b>c": 1}


# ---------- Mann-Whitney U ----------


def test_mann_whitney_known_value(spark):
    from celeborn_spark.operators.stats import mann_whitney_u

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 2), ("b", 3), ("b", 4)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
    # sorted: 1(a) r1; {2a,2b} avg 2.5; {3a,3b} avg 4.5; 4(b) r6
    # Ra = 1 + 2.5 + 4.5 = 8; U = 8 - 6 = 2; mu = 4.5
    # ties = 2 blocks of t=2 -> 12; sigma2 = 9/12 * (7 - 12/30)
    import math

    sigma2 = 9 / 12 * (7 - 12 / 30)
    want_z = round((2 - 4.5) / math.sqrt(sigma2), 6)
    assert (r.n_a, r.n_b, r.u_stat) == (3, 3, 2.0)
    assert r.z == want_z


def test_mann_whitney_symmetry(spark):
    from celeborn_spark.operators.stats import mann_whitney_u

    rows = [("a", v) for v in (1, 5, 9, 13)] + [("b", v) for v in (2, 4, 6, 8)]
    df = spark.createDataFrame(rows, ["g", "v"])
    z_ab = mann_whitney_u(df, "g", "v", "a", "b").collect()[0].z
    z_ba = mann_whitney_u(df, "g", "v", "b", "a").collect()[0].z
    assert z_ab == -z_ba


# ---------- greedy max-coverage ----------


def test_coverage_select_greedy_order(spark):
    from celeborn_spark.operators.textops import coverage_select

    rows = (
        [(1, s) for s in "abc"]
        + [(2, s) for s in "ab"]
        + [(3, s) for s in "cd"]
    )
    df = spark.createDataFrame(rows, ["doc_id", "g"])
    out = {
        r.sel_rank: (r.doc_id, r.gain, r.covered_total)
        for r in coverage_select(df, k=2).collect()
    }
    # round 1: doc 1 covers {a,b,c} (gain 3); round 2: doc 2's shingles
    # are all covered (vanishes), doc 3 adds {d} (gain 1)
    assert out == {1: (1, 3, 3), 2: (3, 1, 4)}


def test_coverage_select_tiebreak_min_doc(spark):
    from celeborn_spark.operators.textops import coverage_select

    rows = [(7, "x"), (7, "y"), (3, "x"), (3, "y")]
    df = spark.createDataFrame(rows, ["doc_id", "g"])
    out = coverage_select(df, k=1).collect()
    assert [(r.doc_id, r.gain) for r in out] == [(3, 2)]


# ---------- seasonality / textrank smoke ----------


def test_seasonality_index_exact(spark):
    import datetime

    # 7 views Mon..Sun + 7 extra views on Monday: Monday index = 14/2
    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [("view", base + datetime.timedelta(days=d)) for d in range(7)]
    rows += [("view", base)] * 7
    df = spark.createDataFrame(rows, ["event_type", "ts"])
    counts = df.groupBy(
        "event_type", (F.weekday("ts") + 1).alias("isodow")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("n_t"))
    out = {
        r.isodow: r.dow_index
        for r in counts.join(totals, "event_type")
        .select(
            "isodow",
            ((F.col("n") * 7).cast("double") / F.col("n_t")).alias("dow_index"),
        )
        .collect()
    }
    assert out[1] == 4.0  # Monday: 8 of 14 events -> 8*7/14
    assert out[2] == 0.5


def test_textrank_symmetric_chain(spark):
    from celeborn_spark.operators.graph import pagerank

    # path graph a-b-c: middle node must outrank endpoints
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], ["src", "dst"]
    )
    pr = {r.node: r.pr for r in pagerank(edges, iters=3).collect()}
    assert pr["b"] > pr["a"] == pr["c"]


# ---------- property tests ----------


def test_kl_nonnegative_on_random_slices(spark):
    # smoothed distributions are proper -> KL >= 0 always
    import random

    rng = random.Random(8)
    rows = [
        (g, rng.choice("abcdefgh"))
        for g in ("ref", "x", "y", "z")
        for _ in range(rng.randint(5, 40))
    ]
    from celeborn_spark.operators.stats import kl_divergence

    df = spark.createDataFrame(rows, ["g", "w"])
    for r in kl_divergence(df, "g", "w", "ref").collect():
        assert r.kl >= 0.0, r


def test_coverage_gains_non_increasing(spark):
    # greedy coverage is submodular: marginal gains never increase
    import random

    rng = random.Random(11)
    rows = [
        (d, rng.randint(0, 30))
        for d in range(20)
        for _ in range(rng.randint(1, 15))
    ]
    from celeborn_spark.operators.textops import coverage_select

    df = spark.createDataFrame(rows, ["doc_id", "g"])
    out = sorted(
        coverage_select(df, k=6).collect(), key=lambda r: r.sel_rank
    )
    gains = [r.gain for r in out]
    assert gains == sorted(gains, reverse=True)
    assert out[-1].covered_total == sum(gains)


def test_km_survival_non_increasing(spark):
    import random

    rng = random.Random(5)
    rows = [(rng.randint(0, 12),) for _ in range(200)]
    from celeborn_spark.operators.stats import km_survival

    df = spark.createDataFrame(rows, ["t"])
    out = sorted(km_survival(df, "t").collect(), key=lambda r: r.t)
    survs = [r.survival for r in out]
    assert all(a >= b for a, b in zip(survs, survs[1:]))
    assert survs[-1] == 0.0  # no censoring: everyone eventually stops


def test_wilson_interval_brackets_p(spark):
    import random

    rng = random.Random(3)
    rows = [(g, rng.random() < 0.3 + 0.1 * g) for g in range(4) for _ in range(30)]
    from celeborn_spark.operators.stats import wilson_interval

    df = spark.createDataFrame(rows, ["g", "ok"])
    for r in wilson_interval(df, "g", "ok").collect():
        p = r.s / r.n
        assert 0.0 <= r.ci_lo <= p <= r.ci_hi <= 1.0, r
