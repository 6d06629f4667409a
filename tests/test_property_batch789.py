"""Property-based differentials for the round-9 batch-7/8/9 operators
vs pure-Python references (the repo's hypothesis pattern): log-rank vs
an explicit per-duration loop, Good-Turing's mass identity, RAKE vs a
direct phrase-split reference, Cohen's kappa vs the po/pe textbook
form, MCC vs the direct formula, the waterfill conservation laws, and
homophily vs a direct mixing-matrix computation.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from celeborn_spark.operators.curriculum import mixture_waterfill
from celeborn_spark.operators.graph import attribute_assortativity
from celeborn_spark.operators.stats import cohens_kappa, log_rank_test
from celeborn_spark.operators.textops import good_turing, rake_word_scores

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------- log-rank vs explicit loop ----------


def _log_rank_ref(subjects):
    """Textbook per-duration loop over (group, t) subjects."""
    times = sorted({t for _, t in subjects})
    n1 = sum(1 for g, _ in subjects if g == 1)
    n2 = len(subjects) - n1
    o1 = e1 = v = 0.0
    for t in times:
        d1 = sum(1 for g, tt in subjects if g == 1 and tt == t)
        d2 = sum(1 for g, tt in subjects if g == 2 and tt == t)
        n = n1 + n2
        d = d1 + d2
        if n > 1:
            v += (d * n1 / n) * (n2 / n) * ((n - d) / (n - 1))
        e1 += d * n1 / n
        o1 += d1
        n1 -= d1
        n2 -= d2
    return o1, e1, v


@given(
    st.lists(
        st.tuples(st.sampled_from([1, 2]), st.integers(0, 6)),
        min_size=2,
        max_size=24,
    ).filter(
        lambda s: any(g == 1 for g, _ in s) and any(g == 2 for g, _ in s)
    )
)
@settings(**_SETTINGS)
def test_log_rank_matches_reference_loop(spark, subjects):
    out = log_rank_test(
        spark.createDataFrame(subjects, ["g", "t"]), "g", "t", 1, 2
    ).collect()[0]
    o1, e1, v = _log_rank_ref(subjects)
    assert out["o_a"] == o1
    assert abs(out["e_a"] - round(e1, 6)) < 1e-6
    assert abs(out["v_stat"] - round(v, 6)) < 1e-6
    if v > 0:
        assert abs(out["chi2"] - round((o1 - e1) ** 2 / v, 6)) < 1e-5


# ---------- Good-Turing mass identity ----------


@given(
    st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=40)
)
@settings(**_SETTINGS)
def test_good_turing_mass_identity(spark, toks):
    # sum over observed r of r*N_r = corpus mass; and wherever r* is
    # defined, r*·N_r = (r+1)·N_{r+1} exactly (the GT redistribution)
    df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    rows = good_turing(df, "text").collect()
    counts = Counter(toks)
    coc = Counter(counts.values())
    mass = sum(counts.values())
    assert sum(r["r"] * r["n_r"] for r in rows) == mass
    for r in rows:
        if r["r_star"] is not None:
            assert (
                abs(r["r_star"] * r["n_r"] - (r["r"] + 1) * coc[r["r"] + 1])
                < 1e-9
            )
        assert abs(r["p_unseen"] - coc.get(1, 0) / mass) < 1e-12


# ---------- RAKE vs direct reference ----------


def _rake_ref(docs, stops):
    deg = Counter()
    freq = Counter()
    for text in docs:
        phrase = []
        for tok in text.split() + ["<STOP>"]:
            if tok in stops or tok == "<STOP>":
                for w in phrase:
                    deg[w] += len(phrase)
                    freq[w] += 1
                phrase = []
            else:
                phrase.append(tok)
    return {w: (deg[w], freq[w]) for w in freq}


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "the", "x", "y", "z", "w"]),
            min_size=1,
            max_size=12,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_rake_matches_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["word"]: (r["deg"], r["freq"])
        for r in rake_word_scores(df, "text", ("a", "the"), k=100).collect()
    }
    assert got == _rake_ref(texts, {"a", "the"})


# ---------- Cohen's kappa vs textbook po/pe ----------


@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 1)),
        min_size=2,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_kappa_matches_po_pe_form(spark, pairs):
    out = cohens_kappa(
        spark.createDataFrame(pairs, ["r1", "r2"]), "r1", "r2"
    ).collect()[0]
    n = len(pairs)
    a = sum(1 for x, y in pairs if x == 1 and y == 1)
    b = sum(1 for x, y in pairs if x == 1 and y == 0)
    c = sum(1 for x, y in pairs if x == 0 and y == 1)
    d = n - a - b - c
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    if pe == 1.0:
        assert out["kappa"] is None
    else:
        assert abs(out["kappa"] - (po - pe) / (1 - pe)) < 1e-9
    # bounds
    if out["kappa"] is not None:
        assert -1.0 - 1e-9 <= out["kappa"] <= 1.0 + 1e-9


# ---------- waterfill conservation ----------


@given(
    st.lists(st.integers(1, 20), min_size=1, max_size=8),
    st.integers(0, 60),
)
@settings(**_SETTINGS)
def test_waterfill_conservation_and_caps(spark, sizes, budget):
    rows = [(f"g{i:02d}",) for i, n in enumerate(sizes) for _ in range(n)]
    out = mixture_waterfill(
        spark.createDataFrame(rows, ["g"]), "g", budget=budget
    ).collect()
    total = sum(r["alloc"] for r in out)
    assert total == min(budget, sum(sizes))
    k = len(out)
    base = budget // k
    for r in out:
        assert 0 <= r["alloc"] <= r["n_docs"]
        # quota floor: the refill never takes from anyone's base quota
        assert r["alloc"] >= min(r["n_docs"], base)


# ---------- homophily vs direct mixing matrix ----------


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=15,
    ),
    st.integers(2, 3),
)
@settings(**_SETTINGS)
def test_homophily_matches_mixing_matrix(spark, raw_edges, n_attrs):
    edges = sorted({(min(u, v), max(u, v)) for u, v in raw_edges})
    nodes = sorted({x for e in edges for x in e})
    attr = {x: f"a{x % n_attrs}" for x in nodes}
    out = attribute_assortativity(
        spark.createDataFrame(edges, ["u", "v"]),
        spark.createDataFrame(
            [(x, attr[x]) for x in nodes], ["node", "attr"]
        ),
    ).collect()[0]
    # direct Newman computation on the directed mixing matrix
    t = 2 * len(edges)
    c = 2 * sum(1 for u, v in edges if attr[u] == attr[v])
    stubs = defaultdict(int)
    for u, v in edges:
        stubs[attr[u]] += 1
        stubs[attr[v]] += 1
    s2 = sum(s * s for s in stubs.values())
    assert out["n_edges"] == len(edges)
    if t * t == s2:
        assert out["assortativity"] is None
    else:
        assert abs(out["assortativity"] - (c * t - s2) / (t * t - s2)) < 1e-12
