"""Known-answer tests for the round-9 fourteenth batch: Church-Gale
token burstiness (operators/textops.py) and the int8 quantized-search
recall QA (queries/similarity.py). DuckDB parity on the real tables
is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math

from celeborn_spark.operators.textops import token_burstiness


def test_burstiness_hand_values(spark):
    # 'hot' appears 6 times in ONE doc of 3; 'flat' once per doc.
    docs = [
        (1, "hot hot hot hot hot hot flat"),
        (2, "flat x x x x x"),
        (3, "flat y y y y y"),
    ]
    out = {
        r["tok"]: r
        for r in token_burstiness(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            "text",
            min_cf=3,
        ).collect()
    }
    hot, flat = out["hot"], out["flat"]
    assert hot["cf"] == 6 and hot["df"] == 1
    assert flat["cf"] == 3 and flat["df"] == 3
    assert hot["mean_per_doc"] == 6.0 and flat["mean_per_doc"] == 1.0
    # Poisson null: E[df] for cf=6, N=3 is 3(1-e^-2) ~ 2.594 -> the
    # bursty token sits far below 1; the flat token sits above
    assert hot["df_over_poisson"] < 0.5
    assert flat["df_over_poisson"] > 1.0
    exp_hot = 1 / (3 * (1 - math.exp(-2.0)))
    assert abs(hot["df_over_poisson"] - round(exp_hot, 6)) < 1e-9


def test_burstiness_min_cf_filters(spark):
    docs = [(1, "a a b")]
    out = token_burstiness(
        spark.createDataFrame(docs, ["doc_id", "text"]), "text", min_cf=2
    ).collect()
    assert {r["tok"] for r in out} == {"a"}


def test_quantized_recall_bounds_and_quality(spark, sf_dir):
    from celeborn_spark.queries.similarity import q_quantized_recall

    rows = q_quantized_recall(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["k"] == 10 and 0 <= r["n_match"] <= 10
        assert abs(r["recall_at_10"] - r["n_match"] / 10) < 1e-12
    # int8 min-max is a gentle 4x compression: recall should be high
    avg = sum(r["recall_at_10"] for r in rows) / len(rows)
    assert avg >= 0.7
