"""Known-answer test for q_map_funcs — the MapType function family
(map_from_entries / transform_values / map_filter round-trip).
DuckDB parity is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations


def test_map_funcs_roundtrip_semantics(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a a a b c c")], ["doc_id", "text"]
    )
    toks = df.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("tok")
    )
    counted = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    mapped = counted.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("tok", "n"))
        ).alias("m")
    )
    out = {
        r["tok"]: (r["n"], r["n_sq"])
        for r in mapped.select(
            "doc_id",
            F.explode(
                F.map_filter(
                    F.transform_values(
                        "m",
                        lambda k, v: F.struct(
                            v.alias("n"), (v * v).alias("n_sq")
                        ),
                    ),
                    lambda k, v: v["n"] >= 2,
                )
            ).alias("tok", "e"),
        )
        .select("tok", F.col("e.n").alias("n"), F.col("e.n_sq").alias("n_sq"))
        .collect()
    }
    # 'b' (n=1) filtered out; squares correct
    assert out == {"a": (3, 9), "c": (2, 4)}


def test_map_funcs_query_filters_singletons(spark, sf_dir):
    from celeborn_spark.queries.scalar import q_map_funcs

    rows = q_map_funcs(spark, sf_dir).limit(500).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n"] >= 2 and r["n_sq"] == r["n"] * r["n"]
