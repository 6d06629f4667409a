"""Connected components vs a driver-side union-find on the same pairs
(small inputs only — the Spark op never collects)."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import dedup as D
from celeborn_spark.operators.components import connected_components, dedup_groups


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_cc_matches_union_find(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (3, 4)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    want = _union_find(pairs)
    assert got == want


def test_cc_chain_needs_multiple_rounds(spark):
    # a 12-long path: min label must propagate end to end
    pairs = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r.vertex: r.component for r in connected_components(df, max_iter=20).collect()}
    assert set(got.values()) == {0}


def test_dedup_groups_over_lsh_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.verified_lsh_dedup(docs, "doc_id", "text", 3, 32, 8, 0.8)
    groups = dedup_groups(pairs)
    rows = groups.collect()
    if rows:  # every component id is a member of its own group
        comps = {r.component for r in rows}
        vertices = {r.vertex for r in rows}
        assert comps <= vertices
        assert all(r.group_size >= 2 for r in rows)
        want = _union_find([(r.id_a, r.id_b) for r in pairs.collect()])
        got = {r.vertex: r.component for r in rows}
        assert got == want


def test_leakage_safe_split_never_splits_a_group(spark, sf_dir):
    """The whole point of group-keyed splitting: no near-dup pair may
    straddle train/eval."""
    from pyspark.sql import functions as F

    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators import dedup as D
    from celeborn_spark.queries.dedup import q_leakage_safe_split

    split = q_leakage_safe_split(spark, sf_dir).select("doc_id", "split")
    pairs = D.jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )
    a = split.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa")
    b = split.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb")
    leaks = pairs.join(a, "id_a").join(b, "id_b").filter(F.col("sa") != F.col("sb"))
    assert leaks.count() == 0
    # and the split covers every document exactly once
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert split.count() == n_docs
    assert split.select("doc_id").distinct().count() == n_docs
