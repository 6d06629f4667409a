from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
    uniform_sample,
)


def test_hash_sample_deterministic_and_sized(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    s1 = hash_sample(li, "l_orderkey", 0.2)
    s2 = hash_sample(li, "l_orderkey", 0.2)
    assert s1.count() == s2.count()
    # all lineitems of a sampled order are kept together (key-based)
    orders_in = {r.l_orderkey for r in s1.select("l_orderkey").distinct().collect()}
    full_counts = {
        r.l_orderkey: r.n
        for r in li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got_counts = {
        r.l_orderkey: r.n
        for r in s1.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(got_counts[k] == full_counts[k] for k in orders_in)
    # fraction roughly holds at the ORDER level (keys are sampled, and
    # rows-per-order varies, so row-level fraction is noisier)
    frac = len(orders_in) / len(full_counts)
    assert 0.1 < frac < 0.3, frac


def test_uniform_sample_fraction(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    s = uniform_sample(li, 0.25).count()
    assert 0.15 * n < s < 0.35 * n


def test_stratified_sample_respects_fractions(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    fr = {"O": 0.5, "F": 0.1, "P": 1.0}
    s = stratified_sample(o, "o_orderstatus", fr)
    full = {r.o_orderstatus: r.n for r in
            o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.o_orderstatus: r.n for r in
           s.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, f in fr.items():
        if k in full and full[k] >= 20:
            ratio = got.get(k, 0) / full[k]
            assert abs(ratio - f) < 0.25, (k, ratio, f)


def test_weighted_sample_prefers_heavy_rows(spark):
    from celeborn_spark.operators.sampling import weighted_sample_topk
    from pyspark.sql import functions as F

    # 500 light rows (w=1) + 500 heavy rows (w=100): heavy rows should
    # dominate the top-k overwhelmingly
    df = spark.range(1000).select(
        F.col("id").alias("key"),
        F.when(F.col("id") < 500, F.lit(1)).otherwise(F.lit(100)).alias("w"),
    )
    top = weighted_sample_topk(df, "key", "w", k=100).collect()
    n_heavy = sum(1 for r in top if r.key >= 500)
    assert n_heavy >= 90, f"heavy rows underrepresented: {n_heavy}/100"
    # deterministic across calls
    again = weighted_sample_topk(df, "key", "w", k=100).collect()
    assert [r.key for r in top] == [r.key for r in again]


def test_epoch_shuffle_is_permutation(spark, sf_dir):
    """Every doc appears exactly once; positions are contiguous
    0..k-1 within each shard; a different epoch produces a genuinely
    different order while keeping the same invariants."""
    from pyspark.sql import functions as F

    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.sampling import epoch_shuffle

    d = load_table(spark, sf_dir, "documents")
    n = d.count()
    for epoch in (0, 1):
        out = epoch_shuffle(d, "doc_id", n_shards=8, epoch=epoch)
        rows = out.collect()
        assert len(rows) == n
        assert len({r.doc_id for r in rows}) == n
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r.shard_id, []).append(r.pos)
        assert set(by_shard) <= set(range(8))
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(len(poss))), shard
    a = {(r.doc_id): (r.shard_id, r.pos)
         for r in epoch_shuffle(d, "doc_id", 8, epoch=0).collect()}
    b = {(r.doc_id): (r.shard_id, r.pos)
         for r in epoch_shuffle(d, "doc_id", 8, epoch=1).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > n * 0.9  # epochs decorrelate the layout

    import pytest

    with pytest.raises(ValueError):
        epoch_shuffle(d, "doc_id", n_shards=0)


def test_epoch_shuffle_matches_python_md5_reference(spark):
    """Differential: (shard_id, pos) must equal a direct Python md5
    computation for every row — pins the exact hash-input format
    ('id:epoch') and the hex->int shard arithmetic."""
    import hashlib

    from celeborn_spark.operators.sampling import epoch_shuffle

    ids = list(range(200))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: (r.shard_id, r.pos)
        for r in epoch_shuffle(df, "doc_id", n_shards=4, epoch=9).collect()
    }

    keyed = [
        (hashlib.md5(f"{i}:9".encode()).hexdigest()[:8], i) for i in ids
    ]
    want: dict[int, tuple[int, int]] = {}
    by_shard: dict[int, list[tuple[str, int]]] = {}
    for k, i in keyed:
        by_shard.setdefault(int(k, 16) % 4, []).append((k, i))
    for shard, rows in by_shard.items():
        for pos, (_, i) in enumerate(sorted(rows)):
            want[i] = (shard, pos)
    assert got == want


# --- temporal split (operators/sampling.temporal_split) ---


def test_temporal_split_embargo_gap_dropped(spark):
    from celeborn_spark.operators.sampling import temporal_split

    rows = [
        (1, "2024-01-01 00:00:00"),   # train
        (2, "2024-01-19 23:59:59"),   # train
        (3, "2024-01-20 00:00:00"),   # embargo (dropped)
        (4, "2024-01-20 23:59:59"),   # embargo (dropped)
        (5, "2024-01-21 00:00:00"),   # test
    ]
    df = spark.createDataFrame(rows, ["id", "s"]).select(
        "id", F.to_timestamp("s").alias("ts")
    )
    got = {r.id: r.split for r in temporal_split(
        df, "ts", "2024-01-20 00:00:00", embargo_hours=24
    ).collect()}
    assert got == {1: "train", 2: "train", 5: "test"}


def test_temporal_split_zero_embargo_keeps_all(spark):
    from celeborn_spark.operators.sampling import temporal_split

    df = spark.createDataFrame(
        [(1, "2024-01-19 00:00:00"), (2, "2024-01-20 00:00:00")], ["id", "s"]
    ).select("id", F.to_timestamp("s").alias("ts"))
    out = temporal_split(df, "ts", "2024-01-20 00:00:00", embargo_hours=0)
    assert out.count() == 2


def test_feature_hashing_fixed_width_and_signed(spark):
    """Any vocabulary maps into exactly n_features columns; a doc's
    vector is the signed sum of its tokens' hash contributions (two
    copies of a token double its contribution)."""
    from celeborn_spark.operators.textops import feature_hashing

    df = spark.createDataFrame([(1, "zebra zebra"), (2, "zebra")], ["doc_id", "text"])
    rows = {r.doc_id: [r[f"f{j}"] for j in range(8)] for r in
            feature_hashing(df, "doc_id", "text", n_features=8).collect()}
    assert len(rows[1]) == 8
    assert rows[1] == [2 * x for x in rows[2]]
    assert sum(abs(x) for x in rows[2]) == 1  # one token -> one signed unit


# --- rendezvous hashing (operators/sampling.rendezvous_assign) ---


def test_rendezvous_relocation_bounded(spark):
    """Growing the ring n -> n+1 relocates ~1/(n+1) of keys — the
    consistent-hashing property mod-hashing lacks (mod moves ~n/(n+1))."""
    from celeborn_spark.operators.sampling import rendezvous_assign

    df = spark.range(0, 1000).select(F.col("id").alias("k"))
    a = {r.k: r.shard for r in rendezvous_assign(df, "k", 5).collect()}
    b = {r.k: r.shard for r in rendezvous_assign(df, "k", 6).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved / 1000 < 0.30  # expect ~1/6 ~= 0.167; mod would be ~0.83
    # survivors keep their EXACT shard (only new-shard winners move)
    assert all(b[k] == a[k] or b[k] == 5 for k in a)


def test_rendezvous_balanced_and_deterministic(spark):
    from celeborn_spark.operators.sampling import rendezvous_assign

    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    out = rendezvous_assign(df, "k", 4)
    sizes = {r.shard: r.n for r in out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) < 2 * min(sizes.values())
    again = rendezvous_assign(df, "k", 4)
    assert out.exceptAll(again).count() == 0


# --- dense id assignment (operators/sampling.assign_dense_ids) ---


def test_dense_ids_contiguous_and_unique(spark):
    from celeborn_spark.operators.sampling import assign_dense_ids

    df = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    out = assign_dense_ids(df, "k", n_buckets=16)
    ids = sorted(r.row_id for r in out.collect())
    assert ids == list(range(500))


def test_dense_ids_partition_layout_invariant(spark):
    from celeborn_spark.operators.sampling import assign_dense_ids

    df = spark.range(0, 300).select(F.col("id").alias("k"))
    a = sorted((r.k, r.row_id) for r in assign_dense_ids(df.coalesce(1), "k").collect())
    b = sorted((r.k, r.row_id) for r in assign_dense_ids(df.repartition(16), "k").collect())
    assert a == b
