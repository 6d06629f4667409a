"""IVF ANN recall vs the exact brute-force result, and plan checks for
the broadcast-query design."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import similarity as S


def _queries(emb, n=5):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb)
    exact = S.brute_force_topk(emb, q, k=10).collect()
    centroids = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    approx = S.ivf_topk(emb, q, centroids, k=10).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hit = total = 0
    for r in approx:
        total += 1
        if r.vec_id in exact_sets.get(r.query_id, set()):
            hit += 1
    assert total > 0
    # nprobe=1 IVF on random embeddings: expect moderate recall, not zero
    assert hit / total >= 0.2, f"IVF recall suspiciously low: {hit}/{total}"


def test_brute_force_is_broadcast(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    plan = S.brute_force_topk(emb, _queries(emb), k=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan[:2000]


def test_cosine_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(10)
    df = emb.select(
        S.cosine(S.as_double_array("embedding"), S.as_double_array("embedding")).alias("c")
    )
    for r in df.collect():
        assert abs(r.c - 1.0) < 1e-9


def test_embedding_near_dup_recall_vs_brute_force(spark, sf_dir):
    """Signature-bucketed near-dup must be a subset of the exact
    all-pairs result (verify stage is exact) and find the planted
    exact duplicates (identical vectors share every bit)."""
    from pyspark.sql import functions as F2

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    copies = emb.select((F2.col("vec_id") + 1_000_000).alias("vec_id"),
                        "embedding", "label")
    with_dups = emb.unionByName(copies)
    pairs = S.embedding_near_dup_pairs(with_dups, bits=12, threshold=0.999)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    want = {(r.vec_id, r.vec_id + 1_000_000) for r in emb.select("vec_id").collect()}
    missing = want - found
    assert not missing, f"planted duplicates missed: {sorted(missing)[:5]}"


def test_near_dup_query_recall_column(spark, sf_dir):
    """q_embedding_near_dup's rows-only output carries its own sampled
    recall claim — every emitted row must say sampled_recall_ok=true,
    and the bound columns of q_approx_stats must all hold."""
    from celeborn_spark.queries.advanced import q_approx_stats
    from celeborn_spark.queries.similarity import q_embedding_near_dup

    rows = q_embedding_near_dup(spark, sf_dir).collect()
    assert all(r.sampled_recall_ok for r in rows)
    stats = q_approx_stats(spark, sf_dir).collect()
    assert stats and all(r.hll_within_5pct and r.median_in_p45_p55 for r in stats)


def test_ivf_multiprobe_recall_with_bounded_scan(spark):
    """nprobe=3 must recover >=0.9 of the exact top-k while touching
    <20% of the vectors (20 cells, 3 probed). Clustered synthetic data:
    the honest regime for IVF — real embedding corpora are clustered,
    and the centroid table is built from the true centers."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_clusters, per_cluster, dim = 20, 40, 16
    centers = rng.normal(size=(n_clusters, dim))
    rows, centroid_rows = [], []
    for c in range(n_clusters):
        centroid_rows.append((c, [float(x) for x in centers[c]]))
        for i in range(per_cluster):
            v = centers[c] + 0.15 * rng.normal(size=dim)
            rows.append((c * per_cluster + i + 100, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        centroid_rows, "centroid_id long, centroid_vec array<double>"
    )
    q = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    exact = S.brute_force_topk(emb, q, k=10).collect()
    approx = S.ivf_topk(emb, q, cents, k=10, n_probe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    hit = sum(1 for r in approx if r.vec_id in exact_sets.get(r.query_id, set()))
    total = sum(len(s) for s in exact_sets.values())
    assert hit / total >= 0.9, f"multi-probe recall {hit}/{total}"

    # scan-fraction bound: probed cells cover < 20% of the vector table
    v_cells = S.ivf_assign(emb, cents)
    q_cells = S.ivf_assign(
        q.select(F.col("query_id").alias("vec_id"),
                 F.col("query_vec").alias("embedding")),
        cents, n_probe=3,
    ).select(F.col("vec_id").alias("query_id"), "centroid_id")
    touched = v_cells.join(q_cells, "centroid_id").count()
    n_vec, n_q = emb.count(), q.count()
    assert touched / (n_vec * n_q) < 0.2, f"scanned {touched}/{n_vec * n_q}"


def test_quantize_embeddings_codes_and_constant_dim(spark):
    """Min lands on code 0, max on 255, midpoint half-up; a constant
    dimension codes to 0 instead of dividing by zero."""
    df = spark.createDataFrame(
        [(1, [0.0, 7.0]), (2, [2.0, 7.0]), (3, [4.0, 7.0])],
        "vec_id long, embedding array<float>",
    )
    out = {(r.vec_id, r.pos): r.q for r in S.quantize_embeddings(df).collect()}
    assert out[(1, 0)] == 0 and out[(3, 0)] == 255
    assert out[(2, 0)] == 128  # floor(255*0.5 + 0.5)
    assert out[(1, 1)] == out[(2, 1)] == out[(3, 1)] == 0


# --- knn_join (operators/similarity.knn_join) ---


def _knn_centroids(emb):
    from celeborn_spark.queries.similarity import CENTROID_STEP

    return emb.filter(F.col("vec_id") % CENTROID_STEP == 0).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )


def test_knn_join_shape_and_no_self_pairs(spark, sf_dir):
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_join(emb, _knn_centroids(emb), k=5, n_probe=3).localCheckpoint()
    assert out.filter(F.col("query_id") == F.col("vec_id")).count() == 0
    per_q = out.groupBy("query_id").count()
    assert per_q.filter(F.col("count") > 5).count() == 0
    assert out.select("query_id").distinct().count() == emb.count()


def test_knn_join_recall_vs_brute_force(spark):
    """kNN join recovers >= 90% of exact top-5 pairs on CLUSTERED data
    (20 true cells, 3 probed) — the honest IVF regime: real embedding
    corpora are clustered; the unclustered-noise regime is covered by
    the exact oracle parity of q_knn_join, where the oracle replicates
    the same pruning decisions."""
    import numpy as np

    from celeborn_spark.operators.similarity import (
        as_double_array,
        cosine,
        knn_join,
    )
    from pyspark.sql.window import Window as W

    rng = np.random.default_rng(11)
    n_clusters, per_cluster, dim = 20, 30, 16
    centers = rng.normal(size=(n_clusters, dim))
    rows, centroid_rows = [], []
    for c in range(n_clusters):
        centroid_rows.append((c, [float(x) for x in centers[c]]))
        for i in range(per_cluster):
            v = centers[c] + 0.15 * rng.normal(size=dim)
            rows.append((c * per_cluster + i + 100, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        centroid_rows, "centroid_id long, centroid_vec array<double>"
    )
    approx = knn_join(emb, cents, k=5, n_probe=3)
    v = emb.select("vec_id", as_double_array("embedding").alias("v"))
    exact = (
        v.alias("a")
        .crossJoin(v.alias("b"))
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_x"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cos_x").desc(), F.col("vec_id")
                )
            ),
        )
        .filter(F.col("rnk") <= 5)
    )
    n_exact = exact.count()
    n_hit = exact.join(
        approx.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi"
    ).count()
    assert n_hit >= 0.9 * n_exact, (n_hit, n_exact)


def test_knn_join_planted_twin_is_top_neighbor(spark, sf_dir):
    """A cloned vector must surface its twin at rank 1, cosine ~1."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    twin = emb.filter(F.col("vec_id") == 7).select(
        F.lit(999983).alias("vec_id"), "embedding", "label"
    )
    planted = emb.unionByName(twin)
    out = knn_join(planted, _knn_centroids(planted), k=5, n_probe=3)
    [r] = out.filter((F.col("query_id") == 999983) & (F.col("rnk") == 1)).collect()
    assert r.vec_id == 7 and r.cosine >= 0.999999


# --- product quantization (operators/similarity.pq_encode) ---


def test_pq_codes_shape_and_distortion_positive(spark, sf_dir):
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.similarity import pq_encode, sampled_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_encode(emb, sampled_codebooks(emb, m=4, step=100), m=4).localCheckpoint()
    assert out.count() == emb.count()
    assert out.filter(F.size("codes") != 4).count() == 0
    assert out.filter(F.col("recon_err") < 0).count() == 0


def test_pq_codeword_vectors_have_zero_distortion(spark, sf_dir):
    """A vector that IS a codebook source reconstructs itself exactly:
    every subspace picks its own codeword at distance 0."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.similarity import pq_encode, sampled_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_encode(emb, sampled_codebooks(emb, m=4, step=100), m=4)
    sources = out.filter(F.col("vec_id") % 100 == 0).collect()
    assert sources
    for r in sources:
        assert r.recon_err == 0.0
        assert list(r.codes) == [r.vec_id] * 4


def test_pq_distortion_shrinks_with_codebook_density(spark, sf_dir):
    """More codewords -> lower total distortion (monotone in k)."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.similarity import pq_encode, sampled_codebooks

    emb = load_table(spark, sf_dir, "embeddings")
    coarse = (
        pq_encode(emb, sampled_codebooks(emb, m=4, step=200), m=4)
        .agg(F.sum("recon_err"))
        .collect()[0][0]
    )
    fine = (
        pq_encode(emb, sampled_codebooks(emb, m=4, step=50), m=4)
        .agg(F.sum("recon_err"))
        .collect()[0][0]
    )
    assert fine < coarse


def test_pq_vs_oracle(spark, sf_dir):
    from celeborn_spark import registry
    from tests.oracle import assert_matches_oracle, duck_connection

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        registry.queries()["q_pq_encode"](spark, sf_dir),
        con,
        registry.oracles()["q_pq_encode"],
        "q_pq_encode",
    )


# --- MMR diversified selection (operators/similarity.mmr_select) ---


def test_mmr_skips_near_duplicate_of_selected(spark):
    """Query q = e1. Candidates: a ~= q (best), a' a clone of a, b
    orthogonal-ish. Plain top-2 = {a, a'}; MMR(lam=.5) must pick a then
    b — the clone's redundancy penalty (~1.0) beats its relevance."""
    from celeborn_spark.operators.similarity import mmr_select

    rows = [
        (1, [1.0, 0.05, 0.0]),   # a: closest to q
        (2, [1.0, 0.06, 0.0]),   # a': near-clone of a (cos ~ 0.99995)
        (3, [1.0, -0.5, 0.0]),   # b: still relevant, angularly distinct
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], ["vec_id", "embedding"])
    got = {
        r.mmr_rank: r.vec_id for r in mmr_select(vecs, q, k=2).collect()
    }
    assert got[1] == 1 and got[2] == 3


def test_mmr_lam_one_is_plain_topk(spark):
    """lam=1 disables the diversity term: picks are relevance order."""
    from celeborn_spark.operators.similarity import mmr_select

    rows = [(i, [1.0, 0.01 * i, 0.0]) for i in range(1, 5)]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], ["vec_id", "embedding"])
    out = sorted(
        (r.mmr_rank, r.vec_id) for r in mmr_select(vecs, q, k=3, lam=1.0).collect()
    )
    assert out == [(1, 1), (2, 2), (3, 3)]


def test_mmr_rank_count_and_determinism(spark, sf_dir):
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.similarity import mmr_select
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0)
    c = emb.filter(F.col("vec_id") != 0)
    a = sorted((r.mmr_rank, r.vec_id) for r in mmr_select(c, qv, k=5).collect())
    b = sorted((r.mmr_rank, r.vec_id) for r in mmr_select(c, qv, k=5).collect())
    assert a == b and len(a) == 5
    assert [t for t, _ in a] == [1, 2, 3, 4, 5]
