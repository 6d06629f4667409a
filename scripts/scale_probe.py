#!/usr/bin/env python3
"""Empirical scale probe: replicate documents Kx (salted so copies are
near- but not exact dups) and time the dedup/text family at 1x vs Kx.

Last run (K=8, sf0.1 base = 5k docs -> 40k, 2k vecs -> 16k, local[32],
round 5 / pyspark 4.1.2, idle host — an earlier same-day run under
background host load showed ~2-3x inflated absolutes with the same
sublinear SHAPE; compare ratios, not absolutes):

    minhash_lsh               1.70 s ->  3.47 s  (2.0x: sublinear; band
                                                  collisions bound candidates)
    jaccard_pairs(cap)        2.00 s -> 13.17 s  (6.6x: exact all-pairs is
                                                  QUADRATIC in docs-per-
                                                  shingle BY DESIGN; the
                                                  hot-shingle cap contains
                                                  it, verified_lsh_dedup
                                                  is the scale path)
    repetition_stats          0.33 s ->  0.61 s  (1.8x: linear map+agg)
    quality_curriculum        0.51 s ->  0.55 s  (1.1x: histogram quantiles
                                                  keyed by distinct values)
    mixture_sample            0.34 s ->  0.32 s  (flat: two aggregates +
                                                  codegen'd filter)
    sequence_pack             0.25 s ->  0.29 s  (1.2x: one window exchange
                                                  + narrow span fan-out)
    kmeans k=4 iters=2        1.50 s ->  1.79 s  (1.2x: vector passes
                                                  embarrassingly parallel)
    embedding_quantize        0.18 s ->  0.20 s  (flat: dim-sized stats agg
                                                  + map-side codes)
    pagerank iters=3          1.20 s ->  2.45 s  (2.0x for 8x edges)
    pagerank(partition_edges) 2.23 s ->  2.85 s  (1.3x: partitioned-edge
                                                  layout costs extra fixed
                                                  setup at toy scale, wins
                                                  past broadcast scale)
    pagerank(dangling)        1.97 s ->  4.13 s  (2.1x: + per-round
                                                  dangler-sum aggregate)
    winsorize                 0.16 s ->  0.28 s  (1.8x: two group-keyed
                                                  aggregates + broadcast
                                                  clamp)
    epoch_shuffle             0.07 s ->  0.07 s  (flat: one exchange +
                                                  per-shard local sort)
    snapshot_diff             0.16 s ->  0.27 s  (1.7x: map-side digests,
                                                  key+digest-only shuffle)
    zorder                    0.19 s ->  0.18 s  (flat: zero-shuffle map)
    incremental_lsh(xxh)      1.07 s ->  2.86 s  (2.7x with BOTH batch and
                                                  corpus 8x: batch-vs-index
                                                  band join, candidates
                                                  bucket-bounded)

Interpretation: every operator class is sublinear at 8x except exact
Jaccard, which is the correctness/oracle path; at scale candidate
generation must go through verified_lsh_dedup (LSH pruning + exact
verification) with max_shingle_freq capping hot shingles — the probe
demonstrates WHY, not a regression.

Round-6 cases (same host, K=8):

    winnow                    0.73 s ->  5.89 s  (8x: linear map+window,
                                                  per-doc state)
    bpe_train(4)              2.17 s ->  0.85 s  (flat: vocab-bounded
                                                  after the word-count
                                                  exchange; 1x paid codegen)
    logreg(3 rounds)          2.40 s ->  0.41 s  (flat: k-sized gradient
                                                  aggregates; same)
    bfs(3 hops)               1.01 s ->  1.78 s  (1.8x for 8x edges)
    kcore(k=8,r=4)            1.81 s ->  4.24 s  (2.3x for 8x edges)
    knn_join(k=5,p=3)         5.56 s -> 10.60 s  (1.9x: cells bound the
                                                  pair space; centroid
                                                  count scales with N)
    corr_matrix               0.31 s ->  0.24 s  (flat: one scalar agg)
    set_similarity(t=.9)     32.45 s -> 402.8 s  (PREFIX plan, 31-token
                                                  vocab: hot prefixes ->
                                                  22M candidates at 1x —
                                                  the measured case that
                                                  drove the length-band
                                                  strategy; auto now
                                                  routes here to the
                                                  length plan: 3.9 s at
                                                  1x for the identical
                                                  exact output. NOTE the
                                                  8x corpus genuinely
                                                  contains ~quadratic
                                                  true-pair mass — output
                                                  size, not candidate
                                                  waste, dominates any
                                                  exact algorithm there)

Round-7 cases (idle host, K=8, r7-only runner):

    hits(3)                   7.81 s ->  5.27 s  (first-case JVM warmup
                                                  inflates 1x; sublinear)
    shortest_paths(3)         1.18 s ->  2.63 s  (2.2x for 8x edges)
    label_propagation(3)      1.24 s ->  3.03 s  (2.4x for 8x edges)
    kmv_distinct(k=64)        1.20 s ->  2.56 s  (2.1x: distinct-pair agg
                                                  dominates; sketch rows flat)
    key_skew_profile          0.14 s ->  0.37 s  (histogram-bounded)
    skyline_2d                1.75 s -> 12.10 s  (~7x ~ LINEAR: stage-1
                                                  windows + survivor set
                                                  scale with data — the
                                                  inherent cost; never
                                                  quadratic)
    item_neighbors(k=5)       2.89 s ->  7.91 s  (2.7x: basket-bounded
                                                  pair join)
    decision_stump            0.36 s ->  0.45 s  (flat: distinct-value
                                                  histogram)
    cusum_changepoint         0.14 s ->  0.18 s  (flat: one window pass)
    mmr_select(k=8)           3.96 s ->  2.09 s  (flat: k fixed tiny jobs
                                                  dominate; 1x paid warmup)

Late-r7 cases (idle host, K=8):

    rendezvous_assign(8)      2.19 s ->  3.05 s  (1.4x: zero-shuffle map,
                                                  8 md5s/row)
    assign_dense_ids          1.37 s ->  1.54 s  (~flat: bucket-count
                                                  histogram + local ranks)
    grouped_ols_trend         0.43 s ->  0.40 s  (flat: one map-combined agg)
    lag1_autocorr             0.49 s ->  0.72 s  (1.5x: one window pass)
    range_self_join(5min)     0.50 s ->  1.38 s  (2.8x: PAIR OUTPUT grows
                                                  with density — output
                                                  size, not candidate waste)
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import curriculum as C
from celeborn_spark.operators import dedup as D
from celeborn_spark.operators import kmeans as KM
from celeborn_spark.operators import similarity as S
from celeborn_spark.operators import textops as T
from celeborn_spark.operators.graph import pagerank
from celeborn_spark.operators.packing import pack_sequences
from celeborn_spark.session import get_spark

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def timeit(label: str, fn) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:34s} {best:7.2f} s", flush=True)
    return best


def main() -> None:
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    d1 = load_table(spark, "/root/testdata/sf0.1", "documents")
    reps = [
        d1.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit(f"variant {i}")).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for i in range(K)
    ]
    dk = reps[0]
    for r in reps[1:]:
        dk = dk.unionByName(r)
    dk.write.mode("overwrite").parquet("/tmp/scale_probe_docs.parquet")
    dk = spark.read.parquet("/tmp/scale_probe_docs.parquet")
    print(f"rows: {d1.count()} -> {dk.count()}")

    for label, df in (("1x", d1), (f"{K}x", dk)):
        timeit(
            f"minhash_lsh {label}",
            lambda df=df: D.minhash_lsh_candidates(
                df, "doc_id", "text", 3, 32, 8, "xxhash64", 1000
            ).count(),
        )
        timeit(
            f"jaccard_pairs(cap) {label}",
            lambda df=df: D.jaccard_pairs(
                df, "doc_id", "text", n=3, threshold=0.8, max_shingle_freq=1000
            ).count(),
        )
        timeit(
            f"repetition {label}",
            lambda df=df: T.repetition_stats(df, "doc_id", "text").count(),
        )
        timeit(
            f"quality_curriculum {label}",
            lambda df=df: _curriculum(df).count(),
        )
        timeit(
            f"curriculum_continuous(dp=4) {label}",
            lambda df=df: _curriculum_continuous(df).count(),
        )
        timeit(
            f"mixture_sample {label}",
            lambda df=df: C.mixture_sample(
                df, "lang", "doc_id", "n_chars",
                {"en": 0.3, "de": 0.1, "es": 0.1, "fr": 0.2, "zh": 0.3}, 0.8,
            ).count(),
        )
        timeit(
            f"sequence_pack {label}",
            lambda df=df: pack_sequences(
                df, "source", "doc_id", "text", ctx=512
            ).count(),
        )

    e1 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    ereps = [
        e1.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(i * 1e-3)
            ).alias("embedding"),
            "label",
        )
        for i in range(K)
    ]
    ek = ereps[0]
    for r in ereps[1:]:
        ek = ek.unionByName(r)
    ek.write.mode("overwrite").parquet("/tmp/scale_probe_vecs.parquet")
    ek = spark.read.parquet("/tmp/scale_probe_vecs.parquet")
    for label, df in (("1x", e1), (f"{K}x", ek)):
        timeit(
            f"kmeans(k=4,iters=2) {label}",
            lambda df=df: KM.lloyd_iterations(df, k=4, iters=2).count(),
        )
        timeit(
            f"embedding_quantize {label}",
            lambda df=df: S.quantize_embeddings(df).count(),
        )

    # pagerank scale: replicate edges with shifted node ids (K disjoint
    # copies of the graph — rank mass per copy is independent, so the
    # work is exactly K graphs)
    o1 = load_table(spark, "/root/testdata/sf0.1", "orders")
    l1 = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    from celeborn_spark.operators.graph import bipartite_order_edges

    g1 = bipartite_order_edges(o1, l1)
    gk_parts = [
        g1.select(
            (F.col("src") + F.lit(i * 100_000_000)).alias("src"),
            (F.col("dst") + F.lit(i * 100_000_000)).alias("dst"),
        )
        for i in range(K)
    ]
    gk = gk_parts[0]
    for r in gk_parts[1:]:
        gk = gk.unionByName(r)
    gk = gk.localCheckpoint()
    for label, df in (("1x", g1), (f"{K}x", gk)):
        timeit(
            f"pagerank(iters=3) {label}",
            lambda df=df: pagerank(df, iters=3).count(),
        )
        timeit(
            f"pagerank(partition_edges) {label}",
            lambda df=df: pagerank(df, iters=3, partition_edges=True).count(),
        )
        timeit(
            f"pagerank(dangling) {label}",
            lambda df=df: pagerank(df, iters=3, handle_dangling=True).count(),
        )

    # winsorize scale: replicate events K x with shifted ids; the
    # operator is two aggregates over the group key + a broadcast-join
    # clamp, so work is linear in rows and keyed by group count
    ev1 = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "event_type", "value"
    )
    evk_parts = [ev1 for _ in range(K)]
    evk = evk_parts[0]
    for r in evk_parts[1:]:
        evk = evk.unionByName(r)
    evk = evk.localCheckpoint()
    for label, df in (("1x", ev1), (f"{K}x", evk)):
        timeit(f"winsorize {label}", lambda df=df: _winsorize(df).count())

    # round-5 operators over the replicated documents corpus
    from celeborn_spark.operators.dedup import incremental_lsh_near_dup
    from celeborn_spark.operators.sampling import epoch_shuffle
    from celeborn_spark.operators.merge import snapshot_diff
    from celeborn_spark.sources.io import zorder_value

    for label, df in (("1x", d1), (f"{K}x", dk)):
        timeit(
            f"epoch_shuffle {label}",
            lambda df=df: epoch_shuffle(df, "doc_id", n_shards=64, epoch=1).count(),
        )
        timeit(
            f"snapshot_diff {label}",
            lambda df=df: snapshot_diff(
                df,
                df.where(F.col("doc_id") % 13 != 0),
                "doc_id",
                ["text", "lang"],
            ).count(),
        )
        timeit(
            f"zorder {label}",
            lambda df=df: df.select(
                zorder_value(
                    F.col("n_chars").cast("double"),
                    (F.col("doc_id") % 1000).cast("double"),
                    0.0, 100000.0, 0.0, 1000.0, bits=16,
                ).alias("z")
            ).count(),
        )
        timeit(
            f"incremental_lsh(xxh) {label}",
            lambda df=df: incremental_lsh_near_dup(
                df.where(F.col("doc_id") % 10 != 0),
                df.where(F.col("doc_id") % 10 == 0),
                "doc_id", "text", num_hashes=16, bands=4,
                threshold=0.8, hash_kind="xxhash64",
            ).count(),
        )

    # round-6 operators
    from celeborn_spark.operators.dedup import set_similarity_join, winnow_fingerprints
    from celeborn_spark.operators.graph import bfs_hops, kcore, triangle_counts
    from celeborn_spark.operators.similarity import knn_join
    from celeborn_spark.operators.stats import corr_matrix, logreg_fit
    from celeborn_spark.operators.textops import bpe_train

    for label, df in (("1x", d1), (f"{K}x", dk)):
        timeit(
            f"winnow {label}",
            lambda df=df: winnow_fingerprints(df, "doc_id", "text", 4, 8).count(),
        )
        timeit(
            f"set_similarity(t=.9) {label}",
            lambda df=df: set_similarity_join(df, "doc_id", "text", 0.9).count(),
        )
        timeit(
            f"bpe_train(4) {label}",
            lambda df=df: bpe_train(df, "text", n_merges=4).count(),
        )
        timeit(
            f"logreg(3 rounds) {label}",
            lambda df=df: logreg_fit(
                df.select(
                    F.lit(1.0).alias("bias"),
                    (F.least(F.col("n_chars"), F.lit(2000)) / 1000.0).alias("nk"),
                    F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
                ),
                ["bias", "nk"], "y", iters=3,
            ).count(),
        )

    # graph round-6: BFS frontier + k-core peeling + triangles over the
    # replicated disjoint graphs (same gk as pagerank)
    for label, df in (("1x", g1), (f"{K}x", gk)):
        timeit(
            f"bfs(3 hops) {label}",
            lambda df=df: bfs_hops(
                df,
                df.select(F.col("src").alias("node")).filter(
                    F.col("node") % 194 == 0
                ).distinct(),
                max_hops=3,
            ).count(),
        )
        timeit(
            f"kcore(k=8,r=4) {label}",
            lambda df=df: kcore(
                df.filter(F.col("src") < F.col("dst")).select(
                    F.col("src").alias("u"), F.col("dst").alias("v")
                ),
                k=8, rounds=4,
            ).count(),
        )

    # knn join over the replicated embeddings (same ek as kmeans)
    for label, df in (("1x", e1), (f"{K}x", ek)):
        timeit(
            f"knn_join(k=5,p=3) {label}",
            lambda df=df: knn_join(
                df,
                df.filter(F.col("vec_id") % 100 == 0).select(
                    F.col("vec_id").alias("centroid_id"),
                    F.col("embedding").alias("centroid_vec"),
                ),
                k=5, n_probe=3,
            ).count(),
        )
        timeit(
            f"corr_matrix {label}",
            lambda df=df: corr_matrix(
                df.select(
                    F.element_at("embedding", 1).alias("a"),
                    F.element_at("embedding", 2).alias("b"),
                    F.element_at("embedding", 3).alias("c"),
                ),
                ["a", "b", "c"],
            ).count(),
        )


    # round-6-late analytics operators
    from celeborn_spark.operators.classify import naive_bayes_confusion
    from celeborn_spark.operators.graph import adamic_adar
    from celeborn_spark.operators.incremental import (
        agg_state,
        finalize_agg,
        merge_agg_states,
    )
    from celeborn_spark.operators.market import cooccurrence_lift
    from celeborn_spark.operators.stats import ewma_trend, rolling_anomaly

    # lineitem replicated with shifted order/part keys (disjoint baskets)
    li1 = l1.select("l_orderkey", "l_partkey", "l_extendedprice", "l_shipdate")
    lik_parts = [
        li1.select(
            (F.col("l_orderkey") + F.lit(i * 100_000_000)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * 10_000_000)).alias("l_partkey"),
            "l_extendedprice",
            "l_shipdate",
        )
        for i in range(K)
    ]
    lik = lik_parts[0]
    for r in lik_parts[1:]:
        lik = lik.unionByName(r)
    lik = lik.localCheckpoint()

    def _inc_merge(df):
        cutoff = F.lit("1996-01-01").cast("timestamp")
        base = df.filter(F.col("l_shipdate") < cutoff)
        delta = df.filter(F.col("l_shipdate") >= cutoff)
        return finalize_agg(
            merge_agg_states(
                agg_state(base, "l_partkey", "l_extendedprice"),
                agg_state(delta, "l_partkey", "l_extendedprice"),
                "l_partkey",
            ),
            "l_partkey",
        )

    for label, df in (("1x", li1), (f"{K}x", lik)):
        timeit(
            f"cooccurrence_lift {label}",
            lambda df=df: cooccurrence_lift(df, "l_orderkey", "l_partkey", 25).count(),
        )
        timeit(
            f"incremental_agg_merge {label}",
            lambda df=df: _inc_merge(df).count(),
        )

    # events replicated with shifted user ids (disjoint window groups)
    ev1f = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "user_id", "ts", "event_id", "value"
    )
    evkf_parts = [
        ev1f.select(
            (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
            "ts",
            (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
            "value",
        )
        for i in range(K)
    ]
    evkf = evkf_parts[0]
    for r in evkf_parts[1:]:
        evkf = evkf.unionByName(r)
    evkf = evkf.localCheckpoint()
    for label, df in (("1x", ev1f), (f"{K}x", evkf)):
        timeit(
            f"rolling_anomaly {label}",
            lambda df=df: rolling_anomaly(
                df, "user_id", ("ts", "event_id"), "value"
            ).count(),
        )
        timeit(
            f"ewma_trend {label}",
            lambda df=df: ewma_trend(
                df, "user_id", ("ts", "event_id"), "value"
            ).count(),
        )

    for label, df in (("1x", d1), (f"{K}x", dk)):
        timeit(
            f"naive_bayes {label}",
            lambda df=df: naive_bayes_confusion(df, "doc_id", "text", "lang").count(),
        )

    # adamic-adar over the K disjoint canonicalized graphs
    for label, df in (("1x", g1), (f"{K}x", gk)):
        timeit(
            f"adamic_adar {label}",
            lambda df=df: adamic_adar(
                df.filter(F.col("src") < F.col("dst"))
                .select(F.col("src").alias("u"), F.col("dst").alias("v"))
                .distinct(),
                k=30,
            ).count(),
        )


    # --- round-7 cases ---
    from celeborn_spark.operators.classify import decision_stump
    from celeborn_spark.operators.frontier import skyline_2d
    from celeborn_spark.operators.graph import (
        cost_order_edges,
        directed_order_edges,
        hits,
        label_propagation,
        shortest_paths,
    )
    from celeborn_spark.operators.market import item_neighbors
    from celeborn_spark.operators.sketch import kmv_distinct
    from celeborn_spark.operators.stats import cusum_changepoint, key_skew_profile

    # directed + cost edge variants of the K disjoint graphs
    ed1 = directed_order_edges(o1, l1)
    edk_parts = [
        ed1.select(
            (F.col("src") + F.lit(i * 100_000_000)).alias("src"),
            (F.col("dst") + F.lit(i * 100_000_000)).alias("dst"),
        )
        for i in range(K)
    ]
    edk = edk_parts[0]
    for r in edk_parts[1:]:
        edk = edk.unionByName(r)
    edk = edk.localCheckpoint()
    for label, df in (("1x", ed1), (f"{K}x", edk)):
        timeit(f"hits(3) {label}", lambda df=df: hits(df, iters=3).count())

    ce1 = cost_order_edges(o1, l1)
    cek_parts = [
        ce1.select(
            (F.col("src") + F.lit(i * 100_000_000)).alias("src"),
            (F.col("dst") + F.lit(i * 100_000_000)).alias("dst"),
            "w",
        )
        for i in range(K)
    ]
    cek = cek_parts[0]
    for r in cek_parts[1:]:
        cek = cek.unionByName(r)
    cek = cek.localCheckpoint()
    for label, df in (("1x", ce1), (f"{K}x", cek)):
        seeds = df.select(F.col("src").alias("node")).filter(
            F.pmod("node", F.lit(194)) == 0
        )
        timeit(
            f"shortest_paths(3) {label}",
            lambda df=df, seeds=seeds: shortest_paths(df, seeds, rounds=3).count(),
        )

    for label, df in (("1x", g1), (f"{K}x", gk)):
        timeit(
            f"label_propagation(3) {label}",
            lambda df=df: label_propagation(df, rounds=3).count(),
        )

    # lineitem-shaped cases: keys/baskets scale Kx
    for label, df in (("1x", li1), (f"{K}x", lik)):
        timeit(
            f"kmv_distinct(k=64) {label}",
            lambda df=df: kmv_distinct(
                df.withColumn("grp", F.pmod("l_orderkey", F.lit(7))),
                "l_partkey",
                "grp",
                k=64,
            ).count(),
        )
        timeit(
            f"key_skew_profile {label}",
            lambda df=df: key_skew_profile(df, "l_partkey").count(),
        )
        timeit(
            f"skyline_2d {label}",
            lambda df=df: skyline_2d(
                df.select(
                    F.floor(F.col("l_extendedprice") * 100)
                    .cast("long")
                    .alias("x"),
                    F.pmod("l_partkey", F.lit(1000)).cast("long").alias("y"),
                ),
                "x",
                "y",
            ).count(),
        )
        timeit(
            f"item_neighbors(k=5) {label}",
            lambda df=df: item_neighbors(df, "l_orderkey", "l_partkey", 5).count(),
        )
        timeit(
            f"decision_stump {label}",
            lambda df=df: decision_stump(
                df.withColumn("f", F.pmod("l_partkey", F.lit(50))),
                "f",
                F.col("l_extendedprice") > 30000,
            ).count(),
        )

    for label, df in (("1x", ev1f), (f"{K}x", evkf)):
        timeit(
            f"cusum_changepoint {label}",
            lambda df=df: cusum_changepoint(
                df, "user_id", ("ts", "event_id"), "value"
            ).count(),
        )

    # MMR over Kx candidates (identical vectors replicated: ties are
    # id-broken; work scales with candidate count x k rounds)
    from celeborn_spark.operators.similarity import mmr_select

    em1 = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    emk_parts = [
        em1.select(
            (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
            "embedding",
        )
        for i in range(K)
    ]
    emk = emk_parts[0]
    for r in emk_parts[1:]:
        emk = emk.unionByName(r)
    emk = emk.localCheckpoint()
    qv = em1.filter(F.col("vec_id") == 0)
    for label, df in (("1x", em1), (f"{K}x", emk)):
        timeit(
            f"mmr_select(k=8) {label}",
            lambda df=df: mmr_select(
                df.filter(F.col("vec_id") != 0), qv, k=8
            ).count(),
        )


def _winsorize(e):
    bounds = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95")).alias("w"),
    )
    return clamped.groupBy("event_type").agg(F.avg("w").alias("avg_w"))


def _curriculum(df):
    scored = (
        df.select("doc_id", "n_chars", T.quality_score("text").alias("q"))
        .filter(F.col("q").isNotNull())
        .localCheckpoint()
    )
    return C.quantile_bins(scored, "q", n_bins=10, quantize_dp=6)


def _curriculum_continuous(df):
    # worst case for the histogram method: a genuinely continuous score
    # (every row distinct). quantize_dp=4 caps the histogram window at
    # <= 10,001 rows regardless of corpus size — without it, the
    # "histogram" IS the table on one partition (VERDICT r5 item 3).
    scored = df.select("doc_id", C.u01("doc_id", salt=99).alias("q"))
    return C.quantile_bins(scored, "q", n_bins=10, quantize_dp=4)


if __name__ == "__main__":
    main()
