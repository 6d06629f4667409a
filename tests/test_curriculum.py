"""Curriculum binning and mixture sampling: quantile balance,
monotonicity, achieved-mixture accuracy, rate capping, and the
no-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import curriculum as C
from celeborn_spark.operators import textops as T


def _scored(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "n_chars", T.quality_score("text").alias("q")).filter(
        F.col("q").isNotNull()
    )


def test_quantile_bins_are_balanced_and_monotone(spark, sf_dir):
    scored = _scored(spark, sf_dir)
    total = scored.count()
    binned = C.quantile_bins(scored, "q", n_bins=10)
    per_bin = {r.bin: r.n for r in binned.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(per_bin) <= set(range(10))
    # every bin within 3x of the ideal share (ties can imbalance)
    for b, n in per_bin.items():
        assert n <= 3 * total / 10 + 1, f"bin {b} holds {n} of {total}"
    # score ranges must not overlap across bins
    ranges = {
        r.bin: (r.lo, r.hi)
        for r in binned.groupBy("bin")
        .agg(F.min("q").alias("lo"), F.max("q").alias("hi"))
        .collect()
    }
    for b in sorted(ranges)[:-1]:
        nxt = min(x for x in ranges if x > b)
        assert ranges[b][1] <= ranges[nxt][0], f"bins {b},{nxt} overlap: {ranges}"


def test_quantile_bins_ties_share_a_bin(spark):
    sess = spark
    df = sess.createDataFrame(
        [(i, 1.0 if i < 50 else 2.0) for i in range(100)], ["id", "s"]
    )
    binned = C.quantile_bins(df, "s", n_bins=4)
    got = {(r.s, r.bin) for r in binned.select("s", "bin").distinct().collect()}
    assert got == {(1.0, 0), (2.0, 2)}


def test_quantile_bins_quantized_idempotent_on_rounded_score(spark, sf_dir):
    # quality_score is already rounded to 6dp, so quantize_dp=6 must
    # reproduce the exact-path bins bit for bit (round is idempotent) —
    # the contract that lets q_quality_curriculum harden without an
    # oracle change.
    scored = _scored(spark, sf_dir).localCheckpoint()
    exact = C.quantile_bins(scored, "q", n_bins=10)
    quant = C.quantile_bins(scored, "q", n_bins=10, quantize_dp=6)
    assert sorted(exact.select("doc_id", "bin").collect()) == sorted(
        quant.select("doc_id", "bin").collect()
    )
    assert exact.columns == quant.columns


def test_quantile_bins_quantized_bounds_continuous_scores(spark):
    # All-distinct continuous doubles: the exact path's histogram is
    # row-sized; quantize_dp=2 on a [0,1) score caps it at <= 101 cells
    # whatever the row count — and the bins stay balanced.
    n = 5000
    df = spark.range(n).select(
        F.col("id"),
        (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast("double")
         / F.lit(float(16 ** 8))).alias("s"),
    )
    assert df.select("s").distinct().count() == n  # genuinely continuous feed
    binned = C.quantile_bins(df, "s", n_bins=10, quantize_dp=2)
    cells = df.select(F.round("s", 2).alias("c")).distinct().count()
    assert cells <= 101
    per_bin = {r.bin: r.n for r in binned.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(per_bin) <= set(range(10))
    for b, cnt in per_bin.items():
        assert cnt <= 2 * n / 10, f"bin {b} holds {cnt} of {n}"
    assert sum(per_bin.values()) == n


def test_mixture_sample_hits_targets(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    targets = {"en": 0.3, "de": 0.1, "es": 0.1, "fr": 0.2, "zh": 0.3}
    out = C.mixture_sample(d, "lang", "doc_id", "n_chars", targets, budget_frac=0.8)
    got = {r.lang: r.w for r in out.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()}
    grand = d.agg(F.sum("n_chars")).collect()[0][0]
    budget = 0.8 * grand
    strata = {r.lang: r.w for r in d.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()}
    for lang, share in targets.items():
        expect = min(share * budget, strata[lang])  # capped stratum keeps all
        # md5-variate sampling: expected weight +/- 40% (small corpus)
        assert 0.6 * expect <= got.get(lang, 0) <= 1.4 * expect, (
            lang,
            got.get(lang),
            expect,
        )


def test_mixture_sample_cap_keeps_whole_stratum(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    # zh demanded far beyond its stratum weight -> rate caps at 1.0
    out = C.mixture_sample(d, "lang", "doc_id", "n_chars", {"zh": 1.0}, budget_frac=1.0)
    assert out.count() == d.filter(F.col("lang") == "zh").count()


def test_mixture_sample_never_shuffles_the_corpus(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = C.mixture_sample(d, "lang", "doc_id", "n_chars", {"en": 0.5}, 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "rate join must broadcast, not shuffle docs"
