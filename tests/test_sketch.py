"""KMV sketch tests (operators/sketch.py): mergeability is EXACT
(union of per-slice k-minima re-cut to k == whole-data k-minima),
estimates land within the sketch's statistical error, small groups are
exact by construction, and the theta overlap rule behaves on
known-overlap sets.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from celeborn_spark.operators.sketch import kmv_distinct, kmv_overlap, kmv_sketch


def _ids(spark, lo, hi, group="g"):
    return spark.range(lo, hi).select(
        F.lit(group).alias("grp"), F.col("id").alias("key")
    )


def test_kmv_exact_below_k(spark):
    """A group with fewer distinct keys than k reports its exact count
    as the estimate — the sketch holds the whole hash set."""
    df = _ids(spark, 0, 40)
    out = kmv_distinct(df, "key", "grp", k=64).collect()[0]
    assert out.exact_distinct == 40
    assert out.kmv_est == 40.0


def test_kmv_estimate_within_statistical_error(spark):
    """KMV relative error is ~1/sqrt(k-2); at k=256 over 5000 distinct
    keys a 4-sigma band is ~25%. Deterministic md5 makes this a fixed
    number, not a flaky draw — the bound just documents the magnitude."""
    df = _ids(spark, 0, 5000)
    out = kmv_distinct(df, "key", "grp", k=256).collect()[0]
    assert out.exact_distinct == 5000
    assert abs(out.kmv_est - 5000) / 5000 < 0.25


def test_kmv_merge_is_exact(spark):
    """Union of two disjoint slices' sketches, re-cut to the k smallest,
    equals the sketch of the whole data — the mergeability contract that
    makes KMV a per-partition summary at 100 TB."""
    whole = _ids(spark, 0, 3000)
    lo = _ids(spark, 0, 1300)
    hi = _ids(spark, 1300, 3000)
    k = 128
    direct = {r.h for r in kmv_sketch(whole, "key", "grp", k).collect()}
    merged_rel = (
        kmv_sketch(lo, "key", "grp", k)
        .select("grp", "h")
        .union(kmv_sketch(hi, "key", "grp", k).select("grp", "h"))
        .distinct()
        .withColumn("rn", F.row_number().over(W.partitionBy("grp").orderBy("h")))
        .filter(F.col("rn") <= k)
    )
    merged = {r.h for r in merged_rel.collect()}
    assert merged == direct


def test_kmv_duplicates_do_not_move_estimate(spark):
    """The sketch sees distinct keys only: replicating every key 7x
    leaves both the estimate and the exact count unchanged."""
    base = _ids(spark, 0, 500)
    dup = base.crossJoin(spark.range(7).select(F.lit(1).alias("_x"))).drop("_x")
    a = kmv_distinct(base, "key", "grp", k=64).collect()[0]
    b = kmv_distinct(dup, "key", "grp", k=64).collect()[0]
    assert a.kmv_est == b.kmv_est and a.exact_distinct == b.exact_distinct


def test_kmv_overlap_disjoint_sets_estimate_zero(spark):
    """Disjoint key ranges: zero common samples, zero exact overlap."""
    a = spark.range(0, 800).select(F.col("id").alias("key"))
    b = spark.range(800, 1600).select(F.col("id").alias("key"))
    out = kmv_overlap(a, b, "key", k=64).collect()[0]
    assert out.n_common == 0 and out.est_overlap == 0.0
    assert out.exact_overlap == 0


def test_kmv_overlap_identical_sets_recover_cardinality(spark):
    """Identical sets: every sampled hash is common, so the overlap
    estimate is the cardinality estimate — within KMV error."""
    a = spark.range(0, 2000).select(F.col("id").alias("key"))
    out = kmv_overlap(a, a, "key", k=256).collect()[0]
    assert out.exact_overlap == 2000
    assert abs(out.est_overlap - 2000) / 2000 < 0.25


def test_kmv_rejects_tiny_k(spark):
    import pytest as _pytest

    df = _ids(spark, 0, 10)
    with _pytest.raises(ValueError):
        kmv_sketch(df, "key", "grp", k=1)
