"""Sampling operators for corpus curation: uniform and stratified
(per-stratum fraction) sampling, and deterministic hash-based
sampling.

Hash-based sampling is the 100 TB workhorse: membership depends only
on the row's key (xxhash64 mod), so it is reproducible across runs,
engines, and re-partitioning — unlike rand()-based sampling, which is
seed + partition-layout dependent. The rand()-based forms are kept for
statistical sampling where key-correlation must be avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: int = 0) -> DataFrame:
    """Deterministic sample: keep rows where hash(key, salt) falls in
    the lowest `fraction` of the 64-bit space. Reproducible anywhere."""
    buckets = 1_000_000
    return df.filter(
        F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(buckets))
        < int(fraction * buckets)
    )


def uniform_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling fractions (df.sampleBy)."""
    return df.sampleBy(stratum_col, fractions=fractions, seed=seed)
