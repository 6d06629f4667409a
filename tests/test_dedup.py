"""Property tests for the non-oracle dedup operators (MinHash LSH,
SimHash): the oracle here is the EXACT implementation of the same
semantic (jaccard_pairs), mirroring how the reference validates its
data plane against vanilla Spark results (SparkTestBase.scala:111)."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import dedup as D


def test_lsh_recovers_exact_jaccard_pairs(spark, sf_dir):
    """verified_lsh_dedup must (a) emit only truly-similar pairs
    (exactness of the verify stage) and (b) recall most exact pairs."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b) for r in D.jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in D.verified_lsh_dedup(docs, "doc_id", "text", 3, 32, 8, 0.8).collect()
    }
    assert lsh <= exact, f"LSH emitted false positives: {lsh - exact}"
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} < 0.8 ({len(exact)} exact pairs)"


def test_lsh_finds_planted_duplicates(spark, sf_dir):
    """Planted exact copies must always collide in LSH."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    copies = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    with_dups = docs.select("doc_id", "text").unionByName(copies)
    pairs = D.minhash_lsh_candidates(with_dups, "doc_id", "text").collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    want = {(r.doc_id, r.doc_id + 1_000_000) for r in docs.select("doc_id").collect()}
    missing = {w for w in want if w not in found}
    assert not missing, f"exact copies missed by LSH: {missing}"


def test_simhash_near_vs_far(spark, sf_dir):
    """Identical docs hash identically; hamming distance to an
    unrelated doc exceeds distance to itself (=0)."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    sh = D.simhash(docs, "doc_id", "text")
    again = D.simhash(docs, "doc_id", "text")
    joined = (
        sh.alias("a")
        .join(again.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"))
        .select(D.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("d"))
        .collect()
    )
    assert all(r.d == 0 for r in joined), "simhash not deterministic"

    rows = sh.collect()
    fingerprints = [r.simhash for r in rows]
    # different docs should rarely share a fingerprint
    assert len(set(fingerprints)) > len(fingerprints) * 0.8


def test_exact_dedup_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)
    deduped = D.exact_dedup(doubled, "text", "doc_id")
    n_unique_texts = docs.select("text").distinct().count()
    assert deduped.count() == n_unique_texts
    assert deduped.filter(F.col("n_copies") < 2).count() == 0
