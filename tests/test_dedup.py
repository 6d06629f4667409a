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


def test_hot_shingle_cap_keeps_candidates_linear(spark):
    """One boilerplate sentence shared by every doc must not make the
    shingle self-join quadratic: with max_shingle_freq set, the hot
    shingles are dropped before the join, so candidate pairs collapse
    from O(N^2) boilerplate collisions to just the true duplicates."""
    n_docs = 400
    boiler = "terms of service apply to all content here"
    rows = [(i, f"unique document number {i} body text alpha{i} beta{i} gamma{i} {boiler}")
            for i in range(n_docs)]
    # plant 5 exact duplicates
    rows += [(10_000 + i, rows[i][1]) for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = D.shingle_table(docs, "doc_id", "text", 3)
    capped = D.drop_hot_shingles(sh, max_shingle_freq=50)
    hot_left = (
        capped.groupBy("shingle").count().filter(F.col("count") > 50).count()
    )
    assert hot_left == 0, "hot shingles survived the cap"

    pairs = D.jaccard_pairs(
        # capped jaccard is a lower bound (hot overlap excluded from the
        # numerator only): dup pairs score 8/22 here, so threshold 0.3
        docs, "doc_id", "text", n=3, threshold=0.3, max_shingle_freq=50
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    want = {(i, 10_000 + i) for i in range(5)}
    assert want <= found, f"planted dups lost under the cap: {want - found}"
    # boilerplate-only overlaps must NOT become candidates
    assert len(found) == len(want), f"quadratic boilerplate pairs leaked: {len(found)}"


def test_lsh_md5_mode_matches_xxhash_semantics(spark, sf_dir):
    """Portable (md5) hashing is a different hash family, same
    semantics: verified pairs are still a subset of exact jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in D.jaccard_pairs(docs, "doc_id", "text", 3, 0.8).collect()
    }
    md5_pairs = {
        (r.id_a, r.id_b)
        for r in D.verified_lsh_dedup(
            docs, "doc_id", "text", 3, 16, 4, 0.8, hash_kind="md5"
        ).collect()
    }
    assert md5_pairs <= exact


def test_decontaminate_flags_planted_leak(spark):
    """A training doc that quotes an eval doc's text must be flagged
    with the exact distinct-5-gram overlap; disjoint docs must not."""
    from celeborn_spark.operators.dedup import ngram_decontaminate

    eval_doc = "alpha beta gamma delta epsilon zeta eta"
    train = spark.createDataFrame(
        [
            (1, "intro words then " + eval_doc),       # contains all eval 5-grams
            (2, "alpha beta gamma delta epsilon"),     # exactly one shared 5-gram
            (3, "totally unrelated text with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(eval_doc,)], "text string")
    got = {r.doc_id: r.n_shared for r in
           ngram_decontaminate(train, ev, "doc_id", "text", n=5).collect()}
    # eval doc has 3 distinct 5-grams; doc1 contains all 3, doc2 one
    assert got == {1: 3, 2: 1}


def test_incremental_dedup_drops_corpus_and_batch_dupes(spark):
    corpus = spark.createDataFrame(
        [(i, f"existing doc {i}") for i in range(100)], ["doc_id", "text"]
    )
    index = corpus.select(D.content_hash("text").alias("content_hash"))
    batch = spark.createDataFrame(
        # 200/201: genuinely new; 202+203: within-batch dup pair;
        # 204: duplicates an existing corpus doc
        [
            (200, "fresh doc A"),
            (201, "fresh doc B"),
            (202, "fresh doc C"),
            (203, "fresh doc C"),
            (204, "existing doc 7"),
        ],
        ["doc_id", "text"],
    )
    out = D.incremental_dedup(batch, index, "text", "doc_id")
    rows = {r.doc_id: r.n_copies for r in out.collect()}
    assert rows == {200: 1, 201: 1, 202: 2}, rows


def test_edit_distance_pairs_blocked(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # dist 3
            (3, "a completely different document about spark and data"),
            (4, "x" * 400),  # far-away block
        ],
        ["doc_id", "text"],
    )
    out = {(r.id_a, r.id_b): r.dist for r in
           D.edit_distance_pairs(docs, "doc_id", "text", max_dist=10).collect()}
    assert (1, 2) in out and out[(1, 2)] == 3
    assert all(p == (1, 2) for p in out), out


def test_incremental_lsh_finds_planted_cross_batch_near_dups(spark, sf_dir):
    """Batch copies of corpus docs must surface with jaccard 1.0; novel
    batch docs must not pair with anything."""
    from pyspark.sql import functions as F2

    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.dedup import incremental_lsh_near_dup

    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F2.col("doc_id") < 100).localCheckpoint()
    seed = corpus.where(F2.col("doc_id") < 5)
    copies = seed.select((F2.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    novel = spark.createDataFrame(
        [(2_000_000 + i, f"utterly novel text {i} zz{i} qq{i} ww{i} ee{i}")
         for i in range(5)],
        ["doc_id", "text"],
    )
    batch = copies.unionByName(novel)
    pairs = incremental_lsh_near_dup(
        corpus, batch, "doc_id", "text", num_hashes=16, bands=4, threshold=0.8
    ).collect()
    found: dict[int, list[tuple[int, float]]] = {}
    for r in pairs:
        found.setdefault(r.id_new, []).append((r.id_old, r.jaccard))
    for r in seed.collect():
        # the planted source must be among the matches at jaccard 1.0
        # (other corpus docs may legitimately also near-dup the copy)
        assert (r.doc_id, 1.0) in found.get(r.doc_id + 1_000_000, []), r.doc_id
    assert not any(k >= 2_000_000 for k in found)


def test_dup_span_profile_localizes_copied_passage(spark):
    """A doc sharing one 8-token passage with another must show exactly
    the copied spans as duplicated; a fully-unique doc shows zero."""
    from celeborn_spark.operators.dedup import dup_span_profile

    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, passage + " tail one two three four five six seven"),
        (2, "lead in words here now " + passage),
        (3, "completely different text with no shared spans at all ok"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: (r.n_spans, r.n_dup_spans) for r in
           dup_span_profile(df, "doc_id", "text", n=8).collect()}
    # both docs share exactly the one 8-token passage span
    assert out[1][1] == 1 and out[2][1] == 1
    assert out[3][1] == 0
    assert out[1][0] == 9  # 16 tokens -> 9 distinct 8-gram spans


# --- winnowing fingerprints (operators/dedup.winnow_fingerprints) ---


def test_winnow_shared_run_guarantees_shared_fingerprint(spark):
    """Winnowing guarantee: docs sharing a run of w+k-1 tokens share at
    least one selected fingerprint (SIGMOD'03 property)."""
    from celeborn_spark.operators.dedup import winnow_fingerprints

    shared = "p q r s t u v w x y z"  # 11 tokens = w+k-1 for k=4, w=8
    df = spark.createDataFrame(
        [
            (1, "a b c d e f " + shared + " g h"),
            (2, shared + " m n o aa bb cc dd"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, "doc_id", "text", k=4, w=8).collect()
    d1 = {r.fp for r in fps if r.doc_id == 1}
    d2 = {r.fp for r in fps if r.doc_id == 2}
    assert d1 & d2, "no shared fingerprint for a shared 11-token run"


def test_winnow_rightmost_tie_break(spark):
    """All-identical tokens hash equal: each window must select its
    RIGHTMOST position (k=1, w=3 over 5 tokens -> positions {2,3,4})."""
    from celeborn_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(1, "a a a a a")], ["doc_id", "text"])
    got = sorted(
        r.pos for r in winnow_fingerprints(df, "doc_id", "text", k=1, w=3).collect()
    )
    assert got == [2, 3, 4]


def test_winnow_short_doc_single_window(spark):
    """Fewer than w grams: one clipped window, exactly one fingerprint."""
    from celeborn_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame([(7, "a b c d e")], ["doc_id", "text"])
    rows = winnow_fingerprints(df, "doc_id", "text", k=4, w=8).collect()
    assert len(rows) == 1 and rows[0].doc_id == 7


def test_winnow_density_bounded(spark, sf_dir):
    """Selected density stays in the winnowing band: well below 1 gram
    per position, at least 1/w of positions."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.dedup import winnow_fingerprints
    from celeborn_spark.operators.dedup import tokens as _t  # noqa: F401

    d = load_table(spark, sf_dir, "documents")
    n_fp = winnow_fingerprints(d, "doc_id", "text", k=4, w=8).count()
    from pyspark.sql import functions as F

    n_grams = (
        d.select((F.size(F.split("text", r"\s+")) - 3).alias("g"))
        .agg(F.sum(F.greatest("g", F.lit(0))))
        .collect()[0][0]
    )
    assert n_fp < 0.6 * n_grams
    assert n_fp > n_grams / 10


def test_winnow_vs_oracle(spark, sf_dir):
    from celeborn_spark import registry
    from tests.oracle import assert_matches_oracle, duck_connection

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        registry.queries()["q_winnow_fingerprints"](spark, sf_dir),
        con,
        registry.oracles()["q_winnow_fingerprints"],
        "q_winnow_fingerprints",
    )


def test_jaccard_size_band_prefilter_boundary(spark):
    """The size-band prefilter (best-case jaccard = least/(na+nb-least),
    rounded like the final filter) must keep pairs whose TRUE jaccard
    lands exactly on the threshold and drop only pairs whose best case
    rounds below it. Planted geometry, threshold 0.8:
      - a/b: 4-shingle doc vs its 5-shingle superset — jaccard 4/5 = 0.8
        exactly on the boundary, and n_common == least so the prefilter
        bound is TIGHT here (any stricter cut would lose it);
      - a/c: identical text — jaccard 1.0;
      - a/d: sizes 4 vs 13 — best case 4/13 < 0.8, killed by the
        prefilter before the pair aggregate (and truly dissimilar).
    """
    rows = [
        (1, "w0 w1 w2 w3 w4 w5"),                         # 4 trigram shingles
        (2, "w0 w1 w2 w3 w4 w5 w6"),                      # 5: superset of doc 1
        (3, "w0 w1 w2 w3 w4 w5"),                         # exact copy of doc 1
        (4, "w0 w1 w2 x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 xa xb"),  # 13, shares 1
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.jaccard_pairs(d, "doc_id", "text", 3, 0.8).collect()
    }
    assert got == {(1, 2): 0.8, (1, 3): 1.0, (2, 3): 0.8}


def test_set_similarity_multiword_mask_beyond_64_tokens(spark):
    """Past one long's worth of vocabulary (V > 64) the mask kernel
    widens to ceil(V/64) longs (r13 second pass; it fell back to
    array-intersect before) — 70 distinct tokens exercise the 2-word
    masks and must produce the identical pairs: a planted
    near-identical pair (69/70 overlap = 0.9857) survives threshold
    0.9 and a disjoint doc does not."""
    wide_a = " ".join(f"t{i}" for i in range(69))
    wide_b = wide_a + " t69"          # jaccard 69/70
    rows = [(1, wide_a), (2, wide_b), (3, "z0 z1 z2")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jac
        for r in D.set_similarity_join(
            d, "doc_id", "text", 0.9, strategy="length"
        ).collect()
    }
    assert got == {(1, 2): round(69 / 70, 6)}


def test_set_similarity_mask_gate_falls_back_beyond_512_tokens(spark):
    """The widened mask kernel is bounded at 8 longs (V <= 512); past
    that the array-intersect kernel verifies, and both must agree:
    a 519/520-overlap pair survives threshold 0.9, the disjoint tail
    vocabulary (pushing V to 525) does not pair."""
    wide_a = " ".join(f"t{i:03d}" for i in range(519))
    wide_b = wide_a + " t519"         # jaccard 519/520
    rows = [(1, wide_a), (2, wide_b), (3, "z0 z1 z2 z3 z4")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jac
        for r in D.set_similarity_join(
            d, "doc_id", "text", 0.9, strategy="length"
        ).collect()
    }
    assert got == {(1, 2): round(519 / 520, 6)}


def test_set_similarity_prefix_mask_late_dedup_agrees(spark):
    """The degenerate-vocabulary auto regime (both candidate estimates
    >> corpus) with a prefix pick skips the candidate distinct and
    dedups survivors AFTER the mask verify (r13: the candidate
    distinct was the sf1 19.6 GB spill). A 300-doc hot-vocab corpus
    whose lengths spread across overlapping bands makes auto pick
    prefix under the degenerate gate; its output must equal the
    exactly-once length-band path pair for pair."""
    import random

    rng = random.Random(7)
    hot = [f"w{i:02d}" for i in range(30)]
    rare = [f"r{i:02d}" for i in range(30)]
    rows = []
    for i in range(300):
        n = 20 + i % 7          # lengths 23..29: bands overlap heavily
        # 3 semi-rare tokens per doc become its frequency-ordered
        # prefix (df ~ 30 each), keeping the prefix estimate BELOW the
        # length estimate while both stay >> 20x the 300 docs
        toks = rng.sample(hot, n) + rng.sample(rare, 3)
        rows.append((i, " ".join(toks)))
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    auto = {
        (r.id_a, r.id_b): r.jac
        for r in D.set_similarity_join(
            d, "doc_id", "text", 0.9, strategy="auto"
        ).collect()
    }
    length = {
        (r.id_a, r.id_b): r.jac
        for r in D.set_similarity_join(
            d, "doc_id", "text", 0.9, strategy="length"
        ).collect()
    }
    assert auto == length


def test_set_similarity_bitmask_kernel_tight_boundary(spark):
    """With V <= 64 the bitmask kernel verifies: a pair EXACTLY on the
    rational threshold (9/10 = 0.9) must survive (the raw-ratio filter
    contract) and 8/10 must not — the same integers the array kernel
    produces, now via bit_count(maskA & maskB)."""
    base = " ".join(f"t{i}" for i in range(9))
    rows = [
        (1, base + " t9"),   # {t0..t8, t9}
        (2, base + " ta"),   # vs 1: 9 common / 11 union = 0.818... -> out
        (3, base),           # vs 1 and vs 2: 9 common / 10 union = 0.9 -> in
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.jac
        for r in D.set_similarity_join(
            d, "doc_id", "text", 0.9, strategy="length"
        ).collect()
    }
    assert got == {(1, 3): 0.9, (2, 3): 0.9}
