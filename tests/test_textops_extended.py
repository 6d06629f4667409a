"""Semantic tests for the corpus-statistics operators added on top of
the basic text surface: repetition signals, tf-idf ranking, bigram
generation edge cases, and time-series resample/gap-fill."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.operators import textops as T
from celeborn_spark.operators.resample import resample_gapfill


def test_repetition_flags_repetitive_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "eight different words appear exactly once here friend"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.repetition_stats(df, "doc_id", "text").collect()}
    assert rows[1].distinct_ratio == 1 / 8
    assert rows[1].top_bigram_frac == 1.0  # every bigram is 'spam spam'
    assert rows[2].distinct_ratio == 1.0
    assert rows[2].top_bigram_frac == 1 / 7  # 7 distinct bigrams


def test_bigrams_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words"), (3, "a b c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.bg
        for r in df.select("doc_id", T.bigrams("text").alias("bg")).collect()
    }
    assert got[1] == []  # <2 tokens: no descending-sequence footgun
    assert got[2] == ["two words"]
    assert got[3] == ["a b", "b c"]


def test_tfidf_ranks_rare_term_first(spark):
    # 'rare' appears in 1/4 docs, 'common' in all 4: within doc 1
    # (equal tf) the rare term must outrank the common one.
    df = spark.createDataFrame(
        [
            (1, "rare common"),
            (2, "common common filler"),
            (3, "common other filler"),
            (4, "common words filler"),
        ],
        "doc_id long, text string",
    )
    top = {
        (r.doc_id, r.rnk): r.tok
        for r in T.tfidf_topk(df, "doc_id", "text", k=2).collect()
    }
    assert top[(1, 1)] == "rare"
    # idf of an everywhere-term is ln(1) = 0 exactly
    scores = {
        (r.doc_id, r.tok): r.tfidf
        for r in T.tfidf_topk(df, "doc_id", "text", k=2).collect()
    }
    assert scores[(1, "common")] == 0.0


def test_resample_gapfill_fills_gaps_forward(spark):
    # user 7: events in buckets 0 and 2 (width 10s) -> grid 0,1,2 with
    # bucket 1 a gap carrying bucket 0's average forward.
    df = spark.createDataFrame(
        [
            (7, "2024-01-01 00:00:01", 10.0),
            (7, "2024-01-01 00:00:05", 20.0),
            (7, "2024-01-01 00:00:25", 40.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {
        r.bucket: r
        for r in resample_gapfill(df, "user_id", "ts", "value", width_sec=10)
        .withColumn("bucket", F.col("bucket") - F.lit(1704067200 // 10))
        .collect()
    }
    assert sorted(out) == [0, 1, 2]
    assert out[0].bucket_avg == 15.0 and out[0].filled == 15.0
    assert out[1].bucket_avg is None and out[1].filled == 15.0  # gap, ffilled
    assert out[2].bucket_avg == 40.0 and out[2].filled == 40.0


def test_resample_grid_is_dense_per_user(spark, sf_dir):
    from celeborn_spark.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    out = resample_gapfill(e, "user_id", "ts", "value", width_sec=300)
    span = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("bucket") - F.min("bucket") + 1).alias("expect"),
    )
    holes = span.filter(F.col("n") != F.col("expect")).count()
    assert holes == 0
    # first bucket of every user is non-empty => filled never NULL
    assert out.filter(F.col("filled").isNull()).count() == 0


def test_normalize_collapses_variants(spark):
    from celeborn_spark.operators.textops import normalize_text
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "HELLO WORLD."),
         (4, "different text")],
        ["doc_id", "text"],
    )
    hashes = {r.doc_id: r.h for r in
              df.select("doc_id", F.md5(normalize_text("text")).alias("h")).collect()}
    assert hashes[1] == hashes[2] == hashes[3]
    assert hashes[4] != hashes[1]


def test_text_chunks_overlap_and_coverage(spark):
    """Chunks tile the doc with the configured stride/overlap and the
    reassembled stride-prefixes reproduce the token stream."""
    import sys
    sys.path.insert(0, "/root/repo")
    from celeborn_spark.queries.text import CHUNK_SIZE, CHUNK_STRIDE
    from celeborn_spark.queries import text as qt
    from celeborn_spark.catalog import TABLES  # noqa: F401

    n_tokens = 300
    words = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(words))], ["doc_id", "text"])

    from pyspark.sql import functions as F
    from celeborn_spark.operators import textops as T
    t = df.select("doc_id", T.tokens("text").alias("toks")).select(
        "doc_id", "toks", F.size("toks").alias("n"))
    ks = t.filter(F.col("n") > 0).select(
        "doc_id", "toks",
        F.explode(F.sequence(F.lit(0),
            F.greatest(F.ceil(F.col("n") / CHUNK_STRIDE).cast("int") - 1, F.lit(0)))).alias("k"))
    chunk = F.slice(F.col("toks"), F.col("k") * CHUNK_STRIDE + 1, CHUNK_SIZE)
    rows = ks.select("k", F.size(chunk).alias("sz"),
                     F.array_join(chunk, " ").alias("txt")).collect()
    import math
    assert len(rows) == math.ceil(n_tokens / CHUNK_STRIDE)
    by_k = {r.k: r for r in rows}
    for k, r in by_k.items():
        start = k * CHUNK_STRIDE
        expect = words[start : start + CHUNK_SIZE]
        assert r.txt.split(" ") == expect, k


def test_compression_ratio_matches_zlib_and_orders_quality(spark, sf_dir):
    """Differential vs direct zlib, plus the semantic the filter relies
    on: templated/repetitive text compresses below prose."""
    import zlib

    from celeborn_spark.operators.textops import compression_ratio

    docs = {
        1: "the quick brown fox jumps over the lazy dog near the river bank today",
        2: "spam spam spam spam " * 20,
        3: "a",
    }
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    got = {r.doc_id: (r.n_bytes, r.zlib_ratio) for r in
           compression_ratio(df, "doc_id", "text").collect()}
    for i, t in docs.items():
        raw = t.encode("utf-8")
        assert got[i][0] == len(raw)
        assert got[i][1] == len(zlib.compress(raw, 6)) / len(raw)
    assert got[2][1] < got[1][1]  # repetitive << prose
    # corpus run produces a ratio for every doc
    from celeborn_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    out = compression_ratio(d, "doc_id", "text")
    assert out.count() == d.count()
    # the registered query's self-check bound holds corpus-wide
    from celeborn_spark.queries.text import q_compression_quality

    rows = q_compression_quality(spark, sf_dir).collect()
    assert rows and all(r.ratio_in_bounds for r in rows)


# --- BPE merge training (operators/textops.bpe_train) ---


def test_bpe_known_answer(spark):
    from celeborn_spark.operators.textops import bpe_train

    df = spark.createDataFrame([("aaab aaab ab",)], ["text"])
    got = [
        (r.merge_rank, r.pair, r.merged, r.pair_count)
        for r in bpe_train(df, "text", n_merges=2).orderBy("merge_rank").collect()
    ]
    # "aaab" freq 2 -> pairs (a,a)x2 each, (a,b); "ab" freq 1 -> (a,b)
    assert got[0] == (1, "a a", "aa", 4)
    # after merging: " aa a b " keeps (a,b); (a,b) total = 3 beats (aa,a) = 2
    assert got[1] == (2, "a b", "ab", 3)


def test_bpe_tie_breaks_lexicographically(spark):
    from celeborn_spark.operators.textops import bpe_train

    # "xy" and "uv" each appear twice: tie -> 'u v' < 'x y'
    df = spark.createDataFrame([("xy uv xy uv",)], ["text"])
    [r] = bpe_train(df, "text", n_merges=1).collect()
    assert (r.pair, r.pair_count) == ("u v", 2)


def test_bpe_ignores_non_alpha_words(spark):
    from celeborn_spark.operators.textops import bpe_train

    df = spark.createDataFrame([("ab ab 123 A9 ab!",)], ["text"])
    [r] = bpe_train(df, "text", n_merges=1).collect()
    assert r.pair == "a b" and r.pair_count == 2  # only the two clean "ab"


def test_bpe_rejects_bad_n_merges(spark):
    import pytest
    from celeborn_spark.operators.textops import bpe_train

    df = spark.createDataFrame([("ab",)], ["text"])
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(df, "text", n_merges=0)


def test_bpe_vs_oracle(spark, sf_dir):
    from celeborn_spark import registry
    from tests.oracle import assert_matches_oracle, duck_connection

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        registry.queries()["q_bpe_train"](spark, sf_dir),
        con,
        registry.oracles()["q_bpe_train"],
        "q_bpe_train",
    )


def test_bpe_apply_curve_monotone_and_baseline(spark, sf_dir):
    """Row 0 equals the raw character total of clean words; each merge
    strictly shrinks the corpus symbol count (it absorbs pair_count
    occurrences)."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.textops import bpe_apply_curve, tokens

    d = load_table(spark, sf_dir, "documents")
    curve = {
        r.n_merges_applied: r.total_symbols
        for r in bpe_apply_curve(d, "text", n_merges=3).collect()
    }
    chars = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    assert curve[0] == chars
    assert curve[0] > curve[1] > curve[2] > curve[3]


def test_bpe_apply_curve_vs_oracle(spark, sf_dir):
    from celeborn_spark import registry
    from tests.oracle import assert_matches_oracle, duck_connection

    con = duck_connection(sf_dir)
    assert_matches_oracle(
        registry.queries()["q_bpe_apply_curve"](spark, sf_dir),
        con,
        registry.oracles()["q_bpe_apply_curve"],
        "q_bpe_apply_curve",
    )


def test_cms_overestimates_only(spark, sf_dir):
    """The count-min guarantee: estimates never undercount."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.textops import cms_heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    rows = cms_heavy_hitters(d, "text", depth=4, width=256, k=20).collect()
    assert len(rows) == 20
    assert all(r.cms_est >= r.true_count for r in rows)


def test_cms_exact_when_no_collisions(spark):
    """A vocabulary far smaller than the sketch width estimates
    exactly with high probability across 4 rows — and never under."""
    from celeborn_spark.operators.textops import cms_heavy_hitters

    df = spark.createDataFrame(
        [("aa bb aa cc aa bb",)], ["text"]
    )
    got = {r.token: (r.true_count, r.cms_est) for r in
           cms_heavy_hitters(df, "text", depth=4, width=1024, k=3).collect()}
    assert got["aa"][0] == 3 and got["aa"][1] == 3
    assert got["bb"][0] == 2 and got["bb"][1] >= 2


# --- sparse TF-IDF cosine pairs (operators/textops.sparse_cosine_pairs) ---


def test_sparse_cosine_identical_docs_score_one(spark):
    """Two identical docs: cosine exactly 1.0 (identical weight
    vectors); an unrelated doc pairs below threshold or not at all."""
    from celeborn_spark.operators.textops import sparse_cosine_pairs

    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta gamma"),
        (3, "delta epsilon zeta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert got == {(1, 2): 1.0}


def test_sparse_cosine_salience_weighting(spark):
    """Docs sharing only a CORPUS-UNIVERSAL term score far below docs
    sharing a rare term — the idf weighting Jaccard lacks. With 'the'
    in every doc its idf is ln(1) = 0, so pair (1,2) (sharing only
    'the') scores 0 while (3,4) share the rare 'quark'."""
    from celeborn_spark.operators.textops import sparse_cosine_pairs

    rows = [
        (1, "the cat"),
        (2, "the dog"),
        (3, "the quark spin"),
        (4, "the quark charm"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in sparse_cosine_pairs(df, "doc_id", "text", threshold=0.2).collect()
    }
    assert (1, 2) not in got
    assert got.get((3, 4), 0.0) >= 0.2  # = w^2 / 5w^2 exactly


def test_sparse_cosine_blocking_isolates(spark):
    """With block_col, identical docs in DIFFERENT blocks never pair."""
    from celeborn_spark.operators.textops import sparse_cosine_pairs

    rows = [
        (1, "same words here", "s1"),
        (2, "same words here", "s2"),
        (3, "same words here", "s1"),
        (5, "unrelated tokens entirely", "s1"),   # keeps s1 idfs nonzero
        (6, "completely different stuff", "s2"),  # keeps s2 idfs nonzero
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {
        (r.id_a, r.id_b)
        for r in sparse_cosine_pairs(
            df, "doc_id", "text", threshold=0.5, block_col="source"
        ).collect()
    }
    assert (1, 3) in got
    assert all(a != 2 and b != 2 for a, b in got)  # cross-block never


# --- incremental join maintenance (operators/incremental.delta_join) ---


def test_delta_join_covers_all_cross_terms(spark):
    """Keys matched base-base, base-delta, delta-base, delta-delta:
    previous + delta == full recompute as a multiset."""
    from celeborn_spark.operators.incremental import delta_join

    a_base = spark.createDataFrame([(1, "ab1"), (2, "ab2")], ["k", "pa"])
    a_delta = spark.createDataFrame([(2, "ad2"), (3, "ad3")], ["k", "pa"])
    b_base = spark.createDataFrame([(1, "bb1"), (3, "bb3")], ["k", "pb"])
    b_delta = spark.createDataFrame([(2, "bd2"), (3, "bd3")], ["k", "pb"])
    full_a = a_base.unionByName(a_delta)
    full_b = b_base.unionByName(b_delta)
    recompute = sorted(
        tuple(r) for r in full_a.join(full_b, "k").collect()
    )
    incremental = sorted(
        tuple(r)
        for r in a_base.join(b_base, "k")
        .unionByName(delta_join(a_base, a_delta, b_base, b_delta, "k"))
        .collect()
    )
    assert incremental == recompute
