"""Shard / sequence packing semantics (operators/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from celeborn_spark.operators.packing import greedy_token_shards, pack_sequences


def _docs(spark, rows):
    # (stream, id, n_tokens) -> text of n single-char tokens
    return spark.createDataFrame(
        [(s, i, " ".join(["t"] * n)) for s, i, n in rows],
        ["source", "doc_id", "text"],
    )


def test_shard_ids_monotone_per_stream(spark):
    df = _docs(spark, [("a", 1, 5), ("a", 2, 5), ("a", 3, 5), ("b", 1, 12)])
    out = {(r.source, r.doc_id): r.shard_id
           for r in greedy_token_shards(df, "source", "doc_id", "text", budget=8).collect()}
    # a: prefix sums before = 0, 5, 10 -> shards 0, 0, 1; b restarts at 0
    assert out == {("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("b", 1): 0}


def test_pack_sequences_splits_across_boundaries(spark):
    # stream a: docs of 3, 6, 2 tokens; ctx=4
    # concatenated stream: [0,3) [3,9) [9,11)
    # doc 2 spans sequences 0 (token 3), 1 (tokens 4-7), 2 (token 8);
    # doc 3 lives inside sequence 2
    df = _docs(spark, [("a", 1, 3), ("a", 2, 6), ("a", 3, 2)])
    out = pack_sequences(df, "source", "doc_id", "text", ctx=4)
    rows = sorted((r.doc_id, r.seq_id, r.doc_offset, r.piece_tokens)
                  for r in out.collect())
    assert rows == [
        (1, 0, 0, 3),
        (2, 0, 0, 1),
        (2, 1, 1, 4),
        (2, 2, 5, 1),
        (3, 2, 0, 2),
    ]


def test_pack_sequences_full_sequences_exact(spark, sf_dir):
    """Every non-final sequence per stream holds exactly ctx tokens and
    the total token mass is conserved."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.textops import token_count

    d = load_table(spark, sf_dir, "documents")
    out = pack_sequences(d, "source", "doc_id", "text", ctx=256)
    sums = out.groupBy("source", "seq_id").agg(F.sum("piece_tokens").alias("s"))
    last = sums.groupBy("source").agg(F.max("seq_id").alias("m"))
    bad = sums.join(last, "source").filter(
        (F.col("seq_id") != F.col("m")) & (F.col("s") != 256)
    )
    assert bad.count() == 0
    total_packed = out.agg(F.sum("piece_tokens")).collect()[0][0]
    total_tokens = d.select(
        token_count("text").cast("long").alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total_packed == total_tokens
