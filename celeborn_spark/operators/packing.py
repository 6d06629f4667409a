"""Training-shard packing: assign documents to fixed-token-budget
shards — the layout step before writing training data (each shard ==
one output file/sequence pack).

Deterministic greedy packing per stream: order docs by id, running
token total, shard = floor(tokens_before / budget). One window
exchange per stream key; at 100 TB the stream key (source/domain)
partitions the work and each shard maps to one output partition via
partitionBy("source", "shard_id") at the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from celeborn_spark.operators.textops import token_count


def greedy_token_shards(
    df: DataFrame,
    stream_col: str,
    id_col: str,
    text_col: str,
    budget: int,
) -> DataFrame:
    """(stream, id, n_tokens, shard_id): docs in id order, shard_id =
    floor(prefix_token_sum_before_doc / budget).

    This is deterministic BINNING, not true greedy bin-closing: a shard
    may overflow the budget by up to one doc (the doc straddling a
    boundary lands in the earlier shard), an oversized doc can share
    its shard with preceding docs, and shard ids may skip when a doc
    spans multiple budget multiples. The tradeoff is scale: one window
    per stream key and no sequential state, where true greedy closing
    needs a running remainder that doesn't parallelize."""
    w = (
        W.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    counted = df.select(
        stream_col,
        id_col,
        # NULL text makes size(split(...)) = -1; clamp so a bad row
        # contributes 0 tokens instead of corrupting the prefix sums.
        F.greatest(F.lit(0), token_count(text_col)).cast("long").alias("n_tokens"),
    )
    return counted.withColumn(
        "shard_id",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget).cast("long"),
    )


def pack_sequences(
    df: DataFrame,
    stream_col: str,
    id_col: str,
    text_col: str,
    ctx: int,
) -> DataFrame:
    """Fixed-context sequence packing: concatenate each stream's docs in
    id order and cut the token stream into exact `ctx`-token training
    sequences, docs splitting across boundaries — the standard packed
    pretraining layout (vs greedy_token_shards, which bins whole docs).

    Output: (stream, id, seq_id, doc_offset, piece_tokens) — one row
    per (doc, sequence) span; a doc straddling k boundaries fans out to
    k+1 rows. doc_offset is the span's token start within the doc.

    Scale shape: one window exchange per stream key for the prefix sum,
    then a narrow sequence/explode fan-out (bounded by n_tokens/ctx + 1
    rows per doc) — no global sort, no driver state; all-integer
    arithmetic, so engine-exact."""
    w = (
        W.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    span = (
        df.select(
            stream_col,
            id_col,
            # NULL text makes size(split(...)) = -1; clamp to 0 so empty
            # docs occupy no tokens in the stream (and can't flip the
            # sequence() below into descending order).
            F.greatest(F.lit(0), token_count(text_col)).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "tok_start", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
        )
        .withColumn("tok_end", (F.col("tok_start") + F.col("n_tokens")).cast("long"))
    )
    first = F.expr(f"tok_start div {ctx}")
    last = F.expr(f"(tok_end - 1) div {ctx}")
    piece_start = F.greatest("tok_start", (F.col("seq_id") * ctx).cast("long"))
    piece_end = F.least("tok_end", ((F.col("seq_id") + 1) * ctx).cast("long"))
    return (
        # zero-token docs emit no spans (first > last would otherwise make
        # F.sequence generate a DESCENDING range and fabricate rows)
        span.where(F.col("n_tokens") > 0)
        .withColumn("seq_id", F.explode(F.sequence(first, last)))
        .select(
            stream_col,
            id_col,
            F.col("seq_id").cast("long").alias("seq_id"),
            (piece_start - F.col("tok_start")).cast("long").alias("doc_offset"),
            (piece_end - piece_start).cast("long").alias("piece_tokens"),
        )
    )
