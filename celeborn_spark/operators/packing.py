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
        stream_col, id_col, token_count(text_col).cast("long").alias("n_tokens")
    )
    return counted.withColumn(
        "shard_id",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / budget).cast("long"),
    )
