"""Property-based test: pack_sequences vs a pure-Python reference on
randomized per-stream doc lengths (the repo's hypothesis differential
pattern, see tests/test_property_dedup.py)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from celeborn_spark.operators.packing import pack_sequences

CTX = 16

streams_strategy = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=8),
    min_size=1,
    max_size=3,
)


def _py_pack(lengths: list[int], ctx: int) -> list[tuple[int, int, int, int]]:
    """(doc_idx, seq_id, doc_offset, piece_tokens) per span."""
    out, start = [], 0
    for i, n in enumerate(lengths):
        end = start + n
        for seq in range(start // ctx, (end - 1) // ctx + 1):
            lo, hi = max(start, seq * ctx), min(end, (seq + 1) * ctx)
            out.append((i, seq, lo - start, hi - lo))
        start = end
    return out


@given(streams_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_sequences_matches_python_reference(spark, streams):
    rows = [
        (s, i, " ".join(["t"] * n))
        for s, lengths in streams.items()
        for i, n in enumerate(lengths)
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    got = sorted(
        (r.source, r.doc_id, r.seq_id, r.doc_offset, r.piece_tokens)
        for r in pack_sequences(df, "source", "doc_id", "text", ctx=CTX).collect()
    )
    want = sorted(
        (s, i, seq, off, k)
        for s, lengths in streams.items()
        for (i, seq, off, k) in _py_pack(lengths, CTX)
    )
    assert got == want


def test_pack_sequences_null_and_empty_text(spark):
    """NULL text (size(split)=-1) and zero-token docs emit NO spans and
    occupy no tokens — without the guard F.sequence(first, last) flips
    DESCENDING on first > last and fabricates rows (ADVICE r4)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("source", StringType()),
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    rows = [("a", 0, "t t t"), ("a", 1, None), ("a", 2, "t t")]
    df = spark.createDataFrame(rows, schema)
    got = sorted(
        (r.doc_id, r.seq_id, r.doc_offset, r.piece_tokens)
        for r in pack_sequences(df, "source", "doc_id", "text", ctx=4).collect()
    )
    # doc 0 = tokens [0,3), doc 1 = nothing, doc 2 = tokens [3,5)
    assert got == [(0, 0, 0, 3), (2, 0, 0, 1), (2, 1, 1, 1)]


def test_greedy_shards_null_text_counts_zero(spark):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from celeborn_spark.operators.packing import greedy_token_shards

    schema = StructType(
        [
            StructField("source", StringType()),
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )
    df = spark.createDataFrame([("a", 0, None), ("a", 1, "t t")], schema)
    out = {r.doc_id: (r.n_tokens, r.shard_id) for r in
           greedy_token_shards(df, "source", "doc_id", "text", budget=10).collect()}
    # NULL doc contributes 0 tokens (not -1 corrupting the prefix sum)
    assert out == {0: (0, 0), 1: (2, 0)}
