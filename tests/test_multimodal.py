"""Multimodal plumbing: binary payload column + Arrow mapInPandas fake
decode — schema, determinism, and the stubbed real codec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import multimodal as M


def test_fake_decode_schema_and_determinism(spark, sf_dir):
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents").limit(50))
    out = M.fake_decode_meta(d)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "format", "fake_width", "fake_height",
    ]
    rows1 = {r.doc_id: (r.n_bytes, r.format) for r in out.collect()}
    rows2 = {r.doc_id: (r.n_bytes, r.format) for r in M.fake_decode_meta(d).collect()}
    assert rows1 == rows2
    src = {r.doc_id: r.n_chars for r in
           load_table(spark, sf_dir, "documents").limit(50).collect()}
    for doc_id, (n_bytes, fmt) in rows1.items():
        assert n_bytes >= src[doc_id] > 0  # utf-8 length >= char count
        assert fmt in ("textish", "binary")


def test_arrow_decode_matches_jvm_form(spark, sf_dir):
    """Differential: the Arrow mapInPandas kernel and the registered
    JVM-side projection (decode_meta_jvm) agree row-for-row — including
    the first-byte vs first-codepoint 'format' class on non-ASCII and
    empty payloads."""
    docs = load_table(spark, sf_dir, "documents").limit(200)
    edge = spark.createDataFrame(
        [(100001, "é-leading multibyte"), (100002, ""), (100003, "Zed"), (100004, "zed")],
        ["doc_id", "text"],
    )
    d = M.attach_binary_payload(docs.select("doc_id", "text").unionByName(edge))
    arrow = {r.doc_id: tuple(r)[1:] for r in M.fake_decode_meta(d).collect()}
    jvm = {r.doc_id: tuple(r)[1:] for r in M.decode_meta_jvm(d).collect()}
    assert arrow == jvm


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_media(b"\x89PNG...")


def test_payload_is_binary_type(spark, sf_dir):
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    assert dict(d.dtypes)["payload"] == "binary"


def test_binary_file_to_decode_pipeline(spark, tmp_path):
    """End-to-end multimodal ingestion: raw blobs on disk -> binaryFile
    source -> Arrow mapInPandas decode. Pins that the source's
    (path, content) schema feeds the decoder unchanged."""
    import pathlib

    from celeborn_spark.operators.multimodal import fake_decode_meta
    from celeborn_spark.sources import read_any
    from pyspark.sql import functions as F

    d = tmp_path / "blobs"
    d.mkdir()
    payloads = {0: b"abc-textish-payload", 1: b"\x89PNG\r\n-binary"}
    for i, p in payloads.items():
        pathlib.Path(d, f"{i}.bin").write_bytes(p)
    blobs = (
        read_any(spark, str(d), "binaryFile")
        .select(
            F.regexp_extract(F.col("path"), r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    meta = {r.doc_id: (r.n_bytes, r.format) for r in fake_decode_meta(blobs).collect()}
    assert meta == {0: (len(payloads[0]), "textish"), 1: (len(payloads[1]), "binary")}


def test_fake_resize_tiles_to_exact_length(spark):
    from celeborn_spark.operators.multimodal import attach_binary_payload, fake_resize_media

    df = attach_binary_payload(
        spark.createDataFrame([(1, "ab"), (2, "x" * 500), (3, "")], ["doc_id", "text"])
    )
    rows = {r.doc_id: r.out_chars for r in fake_resize_media(df, out_chars=100).collect()}
    assert rows == {1: 100, 2: 100}  # empty payload dropped


def test_sample_frames_fan_out_counts(spark):
    import math

    from celeborn_spark.operators.multimodal import attach_binary_payload, sample_frames

    texts = {1: "a" * 300, 2: "b" * 64, 3: "c" * 65}
    df = attach_binary_payload(
        spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    )
    out = sample_frames(df, frame_chars=64, every_n=4).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.frame_idx, r.frame_chars))
    for doc_id, text in texts.items():
        n_frames = math.ceil(len(text) / 64)
        expect = [(k, min(64, len(text) - k * 64)) for k in range(0, n_frames, 4)]
        assert sorted(got[doc_id]) == expect, (doc_id, got[doc_id], expect)


def test_chunk_payload_boundaries_and_digests(spark):
    """Chunks tile the payload exactly: offsets stride by chunk size,
    the tail chunk is short, digests match hashlib on the bytes."""
    import hashlib

    from celeborn_spark.operators.multimodal import (
        attach_binary_payload,
        chunk_payload,
    )

    df = attach_binary_payload(
        spark.createDataFrame([(1, "abcdefghij"), (2, "xy")], ["doc_id", "text"])
    )
    rows = sorted(
        (r.doc_id, r.chunk_idx, r.offset, r.n_bytes, r.chunk_md5)
        for r in chunk_payload(df, chunk_bytes=4).collect()
    )
    assert rows == [
        (1, 0, 0, 4, hashlib.md5(b"abcd").hexdigest()),
        (1, 1, 4, 4, hashlib.md5(b"efgh").hexdigest()),
        (1, 2, 8, 2, hashlib.md5(b"ij").hexdigest()),
        (2, 0, 0, 2, hashlib.md5(b"xy").hexdigest()),
    ]


def test_chunk_payload_mass_conservation(spark, sf_dir):
    """Sum of chunk byte counts == total payload bytes (no gap, no
    overlap), and every chunk but each doc's last is full-size."""
    from celeborn_spark.catalog import load_table
    from celeborn_spark.operators.multimodal import (
        attach_binary_payload,
        chunk_payload,
    )
    from pyspark.sql import functions as F

    d = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    chunks = chunk_payload(d, chunk_bytes=64).localCheckpoint()
    total_chunked = chunks.agg(F.sum("n_bytes")).collect()[0][0]
    total_payload = d.agg(F.sum(F.octet_length("payload"))).collect()[0][0]
    assert total_chunked == total_payload
    short = chunks.withColumn(
        "max_idx", F.max("chunk_idx").over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("doc_id"))
    ).filter((F.col("chunk_idx") != F.col("max_idx")) & (F.col("n_bytes") != 64))
    assert short.count() == 0


def test_chunk_payload_rejects_bad_size(spark):
    import pytest

    from celeborn_spark.operators.multimodal import (
        attach_binary_payload,
        chunk_payload,
    )

    df = attach_binary_payload(spark.createDataFrame([(1, "x")], ["doc_id", "text"]))
    with pytest.raises(ValueError, match="chunk_bytes"):
        chunk_payload(df, chunk_bytes=0)
