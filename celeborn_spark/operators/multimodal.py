"""Multimodal columns: opaque binary payloads + typed metadata
(SURVEY.md §2C).

Design: media travels as BinaryType columns with sidecar metadata —
the reference's stance taken to the engine level (its data plane moves
opaque byte[] batches, ShuffleClientImpl.java:1373; typing lives at the
edges). Decode / feature-extract run as Arrow-batched mapInPandas so
each task streams record batches without materializing a partition.

The actual codecs (PIL/libav) are NOT in this container — decode_media
is a clearly marked stub; fake_decode_meta is the deterministic stand-in
that keeps the Spark-side plumbing (schema, batch iteration, partition
layout) real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, format string, fake_width int, fake_height int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload: utf-8 bytes of the text column. Real pipelines read
    image/audio bytes from parquet BinaryType or object-store URIs."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_media(payload: bytes) -> dict:
    """Real media decode — requires PIL/av, absent from this container."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_decode_meta for plumbing tests"
    )


def fake_decode_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in decoder over Arrow batches (mapInPandas).

    Emits per-payload metadata computed purely from the bytes (length,
    sniffed 'format', fake dimensions) so tests can pin schema, batch
    shape and determinism without real codecs.
    """
    id_c, pay_c = id_col, payload_col

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[pay_c]
            n_bytes = payloads.map(len)
            first = payloads.map(lambda b: b[:1] or b"\x00")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_c],
                    "n_bytes": n_bytes.astype("int64"),
                    "format": first.map(lambda b: "textish" if 97 <= b[0] <= 122 else "binary"),
                    "fake_width": (n_bytes % 1920).astype("int32"),
                    "fake_height": (n_bytes % 1080).astype("int32"),
                }
            )

    return df.select(id_c, pay_c).mapInPandas(decode_batches, schema=DECODE_SCHEMA)
