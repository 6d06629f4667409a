"""Known-answer tests for q_multimodal_energy — the Arrow-batched
frame-energy kernel (operators/multimodal.fake_frame_energy). DuckDB
parity is pinned by tests/test_queries_vs_oracle.py.
"""

from __future__ import annotations

import math


def test_frame_energy_hand_values(spark):
    from celeborn_spark.operators.multimodal import (
        attach_binary_payload,
        fake_frame_energy,
    )

    # 'a' * 64 -> two frames of byte 97: rms = 97.0 exactly
    df = spark.createDataFrame([(1, "a" * 64)], ["doc_id", "text"])
    rows = sorted(
        fake_frame_energy(
            attach_binary_payload(df), frame_bytes=32
        ).collect(),
        key=lambda r: r["frame_id"],
    )
    assert [r["frame_id"] for r in rows] == [0, 1]
    assert all(r["rms"] == 97.0 and r["n_bytes"] == 32 for r in rows)


def test_frame_energy_drops_partial_tail(spark):
    from celeborn_spark.operators.multimodal import (
        attach_binary_payload,
        fake_frame_energy,
    )

    # 40 bytes -> one full 32-byte frame only
    df = spark.createDataFrame([(1, "b" * 40)], ["doc_id", "text"])
    rows = fake_frame_energy(
        attach_binary_payload(df), frame_bytes=32
    ).collect()
    assert len(rows) == 1 and rows[0]["frame_id"] == 0
    assert rows[0]["rms"] == 98.0
    # too-short payload -> zero frames
    short = spark.createDataFrame([(2, "c" * 10)], ["doc_id", "text"])
    assert (
        fake_frame_energy(attach_binary_payload(short), frame_bytes=32)
        .count()
        == 0
    )


def test_frame_energy_mixed_bytes(spark):
    from celeborn_spark.operators.multimodal import (
        attach_binary_payload,
        fake_frame_energy,
    )

    # 16 'a' + 16 ' ' -> rms = sqrt((16*97^2 + 16*32^2)/32)
    df = spark.createDataFrame([(1, "a" * 16 + " " * 16)], ["doc_id", "text"])
    rows = fake_frame_energy(
        attach_binary_payload(df), frame_bytes=32
    ).collect()
    want = round(math.sqrt((16 * 97 * 97 + 16 * 32 * 32) / 32), 6)
    assert rows[0]["rms"] == want
