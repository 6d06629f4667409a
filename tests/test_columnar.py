"""Columnar-encoding verification (SURVEY §2A A9/A10): parquet
dictionary pages actually on/off per config, and the Arrow batch shape
of the mapInPandas path — the engine-side pins for the reference's
columnar shuffle + per-column DictionaryEncoding
(client-spark/spark-3-columnar-shuffle/.../CelebornCompressionSchemes.scala:246,
CelebornColumnarBatchBuilder; its suites under
client-spark/spark-3-columnar-shuffle/src/test are the analogue).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _chunk_encodings(path: str, column: str) -> set[str]:
    encs: set[str] = set()
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column:
                    encs.update(str(e) for e in col.encodings)
    return encs


def test_parquet_dictionary_encoding_on_off(spark, tmp_path):
    """Low-cardinality column writes dictionary pages by default; with
    parquet.enable.dictionary=false it must not (A10: DictionaryEncoding
    chosen by stats vs PassThrough)."""
    df = spark.range(20_000).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("status")
    )
    on_dir, off_dir = str(tmp_path / "dict_on"), str(tmp_path / "dict_off")
    df.write.mode("overwrite").parquet(on_dir)
    (
        df.write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .parquet(off_dir)
    )
    on_encs = _chunk_encodings(on_dir, "status")
    off_encs = _chunk_encodings(off_dir, "status")
    assert any("DICTIONARY" in e for e in on_encs), on_encs
    assert not any("DICTIONARY" in e for e in off_encs), off_encs


def test_arrow_batch_shape_respects_max_records(spark):
    """The mapInPandas Arrow path must deliver column-complete pandas
    batches capped at spark.sql.execution.arrow.maxRecordsPerBatch (A9:
    row->column batching at the engine boundary)."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.range(1000).repartition(1).select(
            F.col("id"), (F.col("id") * 2).alias("x")
        )

        def batch_stats(batches):
            import pandas as pd

            for pdf in batches:
                yield pd.DataFrame(
                    {"n_rows": [len(pdf)], "cols": [",".join(sorted(pdf.columns))]}
                )

        stats = df.mapInPandas(batch_stats, "n_rows long, cols string").collect()
        assert sum(r.n_rows for r in stats) == 1000
        assert all(r.cols == "id,x" for r in stats), "batches missing columns"
        assert max(r.n_rows for r in stats) <= 100, "batch exceeded cap"
        assert len(stats) >= 10, f"expected >=10 capped batches, got {len(stats)}"
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
