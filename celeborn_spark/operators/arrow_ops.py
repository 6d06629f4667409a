"""Arrow-native batch operators (mapInArrow) — the zero-copy sibling
of the pandas grouped-map path (operators/pandas_ops.py): the kernel
receives raw ``pyarrow.RecordBatch``es, so there is no pandas
conversion on either side of the fence. Use this tier when the kernel
is expressible in pyarrow/numpy vectorized calls and the per-batch
pandas materialization (object headers, index) is measurable overhead
— e.g. numeric kernels over large array columns.

Kept to the same contract as the pandas tier: per-batch memory is
bounded by the Arrow batch size (spark.sql.execution.arrow
.maxRecordsPerBatch), and kernels must be deterministic and
order-independent so the oracle comparison holds.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


def arrow_l2_norms(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, norm): per-row L2 norm of an array<float> column computed
    INSIDE a mapInArrow kernel — flatten the list array once, square
    in float64, and segment-sum with ``np.add.reduceat`` over the
    list offsets (strictly sequential accumulation, matching the JVM
    ``aggregate`` and DuckDB ``list_sum`` order bit for bit; numpy's
    pairwise-summation shortcut applies to ``np.add.reduce``, not
    ``reduceat``). The 6dp round is tie-safe through sqrt.

    This is the API-surface demonstrator for the Arrow-native tier —
    the JVM expression form (queries/similarity.q_embedding_norms) is
    the scale default for THIS kernel; mapInArrow earns its keep when
    the kernel needs numpy/pyarrow calls the JVM lacks."""
    import numpy as np
    import pyarrow as pa

    id_idx_schema = f"{dict(df.dtypes)[id_col]}"

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            vecs = batch.column(batch.schema.get_field_index(vec_col))
            # .values is the UNSLICED child array and .offsets index into
            # it absolutely, so sliced batches stay aligned (flatten()
            # would return slice-relative values against absolute
            # offsets — a silent misalignment).
            flat = vecs.values.to_numpy(zero_copy_only=False).astype(np.float64)
            offsets = vecs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            sq = flat * flat
            starts = offsets[:-1]
            # reduceat over [start_i, start_{i+1}); empty lists yield 0
            sums = (
                np.add.reduceat(sq, starts)
                if len(sq)
                else np.zeros(len(starts))
            )
            lengths = np.diff(offsets)
            sums = np.where(lengths > 0, sums, 0.0)
            norms = np.round(np.sqrt(sums), 6)
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(norms, type=pa.float64())],
                names=[id_col, "norm"],
            )

    return df.select(id_col, vec_col).mapInArrow(
        kernel, schema=f"{id_col} {id_idx_schema}, norm double"
    )


def arrow_norms_oracle_sql(
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB mirror of `arrow_l2_norms`: sequential list_sum of
    squared doubles, sqrt, 6dp."""
    return f"""
    SELECT {id_col},
           round(sqrt(coalesce(list_sum(
               list_transform({vec_col}::DOUBLE[], x -> x * x)), 0.0)), 6)
               AS norm
    FROM {table}
    """
