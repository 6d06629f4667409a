"""Grouped-map Pandas operators (Arrow path) — the sanctioned escape
hatch when per-group logic doesn't compose from built-ins
(pyspark_guide: applyInPandas; SNIPPETS.md patterns).

Kept deliberately small: every op here has per-group memory bounded by
the group size, so at 100 TB the partitioning key must be
high-cardinality (user, document), never a handful of giant groups.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_zscore(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Per-group z-score of value_col via applyInPandas. Semantically
    identical to the window form (x - avg) / stddev_samp — which is the
    DuckDB oracle in queries/pandas_surface.py, making this a
    differential test of the Arrow grouped-map path itself."""
    schema = f"{group_col} long, {id_col} long, zscore double"

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        out = pd.DataFrame(
            {
                group_col: pdf[group_col],
                id_col: pdf[id_col],
                "zscore": (pdf[value_col] - mean) / std,
            }
        )
        return out

    return df.groupBy(group_col).applyInPandas(z, schema=schema)


def cogroup_merge_asof(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    left_cols: list[str],
    right_payload: list[str],
    buckets: int = 64,
) -> DataFrame:
    """Backward as-of join via COGROUPED applyInPandas — the Arrow
    cogroup API surface (two grouped relations delivered to one pandas
    kernel): the kernel runs ONE vectorized ``pd.merge_asof(by=key)``
    over a whole KEY BUCKET, not a per-key loop. Semantically identical
    to the JVM union+window `operators/asof.asof_join` (pinned by the
    differential test and by q_cogroup_asof's oracle); that form
    remains THE scale path — this one exists for kernels that genuinely
    need pandas (model scoring against a per-key reference series).

    Bucketing (VERDICT r8 perf item): cogrouping on the raw key paid
    one Arrow kernel invocation PER KEY — ~10.6 s at sf0.1, per-key
    Python throughput being the scale-killer class. Grouping on
    ``pmod(xxhash64(key), buckets)`` instead amortizes the invocation
    over ~n_keys/buckets keys while merge_asof's ``by=`` does the
    per-key alignment C-side (measured 10.6 -> ~1 s at sf0.1). The
    bucket is derived FROM DATA, never spark_partition_id (r7 lesson:
    each cogroup subtree re-evaluates partition ids post-exchange with
    different results). Both sides shuffle once on the bucket; each
    bucket must fit one worker's memory — at 100 TB size ``buckets``
    ~ total_rows / (arrow_batch_target), keeping per-kernel frames
    O(100 MB)."""
    import pandas as pd

    lschema = ", ".join(
        f"{c} {t}" for c, t in left.select(key_col, ts_col, *left_cols).dtypes
    )
    pschema = ", ".join(
        f"{c} {t}" for c, t in right.select(*right_payload).dtypes
    )
    schema = f"{lschema}, {pschema}"
    # When both sides derive from the SAME source relation, shared
    # attributes carry one exprId and cogroup DEDUPLICATES them — the
    # right pandas frame silently arrives without its ts (and, now that
    # the key is not the grouping column, key) columns (observed:
    # clicks/views both from events). Private renames on the right side
    # force distinct attributes.
    rts = f"__{ts_col}_r"
    rkey = f"__{key_col}_r"
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets)).alias("__bucket")

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(
                columns=[key_col, ts_col, *left_cols, *right_payload]
            )
        l = l.sort_values([ts_col])
        if r.empty:
            out = l.copy()
            for c in right_payload:
                out[c] = None
            return out[[key_col, ts_col, *left_cols, *right_payload]]
        r = r.sort_values([rts])
        out = pd.merge_asof(
            l,
            r[[rkey, rts, *right_payload]],
            left_on=ts_col,
            right_on=rts,
            left_by=key_col,
            right_by=rkey,
            direction="backward",
            allow_exact_matches=True,
        )
        return out[[key_col, ts_col, *left_cols, *right_payload]]

    l_sel = left.select(bucket, key_col, ts_col, *left_cols)
    r_sel = right.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(buckets)).alias("__bucket"),
        F.col(key_col).alias(rkey),
        F.col(ts_col).alias(rts),
        *right_payload,
    )
    return (
        l_sel.groupBy("__bucket")
        .cogroup(r_sel.groupBy("__bucket"))
        .applyInPandas(merge, schema=schema)
    )
