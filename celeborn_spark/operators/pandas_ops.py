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
) -> DataFrame:
    """Backward as-of join via COGROUPED applyInPandas — the Arrow
    cogroup API surface (two grouped relations delivered to one pandas
    kernel per key): each key's left/right slices meet in a
    pd.merge_asof. Semantically identical to the JVM union+window
    `operators/asof.asof_join` (pinned by the differential test and by
    q_cogroup_asof's oracle); that form remains THE scale path — this
    one exists for kernels that genuinely need pandas per key group
    (model scoring against a per-key reference series). The cogroup
    shuffles both sides on the key once; each group must fit one
    worker's memory (the documented applyInPandas contract)."""
    import pandas as pd

    lschema = ", ".join(
        f"{c} {t}" for c, t in left.select(key_col, ts_col, *left_cols).dtypes
    )
    pschema = ", ".join(
        f"{c} {t}" for c, t in right.select(*right_payload).dtypes
    )
    schema = f"{lschema}, {pschema}"
    # When both sides derive from the SAME source relation, the shared
    # ts attribute carries one exprId and cogroup DEDUPLICATES it — the
    # right pandas frame silently arrives without its ts column
    # (observed: clicks/views both from events). A private rename on
    # the right side forces a distinct attribute.
    rts = f"__{ts_col}_r"

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
            r[[rts, *right_payload]],
            left_on=ts_col,
            right_on=rts,
            direction="backward",
            allow_exact_matches=True,
        )
        return out[[key_col, ts_col, *left_cols, *right_payload]]

    r_sel = right.select(
        F.col(key_col), F.col(ts_col).alias(rts), *right_payload
    )
    return (
        left.select(key_col, ts_col, *left_cols)
        .groupBy(key_col)
        .cogroup(r_sel.groupBy(key_col))
        .applyInPandas(merge, schema=schema)
    )
