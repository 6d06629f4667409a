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
