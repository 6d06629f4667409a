"""Sources & sinks surface (SURVEY.md §2A readers/writers + lake ops)."""

from celeborn_spark.sources.io import (
    compact_parquet,
    lake_format_available,
    read_any,
    write_any,
    write_partitioned,
    write_sorted_buckets,
    write_zordered,
    zorder_value,
)

__all__ = [
    "compact_parquet",
    "lake_format_available",
    "read_any",
    "write_any",
    "write_partitioned",
    "write_sorted_buckets",
    "write_zordered",
    "zorder_value",
]
