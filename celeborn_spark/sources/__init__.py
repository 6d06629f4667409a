from celeborn_spark.sources.io import (
    read_any,
    write_any,
    write_partitioned,
    write_sorted_buckets,
)

__all__ = ["read_any", "write_any", "write_partitioned", "write_sorted_buckets"]
