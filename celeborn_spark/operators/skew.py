"""Skew-handling operators: salted join + salted aggregation helpers.

AQE's skew-join split (the built-in analogue of the reference's
chunk-range skew split, CelebornPartitionUtil.java:60-130 +
OptimizeSkewedJoin) handles most skew. The salted join below is the
manual fallback for EXTREME single-key skew — one hot key larger than
an executor — where even a split partition won't fit: the probe side
spreads each key over `n_salts` reducers and the build side replicates
`n_salts`x, trading build-side duplication for even probe fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the probe side salted and the build side replicated.

    The salt only balances partitioning — any per-row assignment works,
    so it hashes the probe key with a row-position-free spread column.
    Result == probe.join(build, probe_key == build_key, how); columns:
    probe's then build's (both key columns retained).

    Only probe-preserving join types are supported: the build side is
    replicated n_salts times, so build-preserving types ('right',
    'full'/'outer') would emit each unmatched build row n_salts times.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports probe-preserving join types {sorted(allowed)}; "
            f"got {how!r} (the replicated build side would duplicate "
            f"unmatched build rows)"
        )
    probe_s = probe.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(probe_key), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    build_s = build.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    joined = probe_s.join(
        build_s,
        (probe_s[probe_key] == build_s[build_key]) & (probe_s["_salt"] == build_s["_salt"]),
        how,
    )
    return joined.drop("_salt")
