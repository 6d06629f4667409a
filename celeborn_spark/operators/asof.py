"""As-of join and bucketed range join — operators Spark lacks natively
(SURVEY.md §7 "what's hard" #4), composed from built-ins so they scale.

as-of: the union+window trick — tag both sides, union, one window over
(keys, ts) carrying the last right-side payload forward, keep left
rows. ONE exchange on the join keys, no row explosion, no per-group
pandas; this is the 100 TB-safe form (merge_asof via applyInPandas
would materialize each group in python memory).

range join: bucketize the range key to width = window, explode the
left side into its two candidate buckets, equi-join on (key, bucket),
filter the exact predicate. Turns an O(N^2) theta join into an
equi-join Catalyst can hash-partition — the same trick the reference's
sorted range read plays with chunk-offset ranges
(PartitionFilesSorter.java:208: coarse index first, exact scan after).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the matched right row
    per key group: direction="backward" matches the LATEST right row
    with right.ts <= left.ts (the default, pandas merge_asof parity);
    direction="forward" matches the EARLIEST right row with
    right.ts >= left.ts. Right payload columns are null when no
    matching right row exists. Both ties are inclusive.

    Both inputs must share `keys` + `ts_col`; right rows should be
    unique per (keys, ts) — pre-aggregate if not.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    # The payload travels as ONE struct so every output column comes
    # from the SAME matched right row, NULL field values included —
    # carrying columns independently with last(ignorenulls) would fall
    # back to older rows per column whenever the matched row holds a
    # NULL (diverging from ASOF JOIN semantics, which returns the
    # matched row verbatim).
    payload_type = right.select(
        F.struct(*[F.col(c) for c in right_payload]).alias("_p")
    ).schema[0].dataType
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_payload", F.lit(None).cast(payload_type)
    )
    r_tagged = right.select(
        *keys,
        ts_col,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_payload"),
    )
    left_only = [c for c in l_tagged.columns if c not in r_tagged.columns]
    for c in left_only:
        r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(l_tagged.dtypes)[c]))

    unioned = l_tagged.select(*l_tagged.columns).unionByName(
        r_tagged.select(*l_tagged.columns)
    )
    if direction == "backward":
        # right rows (_side=0) sort before left rows at equal ts =>
        # ties match (>=); carry the last payload seen so far forward
        w = (
            W.partitionBy(*keys)
            .orderBy(ts_col, "_side")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        carried = unioned.withColumn(
            "_payload", F.last("_payload", ignorenulls=True).over(w)
        )
    else:
        # mirror image: left rows sort before right rows at equal ts so
        # the tied right row stays inside the forward frame; take the
        # first payload at-or-after
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col(ts_col).asc(), F.col("_side").desc())
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        carried = unioned.withColumn(
            "_payload", F.first("_payload", ignorenulls=True).over(w)
        )
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *[c for c in carried.columns if c not in ("_side", "_payload")],
            *[F.col(f"_payload.{c}").alias(c) for c in right_payload],
        )
    )


def bucketed_range_self_join(
    df: DataFrame,
    key: str,
    ts_col: str,
    window_sec: int,
    id_col: str,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Pairs (a, b) with same key, a.ts < b.ts <= a.ts + window.

    Output: key, id_a, id_b, delta_us (+ <col>_a/<col>_b per
    ``payload_cols`` entry). The left side explodes into its bucket
    and the next one (bucket width = window), so each qualifying pair
    matches exactly once on the (key, bucket) equi-join. Carrying
    payload columns through the join is exactly equivalent to joining
    them back on the unique id afterwards — without re-scanning the
    row mass once per side (r13 reference-count rule).
    """
    payload = list(payload_cols or [])
    window_us = window_sec * 1_000_000
    with_us = df.select(
        F.col(key),
        F.col(id_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        *[F.col(c) for c in payload],
    )
    a = with_us.select(
        F.col(key),
        F.col(id_col).alias("id_a"),
        F.col("_us").alias("us_a"),
        *[F.col(c).alias(f"{c}_a") for c in payload],
        F.explode(
            F.array(
                F.floor(F.col("_us") / window_us),
                F.floor(F.col("_us") / window_us) + 1,
            )
        ).alias("_bucket"),
    )
    b = with_us.select(
        F.col(key).alias("_key_b"),
        F.col(id_col).alias("id_b"),
        F.col("_us").alias("us_b"),
        *[F.col(c).alias(f"{c}_b") for c in payload],
        F.floor(F.col("_us") / window_us).alias("_bucket"),
    )
    return (
        a.join(b, (a[key] == b["_key_b"]) & (a["_bucket"] == b["_bucket"]))
        .filter(
            (F.col("us_b") > F.col("us_a"))
            & (F.col("us_b") - F.col("us_a") <= window_us)
        )
        .select(
            F.col(key),
            "id_a",
            "id_b",
            (F.col("us_b") - F.col("us_a")).alias("delta_us"),
            *[F.col(f"{c}_a") for c in payload],
            *[F.col(f"{c}_b") for c in payload],
        )
    )


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    keys: list[str],
    ts_col: str,
    valid_from_col: str,
    valid_to_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Attach to each fact row the dimension version in effect at the
    fact's timestamp: valid_from <= ts AND (ts < valid_to OR valid_to
    IS NULL). The leakage-safe feature lookup of a training pipeline —
    joining TODAY'S dimension attributes onto historical facts trains
    on information that did not exist at event time; the
    point-in-time join is the correct-by-construction form (the
    feature-store "time travel" read).

    Composition: a backward as-of join on valid_from (one exchange on
    the keys — operators/asof.asof_join's union+window trick, no row
    explosion), then payload columns are nulled where the fact falls
    AT/after valid_to — which restores correctness on GAPPED version
    histories, where plain as-of would attach the stale predecessor.
    Versions must be unique per (keys, valid_from)."""
    right = versions.select(
        *keys,
        F.col(valid_from_col).alias(ts_col),
        F.col(valid_to_col).alias("_vt"),
        *payload_cols,
    )
    out = asof_join(facts, right, keys, ts_col, ["_vt", *payload_cols])
    valid = F.col("_vt").isNull() | (F.col(ts_col) < F.col("_vt"))
    for c in payload_cols:
        out = out.withColumn(c, F.when(valid, F.col(c)))
    return out.drop("_vt")
