"""Batch MERGE / upsert (CDC & SCD patterns).

When a lake format's transactional MERGE INTO is available (Delta/
Iceberg jars on the classpath — sources/io.lake_format_available
detects at runtime), merge_into_path routes through it; otherwise the
engine composes the same semantics relationally: updates win over
target rows on the key (anti-join removes shadowed targets, union
appends the updates). One shuffle on the key; at scale both sides are
bucketed by the key so the anti-join co-locates.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_identifiers(updates: DataFrame, key: str) -> None:
    """MERGE SQL interpolates column/key names — reject anything that
    isn't a plain identifier so a hostile column name can't smuggle SQL."""
    bad = [c for c in [key, *updates.columns] if not _IDENT.match(c)]
    if bad:
        raise ValueError(f"non-identifier column names not mergeable: {bad}")


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """UPSERT: rows of `updates` replace same-key rows of `target`;
    unmatched update rows are inserted. Schemas must match."""
    kept = target.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates)


def build_merge_sql(
    target_path: str, updates: DataFrame, key: str, fmt: str = "delta"
) -> dict:
    """Build the transactional MERGE INTO statement (pure, unit-testable
    without lake jars). Returns {"view": <unique temp view name>, "sql": ...}.

    - per-call unique view name: the fixed `_merge_updates` of the first
      cut collided across concurrent callers sharing one session;
    - no-payload updates (key column only) omit WHEN MATCHED entirely —
      an empty SET clause is malformed SQL and a matched row needs no
      change when the key is the whole record;
    - identifiers validated, path backtick-escaped."""
    _check_identifiers(updates, key)
    if key not in updates.columns:
        raise ValueError(f"key {key!r} not in updates columns {updates.columns}")
    if not _IDENT.match(fmt):
        raise ValueError(f"bad format name {fmt!r}")
    view = f"_merge_updates_{uuid.uuid4().hex}"
    payload = [c for c in updates.columns if c != key]
    matched = (
        "WHEN MATCHED THEN UPDATE SET "
        + ", ".join(f"t.{c} = s.{c}" for c in payload)
        + " "
        if payload
        else ""
    )
    path = target_path.replace("`", "``")
    sql = (
        f"MERGE INTO {fmt}.`{path}` t USING {view} s "
        f"ON t.{key} = s.{key} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT *"
    )
    return {"view": view, "sql": sql}


def merge_into_path(
    spark, target_path: str, updates: DataFrame, key: str, fmt: str = "delta"
) -> None:
    """MERGE of `updates` into the table stored at `target_path`.

    Capability-dispatched sink: with the `fmt` connector on the
    classpath this is a real transactional MERGE INTO (concurrent-safe,
    no full rewrite); without it, the parquet fallback reads the target,
    applies the relational upsert, and atomically replaces via
    overwrite — same final state, weaker isolation (documented)."""
    from celeborn_spark.sources.io import lake_format_available

    if lake_format_available(spark, fmt):  # pragma: no cover - jars absent here
        sql = build_merge_sql(target_path, updates, key, fmt=fmt)
        view = sql["view"]
        updates.createOrReplaceTempView(view)
        try:
            spark.sql(sql["sql"])
        finally:
            spark.catalog.dropTempView(view)
        return
    target = spark.read.parquet(target_path)
    merged = merge_upsert(target, updates, key)
    # parquet has no transactional replace: stage the merge, then
    # overwrite (localCheckpoint materializes before the target dir is
    # truncated — overwriting one's own input is otherwise a read-write
    # race on the same files)
    merged.localCheckpoint().write.mode("overwrite").parquet(target_path)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, compare_cols: list[str]
) -> DataFrame:
    """Table-version diff: one row per key whose content changed between
    snapshots — (key, status in {'added','removed','changed'}). The
    audit primitive for lake pipelines (what did this batch actually
    touch?) and the input to incremental downstream refresh.

    Content identity = md5 of the null-tagged concatenation of
    `compare_cols` (computed map-side on each snapshot), so the diff
    join carries key+digest only — at 100 TB the wide payload never
    shuffles; one exchange on the key (bucketed tables co-locate it).
    Unchanged keys are dropped before the result materializes."""
    from pyspark.sql import functions as F

    def digest(df: DataFrame, name: str) -> DataFrame:
        # null tag = \x02 (DuckDB chr(2) — NUL bytes are not portable
        # in VARCHARs), separator = \x01: both impossible in the data
        # columns' text forms, so the digest is injective per row
        cols = [
            F.coalesce(F.col(c).cast("string"), F.lit("\x02")) for c in compare_cols
        ]
        return df.select(F.col(key), F.md5(F.concat_ws("\x01", *cols)).alias(name))

    o = digest(old, "_old_h")
    n = digest(new, "_new_h")
    joined = o.join(n, key, "full_outer")
    return (
        joined.select(
            key,
            F.when(F.col("_old_h").isNull(), F.lit("added"))
            .when(F.col("_new_h").isNull(), F.lit("removed"))
            .when(F.col("_old_h") != F.col("_new_h"), F.lit("changed"))
            .alias("status"),
        )
        .where(F.col("status").isNotNull())
    )


def scd2_close_and_append(
    current: DataFrame,
    changes: DataFrame,
    key: str,
    effective_col: str,
    end_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the open row for each
    changed key (set end = change's effective time) and append the new
    version with an open end. `current` rows are open (end is null)."""
    from pyspark.sql import functions as F

    chg = changes.select(
        F.col(key).alias("_k"), F.col(effective_col).alias("_eff")
    )
    closed = (
        current.join(chg, current[key] == F.col("_k"), "left")
        .withColumn(
            end_col,
            F.when(F.col("_k").isNotNull(), F.col("_eff")).otherwise(F.col(end_col)),
        )
        .drop("_k", "_eff")
    )
    opened = changes.withColumn(end_col, F.lit(None).cast(dict(current.dtypes)[end_col]))
    return closed.unionByName(opened)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_col: str = "k",
    op_col: str = "op",
    ord_cols: tuple[str, ...] = ("ts",),
) -> DataFrame:
    """Apply a change-data-capture feed to a base snapshot: the state a
    lake table reaches after replaying a CDC log (Debezium/Delta change
    feed shape). ``changes`` rows carry ``op`` in {'U','D'} (upsert /
    delete); the LAST change per key wins, ordered by ``ord_cols``
    (pass a unique tiebreaker column last — ties on a bare timestamp
    would be engine-dependent). Keys never touched keep their base row;
    keys whose last op is 'D' disappear; upserted keys take the change
    payload whether or not they existed in base.

    Value columns = every non-key, non-op, non-ordering column shared
    by both relations (base must present the same payload schema).

    Scale shape: ONE window exchange keyed on the CDC key reduces the
    log to last-change-per-key (WindowGroupLimit prunes past rank 1
    before any full per-key sort), then a key-only full-outer join
    against base. At 100 TB both sides bucket by the key; the log's
    payload beyond the winning row never crosses the wire."""
    payload = [
        c
        for c in changes.columns
        if c not in {key_col, op_col, *ord_cols}
    ]
    missing = [c for c in payload if c not in base.columns]
    if missing or key_col not in base.columns:
        raise ValueError(
            f"base lacks columns {missing or [key_col]} required by the change feed"
        )
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(*[F.col(c).desc() for c in ord_cols])
    last = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key_col, op_col, *payload)
    )
    b = base.select(key_col, *payload)
    j = b.alias("b").join(last.alias("c"), key_col, "full_outer")
    kept = j.filter((F.col(f"c.{op_col}").isNull()) | (F.col(f"c.{op_col}") != "D"))
    # an upsert takes the change payload even where it is NULL —
    # coalesce() would silently resurrect the base value
    has_change = F.col(f"c.{op_col}").isNotNull()
    out_cols = [F.col(key_col)] + [
        F.when(has_change, F.col(f"c.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
        for c in payload
    ]
    return kept.select(*out_cols)
