"""Scalar function coverage: string / date / math / array / json /
conditional — declared from `F.*` built-ins so every expression stays
inside whole-stage codegen (no Python in the hot path).

The reference is type-blind below the engine (ShuffleClientImpl.java:1373
moves opaque byte[]); scalar semantics live engine-side, so our surface
is the Catalyst function library (SURVEY.md §2B last row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.registry import query


@query(
    "q_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                                   AS brand_upper,
           lower(p_type)                                    AS type_lower,
           length(p_name)                                   AS name_len,
           substr(p_name, 1, 8)                             AS name_prefix,
           concat(p_brand, ':', p_type)                     AS brand_type,
           replace(p_name, ' ', '_')                        AS name_snake,
           len(string_split(p_name, ' '))                   AS n_words,
           trim(p_name)                                     AS name_trim,
           contains(p_type, 'BRASS')                        AS is_brass
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.trim("p_name").alias("name_trim"),
        F.col("p_type").contains("BRASS").alias("is_brass"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                                   AS order_year,
           month(o_orderdate)                                  AS order_month,
           day(o_orderdate)                                    AS order_day,
           quarter(o_orderdate)                                AS order_quarter,
           strftime(o_orderdate, '%Y-%m')                      AS order_ym,
           CAST(date_trunc('month', o_orderdate) AS DATE)::VARCHAR AS month_start,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6)            AS qty_sqrt,
           round(ln(l_extendedprice), 6)         AS price_ln,
           round(pow(l_discount, 2), 8)          AS disc_sq,
           abs(l_quantity - 25)                  AS qty_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS price_k_ceil,
           CAST(floor(l_quantity / 10) AS BIGINT)        AS qty_decile,
           l_orderkey % 7                        AS key_mod
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.pow("l_discount", F.lit(2)), 8).alias("disc_sq"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k_ceil"),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_id", prop_k.alias("prop_k"), "event_type")
        .filter(F.col("prop_k") > 50)
    )


@query(
    "q_array_agg",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           count(*)                                      AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list -> array_sort -> join: deterministic array agg."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_conditional_nulls",
    oracle="""
    SELECT o_orderstatus,
           count(*)                                                    AS n,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_price,
           round(sum(coalesce(o_totalprice, 0)), 2)                    AS total,
           CAST(sum(CASE WHEN nullif(o_orderpriority, '5-LOW') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT)                      AS n_low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_conditional_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "n_null_price"
        ),
        F.round(F.sum(F.coalesce("o_totalprice", F.lit(0.0))), 2).alias("total"),
        F.sum(
            F.when(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).isNull(), 1).otherwise(0)
        ).alias("n_low"),
    )


@query(
    "q_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')   AS due_date,
           strftime(o_orderdate - INTERVAL 3 MONTH, '%Y-%m-%d')  AS quarter_back,
           CAST(date_diff('month', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS months_since,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           dayofweek(o_orderdate)                                 AS dow_sun0
    FROM orders
    """,
)
def q_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + calendar functions. DuckDB dayofweek is
    0=Sunday, Spark dayofweek is 1=Sunday — normalized to Sunday=0."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(F.col("o_orderdate").cast("date"), -3), "yyyy-MM-dd").alias("quarter_back"),
        (
            (F.year("o_orderdate") - F.lit(1995)) * 12 + F.month("o_orderdate") - 1
        ).cast("int").alias("months_since"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).alias("dow_sun0"),
    )


@query(
    "q_string_pad_case",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*')     AS brand_lpad,
           rpad(p_brand, 12, '.')     AS brand_rpad,
           reverse(p_name)            AS name_rev,
           translate(p_type, 'AEIOU', 'aeiou') AS type_trans,
           left(p_name, 5)            AS name_left,
           right(p_name, 5)           AS name_right,
           repeat(p_brand, 2)         AS brand_twice
    FROM part
    """,
)
def q_string_pad_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("brand_lpad"),
        F.rpad("p_brand", 12, ".").alias("brand_rpad"),
        F.reverse("p_name").alias("name_rev"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_trans"),
        F.substring("p_name", 1, 5).alias("name_left"),
        F.expr("right(p_name, 5)").alias("name_right"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               string_split(text, ' ')[1:8]  AS a,
               string_split(text, ' ')[5:12] AS b
        FROM documents
        WHERE len(string_split(text, ' ')) >= 12
    )
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS union_set,
           array_to_string(list_sort(list_distinct(list_intersect(a, b))), ',') AS intersect_set,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(a, x -> NOT list_contains(b, x)))), ','), '')     AS except_set,
           list_has_any(a, b)                                                AS overlaps,
           len(list_filter(a, x -> len(x) > 4)) > 0                          AS has_long,
           len(list_filter(a, x -> len(x) <= 20)) = len(a)                   AS all_short
    FROM t
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set ops + higher-order exists/forall, canonicalized by
    sorting so both engines' set semantics compare equal."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # engines disagree on out-of-range slices of short arrays — keep
    # docs long enough that both slices are fully in range
    t = d.filter(F.size(toks) >= 12).select(
        "doc_id",
        F.slice(toks, 1, 8).alias("a"),
        F.slice(toks, 5, 8).alias("b"),
    )
    return t.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias("union_set"),
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias(
            "intersect_set"
        ),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("except_set"),
        F.arrays_overlap("a", "b").alias("overlaps"),
        F.exists("a", lambda x: F.length(x) > 4).alias("has_long"),
        F.forall("a", lambda x: F.length(x) <= 20).alias("all_short"),
    )


@query(
    "q_regexp_funcs",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+'))      AS n_tokens,
           regexp_extract(text, '^([a-z]+)', 1)         AS first_word,
           regexp_matches(text, 'spark')                AS mentions_spark
    FROM documents
    """,
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("n_tokens"),
        F.regexp_extract("text", "^([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("spark").alias("mentions_spark"),
    )


@query(
    "q_anonymize",
    oracle="""
    SELECT event_id,
           md5(CAST(user_id AS VARCHAR) || ':anon')      AS user_pseudonym,
           regexp_replace(props, '[0-9]+', '#', 'g')     AS props_redacted
    FROM events
    """,
)
def q_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training data: salted-hash pseudonymization of
    the user key (referential integrity survives, identity doesn't) and
    regex redaction of numeric literals in the payload. Pure JVM
    expressions — a zero-shuffle map stage at any scale. Spark
    regexp_replace is global by default; DuckDB needs the 'g' flag."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.md5(F.concat_ws(":", F.col("user_id").cast("string"), F.lit("anon"))).alias(
            "user_pseudonym"
        ),
        F.regexp_replace("props", "[0-9]+", "#").alias("props_redacted"),
    )


@query(
    "q_map_funcs",
    # the oracle replicates the SEMANTICS (token -> count map, filter,
    # value transform) in plain SQL rows — maps themselves don't
    # hash-compare across engines, so both sides emit the exploded
    # sorted (doc_id, tok, n, n_sq) entry rows
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    entries AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n
        FROM toks GROUP BY 1, 2
    )
    SELECT doc_id, tok, n, n * n AS n_sq
    FROM entries WHERE n >= 2
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function family: build a token->count MAP per document
    (map_from_entries over collected pairs), transform_values to
    squared counts, map_filter to the repeated tokens, then explode
    back to entry rows — the MapType API surface next to q_array_funcs
    (arrays) and q_json_funcs (nested strings). The exploded sorted
    rows are the cross-engine comparison form (maps don't
    hash-compare); all per-doc maps are vocabulary-bounded."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("tok")
    )
    counted = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    mapped = counted.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("tok"), F.col("n")))
        ).alias("m")
    )
    transformed = mapped.select(
        "doc_id",
        F.map_filter(
            F.transform_values(
                F.col("m"), lambda k, v: F.struct(v.alias("n"), (v * v).alias("n_sq"))
            ),
            lambda k, v: v["n"] >= 2,
        ).alias("m2"),
    )
    return transformed.select(
        "doc_id", F.explode(F.col("m2")).alias("tok", "entry")
    ).select(
        "doc_id",
        "tok",
        F.col("entry.n").alias("n"),
        F.col("entry.n_sq").alias("n_sq"),
    )


@query(
    "q_variant_json",
    # All outputs are exact integers extracted from the same JSON
    # text both engines read; VARIANT is Spark's storage/accessor
    # choice, not a value change.
    oracle="""
    SELECT event_type,
           CAST(count(CASE WHEN props->>'k' IS NOT NULL THEN 1 END)
                AS BIGINT) AS n_k,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY 1
    """,
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing through Spark 4's VARIANT type:
    parse_json(props) once into the binary variant encoding, then
    typed variant_get extraction — the engine-native path for
    schema-on-read JSON at scale (variant decode is columnar and
    shreds once; repeated get_json_object calls re-parse the string
    per expression). Functionally identical to the string-path
    q_json_funcs — the point is the VARIANT plumbing is wired and
    oracle-checked."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("vj")
    )
    k = F.expr("variant_get(vj, '$.k', 'bigint')")
    return v.groupBy("event_type").agg(
        F.count(F.when(k.isNotNull(), 1)).cast("long").alias("n_k"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )


@query(
    "q_collation_group",
    # The engines agree because the OUTPUT key is explicitly
    # lower-cased; the collation only drives GROUPING. The mixed-case
    # key is synthesized deterministically (doc_id parity) since the
    # corpus is all-lowercase.
    oracle="""
    WITH keyed AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END
                   AS k
        FROM documents
    )
    SELECT lower(k) AS lang_lc,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT k) AS BIGINT) AS n_case_variants
    FROM keyed GROUP BY lower(k)
    """,
)
def q_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 COLLATE UTF8_LCASE): a
    case-insensitive GROUP BY executed by the ENGINE's collation
    machinery rather than a lower() rewrite — the correct way to
    aggregate user-entered categorical text (emails, tags, locales)
    where normalize-then-group loses the original forms. The output
    proves the merge: each language groups its upper- and lower-case
    variants together (n_case_variants = 2) while n_docs counts both."""
    d = load_table(spark, sf_dir, "documents")
    k = F.when(F.col("doc_id") % 2 == 0, F.upper("lang")).otherwise(
        F.col("lang")
    )
    keyed = d.select(k.alias("k"))
    return (
        keyed.groupBy(F.expr("collate(k, 'UTF8_LCASE')").alias("kc"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct(F.col("k").cast("string"))
            .cast("long")
            .alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("kc")).cast("string").alias("lang_lc"),
            "n_docs",
            "n_case_variants",
        )
    )
