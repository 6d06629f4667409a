"""Dedup surface: exact content-hash, n-gram Jaccard pairs, MinHash+LSH,
SimHash (SURVEY.md §2C; operators in celeborn_spark.operators.dedup).

Exact + Jaccard are fully oracle-checked (md5 and word-shingle math are
reproducible in DuckDB SQL). MinHash/SimHash depend on Spark's
xxhash64, which DuckDB cannot reproduce — those register rows-only and
carry dedicated recall/property tests in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import dedup as D
from celeborn_spark.registry import query

# Shared DuckDB CTE chain: exact 2-gram Jaccard (>= 0.8) near-dup pairs
# over documents -> undirected edges -> recursive min-label closure ->
# cc(vertex, component). Used by q_dedup_groups and
# q_leakage_safe_split (the Spark twins compose the same two operators,
# dedup.jaccard_pairs + components.connected_components).
_CC_ORACLE_CTES = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(t[i:i+2], ' '))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.8
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(v, lab) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.v
        WHERE r.lab < e.dst
    ),
    cc AS (SELECT v AS vertex, min(lab) AS component FROM reach GROUP BY v)
"""


@query(
    "q_dedup_exact",
    oracle="""
    SELECT content_hash, min(doc_id) AS doc_id, count(*) AS n_copies
    FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)
    GROUP BY content_hash
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.exact_dedup(d, "text", "doc_id")


@query(
    "q_incremental_dedup",
    oracle="""
    WITH corpus AS (
        SELECT DISTINCT md5(text) AS content_hash
        FROM documents WHERE doc_id % 5 != 0
    ),
    batch AS (
        SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
               count(*) AS n_copies
        FROM documents WHERE doc_id % 5 = 0 GROUP BY 1
    )
    SELECT b.content_hash, b.doc_id, b.n_copies
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM corpus c
                      WHERE c.content_hash = b.content_hash)
    """,
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-ingestion dedup: every 5th doc plays the incoming crawl
    batch, the rest the already-indexed corpus — batch dedups within
    itself then anti-joins the corpus hash index
    (operators/dedup.py incremental_dedup)."""
    d = load_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0)
    index = d.filter(F.col("doc_id") % 5 != 0).select(
        D.content_hash("text").alias("content_hash")
    )
    return D.incremental_dedup(batch, index, "text", "doc_id")


@query(
    "q_dedup_edit_distance",
    # the oracle runs every candidate pair through a FULL O(len^2)
    # levenshtein DP (DuckDB has no thresholded form), so the registered
    # query works a deterministic 1-in-10 corpus slice to keep the
    # baseline tractable; the operator itself is corpus-general and the
    # full-corpus form is pytest-covered
    oracle="""
    WITH t AS (
        SELECT doc_id, text,
               CAST(floor(len(text) / 32) AS BIGINT) AS blk
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT id_a, id_b, dist FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               levenshtein(a.text, b.text) AS dist
        FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
    ) WHERE dist <= 20
    """,
)
def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy dedup: same-length-band candidates verified by
    levenshtein <= 20 (operators/dedup.py edit_distance_pairs; Spark's
    thresholded levenshtein bails out of the DP early — DuckDB computes
    it in full, same value for surviving pairs)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return D.edit_distance_pairs(d, "doc_id", "text", max_dist=20, block_chars=32)


@query(
    "q_dedup_jaccard_pairs",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(t[i:i+2], ' '))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.8
    """,
)
def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)


@query(
    "q_dedup_minhash_lsh",
    # Full MinHash+LSH pipeline replicated in SQL: md5-hex lane minima
    # (the min of fixed-width hex digests is a valid min-hash, and both
    # engines produce identical digests), banded bucket self-join, then
    # exact-Jaccard verification of the candidates. Candidate sets are
    # bit-identical across engines, so even the LSH recall behavior is
    # driver-verified — not just the final pairs.
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(t[i:i+2], ' '))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    lanes AS (
        -- 4 independent 32-bit lanes per digest: lane l reads 8 hex
        -- chars at offset 8*(l%4) of md5('<l//4>:<shingle>')
        SELECT doc_id, l,
               min(substr(md5(CAST(l // 4 AS VARCHAR) || ':' || shingle),
                          1 + 8 * (l % 4), 8)) AS mh
        FROM sh CROSS JOIN (SELECT unnest(range(16)) AS l)
        GROUP BY doc_id, l
    ),
    bands AS (
        SELECT doc_id, l // 4 AS band_idx,
               string_agg(mh, '|' ORDER BY l) AS band_key
        FROM lanes GROUP BY doc_id, l // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.8
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified MinHash+LSH near-dup pairs in portable (md5) hash mode.
    Production runs hash_kind='xxhash64' (same plan, cheaper hashing —
    recall pinned in tests/test_dedup.py); md5 mode exists so the whole
    pipeline is oracle-checkable."""
    d = load_table(spark, sf_dir, "documents")
    return D.verified_lsh_dedup(
        d, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8,
        hash_kind="md5",
    )


@query(
    "q_simhash_fingerprints",
    # generated mirror of the md5 bit arithmetic (32 lanes)
    oracle=D.simhash_md5_oracle_sql("documents", "doc_id", "text", bits=32),
)
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable (md5) 32-bit SimHash fingerprints — oracle-checkable
    bit-for-bit; the 64-bit xxhash64 form (D.simhash) stays the fast
    production default with determinism/collision tests."""
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_md5(d, "doc_id", "text", bits=32)


@query(
    "q_dedup_groups",
    # Connected components as a recursive CTE: propagate any smaller
    # reachable label along edges until fixpoint (the r.lab < e.dst
    # guard prunes the closure: only labels smaller than the target can
    # ever become its component id), then min per vertex.
    oracle=f"""
    WITH RECURSIVE {_CC_ORACLE_CTES}
    SELECT vertex, component, group_size
    FROM cc JOIN (SELECT component, count(*) AS group_size
                  FROM cc GROUP BY component) USING (component)
    """,
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> connected components -> dedup groups (the full
    LLM-corpus dedup pipeline end to end). Built on exact Jaccard pairs
    so the iterative label propagation (operators/components.py) is
    driver-checkable against the recursive-CTE oracle; the LSH-pruned
    form swaps in verified_lsh_dedup for the pair stage at scale."""
    from celeborn_spark.operators.components import dedup_groups

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    return dedup_groups(pairs)


@query(
    "q_dedup_keep_best",
    # keeper = the longest copy per near-dup group, smaller doc_id on
    # ties — all-integer arg_max key (n_chars * 1e7 - doc_id), so the
    # selection is engine-exact with no float comparisons.
    oracle=f"""
    WITH RECURSIVE {_CC_ORACLE_CTES},
    grouped AS (
        SELECT d.doc_id,
               CAST(coalesce(cc.component, d.doc_id) AS BIGINT) AS component,
               d.n_chars
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.vertex
    )
    SELECT component,
           CAST(count(*) AS BIGINT) AS group_size,
           arg_max(doc_id, n_chars * 10000000 - doc_id) AS keeper_doc_id,
           CAST(max(n_chars) AS BIGINT) AS keeper_n_chars
    FROM grouped GROUP BY component
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative selection per near-dup group: keep the most
    complete (longest) copy instead of the arbitrary min-id — the
    curation policy a real pipeline wants when duplicates differ by
    truncation. Singletons form their own group and keep themselves."""
    from celeborn_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    cc = connected_components(pairs)
    grouped = (
        d.select("doc_id", "n_chars")
        .join(cc, d["doc_id"] == cc["vertex"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").cast("long").alias("component"),
            "n_chars",
        )
    )
    return grouped.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.max_by(
            "doc_id", F.col("n_chars") * 10_000_000 - F.col("doc_id")
        ).alias("keeper_doc_id"),
        F.max("n_chars").cast("long").alias("keeper_n_chars"),
    )


def _split_oracle() -> str:
    from celeborn_spark.operators.curriculum import u01_oracle_expr

    u = u01_oracle_expr("CAST(coalesce(cc.component, d.doc_id) AS VARCHAR)", 7)
    return f"""
    WITH RECURSIVE {_CC_ORACLE_CTES}
    SELECT d.doc_id,
           CAST(coalesce(cc.component, d.doc_id) AS BIGINT) AS group_key,
           CASE WHEN {u} < 0.9 THEN 'train' ELSE 'eval' END AS split
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.vertex
    """


@query("q_leakage_safe_split", oracle=_split_oracle())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/eval split: the split variate hashes the
    near-dup GROUP key (component id; singletons key on their own id),
    so duplicates and near-duplicates can never straddle the split —
    the group-level form of eval decontamination. Deterministic md5
    variate (operators/curriculum.u01), 90/10 split."""
    from celeborn_spark.operators.components import connected_components
    from celeborn_spark.operators.curriculum import u01

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    cc = connected_components(pairs)
    grouped = (
        d.select("doc_id")
        .join(cc, d["doc_id"] == cc["vertex"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").cast("long").alias("group_key"),
        )
    )
    return grouped.select(
        "doc_id",
        "group_key",
        F.when(u01(F.col("group_key").cast("string"), salt=7) < 0.9, "train")
        .otherwise("eval")
        .alias("split"),
    )


@query(
    "q_decontaminate",
    oracle="""
    WITH t AS (
        SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents
    ),
    train_sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, len(toks) - 3),
                   i -> array_to_string(toks[i:i+4], ' ')))) AS shingle
        FROM t WHERE source <> 'src0' AND len(toks) >= 5
    ),
    eval_sh AS (
        SELECT DISTINCT unnest(list_distinct(list_transform(
                   range(1, len(toks) - 3),
                   i -> array_to_string(toks[i:i+4], ' ')))) AS shingle
        FROM t WHERE source = 'src0' AND len(toks) >= 5
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM train_sh JOIN eval_sh USING (shingle)
    GROUP BY doc_id
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (sources != src0)
    sharing any 5-gram with the held-out eval set (source src0), with
    the count of distinct shared 5-grams. The eval shingle set
    broadcasts — the corpus side never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return D.ngram_decontaminate(
        d.filter(F.col("source") != "src0"),
        d.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=5,
    )


@query(
    "q_dedup_incremental_lsh",
    # Same md5-lane machinery as q_dedup_minhash_lsh, but the candidate
    # join is batch-vs-corpus (doc_id % 10 == 0 plays the incoming
    # batch, the rest the indexed corpus) — the rolling-ingestion
    # near-dup check. Signatures are split-independent, so the oracle
    # computes them once and splits at the band join.
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                                     i -> array_to_string(t[i:i+2], ' '))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    lanes AS (
        SELECT doc_id, l,
               min(substr(md5(CAST(l // 4 AS VARCHAR) || ':' || shingle),
                          1 + 8 * (l % 4), 8)) AS mh
        FROM sh CROSS JOIN (SELECT unnest(range(16)) AS l)
        GROUP BY doc_id, l
    ),
    bands AS (
        SELECT doc_id, l // 4 AS band_idx,
               string_agg(mh, '|' ORDER BY l) AS band_key
        FROM lanes GROUP BY doc_id, l // 4
    ),
    cand AS (
        SELECT DISTINCT b.doc_id AS id_new, c.doc_id AS id_old
        FROM bands b JOIN bands c
          ON b.band_idx = c.band_idx AND b.band_key = c.band_key
        WHERE b.doc_id % 10 = 0 AND c.doc_id % 10 != 0
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT cand.id_new, cand.id_old, count(*) AS n_common
        FROM cand
        JOIN sh a  ON a.doc_id = cand.id_new
        JOIN sh b2 ON b2.doc_id = cand.id_old AND b2.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT id_new, id_old,
           round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = id_new
    JOIN sizes sb ON sb.doc_id = id_old
    WHERE round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) >= 0.8
    """,
)
def q_dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup against an indexed corpus: which incoming
    docs (doc_id % 10 == 0 plays the batch) near-duplicate the existing
    corpus — the rolling-ingestion twin of q_incremental_dedup (exact
    digests) at LSH granularity. Candidates come from a batch-vs-index
    band join, never corpus self-pairs; at scale the corpus's banded
    signatures persist as the index and only the batch is signed per
    ingest (operators/dedup.incremental_lsh_near_dup)."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") % 10 != 0)
    batch = d.where(F.col("doc_id") % 10 == 0)
    return D.incremental_lsh_near_dup(
        corpus, batch, "doc_id", "text", n=3, num_hashes=16, bands=4,
        threshold=0.8, hash_kind="md5",
    )


@query(
    "q_dup_span_profile",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 6),
                                     i -> array_to_string(t[i:i+7], ' '))) AS shingle
        FROM toks WHERE len(t) >= 8
    ),
    dfreq AS (SELECT shingle, count(DISTINCT doc_id) AS df FROM sh GROUP BY shingle)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
           CAST((sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 20000 + count(*))
                // (2 * count(*)) AS DOUBLE) / 1e4 AS dup_frac
    FROM sh JOIN dfreq USING (shingle)
    GROUP BY doc_id
    """,
)
def q_dup_span_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-token-substring duplication profile per doc (Lee et al.
    substring dedup signal): fraction of a doc's distinct spans that
    also occur elsewhere — localizes boilerplate/copied passages that
    whole-doc Jaccard misses. Linear (span document-frequency join),
    never pairwise (operators/dedup.dup_span_profile)."""
    d = load_table(spark, sf_dir, "documents")
    return D.dup_span_profile(d, "doc_id", "text", n=8)


SET_SIM_THRESHOLD = 0.9


@query(
    "q_set_similarity_join",
    oracle=D.set_similarity_oracle_sql("documents", "doc_id", "text", SET_SIM_THRESHOLD),
)
def q_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT token-set Jaccard >= 0.9 pairs via prefix filtering
    (operators/dedup.set_similarity_join) — exact like jaccard_pairs
    but subquadratic like LSH: frequency-ordered prefixes make the
    candidate join collide only on RARE tokens, and verification on the
    full sets reproduces the quadratic all-pairs oracle pair for pair."""
    d = load_table(spark, sf_dir, "documents")
    return D.set_similarity_join(d, "doc_id", "text", SET_SIM_THRESHOLD)


@query(
    "q_winnow_fingerprints",
    oracle=D.winnow_oracle_sql("documents", "doc_id", "text", k=4, w=8),
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints over the corpus: rightmost-minimal
    k-gram hash per w-window, guaranteeing any shared w+k-1-token run
    between two docs shares a fingerprint at ~2/(w+1) density — the
    plagiarism/local-copy detection layout between whole-doc hashing
    and a full inverted index (operators/dedup.winnow_fingerprints)."""
    d = load_table(spark, sf_dir, "documents")
    return D.winnow_fingerprints(d, "doc_id", "text", k=4, w=8)


@query(
    "q_containment_pairs",
    oracle=D.containment_oracle_sql(
        "documents", "doc_id", "text", threshold_num=4, threshold_den=5
    ),
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED containment near-dups: (contained, container) pairs
    where >= 4/5 of the contained doc's 3-gram shingles appear in the
    container — the quote/boilerplate-inclusion case symmetric Jaccard
    structurally misses (a short doc quoted whole inside a long one has
    tiny Jaccard, containment ~1). Same shingle-keyed posting join as
    q_dedup_jaccard_pairs; the threshold filter is ALL-INTEGER
    (n_common*5 >= 4*|A|), the reported ratio one exact division
    (operators/dedup.containment_join)."""
    d = load_table(spark, sf_dir, "documents")
    return D.containment_join(
        d, "doc_id", "text", n=3, threshold_num=4, threshold_den=5
    )


@query(
    "q_component_size_histogram",
    # singleton docs (no near-dup edge) are size-1 components; the
    # recursive-CTE cc covers only edge-connected vertices, so the
    # singleton row is total docs minus cc vertices
    oracle=f"""
    WITH RECURSIVE {_CC_ORACLE_CTES},
    csizes AS (SELECT component, CAST(count(*) AS BIGINT) AS group_size
               FROM cc GROUP BY component),
    hist AS (
        SELECT group_size, CAST(count(*) AS BIGINT) AS n_components
        FROM csizes GROUP BY group_size
    ),
    singles AS (
        SELECT CAST(1 AS BIGINT) AS group_size,
               (SELECT count(*) FROM documents)
                   - (SELECT count(*) FROM cc) AS n_components
    )
    SELECT group_size, CAST(n_components AS BIGINT) AS n_components
    FROM (SELECT * FROM hist UNION ALL
          SELECT * FROM singles WHERE n_components > 0)
    """,
)
def q_component_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup component-size distribution: how much of the corpus
    sits in duplicate clusters of each size — the dedup IMPACT
    profile behind q_dedup_groups ("dedup removes sum((size-1) *
    n_components) docs"). Composes the same Jaccard-pair + iterative
    label-propagation pipeline, then reduces to a histogram; singleton
    docs (never in a pair) report as size-1 components. Component
    relations are vocabulary-of-sizes bounded after one aggregate."""
    from celeborn_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    # the histogram only needs the per-component sizes, which ARE the
    # distinct (component, group_size) rows dedup_groups' vertex-mass
    # join used to produce — derive both readouts straight from the
    # checkpointed cc labels (the old form re-ran the broadcast join
    # once per reference and paid a distinct exchange for rows the
    # sizes aggregate already had)
    cc = connected_components(pairs)
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    hist = sizes.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )
    n_docs = d.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    n_cc = cc.agg(F.count(F.lit(1)).cast("long").alias("nv"))
    singles = (
        n_docs.crossJoin(F.broadcast(n_cc))
        .select(
            F.lit(1).cast("long").alias("group_size"),
            (F.col("nd") - F.col("nv")).cast("long").alias("n_components"),
        )
        .filter(F.col("n_components") > 0)
    )
    return hist.unionByName(singles)


@query(
    "q_minhash_accuracy",
    oracle=D.minhash_accuracy_oracle_sql(n=3, num_hashes=16, bands=4),
)
def q_minhash_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration over the LSH candidate tier:
    lane-agreement estimate vs exact shingle Jaccard, one QA row
    (n_pairs, mean_est, mean_exact, mae, bias, max_abs_err) — the
    sketch-error audit that answers 'is 16 lanes enough at THIS
    corpus's similarity profile' before a 100 TB signing pass; the
    pairwise-similarity counterpart of q_sketch_accuracy's KMV
    audit. md5 hash mode, so the driver verifies the estimator's
    ERROR itself bit-for-bit (operators/dedup.minhash_accuracy)."""
    d = load_table(spark, sf_dir, "documents")
    return D.minhash_accuracy(d, "doc_id", "text", n=3, num_hashes=16, bands=4)
