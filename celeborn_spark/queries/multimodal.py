"""Multimodal-column surface (SURVEY.md §2C): binary payloads with
typed metadata; JVM-side byte ops oracle-checked, Arrow mapInPandas
decode plumbing rows-only (deterministic fake codec)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from celeborn_spark.catalog import load_table
from celeborn_spark.operators import multimodal as M
from celeborn_spark.registry import query


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text)               AS content_sha,
           'text/plain'               AS mime
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata extraction, all JVM-side: byte length
    and content digest of the payload column."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
        F.lit("text/plain").alias("mime"),
    )


@query(
    "q_multimodal_decode",
    # The deterministic fake decoder computes pure byte arithmetic —
    # length, first-byte class, modular fake dimensions — so the Arrow
    # mapInPandas path is checkable against plain SQL: ascii(text) and
    # payload[0] agree for ASCII first chars, and both fall outside
    # [97, 122] for multi-byte/empty cases.
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN ascii(text) BETWEEN 97 AND 122
                THEN 'textish' ELSE 'binary' END      AS format,
           CAST(octet_length(encode(text)) % 1920 AS INTEGER) AS fake_width,
           CAST(octet_length(encode(text)) % 1080 AS INTEGER) AS fake_height
    FROM documents
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata decode, all JVM-side (whole-stage
    codegen) — the fake codec is byte arithmetic, so built-ins express
    it with no Python worker. The Arrow mapInPandas plumbing for real
    codecs (operators/multimodal.py fake_decode_meta, decode_media stub)
    is pinned equal to this form in tests/test_multimodal.py."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.decode_meta_jvm(d)


@query(
    "q_multimodal_resize",
    # character-space tiling: python (s * (100 // len(s) + 1))[:100] and
    # SQL substr(repeat(s, ceil), 1, 100) produce the same string for
    # any non-empty s (both tile at least ceil(100/len) copies, then
    # truncate); md5 hashes its UTF-8 bytes in both engines
    oracle="""
    SELECT doc_id,
           CAST(100 AS INTEGER) AS out_chars,
           md5(substr(repeat(text, CAST(ceil(100.0 / len(text)) AS INTEGER)),
                      1, 100)) AS resized_md5
    FROM documents WHERE len(text) > 0
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: binary payload -> Arrow batches -> per-row
    resample kernel -> fingerprint (operators/multimodal.py
    fake_resize_media; a real PIL resize slots into the same loop)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.fake_resize_media(d, out_chars=100)


@query(
    "q_multimodal_frames",
    oracle="""
    WITH f AS (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(len(text) / 64.0) AS BIGINT))) AS k
        FROM documents WHERE len(text) > 0
    )
    SELECT doc_id,
           CAST(k AS INTEGER)                          AS frame_idx,
           CAST(len(substr(text, CAST(k * 64 + 1 AS BIGINT), 64))
                AS INTEGER)                            AS frame_chars,
           md5(substr(text, CAST(k * 64 + 1 AS BIGINT), 64)) AS frame_md5
    FROM f WHERE k % 4 = 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: every 4th 64-char frame per payload —
    the 1->N Arrow row fan-out of real video frame extraction
    (operators/multimodal.py sample_frames)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.sample_frames(d, frame_chars=64, every_n=4)


@query(
    "q_multimodal_features",
    # integer character-class counts — engine-exact, no float rounding;
    # length() counts characters in both engines, regexp counts via
    # delete-and-diff in SQL vs vectorized str.count in pandas
    oracle="""
    SELECT doc_id,
           CAST(len(text) AS BIGINT) AS n_chars,
           CAST(len(text) - len(regexp_replace(text, '[aeiou]', '', 'g'))
                AS BIGINT)           AS n_vowels,
           CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))
                AS BIGINT)           AS n_digits,
           CAST(len(text) - len(regexp_replace(text, ' ', '', 'g'))
                AS BIGINT)           AS n_spaces
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: payload -> Arrow batches ->
    vectorized character-class features (operators/multimodal.py
    fake_extract_features; a CLIP/mel featurizer slots into the same
    loop)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.fake_extract_features(d)


@query(
    "q_multimodal_chunks",
    # ASCII corpus: byte slices == char slices, so the VARCHAR-only
    # DuckDB md5 can mirror the Spark BINARY-slice digests exactly.
    oracle="""
    WITH n AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
    idx AS (
        SELECT doc_id, text, nb,
               unnest(range(CAST(greatest(ceil(nb / 64.0), 1) AS BIGINT))) AS chunk_idx
        FROM n
    )
    SELECT doc_id,
           CAST(chunk_idx AS INT)          AS chunk_idx,
           chunk_idx * 64                  AS offset,
           CAST(octet_length(encode(substring(text, CAST(chunk_idx * 64 + 1 AS INT), 64)))
                AS INT)                    AS n_bytes,
           md5(substring(text, CAST(chunk_idx * 64 + 1 AS INT), 64)) AS chunk_md5
    FROM idx
    """,
)
def q_multimodal_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked binary serving layout (A14/A21 analogue): every payload
    split into 64-byte chunks with offsets and per-chunk digests — the
    resume/verify/parallelize-per-chunk index a 100 TB media table
    needs. Zero-shuffle sequence fan-out + BINARY substring slices
    (operators/multimodal.chunk_payload)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.chunk_payload(d, "doc_id", "payload", chunk_bytes=64)


@query(
    "q_multimodal_energy",
    # per-frame RMS byte energy: the payloads are ASCII word streams,
    # so ascii(substr(...)) reproduces the kernel's byte values; the
    # sum of squares is an exact BIGINT and sqrt(sum/32.0) rounds 6dp
    # identically in numpy and SQL
    oracle="""
    WITH docs AS (
        SELECT doc_id, text, octet_length(encode(text)) AS n
        FROM documents
    ),
    frames AS (
        SELECT doc_id, text, CAST(unnest(range(0, n // 32)) AS INTEGER) AS f
        FROM docs WHERE n >= 32
    ),
    vals AS (
        SELECT doc_id, f,
               CAST(ascii(substr(text, CAST(f * 32 + j AS INTEGER), 1))
                    AS BIGINT) AS b
        FROM frames, (SELECT unnest(range(1, 33)) AS j)
    )
    SELECT doc_id, f AS frame_id, CAST(32 AS INTEGER) AS n_bytes,
           round(sqrt(sum(b * b) / 32.0), 6) AS rms
    FROM vals GROUP BY doc_id, f
    """,
)
def q_multimodal_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style frame-energy extraction: 32-byte frames of the
    binary payload -> per-frame RMS energy through the Arrow
    mapInPandas loop (operators/multimodal.fake_frame_energy) — the
    framing + numeric-kernel plumbing of a real librosa/torchaudio
    featurizer, checkable byte-for-byte against SQL because the fake
    codec is pure byte arithmetic."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.fake_frame_energy(d, frame_bytes=32)


@query("q_multimodal_ahash", oracle=M.ahash_oracle_sql())
def q_multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-hash perceptual signatures of the binary payloads
    through the Arrow mapInPandas loop: the leading 64 bytes act as
    the 8x8 luma grid a real aHash gets from resize+grayscale (the
    decode step is the honest stub; the framing, batch shape, and
    bit algebra are real and byte-checkable against SQL). Emitted as
    two 32-bit halves so XOR/bit_count algebra never touches the
    sign bit (operators/multimodal.fake_ahash)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.fake_ahash(d)


@query("q_ahash_near_dup", oracle=M.ahash_near_dup_oracle_sql(max_hamming=6))
def q_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming near-duplicate SIGNATURE pairs over the aHash space
    via 4x16-bit band buckets — the binary-code LSH completing the
    image side of the near-dup desk (MinHash covers text). DEDUPES to
    the signature catalog BEFORE banding (the r11 sf1-rung lesson:
    low-entropy payloads repeat signatures, and banding the raw
    corpus put 12k docs in one bucket at sf1 — 37x wall growth;
    the catalog is vocabulary-bounded, so candidate mass no longer
    grows with corpus size) and carries group multiplicities in
    n_a/n_b (operators/multimodal.ahash_near_dup)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.ahash_near_dup(M.fake_ahash(d), max_hamming=6)


@query("q_dhash_signatures", oracle=M.dhash_oracle_sql())
def q_dhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-hash (gradient) perceptual signatures over the
    binary payloads: the second member of the cheap near-dup hash
    ensemble — q_multimodal_ahash reads brightness-vs-mean, dHash
    reads horizontal gradients, and assets flagged by BOTH are the
    high-precision near-dup set. Same Arrow mapInPandas shape and
    32-bit-half encoding (operators/multimodal.fake_dhash)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.fake_dhash(d.select("doc_id", "payload"))


@query("q_dhash_near_dup", oracle=M.dhash_near_dup_oracle_sql(max_hamming=16))
def q_dhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Hamming near-duplicate pairs over the dHash (gradient)
    space: the second, independently-failing leg of the cheap image
    near-dup ensemble — q_ahash_near_dup flags brightness-profile
    twins, this flags gradient-structure twins, and assets in BOTH
    candidate sets are the high-precision near-dups a real pipeline
    quarantines. Same signature-catalog discipline (dedupe BEFORE
    banding, the r11 sf1-rung lesson) and the same 4x16-bit band
    join, reusing operators/multimodal.ahash_near_dup verbatim over
    the dHash signature space. Cutoff 16, not 6: gradient bits are
    noisier than brightness bits on these payloads (the closest
    band-colliding dHash pair sits at 16 at sf0.01 and 9 at bench
    scale, where aHash has exact twins), so the gradient leg is a
    wider CANDIDATE tier — precision comes from intersecting with
    q_ahash_near_dup, which is the ensemble's whole point; recall is
    band-limited as documented on the operator (the exact-recall
    radius of a 4-band split is 3) — identical algebra on both
    engines, so the contract is still bit-checkable."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return M.ahash_near_dup(M.fake_dhash(d.select("doc_id", "payload")), max_hamming=16)


@query(
    "q_near_dup_crosscheck",
    oracle=M.near_dup_crosscheck_oracle_sql(max_hamming_a=6, confirm_hamming=16),
)
def q_near_dup_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-space confirmation of the aHash near-dup tier by dHash:
    each banded aHash candidate pair gets the gradient-space Hamming
    distance between its representatives and a confirmed flag — the
    precision stage of the cheap perceptual ensemble (q_ahash_near_dup
    proposes, the independent gradient signature disposes; pairs
    flagged by BOTH spaces are the quarantine set a real image
    pipeline acts on). Candidate mass stays catalog-bounded; the
    confirmation is two doc-id-keyed joins
    (operators/multimodal.near_dup_crosscheck)."""
    d = M.attach_binary_payload(load_table(spark, sf_dir, "documents"))
    pairs = M.ahash_near_dup(M.fake_ahash(d), max_hamming=6)
    dh = M.fake_dhash(d.select("doc_id", "payload"))
    return M.near_dup_crosscheck(pairs, dh, confirm_hamming=16)
