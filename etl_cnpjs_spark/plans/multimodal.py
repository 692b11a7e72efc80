"""Multimodal-column plans (north_star): image/audio/video as opaque
``binary`` columns with typed metadata.

The testdata has no binary media, so the binary column is synthesized
from document text (UTF-8 bytes) — the *plumbing* is the product here:
binary schema, content hashing, Arrow-batched decode over mapInPandas,
frame-sample fanout. The actual media decode is STUBBED deterministically
(no image/audio libs in this environment): etl_cnpjs_spark/operators/
multimodal.py marks the real-decoder seam with NotImplementedError and
substitutes a deterministic fake feature extractor, so every downstream
shape (schema, batch handling, partitioning) is real and tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_cnpjs_spark.catalog import table
from etl_cnpjs_spark.operators.multimodal import decode_features_map_in_pandas
from etl_cnpjs_spark.plans.registry import register


def _with_blob(df: DataFrame) -> DataFrame:
    """Synthesize the opaque media column: blob = UTF-8 bytes of text."""
    return df.select(
        "doc_id",
        F.col("text").cast("binary").alias("blob"),
        F.col("source").alias("media_source"),
    )


@register(
    "mm_meta",
    oracle="""
    SELECT doc_id,
           source                     AS media_source,
           octet_length(encode(text)) AS n_bytes,
           sha256(text)               AS content_sha256,
           substr(sha256(text), 1, 16) AS content_id
    FROM documents
    -- DuckDB 1.0's sha256 binds VARCHAR only; the blob here is exactly the
    -- UTF-8 bytes of text, so hashing the VARCHAR is byte-identical to
    -- Spark's sha2(blob, 256).
    """,
    tags=("north_star", "multimodal"),
)
def mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length +
    content-addressed identity (sha256). At 100 TB this is the dedup /
    partition / lineage key layer for media lakes — computed JVM-side in
    one scan, no decode."""
    d = _with_blob(table(spark, sf_dir, "documents"))
    sha = F.sha2(F.col("blob"), 256)
    return d.select(
        "doc_id",
        "media_source",
        F.length("blob").alias("n_bytes"),
        sha.alias("content_sha256"),
        F.substring(sha, 1, 16).alias("content_id"),
    )


@register(
    "mm_decode",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))                        AS n_bytes,
           octet_length(encode(text)) % 640                  AS width,
           (octet_length(encode(text)) * 7) % 480            AS height,
           1 + octet_length(encode(text)) % 120              AS n_frames
    FROM documents
    """,
    tags=("north_star", "multimodal", "udf"),
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode over mapInPandas: blob → (width, height,
    n_frames). The decode itself is the deterministic STUB (real decoder
    seam raises NotImplementedError; see operators/multimodal.py) — the
    Spark-side contract (binary in via Arrow, typed struct out, batch
    iteration, executor-side libs) is exactly the real one."""
    d = _with_blob(table(spark, sf_dir, "documents"))
    return decode_features_map_in_pandas(d)


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(
             generate_series(0, (octet_length(encode(text)) % 120) // 10),
             i -> i * 10)) AS frame_idx
    FROM documents
    """,
    tags=("north_star", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling fanout: every 10th frame index per media blob
    (n_frames stubbed from byte length). sequence+explode — a narrow op,
    no shuffle; at scale the decode UDF runs *after* this fanout so each
    task decodes only its sampled frames."""
    d = _with_blob(table(spark, sf_dir, "documents"))
    n_frames = F.length("blob") % 120  # stub: fake frame count (see mm_decode)
    idx = F.sequence(F.lit(0), n_frames, F.lit(10))
    return d.select("doc_id", F.explode(idx).alias("frame_idx"))


@register(
    "mm_decode_wav",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS INT)          AS channels,
           CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
           CAST(16 AS INT)                      AS bits,
           n_chars * 10                         AS n_samples,
           (n_chars * 10 * 1000) // (8000 * (1 + doc_id % 3)) AS duration_ms
    FROM documents
    """,
    tags=("north_star", "multimodal", "udf"),
)
def mm_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL binary decode, end to end: each doc synthesizes a valid
    RIFF/WAVE file (PCM silence, parameters derived from the doc key),
    and the features come from PARSING those bytes back — chunk walk,
    struct-unpacked fmt header, data-chunk sizing — all executor-side
    over Arrow batches (operators/multimodal.py::synth_wav/parse_wav,
    pure stdlib). The oracle re-derives the parameters from the
    generation formulas, so the compare proves the encoder and the
    parser agree through actual bytes. This retires 'decode is only a
    stub' for uncompressed containers; decode_media remains the seam
    for codec-backed formats (JPEG/MP4 need libraries this environment
    lacks)."""
    from etl_cnpjs_spark.operators.multimodal import wav_roundtrip_map_in_pandas

    d = table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") * 10).alias("n_samples")
    )
    return wav_roundtrip_map_in_pandas(d)


@register(
    "mm_audio_features",
    oracle="""
    WITH p AS (SELECT doc_id, n_chars * 10 AS n, 16 + doc_id % 17 AS per
               FROM documents WHERE n_chars > 0),
    v AS (SELECT doc_id, n, per, unnest(generate_series(0, n - 1)) AS i FROM p),
    s AS (SELECT doc_id, n, i,
                 ((i % per) * 65536 // per) - 32768 AS smp
          FROM v),
    w AS (SELECT doc_id, n, smp,
                 lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev
          FROM s)
    SELECT doc_id,
           CAST(max(n) AS BIGINT)            AS n_samples,
           CAST(max(abs(smp)) AS BIGINT)     AS peak_abs,
           CAST(sum(smp * smp) AS BIGINT)    AS energy,
           CAST(sum(CASE WHEN prev IS NOT NULL
                          AND (CASE WHEN smp >= 0 THEN 1 ELSE -1 END)
                           <> (CASE WHEN prev >= 0 THEN 1 ELSE -1 END)
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM w GROUP BY doc_id
    """,
    tags=("north_star", "multimodal", "udf"),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over DECODED samples — the step after
    mm_decode_wav a curation pipeline actually needs (energy/silence
    gates, clipping detection): each doc synthesizes a sawtooth-PCM WAV
    (operators/multimodal.py::synth_wav_tone), the BYTES are parsed back
    to int16 samples, and peak |s|, exact Σ s² energy, and
    zero-crossing counts are computed with vectorized numpy over Arrow
    batches, executor-side. All-integer features, so the oracle
    re-derives them in closed form from the same sample formula — the
    compare proves encode → byte-walk → PCM decode → feature math end
    to end. Scale shape: scan-side mapInPandas, no shuffle; at 100 TB
    media bytes never leave the task (only the 4-number feature row
    does), the rule SCALE.md's multimodal section sets."""
    from etl_cnpjs_spark.operators.multimodal import audio_features_map_in_pandas

    d = (
        table(spark, sf_dir, "documents", parallel=True)
        .select("doc_id", (F.col("n_chars") * 10).alias("n_samples"))
        .filter(F.col("n_samples") > 0)
    )
    return audio_features_map_in_pandas(d)


@register(
    "mm_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(16 + doc_id % 17 AS INT) AS width,
             CAST(16 + doc_id % 13 AS INT) AS height
      FROM documents
    ),
    grid AS (
      SELECT d.doc_id, d.width, d.height, gy.y, gx.x,
             (d.doc_id * 31
              + ((gy.y * d.height) // 8) * d.width
              + ((gx.x * d.width) // 8)) % 256 AS px
      FROM dims d
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS y) gy
      CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS x) gx
    )
    SELECT doc_id,
           CAST(max(width) AS INT)                 AS width,
           CAST(max(height) AS INT)                AS height,
           CAST(sum(px) AS BIGINT)                 AS thumb_sum,
           CAST(sum(px * (1 + x + 8 * y)) AS BIGINT) AS thumb_hash
    FROM grid GROUP BY doc_id
    """,
    tags=("north_star", "multimodal", "udf"),
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize/thumbnail — the remaining member of the multimodal
    set (decode / feature-extract / frame-sample / RESIZE): decode each
    image (deterministic stub — the codec seam is
    operators/multimodal.py::decode_media) and nearest-neighbor resize
    it to an 8×8 thumbnail with REAL numpy gather indexing, the exact
    access pattern a PIL/cv2 NN resize performs, executor-side over
    Arrow batches. Output features (pixel sum + position-weighted hash)
    are all-integer, so the oracle re-derives them in closed form from
    the stub pixel formula — the compare proves decode → source-coord
    mapping floor(t·dim/8) → gather → feature math end to end. Scale
    shape: scan-side mapInPandas after any frame/partition pruning;
    image bytes never enter a shuffle."""
    from etl_cnpjs_spark.operators.multimodal import resize_thumb_map_in_pandas

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        (16 + F.col("doc_id") % 17).cast("int").alias("width"),
        (16 + F.col("doc_id") % 13).cast("int").alias("height"),
    )
    return resize_thumb_map_in_pandas(d)


@register(
    "mm_decode_bmp",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(8 + doc_id % 9 AS INT) AS width,
             CAST(8 + doc_id % 7 AS INT) AS height
      FROM documents
    ),
    grid AS (
      SELECT d.doc_id, d.width, d.height, gy.y, gx.x,
             (gx.x + 3 * gy.y + d.doc_id) % 256     AS b,
             (2 * gx.x + gy.y + d.doc_id) % 256     AS g,
             (gx.x + gy.y + 3 * d.doc_id) % 256     AS r
      FROM dims d
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x) gx
      CROSS JOIN (SELECT unnest(generate_series(0, 13)) AS y) gy
      WHERE gx.x < d.width AND gy.y < d.height
    )
    SELECT doc_id,
           CAST(max(width) AS INT)  AS width,
           CAST(max(height) AS INT) AS height,
           CAST(24 AS INT)          AS bpp,
           CAST(sum(b + g + r) AS BIGINT) AS pixel_sum,
           CAST(sum((b + 2 * g + 3 * r) * (1 + x + width * y)) AS BIGINT)
             AS px_hash
    FROM grid GROUP BY doc_id
    """,
    tags=("north_star", "multimodal", "udf", "image"),
)
def mm_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode — the image twin of mm_decode_wav, upgrading
    the image half of the codec seam from stub to genuine bytes: each
    doc synthesizes a VALID 24-bit uncompressed BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER, bottom-up rows, 4-byte padding — a real container,
    pure struct/numpy, no codec library), then PARSES those bytes back
    executor-side and reduces the decoded pixel array to integer
    features. The position- and channel-weighted px_hash is exact only
    if the decoder honors BGR order, skips row padding, and un-flips
    bottom-up storage — the three details that distinguish decoding
    from pattern-replay. decode_media (operators/multimodal.py) remains
    the seam for codec-backed formats (JPEG/PNG need PIL, absent here —
    re-checked this round).

    Scale shape: mapInPandas over Arrow batches, scan-side; image bytes
    are born and die inside the task — only the 6-number feature row
    crosses to the JVM, nothing binary ever shuffles (SCALE.md
    multimodal rule). The oracle re-derives every feature in closed
    form from the pixel pattern, fully independent of the bytes."""
    from etl_cnpjs_spark.operators.multimodal import bmp_features_map_in_pandas

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (8 + F.col("doc_id") % 9).cast("int").alias("width"),
        (8 + F.col("doc_id") % 7).cast("int").alias("height"),
    )
    return bmp_features_map_in_pandas(d)


@register(
    "mm_image_dedup",
    oracle="""
    WITH grp AS (
      SELECT doc_id % 64 AS seed,
             CAST(count(*) AS BIGINT) AS n_dups,
             CAST(min(doc_id) AS BIGINT) AS canonical_id
      FROM documents GROUP BY 1),
    dims AS (
      SELECT seed,
             CAST(8 + seed % 9 AS INT) AS width,
             CAST(8 + seed % 7 AS INT) AS height
      FROM grp
    ),
    grid AS (
      SELECT d.seed, d.width, d.height, gy.y, gx.x,
             (gx.x + 3 * gy.y + d.seed) % 256     AS b,
             (2 * gx.x + gy.y + d.seed) % 256     AS g,
             (gx.x + gy.y + 3 * d.seed) % 256     AS r
      FROM dims d
      CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS x) gx
      CROSS JOIN (SELECT unnest(generate_series(0, 13)) AS y) gy
      WHERE gx.x < d.width AND gy.y < d.height
    ),
    feat AS (
      SELECT seed,
             CAST(max(width) AS INT)  AS width,
             CAST(max(height) AS INT) AS height,
             CAST(sum(b + g + r) AS BIGINT) AS pixel_sum,
             CAST(sum((b + 2 * g + 3 * r) * (1 + x + width * y)) AS BIGINT)
               AS px_hash
      FROM grid GROUP BY seed)
    SELECT f.width, f.height, f.pixel_sum, f.px_hash,
           g.n_dups, g.canonical_id
    FROM feat f JOIN grp g ON f.seed = g.seed
    WHERE g.n_dups >= 2
    """,
    tags=("north_star", "multimodal", "dedup", "image"),
)
def mm_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact image dedup over DECODED bytes — the multimodal↔dedup
    bridge: every doc synthesizes its image (seed = doc_id % 64, so the
    corpus genuinely contains ~n/64-way duplicate groups, the CommonCrawl
    reality), the executor PARSES the real BMP bytes back, and the dedup
    key is md5 of the decoded pixel array — content-addressed identity,
    byte-order/padding/flip included, exactly what a CAS-backed ingest
    dedups on. Groups of ≥2 report size and the min-doc_id canonical.

    The oracle never sees a byte: it re-derives each group's features in
    closed form from the pixel pattern and each group's membership from
    the seed arithmetic — so a hash-green row proves the decode+md5+
    groupBy pipeline found EXACTLY the true duplicate sets (the md5
    grouping and the analytic grouping must coincide group-for-group).

    Scale story: the shuffle key is a 16-byte digest + 4 ints per IMAGE
    (never pixels — SCALE.md multimodal rule); dedup_exact's digest-
    groupBy discipline applied to binary media. Perceptual (near-dup)
    hashing drops into the same shape by swapping md5 for an
    average-hash band key, LSH-style (documented seam; the exact path
    is the verified one)."""
    from etl_cnpjs_spark.operators.multimodal import bmp_fingerprint_map_in_pandas

    d = table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id",
        (F.col("doc_id") % 64).alias("seed"),
        (8 + (F.col("doc_id") % 64) % 9).cast("int").alias("width"),
        (8 + (F.col("doc_id") % 64) % 7).cast("int").alias("height"),
    )
    fp = bmp_fingerprint_map_in_pandas(d)
    return (
        fp.groupBy("px_md5")
        .agg(
            F.any_value("width").alias("width"),
            F.any_value("height").alias("height"),
            F.any_value("pixel_sum").alias("pixel_sum"),
            F.any_value("px_hash").alias("px_hash"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
            F.min("doc_id").cast("bigint").alias("canonical_id"),
        )
        .filter(F.col("n_dups") >= 2)
        .drop("px_md5")
    )
