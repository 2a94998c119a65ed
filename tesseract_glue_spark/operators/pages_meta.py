"""Oracle-checked page-store queries.

The fixture contract makes page GEOMETRY SQL-derivable: for media id n,
``payload = raw_payload_text(n)`` (ASCII), ``width = max(240, len+16)``,
``height = 160 + (n % 4) * 40`` (:mod:`..imaging.render`). The Spark
side renders real PNGs and reads dims back from the IHDR header
(multimodal metadata scan); the oracle computes the same dims from
arithmetic — so the renderer, the PNG codec, and the metadata operator
are all value-checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tesseract_glue_spark.functions import dialect as D
from tesseract_glue_spark.functions import truth


def pages_metadata_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render the page store, then header-scan it (real pixels)."""
    from pyspark.sql import functions as F

    from tesseract_glue_spark.fixtures import interleaved_documents, pages_for
    from tesseract_glue_spark.operators.multimodal import image_metadata

    pages = pages_for(interleaved_documents(spark, sf_dir))
    return image_metadata(pages).select(
        "media_ref",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "status",
    )


def _raw_len_expr(d: str, n: str) -> str:
    """UTF-8 byte length of the pixel-embedded payload for media id n:
    n%14=0 → 0; other blanks → 4 (' \\t  '); else len(truth text)."""
    tt = truth.truth_text_expr(n, d)
    return (
        f"(CASE WHEN {n} % 14 = 0 THEN 0 "
        f"WHEN {n} % 7 = 0 THEN 4 "
        f"ELSE length({tt}) END)"
    )


def pages_metadata_oracle_sql(table: str = "documents") -> str:
    """DuckDB-side dims from the contract (no pixels involved)."""
    d = D.DUCKDB
    n = truth.media_num_expr(d)
    raw_len = _raw_len_expr(d, n)
    ref = truth.media_ref_expr(d)
    return f"""
    SELECT DISTINCT {ref} AS media_ref,
           CAST(greatest(240, {raw_len} + 16) AS BIGINT) AS width,
           CAST(160 + ({n} % 4) * 40 AS BIGINT) AS height,
           'ok' AS status
    FROM {table}, unnest(generate_series(0, 2 * {truth.N_MEDIA})) AS _t(o)
    WHERE o % 2 = 1 AND NOT ({n} % 13 = 0 AND {n} % 7 <> 0)
    """.strip()


RESIZE_MAX_SIDE = 64


def image_resize_dims_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every real page (real decode → stride downsample →
    re-encode) and emit the thumbnail geometry."""
    from pyspark.sql import functions as F

    from tesseract_glue_spark.fixtures import interleaved_documents, pages_for
    from tesseract_glue_spark.operators.multimodal import image_resize

    pages = pages_for(interleaved_documents(spark, sf_dir))
    return image_resize(pages, max_side=RESIZE_MAX_SIDE).select(
        "media_ref",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )


def image_resize_dims_oracle_sql(table: str = "documents") -> str:
    """Thumbnail geometry from the contract: the nearest-neighbor stride
    is ``ceil(max(w,h)/max_side)`` and each output dim is ``ceil(dim/
    stride)`` — pure integer arithmetic (all operands positive, so
    truncating division + the +k-1 trick is exact ceil in both engines)."""
    d = D.DUCKDB
    n = truth.media_num_expr(d)
    raw_len = _raw_len_expr(d, n)
    ref = truth.media_ref_expr(d)
    m = RESIZE_MAX_SIDE
    w = f"greatest(240, {raw_len} + 16)"
    h = f"(160 + ({n} % 4) * 40)"
    step = f"greatest(1, (greatest({w}, {h}) + {m - 1}) // {m})"
    return f"""
    SELECT DISTINCT media_ref,
           CAST((w + step - 1) // step AS BIGINT) AS width,
           CAST((h + step - 1) // step AS BIGINT) AS height
    FROM (
        SELECT {ref} AS media_ref, {w} AS w, {h} AS h, {step} AS step
        FROM {table}, unnest(generate_series(0, 2 * {truth.N_MEDIA})) AS _t(o)
        WHERE o % 2 = 1 AND NOT ({n} % 13 = 0 AND {n} % 7 <> 0)
    ) g
    """.strip()


def image_features_blank_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page feature extraction (Otsu ink ratio + mean intensity),
    restricted to the BLANK-page subset where both integers are
    closed-form derivable from the fixture contract: a blank page is
    255-white except its 6- or 10-byte payload stream, Otsu separates
    exactly those stream pixels as ink, and the truncated mean is
    ``(255·w·h − deficit) div (w·h)``. The float histogram column is
    excluded (floats are banned from oracle-compared outputs); the full
    corpus runs through the same kernel in pytest."""
    from pyspark.sql import functions as F

    from tesseract_glue_spark.fixtures import interleaved_documents, pages_for
    from tesseract_glue_spark.operators.multimodal import image_features

    pages = pages_for(interleaved_documents(spark, sf_dir))
    n = F.substring("media_ref", 5, 8).cast("int")
    return (
        image_features(pages)
        .where(n % 7 == 0)
        .select(
            "media_ref",
            F.col("ink_ratio_x10k").cast("long").alias("ink_ratio_x10k"),
            F.col("mean_intensity").cast("long").alias("mean_intensity"),
        )
    )


def image_features_blank_oracle_sql(table: str = "documents") -> str:
    """Blank-page features in closed form (same stream model as
    :func:`image_pixel_stats_oracle_sql`): ink = stream pixels (6 when
    n%14=0 else 10), ratio = (10⁴·ink) div (w·h); mean =
    (255·w·h − deficit) div (w·h)."""
    d = D.DUCKDB
    n = truth.media_num_expr(d)
    ref = truth.media_ref_expr(d)
    ink = f"(CASE WHEN {n} % 14 = 0 THEN 6 ELSE 10 END)"
    deficit = f"(CASE WHEN {n} % 14 = 0 THEN {6 * 255 - 155} ELSE {10 * 255 - 264} END)"
    h = f"(160 + ({n} % 4) * 40)"
    area = f"(240 * {h})"
    return f"""
    SELECT DISTINCT {ref} AS media_ref,
           CAST({D.int_div(d, f'(10000 * {ink})', area)} AS BIGINT) AS ink_ratio_x10k,
           CAST({D.int_div(d, f'(255 * {area} - {deficit})', area)} AS BIGINT) AS mean_intensity
    FROM {table}, unnest(generate_series(0, 2 * {truth.N_MEDIA})) AS _t(o)
    WHERE o % 2 = 1 AND {n} % 7 = 0
    """.strip()


def image_pixel_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pixel decode + stats, restricted to the BLANK-page subset
    (media id % 7 = 0) where the contract derives the exact non-white
    count and intensity sum: a blank page is 255-white except the
    payload stream ``b'TG' + len(4B BE) + payload`` in row 0. The full
    corpus runs through the same kernel in pytest (``test_multimodal``);
    this is the oracle-checkable slice — it value-checks renderer, PNG
    codec, and the stats kernel bit-for-bit."""
    from pyspark.sql import functions as F

    from tesseract_glue_spark.fixtures import interleaved_documents, pages_for
    from tesseract_glue_spark.operators.multimodal import image_pixel_stats

    pages = pages_for(interleaved_documents(spark, sf_dir))
    n = F.substring("media_ref", 5, 8).cast("int")
    return image_pixel_stats(pages).where(n % 7 == 0)


def image_pixel_stats_oracle_sql(table: str = "documents") -> str:
    """Blank-page pixel stats in closed form. Stream bytes: 'T'=84,
    'G'=71, 4 length bytes, then the payload (n%14=0 → empty; else
    ' \\t  ' = 32+9+32+32). All stream bytes ≠ 255, everything else is
    255, so n_nonwhite = 6 + raw_len and px_sum = 255·w·h − deficit
    where deficit = 255·n_nonwhite − stream_sum."""
    d = D.DUCKDB
    n = truth.media_num_expr(d)
    ref = truth.media_ref_expr(d)
    # n%14=0: stream sum 84+71 = 155, 6 bytes; else +4 (len byte) + 105
    # (whitespace payload) = 264 over 10 bytes
    nonwhite = f"(CASE WHEN {n} % 14 = 0 THEN 6 ELSE 10 END)"
    deficit = f"(CASE WHEN {n} % 14 = 0 THEN {6 * 255 - 155} ELSE {10 * 255 - 264} END)"
    h = f"(160 + ({n} % 4) * 40)"
    return f"""
    SELECT DISTINCT {ref} AS media_ref,
           CAST(240 AS BIGINT) AS width,
           CAST({h} AS BIGINT) AS height,
           CAST({nonwhite} AS BIGINT) AS n_nonwhite,
           CAST(255 * 240 * {h} - {deficit} AS BIGINT) AS px_sum
    FROM {table}, unnest(generate_series(0, 2 * {truth.N_MEDIA})) AS _t(o)
    WHERE o % 2 = 1 AND {n} % 7 = 0
    """.strip()
