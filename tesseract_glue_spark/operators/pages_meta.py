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


def pages_metadata_oracle_sql(table: str = "documents") -> str:
    """DuckDB-side dims from the contract (no pixels involved)."""
    d = D.DUCKDB
    n = truth.media_num_expr(d)
    # raw payload length: n%14=0 → 0; other blanks → 4 (' \t  ');
    # else length of the truth text
    tt = truth.truth_text_expr(n, d)
    raw_len = (
        f"(CASE WHEN {n} % 14 = 0 THEN 0 "
        f"WHEN {n} % 7 = 0 THEN 4 "
        f"ELSE length({tt}) END)"
    )
    ref = truth.media_ref_expr(d)
    return f"""
    SELECT DISTINCT {ref} AS media_ref,
           CAST(greatest(240, {raw_len} + 16) AS BIGINT) AS width,
           CAST(160 + ({n} % 4) * 40 AS BIGINT) AS height,
           'ok' AS status
    FROM {table}, unnest(generate_series(0, 2 * {truth.N_MEDIA})) AS _t(o)
    WHERE o % 2 = 1 AND NOT ({n} % 13 = 0 AND {n} % 7 <> 0)
    """.strip()
