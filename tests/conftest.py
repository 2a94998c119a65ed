import pytest
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.001"


def canonical_csv(pdf):
    """Dtype-SENSITIVE canonical rendering (sorted columns, sorted rows,
    CSV). The driver's correctness gate hashes rendered values, so a
    DuckDB ``SUM(BIGINT)`` → HUGEINT → float64 drift ('5' vs '5.0')
    fails it even when values are numerically equal —
    ``assert_frame_equal(check_dtype=False)`` HIDES exactly that, so
    parity tests must assert this rendering too (round-1 advice)."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf.to_csv(index=False)


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("tesseract_glue_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield spark
    spark.stop()
