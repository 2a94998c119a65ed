"""Table IO: sources and Iceberg-format-ready sinks.

Sandbox tests run on parquet; on a real cluster with the Iceberg
runtime jar + catalog configured, the same writer targets
``df.writeTo(table)`` (format-version-2 upsert-ready tables). The
format choice is a flag, not a code path fork — the pipeline above is
identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """Read the interleaved documents table. ``source`` is a parquet
    path (sandbox) or an ``iceberg:`` table identifier (cluster)."""
    if source.startswith("iceberg:"):
        return spark.read.format("iceberg").load(source[len("iceberg:"):])
    return spark.read.parquet(source)


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    if source.startswith("iceberg:"):
        return spark.read.format("iceberg").load(source[len("iceberg:"):])
    return spark.read.parquet(source)


def write_output(df: DataFrame, dest: str, mode: str = "append") -> None:
    """Write pipeline output. ``iceberg:<table>`` → ``writeTo`` append
    (requires the Iceberg runtime on the cluster classpath); anything
    else → parquet path. Partitioned/manifested writes go through
    :mod:`tesseract_glue_spark.sources.manifests` instead."""
    if dest.startswith("iceberg:"):
        table = dest[len("iceberg:"):]
        writer = df.writeTo(table)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    df.write.mode(mode).parquet(dest)
