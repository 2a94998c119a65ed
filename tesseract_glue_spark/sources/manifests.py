"""Partitioned sink with per-partition lineage manifests + resume.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The protocol adopts the reference's verify-then-atomic-rename
asset discipline (``languages.py:175-210``): a bucket is DONE iff its
manifest file exists and parses — manifests are written to a tempfile
and ``os.replace``d into place, so a crash mid-write never yields a
half-manifest.

Layout:

    out_dir/data/bucket=<i>/*.parquet     (bucket = pmod(xxhash64(doc_id), N))
    out_dir/_manifests/bucket-<i>.json    (counts, content hash, engine info)

Resume = drop documents whose bucket already has a valid manifest —
a partition-level anti-join that prunes at the bucket granularity
(cheap at 10^12 docs: the done-set is N entries, broadcast as a filter),
falling back to nothing-done when the manifest dir is empty.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tesseract_glue_spark.engine import engine_info

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))


def _manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"bucket-{bucket:05d}.json")


def _atomic_write_json(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(payload, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def write_extracted(
    extracted: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
    resume: bool = False,
) -> dict:
    """Write extraction output partitioned by doc-hash bucket, then emit
    one lineage manifest per bucket (counts, metric sums, order-
    insensitive content hash, engine/codec versions).

    The manifest aggregation is computed distributed (one groupBy over
    small columns); only the N-row summary is collected to the driver.
    Stats are aggregated from the JUST-WRITTEN parquet, not from the
    input DataFrame: a second action on the uncached extraction frame
    would re-execute the whole pipeline — including the dominant OCR
    mapInPandas stage — once more per run. Reading back also makes the
    manifest describe exactly what is durably on disk (including rows
    from prior runs after an append-mode doc-level resume).
    """
    df = with_bucket(extracted, n_buckets)
    data_dir = os.path.join(out_dir, DATA_DIR)
    if mode == "overwrite" and not resume:
        # A fresh (non-resume) overwrite means "replace the output":
        # clear stale bucket partitions + manifests from earlier runs
        # first. Dynamic partition overwrite only replaces the buckets
        # present in THIS write, so a stale bucket left by a previous
        # larger/different run would be re-read into the stats and
        # re-manifested as valid, inflating reported n_docs/throughput
        # (round-2 advisor finding). Resume runs must NOT do this —
        # completed buckets are exactly what they preserve.
        import shutil

        for sub in (DATA_DIR, MANIFEST_DIR):
            p = os.path.join(out_dir, sub)
            if os.path.isdir(p):
                shutil.rmtree(p)
    if mode == "append":
        # doc-level resume path: the frame holds only the missing docs of
        # partially-written buckets — dynamic overwrite would REPLACE each
        # touched bucket partition with just those docs, destroying the
        # rows that survived the crash. Append is safe against double
        # writes because a failed job commits no visible files.
        df.write.mode("append").partitionBy("bucket").parquet(data_dir)
    else:
        # dynamic partition overwrite: replace ONLY the buckets present in
        # this write. Static overwrite deletes the whole data dir first —
        # on a resume run that silently destroys every previously-completed
        # bucket while its manifest still claims done (found by driving the
        # corrupt-one-manifest resume path end-to-end).
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(data_dir)
        )

    # bound each row hash to 2^31 before summing: SUM over full-range
    # 64-bit hashes overflows BIGINT under ANSI mode; the truncated sum
    # is still an order-insensitive content fingerprint
    row_hash = F.pmod(
        F.xxhash64("doc_id", "status", "ocr_pages", "ocr_empty_pages"), F.lit(1 << 31)
    )
    written = extracted.sparkSession.read.parquet(data_dir).select(
        "bucket", "doc_id", "status", "ocr_pages", "ocr_empty_pages"
    )
    stats = (
        written.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ocr_pages").alias("n_pages"),
            F.sum("ocr_empty_pages").alias("n_empty_pages"),
            F.sum(F.when(F.col("status") == "partial", 1).otherwise(0)).alias("n_partial"),
            F.sum(row_hash).alias("content_hash"),
        )
        .collect()
    )
    info = engine_info()
    manifests = {}
    for r in stats:
        payload = {
            "bucket": int(r["bucket"]),
            "n_docs": int(r["n_docs"]),
            "n_pages": int(r["n_pages"] or 0),
            "n_empty_pages": int(r["n_empty_pages"] or 0),
            "n_partial": int(r["n_partial"] or 0),
            "content_hash": int(r["content_hash"] or 0),
            "engine": info,
        }
        _atomic_write_json(_manifest_path(out_dir, payload["bucket"]), payload)
        manifests[payload["bucket"]] = payload
    return manifests


def done_buckets(out_dir: str) -> set[int]:
    """Buckets with a valid (parseable) manifest — the done-set."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for fn in os.listdir(mdir):
        if not fn.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, fn)) as fh:
                payload = json.load(fh)
            done.add(int(payload["bucket"]))
        except (ValueError, KeyError, json.JSONDecodeError):
            continue  # invalid manifest ⇒ bucket not done
    return done


def resume_filter(
    docs: DataFrame, out_dir: str, n_buckets: int = 16, granularity: str = "bucket"
) -> DataFrame:
    """Documents still to process after a crash.

    ``granularity='bucket'`` (default): drop every doc whose bucket has a
    valid manifest — no per-doc anti-join, no scan of prior output. One
    bad/missing manifest re-runs its whole bucket.

    ``granularity='doc'``: additionally anti-join against the doc_ids
    already durably written in NOT-yet-manifested buckets, so a crash
    mid-run re-processes only genuinely missing documents (worth the
    extra shuffle when per-doc OCR cost dominates). Partition pruning
    keeps the read-back scan to the incomplete buckets only. Pair with
    ``write_extracted(..., mode='append')`` — dynamic overwrite would
    clobber the surviving rows of a partially-written bucket."""
    done = done_buckets(out_dir)
    bucketed = with_bucket(docs, n_buckets)
    if done:
        bucketed = bucketed.where(~F.col("bucket").isin(sorted(done)))
    if granularity == "doc":
        import glob

        data_dir = os.path.join(out_dir, DATA_DIR)
        # a crash BEFORE the first file commit leaves data_dir holding
        # only _temporary/ — reading it throws AnalysisException (unable
        # to infer schema) and the recovery path itself dies (round-2
        # advisor finding). Only anti-join when committed files exist.
        if glob.glob(os.path.join(data_dir, "bucket=*", "*.parquet")):
            written = docs.sparkSession.read.parquet(data_dir).select("doc_id", "bucket")
            if done:
                # partition-pruned: only incomplete buckets are scanned
                written = written.where(~F.col("bucket").isin(sorted(done)))
            bucketed = bucketed.join(
                written.select("doc_id").distinct(), "doc_id", "left_anti"
            )
    elif not done:
        return docs
    return bucketed.drop("bucket")
