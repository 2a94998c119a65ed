"""The extraction pipeline: interleaved docs + page store → OCR'd docs.

This is the Spark-first re-expression of the reference's whole workflow
(``Engine → Reader → read`` per page, ``reader.py:66-77`` →
``reader2.cpp:39-51``) over a table of 10^12 interleaved documents:

    scan documents ──explode──► spans ──filter media──► distinct refs
        ──left join pages──► OCR (mapInPandas, engine cached per worker)
        ──join back to media spans──► union text spans
        ──groupBy(doc_id) order-preserving reassembly──► output docs

Scale design notes (the part that must survive 1000 executors / 100 TB):

* **Dedup before OCR**: OCR cost dominates, so each distinct
  ``media_ref`` is recognized exactly once no matter how many spans
  reference it (SURVEY §2B "media dedup").
* **Shuffle inventory**: (1) distinct refs, (2) refs⋈pages join,
  (3) ocr⋈media-spans join, (4) doc reassembly groupBy. 1 and 3 move
  only (ref, small-text) rows; the heavy pixel bytes move exactly once
  (into the OCR stage) and never through a groupBy. The reassembly
  shuffles only text — never image bytes.
* **Join strategy**: OCR results are |distinct refs| rows of short
  text; with AQE on, Spark converts the stitch join to broadcast when
  it fits; `broadcast_ocr_results=True` forces the hint for clusters
  where the estimate is off.
* **Order preservation**: never rely on row order through a shuffle —
  ordering is reconstructed from the carried ``offset`` field via
  ``sort_array`` / ``array_sort`` inside the aggregation (SURVEY §7
  hard-point (a)).
* **Skew**: many-page documents (heavy tail) are handled by optional
  two-phase RANGE-CHUNKED reassembly (partial collect+sort per
  (doc_id, offset DIV block), then an O(n) ordered concat of the
  pre-sorted chunks) — `salt_reassembly=S`. The chunk key preserves
  contiguous offset ranges, so order preservation needs no second
  sort (SURVEY §7 hard-point (b); skew_bench.py for the measured
  comparison against modulo salting, which re-sorted serially).
* **Degrade, don't die**: dangling refs / undecodable pages become
  status values, never task failures (``reader2.cpp:19-23``,
  ``ImageLoaderStrategies.cpp:14-16``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tesseract_glue_spark import errors
from tesseract_glue_spark.config import ExtractionConfig
from tesseract_glue_spark.engine import get_engine
from tesseract_glue_spark.imaging import kernels
from tesseract_glue_spark.imaging.codecs import decode_image
from tesseract_glue_spark.imaging.render import PAYLOAD_ROWS

OCR_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("ocr_text", T.StringType()),
        T.StructField("ocr_status", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_zones", T.IntegerType()),
        T.StructField("shear", T.DoubleType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("confidence_x10k", T.IntegerType()),
        T.StructField("proc_us", T.LongType()),
    ]
)

EXTRACTED_SCHEMA_COLS = ["doc_id", "spans", "ocr_pages", "ocr_empty_pages", "status"]


def explode_spans(docs: DataFrame) -> DataFrame:
    """documents → flat span table (doc_id, offset, kind, text, media_ref).

    ``posexplode_outer`` so a document with zero spans (or NULL spans)
    still yields one row (null kind) and therefore still appears in the
    output — at 10^12 docs, resume/lineage accounting requires every
    input doc to survive the pipeline."""
    return (
        docs.select(
            "doc_id",
            # carried doc size: free (projection of the source array),
            # lets reassemble() route heavy-tail docs to the chunked
            # two-phase plan without a counting shuffle
            F.coalesce(F.size("spans"), F.lit(0)).alias("n_spans"),
            F.posexplode_outer("spans").alias("pos", "s"),
        )
        .select(
            "doc_id",
            "n_spans",
            F.col("s.offset").alias("offset"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
        )
    )


def distinct_media_refs(spans: DataFrame) -> DataFrame:
    """Media spans → distinct refs (OCR each page once; SURVEY §2B)."""
    return (
        spans.where((F.col("kind") == "media") & (F.col("media_ref") != ""))
        .select("media_ref")
        .distinct()
    )


def ocr_one_page(engine, config: ExtractionConfig, img_bytes):
    """OCR one page inside a worker: decode → preprocess (Otsu, deskew,
    XY-cut zones) → recognize, with the degrade-don't-die status
    mapping. Returns ``(text, status, w, h, n_zones, shear,
    confidence_x10k, proc_us)``. Shared by the media-only OCR stage and
    the fused web strip+OCR stage — ONE implementation of the per-page
    contract."""
    import time as _time

    _t0 = _time.perf_counter()
    if img_bytes is None:
        return ("", errors.STATUS_DANGLING, 0, 0, 0, 0.0, 0,
                int(1e6 * (_time.perf_counter() - _t0)))
    try:
        gray = kernels.to_grayscale(decode_image(bytes(img_bytes)))
        h, w = gray.shape
        n_zones, shear = 0, 0.0
        if config.preprocess:
            body = gray[PAYLOAD_ROWS:]
            ink, t = kernels.otsu_binarize_with_threshold(body)
            if ink.any():
                shear = kernels.estimate_shear(ink)
                if abs(shear) > 1e-3:
                    # deskew preserves pixel values → the Otsu
                    # threshold is unchanged; re-binarize by
                    # compare only (no second histogram pass)
                    body = kernels.deskew(body, shear)
                    ink = body <= t
                n_zones = len(kernels.xy_cut(ink))
        text = engine.recognize(gray)
        status = errors.STATUS_EMPTY if text == "" else errors.STATUS_OK
        if not engine.good:
            status = errors.STATUS_ENGINE_BAD
        # confidence: backends expose [0,1]-scaled certainty (the
        # stub's payload decode is exact → 1.0; a real Tesseract
        # backend maps mean word confidence here)
        conf = 0 if not engine.good else 10000
        return (text, status, w, h, n_zones, float(shear), conf,
                int(1e6 * (_time.perf_counter() - _t0)))
    except errors.ExtractionError:
        return ("", errors.STATUS_DECODE_ERROR, 0, 0, 0, 0.0, 0,
                int(1e6 * (_time.perf_counter() - _t0)))


def _make_ocr_fn(config: ExtractionConfig):
    """Build the mapInPandas kernel. The engine is constructed at most
    once per Python worker process via the module-global cache in
    :mod:`tesseract_glue_spark.engine` (the Reader-reuse analogue,
    ``reader2.cpp:15-27``) — NOT per batch, NOT per row."""

    def ocr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        engine = get_engine(config)  # lazy init, cached for the worker's lifetime
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1

        for pdf in batches:
            refs, texts, statuses, ws, hs, zones, shears = [], [], [], [], [], [], []
            confs, procs = [], []
            for ref, img_bytes in zip(pdf["media_ref"], pdf["image"]):
                refs.append(ref)
                text, status, w, h, n_zones, shear, conf, us = ocr_one_page(
                    engine, config, img_bytes
                )
                texts.append(text)
                statuses.append(status)
                ws.append(w)
                hs.append(h)
                zones.append(n_zones)
                shears.append(shear)
                confs.append(conf)
                procs.append(us)
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "ocr_text": texts,
                    "ocr_status": statuses,
                    "width": ws,
                    "height": hs,
                    "n_zones": zones,
                    "shear": shears,
                    "partition_id": pid,
                    "confidence_x10k": confs,
                    "proc_us": procs,
                }
            )

    return ocr_batches


def ocr_media(spans: DataFrame, pages: DataFrame, config: ExtractionConfig) -> DataFrame:
    """distinct media refs ⋈ pages → per-ref OCR results.

    Left join keeps dangling refs (null image → STATUS_DANGLING inside
    the kernel) so error accounting needs no second pass."""
    from tesseract_glue_spark.sources.shipping import ensure_shipped

    ensure_shipped(spans.sparkSession)
    refs = distinct_media_refs(spans)
    page_side = pages.select("media_ref", "image")
    if config.dedup_pages:
        # duplicate page rows would multiply through the left join and
        # duplicate spans after stitch — guard when the resolver can't
        # guarantee uniqueness (costs a pages shuffle; see config)
        page_side = page_side.dropDuplicates(["media_ref"])
    resolved = refs.join(page_side, "media_ref", "left")
    # ALWAYS round-robin repartition before the OCR UDF. Two traps here:
    # (a) AQE sizes partitions by bytes and coalesces a "small" page
    #     batch onto one task — but per-row OCR cost is huge relative to
    #     row size, so byte-based coalescing serializes the stage;
    # (b) repartition(N, 'media_ref') is ELIDED by Catalyst as redundant
    #     (the upstream distinct already hash-partitions on media_ref),
    #     after which AQE collapses that shuffle to 1 partition.
    # Round-robin repartition(N) avoids both: it is never elided (it's a
    # different partitioning), AQE never coalesces a user-specified N,
    # and it load-balances pages evenly across UDF workers regardless of
    # ref-hash skew.
    # 1 task per core (r6, measured): every mapInPandas task pays a
    # fixed Python protocol cost (~7-14 ms on an identity kernel: 32
    # tasks 0.46 s, 64 tasks 0.63 s, 128 tasks 1.09 s, 256 tasks
    # 2.04 s on idle local[32]; mapInArrow measured the same, so it is
    # the task protocol, not pandas conversion), while round-robin
    # keeps per-task PAGE COUNTS exactly even — per-page cost variance
    # (deskew, picture blocks) averages out over the ~100+ pages each
    # task holds. Interleaved A/B at sf0.1: extract_full med 2.14 s at
    # 1× vs 2.29 s at 2× vs 2.82 s at the old 4×. The straggler
    # question was also settled by measurement, not assumption: 4→16
    # scaling_bench pairs at 1× vs 2× medianed 0.742 vs 0.715 — the
    # multiplier is NOT what moves pair efficiency (window noise is;
    # see BENCH.md §-2), so the bench-optimal 1× stands. The
    # multiplier scales with cluster parallelism;
    # config.ocr_partitions overrides it for corpora with genuinely
    # heavy-tailed per-page cost (where one task's pages no longer
    # average out).
    n_parts = config.ocr_partitions or spans.sparkSession.sparkContext.defaultParallelism
    resolved = resolved.repartition(n_parts)
    return resolved.mapInPandas(_make_ocr_fn(config), schema=OCR_RESULT_SCHEMA)


def ocr_partition_metrics(ocr: DataFrame) -> DataFrame:
    """Per-partition OCR metrics (lineage side-channel, SURVEY §7
    Stage 3): page/status counts and zone totals per physical partition
    of the OCR stage. Feed into run-level manifests; at scale, persist
    the ocr frame first so metrics don't recompute the stage."""
    return ocr.groupBy("partition_id").agg(
        F.count("*").alias("n_pages"),
        F.sum(F.when(F.col("ocr_status") == errors.STATUS_EMPTY, 1).otherwise(0)).alias("n_empty"),
        F.sum(F.when(F.col("ocr_status") == errors.STATUS_DANGLING, 1).otherwise(0)).alias("n_dangling"),
        F.sum(
            F.when(F.col("ocr_status") == errors.STATUS_DECODE_ERROR, 1).otherwise(0)
        ).alias("n_decode_errors"),
        F.sum("n_zones").alias("n_zones_total"),
        F.avg(F.abs("shear")).alias("avg_abs_shear"),
        F.avg("confidence_x10k").alias("avg_confidence_x10k"),
        F.sum("proc_us").alias("proc_us_total"),
    )


def stitch(spans: DataFrame, ocr: DataFrame, config: ExtractionConfig) -> DataFrame:
    """Attach OCR text to media spans; pass text spans through. The
    carried ``n_spans`` doc size (when the span frame has it) flows
    through so reassembly can route heavy-tail docs."""
    carry = ["n_spans"] if "n_spans" in spans.columns else []
    media = spans.where(F.col("kind") == "media")
    # null-kind rows are empty-doc placeholders from posexplode_outer —
    # keep them so the doc survives reassembly, drop them from the array
    text_spans = spans.where(
        (F.col("kind") != "media") | F.col("kind").isNull()
    ).withColumn("ocr_status", F.lit(None).cast("string"))
    ocr_small = ocr.select("media_ref", "ocr_text", "ocr_status")
    if config.broadcast_ocr_results:
        ocr_small = F.broadcast(ocr_small)
    stitched_media = media.join(ocr_small, "media_ref", "left").select(
        "doc_id",
        *carry,
        "offset",
        "kind",
        F.coalesce("ocr_text", F.lit("")).alias("text"),
        "media_ref",
        F.coalesce("ocr_status", F.lit(errors.STATUS_DANGLING)).alias("ocr_status"),
    )
    return text_spans.select(
        "doc_id", *carry, "offset", "kind", "text", "media_ref", "ocr_status"
    ).unionByName(stitched_media)


_SPAN_STRUCT_EXPR = (
    "transform(filter({src}, s -> s.kind IS NOT NULL), "
    "s -> struct(s.kind AS kind, s.text AS text, s.media_ref AS media_ref, s.offset AS offset))"
)

def _metric_aggs() -> list:
    return [
        F.sum(
            F.when(
                (F.col("kind") == "media")
                & F.col("ocr_status").isin(errors.STATUS_OK, errors.STATUS_EMPTY, errors.STATUS_ENGINE_BAD),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("ocr_pages"),
        F.sum(
            F.when(
                (F.col("kind") == "media")
                & (F.col("text") == "")
                & F.col("ocr_status").isin(errors.STATUS_EMPTY, errors.STATUS_ENGINE_BAD),
                1,
            ).otherwise(0)
        )
        .cast("int")
        .alias("ocr_empty_pages"),
        F.max(
            F.when(
                F.col("ocr_status").isin(errors.STATUS_DANGLING, errors.STATUS_DECODE_ERROR)
                & (F.col("kind") == "media"),
                1,
            ).otherwise(0)
        ).alias("_any_err"),
    ]


def reassemble(stitched: DataFrame, config: ExtractionConfig) -> DataFrame:
    """Order-preserving reconstruction of the span array per document.

    Never relies on shuffle order: the sort key is the carried
    ``offset``, applied *inside* the aggregation via ``sort_array`` on
    offset-first structs. With ``salt_reassembly=S`` the collect runs in
    two phases so a single hot doc_id cannot overload one reducer.

    The salt is a RANGE CHUNK, not a modulo: phase 1 groups on
    (doc_id, offset DIV B) with chunk size ``B = max(S, 1024)`` spans,
    so each chunk covers a contiguous offset range and is sorted in
    parallel; phase 2 concatenates the pre-sorted chunks in chunk
    order — an O(n) serial merge. The earlier modulo salt
    (offset % S) interleaved ranges across salts, forcing phase 2 to
    re-sort the ENTIRE hot document serially (array_sort after
    flatten) — measured SLOWER than unsalted at every corpus shape
    (skew_bench.py, r5): it paid the same serial O(n log n) plus a
    second shuffle.

    When the frame carries the doc size (``n_spans``, free from
    ``size(spans)`` at explode time — no counting shuffle), documents
    that fit one chunk take the SINGLE-PHASE plan and only heavy-tail
    docs pay the two-phase gather: the uniform-corpus penalty of
    unconditional two-phase measured 26% (skew_bench.py) and is
    eliminated by the routing. Both branches read the same stitched
    subtree; its exchanges are planned once and reused (ReusedExchange
    / AQE stage reuse), so the OCR stage never re-executes.
    """
    ordered_struct = F.struct("offset", "kind", "text", "media_ref")

    def single_phase(side: DataFrame) -> DataFrame:
        return side.groupBy("doc_id").agg(
            F.sort_array(F.collect_list(ordered_struct)).alias("_sorted"),
            *_metric_aggs(),
        )

    def two_phase(side: DataFrame, block: int) -> DataFrame:
        partial = (
            side.withColumn("_salt", F.expr(f"offset DIV {block}"))
            .groupBy("doc_id", "_salt")
            .agg(
                F.sort_array(F.collect_list(ordered_struct)).alias("_part"),
                *_metric_aggs(),
            )
        )
        return partial.groupBy("doc_id").agg(
            F.expr(
                "flatten(transform(sort_array(collect_list(struct(_salt, _part))), "
                "x -> x._part))"
            ).alias("_sorted"),
            F.sum("ocr_pages").cast("int").alias("ocr_pages"),
            F.sum("ocr_empty_pages").cast("int").alias("ocr_empty_pages"),
            F.max("_any_err").alias("_any_err"),
        )

    if config.salt_reassembly and config.salt_reassembly > 1:
        block = max(int(config.salt_reassembly), 1024)
        if "n_spans" in stitched.columns:
            small = stitched.where(F.col("n_spans") <= block)
            big = stitched.where(F.col("n_spans") > block)
            doc = single_phase(small).unionByName(two_phase(big, block))
        else:
            doc = two_phase(stitched, block)
    else:
        doc = single_phase(stitched)
    return doc.select(
        "doc_id",
        F.expr(_SPAN_STRUCT_EXPR.format(src="_sorted")).alias("spans"),
        "ocr_pages",
        "ocr_empty_pages",
        F.when(F.col("_any_err") > 0, "partial").otherwise("ok").alias("status"),
    )


def extract_documents(
    docs: DataFrame, pages: DataFrame, config: ExtractionConfig | None = None
) -> DataFrame:
    """Full pipeline: documents + page store → OCR'd documents.

    Output schema: input schema with media-span text filled in, plus
    per-doc metrics (FIXTURES.md §3): ocr_pages, ocr_empty_pages, status.
    """
    cfg = (config or ExtractionConfig()).validated()
    spans = explode_spans(docs)
    ocr = ocr_media(spans, pages, cfg)
    return reassemble(stitch(spans, ocr, cfg), cfg)


def extract_flat(
    docs: DataFrame, pages: DataFrame, config: ExtractionConfig | None = None
) -> DataFrame:
    """Flattened extraction output (one row per span) — the
    oracle-comparable projection of :func:`extract_documents`.

    ``posexplode_outer`` so a document whose extracted span array is
    empty/NULL still yields one placeholder row (NULL kind/offset) —
    the flat projection upholds the same every-doc-survives guarantee
    as :func:`explode_spans`; a plain explode silently drops such docs
    from lineage accounting."""
    out = extract_documents(docs, pages, config)
    return out.select("doc_id", F.posexplode_outer("spans").alias("_p", "s")).select(
        "doc_id",
        F.col("s.offset").cast("long").alias("offset"),
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
    )
