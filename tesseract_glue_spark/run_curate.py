"""Job entry point: the spark-submit runnable corpus-curation job —
the standard pretraining-data pass composed from the verified
operators:

    spark-submit --py-files tesseract_glue_spark_pyfiles.zip \
        path/to/tesseract_glue_spark/run_curate.py \
        --input <docs parquet|iceberg:tbl> --output <dir> \
        [--benchmark <parquet|iceberg:tbl>] [--no-filter] [--no-dedup]

(or ``python -m tesseract_glue_spark.run_curate ...`` — spark-submit
has no ``-m`` flag)

Stages, in the order real pipelines run them:

1. **Quality filter** (``text_filter_chain``): C4/Gopher ordered rules,
   first-failing reason recorded per doc. Map-only.
2. **Near-dup removal** (``dedup_minhash_survivors``) over the docs the
   filter KEPT — a filter-dropped doc can neither survive as a cluster
   representative nor knock out a kept near-duplicate.
3. **Benchmark decontamination** (``decontaminate_against_sql``) of the
   kept set against an actual eval table — only when ``--benchmark`` is
   given; there is no hash-split stand-in in the production job.

Output layout (the decision table IS the artifact — curation decisions
are data that audits and ablations need):

- ``out/decisions/``  one row PER INPUT DOC:
  (doc_id, n_tokens, filter_reason, is_dup, is_contaminated, verdict)
- ``out/curated/``    the verdict = 'keep' projection (doc_id, text)
- stdout              one JSON stats line (per-reason drop counts,
  dup/contamination counts, wall, throughput)

Scale shape: ONE heavy annotation pass (filter features map-side; the
dedup survivor check and decontamination probe are the operators'
own bucketed/broadcast plans; the assembly joins are all keyed on
doc_id so AQE reuses one exchange) writes ``decisions/``; ``curated/``
and the stats are then derived from the WRITTEN table — scan-cheap
re-reads, never a re-execution of the dedup/decon lineage per counter.
At 10^12 docs the decision table is a narrow fraction of the corpus
width and the only wide write is the curated text itself.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_curate")
    ap.add_argument("--input", required=True, help="documents table (path or iceberg:tbl)")
    ap.add_argument("--output", required=True, help="output dir (decisions/ + curated/)")
    ap.add_argument(
        "--benchmark",
        default=None,
        help="eval-set table (path or iceberg:tbl); enables decontamination",
    )
    ap.add_argument("--no-filter", action="store_true", help="skip the quality filter")
    ap.add_argument("--no-dedup", action="store_true", help="skip near-dup removal")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("tesseract-glue-spark-curate")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from tesseract_glue_spark.functions import dialect as D
    from tesseract_glue_spark.operators.dedup import (
        decontaminate_against_sql,
        minhash_dedup_survivors_sql,
    )
    from tesseract_glue_spark.operators.text import filter_chain_sql
    from tesseract_glue_spark.sources.tables import read_documents

    t0 = time.perf_counter()
    docs = read_documents(spark, args.input)
    docs.createOrReplaceTempView("documents")

    if args.no_filter:
        spark.sql(
            "SELECT doc_id, CAST(NULL AS BIGINT) AS n_tokens, 'ok' AS reason "
            "FROM documents"
        ).createOrReplaceTempView("flt")
    else:
        spark.sql(filter_chain_sql(D.SPARK)).createOrReplaceTempView("flt")

    # the kept set feeds dedup + decontamination (stage order matters:
    # see module docstring)
    spark.sql(
        "SELECT d.* FROM documents d JOIN flt f USING (doc_id) WHERE f.reason = 'ok'"
    ).createOrReplaceTempView("kept")

    if args.no_dedup:
        spark.sql("SELECT doc_id FROM kept").createOrReplaceTempView("surv")
    else:
        spark.sql(
            minhash_dedup_survivors_sql(D.SPARK, table="kept")
        ).createOrReplaceTempView("surv")

    if args.benchmark:
        read_documents(spark, args.benchmark).createOrReplaceTempView("benchmark")
        spark.sql(
            decontaminate_against_sql(D.SPARK, table="kept", bench_table="benchmark")
        ).createOrReplaceTempView("decon")
    else:
        spark.sql(
            "SELECT doc_id, CAST(0 AS BIGINT) AS contaminated FROM kept"
        ).createOrReplaceTempView("decon")

    decisions = spark.sql(
        """
        SELECT d.doc_id,
               f.n_tokens,
               f.reason AS filter_reason,
               CAST(CASE WHEN f.reason = 'ok' AND s.doc_id IS NULL
                         THEN 1 ELSE 0 END AS BIGINT) AS is_dup,
               CAST(coalesce(dc.contaminated, 0) AS BIGINT) AS is_contaminated,
               CASE WHEN f.reason = 'ok' AND s.doc_id IS NOT NULL
                         AND coalesce(dc.contaminated, 0) = 0
                    THEN 'keep' ELSE 'drop' END AS verdict
        FROM documents d
        JOIN flt f USING (doc_id)
        LEFT JOIN surv s USING (doc_id)
        LEFT JOIN decon dc USING (doc_id)
        """
    )
    dec_path = f"{args.output}/decisions"
    cur_path = f"{args.output}/curated"
    decisions.write.mode("overwrite").parquet(dec_path)

    # derive curated output + stats from the WRITTEN decision table
    written = spark.read.parquet(dec_path)
    written.createOrReplaceTempView("dec")
    spark.sql(
        "SELECT d.doc_id, d.text FROM documents d "
        "JOIN dec ON d.doc_id = dec.doc_id WHERE dec.verdict = 'keep'"
    ).write.mode("overwrite").parquet(cur_path)

    stats = {
        r["k"]: r["n"]
        for r in spark.sql(
            """
            SELECT concat('filter_', filter_reason) AS k, COUNT(*) AS n
            FROM dec GROUP BY filter_reason
            UNION ALL SELECT 'dup_dropped', SUM(is_dup) FROM dec
            UNION ALL SELECT 'contaminated_dropped',
                 SUM(CASE WHEN is_contaminated = 1 AND is_dup = 0
                          AND filter_reason = 'ok' THEN 1 ELSE 0 END) FROM dec
            UNION ALL SELECT 'kept', COUNT(*) FROM dec WHERE verdict = 'keep'
            UNION ALL SELECT 'n_input', COUNT(*) FROM dec
            """
        ).collect()
    }
    wall = time.perf_counter() - t0
    n_in = stats.get("n_input", 0)
    print(
        json.dumps(
            {
                "status": "ok",
                "stats": {k: int(v) for k, v in stats.items() if v is not None},
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_in / wall, 1) if wall > 0 else None,
                "output": args.output,
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
