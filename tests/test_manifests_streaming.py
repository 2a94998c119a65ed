"""Tests: manifest/resume protocol + structured-streaming operators +
SQL-operator parity (text/dedup/similarity/relational vs DuckDB)."""

import json
import os

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


class TestManifestsResume:
    @pytest.fixture(scope="class")
    def extracted(self, spark):
        from tesseract_glue_spark import ExtractionConfig, extract_documents
        from tesseract_glue_spark.fixtures import interleaved_documents, pages_for

        docs = interleaved_documents(spark, SF_DIR)
        return extract_documents(docs, pages_for(docs), ExtractionConfig()).cache()

    def test_write_and_manifests(self, extracted, tmp_path):
        from tesseract_glue_spark.sources import manifests as M

        out = str(tmp_path / "out")
        m = M.write_extracted(extracted, out, n_buckets=8)
        assert sum(v["n_docs"] for v in m.values()) == extracted.count()
        assert set(m) == M.done_buckets(out)
        # manifests carry engine lineage (tesseract_version analogue)
        any_m = next(iter(m.values()))
        assert "engine_version" in any_m["engine"]

    def test_resume_skips_done_buckets(self, spark, extracted, tmp_path):
        from tesseract_glue_spark.fixtures import interleaved_documents
        from tesseract_glue_spark.sources import manifests as M

        out = str(tmp_path / "out2")
        M.write_extracted(extracted, out, n_buckets=8)
        docs = interleaved_documents(spark, SF_DIR)
        # everything done → nothing to process
        assert M.resume_filter(docs, out, n_buckets=8).count() == 0
        # invalidate one bucket → exactly that bucket's docs come back
        victim = sorted(M.done_buckets(out))[0]
        path = os.path.join(out, M.MANIFEST_DIR, f"bucket-{victim:05d}.json")
        with open(path, "w") as fh:
            fh.write("{corrupt")
        todo = M.resume_filter(docs, out, n_buckets=8)
        bucketed = M.with_bucket(docs, 8)
        expected = bucketed.where(F.col("bucket") == victim).count()
        assert todo.count() == expected > 0

    def test_doc_level_resume_processes_only_missing_docs(
        self, spark, extracted, tmp_path
    ):
        """Crash mid-run (data written, manifests not yet): doc-granular
        resume must re-process ONLY the missing docs, append them without
        clobbering the surviving rows, and end with manifests that
        describe the complete corpus."""
        from tesseract_glue_spark.sources import manifests as M

        out = str(tmp_path / "out_doc")
        half = extracted.where(F.col("doc_id") % 2 == 0)
        M.write_extracted(half, out, n_buckets=4)
        # simulate crash-before-manifests: data is durable, manifests gone
        for fn in os.listdir(os.path.join(out, M.MANIFEST_DIR)):
            os.unlink(os.path.join(out, M.MANIFEST_DIR, fn))

        todo = M.resume_filter(extracted, out, n_buckets=4, granularity="doc")
        missing = extracted.where(F.col("doc_id") % 2 == 1)
        assert todo.count() == missing.count() > 0
        assert {r["doc_id"] for r in todo.select("doc_id").collect()} == {
            r["doc_id"] for r in missing.select("doc_id").collect()
        }

        m = M.write_extracted(todo, out, n_buckets=4, mode="append")
        data = spark.read.parquet(os.path.join(out, M.DATA_DIR))
        assert data.count() == extracted.count()  # complete, no duplicates
        assert data.select("doc_id").distinct().count() == extracted.count()
        # read-back manifests describe the FULL buckets, not just this run
        assert sum(v["n_docs"] for v in m.values()) == extracted.count()
        # bucket-level resume now sees everything done
        assert M.resume_filter(extracted, out, n_buckets=4).count() == 0
        # ... and doc-level too
        assert (
            M.resume_filter(extracted, out, n_buckets=4, granularity="doc").count() == 0
        )

    def test_manifest_atomic_write(self, tmp_path):
        from tesseract_glue_spark.sources.manifests import _atomic_write_json

        p = str(tmp_path / "m" / "x.json")
        _atomic_write_json(p, {"a": 1})
        assert json.load(open(p)) == {"a": 1}
        assert not [f for f in os.listdir(tmp_path / "m") if f.endswith(".tmp")]


    def test_resume_write_preserves_other_buckets(self, spark, extracted, tmp_path):
        """REGRESSION: a resume run writing one bucket must not wipe the
        other buckets' data (dynamic partition overwrite, not static)."""
        from tesseract_glue_spark.sources import manifests as M

        out = str(tmp_path / "out3")
        M.write_extracted(extracted, out, n_buckets=8)
        full = spark.read.parquet(os.path.join(out, M.DATA_DIR))
        n_total = full.count()
        buckets_before = {r["bucket"] for r in full.select("bucket").distinct().collect()}
        # simulate a resume that re-processes only bucket 3
        subset = M.with_bucket(extracted, 8).where(F.col("bucket") == 3).drop("bucket")
        M.write_extracted(subset, out, n_buckets=8, resume=True)
        after = spark.read.parquet(os.path.join(out, M.DATA_DIR))
        assert {r["bucket"] for r in after.select("bucket").distinct().collect()} == buckets_before
        assert after.count() == n_total

    def test_fresh_overwrite_clears_stale_buckets(self, spark, extracted, tmp_path):
        """A NON-resume overwrite into a dir holding buckets from a
        previous larger run must not re-manifest the stale buckets as
        valid (dynamic overwrite never deletes partitions absent from
        the write — round-2 advisor finding): reported stats must
        describe exactly this write."""
        from tesseract_glue_spark.sources import manifests as M

        out = str(tmp_path / "out_stale")
        M.write_extracted(extracted, out, n_buckets=8)  # previous big run
        subset = M.with_bucket(extracted, 8).where(F.col("bucket") == 3).drop("bucket")
        n_subset = subset.count()
        m = M.write_extracted(subset, out, n_buckets=8)  # fresh run, dirty dir
        assert sum(v["n_docs"] for v in m.values()) == n_subset
        data = spark.read.parquet(os.path.join(out, M.DATA_DIR))
        assert data.count() == n_subset
        assert M.done_buckets(out) == set(m)

    def test_doc_resume_survives_crash_before_first_commit(self, spark, tmp_path):
        """Crash before ANY parquet commit leaves data/ holding only
        _temporary/ — doc-granular resume must still start (it used to
        die inferring a schema from zero files; round-2 advisor
        finding) and process the full corpus."""
        from tesseract_glue_spark.fixtures import interleaved_documents
        from tesseract_glue_spark.sources import manifests as M

        out = str(tmp_path / "out_crash")
        os.makedirs(os.path.join(out, M.DATA_DIR, "_temporary", "0"))
        docs = interleaved_documents(spark, SF_DIR)
        todo = M.resume_filter(docs, out, n_buckets=8, granularity="doc")
        assert todo.count() == docs.count()


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    # the file stream source requires a DIRECTORY of files
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


class TestStreaming:
    def test_hourly_stream_matches_batch(self, spark, events_dir):
        from tesseract_glue_spark.streaming import events as S

        src = f"{SF_DIR}/events.parquet"
        stream_df = S.hourly_agg(S.read_events_stream(spark, events_dir))
        S.run_stream_to_memory(stream_df, "hourly_test")
        got = spark.sql("select * from hourly_test").orderBy(
            "hour_bucket", "event_type"
        )
        want = S.batch_hourly_agg(spark.read.parquet(src)).orderBy(
            "hour_bucket", "event_type"
        )
        assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    def test_stream_dedup_drops_replayed_events(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark: a replayed (duplicated) input
        file must not duplicate output rows — the streaming twin of
        dedup_exact for at-least-once sources."""
        import shutil

        from tesseract_glue_spark.streaming import events as S

        src = tmp_path / "dup_stream"
        src.mkdir()
        shutil.copy(f"{SF_DIR}/events.parquet", src / "a.parquet")
        shutil.copy(f"{SF_DIR}/events.parquet", src / "b.parquet")  # full replay
        deduped = S.dedup_events_stream(S.read_events_stream(spark, str(src)))
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream_test")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(420)
        got = spark.sql("select event_id from dedup_stream_test")
        n_unique = (
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select("event_id").distinct().count()
        )
        assert got.count() == n_unique
        assert got.distinct().count() == n_unique

    def test_session_stream_runs(self, spark, events_dir):
        from tesseract_glue_spark.streaming import events as S

        stream_df = S.session_agg(S.read_events_stream(spark, events_dir))
        S.run_stream_to_memory(stream_df, "session_test")
        rows = spark.sql("select * from session_test").collect()
        assert len(rows) > 0
        assert all(r["n_events"] >= 1 for r in rows)


class TestSqlOperatorParity:
    """Every dual-dialect SQL operator family vs DuckDB at sf0.001
    (sf0.01 runs in the driver gate; this is the fast in-repo check)."""

    @pytest.fixture(scope="class")
    def duck(self):
        con = duckdb.connect()
        for t in ["documents", "embeddings", "lineitem", "orders", "customer",
                  "events", "nation", "region", "part", "supplier"]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        return con

    def _check(self, spark, duck, builder, tables):
        from tesseract_glue_spark.operators.registry import oracle, spark_runner

        got = spark_runner(builder, tables=tables)(spark, SF_DIR).toPandas()
        want = duck.sql(oracle(builder)).df()
        got = got.reindex(sorted(got.columns), axis=1).sort_values(
            by=sorted(got.columns)).reset_index(drop=True)
        want = want.reindex(sorted(want.columns), axis=1).sort_values(
            by=sorted(want.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        return len(got)

    def test_text_ops(self, spark, duck):
        from tesseract_glue_spark.operators.text import TEXT_OPS

        for name, b in TEXT_OPS.items():
            assert self._check(spark, duck, b, ("documents",)) > 0, name

    def test_dedup_ops(self, spark, duck):
        from tesseract_glue_spark.operators.dedup import DEDUP_OPS

        for name, b in DEDUP_OPS.items():
            self._check(spark, duck, b, ("documents",))

    def test_similarity_ops(self, spark, duck):
        from tesseract_glue_spark.operators.similarity import SIMILARITY_OPS

        for name, b in SIMILARITY_OPS.items():
            self._check(spark, duck, b, ("embeddings",))

    def test_relational_ops(self, spark, duck):
        from tesseract_glue_spark.operators.relational import RELATIONAL_OPS

        for name, (b, tabs) in RELATIONAL_OPS.items():
            assert self._check(spark, duck, b, tabs) > 0, name

    def test_asof_join_semantics_handmade(self, spark):
        """Hand-computed as-of join: strictly-prior (<, not <=) view
        matching per user, NULL when no prior view exists — the window
        formulation must agree with the written contract, not just with
        DuckDB's ASOF (which independently checks it in the gate)."""
        import pandas as pd

        from tesseract_glue_spark.functions import dialect as D
        from tesseract_glue_spark.operators.relational import events_asof_join_sql

        base = pd.Timestamp("2024-01-01 00:00:00")
        rows = [
            # user 1: view@10, click@20 (→10), view@20, click@20?  use
            # distinct ts: click@25 (→20), click@5 (→ NULL, before any view)
            (1, base + pd.Timedelta(seconds=10), 1, "view"),
            (2, base + pd.Timedelta(seconds=20), 1, "click"),
            (3, base + pd.Timedelta(seconds=20), 1, "view"),
            (4, base + pd.Timedelta(seconds=25), 1, "click"),
            (5, base + pd.Timedelta(seconds=5), 1, "click"),
            # user 2: never viewed
            (6, base + pd.Timedelta(seconds=30), 2, "click"),
            # same-instant view must NOT match (strict <)
            (7, base + pd.Timedelta(seconds=40), 3, "view"),
            (8, base + pd.Timedelta(seconds=40), 3, "click"),
        ]
        df = spark.createDataFrame(
            [(e, t.to_pydatetime(), u, k, 0.0, "{}") for e, t, u, k in rows],
            "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
        )
        df.createOrReplaceTempView("asof_events")
        got = {
            r["event_id"]: r["asof_view_us"]
            for r in spark.sql(
                events_asof_join_sql(D.SPARK, "asof_events")
            ).collect()
        }
        us = lambda secs: int((base + pd.Timedelta(seconds=secs)).timestamp() * 1e6)
        assert got == {
            2: us(10),   # most recent strictly-prior view
            4: us(20),   # picks the LATER of the two views
            5: None,     # click before any view
            6: None,     # user never viewed
            8: None,     # same-instant view excluded (strict <)
        }

    def test_pack_sequences_groups_parameter(self, spark, duck):
        """`groups` (production: ≈ shuffle parallelism) must flow
        through both dialects identically and widen the packing
        parallelism beyond the oracle default of PACK_GROUPS=16; the
        spillover contract (bin total < budget + its last doc's tokens)
        must hold per bin."""
        from tesseract_glue_spark.functions import dialect as D
        from tesseract_glue_spark.operators.registry import _register
        from tesseract_glue_spark.operators.text import (
            PACK_GROUPS,
            PACK_TOKEN_BUDGET,
            pack_sequences_sql,
        )

        _register(spark, SF_DIR, ("documents",))
        got = spark.sql(pack_sequences_sql(D.SPARK, groups=64)).toPandas()
        want = duck.sql(pack_sequences_sql(D.DUCKDB, groups=64)).df()

        def norm(p):
            p = p.reindex(sorted(p.columns), axis=1)
            return p.sort_values(by=list(p.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False)
        assert got["pack_group"].nunique() > PACK_GROUPS
        # spillover contract per (pack_group, bin_no) — "last" is the
        # doc that straddles the boundary (packing order = doc_id)
        got = got.sort_values(["pack_group", "doc_id"])
        agg = got.groupby(["pack_group", "bin_no"]).agg(
            total=("n_tokens", "sum"),
            last=("n_tokens", lambda s: s.iloc[-1]),
        )
        assert (agg["total"] < PACK_TOKEN_BUDGET + agg["last"]).all()

    def test_brute_force_scale_gate(self, spark, tmp_path):
        """Above BRUTE_CAP rows the two O(n²) recall baselines must
        switch to a deterministic stride sample — bounded work at any
        SF — while staying engine-equal; below the cap they are
        untouched (checked implicitly by every oracle run)."""
        import numpy as np

        from tesseract_glue_spark.functions import dialect as D
        from tesseract_glue_spark.operators.registry import spark_runner
        from tesseract_glue_spark.operators.similarity import (
            BRUTE_CAP,
            QUERY_MOD,
            ann_topk_bruteforce_sql,
        )

        n = BRUTE_CAP + 904  # stride = 2 → even vec_ids only
        rng = np.random.default_rng(7)
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.array(
                    [rng.normal(size=64).astype("float32").tolist() for _ in range(n)],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array((np.arange(n) % 10), type=pa.int32()),
            }
        )
        big_dir = str(tmp_path / "big")
        os.makedirs(big_dir)
        pq.write_table(tbl, f"{big_dir}/embeddings.parquet")

        got = spark_runner(ann_topk_bruteforce_sql, tables=("embeddings",))(
            spark, big_dir).toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{big_dir}/embeddings.parquet')"
        )
        want = con.sql(ann_topk_bruteforce_sql(D.DUCKDB)).df()

        def norm(p):
            p = p.reindex(sorted(p.columns), axis=1)
            return p.sort_values(by=list(p.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(norm(got), norm(want), check_dtype=False)
        # the gate actually engaged: only even vec_ids (stride 2) appear
        assert (got["neighbor_id"] % 2 == 0).all()
        expected_queries = len([i for i in range(0, n, QUERY_MOD) if i % 2 == 0])
        assert got["query_id"].nunique() == expected_queries

    def test_neardup_lsh_subset_and_recall(self, spark):
        """The LSH near-dup pair source must emit ONLY true pairs (exact
        verification ⇒ subset of brute force) at usable recall — it is
        the production source for the dedup keep-list."""
        from tesseract_glue_spark.operators.registry import spark_runner
        from tesseract_glue_spark.operators.similarity import (
            cosine_neardup_lsh_sql,
            cosine_neardup_pairs_sql,
        )

        brute = spark_runner(cosine_neardup_pairs_sql, tables=("embeddings",))(
            spark, SF_DIR).toPandas()
        lsh = spark_runner(cosine_neardup_lsh_sql, tables=("embeddings",))(
            spark, SF_DIR).toPandas()
        b = {(r.vec_a, r.vec_b) for r in brute.itertuples()}
        l = {(r.vec_a, r.vec_b) for r in lsh.itertuples()}
        assert l <= b, "LSH emitted a pair below the cosine threshold"
        recall = len(l) / len(b)
        assert recall > 0.4, f"near-dup LSH recall collapsed: {recall}"

    def test_multi_table_lsh_recall_beats_single(self, spark):
        """The multi-table ANN variant must recover a large multiple of
        the single-table recall (union-of-L-tables candidate generation;
        measured ~12× on the test corpus)."""
        from tesseract_glue_spark.operators.registry import spark_runner
        from tesseract_glue_spark.operators.similarity import (
            ann_topk_bruteforce_sql,
            ann_topk_lsh_multi_sql,
            ann_topk_lsh_sql,
        )

        def pairs(builder):
            pdf = spark_runner(builder, tables=("embeddings",))(spark, SF_DIR).toPandas()
            return {(r.query_id, r.neighbor_id) for r in pdf.itertuples()}

        b = pairs(ann_topk_bruteforce_sql)
        single = len(b & pairs(ann_topk_lsh_sql)) / len(b)
        multi = len(b & pairs(ann_topk_lsh_multi_sql)) / len(b)
        assert multi > 0.4, f"multi-table recall collapsed: {multi}"
        assert multi > 3 * single, (multi, single)

    def test_lsh_recall_vs_bruteforce(self, spark):
        """ANN-LSH is approximate: measure its top-k recall against the
        exact baseline (sanity bound only — random embeddings give LSH
        little structure to exploit)."""
        from tesseract_glue_spark.operators.registry import spark_runner
        from tesseract_glue_spark.operators.similarity import (
            ann_topk_bruteforce_sql,
            ann_topk_lsh_sql,
        )

        brute = spark_runner(ann_topk_bruteforce_sql, tables=("embeddings",))(
            spark, SF_DIR).toPandas()
        lsh = spark_runner(ann_topk_lsh_sql, tables=("embeddings",))(
            spark, SF_DIR).toPandas()
        b = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
        l = {(r.query_id, r.neighbor_id) for r in lsh.itertuples()}
        recall = len(b & l) / len(b)
        assert recall > 0.02, f"LSH recall collapsed: {recall}"


class TestStreamingExtraction:
    def test_streaming_extraction_matches_batch(self, spark, tmp_path):
        """The flagship pipeline as a stream (foreachBatch): multi-file
        source drained with availableNow must produce exactly the batch
        pipeline's output, and a restarted stream (same checkpoint) must
        process nothing new."""
        import glob as globmod

        from tesseract_glue_spark import ExtractionConfig, extract_documents
        from tesseract_glue_spark.fixtures import interleaved_documents, pages_for
        from tesseract_glue_spark.streaming.extract_stream import (
            extract_stream,
            read_documents_stream,
        )

        docs = interleaved_documents(spark, SF_DIR)
        pages = pages_for(docs).cache()
        src = str(tmp_path / "docs_in")
        docs.repartition(4).write.parquet(src)  # 4 files → ≥2 micro-batches
        out = str(tmp_path / "stream_out")

        q = extract_stream(
            read_documents_stream(spark, src), pages, out, ExtractionConfig(), n_buckets=4
        )
        q.awaitTermination(420)

        from functools import reduce

        from pyspark.sql import DataFrame as _DF

        got = reduce(
            _DF.unionByName,
            [spark.read.parquet(p) for p in sorted(globmod.glob(f"{out}/batch=*/data"))],
        )
        want = extract_documents(docs, pages, ExtractionConfig())
        assert got.count() == want.count() == docs.count()
        g = {r["doc_id"]: (r["ocr_pages"], r["status"]) for r in got.collect()}
        w = {r["doc_id"]: (r["ocr_pages"], r["status"]) for r in want.collect()}
        assert g == w
        n_batches = len(globmod.glob(f"{out}/batch=*"))
        assert n_batches >= 2  # multi-micro-batch, not one big gulp

        # restart with same checkpoint → nothing reprocessed
        q2 = extract_stream(
            read_documents_stream(spark, src), pages, out, ExtractionConfig(), n_buckets=4
        )
        q2.awaitTermination(300)
        assert len(globmod.glob(f"{out}/batch=*")) == n_batches


class TestStatefulStreaming:
    def test_user_activity_state_accumulates(self, spark, events_dir, tmp_path):
        """applyInPandasWithState: cumulative per-user state across
        micro-batches; the FINAL snapshot per user must equal the batch
        aggregation over all events."""
        from tesseract_glue_spark.streaming.events import read_events_stream
        from tesseract_glue_spark.streaming.stateful import user_activity_state

        stream = user_activity_state(read_events_stream(spark, events_dir))
        q = (
            stream.writeStream.format("memory")
            .queryName("user_state_test")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(420)
        # last snapshot per user (updates accumulate across batches)
        snap = spark.sql(
            """
            SELECT user_id, n_events, sum_value_cents FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
              FROM user_state_test
            ) WHERE rn = 1
            """
        )
        got = {r["user_id"]: (r["n_events"], r["sum_value_cents"]) for r in snap.collect()}
        batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
        want_rows = batch.groupBy("user_id").agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        ).collect()
        want = {r["user_id"]: (r["n"], r["s"]) for r in want_rows}
        assert got == want


class TestDedupComponents:
    def test_components_fixpoint_and_pair_consistency(self, spark):
        """The fixpoint loop must converge within CC_ROUNDS on the gate
        corpus (otherwise the unrolled-CC_ROUNDS oracle would diverge
        from the Spark side), and every verified near-dup pair must land
        in one component."""
        from tesseract_glue_spark.functions import dialect as D
        from tesseract_glue_spark.operators.dedup import (
            CC_ROUNDS,
            _cc_init_sql,
            dedup_components,
            minhash_lsh_pairs_sql,
            propagate_min_labels,
        )
        from tesseract_glue_spark.operators.registry import (
            SHINGLES_VIEW,
            get_cached_shingles,
            spark_runner,
        )

        a = dedup_components(spark, SF_DIR).toPandas()
        # convergence round must sit within the oracle's unrolled depth
        get_cached_shingles(spark, SF_DIR)
        edges = spark.sql(
            minhash_lsh_pairs_sql(D.SPARK, "documents", shingles_table=SHINGLES_VIEW)
        ).localCheckpoint(eager=True)
        _, rounds_run = propagate_min_labels(
            spark, edges, spark.sql(_cc_init_sql("documents"))
        )
        assert rounds_run <= CC_ROUNDS + 1, (
            f"gate corpus needs {rounds_run - 1} propagation rounds; the "
            f"unrolled oracle only runs {CC_ROUNDS}"
        )
        comp = dict(zip(a["doc_id"], a["component"]))
        pairs = spark_runner(minhash_lsh_pairs_sql, tables=("documents",))(
            spark, SF_DIR).toPandas()
        assert len(pairs) > 0
        for r in pairs.itertuples():
            assert comp[r.doc_a] == comp[r.doc_b], (r.doc_a, r.doc_b)
        # components are rooted at their minimum member
        assert (a["component"] <= a["doc_id"]).all()

    def test_components_deep_chain_reaches_fixpoint(self, spark):
        """Adversarial chain a-b-c-...-j (diameter 9 ≫ CC_ROUNDS): the
        fixpoint loop must merge it into ONE component — the fixed
        4-round version this replaced under-merged it into three."""
        from tesseract_glue_spark.operators.dedup import (
            CC_ROUNDS,
            propagate_min_labels,
        )

        n = 10
        ids = [f"doc{i:02d}" for i in range(n)]
        edges = spark.createDataFrame(
            [(ids[i], ids[i + 1]) for i in range(n - 1)], "doc_a string, doc_b string"
        )
        vertices = spark.createDataFrame([(i, i) for i in ids], "v string, lbl string")
        labels, rounds_run = propagate_min_labels(spark, edges, vertices)
        out = labels.toPandas()
        assert set(out["component"]) == {ids[0]}, "chain split into multiple components"
        assert rounds_run > CC_ROUNDS, (
            "test graph no longer exercises the beyond-CC_ROUNDS regime"
        )

    def test_components_fixed_rounds_would_under_merge(self, spark):
        """Documents the failure mode the fixpoint loop fixes: capping
        propagation at CC_ROUNDS on the same chain leaves >1 label."""
        from tesseract_glue_spark.operators.dedup import CC_ROUNDS, propagate_min_labels

        n = 10
        ids = [f"doc{i:02d}" for i in range(n)]
        edges = spark.createDataFrame(
            [(ids[i], ids[i + 1]) for i in range(n - 1)], "doc_a string, doc_b string"
        )
        vertices = spark.createDataFrame([(i, i) for i in ids], "v string, lbl string")
        labels, _ = propagate_min_labels(spark, edges, vertices, max_rounds=CC_ROUNDS)
        assert labels.select("component").distinct().count() > 1


class TestStatefulTimeout:
    """Hermetic handler-contract tests for the stateful operator (the
    timeout path can't be driven deterministically through a real
    processing-time stream)."""

    class _FakeState:
        def __init__(self, has_timed_out=False, value=None):
            self.hasTimedOut = has_timed_out
            self._value = value
            self.removed = False
            self.updated = None
            self.timeout_ms = None

        @property
        def exists(self):
            return self._value is not None

        @property
        def get(self):
            return self._value

        def remove(self):
            self.removed = True

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    def test_timeout_removes_state_and_emits_nothing(self):
        """REGRESSION (round-1 advice): a ProcessingTimeTimeout invocation
        must remove the state — not overwrite last_ts with None, re-arm
        the timeout, and emit a spurious zero row (unbounded state)."""
        from tesseract_glue_spark.streaming.stateful import _update_user_state

        st = self._FakeState(has_timed_out=True, value=(5, 1000, None))
        out = list(_update_user_state((42,), iter([]), st))
        assert out == []
        assert st.removed
        assert st.updated is None and st.timeout_ms is None

    def test_last_ts_never_regresses(self):
        import pandas as pd

        from tesseract_glue_spark.streaming.stateful import _update_user_state

        newer = pd.Timestamp("2024-06-01 12:00:00")
        older = pd.Timestamp("2024-01-01 00:00:00")
        st = self._FakeState(value=(2, 500, newer))
        batch = pd.DataFrame({"value": [1.0], "ts": [older]})
        rows = list(_update_user_state((7,), iter([batch]), st))
        assert len(rows) == 1
        n, total, last_ts = st.updated
        assert (n, total) == (3, 600)
        assert last_ts == newer  # late-arriving old event must not regress it


class TestIvfAnn:
    def test_ivf_recall_and_determinism(self, spark):
        """IVF ANN: deterministic across runs; recall vs exact baseline
        bounded below (random embeddings, nprobe=2/16 clusters)."""
        from tesseract_glue_spark.operators.registry import spark_runner
        from tesseract_glue_spark.operators.similarity import (
            ann_topk_bruteforce_sql,
            ann_topk_ivf,
        )

        a = ann_topk_ivf(spark, SF_DIR).toPandas()
        b = ann_topk_ivf(spark, SF_DIR).toPandas()
        assert a.equals(b)
        brute = spark_runner(ann_topk_bruteforce_sql, tables=("embeddings",))(
            spark, SF_DIR).toPandas()
        bset = {(r.query_id, r.neighbor_id) for r in brute.itertuples()}
        vset = {(r.query_id, r.neighbor_id) for r in a.itertuples()}
        assert len(bset & vset) / len(bset) > 0.1
