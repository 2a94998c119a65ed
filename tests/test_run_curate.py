"""The corpus-curation production job (run_curate): stage composition
semantics (filter → dedup over kept → decontaminate kept against a real
benchmark table), decision-table/curated-output consistency, and the
cross-engine contract of ``decontaminate_against_sql``."""

import json

import duckdb
import pandas as pd
import pytest

from tesseract_glue_spark.functions import dialect as D


class TestDecontaminateAgainst:
    def test_matches_duckdb_on_planted_overlap(self, spark):
        from tesseract_glue_spark.operators.dedup import decontaminate_against_sql

        corpus = pd.DataFrame(
            [
                (1, "alpha beta gamma delta unrelated trailing words"),
                (2, "completely different content with nothing shared"),
                (3, "exact benchmark passage lifted verbatim into training data"),
            ],
            columns=["doc_id", "text"],
        )
        bench = pd.DataFrame(
            [
                (900, "alpha beta gamma delta epsilon zeta"),
                (901, "exact benchmark passage lifted verbatim into training data"),
            ],
            columns=["doc_id", "text"],
        )
        spark.createDataFrame(corpus).createOrReplaceTempView("documents")
        spark.createDataFrame(bench).createOrReplaceTempView("benchmark")
        got = spark.sql(decontaminate_against_sql(D.SPARK)).toPandas()
        spark.catalog.dropTempView("documents")
        spark.catalog.dropTempView("benchmark")
        con = duckdb.connect()
        con.register("documents", corpus)
        con.register("benchmark", bench)
        want = con.sql(decontaminate_against_sql(D.DUCKDB)).df()
        g = got.sort_values("doc_id").reset_index(drop=True)
        w = want.sort_values("doc_id").reset_index(drop=True)[g.columns]
        pd.testing.assert_frame_equal(g, w, check_dtype=False)
        res = g.set_index("doc_id")
        assert res.loc[1, "contaminated"] == 1 and res.loc[1, "n_hit"] == 1
        assert res.loc[2, "contaminated"] == 0
        assert res.loc[3, "contaminated"] == 1
        assert res.loc[3, "hit_x10k"] == 10000  # verbatim copy: full coverage
        # EVERY corpus doc appears (no hash split drops rows here)
        assert set(res.index) == {1, 2, 3}


@pytest.fixture(scope="module")
def curate_run(spark, tmp_path_factory):
    """Run the job once on a corpus/benchmark split of the sf0.001
    documents table and return (stats, decisions, curated)."""
    from tests.conftest import SF_DIR
    from tesseract_glue_spark import run_curate

    tmp = tmp_path_factory.mktemp("curate")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.where("doc_id % 10 <> 0").write.parquet(str(tmp / "corpus"))
    docs.where("doc_id % 10 = 0").write.parquet(str(tmp / "benchmark"))

    out = tmp / "out"
    rc = run_curate.main(
        [
            "--input", str(tmp / "corpus"),
            "--output", str(out),
            "--benchmark", str(tmp / "benchmark"),
        ]
    )
    assert rc == 0
    decisions = spark.read.parquet(str(out / "decisions")).toPandas()
    curated = spark.read.parquet(str(out / "curated")).toPandas()
    n_input = spark.read.parquet(str(tmp / "corpus")).count()
    return n_input, decisions, curated


class TestRunCurate:
    def test_decision_row_per_input_doc(self, curate_run):
        n_input, decisions, _ = curate_run
        assert len(decisions) == n_input
        assert decisions["doc_id"].is_unique

    def test_verdict_consistency(self, curate_run):
        _, decisions, curated = curate_run
        keep = decisions[decisions.verdict == "keep"]
        assert (keep.filter_reason == "ok").all()
        assert (keep.is_dup == 0).all()
        assert (keep.is_contaminated == 0).all()
        assert set(curated.doc_id) == set(keep.doc_id)
        assert set(curated.columns) == {"doc_id", "text"}

    def test_stage_order_dedup_only_on_kept(self, curate_run):
        """Filter-dropped docs must never carry a dup flag — dedup ran
        over the kept set only."""
        _, decisions, _ = curate_run
        dropped = decisions[decisions.filter_reason != "ok"]
        assert (dropped.is_dup == 0).all()

    def test_every_stage_fires_on_gate_corpus(self, curate_run):
        _, decisions, _ = curate_run
        assert (decisions.filter_reason != "ok").any()
        assert (decisions.is_dup == 1).any()
        assert (decisions.verdict == "keep").any()

    def test_no_filter_no_dedup_flags(self, spark, tmp_path):
        from tests.conftest import SF_DIR
        from tesseract_glue_spark import run_curate

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        docs.write.parquet(str(tmp_path / "corpus"))
        rc = run_curate.main(
            [
                "--input", str(tmp_path / "corpus"),
                "--output", str(tmp_path / "out"),
                "--no-filter", "--no-dedup",
            ]
        )
        assert rc == 0
        dec = spark.read.parquet(str(tmp_path / "out" / "decisions")).toPandas()
        # with every stage disabled and no benchmark, everything keeps
        assert (dec.verdict == "keep").all()
        assert len(dec) == 50
