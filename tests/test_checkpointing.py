"""Resume-from-checkpoint correctness (BASELINE.md gate): a mid-run
kill (simulated by running on a prefix of the corpus first) must top up
to EXACTLY the same final tables, with zero duplicate trace ids."""

import shutil

import pytest
from pyspark.sql import functions as F

from graphgen_spark import synth
from graphgen_spark.operators.checkpointing import read_metrics
from graphgen_spark.pipelines.materialize import run_checkpointed

N_PAGES = 40
N_ENT = synth.n_entities_for(N_PAGES)


def _triple_set(out):
    return {
        tuple(r)
        for r in out["triples"].select("subj", "pred", "obj", "url").collect()
    }


@pytest.fixture()
def ckpt_dir(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestResume:
    def test_partial_then_full_equals_oneshot(self, spark, ckpt_dir, tmp_path):
        alias = synth.alias_dictionary_df(spark, N_ENT)
        pages_all = synth.pages_df(spark, N_PAGES, N_ENT)
        pages_half = pages_all.limit(N_PAGES // 2)

        # simulated kill: only half the corpus was processed
        run_checkpointed(spark, pages_half, ckpt_dir, alias_dict=alias,
                         chunk_size=256, chunk_overlap=32)
        # resume with the full corpus
        resumed = run_checkpointed(spark, pages_all, ckpt_dir,
                                   alias_dict=alias,
                                   chunk_size=256, chunk_overlap=32)

        # oneshot reference run in a fresh directory
        oneshot_dir = str(tmp_path / "oneshot")
        oneshot = run_checkpointed(spark, pages_all, oneshot_dir,
                                   alias_dict=alias,
                                   chunk_size=256, chunk_overlap=32)

        assert _triple_set(resumed) == _triple_set(oneshot)

        # zero duplicate trace ids in any stage table
        for stage, keys in [
            ("docs", ["url"]),
            ("chunks", ["chunk_id", "url"]),
        ]:
            df = resumed[stage]
            assert df.count() == df.select(*keys).distinct().count(), stage

    def test_rerun_is_noop(self, spark, ckpt_dir):
        alias = synth.alias_dictionary_df(spark, N_ENT)
        pages = synth.pages_df(spark, N_PAGES, N_ENT)
        first = run_checkpointed(spark, pages, ckpt_dir, alias_dict=alias,
                                 chunk_size=256, chunk_overlap=32)
        # materialize results BEFORE the rerun: overwrite of the final
        # tables invalidates earlier lazy readers (parquet semantics;
        # Iceberg snapshots would version this on a real cluster)
        n1 = first["records"].count()
        t1 = _triple_set(first)
        again = run_checkpointed(spark, pages, ckpt_dir, alias_dict=alias,
                                 chunk_size=256, chunk_overlap=32)
        assert again["records"].count() == n1
        assert _triple_set(again) == t1

    def test_lineage_and_metrics_written(self, spark, ckpt_dir):
        alias = synth.alias_dictionary_df(spark, N_ENT)
        pages = synth.pages_df(spark, N_PAGES, N_ENT)
        out = run_checkpointed(spark, pages, ckpt_dir, alias_dict=alias,
                               chunk_size=256, chunk_overlap=32)
        lineage = spark.read.option("recursiveFileLookup", "true").parquet(
            f"{ckpt_dir}/lineage"
        )
        assert lineage.where(F.col("src_id").startswith("doc-")).count() > 0
        metrics = read_metrics(spark, ckpt_dir)
        assert metrics.count() > 0
        assert metrics.agg(F.sum("n_rows")).collect()[0][0] > 0
        # doc->chunk lineage covers every chunk
        n_chunks = out["chunks"].select("chunk_id").distinct().count()
        n_lineage_chunks = (
            lineage.where(F.col("src_id").startswith("doc-"))
            .select("dst_id").distinct().count()
        )
        assert n_lineage_chunks == n_chunks


class TestLineageIdempotence:
    def test_chunk_to_triple_lineage_no_dup_on_rerun(
        self, spark, tmp_path
    ):
        alias = synth.alias_dictionary_df(spark, N_ENT)
        pages = synth.pages_df(spark, N_PAGES, N_ENT)
        root = str(tmp_path / "ckpt_lineage")
        run_checkpointed(spark, pages, root, alias_dict=alias,
                         chunk_size=256, chunk_overlap=32)
        lin = spark.read.parquet(f"{root}/lineage")
        n1 = lin.where(F.col("op") == "chunk_to_triple").count()
        d1 = (lin.where(F.col("op") == "chunk_to_triple")
              .distinct().count())
        assert n1 == d1  # no dups within one run
        run_checkpointed(spark, pages, root, alias_dict=alias,
                         chunk_size=256, chunk_overlap=32)
        lin2 = spark.read.parquet(f"{root}/lineage")
        assert lin2.where(F.col("op") == "chunk_to_triple").count() == n1
