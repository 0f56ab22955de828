"""Physical-plan property gates: the PLANS.md claims, asserted.

These lock in the properties that make the suite scale — column
pruning through Python hops, predicate pushdown into parquet, single
Python boundary on the fused path, codegen-only relational ops —
so a refactor that silently breaks one fails CI, not a bench round.
"""

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def n_nodes(plan: str, op: str) -> int:
    """Count physical NODES of a given operator ("formatted" plans
    print each node twice: tree summary + '(N) Op' detail)."""
    return len(re.findall(rf"\(\d+\) {op}\b", plan))


@pytest.fixture(scope="module")
def sf_dir():
    from tests.conftest import SF_DIR

    return SF_DIR


class TestFusedPathPlan:
    def test_single_python_hop_and_pruned_scan(self, spark):
        from graphgen_spark import synth
        from graphgen_spark.pipelines import run_kg_pipeline

        # pin the synthetic input: its own mapInPandas generator is
        # test-fixture work, not the pipeline under assertion
        pages = synth.pages_df(spark, 64, 200).localCheckpoint(
            eager=True
        )
        out = run_kg_pipeline(spark, pages, fused=True,
                              chunk_size=512, chunk_overlap=64)
        plan = plan_of(out["triples"])
        # exactly ONE Python boundary on the steady path
        assert n_nodes(plan, "MapInPandas") == 1
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan

    def test_column_pruning_through_python_hop(self, spark, sf_dir):
        """The fused hop consumes only (url, html): the scan schema
        must not carry the wide text column."""
        from graphgen_spark.pipelines import run_kg_pipeline
        from graphgen_spark.synth import pages_from_doc_ids

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pages = pages_from_doc_ids(docs, n_entities=200)
        out = run_kg_pipeline(spark, pages, fused=True,
                              chunk_size=512, chunk_overlap=64)
        plan = plan_of(out["triples"])
        assert "ReadSchema" in plan
        sch = plan.split("ReadSchema:")[-1].splitlines()[0]
        # pages synthesis needs doc_id/text/lang from documents, but
        # the unused columns (source, n_chars) must be pruned
        assert "source" not in sch and "n_chars" not in sch


class TestRelationalPlans:
    def test_filter_pushdown_reaches_scan(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        q = docs.where(F.col("n_chars") >= 1000).select("doc_id")
        p = plan_of(q)
        assert "PushedFilters" in p
        pushed = p.split("PushedFilters:")[-1].splitlines()[0]
        assert "n_chars" in pushed

    def test_curation_single_scan_no_python(self, spark, sf_dir):
        from graphgen_spark.datapipe.curate import curate_corpus

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        curated, funnel = curate_corpus(docs, min_tokens=10,
                                        sample_k=5)
        for df in (curated, funnel):
            p = plan_of(df)
            assert "Scan parquet" in p
            assert "MapInPandas" not in p
            assert "ArrowEvalPython" not in p
        assert n_nodes(plan_of(curated), "Scan parquet") == 1

    def test_sampling_no_python(self, spark, sf_dir):
        from graphgen_spark.datapipe.sampling import (
            per_host_cap,
            stratified_take,
            token_budget_take,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for df in (
            stratified_take(docs, k=5),
            token_budget_take(docs, budget_tokens=100),
            per_host_cap(
                docs.select(
                    F.concat(F.lit("https://h/"), "doc_id").alias("url")
                ),
                k=2,
            ),
        ):
            p = plan_of(df)
            assert "MapInPandas" not in p
            assert "ArrowEvalPython" not in p

    def test_no_cartesian_in_dedup_pairs(self, spark, sf_dir):
        from graphgen_spark.datapipe.dedup import (
            minhash_verified_pairs,
            simhash_dup_pairs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        for df in (
            minhash_verified_pairs(docs, num_perm=16, bands=4),
            simhash_dup_pairs(docs),
        ):
            p = plan_of(df)
            assert "CartesianProduct" not in p
            assert "BroadcastNestedLoopJoin" not in p

    def test_df_cap_filter_is_equi_anti_join(self, spark, sf_dir):
        """The stop-shingle filter must stay an equi anti-join on the
        shingle key (AQE broadcasts the tiny hot set at runtime) —
        never a cartesian/BNLJ, and no Python hop."""
        from graphgen_spark.datapipe.dedup import ngram_jaccard_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        df = ngram_jaccard_pairs(docs, threshold=0.05, df_cap=4)
        p = plan_of(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        # r7: gram construction moved from the interpreted SQL
        # higher-order chain into the vectorized Python kernel
        # (_gram_sets_df, ~100x per doc) — the gram MapInPandas hop
        # (shared via the persisted postings table) is the ONLY Python
        # in the plan; no row-at-a-time UDF nodes, and the join/
        # anti-join machinery stays JVM-side
        assert "BatchEvalPython" not in p
        assert "ArrowEvalPython" not in p
        assert "LeftAnti" in p

    def test_bucket_cap_filter_is_equi_anti_join(self, spark, sf_dir):
        """The LSH hot-bucket filter (r5) must have the same shape as
        df_cap: an equi anti-join on (band, bucket), no cartesian, and
        the only Python in the plan is the MinHash signature UDF."""
        from graphgen_spark.datapipe.dedup import minhash_verified_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        df = minhash_verified_pairs(
            docs, num_perm=16, bands=4, bucket_cap=50
        )
        p = plan_of(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "LeftAnti" in p
