"""Deterministic corpus-curation sampling (datapipe/sampling.py):
exactness, budget semantics, host caps, determinism across
parallelism.  The md5 hash order also has DuckDB oracles in
__spark_entry__ (doc_sample_stratified / doc_sample_budget /
pages_host_cap)."""

import pytest
from pyspark.sql import functions as F

from graphgen_spark.datapipe.sampling import (
    per_host_cap,
    stratified_take,
    token_budget_take,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (i, "en" if i % 3 else "zh", " ".join(["w"] * (5 + i % 7)))
            for i in range(60)
        ],
        ["doc_id", "lang", "text"],
    )


class TestSampling:
    def test_stratified_exact_counts(self, spark, docs):
        out = stratified_take(docs, k=10)
        counts = dict(
            out.groupBy("lang").count().collect()
        )
        # zh has 20 docs, en has 40 — both capped at exactly 10
        assert counts == {"en": 10, "zh": 10}
        # under-full strata return everything
        tiny = stratified_take(docs.where(F.col("doc_id") < 4), k=10)
        assert tiny.count() == 4

    def test_budget_semantics(self, spark, docs):
        budget = 50
        out = token_budget_take(docs, budget_tokens=budget).collect()
        by_lang: dict = {}
        for r in out:
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rows in by_lang.items():
            rows.sort(key=lambda r: r["cum_tokens"])
            # every kept doc STARTED under budget...
            n_last = rows[-1]["cum_tokens"] - (
                rows[-2]["cum_tokens"] if len(rows) > 1 else 0
            )
            assert rows[-1]["cum_tokens"] - n_last < budget
            # ...and the take reaches the budget (lower-bound spec)
            assert rows[-1]["cum_tokens"] >= budget

    def test_host_cap(self, spark):
        pages = spark.createDataFrame(
            [(f"https://www.host{i % 3}.example.com/a/{i}",)
             for i in range(30)],
            ["url"],
        )
        out = per_host_cap(pages, k=4)
        counts = [r["count"] for r in out.groupBy("host").count().collect()]
        assert counts == [4, 4, 4]

    def test_determinism_across_parallelism(self, spark, docs):
        a = {
            r["doc_id"]
            for r in stratified_take(docs.repartition(1), k=7).collect()
        }
        b = {
            r["doc_id"]
            for r in stratified_take(docs.repartition(16), k=7).collect()
        }
        assert a == b
