"""Tests for the evaluate operators (triple accuracy LLM-judge +
QA metrics), mirroring the reference evaluate service semantics
(operators/evaluate/evaluate_triple.py, accuracy_evaluator.py)."""

import pytest
from pyspark.sql import functions as F

from graphgen_spark import synth
from graphgen_spark.operators import chunk_documents, extract_records
from graphgen_spark.operators.evaluate import (
    evaluate_qa,
    evaluate_triples,
)

N_PAGES = 40
N_ENT = synth.n_entities_for(N_PAGES)


@pytest.fixture(scope="module")
def chunks_and_records(spark):
    pages = synth.pages_df(spark, N_PAGES, N_ENT)
    chunks = chunk_documents(pages, chunk_size=256, chunk_overlap=32)
    records = extract_records(chunks)
    return chunks.cache(), records.cache()


class TestEvaluateTriples:
    def test_one_row_per_extracting_chunk(self, chunks_and_records):
        chunks, records = chunks_and_records
        scored = evaluate_triples(chunks, records)
        n_chunks_with_units = (
            records.where(F.col("kind").isin("entity", "relationship"))
            .select("chunk_id")
            .distinct()
            .count()
        )
        assert scored.count() == n_chunks_with_units

    def test_score_shape_and_bounds(self, chunks_and_records):
        chunks, records = chunks_and_records
        scored = evaluate_triples(chunks, records)
        row = scored.first()
        for side in ("entity_accuracy", "relation_accuracy"):
            s = row[side]
            for field in (
                "accuracy", "completeness", "precision", "overall_score"
            ):
                assert 0.0 <= s[field] <= 1.0
        bad = scored.where(
            (F.col("entity_accuracy.accuracy") < 0)
            | (F.col("entity_accuracy.accuracy") > 1)
            | (F.col("relation_accuracy.accuracy") < 0)
            | (F.col("relation_accuracy.accuracy") > 1)
        ).count()
        assert bad == 0

    def test_entities_are_supported_by_chunk_text(self, chunks_and_records):
        """The mock extractor derives names from the chunk text, so the
        literal-mention judge should score entity accuracy high on
        average (not exactly 1.0: canonical uppercase forms vs chunk
        casing differences are already normalized lowercase, but
        chunk-boundary splits can orphan a mention)."""
        chunks, records = chunks_and_records
        scored = evaluate_triples(chunks, records)
        avg = scored.agg(
            F.avg("entity_accuracy.accuracy").alias("a")
        ).first()["a"]
        assert avg > 0.8

    def test_custom_responder(self, chunks_and_records):
        chunks, records = chunks_and_records

        def resp(content, ents, endpoints):
            return (
                '{"accuracy": 0.5, "completeness": 0.5, '
                '"precision": 0.5, "overall_score": 0.5}',
            ) * 2

        scored = evaluate_triples(chunks, records, responder=resp)
        got = scored.select("entity_accuracy.accuracy").distinct().collect()
        assert [r[0] for r in got] == [0.5]

    def test_malformed_response_yields_nulls_not_errors(
        self, chunks_and_records
    ):
        """from_json returns null structs for garbage — the Spark
        analogue of the reference's parse-failure default path."""
        chunks, records = chunks_and_records

        def resp(content, ents, endpoints):
            return ("not json at all", "also not json")

        scored = evaluate_triples(chunks, records, responder=resp)
        row = scored.first()
        assert row["entity_accuracy"]["accuracy"] is None
        assert row["entity_accuracy"]["overall_score"] is None


class TestEvaluateQA:
    def test_metric_columns(self, spark):
        qa = spark.createDataFrame(
            [
                ("q1", "short answer"),
                ("q2", "a much longer answer with many more tokens in it"),
            ],
            ["question", "answer"],
        )
        out = evaluate_qa(qa)
        rows = {r["question"]: r for r in out.collect()}
        assert rows["q1"]["answer_tokens"] == 2
        assert rows["q2"]["answer_tokens"] == 10
        assert rows["q2"]["mtld"] >= 0.0


class TestRewardUniEvaluators:
    """Deterministic stand-ins for reward_evaluator.py /
    uni_evaluator.py: same metric columns, bounded ranges, native
    expressions (no Python in the plan)."""

    def test_metric_columns_and_ranges(self, spark):
        from graphgen_spark.operators.evaluate import evaluate_qa

        qa = spark.createDataFrame(
            [
                ("what is the empire known for",
                 "the empire is known for roads and trade routes"),
                ("short", "x"),
                ("q", "a " * 200),
            ],
            ["question", "answer"],
        )
        rows = evaluate_qa(qa).collect()
        for r in rows:
            assert r["reward_score"] is not None
            assert 0.0 <= r["naturalness"] <= 1.0
            assert 0.0 <= r["coherence"] <= 1.0
            assert 0.0 <= r["understandability"] <= 1.0
        # overlapping q/a scores higher coherence than disjoint
        by_q = {r["question"]: r for r in rows}
        assert (by_q["what is the empire known for"]["coherence"]
                > by_q["short"]["coherence"])
        # sweet-spot-length answer out-rewards a one-token answer
        assert (by_q["what is the empire known for"]["reward_score"]
                > by_q["short"]["reward_score"])

    def test_native_plan(self, spark):
        from graphgen_spark.operators.evaluate import (
            with_reward_score,
            with_uni_scores,
        )

        qa = spark.createDataFrame([("q", "a")], ["question", "answer"])
        plan = with_uni_scores(with_reward_score(qa))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Python" not in plan
