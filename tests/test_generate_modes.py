"""All 10+1 generation modes: row shapes, determinism, mode semantics
(reference models/generator/*_generator.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphgen_spark.operators.generate import (
    GENERATION_MODES,
    QA_SCHEMA,
    format_qa,
    generate_qa,
)

_BATCH_SCHEMA = T.StructType(
    [
        T.StructField("community_id", T.StringType()),
        T.StructField(
            "node_data",
            T.ArrayType(T.StructType([
                T.StructField("entity_name", T.StringType()),
                T.StructField("entity_type", T.StringType()),
                T.StructField("description", T.StringType()),
            ])),
        ),
        T.StructField(
            "edge_data",
            T.ArrayType(T.StructType([
                T.StructField("src_id", T.StringType()),
                T.StructField("tgt_id", T.StringType()),
                T.StructField("description", T.StringType()),
            ])),
        ),
    ]
)


@pytest.fixture(scope="module")
def batches(spark):
    nodes = [
        ("ALPHA CORP", "ORGANIZATION", "Alpha Corp is an energy firm."),
        ("BETA LABS", "ORGANIZATION", "Beta Labs researches alloys."),
        ("GAMMA INC", "ORGANIZATION", "Gamma Inc builds turbines."),
        ("DELTA LLC", "ORGANIZATION", "Delta LLC ships cargo."),
        ("CHART 7", "IMAGE", "Chart 7 shows quarterly revenue."),
    ]
    edges = [
        ("ALPHA CORP", "BETA LABS", "Alpha Corp acquired Beta Labs"),
        ("ALPHA CORP", "GAMMA INC", "Alpha Corp sued Gamma Inc"),
        ("BETA LABS", "DELTA LLC", "Beta Labs merged with Delta LLC"),
    ]
    return spark.createDataFrame(
        [("c0", nodes, edges)], schema=_BATCH_SCHEMA
    )


class TestNewModes:
    def test_schema_uniform_across_modes(self, spark, batches):
        for mode in GENERATION_MODES:
            df = generate_qa(batches, mode=mode)
            assert df.schema == QA_SCHEMA, mode

    def test_cot_reasoning_path(self, spark, batches):
        rows = generate_qa(batches, mode="cot").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["reasoning_path"].startswith("Step 1:")
        assert r["reasoning_path"].count("Step") == 3
        assert "Therefore" in r["answer"]

    def test_vqa_img_path(self, spark, batches):
        rows = generate_qa(batches, mode="vqa").collect()
        assert len(rows) == 1  # one IMAGE node
        assert rows[0]["img_path"] == "media/chart_7"
        assert "CHART 7" in rows[0]["question"]
        assert rows[0]["answer"] == "Chart 7 shows quarterly revenue."

    def test_multi_choice_options_and_letter(self, spark, batches):
        rows = generate_qa(batches, mode="multi_choice").collect()
        assert rows, "expected MCQs"
        for r in rows:
            assert len(r["options"]) == 4
            assert r["answer"] in "ABCD"
            # the answer letter points at the masked (correct) entity
            correct = [
                o[3:] for o in r["options"] if o[0] == r["answer"]
            ][0]
            assert "______" in r["question"]
            assert correct not in r["question"]

    def test_multi_answer_letters(self, spark, batches):
        rows = generate_qa(batches, mode="multi_answer").collect()
        assert rows
        for r in rows:
            assert len(r["options"]) == 4
            assert r["answers"] == sorted(r["answers"])
            assert len(r["answers"]) >= 2
            assert r["answer"] == ", ".join(r["answers"])

    def test_fill_in_blank(self, spark, batches):
        rows = generate_qa(batches, mode="fill_in_blank").collect()
        assert len(rows) == 3  # every edge description contains its tgt
        for r in rows:
            assert "____" in r["question"]
            assert r["answers"] == [r["answer"]]
            # the surface form fills the blank back to a real sentence
            assert r["answer"].upper() in r["question"].replace(
                "____", r["answer"]
            ).upper()

    def test_masked_fill_in_blank(self, spark, batches):
        rows = generate_qa(batches, mode="masked_fill_in_blank").collect()
        assert len(rows) == 1
        r = rows[0]
        assert "{ }" in r["question"]
        assert r["answer"].upper() not in r["question"].upper()

    def test_quiz(self, spark, batches):
        rows = generate_qa(batches, mode="quiz").collect()
        assert len(rows) == 5
        answers = {r["answer"] for r in rows}
        assert "ALPHA CORP" in answers and "CHART 7" in answers

    def test_determinism(self, spark, batches):
        for mode in ("cot", "multi_choice", "masked_fill_in_blank"):
            a = sorted(map(tuple, generate_qa(batches, mode=mode).collect()))
            b = sorted(map(tuple, generate_qa(batches, mode=mode).collect()))
            assert a == b, mode

    def test_vqa_formats_carry_image(self, spark, batches):
        qa = generate_qa(batches, mode="vqa")
        alp = format_qa(qa, "Alpaca", vqa=True).collect()
        assert alp[0]["image"] == "media/chart_7"
        chat = format_qa(qa, "ChatML", vqa=True).collect()
        assert chat[0]["messages"][0]["image"] == "media/chart_7"
        assert chat[0]["messages"][1]["image"] is None
        # non-VQA formatting stays the 3-column Alpaca contract
        assert format_qa(qa, "Alpaca").columns == [
            "instruction", "input", "output",
        ]

    def test_unknown_mode_raises(self, spark, batches):
        with pytest.raises(ValueError, match="Unknown generation mode"):
            generate_qa(batches, mode="nope")
