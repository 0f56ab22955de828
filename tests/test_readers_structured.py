"""Readers (multi-format + validation), schema-guided extraction,
rephrasing, and structure-metrics tests."""

import json
import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphgen_spark.operators.readers import (
    read_documents,
    validate_docs,
    with_trace_id,
)
from graphgen_spark.operators.stats import structure_metrics
from graphgen_spark.operators.structured import extract_structured, rephrase


@pytest.fixture(scope="module")
def input_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    jl = d / "a.jsonl"
    jl.write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                {"type": "text", "content": "hello world one"},
                {"type": "text", "content": "   "},          # dropped
                {"type": "image", "content": ""},            # kept (not text)
                {"type": "text", "content": "second doc"},
            ]
        )
    )
    csv = d / "b.csv"
    csv.write_text("type,content\ntext,from csv\ntext,also csv\n")
    txt = d / "c.txt"
    txt.write_text("plain text file contents")
    return {"jsonl": str(jl), "csv": str(csv), "txt": str(txt)}


class TestReaders:
    def test_multiformat_union_and_validation(self, spark, input_files):
        df = read_documents(
            spark, [input_files["jsonl"], input_files["csv"],
                    input_files["txt"]]
        )
        rows = df.collect()
        contents = {r["content"] for r in rows if r["type"] == "text"}
        assert "hello world one" in contents
        assert "from csv" in contents
        assert "plain text file contents" in contents
        assert "   " not in contents  # blank text dropped
        assert any(r["type"] == "image" for r in rows)
        assert all(r["_trace_id"].startswith("read-") for r in rows)

    def test_read_nums_limit(self, spark, input_files):
        df = read_documents(spark, [input_files["jsonl"]], read_nums=2)
        assert df.count() == 2

    def test_validate_requires_type(self, spark):
        df = spark.createDataFrame([("x",)], ["content"])
        with pytest.raises(ValueError, match="type"):
            validate_docs(df)

    def test_trace_id_deterministic(self, spark):
        df = spark.createDataFrame(
            [("text", "abc"), ("text", "abc")], ["type", "content"]
        )
        ids = [r["_trace_id"] for r in with_trace_id(df).collect()]
        assert ids[0] == ids[1]


class TestStructuredExtraction:
    def test_schema_parse_and_required(self, spark):
        docs = spark.createDataFrame(
            [
                ("t1", "Zorvex Dynamics acquired Calyra Labs. More text."),
                ("t2", "no relations in this one."),
            ],
            ["_trace_id", "content"],
        )
        schema = T.StructType(
            [
                T.StructField("n_tokens", T.IntegerType()),
                T.StructField("n_sentences", T.IntegerType()),
                T.StructField("first_relation", T.StringType()),
                T.StructField("has_relations", T.BooleanType()),
            ]
        )
        out = extract_structured(
            docs, schema, required=["n_tokens"], text_col="content"
        )
        rows = {r["_trace_id"]: r for r in out.collect()}
        assert rows["t1"]["has_relations"] is True
        assert "acquired" in rows["t1"]["first_relation"]
        assert rows["t2"]["first_relation"] is None
        # required-key filter drops nothing here (n_tokens always set)
        assert len(rows) == 2

    def test_required_filter_drops(self, spark):
        docs = spark.createDataFrame(
            [("t1", "some text")], ["_trace_id", "content"]
        )
        schema = T.StructType(
            [T.StructField("missing_key", T.StringType())]
        )
        out = extract_structured(
            docs, schema, required=["missing_key"], text_col="content"
        )
        assert out.count() == 0


class TestRephrase:
    TEXT = "the empire was vast and peaceful. trade routes endured."

    def test_all_styles_distinct(self, spark):
        from graphgen_spark.operators.structured import REPHRASE_STYLES

        df = spark.createDataFrame([(self.TEXT,)], ["answer"])
        outs = {}
        for style in REPHRASE_STYLES:
            r = rephrase(df, style=style).collect()[0]
            assert r["style"] == style
            outs[style] = r["rephrased"]
        # 8 named reference templates -> 8 DISTINCT transforms
        assert len(set(outs.values())) == 8
        assert outs["executive_summary"].startswith("In sum: the empire")
        assert "However, the warrants scrutiny." in outs["critical_analysis"]
        assert outs["cross_domain_analogy"].startswith(
            "Much like endured."
        )
        assert outs["first_person_narrative"].startswith(
            "From my perspective, t"
        )
        assert "Eventually," in outs["historical_evolution_perspective"]
        assert outs["popular_science"].count("!") == 2
        assert outs["qa_dialogue_format"].startswith("Q: ")
        assert outs["technical_deep_dive"].startswith("[n_tokens=9]")
        with pytest.raises(ValueError):
            rephrase(df, style="nope")

    def test_stays_in_codegen(self, spark):
        # the transform must be a native expression, not a Python UDF
        df = spark.createDataFrame([(self.TEXT,)], ["answer"])
        plan = rephrase(df, style="popular_science")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Python" not in plan  # no BatchEvalPython / ArrowEval


class TestStructureMetrics:
    def test_metrics_on_known_graph(self, spark):
        # star of 12 + 3 isolated nodes
        nodes = spark.createDataFrame(
            [(f"n{i}", "t", "d", ["c"], 1, 1) for i in range(15)],
            ["entity_name", "entity_type", "description", "source_ids",
             "length", "n_mentions"],
        )
        edges = spark.createDataFrame(
            [("n0", f"n{i}", "d", ["c"], 1, 1) for i in range(1, 12)],
            ["src_id", "tgt_id", "description", "source_ids", "length",
             "n_mentions"],
        )
        m = structure_metrics(nodes, edges)
        assert m["total_nodes"] == 15
        assert m["total_edges"] == 11
        assert abs(m["noise_ratio"] - 3 / 15) < 1e-9
        assert abs(m["largest_cc_ratio"] - 12 / 15) < 1e-9
        assert abs(m["avg_degree"] - 22 / 15) < 1e-9
        # degree histogram: {11:1, 1:11} -> 2 points < 3 -> r2 None
        assert m["powerlaw_r2"] is None
        assert m["is_robust"] is False


class TestRDFReader:
    @pytest.fixture(scope="class")
    def nt_file(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("rdf")
        nt = d / "g.nt"
        nt.write_text(
            "\n".join(
                [
                    '<http://x/alice> <http://x/name> "Alice Smith" .',
                    '<http://x/alice> <http://x/knows> <http://x/bob> .',
                    '<http://x/alice> <http://x/bio> "likes graphs"@en .',
                    '<http://x/bob> <http://x/name> "Bob" .',
                    "# a comment line",
                    "",
                ]
            )
        )
        return str(nt)

    def test_one_doc_per_subject(self, spark, nt_file):
        from graphgen_spark.operators.readers import read_rdf_docs

        docs = {r["id"]: r for r in read_rdf_docs(spark, [nt_file]).collect()}
        assert set(docs) == {"http://x/alice", "http://x/bob"}
        # content = joined literal objects only (IRIs excluded)
        assert docs["http://x/alice"]["content"] == "Alice Smith likes graphs"
        assert docs["http://x/bob"]["content"] == "Bob"

    def test_properties_map(self, spark, nt_file):
        from graphgen_spark.operators.readers import read_rdf_docs

        alice = (
            read_rdf_docs(spark, [nt_file])
            .where(F.col("id") == "http://x/alice")
            .first()
        )
        props = alice["properties"]
        assert props["http://x/knows"] == ["http://x/bob"]
        assert props["http://x/name"] == ["Alice Smith"]

    def test_unified_read_with_nt(self, spark, nt_file, input_files):
        docs = read_documents(
            spark, [input_files["csv"], nt_file]
        )
        assert docs.where(F.col("type") == "text").count() == 4
        assert "_trace_id" in docs.columns


class TestReaderAdviceFixes:
    def test_whole_file_json_array(self, spark, tmp_path):
        # the reference's canonical .json format: pretty-printed
        # whole-file array (json.load) -> must parse via multiLine
        p = tmp_path / "arr.json"
        p.write_text(json.dumps(
            [
                {"type": "text", "content": "json array doc one"},
                {"type": "text", "content": "json array doc two"},
            ],
            indent=2,
        ))
        docs = read_documents(spark, [str(p)])
        contents = {r["content"] for r in docs.collect()}
        assert contents == {"json array doc one", "json array doc two"}

    def test_corrupt_json_fails_loudly(self, spark, tmp_path):
        from graphgen_spark.operators.readers import read_json_docs

        p = tmp_path / "arr2.json"
        p.write_text('[\n  {"type": "text",\n  "content": "x"}\n]\n')
        with pytest.raises(ValueError, match="multiline"):
            read_json_docs(spark, [str(p)], multiline=False)

    def test_trace_id_null_position(self, spark):
        # (a, NULL, b) and (a, b, NULL) must NOT collide
        df = spark.createDataFrame(
            [("a", None, "b"), ("a", "b", None)], ["c1", "c2", "c3"]
        )
        ids = [r["_trace_id"] for r in with_trace_id(df).collect()]
        assert ids[0] != ids[1]

    def test_nt_typed_literals_blank_nodes_escapes(self, spark, tmp_path):
        from graphgen_spark.operators.readers import read_rdf_docs

        nt = tmp_path / "typed.nt"
        nt.write_text("\n".join([
            '<http://x/a> <http://x/age> '
            '"5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
            '<http://x/a> <http://x/quote> "say \\"hi\\"\\nbye" .',
            '_:b0 <http://x/name> "Blank Node Doc" .',
            '<http://x/a> <http://x/rel> _:b0 .',
            '<http://x/a> <http://x/tag> "hello"@en-GB .',
        ]) + "\n")
        docs = {r["id"]: r for r in read_rdf_docs(spark, [str(nt)]).collect()}
        assert set(docs) == {"http://x/a", "_:b0"}
        a = docs["http://x/a"]
        assert a["properties"]["http://x/age"] == ["5"]       # typed literal kept
        assert a["properties"]["http://x/rel"] == ["_:b0"]    # bnode object
        assert a["properties"]["http://x/tag"] == ["hello"]   # lang tag stripped
        assert 'say "hi"\nbye' in a["properties"]["http://x/quote"]
        assert docs["_:b0"]["content"] == "Blank Node Doc"
