"""Parity fills: PickleReader, CharacterSplitter,
MarkdownTextRefSplitter (reference models/reader/pickle_reader.py,
models/splitter/character_splitter.py, markdown_splitter.py)."""

import pickle

import pytest

from graphgen_spark.operators.chunking import chunk_documents
from graphgen_spark.operators.readers import read_documents, read_pickle_docs
from graphgen_spark.splitter import character_split, markdown_split


class TestPickleReader:
    @pytest.fixture(scope="class")
    def pkl_file(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("pkl")
        p = d / "docs.pkl"
        data = [
            {"type": "text", "content": "pickled doc one"},
            {"type": "text", "content": "pickled doc two", "lang": "en"},
            {"type": "image", "content": "", "path": "img.png"},
            "not-a-dict",          # dropped like the reference
        ]
        p.write_bytes(pickle.dumps(data))
        return str(p)

    def test_rows_and_meta(self, spark, pkl_file):
        rows = read_pickle_docs(spark, [pkl_file]).collect()
        assert len(rows) == 3
        contents = {r["content"] for r in rows}
        assert "pickled doc one" in contents
        by_content = {r["content"]: r for r in rows}
        assert '"lang": "en"' in by_content["pickled doc two"]["meta"]
        assert by_content["pickled doc one"]["meta"] is None

    def test_suffix_dispatch_and_validation(self, spark, pkl_file):
        docs = read_documents(spark, [pkl_file])
        rows = docs.collect()
        # blank-content image row kept, text rows kept, trace ids on
        assert len(rows) == 3
        assert all(r["_trace_id"].startswith("read-") for r in rows)

    def test_corrupt_pickle_dropped(self, spark, tmp_path):
        bad = tmp_path / "bad.pkl"
        bad.write_bytes(b"\x00not pickle")
        assert read_pickle_docs(spark, [str(bad)]).count() == 0


class TestCharacterSplitter:
    def test_single_separator_merge(self):
        text = "aaa\n\nbbb\n\nccc\n\nddd"
        chunks = character_split(
            text, separator="\n\n", chunk_size=9, chunk_overlap=0
        )
        # pieces of 3 chars merged pairwise with the separator re-added
        assert chunks == ["aaa\n\nbbb", "ccc\n\nddd"]

    def test_overlap_carry(self):
        text = "aa bb cc dd"
        chunks = character_split(
            text, separator=" ", chunk_size=5, chunk_overlap=2
        )
        # windows of two tokens with one-token carry-over
        assert chunks[0] == "aa bb"
        assert all(len(c) <= 5 for c in chunks)
        joined = " ".join(chunks)
        for piece in ["aa", "bb", "cc", "dd"]:
            assert piece in joined

    def test_regex_separator(self):
        chunks = character_split(
            "one1two2three", separator=r"\d", is_separator_regex=True,
            chunk_size=5, chunk_overlap=0,
        )
        assert chunks == ["one", "two", "three"]


class TestMarkdownSplitter:
    MD = (
        "# Title\n\nintro paragraph here\n\n"
        "## Section A\n\ncontent of a\n\n"
        "## Section B\n\ncontent of b with more words\n\n"
        "```\ncode block\n```\nafter code"
    )

    def test_splits_on_headings_first(self):
        chunks = markdown_split(self.MD, chunk_size=40, chunk_overlap=0)
        assert len(chunks) >= 3
        # heading markers start their own chunks (separator kept
        # leading, reference keep_separator='start' semantics)
        assert any(c.startswith("## Section A") for c in chunks)
        assert any(c.startswith("## Section B") for c in chunks)

    def test_no_content_lost(self):
        chunks = markdown_split(self.MD, chunk_size=40, chunk_overlap=0)
        joined = "".join(chunks)
        for frag in ["intro paragraph", "content of a", "content of b",
                     "code block", "after code"]:
            assert frag.replace(" ", "") in joined.replace(
                " ", "").replace("\n", "")

    def test_config_selectable_in_chunk_documents(self, spark):
        docs = spark.createDataFrame(
            [("u1", self.MD)], ["url", "text"]
        )
        md_chunks = chunk_documents(
            docs, chunk_size=40, chunk_overlap=0, length_by_tokens=False,
            splitter="markdown",
        ).collect()
        assert any(
            c["content"].startswith("## Section A") for c in md_chunks
        )
        ch_chunks = chunk_documents(
            docs, chunk_size=60, chunk_overlap=0, length_by_tokens=False,
            splitter="character",
        ).collect()
        assert len(ch_chunks) >= 2
        with pytest.raises(ValueError, match="unknown splitter"):
            chunk_documents(docs, splitter="nope")


class TestTurtleReader:
    TTL = """\
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
# a comment line
ex:alice ex:name "Alice Smith" ;
         ex:age "34"^^xsd:integer ;
         ex:knows ex:bob , ex:carol .
ex:bob a ex:Person ;
       ex:name "Bob \\"B\\" Jones"@en .
<http://example.org/carol> <http://example.org/name> "Carol" .
"""

    @pytest.fixture(scope="class")
    def ttl_file(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("ttl") / "g.ttl"
        p.write_text(self.TTL)
        return str(p)

    def test_docs_per_subject(self, spark, ttl_file):
        from graphgen_spark.operators.readers import read_turtle_docs

        docs = {r["id"]: r for r in
                read_turtle_docs(spark, [ttl_file]).collect()}
        assert set(docs) == {
            "http://example.org/alice", "http://example.org/bob",
            "http://example.org/carol",
        }
        alice = docs["http://example.org/alice"]
        props = alice["properties"]
        # prefix expansion, ; and , lists, typed literal
        assert props["http://example.org/name"] == ["Alice Smith"]
        assert props["http://example.org/age"] == ["34"]
        assert sorted(props["http://example.org/knows"]) == [
            "http://example.org/bob", "http://example.org/carol",
        ]
        # 'a' keyword -> rdf:type; lang tag stripped; escapes decoded
        bob = docs["http://example.org/bob"]
        assert bob["properties"][
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        ] == ["http://example.org/Person"]
        assert bob["content"] == 'Bob "B" Jones'

    def test_suffix_dispatch(self, spark, ttl_file):
        docs = read_documents(spark, [ttl_file])
        assert docs.count() == 3
        assert "_trace_id" in docs.columns


class TestReaderAdviceFixes:
    """ADVICE r2 regressions: non-JSON-serializable pickle meta values
    must not fail the task; mixed .json/.jsonl lists must read each
    suffix group in its own multiLine mode."""

    def test_pickle_nonjson_meta_values(self, spark, tmp_path):
        import datetime
        import pickle

        import numpy as np

        p = tmp_path / "weird.pkl"
        data = [
            {"type": "text", "content": "doc with weird meta",
             "when": datetime.datetime(2026, 1, 2, 3, 4, 5),
             "blob": b"\x01\x02", "score": np.float64(0.5)},
        ]
        p.write_bytes(pickle.dumps(data))
        rows = read_pickle_docs(spark, [str(p)]).collect()
        assert len(rows) == 1  # row kept, not task-fatal
        assert "2026-01-02" in rows[0]["meta"]  # default=str rendering

    def test_mixed_json_jsonl_paths(self, spark, tmp_path):
        import json

        arr = tmp_path / "whole.json"  # pretty-printed whole-file array
        arr.write_text(json.dumps(
            [{"type": "text", "content": "from array"}], indent=2
        ))
        lines = tmp_path / "lines.jsonl"  # one object per line
        lines.write_text(
            "\n".join(
                json.dumps({"type": "text", "content": f"line {i}"})
                for i in range(3)
            )
        )
        from graphgen_spark.operators.readers import read_json_docs

        df = read_json_docs(spark, [str(arr), str(lines)])
        contents = {r["content"] for r in df.collect()}
        assert contents == {"from array", "line 0", "line 1", "line 2"}
