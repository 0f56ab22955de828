"""Multimodal chunks -> KG path (reference build_mm_kg.py +
mm_kg_builder.py): mixed text+image/table docs build one graph with
central IMAGE/TABLE entities linked to caption entities, feeding the
VQA generator."""

import pytest
from pyspark.sql import functions as F

from graphgen_spark.operators.mm_kg import (
    extract_mm_records,
    mm_chunks_from_docs,
)
from graphgen_spark.pipelines import run_mixed_kg_pipeline

CAPTION = (
    "Zorvex Dynamics acquired Calyra Labs. The chart shows totals."
)
TEXT = (
    "Bramwell Institute merged with Delphora Capital. Filler text here."
)


@pytest.fixture(scope="module")
def mixed_docs(spark):
    rows = [
        ("doc://t1", "text", TEXT),
        ("doc://i1", "image", CAPTION),
        ("doc://tb1", "table", "Gravante Dynamics sued Holbrink Dynamics."),
        ("doc://t2", "text", "no relations in this one at all."),
    ]
    return spark.createDataFrame(rows, ["url", "type", "content"])


class TestMMExtraction:
    def test_mm_chunks_filtered_and_content_addressed(
        self, spark, mixed_docs
    ):
        chunks = mm_chunks_from_docs(mixed_docs).collect()
        assert {c["chunk_type"] for c in chunks} == {"image", "table"}
        assert all(len(c["chunk_id"]) == 32 for c in chunks)

    def test_mini_graph_shape(self, spark, mixed_docs):
        recs = extract_mm_records(mm_chunks_from_docs(mixed_docs))
        ents = recs.where(F.col("kind") == "entity").collect()
        rels = recs.where(F.col("kind") == "relationship").collect()
        # central MM entities typed IMAGE / TABLE
        central_types = {
            e["f2"] for e in ents if e["f1"].startswith(("IMAGE ", "TABLE "))
        }
        assert central_types == {"IMAGE", "TABLE"}
        # caption entities present and linked to the central entity
        names = {e["f1"] for e in ents}
        assert "ZORVEX DYNAMICS" in names and "CALYRA LABS" in names
        preds = {r["f3"] for r in rels}
        assert any("depicts" in p for p in preds)
        assert any("tabulates" in p for p in preds)
        # the caption's own relation is also extracted
        assert any("acquired" in p for p in preds)


class TestMixedPipeline:
    def test_graph_from_mixed_docs(self, spark, mixed_docs):
        out = run_mixed_kg_pipeline(spark, mixed_docs, chunk_size=256,
                                    chunk_overlap=32)
        nodes = out["nodes"].collect()
        types = {n["entity_type"] for n in nodes}
        assert "IMAGE" in types and "TABLE" in types
        names = {n["entity_name"] for n in nodes}
        # text-path entities and MM-path entities share one graph
        assert "BRAMWELL INSTITUTE" in names
        assert "ZORVEX DYNAMICS" in names
        # edges exist from both paths
        edge_descs = {e["description"] for e in out["edges"].collect()}
        assert any("depicts" in d for d in edge_descs)
        assert any("merged with" in d for d in edge_descs)

    def test_determinism(self, spark, mixed_docs):
        a = {tuple(r) for r in run_mixed_kg_pipeline(
            spark, mixed_docs)["triples"].collect()}
        b = {tuple(r) for r in run_mixed_kg_pipeline(
            spark, mixed_docs)["triples"].collect()}
        assert a == b and len(a) > 0


class TestVQAOverMMGraph:
    def test_vqa_rows_from_image_nodes(self, spark, mixed_docs):
        from graphgen_spark.operators.generate import generate_qa
        from graphgen_spark.operators.partitioners import (
            bfs_partition,
            community_to_batches,
        )

        out = run_mixed_kg_pipeline(spark, mixed_docs)
        nodes = out["nodes"].localCheckpoint(eager=True)
        edges = out["edges"].localCheckpoint(eager=True)
        comms = bfs_partition(nodes, edges, max_units=10).localCheckpoint(
            eager=True
        )
        batches = community_to_batches(comms, nodes, edges)
        rows = generate_qa(batches, mode="vqa").collect()
        assert rows, "expected VQA rows from IMAGE nodes"
        for r in rows:
            assert r["img_path"].startswith("media/image_")
            assert "IMAGE" in r["question"]
