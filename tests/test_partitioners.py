"""Partitioner invariants on small hand-built graphs — mirrors the
reference's own test strategy (tests/integration_tests/models/
partitioner/test_bfs_partitioner.py: coverage, edge use, size bounds)."""

import math

import pytest
from pyspark.sql import functions as F

from graphgen_spark.operators.generate import format_qa, generate_qa
from graphgen_spark.operators.partitioners import (
    anchor_bfs_partition,
    bfs_partition,
    community_to_batches,
    dfs_partition,
    ece_partition,
    leiden_partition,
    quintuple_partition,
    triple_partition,
)
from graphgen_spark.operators.probe import attach_losses, judge, quiz


def _grid_graph(spark):
    """2x3 grid: A-B-C / D-E-F with vertical rungs (7 edges)."""
    nodes = spark.createDataFrame(
        [(n, "person", f"desc of {n}", ["c1"], 3, 1)
         for n in "ABCDEF"],
        ["entity_name", "entity_type", "description", "source_ids",
         "length", "n_mentions"],
    )
    pairs = [("A", "B"), ("B", "C"), ("D", "E"), ("E", "F"),
             ("A", "D"), ("B", "E"), ("C", "F")]
    edges = spark.createDataFrame(
        [(s, t, f"{s}-{t} related", ["c1"], 4, 1) for s, t in pairs],
        ["src_id", "tgt_id", "description", "source_ids", "length",
         "n_mentions"],
    )
    return nodes, edges


class TestGreedyPartitioners:
    @pytest.mark.parametrize("fn", [bfs_partition, dfs_partition])
    def test_cover_and_budget(self, spark, fn):
        nodes, edges = _grid_graph(spark)
        comms = fn(nodes, edges, max_units=4, min_units=1,
                   max_tokens=10_000).collect()
        assert comms
        covered_nodes = set()
        used_edges = set()
        for c in comms:
            assert c["n_units"] <= 4 + 4  # budget checked pre-add like ref
            covered_nodes.update(c["nodes"])
            used_edges.update((e["src"], e["dst"]) for e in c["edges"])
        assert covered_nodes == set("ABCDEF")
        assert len(used_edges) == 7

    def test_ece_budgets_and_min_size(self, spark):
        nodes, edges = _grid_graph(spark)
        comms = ece_partition(
            nodes, edges, max_units=3, min_units=2, max_tokens=50,
            unit_sampling="max_loss",
        ).collect()
        for c in comms:
            assert c["n_units"] >= 2

    def test_determinism(self, spark):
        nodes, edges = _grid_graph(spark)
        a = sorted(
            tuple(sorted(c["nodes"]))
            for c in bfs_partition(nodes, edges, max_units=4).collect()
        )
        b = sorted(
            tuple(sorted(c["nodes"]))
            for c in bfs_partition(
                nodes, edges.repartition(5), max_units=4
            ).collect()
        )
        assert a == b

    def test_anchor_bfs_only_anchor_seeds(self, spark):
        nodes, edges = _grid_graph(spark)
        nodes = nodes.withColumn(
            "entity_type",
            F.when(F.col("entity_name") == "A", "image").otherwise("person"),
        )
        comms = anchor_bfs_partition(
            nodes, edges, anchor_type="image", max_units=3
        ).collect()
        assert len(comms) == 1
        assert "A" in comms[0]["nodes"]

    def test_quintuple_paths(self, spark):
        nodes, edges = _grid_graph(spark)
        comms = quintuple_partition(nodes, edges).collect()
        assert comms
        for c in comms:
            assert len(c["nodes"]) == 3
            assert len(c["edges"]) == 2
            v1, u, v2 = c["nodes"]
            es = {(e["src"], e["dst"]) for e in c["edges"]}
            assert tuple(sorted((v1, u))) in es
            assert tuple(sorted((u, v2))) in es

    def test_leiden_fallback_size_bound(self, spark):
        nodes, edges = _grid_graph(spark)
        comms = leiden_partition(nodes, edges, max_size=3).collect()
        assert comms
        covered = set()
        for c in comms:
            covered.update(c["nodes"])
        assert covered == set("ABCDEF")


class TestTriplePartition:
    def test_one_community_per_edge(self, spark):
        _, edges = _grid_graph(spark)
        comms = triple_partition(edges).collect()
        assert len(comms) == 7
        for c in comms:
            assert len(c["nodes"]) == 2 and len(c["edges"]) == 1
            assert c["n_units"] == 3


class TestCommunityBatches:
    def test_payload_join_and_selfloop_drop(self, spark):
        nodes, edges = _grid_graph(spark)
        comms = triple_partition(edges)
        batches = community_to_batches(comms, nodes, edges).collect()
        assert len(batches) == 7
        for b in batches:
            assert len(b["node_data"]) == 2
            assert len(b["edge_data"]) == 1
            assert b["edge_data"][0]["description"].endswith("related")


class TestQuizJudge:
    def test_quiz_expansion_counts(self, spark):
        nodes, edges = _grid_graph(spark)
        q = quiz(nodes, edges, quiz_samples=2)
        rows = q.collect()
        # per unit: samples=2 -> 1 yes + 2 no = 3 statements
        assert len(rows) == (6 + 7) * 3
        by_gt = {r["ground_truth"] for r in rows}
        assert by_gt == {"yes", "no"}

    def test_judge_loss_positive_and_joined(self, spark):
        nodes, edges = _grid_graph(spark)
        losses = judge(quiz(nodes, edges, quiz_samples=2))
        n_out, e_out = attach_losses(nodes, edges, losses)
        nrows = n_out.collect()
        assert all(r["loss"] > 0 for r in nrows)
        assert len(nrows) == 6
        assert e_out.where(F.col("loss").isNull()).count() == 0

    def test_unprobed_default_loss(self, spark):
        nodes, edges = _grid_graph(spark)
        empty_losses = judge(
            quiz(nodes.limit(0), edges.limit(0), quiz_samples=1)
        )
        n_out, _ = attach_losses(nodes, edges, empty_losses)
        for r in n_out.collect():
            assert abs(r["loss"] - (-math.log(0.1))) < 1e-9


class TestGenerate:
    def test_modes_and_formats(self, spark):
        nodes, edges = _grid_graph(spark)
        batches = community_to_batches(
            bfs_partition(nodes, edges, max_units=6), nodes, edges
        )
        qa = generate_qa(batches, mode="aggregated")
        rows = qa.collect()
        assert rows and all(r["question"] and r["answer"] for r in rows)

        tf = generate_qa(batches, mode="true_false").collect()
        assert all(r["answer"] == "True" for r in tf)

        chatml = format_qa(qa, "ChatML").collect()
        assert chatml[0]["messages"][0]["role"] == "user"
        alpaca = format_qa(qa, "Alpaca").columns
        assert alpaca == ["instruction", "input", "output"]
        sharegpt = format_qa(qa, "Sharegpt").collect()
        assert sharegpt[0]["conversations"][1]["from"] == "gpt"
        qap = format_qa(qa, "QA_pairs").columns
        assert qap == ["question", "answer"]


class TestLouvainCommunityDetection:
    """The no-dependency community-detection branch of
    leiden_partition: deterministic Louvain must recover planted
    community structure (two cliques bridged by one edge)."""

    def _barbell(self, spark):
        left = [f"L{i}" for i in range(5)]
        right = [f"R{i}" for i in range(5)]
        edge_rows = []
        for grp in (left, right):
            for i in range(len(grp)):
                for j in range(i + 1, len(grp)):
                    edge_rows.append((grp[i], grp[j]))
        edge_rows.append(("L0", "R0"))  # the bridge
        nodes = spark.createDataFrame(
            [(n, "ORG", f"{n} desc", 3) for n in left + right],
            ["entity_name", "entity_type", "description", "length"],
        )
        edges = spark.createDataFrame(
            [(a, b, f"{a} rel {b}", 3) for a, b in edge_rows],
            ["src_id", "tgt_id", "description", "length"],
        )
        return nodes, edges

    def test_planted_cliques_recovered(self, spark):
        from graphgen_spark.operators.partitioners import leiden_partition

        nodes, edges = self._barbell(spark)
        comms = leiden_partition(nodes, edges, max_size=20).collect()
        groups = sorted(sorted(c["nodes"]) for c in comms)
        assert groups == [
            [f"L{i}" for i in range(5)],
            [f"R{i}" for i in range(5)],
        ]
        # intra-community edges attached; the bridge edge in neither
        n_edges = sum(len(c["edges"]) for c in comms)
        assert n_edges == 20  # 2 x C(5,2)

    def test_deterministic(self, spark):
        from graphgen_spark.operators.partitioners import leiden_partition

        nodes, edges = self._barbell(spark)
        a = sorted(
            (c["community_id"], tuple(c["nodes"]))
            for c in leiden_partition(nodes, edges).collect()
        )
        b = sorted(
            (c["community_id"], tuple(c["nodes"]))
            for c in leiden_partition(nodes, edges).collect()
        )
        assert a == b

    def test_louvain_kernel_singletons_and_empty(self):
        from graphgen_spark.operators.partitioners import _louvain

        assert _louvain(3, [], 1.0) == [0, 1, 2]
        # one triangle collapses to a single community
        assert len(set(_louvain(3, [(0, 1), (1, 2), (0, 2)], 1.0))) == 1
