"""Incremental KG maintenance: fold-in of a new page batch must equal
the from-scratch build bit for bit (the merge state is a monoid —
pipelines/incremental.py), and state commits must be atomic snapshot
writes with rollback."""

import pytest
from pyspark.sql import functions as F

from graphgen_spark.operators.chunking import chunk_documents
from graphgen_spark.operators.kg_extract import extract_records
from graphgen_spark.operators.merge import merge_edges, merge_nodes
from graphgen_spark.pipelines.incremental import (
    finalize_kg_state,
    ingest_batch,
    kg_state_from_records,
    load_kg_state,
    merge_kg_state,
)
from graphgen_spark.synth import pages_df


def _records(spark, lo, hi, n_entities=300):
    # deterministic split by page index embedded in the url
    pages = pages_df(spark, hi, n_entities=n_entities).withColumn(
        "_pid",
        F.regexp_extract("url", r"/article/(\d+)$", 1).cast("long"),
    ).where((F.col("_pid") >= lo) & (F.col("_pid") < hi)).drop("_pid")
    docs = pages.select("url", "text")
    chunks = chunk_documents(docs, chunk_size=400, chunk_overlap=40)
    return extract_records(chunks)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestIncrementalParity:
    def test_incremental_equals_batch(self, spark):
        rec_a = _records(spark, 0, 60).localCheckpoint(eager=True)
        rec_b = _records(spark, 60, 100).localCheckpoint(eager=True)
        rec_all = rec_a.unionByName(rec_b)

        state = merge_kg_state(
            kg_state_from_records(rec_a),
            kg_state_from_records(rec_b),
        )
        inc = finalize_kg_state(state)

        from graphgen_spark.operators.kg_extract import (
            entities_from_records,
            relations_from_records,
        )

        entities = entities_from_records(rec_all)
        relations = relations_from_records(rec_all).where(
            F.col("src_id") != F.col("tgt_id")
        )
        batch_nodes = merge_nodes(entities)
        batch_edges = merge_edges(relations, batch_nodes)

        assert _sorted_rows(inc["nodes"]) == _sorted_rows(batch_nodes)
        assert _sorted_rows(inc["edges"]) == _sorted_rows(batch_edges)
        assert inc["nodes"].count() > 0 and inc["edges"].count() > 0

    def test_ingest_commit_rollback(self, spark, tmp_path):
        from graphgen_spark.catalog import snapshot_rollback

        loc = str(tmp_path)
        rec_a = _records(spark, 0, 40).localCheckpoint(eager=True)
        rec_b = _records(spark, 40, 80).localCheckpoint(eager=True)

        ids1 = ingest_batch(spark, rec_a, loc)
        assert set(ids1.values()) == {1}
        n1 = finalize_kg_state(load_kg_state(spark, loc))["nodes"].count()

        ids2 = ingest_batch(spark, rec_b, loc)
        assert set(ids2.values()) == {2}
        final2 = finalize_kg_state(load_kg_state(spark, loc))
        n2 = final2["nodes"].count()
        assert n2 >= n1

        # the incremental standing state equals the from-scratch build
        batch_state = kg_state_from_records(
            rec_a.unionByName(rec_b)
        )
        batch = finalize_kg_state(batch_state)
        assert _sorted_rows(final2["nodes"]) == _sorted_rows(
            batch["nodes"]
        )
        assert _sorted_rows(final2["edges"]) == _sorted_rows(
            batch["edges"]
        )

        # a bad batch rolls back per state table, atomically
        for t in ("node_aggs", "node_types", "edge_aggs"):
            snapshot_rollback(loc, t, 1)
        n_rb = finalize_kg_state(load_kg_state(spark, loc))["nodes"].count()
        assert n_rb == n1
