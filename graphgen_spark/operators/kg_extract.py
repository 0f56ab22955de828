"""Chunk→record extraction (reference BuildKGService extraction half,
``graphgen/operators/build_kg/build_kg_service.py:31-107`` +
``models/kg_builder/light_rag_kg_builder.py:24-98``).

One ``mapInPandas`` pass per chunk batch: run the (pluggable) responder
— by default the deterministic mock LLM that emits the GraphGen record
grammar — then parse with reference-parity semantics, emitting a single
long-format ``records`` DataFrame:

    records(chunk_id, url, kind, f1, f2, f3)
      kind='entity'       -> f1=entity_name, f2=entity_type, f3=description
      kind='relationship' -> f1=src_id,      f2=tgt_id,      f3=description

Downstream ``entities_from_records``/``relations_from_records`` are pure
column projections (no extra Python).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),
        T.StructField("f1", T.StringType(), False),
        T.StructField("f2", T.StringType(), False),
        T.StructField("f3", T.StringType(), False),
    ]
)


def extract_records(
    chunks: DataFrame,
    responder: Callable[[str], str] | None = None,
    response_col: str | None = None,
) -> DataFrame:
    """chunks(chunk_id, url, content, ...) -> records.

    ``responder`` maps chunk content to an extraction-response string in
    the GraphGen record grammar (default: the deterministic mock LLM).
    A ``GleaningResponder`` instance instead runs the reference's
    multi-round IF_LOOP/CONTINUE glean loop
    (``light_rag_kg_builder.py:43-66``), concatenating rounds before
    the one final parse.  Pass ``response_col`` when responses are
    precomputed (the fixture/P-R harness path): then only the parser
    runs.
    """
    use_response_col = response_col is not None
    cols = ["chunk_id", "url", response_col] if use_response_col else [
        "chunk_id", "url", "content",
    ]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphgen_spark.extraction import (
            GleaningResponder,
            mock_llm_response,
            parse_extraction_response,
            run_gleaning,
        )

        if isinstance(responder, GleaningResponder):
            def respond(content):
                return run_gleaning(responder, content)
        else:
            respond = responder or mock_llm_response
        for pdf in batches:
            rows = []
            for chunk_id, url, payload in zip(
                pdf[cols[0]], pdf[cols[1]], pdf[cols[2]]
            ):
                response = payload if use_response_col else respond(payload)
                if not response:
                    continue
                entities, relations = parse_extraction_response(
                    response, chunk_id
                )
                for e in entities:
                    rows.append(
                        (chunk_id, url, "entity", e["entity_name"],
                         e["entity_type"], e["description"])
                    )
                for r in relations:
                    rows.append(
                        (chunk_id, url, "relationship", r["src_id"],
                         r["tgt_id"], r["description"])
                    )
            yield pd.DataFrame(
                rows, columns=["chunk_id", "url", "kind", "f1", "f2", "f3"]
            )

    return chunks.select(*cols).mapInPandas(gen, schema=RECORDS_SCHEMA)


def entities_from_records(records: DataFrame) -> DataFrame:
    """records -> entities(entity_name, entity_type, description,
    source_id, url); pure projection, stays in codegen."""
    return records.where(F.col("kind") == "entity").select(
        F.col("f1").alias("entity_name"),
        F.col("f2").alias("entity_type"),
        F.col("f3").alias("description"),
        F.col("chunk_id").alias("source_id"),
        "url",
    )


def relations_from_records(records: DataFrame) -> DataFrame:
    """records -> relations with endpoints sorted (undirected edges are
    keyed by the sorted pair — reference ``build_text_kg.py:41``)."""
    return records.where(F.col("kind") == "relationship").select(
        F.least("f1", "f2").alias("src_id"),
        F.greatest("f1", "f2").alias("tgt_id"),
        F.col("f3").alias("description"),
        F.col("chunk_id").alias("source_id"),
        "url",
    )
