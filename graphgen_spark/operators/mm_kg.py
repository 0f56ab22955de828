"""Multimodal chunks -> KG records (reference
``operators/build_kg/build_mm_kg.py:11-52`` +
``models/kg_builder/mm_kg_builder.py:20-98``).

The reference routes image/table chunks through an MM extraction
prompt whose response is the SAME record grammar as text extraction;
IMAGE entities additionally carry the chunk metadata.  Spark mapping:
one ``mapInPandas`` over the MM chunks emits the shared ``records``
long format (kg_extract.RECORDS_SCHEMA), so canonicalization,
merge_nodes/merge_edges, partitioners, and generation consume MM
records with zero special-casing.  The media payload itself stays in
the multimodal column plumbing (``datapipe/multimodal.py``); an IMAGE
node's media path is a pure function of its entity name (the
convention the VQA generator reads back,
``operators/generate.py`` vqa mode).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphgen_spark.operators.kg_extract import RECORDS_SCHEMA


def mm_chunks_from_docs(
    docs: DataFrame,
    type_col: str = "type",
    text_col: str = "content",
    url_col: str = "url",
) -> DataFrame:
    """Multimodal docs -> one chunk per doc (the reference treats each
    MM chunk whole — no splitting); chunk ids are content-addressed
    like text chunks."""
    from graphgen_spark.extraction import MM_CHUNK_TYPES

    return docs.where(F.col(type_col).isin(*MM_CHUNK_TYPES)).select(
        F.md5(F.concat_ws("\x1f", type_col, text_col)).alias("chunk_id"),
        F.col(url_col).alias("url"),
        F.col(type_col).alias("chunk_type"),
        F.col(text_col).alias("content"),
    )


def extract_mm_records(
    mm_chunks: DataFrame,
    responder: Callable[[str, str, str], str] | None = None,
) -> DataFrame:
    """mm_chunks(chunk_id, url, chunk_type, content) -> records
    (shared long format).  ``responder(chunk_id, chunk_type, caption)``
    defaults to the deterministic MM mock LLM."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphgen_spark.extraction import (
            mock_mm_llm_response,
            parse_extraction_response,
        )

        respond = responder or mock_mm_llm_response
        for pdf in batches:
            rows = []
            for chunk_id, url, ctype, content in zip(
                pdf["chunk_id"], pdf["url"], pdf["chunk_type"],
                pdf["content"],
            ):
                response = respond(chunk_id, ctype, str(content or ""))
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

    cols = ["chunk_id", "url", "chunk_type", "content"]
    return mm_chunks.select(*cols).mapInPandas(gen, schema=RECORDS_SCHEMA)
