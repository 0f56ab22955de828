"""Doc→chunk explosion (reference ChunkService,
``graphgen/operators/chunk/chunk_service.py:45-109``).

One ``mapInPandas`` pass: per document detect the main language, pick
the en/zh recursive splitter, emit one row per chunk with a
content-hash chunk id and a deterministic token length.  No global
state, no KV actor — lineage (doc→chunk) is emitted inline as columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("content", T.StringType(), False),
        T.StructField("language", T.StringType(), False),
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
    ]
)


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str = "url",
    chunk_size: int = 1024,
    chunk_overlap: int = 100,
    length_by_tokens: bool = True,
    splitter: str = "recursive",
) -> DataFrame:
    """docs(url, text, ...) -> chunks(chunk_id, url, doc_id, content,
    language, n_tokens, chunk_index).

    chunk_id is md5(content) — content-addressed like the reference's
    trace ids, so identical chunks dedupe naturally downstream.

    ``splitter``: 'recursive' (language-routed, the reference default),
    'character' (single-separator CharacterSplitter), or 'markdown'
    (MarkdownTextRefSplitter heading ladder) — the reference's
    config-selectable splitter surface.
    """
    if splitter not in ("recursive", "character", "markdown"):
        raise ValueError(f"unknown splitter: {splitter}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphgen_spark.splitter import (
            character_split,
            markdown_split,
            split_text,
        )
        from graphgen_spark.textkit import (
            count_tokens,
            detect_main_language,
            md5_hex,
        )

        length_fn = count_tokens if length_by_tokens else len

        def split_fn(text, language):
            if splitter == "character":
                return character_split(
                    text, chunk_size=chunk_size,
                    chunk_overlap=chunk_overlap, length_fn=length_fn,
                )
            if splitter == "markdown":
                return markdown_split(
                    text, chunk_size=chunk_size,
                    chunk_overlap=chunk_overlap, length_fn=length_fn,
                )
            return split_text(
                text, language=language, chunk_size=chunk_size,
                chunk_overlap=chunk_overlap, length_fn=length_fn,
            )

        for pdf in batches:
            rows = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                if text is None or not str(text).strip():
                    continue
                text = str(text)
                language = detect_main_language(text)
                doc_id = "doc-" + md5_hex(text)
                for idx, piece in enumerate(split_fn(text, language)):
                    rows.append(
                        (
                            "chunk-" + md5_hex(piece),
                            url,
                            doc_id,
                            piece,
                            language,
                            length_fn(piece),
                            idx,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "chunk_id", "url", "doc_id", "content",
                    "language", "n_tokens", "chunk_index",
                ],
            )

    return docs.select(url_col, text_col).mapInPandas(gen, schema=CHUNKS_SCHEMA)
