"""Fused extraction fast path: pages -> records in ONE Python hop.

The composable operators (text -> chunking -> kg_extract) chain three
Arrow boundary crossings; Spark fuses them into one stage but each
pandas-UDF eval is its own Python worker process, so a 16-task stage
runs ~3x16 Python workers — serialization and scheduler pressure that
caps scaling well below core count.  This operator runs the identical
kernels (html_to_text -> detect_main_language -> split_text ->
mock_llm_response -> parse) inside a single ``mapInPandas`` function:
one Python worker per task, one Arrow hop in, one out.

Output is bit-identical to the composed path (verified by test) —
this is plan-level fusion, not a semantic variant.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from graphgen_spark.operators.kg_extract import RECORDS_SCHEMA


def pages_to_records(
    pages: DataFrame,
    chunk_size: int = 1024,
    chunk_overlap: int = 100,
    responder: Callable[[str], str] | None = None,
    html_col: str = "html",
    text_precomputed: bool = False,
    label_map_bc=None,
) -> DataFrame:
    """pages(url, html|text) -> records(chunk_id, url, kind, f1,f2,f3).

    ``text_precomputed=True`` skips html extraction and reads the
    ``text`` column (the production path when text extraction ran at
    crawl-ingest time).

    ``label_map_bc``: optional ``sc.broadcast({alias_norm:
    canonical_key})`` — entity linking runs map-side inside this same
    Python hop (the broadcast-hash join executed in the worker; right
    whenever the dictionary fits in executor memory).  Emitted entity
    names and relation endpoints are then canonical, endpoints sorted,
    self-loops dropped — equivalent to the JVM canonicalize stage.
    """
    cols = ["url", "text" if text_precomputed else html_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphgen_spark.extraction import (
            mock_llm_response,
            parse_extraction_response,
        )
        from graphgen_spark.operators.text import html_to_text
        from graphgen_spark.splitter import split_text
        from graphgen_spark.textkit import (
            count_tokens,
            detect_main_language,
            md5_hex,
        )

        respond = responder or mock_llm_response
        label_map = label_map_bc.value if label_map_bc is not None else None
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[cols[0]], pdf[cols[1]]):
                if payload is None:
                    continue
                if text_precomputed:
                    text = str(payload)
                else:
                    raw = (
                        payload.decode("utf-8", errors="replace")
                        if isinstance(payload, (bytes, bytearray))
                        else str(payload)
                    )
                    text = html_to_text(raw)
                if not text.strip():
                    continue
                language = detect_main_language(text)
                for piece in split_text(
                    text, language=language, chunk_size=chunk_size,
                    chunk_overlap=chunk_overlap, length_fn=count_tokens,
                ):
                    response = respond(piece)
                    if not response:
                        continue
                    chunk_id = "chunk-" + md5_hex(piece)
                    entities, relations = parse_extraction_response(
                        response, chunk_id
                    )
                    if label_map is None:
                        for e in entities:
                            rows.append(
                                (chunk_id, url, "entity",
                                 e["entity_name"], e["entity_type"],
                                 e["description"])
                            )
                        for r in relations:
                            rows.append(
                                (chunk_id, url, "relationship",
                                 r["src_id"], r["tgt_id"],
                                 r["description"])
                            )
                    else:
                        get = label_map.get
                        for e in entities:
                            name = e["entity_name"]
                            rows.append(
                                (chunk_id, url, "entity",
                                 get(name, name), e["entity_type"],
                                 e["description"])
                            )
                        for r in relations:
                            s = get(r["src_id"], r["src_id"])
                            t = get(r["tgt_id"], r["tgt_id"])
                            if s == t:
                                continue
                            if s > t:
                                s, t = t, s
                            rows.append(
                                (chunk_id, url, "relationship", s, t,
                                 r["description"])
                            )
            yield pd.DataFrame(
                rows, columns=["chunk_id", "url", "kind", "f1", "f2", "f3"]
            )

    return pages.select(*cols).mapInPandas(gen, schema=RECORDS_SCHEMA)
