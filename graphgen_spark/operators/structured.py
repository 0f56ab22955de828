"""Schema-guided structured extraction + style-controlled rephrasing.

- ExtractService (reference ``operators/extract/extract_service.py:19-56``
  + ``models/extractor/schema_guided_extractor.py:37-80``): prompt an
  LLM with a JSON schema, parse the JSON response, require keys.
  Spark mapping: a batched responder UDF (deterministic mock here)
  emits JSON strings; ``from_json(response, schema)`` parses JVM-side;
  a null-required-field filter enforces the schema.
- RephraseService (reference ``operators/rephrase/rephrase_service.py:
  34-61``): 8 style-controlled rephrasings -> a batched UDF; the
  deterministic stand-in applies style-tagged transforms.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

REPHRASE_STYLES = (
    "formal", "informal", "concise", "detailed",
    "technical", "simple", "question", "narrative",
)


def extract_structured(
    docs: DataFrame,
    schema: T.StructType,
    required: list[str],
    text_col: str = "content",
    id_col: str = "_trace_id",
) -> DataFrame:
    """Schema-guided extraction: the (mock) responder emits a JSON
    string per doc; from_json + required-key filter do the rest
    JVM-side.  The mock extracts sentence/token counts and the first
    relation sentence — enough structure to exercise the parse path."""

    resp_schema = T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField("response", T.StringType(), False),
        ]
    )

    def respond(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from graphgen_spark.extraction import find_relation_sentences

        for pdf in batches:
            rows = []
            for tid, text in zip(pdf[id_col], pdf[text_col]):
                text = str(text or "")
                rels = find_relation_sentences(text)
                payload = {
                    "n_tokens": len(text.split()),
                    "n_sentences": text.count(".") + text.count("。"),
                    "first_relation": rels[0][3] if rels else None,
                    "has_relations": bool(rels),
                }
                rows.append((tid, json.dumps(payload)))
            yield pd.DataFrame(rows, columns=[id_col, "response"])

    responses = docs.select(id_col, text_col).mapInPandas(
        respond, schema=resp_schema
    )
    parsed = responses.withColumn(
        "parsed", F.from_json("response", schema)
    ).select(id_col, "parsed.*")
    cond = None
    for key in required:
        c = F.col(key).isNotNull()
        cond = c if cond is None else (cond & c)
    return parsed.where(cond) if cond is not None else parsed


def rephrase(
    df: DataFrame,
    text_col: str = "answer",
    style: str = "formal",
) -> DataFrame:
    """Style-controlled rephrasing (deterministic stand-in: a
    style-tagged transform with the same row contract as the
    reference's LLM rephraser)."""
    if style not in REPHRASE_STYLES:
        raise ValueError(f"unknown style: {style}")

    @F.pandas_udf(T.StringType())
    def rephrase_udf(text: pd.Series) -> pd.Series:
        def apply(t: str) -> str:
            t = str(t or "")
            if style == "concise":
                words = t.split()
                return " ".join(words[: max(len(words) // 2, 3)])
            if style == "question":
                return f"Is it true that {t.rstrip('.')}?"
            if style == "detailed":
                return f"{t} This statement is elaborated in {style} style."
            return f"[{style}] {t}"

        return text.map(apply)

    return df.withColumn("rephrased", rephrase_udf(F.col(text_col))) \
             .withColumn("style", F.lit(style))
