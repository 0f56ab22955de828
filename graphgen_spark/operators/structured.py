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

# The reference's 8 named style templates
# (templates/rephrasing/style_controlled_rephrasing/*.py, dispatched by
# models/rephraser/style_controlled_rephraser.py:9-33).  Each maps to a
# DISTINCT deterministic transform below.
REPHRASE_STYLES = (
    "critical_analysis",
    "cross_domain_analogy",
    "executive_summary",
    "first_person_narrative",
    "historical_evolution_perspective",
    "popular_science",
    "qa_dialogue_format",
    "technical_deep_dive",
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


def _rephrase_expr(text: F.Column, style: str) -> F.Column:
    """One distinct native-expression transform per reference template
    (no Python in the hot path — whole-stage codegen)."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    half = F.floor(n / 2).cast("int")
    if style == "critical_analysis":
        return F.concat(
            F.lit("A critical reading reveals: "), text,
            F.lit(" However, "), F.element_at(toks, 1),
            F.lit(" warrants scrutiny."),
        )
    if style == "cross_domain_analogy":
        return F.concat(
            F.lit("Much like "), F.element_at(toks, -1),
            F.lit(" in another domain, "), text,
        )
    if style == "executive_summary":
        return F.concat(
            F.lit("In sum: "),
            F.concat_ws(
                " ", F.slice(toks, 1, F.greatest(half, F.lit(3)))
            ),
        )
    if style == "first_person_narrative":
        return F.concat(
            F.lit("From my perspective, "),
            F.lower(F.substring(text, 1, 1)),
            F.substring(text, F.lit(2), F.length(text)),
        )
    if style == "historical_evolution_perspective":
        return F.concat(
            F.lit("Initially, "),
            F.concat_ws(" ", F.slice(toks, 1, F.greatest(half, F.lit(1)))),
            F.lit(". Eventually, "),
            F.concat_ws(
                " ",
                F.slice(
                    toks,
                    F.greatest(half, F.lit(1)) + 1,
                    n - F.greatest(half, F.lit(1)),
                ),
            ),
            F.lit("."),
        )
    if style == "popular_science":
        return F.concat(
            F.lit("Imagine: "), F.replace(text, F.lit("."), F.lit("!"))
        )
    if style == "qa_dialogue_format":
        return F.concat(
            F.lit("Q: What does this passage state? A: "), text
        )
    if style == "technical_deep_dive":
        return F.concat(
            F.lit("[n_tokens="), n.cast("string"), F.lit("] "), text,
            F.lit(" (end of analysis)"),
        )
    raise ValueError(f"unknown style: {style}")


def rephrase(
    df: DataFrame,
    text_col: str = "answer",
    style: str = "critical_analysis",
) -> DataFrame:
    """Style-controlled rephrasing (deterministic stand-in for the
    reference's LLM templates, same row contract: content + style).
    Native column expressions — the transform stays JVM-side."""
    if style not in REPHRASE_STYLES:
        raise ValueError(f"unknown style: {style}")
    return df.withColumn(
        "rephrased", _rephrase_expr(F.col(text_col), style)
    ).withColumn("style", F.lit(style))
