"""QA generation per community + output-format projections.

Reference: GenerateService drives an LLM per community batch in 10
modes (``operators/generate/generate_service.py:30-115``); the output
formatting is a pure projection (``bases/base_generator.py:43-83``:
Alpaca / Sharegpt / ChatML / QA_pairs).

Here the generator is the deterministic no-network stand-in (template
QA over the community's node/edge payloads — same row shape the
reference parsers emit), and formatting is native ``struct()``
projection so it stays in codegen.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

QA_SCHEMA = T.StructType(
    [
        T.StructField("community_id", T.StringType(), False),
        T.StructField("mode", T.StringType(), False),
        T.StructField("question", T.StringType(), False),
        T.StructField("answer", T.StringType(), False),
    ]
)

GENERATION_MODES = ("atomic", "aggregated", "multi_hop", "true_false")


def generate_qa(
    batches: DataFrame, mode: str = "aggregated"
) -> DataFrame:
    """community batches (from community_to_batches) -> QA pairs.

    Deterministic templates per mode:
    - atomic:     one QA per node description
    - aggregated: one QA summarizing the community
    - multi_hop:  one QA per 2-edge path through a shared endpoint
    - true_false: one yes/no QA per edge description
    """
    if mode not in GENERATION_MODES:
        raise ValueError(f"Unknown generation mode: {mode}")

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for cid, node_data, edge_data in zip(
                pdf["community_id"], pdf["node_data"], pdf["edge_data"]
            ):
                nodes = list(node_data) if node_data is not None else []
                edges = list(edge_data) if edge_data is not None else []
                if mode == "atomic":
                    for n in nodes:
                        rows.append(
                            (
                                cid, mode,
                                f"What is known about {n['entity_name']}?",
                                n["description"],
                            )
                        )
                elif mode == "aggregated":
                    names = sorted(n["entity_name"] for n in nodes)
                    facts = sorted(e["description"] for e in edges)
                    if names:
                        rows.append(
                            (
                                cid, mode,
                                "Summarize the relationships among: "
                                + ", ".join(names) + ".",
                                " ".join(facts) if facts else
                                "No relations recorded.",
                            )
                        )
                elif mode == "multi_hop":
                    by_node = {}
                    for e in edges:
                        by_node.setdefault(e["src_id"], []).append(e)
                        by_node.setdefault(e["tgt_id"], []).append(e)
                    for shared, es in sorted(by_node.items()):
                        if len(es) >= 2:
                            e1, e2 = sorted(
                                es, key=lambda x: (x["src_id"], x["tgt_id"])
                            )[:2]
                            rows.append(
                                (
                                    cid, mode,
                                    f"How are the facts about {shared} "
                                    "connected?",
                                    f"{e1['description']} "
                                    f"{e2['description']}",
                                )
                            )
                elif mode == "true_false":
                    for e in edges:
                        rows.append(
                            (
                                cid, mode,
                                f"True or false: {e['description']}",
                                "True",
                            )
                        )
            yield pd.DataFrame(
                rows, columns=["community_id", "mode", "question", "answer"]
            )

    cols = ["community_id", "node_data", "edge_data"]
    return batches.select(*cols).mapInPandas(gen, schema=QA_SCHEMA)


def format_qa(qa: DataFrame, output_data_format: str) -> DataFrame:
    """Pure-projection output formatting (reference
    ``base_generator.format_generation_results``)."""
    if output_data_format == "Alpaca":
        return qa.select(
            F.col("question").alias("instruction"),
            F.lit("").alias("input"),
            F.col("answer").alias("output"),
        )
    if output_data_format == "Sharegpt":
        return qa.select(
            F.array(
                F.struct(
                    F.lit("human").alias("from"),
                    F.col("question").alias("value"),
                ),
                F.struct(
                    F.lit("gpt").alias("from"),
                    F.col("answer").alias("value"),
                ),
            ).alias("conversations")
        )
    if output_data_format == "ChatML":
        return qa.select(
            F.array(
                F.struct(
                    F.lit("user").alias("role"),
                    F.col("question").alias("content"),
                ),
                F.struct(
                    F.lit("assistant").alias("role"),
                    F.col("answer").alias("content"),
                ),
            ).alias("messages")
        )
    if output_data_format == "QA_pairs":
        return qa.select("question", "answer")
    raise ValueError(f"Unknown output data format: {output_data_format}")
