"""QA generation per community + output-format projections.

Reference: GenerateService drives an LLM per community batch in 10
modes (``operators/generate/generate_service.py:30-115``); the output
formatting is a pure projection (``bases/base_generator.py:43-83``:
Alpaca / Sharegpt / ChatML / QA_pairs).

Here each generator is a deterministic no-network stand-in (template
QA over the community's node/edge payloads) that emits the SAME row
shape the reference parsers produce:

- atomic / aggregated / multi_hop / true_false: {question, answer}
  (``atomic_generator.py`` etc.)
- cot: {question, answer, reasoning_path} (``cot_generator.py:70-97``)
- vqa: {question, answer, img_path} (``vqa_generator.py:78-90``)
- multi_choice: {question, options, answer=letter}
  (``multi_choice_generator.py:15-92``)
- multi_answer: {question, options, answer=letters}
  (``multi_answer_generator.py``)
- fill_in_blank: {question, answer, answers}
  (``fill_in_blank_generator.py:15-75``)
- masked_fill_in_blank: {question=masked context, answer=surface form}
  (``masked_fill_in_blank_generator.py:86-135``: rephrase then mask one
  node name; mask-miss rows are skipped like the reference's
  regex-match failure path)
- quiz: {question=rephrased description, answer=entity name}
  (``quiz_generator.py``)

Formatting stays a native ``struct()`` projection (codegen).
"""

from __future__ import annotations

import hashlib
import re
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
        # mode-specific extras (null where a mode doesn't emit them)
        T.StructField("options", T.ArrayType(T.StringType()), True),
        T.StructField("answers", T.ArrayType(T.StringType()), True),
        T.StructField("reasoning_path", T.StringType(), True),
        T.StructField("img_path", T.StringType(), True),
    ]
)

GENERATION_MODES = (
    "atomic", "aggregated", "multi_hop", "true_false",
    "cot", "vqa", "multi_choice", "multi_answer",
    "fill_in_blank", "masked_fill_in_blank", "quiz",
)

_LETTERS = "ABCD"


def _qa(cid, mode, question, answer, options=None, answers=None,
        reasoning_path=None, img_path=None):
    return (cid, mode, question, answer, options, answers,
            reasoning_path, img_path)


def _mask_first(text: str, name: str, placeholder: str):
    """Case-insensitive first-occurrence mask; returns (masked, surface)
    or None on miss (the reference's regex-failure skip path)."""
    m = re.search(re.escape(name), text, re.IGNORECASE)
    if not m:
        return None
    return text[: m.start()] + placeholder + text[m.end():], m.group(0)


def _gen_rows(cid, nodes, edges, mode, num_of_questions):
    """All rows for one community; inputs pre-sorted for determinism."""
    rows = []
    names = [n["entity_name"] for n in nodes]
    if mode == "atomic":
        for n in nodes:
            rows.append(_qa(
                cid, mode,
                f"What is known about {n['entity_name']}?",
                n["description"],
            ))
    elif mode == "aggregated":
        facts = [e["description"] for e in edges]
        if names:
            rows.append(_qa(
                cid, mode,
                "Summarize the relationships among: "
                + ", ".join(names) + ".",
                " ".join(facts) if facts else "No relations recorded.",
            ))
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
                rows.append(_qa(
                    cid, mode,
                    f"How are the facts about {shared} connected?",
                    f"{e1['description']} {e2['description']}",
                ))
    elif mode == "true_false":
        for e in edges:
            rows.append(_qa(
                cid, mode, f"True or false: {e['description']}", "True",
            ))
    elif mode == "cot":
        # two-step reference flow (design template -> reasoned answer)
        # collapsed into one deterministic template: the reasoning path
        # enumerates the community's relations in sorted order
        if not edges:
            return rows
        facts = [e["description"] for e in edges]
        reasoning = "\n".join(
            f"Step {i + 1}: {d}" for i, d in enumerate(facts)
        )
        rows.append(_qa(
            cid, mode,
            "What can be concluded about "
            + ", ".join(names) + "?",
            "Following the reasoning path: " + " ".join(facts)
            + " Therefore these entities form one connected context.",
            reasoning_path=reasoning,
        ))
    elif mode == "vqa":
        # reference attaches the image path from node metadata
        # (vqa_generator.py:78-90); the MM KG path materializes IMAGE
        # nodes whose media path is a pure function of the node name
        for n in nodes:
            if n["entity_type"] != "IMAGE":
                continue
            img = "media/" + n["entity_name"].lower().replace(" ", "_")
            rows.append(_qa(
                cid, mode,
                f"What does the image {n['entity_name']} depict?",
                n["description"],
                img_path=img,
            ))
    elif mode == "multi_choice":
        # per edge: mask the target entity in the relation sentence,
        # distract with other community entity names
        for e in edges[:num_of_questions]:
            correct = e["tgt_id"]
            masked = _mask_first(e["description"], correct, "______")
            if masked is None:
                continue
            distractors = [
                n for n in names if n not in (e["src_id"], correct)
            ][:3]
            if len(distractors) < 3:
                continue
            cands = sorted([correct] + distractors)
            options = [
                f"{_LETTERS[i]}. {c}" for i, c in enumerate(cands)
            ]
            letter = _LETTERS[cands.index(correct)]
            rows.append(_qa(
                cid, mode,
                "Complete the statement: " + masked[0],
                letter, options=options,
            ))
    elif mode == "multi_answer":
        adj = {}
        for e in edges:
            adj.setdefault(e["src_id"], set()).add(e["tgt_id"])
            adj.setdefault(e["tgt_id"], set()).add(e["src_id"])
        count = 0
        for name in names:
            if count >= num_of_questions:
                break
            neigh = sorted(adj.get(name, ()))[:3]
            if len(neigh) < 2:
                continue
            distractors = [
                n for n in names
                if n != name and n not in adj.get(name, ())
            ][: 4 - len(neigh)]
            if len(neigh) + len(distractors) < 4:
                continue
            cands = sorted(neigh + distractors)
            options = [
                f"{_LETTERS[i]}. {c}" for i, c in enumerate(cands)
            ]
            letters = [
                _LETTERS[cands.index(c)] for c in neigh
            ]
            letters.sort()
            rows.append(_qa(
                cid, mode,
                f"Which of the following are directly related to {name}?",
                ", ".join(letters), options=options, answers=letters,
            ))
            count += 1
    elif mode == "fill_in_blank":
        for e in edges[:num_of_questions]:
            masked = _mask_first(e["description"], e["tgt_id"], "____")
            if masked is None:
                continue
            rows.append(_qa(
                cid, mode, masked[0], masked[1], answers=[masked[1]],
            ))
    elif mode == "masked_fill_in_blank":
        # reference: rephrase the batch, then mask one node name chosen
        # at random (seeded); here the choice is a hash of the
        # community id so it is stable across partitions and runs.
        # md5-prefix int, not crc32: the same idiom the MinHash kernel
        # uses, portable to any engine (DuckDB:
        # ('0x'||substr(md5(cid),1,8))::BIGINT) so the mode is
        # oracle-checkable like its 9 siblings.
        if not nodes or not edges:
            return rows
        context = " ".join(e["description"] for e in edges)
        pick = int.from_bytes(
            hashlib.md5(cid.encode()).digest()[:4], "big"
        ) % len(nodes)
        name = nodes[pick]["entity_name"]
        m = re.search(re.escape(name), context, re.IGNORECASE)
        if not m:
            return rows
        surface = m.group(0)
        masked = re.sub(
            re.escape(name), "{ }", context, flags=re.IGNORECASE
        )
        rows.append(_qa(cid, mode, masked, surface))
    elif mode == "quiz":
        for n in nodes:
            masked = _mask_first(n["description"], n["entity_name"],
                                 "<entity>")
            if masked is None:
                q = n["description"] + " — name the entity."
            else:
                q = "Which entity is described here? " + masked[0]
            rows.append(_qa(cid, mode, q, n["entity_name"]))
    return rows


def generate_qa(
    batches: DataFrame, mode: str = "aggregated",
    num_of_questions: int = 5,
) -> DataFrame:
    """community batches (from community_to_batches) -> QA pairs in
    ``mode`` (one of GENERATION_MODES; see module docstring for the
    per-mode row shapes and reference files)."""
    if mode not in GENERATION_MODES:
        raise ValueError(f"Unknown generation mode: {mode}")

    def gen(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for cid, node_data, edge_data in zip(
                pdf["community_id"], pdf["node_data"], pdf["edge_data"]
            ):
                nodes = sorted(
                    (list(node_data) if node_data is not None else []),
                    key=lambda n: n["entity_name"],
                )
                edges = sorted(
                    (list(edge_data) if edge_data is not None else []),
                    key=lambda e: (e["src_id"], e["tgt_id"],
                                   e["description"]),
                )
                rows.extend(
                    _gen_rows(cid, nodes, edges, mode, num_of_questions)
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in QA_SCHEMA.fields],
            )

    cols = ["community_id", "node_data", "edge_data"]
    return batches.select(*cols).mapInPandas(gen, schema=QA_SCHEMA)


def format_qa(
    qa: DataFrame, output_data_format: str, vqa: bool = False
) -> DataFrame:
    """Pure-projection output formatting (reference
    ``base_generator.format_generation_results``; ``vqa=True`` adds the
    image path fields the VQA formatter emits,
    ``vqa_generator.format_generation_results``)."""
    has_img = vqa and "img_path" in qa.columns
    if output_data_format == "Alpaca":
        out = qa.select(
            F.col("question").alias("instruction"),
            F.lit("").alias("input"),
            F.col("answer").alias("output"),
            *([F.col("img_path").alias("image")] if has_img else []),
        )
        return out
    if output_data_format == "Sharegpt":
        return qa.select(
            F.array(
                F.struct(
                    F.lit("human").alias("from"),
                    F.col("question").alias("value"),
                    *([F.col("img_path").alias("image")]
                      if has_img else []),
                ),
                F.struct(
                    F.lit("gpt").alias("from"),
                    F.col("answer").alias("value"),
                    *([F.lit(None).cast("string").alias("image")]
                      if has_img else []),
                ),
            ).alias("conversations")
        )
    if output_data_format == "ChatML":
        return qa.select(
            F.array(
                F.struct(
                    F.lit("user").alias("role"),
                    F.col("question").alias("content"),
                    *([F.col("img_path").alias("image")]
                      if has_img else []),
                ),
                F.struct(
                    F.lit("assistant").alias("role"),
                    F.col("answer").alias("content"),
                    *([F.lit(None).cast("string").alias("image")]
                      if has_img else []),
                ),
            ).alias("messages")
        )
    if output_data_format == "QA_pairs":
        return qa.select("question", "answer")
    raise ValueError(f"Unknown output data format: {output_data_format}")
