"""Evaluate operators: triple accuracy (LLM-as-judge) + QA metrics.

Reference surfaces re-expressed Spark-first:

- ``evaluate_triple`` (``operators/evaluate/evaluate_triple.py:7-40``):
  walks the chunk->unit lineage map in the KV store, re-attaches each
  chunk's extracted nodes/edges to the chunk content, and asks an
  LLM-judge for JSON quality scores per chunk
  (``models/evaluator/triple/accuracy_evaluator.py:24-94``: accuracy /
  completeness / precision / overall_score for entities and for
  relations, with a regex JSON-fallback parse).
  Spark mapping: the lineage walk becomes a groupBy(chunk_id) over the
  records table joined back to chunks; the judge is a batched
  responder UDF emitting the same JSON response shape; the parse is
  ``from_json`` JVM-side (regex fallback folded into the responder,
  which is where the reference's malformed-response handling lives).

- ``evaluate_qa`` (``operators/evaluate/evaluate_service.py:45-152``,
  qa target): per-row token-length (``qa/length_evaluator.py:14-19``)
  and MTLD lexical diversity (``qa/mtld_evaluator.py:18-73``) metric
  columns, filterable downstream by the range-filter operator.

The deterministic judge stand-in scores structural agreement between
the chunk text and the extracted units (fraction of entity mentions /
relation endpoints literally present in the chunk) — no network, same
response grammar, stable across parallelism.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ACCURACY_SCHEMA = T.StructType(
    [
        T.StructField("accuracy", T.DoubleType()),
        T.StructField("completeness", T.DoubleType()),
        T.StructField("precision", T.DoubleType()),
        T.StructField("overall_score", T.DoubleType()),
    ]
)

_JUDGED_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("n_entities", T.IntegerType(), False),
        T.StructField("n_relations", T.IntegerType(), False),
        T.StructField("entity_response", T.StringType(), False),
        T.StructField("relation_response", T.StringType(), False),
    ]
)


def _mock_judge_response(content: str, names: list[str]) -> str:
    """Deterministic LLM-judge stand-in: JSON in the exact shape the
    reference expects back (accuracy_evaluator.py:52-61), with scores
    derived from literal mention support of the units in the chunk."""
    if not names:
        return json.dumps(
            {
                "accuracy": 0.0,
                "completeness": 0.0,
                "precision": 0.0,
                "overall_score": 0.0,
            }
        )
    low = content.lower()
    hits = sum(1 for n in names if n and n.lower() in low)
    acc = round(hits / len(names), 6)
    comp = round(min(1.0, len(names) / 8.0), 6)
    overall = round((acc + comp + acc) / 3.0, 6)
    return json.dumps(
        {
            "accuracy": acc,
            "completeness": comp,
            "precision": acc,
            "overall_score": overall,
        }
    )


def evaluate_triples(
    chunks: DataFrame,
    records: DataFrame,
    responder: Callable[[str, list, list], tuple] | None = None,
) -> DataFrame:
    """Per-chunk extraction-quality scores.

    chunks(chunk_id, content, ...) x records(chunk_id, kind, f1,f2,f3)
    -> (chunk_id, url, n_entities, n_relations,
        entity_accuracy struct, relation_accuracy struct)

    The chunk->unit lineage join is relational (no KV walk); the judge
    runs batched per chunk group inside one Python hop.
    """
    units = (
        records.where(F.col("kind").isin("entity", "relationship"))
        .groupBy("chunk_id")
        .agg(
            F.collect_list(
                F.when(F.col("kind") == "entity", F.col("f1"))
            ).alias("entity_names"),
            F.collect_list(
                F.when(F.col("kind") == "relationship",
                       F.concat_ws("\x1f", "f1", "f2"))
            ).alias("relation_pairs"),
        )
    )
    joined = chunks.select("chunk_id", "url", "content").join(
        units, "chunk_id", "inner"
    )

    def judge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, url, content, ents, rels in zip(
                pdf["chunk_id"], pdf["url"], pdf["content"],
                pdf["entity_names"], pdf["relation_pairs"],
            ):
                ents = [e for e in list(ents) if e]
                endpoints = []
                for pair in list(rels):
                    if pair:
                        endpoints.extend(pair.split("\x1f"))
                if responder is not None:
                    e_resp, r_resp = responder(content, ents, endpoints)
                else:
                    e_resp = _mock_judge_response(content, ents)
                    r_resp = _mock_judge_response(content, endpoints)
                rows.append(
                    (cid, url, len(ents), len(endpoints) // 2,
                     e_resp, r_resp)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "chunk_id", "url", "n_entities", "n_relations",
                    "entity_response", "relation_response",
                ],
            )

    judged = joined.mapInPandas(judge, schema=_JUDGED_SCHEMA)
    return judged.select(
        "chunk_id",
        "url",
        "n_entities",
        "n_relations",
        F.from_json("entity_response", ACCURACY_SCHEMA).alias(
            "entity_accuracy"
        ),
        F.from_json("relation_response", ACCURACY_SCHEMA).alias(
            "relation_accuracy"
        ),
    )


def with_reward_score(
    qa: DataFrame,
    question_col: str = "question",
    answer_col: str = "answer",
) -> DataFrame:
    """Deterministic stand-in for the reference RewardEvaluator
    (``models/evaluator/qa/reward_evaluator.py:46-72``: one float
    ``reward_score`` per pair from a cross-encoder logit).  The
    stand-in derives the score from the same signals a reward model
    responds to — answer length sweet spot and question/answer lexical
    overlap — as a native expression (no model, no Python):

        reward = ln(1 + n_ans) - 0.5*|n_ans - 40|/40 + overlap
    """
    a_toks = F.array_distinct(
        F.split(F.trim(F.col(answer_col)), r"\s+")
    )
    q_toks = F.array_distinct(
        F.split(F.trim(F.col(question_col)), r"\s+")
    )
    n_ans = F.size(F.split(F.trim(F.col(answer_col)), r"\s+"))
    overlap = F.size(F.array_intersect(q_toks, a_toks)) / F.size(
        F.array_union(q_toks, a_toks)
    )
    score = (
        F.log(F.lit(1.0) + n_ans)
        - F.lit(0.5) * F.abs(n_ans - F.lit(40.0)) / F.lit(40.0)
        + overlap
    )
    return qa.withColumn("reward_score", F.round(score, 6))


def with_uni_scores(
    qa: DataFrame,
    question_col: str = "question",
    answer_col: str = "answer",
) -> DataFrame:
    """Deterministic stand-in for the reference UniEvaluator
    (``models/evaluator/qa/uni_evaluator.py:9-117``: yes/no-probability
    scores per dimension, in [0,1]):

    - naturalness:        peaked where avg word length is prose-like
    - coherence:          question/answer lexical overlap (the UniEval
                          coherence prompt conditions on the history)
    - understandability:  penalizes long/opaque tokens

    All native expressions, all bounded to [0,1] like the reference's
    probabilities."""
    toks = F.split(F.trim(F.col(answer_col)), r"\s+")
    avg_wlen = F.length(F.trim(F.col(answer_col))) / F.size(toks)
    q_toks = F.array_distinct(
        F.split(F.trim(F.col(question_col)), r"\s+")
    )
    a_toks = F.array_distinct(toks)
    coherence = F.size(F.array_intersect(q_toks, a_toks)) / F.size(
        F.array_union(q_toks, a_toks)
    )
    naturalness = F.lit(1.0) / (
        F.lit(1.0) + F.exp(F.abs(avg_wlen - F.lit(5.0)) - F.lit(3.0))
    )
    understandability = F.lit(1.0) - F.least(
        avg_wlen / F.lit(15.0), F.lit(1.0)
    )
    return (
        qa.withColumn("naturalness", F.round(naturalness, 6))
        .withColumn("coherence", F.round(coherence, 6))
        .withColumn("understandability", F.round(understandability, 6))
    )


def evaluate_qa(
    qa: DataFrame,
    answer_col: str = "answer",
    question_col: str = "question",
) -> DataFrame:
    """QA metric columns: token length + MTLD (order-dependent scan,
    hence a pandas UDF per row) + the reward / UniEval stand-in scores
    — the qa-target half of the reference evaluate service; feed into
    the range-filter operator."""
    from graphgen_spark.datapipe.textstats import mtld_udf

    out = qa.withColumn(
        "answer_tokens",
        F.size(F.split(F.trim(F.col(answer_col)), r"\s+")),
    ).withColumn("mtld", mtld_udf(answer_col))
    if question_col in qa.columns:
        out = with_reward_score(out, question_col, answer_col)
        out = with_uni_scores(out, question_col, answer_col)
    return out
