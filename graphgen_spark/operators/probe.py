"""Quiz/judge: comprehension-loss probing as vectorized UDF stages.

Reference flow: QuizService rephrases each node/edge description into
yes/no statements (``operators/quiz/quiz_service.py:27-91``: per
quiz_samples i — i>0 adds a TEMPLATE/yes task, every i adds an
ANTI_TEMPLATE/no task); JudgeService asks a trainee LLM for top-k
yes/no logprobs and computes ``yes_no_loss_entropy`` = mean −log
p(correct) (``operators/judge/judge_service.py:30-86``,
``utils/calculate_confidence.py:148-159``), then writes the loss back
onto the node/edge via the storage actor.

Here: the rephraser and the trainee are deterministic no-network
stand-ins (template prefixes; a hash-derived yes-probability), the
loss lands via a groupBy + join instead of actor mutation.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

QUIZ_SCHEMA = T.StructType(
    [
        T.StructField("index_kind", T.StringType(), False),   # 'node'|'edge'
        T.StructField("index_a", T.StringType(), False),      # name | src
        T.StructField("index_b", T.StringType(), True),       # NULL | tgt
        T.StructField("description", T.StringType(), False),
        T.StructField("quiz", T.StringType(), False),
        T.StructField("ground_truth", T.StringType(), False),
    ]
)


def _quiz_rows(kind, a, b, desc, quiz_samples):
    """Reference task expansion (quiz_service.py:31-35): sample 0 adds
    an anti-statement; every further sample adds (statement, anti)."""
    rows = []
    for i in range(quiz_samples):
        if i > 0:
            rows.append(
                (kind, a, b, desc, f"Restated: {desc}", "yes")
            )
        rows.append(
            (kind, a, b, desc, f"Contradicted: {desc}", "no")
        )
    return rows


def quiz(nodes: DataFrame, edges: DataFrame, quiz_samples: int = 2) -> DataFrame:
    """nodes+edges -> exploded quiz statements with ground truth."""

    def gen_nodes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name, desc in zip(pdf["entity_name"], pdf["description"]):
                if desc:
                    rows.extend(
                        _quiz_rows("node", name, None, desc, quiz_samples)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in QUIZ_SCHEMA])

    def gen_edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for s, t, desc in zip(
                pdf["src_id"], pdf["tgt_id"], pdf["description"]
            ):
                if desc:
                    rows.extend(
                        _quiz_rows("edge", s, t, desc, quiz_samples)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in QUIZ_SCHEMA])

    qn = nodes.select("entity_name", "description").mapInPandas(
        gen_nodes, schema=QUIZ_SCHEMA
    )
    qe = edges.select("src_id", "tgt_id", "description").mapInPandas(
        gen_edges, schema=QUIZ_SCHEMA
    )
    return qn.unionByName(qe)


def _mock_topk_candidates(statement: str) -> list:
    """Deterministic trainee stand-in: top-k (token, prob) over yes/no
    synonyms + an uncertain token, hash-derived per statement —
    the exact payload shape ``generate_topk_per_token`` returns in the
    reference (``judge_service.py:33-38``)."""
    import hashlib

    h = int.from_bytes(
        hashlib.blake2b(statement.encode(), digest_size=8).digest(), "big"
    )
    base = 0.05 + 0.9 * ((h % 10_000) / 10_000)
    if statement.startswith("Contradicted:"):
        base = 1.0 - base * 0.7
    p_yes = base * 0.8
    p_yeah = base * 0.2
    rest = 1.0 - base
    return [
        ("yes", p_yes),
        ("yeah", p_yeah),
        ("no", rest * 0.9),
        ("hmm", rest * 0.1),
    ]


@F.pandas_udf(T.DoubleType())
def judge_loss_udf(quiz: pd.Series, ground_truth: pd.Series) -> pd.Series:
    """Per-statement −log p(correct) with yes/no synonym-mass
    normalization (reference ``yes_no_loss_entropy`` +
    ``_normalize_yes_no``, ``utils/calculate_confidence.py:52-159``)."""
    from graphgen_spark.confidence import yes_no_loss_entropy

    return pd.Series(
        [
            yes_no_loss_entropy([_mock_topk_candidates(q)], [g])
            for q, g in zip(quiz, ground_truth)
        ]
    )


def judge(quizzes: DataFrame) -> DataFrame:
    """quiz rows -> per-unit mean comprehension loss
    (index_kind, index_a, index_b, loss)."""
    scored = quizzes.withColumn(
        "stmt_loss", judge_loss_udf("quiz", "ground_truth")
    )
    return scored.groupBy("index_kind", "index_a", "index_b").agg(
        F.avg("stmt_loss").alias("loss"),
        F.count(F.lit(1)).alias("n_statements"),
    )


def attach_losses(
    nodes: DataFrame, edges: DataFrame, losses: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Join losses back onto nodes/edges (replaces the reference's
    storage-actor update, ``judge_service.py:66-80``); unprobed units
    keep the reference default −log(0.1)."""
    default = float(-math.log(0.1))
    nl = losses.where(F.col("index_kind") == "node").select(
        F.col("index_a").alias("entity_name"), "loss"
    )
    el = losses.where(F.col("index_kind") == "edge").select(
        F.col("index_a").alias("src_id"),
        F.col("index_b").alias("tgt_id"),
        "loss",
    )
    nodes_out = nodes.join(nl, "entity_name", "left").withColumn(
        "loss", F.coalesce("loss", F.lit(default))
    )
    edges_out = edges.join(el, ["src_id", "tgt_id"], "left").withColumn(
        "loss", F.coalesce("loss", F.lit(default))
    )
    return nodes_out, edges_out
