"""Entity linking against a candidate alias dictionary.

north_rule requirement: "entity linking and canonicalization via salted
broadcast-hash join against a candidate dictionary".  The reference has
no linking step (names ARE canonical after clean_str+UPPER,
``graphgen/utils/format.py:45,70-71``); this operator is the scale-path
addition: mention surface forms map to canonical entity ids through a
broadcast dictionary.

Skew notes (100 TB story): the PROBE side (mentions) is hash-partitioned
by the join key; a broadcast-hash join never shuffles the probe side, so
hot aliases cost nothing extra at join time.  Skew bites in the
FOLLOW-UP aggregation by canonical_id — ``salted_agg_counts`` does the
classic two-phase salted partial aggregate for that, and AQE skew-join
covers the sort-merge fallback when the dictionary outgrows the
broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_entities(
    mentions: DataFrame,
    alias_dict: DataFrame,
    mention_col: str = "entity_name",
    use_broadcast: bool = True,
) -> DataFrame:
    """mentions + alias_dict(alias_norm, canonical_id, canonical_name)
    -> mentions + (canonical_id, canonical_name); unlinked mentions keep
    canonical_id NULL and fall back to their own surface form."""
    dict_df = alias_dict.select(
        F.col("alias_norm"), F.col("canonical_id"), F.col("canonical_name")
    )
    if use_broadcast:
        dict_df = F.broadcast(dict_df)
    linked = mentions.join(
        dict_df, mentions[mention_col] == dict_df.alias_norm, "left"
    ).drop("alias_norm")
    return linked.withColumn(
        "canonical_name",
        F.coalesce(F.col("canonical_name"), F.col(mention_col)),
    )


def salted_agg_counts(
    df: DataFrame,
    key_col: str,
    n_salts: int = 32,
    count_col: str = "cnt",
) -> DataFrame:
    """Two-phase salted aggregation for Zipf-hot keys: partial count by
    (key, random salt), then final sum by key.  The first shuffle
    spreads a hot key over ``n_salts`` reducers; the second is tiny."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(key_col).agg(
        F.sum("_partial").alias(count_col)
    )


def build_alias_dict_from_nodes(nodes: DataFrame) -> DataFrame:
    """Derive a deterministic candidate dictionary from observed node
    names when no external dictionary is supplied: each distinct
    entity_name is its own canonical candidate keyed by xxhash64 —
    ambiguous aliases resolve to the MIN canonical id (stable rule)."""
    return (
        nodes.select(F.col("entity_name").alias("alias_norm"))
        .distinct()
        .withColumn("canonical_id", F.xxhash64("alias_norm"))
        .withColumn("canonical_name", F.col("alias_norm"))
    )
