"""Deterministic corpus-curation sampling for training-data pipelines.

Web-scale corpus assembly needs reproducible subsetting — the same
sample at any parallelism, resumable, auditable.  Spark's native
``sample``/``sampleBy`` are seeded-approximate (per-partition
Bernoulli), so these operators instead order by a content-derived hash
(md5 — stable across engines, so each has a DuckDB oracle) and cut
exactly:

- ``stratified_take``   — exactly k docs per stratum (e.g. per lang)
- ``token_budget_take`` — docs in hash order until a per-stratum token
                          budget is exhausted (the "N tokens per
                          language" curation rule)
- ``per_host_cap``      — at most k docs per url host (anti-spam /
                          domain-diversity rule)

All are window functions over a hash order: one shuffle per stratum
key, no driver involvement, deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(id_col: str) -> Column:
    """Engine-portable deterministic order key: md5 of the id."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_take(
    docs: DataFrame, k: int, stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(k, |stratum|) docs per stratum, hash-ordered — the
    exact counterpart of ``sampleBy`` for reproducible eval splits."""
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_order(id_col), F.col(id_col)
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def token_budget_take(
    docs: DataFrame, budget_tokens: int, stratum_col: str = "lang",
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Docs in hash order until the stratum's cumulative whitespace
    token count reaches the budget.  The doc that CROSSES the budget is
    kept (budgets are lower bounds, matching how corpus specs are
    written: 'at least N tokens per language')."""
    # r7: token count materialized as a column BELOW the window, so
    # (a) the budget filter references the attribute instead of
    # re-evaluating the split expression above the window and (b) the
    # window shuffle carries a long instead of the full text when the
    # caller prunes text downstream.  cum/filter arithmetic unchanged.
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_order(id_col), F.col(id_col)
    )
    cum = F.sum(F.col("_n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("_n_tokens", n_tokens)
        .withColumn("cum_tokens", cum)
        .where(
            (F.col("cum_tokens") - F.col("_n_tokens"))
            < F.lit(budget_tokens)
        )
        .drop("_n_tokens")
    )


def per_host_cap(
    pages: DataFrame, k: int, url_col: str = "url",
) -> DataFrame:
    """At most k pages per host (domain-diversity cap): hash-ordered
    row_number inside each host partition.  Hot hosts are exactly the
    skewed keys — the window shuffle on host is salting-free because
    row_number needs the full partition anyway; AQE splits stragglers."""
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)/", 1)
    w = Window.partitionBy("host").orderBy(
        _hash_order(url_col), F.col(url_col)
    )
    return (
        pages.withColumn("host", host)
        .withColumn("host_rank", F.row_number().over(w))
        .where(F.col("host_rank") <= k)
    )
