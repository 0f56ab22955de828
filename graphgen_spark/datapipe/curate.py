"""Composed corpus-curation pipeline: filter -> dedup -> sample.

The single-call curation entry a training-data team runs over a raw
crawl dump.  Stages, in the order a 100 TB pass wants them (cheapest
rejection first, every stage a narrow codegen'd expression or one
shuffle):

1. length gate      — whitespace token count in [min_tokens, max_tokens]
2. repetition gate  — distinct/total token ratio, integer
                      cross-multiplied so no float ever enters the
                      contract (hash-proof vs any SQL oracle)
3. language gate    — optional whitelist
4. exact dedup      — md5(text) hash-aggregate, keep min-id copy
5. stratified take  — optional exact per-language k (hash-ordered,
                      reproducible; see datapipe/sampling.py)

Returns BOTH the curated selection and the audit funnel (how many
docs each stage rejected) — the funnel is what a curation run reports
to its data board, and it is derived from the same tagged frames (no
extra passes over the raw text).

Scale notes: stages 1-3 are scan-stage filters (whole-stage codegen,
no shuffle); stage 4 is one hash shuffle on md5(text); stage 5 is one
window shuffle on (lang).  Near-dup removal (MinHash) is deliberately
NOT folded in here — it is orders more expensive and runs as its own
pass (datapipe/dedup.py) between stages 4 and 5 when needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 1_000_000,
    max_repetition_pct: int = 60,
    langs: list[str] | None = None,
    sample_k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> tuple[DataFrame, DataFrame]:
    """Run the curation funnel.

    Returns (curated, funnel):
    - curated: (doc_id, lang, n_tokens, sample_rank) — the surviving
      docs, sample_rank = per-lang position in the deterministic hash
      order (1..k when sample_k is set).
    - funnel: (stage_idx, stage, n_docs) — docs REJECTED per stage,
      plus a final ('kept', survivors) row.  Pure bigints.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    # repetition_ratio > max_pct/100  <=>  distinct*100 < total*(100-max)
    rep_ok = (
        n_distinct * 100 >= n_tokens * (100 - max_repetition_pct)
    )
    len_ok = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    lang_ok = (
        F.lit(True) if langs is None
        else F.col(lang_col).isin(list(langs))
    )

    tagged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        n_tokens.alias("n_tokens"),
        F.md5(F.col(text_col)).alias("text_hash"),
        F.when(~len_ok, F.lit("length"))
        .when(~rep_ok, F.lit("repetition"))
        .when(~lang_ok, F.lit("lang"))
        .alias("row_fail"),
    )

    # ONE pass over the corpus for BOTH outputs (r7): the old funnel
    # unioned (tagged WHERE failed) with (windowed passing rows) —
    # two full scans of the documents table, each paying the
    # tokenize/array_distinct projection.  Instead the windows run
    # over ALL rows with ``row_fail`` prepended to every partition
    # key: passing rows (row_fail NULL) land in exactly the partitions
    # they had before, in the same order, so their dup_rank /
    # sample_rank are unchanged; failing rows rank only against other
    # failing rows and their ranks are never read.  The extra window
    # shuffle volume is the failing rows — narrow ints/strings —
    # while a whole tokenize scan disappears from the funnel plan.
    w_dup = Window.partitionBy("row_fail", "text_hash").orderBy(
        "doc_id"
    )
    deduped = tagged.withColumn(
        "dup_rank", F.row_number().over(w_dup)
    )
    # partition by the keep-flag too: duplicates must not consume
    # sample ranks (row_number counts every partition row, even ones
    # later masked by the WHEN)
    w_sample = Window.partitionBy(
        "row_fail", "lang", (F.col("dup_rank") == 1)
    ).orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    staged = deduped.withColumn(
        "sample_rank",
        F.when(
            F.col("row_fail").isNull() & (F.col("dup_rank") == 1),
            F.row_number().over(w_sample),
        ),
    ).withColumn(
        "stage",
        F.coalesce(
            F.col("row_fail"),
            F.when(F.col("dup_rank") > 1, F.lit("duplicate"))
            .when(
                F.lit(sample_k is not None)
                & (F.col("sample_rank") > F.lit(sample_k or 0)),
                F.lit("sampled_out"),
            )
            .otherwise(F.lit("kept")),
        ),
    )

    curated = staged.where(F.col("stage") == "kept").select(
        "doc_id", "lang", "n_tokens", "sample_rank"
    )

    order = ["length", "repetition", "lang", "duplicate",
             "sampled_out", "kept"]
    stage_idx = F.array_position(
        F.array(*[F.lit(s) for s in order]), F.col("stage")
    ).cast("int")
    funnel = (
        staged.groupBy("stage")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("stage_idx", stage_idx)
        .select("stage_idx", "stage", "n_docs")
    )
    return curated, funnel


def curate_oracle_sql(
    table: str = "documents",
    min_tokens: int = 20,
    max_tokens: int = 1_000_000,
    max_repetition_pct: int = 60,
    langs: list[str] | None = None,
    sample_k: int | None = None,
) -> tuple[str, str]:
    """DuckDB SQL pair (curated, funnel) mirroring curate_corpus over
    a registered view with (doc_id, text, lang)."""
    lang_pred = (
        "TRUE" if langs is None
        else "lang IN (" + ",".join(f"'{x}'" for x in langs) + ")"
    )
    keep_rep = f"nd * 100 >= nt * (100 - {max_repetition_pct})"
    base = rf"""
        WITH t AS (
            SELECT doc_id, lang, md5(text) AS text_hash,
                   len(regexp_split_to_array(trim(text), '\s+')) AS nt,
                   len(list_distinct(
                       regexp_split_to_array(trim(text), '\s+'))) AS nd,
                   {lang_pred} AS lang_ok
            FROM {table}
        ),
        tagged AS (
            SELECT doc_id, lang, text_hash, nt,
                   CASE WHEN nt < {min_tokens} OR nt > {max_tokens}
                            THEN 'length'
                        WHEN NOT ({keep_rep}) THEN 'repetition'
                        WHEN NOT lang_ok THEN 'lang'
                   END AS row_fail
            FROM t
        ),
        passing AS (
            SELECT *, row_number() OVER (
                       PARTITION BY text_hash ORDER BY doc_id
                   ) AS dup_rank
            FROM tagged WHERE row_fail IS NULL
        ),
        staged AS (
            SELECT doc_id, lang, nt AS n_tokens, dup_rank,
                   CASE WHEN dup_rank = 1 THEN row_number() OVER (
                       PARTITION BY lang,
                           CASE WHEN dup_rank = 1 THEN 1 END
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) END AS sample_rank
            FROM passing
        ),
        labeled AS (
            SELECT *,
                   CASE WHEN dup_rank > 1 THEN 'duplicate'
                        WHEN {('sample_rank > ' + str(sample_k))
                             if sample_k is not None else 'FALSE'}
                            THEN 'sampled_out'
                        ELSE 'kept'
                   END AS stage
            FROM staged
        )"""
    curated = base + """
        SELECT doc_id, lang, n_tokens, sample_rank
        FROM labeled WHERE stage = 'kept'
        ORDER BY lang, sample_rank
    """
    order = ["length", "repetition", "lang", "duplicate",
             "sampled_out", "kept"]
    cases = " ".join(
        f"WHEN '{s}' THEN {i + 1}" for i, s in enumerate(order)
    )
    funnel = base + f"""
        , all_stages AS (
            SELECT row_fail AS stage FROM tagged
            WHERE row_fail IS NOT NULL
            UNION ALL SELECT stage FROM labeled
        )
        SELECT CAST(CASE stage {cases} END AS INT) AS stage_idx,
               stage, count(*) AS n_docs
        FROM all_stages GROUP BY stage
        ORDER BY stage_idx
    """
    return curated, funnel
