"""Distributed graph metrics over the KG edge tables.

The reference's graph analytics stop at degree/coverage statistics
(graphgen/operators/evaluate/evaluate_kg.py, storage adjacency walks);
a 100 TB KG needs the classic whole-graph metrics too, expressed as
DataFrame joins so Catalyst/AQE schedule them:

- ``pagerank_exact``  — iterative importance, GraphX-style per-node
  form (rank = 0.15 + 0.85 * sum(neighbor_rank / neighbor_deg)),
  computed ENTIRELY in scaled integer arithmetic (bigint micros,
  floor division) so the result is bit-identical on every engine,
  partitioning, and summation order — it hash-matches a DuckDB oracle
  that unrolls the same iterations as chained CTEs.
- ``triangle_counts`` — per-node triangle participation + local
  clustering coefficient (also emitted in exact micros), via two
  ordered self-joins on the canonical (src<dst) pair table: each
  triangle a<b<c is enumerated exactly once, never 6 times.

Scale notes (100 TB KG, ~1e9 nodes):
- PageRank is K rounds of (edges ⋈ ranks) -> hash-agg on dst.  The
  edge table is re-used every round, so it is persisted once and the
  per-round lineage is cut with localCheckpoint — K independent
  shuffle stages, not one 2K-join mega-plan.  AQE handles hub skew
  (the hot dst keys) via skew-join splitting; the sum is a LongType
  hash aggregate with map-side partial aggregation.
- Integer headroom: rank ~ SCALE (1e6); the pre-division product is
  bounded by damping_micro * N * SCALE.  For N up to ~1e7 nodes that
  fits int64 with SCALE=1e6; for 1e9-node graphs drop SCALE to 1e4
  (still 4 exact decimal digits) — the contract stays exact, only the
  resolution changes.
- Triangle counting joins the pair table to itself twice; the first
  join is on the LOW endpoint (hub fan-out), so the pair table is
  repartitioned by its join key once and reused.  Cost is
  sum(deg^2)-shaped, the standard lower bound for exact enumeration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rank unit: 1.0 == 1e6 micros
DAMPING_MICRO = 850_000  # 0.85


def _canonical_pairs(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Distinct undirected canonical pairs (lo < hi); self-loops
    dropped.  Accepts either pre-canonicalized merged edges or a raw
    mention-level pair list."""
    lo = F.least(F.col(src_col), F.col(dst_col))
    hi = F.greatest(F.col(src_col), F.col(dst_col))
    return (
        edges.select(lo.alias("lo"), hi.alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )


def pagerank_exact(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    scale: int = SCALE,
    damping_micro: int = DAMPING_MICRO,
) -> DataFrame:
    """Exact-integer PageRank over an undirected edge list.

    Returns (entity, deg, rank_micro): rank after ``iterations``
    synchronous rounds of

        rank'(v) = (scale - damping_micro)
                   + (damping_micro * sum_{u~v} (rank(u) DIV deg(u)))
                     DIV scale

    with every division a floor division over int64 — no floats touch
    the computation, so the output is independent of partitioning,
    summation order, and engine (Spark and DuckDB produce identical
    bigints).  Nodes are the edge-incident entities (deg >= 1 by
    construction; isolated nodes have no edges to rank over).
    """
    spark = edges.sparkSession
    # pin the pair table: it feeds both union branches, the degree
    # table, and the final join — without this the upstream plan
    # (possibly a whole extraction pipeline) re-runs per reference
    pairs = _canonical_pairs(edges, src_col, dst_col).localCheckpoint(
        eager=True
    )
    und = pairs.select(
        F.col("lo").alias("src"), F.col("hi").alias("dst")
    ).unionByName(
        pairs.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # the per-round join re-reads (und ⋈ deg): compute once, pin it
    und_deg = (
        und.join(deg, "src")
        .select("src", "dst", "deg")
        .localCheckpoint(eager=True)
    )

    base = scale - damping_micro
    ranks = deg.select(
        F.col("src").alias("entity"),
        F.lit(int(scale)).cast("long").alias("rank_micro"),
    ).localCheckpoint(eager=True)

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    for _ in range(iterations):
        contribs = und_deg.join(
            ranks, und_deg["src"] == ranks["entity"]
        ).select(
            F.col("dst"),
            F.expr("rank_micro div deg").alias("contrib"),
        )
        ranks = (
            contribs.groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("dst").alias("entity"),
                (
                    F.lit(int(base))
                    + F.expr(f"({damping_micro} * s) div {scale}")
                )
                .cast("long")
                .alias("rank_micro"),
            )
            # cut lineage each round: K flat stages, not a 2K-join plan
            .repartition(n_part, "entity")
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(
            deg.select(F.col("src").alias("entity"), "deg"), "entity"
        ).select("entity", "deg", "rank_micro")
    )


def pagerank_oracle_sql(
    triples_cte: str,
    iterations: int = 5,
    scale: int = SCALE,
    damping_micro: int = DAMPING_MICRO,
) -> str:
    """DuckDB SQL computing the SAME exact-integer PageRank, with the
    iterations unrolled as chained CTEs (fixed small K, so unrolling
    beats a recursive CTE and sidesteps aggregate-in-recursion limits).
    ``triples_cte`` must be a WITH-clause prefix defining ``triples``
    with columns (subj, obj)."""
    base = scale - damping_micro
    sql = f"""{triples_cte},
        pairs AS (
            SELECT DISTINCT least(subj, obj) AS lo,
                            greatest(subj, obj) AS hi
            FROM triples WHERE subj <> obj
        ),
        und AS (
            SELECT lo AS src, hi AS dst FROM pairs
            UNION ALL
            SELECT hi AS src, lo AS dst FROM pairs
        ),
        deg AS (
            SELECT src AS entity, count(*) AS deg FROM und GROUP BY src
        ),
        r0 AS (
            SELECT entity, CAST({scale} AS BIGINT) AS rank_micro
            FROM deg
        )"""
    for i in range(1, iterations + 1):
        sql += f""",
        r{i} AS (
            SELECT u.dst AS entity,
                   CAST({base} + ({damping_micro} * sum(
                       r.rank_micro // g.deg)) // {scale} AS BIGINT)
                       AS rank_micro
            FROM und u
            JOIN r{i - 1} r ON u.src = r.entity
            JOIN deg g ON u.src = g.entity
            GROUP BY u.dst
        )"""
    sql += f"""
        SELECT r.entity, g.deg, r.rank_micro
        FROM r{iterations} r JOIN deg g ON r.entity = g.entity
        ORDER BY r.entity
    """
    return sql


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle participation and local clustering
    coefficient over the undirected canonical pair table.

    Each triangle a<b<c is found once via (a,b) ⋈ (b,c) ⋈ (a,c) on the
    ordered pairs, then credited to all three corners.  Returns
    (entity, deg, n_triangles, clustering_micro) with
    clustering_micro = (2e6 * n_triangles) DIV (deg*(deg-1)) — exact
    integer, engine-portable like pagerank_exact."""
    pairs = _canonical_pairs(edges, src_col, dst_col).localCheckpoint(
        eager=True
    )
    ab = pairs.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = pairs.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = pairs.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"]).select("a", "b", "c")
    corner = (
        tri.select(F.col("a").alias("entity"))
        .unionByName(tri.select(F.col("b").alias("entity")))
        .unionByName(tri.select(F.col("c").alias("entity")))
        .groupBy("entity")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    und = pairs.select(F.col("lo").alias("entity")).unionByName(
        pairs.select(F.col("hi").alias("entity"))
    )
    deg = und.groupBy("entity").agg(F.count(F.lit(1)).alias("deg"))
    return (
        deg.join(corner, "entity", "left")
        .select(
            "entity",
            "deg",
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
            F.when(
                F.col("deg") > 1,
                F.expr(
                    "(2000000 * coalesce(n_triangles, 0)) "
                    "div (deg * (deg - 1))"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("clustering_micro"),
        )
    )


def triangle_oracle_sql(triples_cte: str) -> str:
    """DuckDB SQL for the same per-node triangle/clustering metrics.
    ``triples_cte`` as in pagerank_oracle_sql."""
    return f"""{triples_cte},
        pairs AS (
            SELECT DISTINCT least(subj, obj) AS lo,
                            greatest(subj, obj) AS hi
            FROM triples WHERE subj <> obj
        ),
        tri AS (
            SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
            FROM pairs ab
            JOIN pairs bc ON ab.hi = bc.lo
            JOIN pairs ac ON ac.lo = ab.lo AND ac.hi = bc.hi
        ),
        corner AS (
            SELECT entity, count(*) AS n_triangles FROM (
                SELECT a AS entity FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY entity
        ),
        deg AS (
            SELECT entity, count(*) AS deg FROM (
                SELECT lo AS entity FROM pairs
                UNION ALL SELECT hi FROM pairs
            ) GROUP BY entity
        )
        SELECT d.entity, d.deg,
               CAST(coalesce(c.n_triangles, 0) AS BIGINT)
                   AS n_triangles,
               CAST(CASE WHEN d.deg > 1 THEN
                   (2000000 * coalesce(c.n_triangles, 0))
                       // (d.deg * (d.deg - 1))
                   ELSE 0 END AS BIGINT) AS clustering_micro
        FROM deg d LEFT JOIN corner c ON d.entity = c.entity
        ORDER BY d.entity
    """
