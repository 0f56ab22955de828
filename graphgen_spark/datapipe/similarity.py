"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k of every query against the
  corpus — broadcast the (small) query set, native ``zip_with`` +
  ``aggregate`` dot products (JVM-side, no Python), window top-k.
- ``lsh_topk``: the scale path — random-hyperplane signatures bucket
  both sides; only same-bucket candidates are scored.  Probing several
  buckets (multi-probe via reduced plane count) trades recall/cost.
- ``ivf_topk``: IVF-style — k seeded centroids (deterministic), every
  vector assigned to its nearest centroid, queries probe ``nprobe``
  nearest centroid cells only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Native dot product over two array columns (codegen'd zip_with +
    aggregate left fold, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    """Euclidean norm of an array column — the exact left-fold sum of
    squares ``cosine_expr`` uses, factored out so callers can compute
    it ONCE per row instead of once per scored pair (r7: the norm is
    2/3 of every pairwise cosine's flops; precomputing it per side is
    float-identical because the fold order and the final
    dot/(na*nb) arithmetic are unchanged)."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Native cosine similarity over two array columns (stays in
    codegen: zip_with + aggregate, no UDF)."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_from_norms(
    a: Column, b: Column, na: Column, nb: Column
) -> Column:
    """cosine_expr with the two norms supplied as (precomputed)
    columns — identical IEEE arithmetic: dot / (na * nb)."""
    return dot_expr(a, b) / (na * nb)


def _planes(dim: int, n_planes: int, seed: int) -> list:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).tolist()


def _vec_sql(vals) -> str:
    """SQL text for an array<double> literal.  repr() is the shortest
    round-trip form, and Java's Double.parseDouble of that form yields
    the identical IEEE-754 value — so the parsed literal is
    bit-identical to what ``F.lit`` element-wise would build."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"


def _matrix_lit(rows) -> Column:
    """array<array<double>> literal built as ONE parsed SQL expression.
    ``F.lit(nested_list)`` recurses into one py4j round trip per
    element (a 16x64 matrix = 1000+ driver calls, ~0.5-1 s of pure
    plan-construction latency per query build — measured r7); a single
    ``F.expr`` string hands the whole literal to the JVM parser in one
    call."""
    return F.expr(
        "array(" + ",".join(_vec_sql(r) for r in rows) + ")"
    )


def hyperplane_bucket(vec: Column, n_planes: int = 12, seed: int = 42,
                      dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of <v, p_i> packed
    into a long — pure column expressions over a literal plane matrix."""
    planes = _planes(dim, n_planes, seed)
    # ONE nested plane-matrix literal + ONE transform/aggregate chain
    # for all planes: the per-plane loop created n_planes independent
    # higher-order lambda conversions (driver-side construction cost,
    # same pathology as the IVF cell loop).  Bit packing: sign(dot_i)
    # contributes 2^i, summed exactly as the loop formulation did.
    pmat = _matrix_lit(planes)
    dots = F.transform(
        pmat,
        lambda p, i: F.when(
            F.aggregate(
                F.zip_with(vec, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            # 2^i as an exact long (shiftleft needs a literal bit
            # count; pow is exact in doubles for i <= 52, n_planes
            # never exceeds 12 here)
            F.pow(F.lit(2.0), i.cast("double")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        dots, F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact baseline.
    The query side is broadcast — at 100 TB the corpus side streams
    through executors once; cost is |Q| dot products per corpus row."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            norm_expr(F.col(vec_col)).alias("qn"),
        )
    )
    # per-side norms computed once (r7): |Q| x |C| pairs each paid 3
    # aggregate folds; now each row pays its norm once and each pair
    # one dot — same dot/(na*nb) arithmetic, float-identical
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
    )
    scored = q.crossJoin(c).where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id",
        cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    n_planes: int = 8, seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only same-LSH-bucket candidates are scored."""
    # the join keys are wrapped in coalesce(key, side-sentinel) to make
    # them provably non-nullable: otherwise the planner infers an
    # IsNotNull(bucket) filter on the corpus side and — because the
    # bucket is a derived expression, not a stored column — evaluates
    # the whole n_planes-dot bucket computation TWICE per row (once in
    # the inferred filter, once in the project; the §4.4 filter-
    # duplication pathology, measured 2x the corpus-side stage).  The
    # sentinels differ per side, so a NULL vector still matches
    # nothing — exactly the inner-join-on-NULL behavior of the old
    # plan.
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
        F.coalesce(
            hyperplane_bucket(F.col(vec_col), n_planes, seed),
            F.lit(-1).cast("long"),
        ).alias("bucket"),
    )
    qb = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            norm_expr(F.col(vec_col)).alias("qn"),
            F.coalesce(
                hyperplane_bucket(F.col(vec_col), n_planes, seed),
                F.lit(-2).cast("long"),
            ).alias("bucket"),
        )
    )
    scored = qb.join(cb, "bucket").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id",
        cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_topk_oracle_sql(
    table: str = "embeddings", vec_col: str = "embedding",
    id_col: str = "vec_id", k: int = 10, n_planes: int = 8,
    seed: int = 42, dim: int = 64, max_query_id: int = 20,
) -> str:
    """DuckDB SQL reproducing lsh_topk for queries with
    id < max_query_id: inlined plane matrix -> sign-bit buckets ->
    in-bucket cosine ranking, cosine emitted at x10k rounding."""
    terms = []
    for i, p in enumerate(_planes(dim, n_planes, seed)):
        lits = ", ".join(repr(float(x)) for x in p)
        terms.append(
            f"(CASE WHEN list_inner_product(emb, [{lits}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket = " + ".join(terms)
    return f"""
        WITH dbl AS (
            SELECT {id_col} AS id,
                   list_transform({vec_col},
                                  x -> CAST(x AS DOUBLE)) AS emb
            FROM {table}
        ),
        b AS (SELECT id, emb, {bucket} AS bucket FROM dbl),
        scored AS (
            SELECT q.id AS query_id, c.id AS neighbor_id,
                   list_cosine_similarity(q.emb, c.emb) AS cos_raw,
                   row_number() OVER (
                       PARTITION BY q.id
                       ORDER BY list_cosine_similarity(q.emb, c.emb)
                           DESC, c.id ASC
                   ) AS rank
            FROM b q JOIN b c ON q.bucket = c.bucket
                AND q.id < {max_query_id} AND q.id != c.id
        )
        SELECT query_id, neighbor_id, rank,
               CAST(round(cos_raw * 10000) AS BIGINT) AS cosine_x10k
        FROM scored WHERE rank <= {k}
        ORDER BY query_id, rank
    """


def ivf_topk_oracle_sql(
    table: str = "embeddings", vec_col: str = "embedding",
    id_col: str = "vec_id", k: int = 10, n_cells: int = 16,
    nprobe: int = 4, seed: int = 7, dim: int = 64,
    max_query_id: int = 20,
) -> str:
    """DuckDB SQL reproducing ivf_topk with the deterministic
    'random' centroids (seeded unit normals, inlined as literals):
    nearest-cell assignment (ties -> larger cell, matching the
    reverse(array_sort) order), nprobe probing, in-cell cosine
    ranking, x10k cosine contract."""
    rng = np.random.RandomState(seed)
    cents = rng.randn(n_cells, dim)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = ", ".join(
        "({}, [{}])".format(
            ci, ", ".join(repr(float(x)) for x in cents[ci])
        )
        for ci in range(n_cells)
    )
    return f"""
        WITH dbl AS (
            SELECT {id_col} AS id,
                   list_transform({vec_col},
                                  x -> CAST(x AS DOUBLE)) AS emb
            FROM {table}
        ),
        cents(ci, c) AS (VALUES {rows}),
        scores AS (
            SELECT d.id, d.emb, c.ci,
                   list_cosine_similarity(d.emb, c.c) AS sim
            FROM dbl d CROSS JOIN cents c
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY id ORDER BY sim DESC, ci DESC
            ) AS r
            FROM scores
        ),
        cells AS (SELECT id, emb, ci AS cell FROM ranked WHERE r = 1),
        probes AS (
            SELECT id, emb, ci AS cell FROM ranked
            WHERE r <= {nprobe} AND id < {max_query_id}
        ),
        scored AS (
            SELECT p.id AS query_id, t.id AS neighbor_id,
                   list_cosine_similarity(p.emb, t.emb) AS cos_raw,
                   row_number() OVER (
                       PARTITION BY p.id
                       ORDER BY list_cosine_similarity(p.emb, t.emb)
                           DESC, t.id ASC
                   ) AS rank
            FROM probes p
            JOIN cells t ON p.cell = t.cell AND p.id != t.id
        )
        SELECT query_id, neighbor_id, rank,
               CAST(round(cos_raw * 10000) AS BIGINT) AS cosine_x10k
        FROM scored WHERE rank <= {k}
        ORDER BY query_id, rank
    """


def kmeans_centroids(
    corpus: DataFrame, n_cells: int = 16,
    vec_col: str = "embedding", seed: int = 7, max_iter: int = 10,
) -> np.ndarray:
    """Real k-means centroids for IVF, JVM-side via Spark MLlib
    (distributed Lloyd's; only the k×dim centroid matrix reaches the
    driver — the scale-correct shape for a 100 TB corpus)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("fv")
    )
    model = KMeans(
        k=n_cells, seed=seed, maxIter=max_iter, featuresCol="fv"
    ).fit(feats)
    cents = np.array(model.clusterCenters(), dtype=float)
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return cents / norms


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_cells: int = 16, nprobe: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
    dim: int = 64, seed: int = 7,
    centroids: str | np.ndarray = "kmeans",
) -> DataFrame:
    """IVF ANN: corpus partitioned by nearest cell, queries probe
    ``nprobe`` cells.  ``centroids``: 'kmeans' (MLlib, default),
    'random' (deterministic unit normals — the cheap stand-in), or a
    precomputed (n_cells, dim) array (the production path: centroids
    are a periodically-refreshed asset, not recomputed per query)."""
    if isinstance(centroids, np.ndarray):
        cents = centroids
    elif centroids == "kmeans":
        cents = kmeans_centroids(corpus, n_cells, vec_col, seed)
    elif centroids == "random":
        rng = np.random.RandomState(seed)
        cents = rng.randn(n_cells, dim)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    else:
        raise ValueError(f"unknown centroids mode: {centroids}")
    n_cells = len(cents)

    # ONE nested-array literal + ONE transform lambda for all cells:
    # the previous per-cell loop built n_cells independent
    # cosine_exprs (each with its own higher-order lambdas) — measured
    # 1.7 s of driver-side expression construction per call at
    # n_cells=16.  Sort semantics unchanged: struct(sim, cell) default
    # ordering reversed = sim DESC, cell DESC.
    #
    # r7: per-row norm computed ONCE and each centroid's norm folded
    # in as a literal (the exact sqrt-of-left-fold value the SQL
    # aggregate produces — verified bit-identical), so a cell score is
    # one dot + one divide instead of three aggregate folds; the
    # corpus-side argmax is array_max (same struct ordering as
    # reverse(array_sort)[0]: max (sim, cell) == sim DESC, cell DESC
    # tie-break) instead of a full 16-element sort per row.
    def _fold_norm(row) -> float:
        acc = 0.0
        for v in row:
            acc = acc + float(v) * float(v)
        import math

        return math.sqrt(acc)

    # one parsed SQL literal for the whole centroid table (see
    # _matrix_lit: element-wise F.lit cost ~1 s of py4j round trips
    # per query build at n_cells=16)
    cell_lits = F.expr(
        "array(" + ",".join(
            "named_struct('c', {}, 'cn', {!r}D, 'cell', {})".format(
                _vec_sql(cents[i]), float(_fold_norm(cents[i])), i
            )
            for i in range(n_cells)
        ) + ")"
    )

    def cell_scores(vec: Column, vn: Column) -> Column:
        return F.transform(
            cell_lits,
            lambda s: F.struct(
                (dot_expr(vec, s["c"]) / (vn * s["cn"])).alias("sim"),
                s["cell"].alias("cell"),
            ),
        )

    # coalesce(cell, -1) makes the join key non-nullable so the planner
    # does not infer an IsNotNull(cell) filter that would re-evaluate
    # the whole 16-dot cell expression a second time per corpus row
    # (guide §4.4 duplication; measured ~2x this stage).  A NULL
    # vector's cell becomes -1, which no query probe (always a literal
    # cell id) can match — identical inner-join semantics.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm_expr(F.col(vec_col)).alias("cn"),
    ).select(
        "neighbor_id", "cv", "cn",
        F.coalesce(
            F.array_max(
                cell_scores(F.col("cv"), F.col("cn"))
            )["cell"],
            F.lit(-1),
        ).alias("cell"),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
            norm_expr(F.col(vec_col)).alias("qn"),
        ).select(
            "query_id", "qv", "qn",
            F.explode(
                F.slice(
                    F.reverse(F.array_sort(
                        cell_scores(F.col("qv"), F.col("qn"))
                    )),
                    1, nprobe,
                )
            ).alias("probe"),
        ).select("query_id", "qv", "qn", F.col("probe.cell").alias("cell"))
    )
    # every corpus row lives in exactly one cell and a query's nprobe
    # probes are distinct cells, so a (query, neighbor) pair matches
    # at most once — the old groupBy/max dedup aggregate was a no-op
    # shuffle and is dropped (r7; output rows identical)
    scored = q.join(c, "cell").where(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id",
        cosine_from_norms(
            F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
