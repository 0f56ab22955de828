"""Connected components as iterative DataFrame joins (GraphFrames-style
alternating large-star / small-star, Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14).

Replaces the reference's single-process NetworkX
``nx.connected_components`` (``storage/graph/networkx_storage.py:28-37``)
and Kuzu union-find (``storage/graph/kuzu_storage.py:120-150``) with an
O(log n)-round distributed fixpoint: every round is two hash shuffles
(groupBy min + join), lineage is cut with ``localCheckpoint`` each
round so plans stay bounded, and convergence is checked with a cheap
count+hash aggregate.

String vertex ids are mapped to int64 via xxhash64 (collision odds are
~n²/2⁶⁵ — negligible for entity vocabularies; document ids never enter
the graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u, connect every strictly-larger neighbor to the
    minimum of Γ(u) ∪ {u}."""
    both = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = (
        both.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select("src", F.least("_mn", "src").alias("m"))
    )
    return (
        both.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient each edge large→small; connect all smaller neighbors and
    the center to the minimum neighbor."""
    oriented = e.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(mins, "u")
        .select(
            F.explode(F.array(F.col("v"), F.col("u"))).alias("src"),
            F.col("m").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(e: DataFrame) -> tuple:
    # bit_xor is overflow-free under ANSI mode (edges are distinct, so
    # xor is a sound multiset signature here)
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


# Below this edge count the whole graph fits comfortably on the
# driver (200k edges ≈ 3 MB of int64 pairs) and a local union-find
# replaces ~O(log n) fixpoint rounds x 2 shuffles each — the dominant
# cost for small graphs is pure job-scheduling latency.  The
# distributed fixpoint below remains the scale path; set
# driver_max_edges=0 to force it.
DRIVER_CC_MAX_EDGES = 200_000


def _stats_prove_small(df: DataFrame, bound: int = 8 << 20) -> bool:
    """True when the Catalyst size statistic PROVES ``df`` is tiny
    (known statistics at or under ``bound`` bytes) — lets the driver
    fast paths below collect directly and skip their gate ``count()``
    job (~0.15-0.3 s of per-call job latency; the alias-dictionary CC
    pays it on every dict-prep).  Unknown statistics default to
    ``defaultSizeInBytes`` (astronomically large), so this can only
    fire for materialized/well-estimated inputs; the row gate is still
    enforced on the collected length, so the only possible waste is a
    bounded (≤ ``bound``-byte) collect that then falls through to the
    distributed path — never a wrong result, never an unbounded
    collect.  Same decide-from-free-driver-statistics pattern as the
    simhash kernel crossover (dedup.py)."""
    try:
        return (
            int(
                df._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
            <= bound
        )
    except Exception:
        return False


def _driver_union_find(pairs: list) -> list:
    """Local union-find with minimum-id representative — identical
    labels to the distributed fixpoint (component = min member id)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id keeps the representative deterministic
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    ids = set()
    for a, b in pairs:
        ids.add(a)
        ids.add(b)
    return [(i, find(i)) for i in ids]


def connected_components_long(
    edges: DataFrame, max_iter: int = 25, partitions: int | None = None,
    assume_materialized: bool = False,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """edges(src int64, dst int64) -> labels(id int64, component int64)
    where component is the minimum member id.  Covers every vertex that
    appears in any edge (callers union in isolated vertices).

    ``partitions`` sizes the fixpoint's shuffles: pass ~|E|/2M for big
    graphs; when None a cheap count picks it (small inputs collapse to
    a handful of partitions so the iteration isn't job-overhead-bound).

    The input plan is referenced by three branches (vertex set,
    canonical edges, partition count) — it is checkpointed ONCE up
    front so an expensive upstream (e.g. LSH candidate verification)
    never re-executes per branch.  Pass ``assume_materialized=True``
    when the caller already checkpointed/persisted it.
    """
    if not assume_materialized:
        edges = edges.localCheckpoint(eager=True)
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    e = _canonical_edges(edges)
    # NOTE: a limit(gate+1).collect() probe would be one job instead
    # of count+collect, but Spark executes a global limit by funneling
    # the whole upstream into ONE partition — measured 60 s+ on the
    # sf0.1 KG edge table.  The parallel count stays — except when the
    # input's free Catalyst statistic already proves it tiny, where we
    # collect directly and enforce the SAME row gate on len().
    pairs = n_edges = None
    if driver_max_edges and _stats_prove_small(edges):
        cand = [(r["src"], r["dst"]) for r in e.collect()]
        if len(cand) <= driver_max_edges:
            pairs = cand
        else:
            n_edges = len(cand)  # exact count, free from the collect
    if pairs is None and n_edges is None:
        n_edges = e.count()
        if n_edges <= driver_max_edges:
            pairs = [(r["src"], r["dst"]) for r in e.collect()]
    if pairs is not None:
        # small graph: local union-find (same min-id labels), one job
        labels = _driver_union_find(pairs)
        spark = edges.sparkSession
        # hand the local label list to the JVM as ONE Arrow batch via
        # pandas: the plain-list path converts pickled rows one by one
        # (measured ~1.4 s for an 8k-row label table vs ~0.1 s Arrow;
        # identical rows/schema, content-only difference is zero)
        import pandas as pd

        lab_df = (
            spark.createDataFrame(
                pd.DataFrame(labels, columns=["id", "component"]),
                "id long, component long",
            )
            if labels
            else spark.createDataFrame([], "id long, component long")
        )
        return (
            vertices.join(lab_df, "id", "left")
            .select(
                "id",
                F.coalesce("component", F.col("id")).alias("component"),
            )
        )
    if partitions is None:
        partitions = max(2, min(256, n_edges // 500_000 + 2))
    e = e.repartition(partitions, "src").localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_iter):
        e = _large_star(e)
        e = (
            _small_star(e)
            .repartition(partitions, "src")
            .localCheckpoint(eager=True)
        )
        sig = _signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    # final star edges point child -> root(min); roots label themselves
    labels = e.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    labels = labels.groupBy("id").agg(F.min("component").alias("component"))
    return (
        vertices.join(labels, "id", "left")
        .select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    )


def connected_components(
    edges: DataFrame,
    src_col: str = "src_id",
    dst_col: str = "tgt_id",
    max_iter: int = 25,
    partitions: int | None = None,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
    assume_materialized: bool = False,
) -> DataFrame:
    """String-keyed wrapper: edges(src_col, dst_col string) ->
    (name string, component int64, component_name string) where
    component_name is the lexicographically-minimal member name (a
    deterministic canonical representative).

    The input is checkpointed once: the name table, the hashed edge
    list, and the fixpoint all branch from it, and the upstream plan
    (candidate generation + verification in the dedup callers) must
    not re-execute per branch.  ``assume_materialized=True`` skips
    that checkpoint when the caller already landed the edge table."""
    edges = edges.select(src_col, dst_col)
    if not assume_materialized:
        edges = edges.localCheckpoint(eager=True)
    if driver_max_edges:
        # small-graph fast path at the STRING level: one count + one
        # collect, union-find on names (min-name representative ==
        # component_name), zero joins/shuffles downstream.  The join
        # formulation below cost ~7 s of pure job-scheduling latency
        # for a 6k-edge alias dictionary at local[32].  `component` is
        # xxhash64(component_name) on BOTH sides of the gate (the
        # distributed path re-derives it after computing reps), so the
        # numeric label is stable across the threshold and matches the
        # xxhash64(entity_name) singleton fallback consumers use for
        # isolated nodes.
        pairs = None
        if _stats_prove_small(edges):
            cand = [(r[0], r[1]) for r in edges.collect()]
            if len(cand) <= driver_max_edges:
                pairs = cand
        elif edges.count() <= driver_max_edges:
            pairs = [(r[0], r[1]) for r in edges.collect()]
        if pairs is not None:
            labels = _driver_union_find(pairs)
            spark = edges.sparkSession
            # one Arrow batch via pandas, not per-row pickled
            # conversion — see the long-path note above
            import pandas as pd

            lab_df = (
                spark.createDataFrame(
                    pd.DataFrame(
                        labels, columns=["name", "component_name"]
                    ),
                    "name string, component_name string",
                )
                if labels
                else spark.createDataFrame(
                    [], "name string, component_name string"
                )
            )
            return lab_df.select(
                "name",
                F.xxhash64("component_name").alias("component"),
                "component_name",
            )
    ids = (
        edges.select(F.col(src_col).alias("name"))
        .union(edges.select(F.col(dst_col).alias("name")))
        .distinct()
        .withColumn("id", F.xxhash64("name"))
    )
    e_long = (
        edges.select(
            F.xxhash64(src_col).alias("src"), F.xxhash64(dst_col).alias("dst")
        )
    )
    labels = connected_components_long(
        e_long, max_iter=max_iter, partitions=partitions,
        assume_materialized=True, driver_max_edges=driver_max_edges,
    )
    named = ids.join(labels, "id").select("name", "component")
    reps = named.groupBy("component").agg(
        F.min("name").alias("component_name")
    )
    # one id space for BOTH paths: component = xxhash64 of the min
    # member NAME (what the driver fast path above emits), not the min
    # member HASH — otherwise the same graph gets different numeric
    # labels depending on which side of the driver_max_edges gate it
    # lands on, and any consumer persisting `component` across runs
    # that straddle the threshold sees labels change
    return named.join(reps, "component").select(
        "name",
        F.xxhash64("component_name").alias("component"),
        "component_name",
    )
