"""graph_metrics: exact-integer PageRank + triangle counting.

Covers: (a) the integer contract — a pure-Python reimplementation of
the same floor-division iteration must match the Spark result bigint-
for-bigint; (b) PageRank actually approximates float PageRank; (c)
known-answer triangle fixtures; (d) determinism across partitioning.
"""

import pytest
from pyspark.sql import functions as F

from graphgen_spark.operators.graph_metrics import (
    DAMPING_MICRO,
    SCALE,
    pagerank_exact,
    triangle_counts,
)


def _edges_df(spark, pairs, n_part=1):
    return spark.createDataFrame(
        pairs, "src string, dst string"
    ).repartition(n_part)


def _py_pagerank_exact(pairs, iterations=5):
    """Independent reference: same integer recurrence, plain dicts."""
    und = {}
    for a, b in pairs:
        lo, hi = min(a, b), max(a, b)
        if lo == hi:
            continue
        und.setdefault(lo, set()).add(hi)
        und.setdefault(hi, set()).add(lo)
    deg = {u: len(vs) for u, vs in und.items()}
    rank = {u: SCALE for u in und}
    base = SCALE - DAMPING_MICRO
    for _ in range(iterations):
        nxt = {}
        for u, vs in und.items():
            s = sum(rank[v] // deg[v] for v in vs)
            nxt[u] = base + (DAMPING_MICRO * s) // SCALE
        rank = nxt
    return rank, deg


STAR = [("HUB", f"LEAF{i}") for i in range(6)]
TRI_PLUS_TAIL = [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D")]


class TestPagerankExact:
    def test_matches_python_reference(self, spark):
        pairs = STAR + TRI_PLUS_TAIL + [("LEAF0", "A")]
        got = {
            r["entity"]: (r["deg"], r["rank_micro"])
            for r in pagerank_exact(
                _edges_df(spark, pairs), iterations=5
            ).collect()
        }
        want_rank, want_deg = _py_pagerank_exact(pairs, iterations=5)
        assert set(got) == set(want_rank)
        for u in want_rank:
            assert got[u] == (want_deg[u], want_rank[u]), u

    def test_approximates_float_pagerank(self, spark):
        # star: hub rank must exceed every leaf; micro error vs the
        # float recurrence stays under deg * 1 micro per round
        rows = pagerank_exact(
            _edges_df(spark, STAR), iterations=10
        ).collect()
        ranks = {r["entity"]: r["rank_micro"] / SCALE for r in rows}
        # float reference
        fr = {u: 1.0 for u in ranks}
        deg = {"HUB": 6, **{f"LEAF{i}": 1 for i in range(6)}}
        und = {"HUB": [f"LEAF{i}" for i in range(6)],
               **{f"LEAF{i}": ["HUB"] for i in range(6)}}
        for _ in range(10):
            fr = {
                u: 0.15 + 0.85 * sum(fr[v] / deg[v] for v in und[u])
                for u in fr
            }
        for u in ranks:
            assert ranks[u] == pytest.approx(fr[u], abs=1e-4)
        assert ranks["HUB"] > ranks["LEAF0"] * 3

    def test_deterministic_across_partitioning(self, spark):
        pairs = STAR + TRI_PLUS_TAIL
        a = sorted(
            map(tuple, pagerank_exact(
                _edges_df(spark, pairs, n_part=1), iterations=4
            ).collect())
        )
        b = sorted(
            map(tuple, pagerank_exact(
                _edges_df(spark, pairs, n_part=7), iterations=4
            ).collect())
        )
        assert a == b

    def test_self_loops_and_duplicates_ignored(self, spark):
        pairs = [("A", "B"), ("B", "A"), ("A", "A"), ("A", "B")]
        rows = pagerank_exact(_edges_df(spark, pairs)).collect()
        assert {r["entity"] for r in rows} == {"A", "B"}
        by = {r["entity"]: r for r in rows}
        assert by["A"]["deg"] == by["B"]["deg"] == 1
        # symmetric graph -> identical ranks
        assert by["A"]["rank_micro"] == by["B"]["rank_micro"]


class TestTriangleCounts:
    def test_k4_all_clustering_one(self, spark):
        k4 = [
            (a, b)
            for i, a in enumerate("ABCD")
            for b in "ABCD"[i + 1:]
        ]
        rows = triangle_counts(_edges_df(spark, k4)).collect()
        assert len(rows) == 4
        for r in rows:
            assert r["deg"] == 3
            assert r["n_triangles"] == 3  # each node in 3 of K4's 4
            assert r["clustering_micro"] == SCALE

    def test_triangle_with_tail(self, spark):
        rows = {
            r["entity"]: r
            for r in triangle_counts(
                _edges_df(spark, TRI_PLUS_TAIL)
            ).collect()
        }
        assert rows["A"]["n_triangles"] == 1
        assert rows["B"]["n_triangles"] == 1
        assert rows["C"]["n_triangles"] == 1
        assert rows["D"]["n_triangles"] == 0
        # C: deg 3, one closed pair of three -> 2/6
        assert rows["C"]["clustering_micro"] == (2 * SCALE) // 6
        assert rows["D"]["clustering_micro"] == 0

    def test_no_triangles(self, spark):
        path = [("A", "B"), ("B", "C"), ("C", "D")]
        rows = triangle_counts(_edges_df(spark, path)).collect()
        assert all(r["n_triangles"] == 0 for r in rows)
