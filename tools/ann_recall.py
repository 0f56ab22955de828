"""ANN recall@k at scale for lsh_topk / ivf_topk (VERDICT r6 #2).

The frozen oracles pin that each operator retrieves exactly what its
algorithm says; this tool measures what that algorithm is WORTH as
retrieval: recall@k against brute-force ground truth on a clustered
(not uniform) synthetic embedding set, across the knob grid a 100 TB
user would tune (n_planes for the hyperplane table; n_cells/nprobe
for IVF), with the measured wall per configuration.

Corpus: ``n_clusters`` Gaussian clusters (centers ~ N(0, I_dim),
points = center + spread * N(0, I)), seeded — nearest neighbors are
overwhelmingly intra-cluster, which is the regime where bucketed ANN
earns its keep and where its misses are visible (uniform random
vectors make every method look alike because no pair is near).

Ground truth: numpy float64 brute-force cosine top-k (recall is a
set-overlap metric; float summation order cannot move it).

Usage:
  python tools/ann_recall.py [--n 100000] [--queries 200] [--k 10] \
      [--out BENCH_SCALING.jsonl]

Appends one JSON line per configuration:
  {"probe": "ann_recall", "algo": "lsh", "n": ..., "config": {...},
   "recall_at_k": ..., "wall_s": ..., "scored_pairs": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def make_corpus(n: int, dim: int, n_clusters: int, spread: float,
                seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim)
    assign = rng.randint(0, n_clusters, size=n)
    pts = centers[assign] + spread * rng.randn(n, dim)
    return pts.astype(np.float64)


def ground_truth(corpus: np.ndarray, q_ids: np.ndarray, k: int):
    """Exact cosine top-k neighbor ids per query (self excluded)."""
    norms = np.linalg.norm(corpus, axis=1)
    sims = (corpus[q_ids] @ corpus.T) / (
        norms[q_ids][:, None] * norms[None, :]
    )
    for r, qi in enumerate(q_ids):
        sims[r, qi] = -np.inf
    # ties broken by smaller neighbor id, like the operators
    order = np.lexsort((np.arange(corpus.shape[0])[None, :].repeat(
        len(q_ids), 0), -sims), axis=1)
    return {int(q_ids[r]): set(map(int, order[r, :k]))
            for r in range(len(q_ids))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=100)
    ap.add_argument("--spread", type=float, default=0.35)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=os.path.join(
        ROOT, "BENCH_SCALING.jsonl"))
    args = ap.parse_args()

    corpus = make_corpus(args.n, args.dim, args.clusters, args.spread,
                         args.seed)
    q_ids = np.arange(args.queries)
    truth = ground_truth(corpus, q_ids, args.k)

    from pyspark.sql import functions as F

    from graphgen_spark.datapipe.similarity import ivf_topk, lsh_topk
    from graphgen_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]",
                      app_name="ann_recall")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()
    import pandas as pd

    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, schema="id long").count()

    pdf = pd.DataFrame({
        "vec_id": np.arange(args.n, dtype=np.int64),
        "embedding": [row.tolist() for row in corpus],
    })
    emb = spark.createDataFrame(pdf).persist()
    emb.count()
    queries_df = emb.where(F.col("vec_id") < args.queries)

    lines = []

    def run(algo: str, config: dict, df_builder):
        t0 = time.time()
        rows = df_builder().collect()
        wall = round(time.time() - t0, 2)
        got: dict[int, list] = {}
        for r in rows:
            got.setdefault(int(r["query_id"]), []).append(
                int(r["neighbor_id"]))
        hits = sum(
            len(set(got.get(q, [])) & truth[q]) for q in truth
        )
        recall = round(hits / (len(truth) * args.k), 4)
        line = {
            "probe": "ann_recall", "algo": algo, "n": args.n,
            "dim": args.dim, "clusters": args.clusters,
            "spread": args.spread, "n_queries": args.queries,
            "k": args.k, "config": config, "recall_at_k": recall,
            "wall_s": wall, "retrieved": len(rows),
        }
        print(json.dumps(line), flush=True)
        lines.append(line)

    for n_planes in [4, 6, 8, 10, 12]:
        run(
            "lsh", {"n_planes": n_planes},
            lambda np_=n_planes: lsh_topk(
                emb, queries_df, k=args.k, n_planes=np_,
            ).select("query_id", "neighbor_id"),
        )

    for n_cells in [16, 64, 256]:
        for nprobe in [1, 4, 8, 16]:
            if nprobe > n_cells:
                continue
            run(
                "ivf", {"n_cells": n_cells, "nprobe": nprobe,
                        "centroids": "kmeans"},
                lambda nc=n_cells, npb=nprobe: ivf_topk(
                    emb, queries_df, k=args.k, n_cells=nc, nprobe=npb,
                    centroids="kmeans",
                ).select("query_id", "neighbor_id"),
            )

    with open(args.out, "a") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    print(f"appended {len(lines)} lines to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
