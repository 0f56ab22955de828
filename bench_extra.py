"""Round-7 measurement harness (bench.py is FROZEN for the driver;
this file holds the extra instrumentation the optimization round
needs — per-query timing on a subset, noop-sink isolation, and plan
capture).  Methodology mirrors bench.py exactly where comparable:
same session factory, same warmup, min-of-3 `.count()` walls.

Usage:
  python bench_extra.py [--sf DIR] [--mode count|noop] [--reps N] \
      [--queries q1,q2,...] [--headline]

Prints one JSON line per query: {"q": name, "walls": [...], "min": m,
"cold": c} and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--mode", default="count",
                    choices=["count", "noop"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default="")
    ap.add_argument("--headline", action="store_true",
                    help="also time the kg_pipeline headline reps")
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from graphgen_spark.session import get_spark
    from graphgen_spark.datapipe.dedup import release_dedup_caches

    spark = get_spark(master=f"local[{args.cpus}]",
                      app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    spark.range(1000).select(
        F.md5(F.col("id").cast("string"))).count()
    import pandas as pd  # noqa: F401

    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, schema="id long").count()

    wanted = [q for q in args.queries.split(",") if q]

    summary: dict[str, float] = {}

    if args.headline:
        from graphgen_spark.pipelines import alias_labels, run_kg_pipeline

        pages = entrymod._pages_for(spark, args.sf)
        t0 = time.time()
        labels = alias_labels(
            entrymod._alias_dict(spark)).localCheckpoint(eager=True)
        dict_prep = time.time() - t0
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            out = run_kg_pipeline(
                spark, pages, precomputed_labels=labels,
                chunk_size=512, chunk_overlap=64, fused=True)
            out["triples"].count()
            walls.append(round(time.time() - t0, 3))
            del out
            import gc

            gc.collect()
        print(json.dumps({"q": "kg_pipeline", "walls": walls,
                          "min": min(walls), "dict_prep": round(dict_prep, 3)}))
        summary["kg_pipeline"] = min(walls)
        summary["kg_dict_prep"] = round(dict_prep, 3)

    for name, fn in entrymod.queries().items():
        if name.startswith("kg_"):
            continue
        if wanted and name not in wanted:
            continue
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        walls = []
        for _ in range(args.reps):
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.mode == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            if walls[-1] > 120:
                break
        spark.sparkContext.setJobDescription(None)
        release_dedup_caches()
        print(json.dumps({"q": name, "walls": walls,
                          "min": min(walls), "cold": walls[0]}),
              flush=True)
        summary[name] = min(walls)

    print(json.dumps({"summary": summary, "sf": args.sf,
                      "mode": args.mode}))


if __name__ == "__main__":
    main()
