"""Capture `.explain("formatted")` for declared queries into
plans/r07/<query>_<suffix>.txt (the round-7 judge deliverable).

Usage:
  python tools/capture_plans.py --suffix before --queries q1,q2 \
      [--sf /root/testdata/sf0.1] [--headline]
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--queries", default="")
    ap.add_argument("--headline", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from graphgen_spark.session import get_spark

    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(ROOT, "plans", "r07")
    os.makedirs(outdir, exist_ok=True)

    wanted = [q for q in args.queries.split(",") if q]
    reg = entrymod.queries()

    names = wanted or [n for n in reg if not n.startswith("kg_")]
    for name in names:
        fn = reg[name]
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")

    if args.headline:
        from graphgen_spark.pipelines import alias_labels, run_kg_pipeline

        pages = entrymod._pages_for(spark, args.sf)
        labels = alias_labels(
            entrymod._alias_dict(spark)).localCheckpoint(eager=True)
        out = run_kg_pipeline(
            spark, pages, precomputed_labels=labels,
            chunk_size=512, chunk_overlap=64, fused=True)
        df = out["triples"]
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"kg_pipeline_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
