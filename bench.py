"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline = the flagship KG-construction pipeline (pages synthesized
deterministically from the documents table -> canonical triples +
coverage), plus the relational/dedup query suite from
__spark_entry__.queries().

Optional: SPARK_GRAFT_SCALING=1 additionally runs the KG pipeline at
local[N] and local[4N] cold sessions and reports scaling efficiency
(the BASELINE.md two-cluster-size stand-in).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _fresh_spark(cpus: int):
    from graphgen_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_kg(spark, sf_dir: str) -> tuple[float, int, float]:
    """KG spine timings: (steady_wall, n_triples, dict_prep_wall).

    dict_prep = the alias dictionary's CC label table, a static
    per-release asset (built once, reused across every corpus batch);
    steady = the per-batch path scan -> fused extract/link -> triples.
    """
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from graphgen_spark.pipelines import alias_labels, run_kg_pipeline

    pages = entrymod._pages_for(spark, sf_dir)
    # warm the JVM + Python workers on tiny jobs so dict_prep times
    # the CC label build, not first-job session startup (~10-20 s)
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()
    import pandas as pd  # noqa: F401 — imported on workers below

    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    t0 = time.time()
    labels = alias_labels(entrymod._alias_dict(spark)).localCheckpoint(
        eager=True
    )
    dict_prep = time.time() - t0

    # min-of-3 for the HEADLINE too (the per-query walls already get
    # it): a single-shot wall swung 2.6-4.5 s on this host for an
    # identical plan, and the headline is the number rounds are
    # compared on.  Each rep rebuilds the full pipeline from the same
    # checkpointed inputs (no frame reuse across reps); the min is
    # the steady-state estimate.
    steady, n_triples = None, 0
    for _ in range(3):
        t0 = time.time()
        out = run_kg_pipeline(
            spark, pages, precomputed_labels=labels,
            chunk_size=512, chunk_overlap=64, fused=True,
        )
        n_triples = out["triples"].count()
        wall = time.time() - t0
        steady = wall if steady is None else min(steady, wall)
        # release each rep's localCheckpoint blocks NOW (ContextCleaner
        # fires on Python GC): three reps' worth of leaked checkpoint
        # RDDs measurably degraded every later documents-table scan in
        # the same session (doc_quality_by_lang 0.3 -> 2.1 s)
        del out
        import gc

        gc.collect()
    return steady, n_triples, dict_prep


def run_kg_pages(spark, n_pages: int) -> tuple[float, int, float]:
    """run_kg over a synthesized n-page corpus (scaling measurements
    need corpus-proportional work, not the sf-dir suite size)."""
    from pyspark.sql import functions as F
    from graphgen_spark import synth
    from graphgen_spark.pipelines import alias_labels, run_kg_pipeline

    n_ent = synth.n_entities_for(n_pages)
    pages = synth.pages_df(spark, n_pages, n_ent)
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()
    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    t0 = time.time()
    labels = alias_labels(
        synth.alias_dictionary_df(spark, n_ent)
    ).localCheckpoint(eager=True)
    dict_prep = time.time() - t0
    t0 = time.time()
    out = run_kg_pipeline(
        spark, pages, precomputed_labels=labels,
        chunk_size=512, chunk_overlap=64, fused=True,
    )
    n_triples = out["triples"].count()
    return time.time() - t0, n_triples, dict_prep


def main() -> None:
    import __spark_entry__ as entrymod

    spark = _fresh_spark(CPUS)
    timings: dict[str, float] = {}

    t_kg, n_triples, t_dict = run_kg(spark, SF_DIR)
    timings["kg_pipeline"] = round(t_kg, 3)
    timings["kg_dict_prep"] = round(t_dict, 3)

    # Per-query wall = min of 3 runs (re-runs skipped past 120 s).
    # Sharing one session across the suite is realistic, but a query
    # timed right after a heavy multi-stage one absorbs its Python
    # worker churn / GC debris (round 1: media_features read 35 s for
    # 128 rows; isolated it runs in <2 s) — the min cancels that.
    # Queries over the KG reuse the session-cached graph on the second
    # run, so they report their own marginal cost; the one-time graph
    # build is the headline (kg_pipeline + kg_dict_prep).
    # cold = first run (cache effects visible), min = best of 3.
    # min-of-3 (was min-of-2 through r5): BENCH_r05 showed a broad
    # +10-30% warm drift vs r4 with every mover noise-correlated
    # (VERDICT r5 "What's wrong" #2) — a third sample tightens the
    # min-estimator enough to attribute that kind of drift to host
    # churn instead of leaving the round-over-round comparison mushy.
    cold: dict[str, float] = {}
    from graphgen_spark.datapipe.dedup import release_dedup_caches

    for name, fn in entrymod.queries().items():
        if name.startswith("kg_"):
            continue  # covered by kg_pipeline above
        walls = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            walls.append(time.time() - t0)
            # re-run cap: 120 s keeps the min meaningful for the one
            # query with a heavy cold graph build (qa_eval_metrics,
            # 40-85 s cold depending on host noise) while still
            # bounding suite time
            if walls[-1] > 120:
                break
        timings[name] = round(min(walls), 3)
        cold[name] = round(walls[0], 3)
        # dedup intermediates are session-persisted; release between
        # queries so one suite run doesn't accumulate cached blocks
        release_dedup_caches()

    result = {
        "metric": "kg_pipeline_wall_sec",
        "value": timings["kg_pipeline"],
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        "triples": n_triples,
        "triples_per_sec": round(n_triples / t_kg, 1) if t_kg > 0 else None,
    }

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        spark.stop()
        # pair capped at 8 cores: above ~12 busy vCPUs this host's
        # hypervisor steals cycles (BASELINE.md "Hardware ceiling").
        # Measured on a 160k-page synthetic corpus, NOT the sf0.1
        # suite job: at 40k pages the fixed session/worker overhead
        # (~5 s) dominates and a 2-vs-8-core ratio measures that
        # floor, not the corpus-proportional work the gate is about
        # (see tools/scaling_matrix.sh for the interleaved min-of-N
        # version this mirrors).
        n_pages = int(
            os.environ.get("SPARK_GRAFT_SCALING_PAGES", "160000")
        )
        hi_cpus = min(CPUS, 8)
        lo_cpus = max(1, hi_cpus // 4)
        spark_lo = _fresh_spark(lo_cpus)
        t_lo, _, _ = run_kg_pages(spark_lo, n_pages)
        spark_lo.stop()
        spark_hi = _fresh_spark(hi_cpus)
        t_hi, _, _ = run_kg_pages(spark_hi, n_pages)
        spark_hi.stop()
        eff = (t_lo / t_hi) / (hi_cpus / lo_cpus) if t_hi > 0 else None
        result["scaling"] = {
            "n_pages": n_pages,
            "cpus_lo": lo_cpus, "wall_lo": round(t_lo, 3),
            "cpus_hi": hi_cpus, "wall_hi": round(t_hi, 3),
            "efficiency": round(eff, 3) if eff else None,
        }

    # The round driver captures only the LAST 2000 chars of stdout; the
    # full result (61 warm + 61 cold timings) outgrew that in round 3
    # and the headline metric was lost (BENCH_r03.parsed = null).  So:
    # full detail goes to a file + an EARLIER stdout line, and the
    # FINAL line is a compact headline-only object that always fits.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    headline = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "cpus": result["cpus"],
        "triples": result["triples"],
        "triples_per_sec": result["triples_per_sec"],
        "detail_file": "BENCH_DETAIL.json",
    }
    if "scaling" in result:
        headline["scaling"] = result["scaling"]
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
