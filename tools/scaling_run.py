"""One cold scaling measurement: run the KG spine on a deterministic
synthetic corpus at the given parallelism.

Usage: spark-submit --master local[N] tools/scaling_run.py <n_pages>

Reports two walls:
- steady_wall: the per-batch path (extract text -> chunk -> extract
  triples -> link/canonicalize -> triples), with the candidate
  dictionary's CC label table prepared beforehand — the dictionary is
  a static asset built once per release, amortized to ~0 across
  batches at 10^12-doc scale, so this is the number that scales with
  corpus size.
- total_wall: steady_wall + the (fixed-size) dictionary prep, i.e. a
  from-nothing single-batch run.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from graphgen_spark import synth
from graphgen_spark.pipelines import alias_labels, run_kg_pipeline

n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
n_ent = synth.n_entities_for(n_pages)

spark = SparkSession.builder.appName("scaling_run").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
cpus = spark.sparkContext.defaultParallelism

import os

# corpus + dictionary labels are landed as parquet ONCE (any process);
# the measured session reads them back like production
corpus_dir = f"/dev/shm/scaling_pages_{n_pages}"
labels_dir = f"/dev/shm/scaling_labels_{n_ent}"
dict_prep = 0.0
if not os.path.exists(corpus_dir):
    # 64 files so the scan provides parallelism at every level tested
    # (one ~5 MB parquet file = one input split here)
    synth.pages_df(spark, n_pages, n_ent).repartition(64).write.mode(
        "overwrite"
    ).parquet(corpus_dir)
if not os.path.exists(labels_dir):
    t0 = time.time()
    alias = synth.alias_dictionary_df(spark, n_ent)
    alias_labels(alias).repartition(8).write.mode("overwrite").parquet(
        labels_dir
    )
    dict_prep = time.time() - t0

# JVM/python-worker warmup on a tiny slice (identical at both levels)
labels = spark.read.parquet(labels_dir)
warm = run_kg_pipeline(
    spark, synth.pages_df(spark, 64, n_ent),
    precomputed_labels=labels, chunk_size=512, chunk_overlap=64,
    fused=True,
)
warm["triples"].count()

pages = spark.read.parquet(corpus_dir)
# SPARK_GRAFT_LABEL_MAP_MAX_ROWS overrides the map-side linking guard
# (default 2M label rows) so the JVM-join linking regime can be
# measured at corpus sizes below its natural crossover — within-regime
# per-page cost is the honest linearity comparison once a corpus step
# crosses the guard (2.56M pages -> 2.56M label rows > 2M).
lmmr = int(os.environ.get("SPARK_GRAFT_LABEL_MAP_MAX_ROWS", 2_000_000))
t0 = time.time()
out = run_kg_pipeline(
    spark, pages, chunk_size=512, chunk_overlap=64,
    precomputed_labels=labels, fused=True,
    label_map_max_rows=lmmr,
)
n = out["triples"].count()
steady = time.time() - t0

print(json.dumps({
    "cpus": cpus,
    "n_pages": n_pages,
    "steady_wall": round(steady, 2),
    "dict_prep_wall": round(dict_prep, 2),
    "total_wall": round(steady + dict_prep, 2),
    "triples": n,
    "steady_triples_per_sec": round(n / steady, 1),
}))
spark.stop()
