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

# JVM/python-worker warmup on a tiny slice (identical at both levels)
warm = run_kg_pipeline(
    spark, synth.pages_df(spark, 64, n_ent),
    alias_dict=synth.alias_dictionary_df(spark, 64),
    chunk_size=512, chunk_overlap=64,
)
warm["triples"].count()

# dictionary prep (timed separately)
t0 = time.time()
alias = synth.alias_dictionary_df(spark, n_ent)
labels = alias_labels(alias).localCheckpoint(eager=True)
labels.count()
dict_prep = time.time() - t0

pages = synth.pages_df(spark, n_pages, n_ent)
t0 = time.time()
out = run_kg_pipeline(
    spark, pages, chunk_size=512, chunk_overlap=64,
    precomputed_labels=labels,
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
