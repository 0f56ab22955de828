"""spark-submit entry point: run the flagship KG pipeline exactly the
way a cluster user would (north_rule: launched via spark-submit
--py-files), print plan + sample triples + counts.

Usage (cluster):
  python tools/make_pyfiles.py
  spark-submit --master yarn --py-files dist/graphgen_spark.zip \
      tools/submit_flagship.py <pages_dir>
Usage (local):
  spark-submit --master local[8] tools/submit_flagship.py [sf_dir]
"""

import os
import sys
import time

try:
    import graphgen_spark  # noqa: F401  (present when shipped via --py-files)
except ImportError:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )

from pyspark.sql import SparkSession

import __spark_entry__ as entrymod

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = SparkSession.builder.appName("kg_flagship").getOrCreate()
spark.sparkContext.setLogLevel("WARN")

t0 = time.time()
triples = entrymod._q_kg_triples(spark, sf_dir)
n = triples.count()
elapsed = time.time() - t0
print(f"TRIPLES={n} elapsed={elapsed:.1f}s sf_dir={sf_dir}")
for row in triples.limit(5).collect():
    print("  ", row["subj"], "|", row["pred"], "|", row["obj"])
spark.stop()
