"""Build the --py-files artifact for cluster submission.

Produces dist/graphgen_spark.zip containing the graphgen_spark package
and __spark_entry__.py. On a real multi-executor cluster:

    python tools/make_pyfiles.py
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/graphgen_spark.zip \
        tools/submit_flagship.py s3://bucket/pages/

Executors unpack the zip onto sys.path, so the pandas-UDF closures
(which reference graphgen_spark modules by name) import cleanly on
every worker — the piece a local sys.path hack silently skips.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(REPO, "dist")
OUT = os.path.join(DIST, "graphgen_spark.zip")


def build(out: str = OUT) -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "graphgen_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
        zf.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return out


if __name__ == "__main__":
    print(build())
