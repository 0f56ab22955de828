from graphgen_spark.pipelines.kg_pipeline import (
    alias_labels,
    canonicalize,
    run_kg_pipeline,
)

__all__ = ["alias_labels", "canonicalize", "run_kg_pipeline"]
