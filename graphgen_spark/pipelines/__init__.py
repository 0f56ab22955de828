from graphgen_spark.pipelines.kg_pipeline import (
    alias_labels,
    canonicalize,
    records_to_graph,
    run_kg_pipeline,
    run_mixed_kg_pipeline,
)

__all__ = [
    "alias_labels",
    "canonicalize",
    "records_to_graph",
    "run_kg_pipeline",
    "run_mixed_kg_pipeline",
]
