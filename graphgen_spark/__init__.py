"""graphgen_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
InternScience/GraphGen (reference at /root/reference, read-only).

Architecture: immutable partitioned DataFrames/tables flow stage to
stage (pages -> docs -> chunks -> records -> entities/relations ->
nodes/edges/triples -> coverage stats); the reference's central Ray
actors (LLM client, graph store, KV store) are replaced by
Arrow-vectorized pandas UDFs, groupBy/join shuffles, and checkpoint
tables.  See SURVEY.md §7 for the blueprint.
"""

__version__ = "0.1.0"
