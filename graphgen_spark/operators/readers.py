"""Unified multi-format document readers (reference ``operators/read/
read.py:152-229`` + ``models/reader/*``).

The reference groups input files by suffix, reads each format with a
dedicated reader, validates rows (``bases/base_reader.py:32-68``:
``type`` column required; text rows with blank ``content`` dropped),
assigns md5 trace ids, unions the per-format datasets, and applies an
optional row limit.

Spark mapping: ``spark.read.{json,csv,parquet,text,binaryFile}`` per
suffix group; validation is a filter; trace ids are native md5
expressions; the union is ``unionByName(allowMissingColumns=True)``.
Directory listing/pruning is Spark's InMemoryFileIndex — the
reference's threaded ``ParallelFileScanner`` with its mtime KV cache
is unnecessary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEXT_SUFFIXES = {".txt", ".md"}
JSON_SUFFIXES = {".json", ".jsonl"}
CSV_SUFFIXES = {".csv"}
PARQUET_SUFFIXES = {".parquet"}
RDF_SUFFIXES = {".nt"}
PICKLE_SUFFIXES = {".pkl", ".pickle"}

ALLOWED_DOC_TYPES = (
    "text", "image", "table", "equation", "protein", "dna", "rna"
)


def _suffix(path: str) -> str:
    return os.path.splitext(path)[1].lower()


def read_json_docs(
    spark: SparkSession, paths: list[str], multiline: bool | None = None
) -> DataFrame:
    """json/jsonl -> docs; nested dict ``content`` is re-serialized to
    a string (reference JSONReader schema unify,
    ``models/reader/json_reader.py:19-59``).

    The reference's canonical ``.json`` format is a pretty-printed
    whole-file array (``json.load``, see
    ``examples/input_examples/json_demo.json``), which line-oriented
    parsing silently shreds into ``_corrupt_record`` rows — so ``.json``
    defaults to ``multiLine=true`` and ``.jsonl`` to line mode, and a
    parse that yields ONLY ``_corrupt_record`` fails loudly instead of
    dropping every row downstream."""
    if multiline is None:
        multiline = any(_suffix(p) == ".json" for p in paths)
    df = spark.read.option(
        "multiLine", "true" if multiline else "false"
    ).json(paths)
    if set(df.columns) <= {"_corrupt_record"}:
        raise ValueError(
            f"JSON read produced no parseable columns for {paths}: "
            f"schema={df.columns}. A whole-file array needs "
            "multiline=True; one-object-per-line needs multiline=False."
        )
    if "type" not in df.columns:
        df = df.withColumn("type", F.lit("text"))
    if (
        "content" in df.columns
        and df.schema["content"].dataType.typeName() != "string"
    ):
        df = df.withColumn("content", F.to_json("content"))
    return df


def read_csv_docs(spark: SparkSession, paths: list[str]) -> DataFrame:
    return spark.read.option("header", "true").csv(paths)


def read_parquet_docs(spark: SparkSession, paths: list[str]) -> DataFrame:
    return spark.read.parquet(*paths)


def read_text_docs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """one doc per file: binaryFile scan + utf-8 decode (reference
    TXTReader, ``models/reader/txt_reader.py:11-36``)."""
    df = spark.read.format("binaryFile").load(paths)
    return df.select(
        F.lit("text").alias("type"),
        F.decode(F.col("content"), "UTF-8").alias("content"),
        F.col("path").alias("source_path"),
    )


def read_pickle_docs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """pickle -> docs (reference PickleReader,
    ``models/reader/pickle_reader.py:12-80``: each file holds a
    ``list[dict]`` with at least ``type`` (+ ``content`` for text);
    non-list / non-dict payloads are dropped with the same leniency).

    Spark mapping: ``binaryFile`` scan + an Arrow-batched unpickle.
    The reference flattens arbitrary keys; here the schema is stable —
    ``type``/``content``/``source_path`` columns plus the remaining
    keys re-serialized into a ``meta`` JSON string."""
    import json
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("type", T.StringType(), True),
            T.StructField("content", T.StringType(), True),
            T.StructField("meta", T.StringType(), True),
            T.StructField("source_path", T.StringType(), True),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pickle

        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    data = pickle.loads(bytes(blob))
                except Exception:
                    continue
                if not isinstance(data, list):
                    continue
                for item in data:
                    if not isinstance(item, dict):
                        continue
                    extra = {
                        k: v for k, v in item.items()
                        if k not in ("type", "content")
                    }
                    rows.append(
                        (
                            item.get("type"),
                            item.get("content"),
                            json.dumps(extra, sort_keys=True)
                            if extra else None,
                            path,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["type", "content", "meta", "source_path"],
            )

    df = spark.read.format("binaryFile").load(paths)
    return df.select("path", "content").mapInPandas(gen, schema=out_schema)


def validate_docs(df: DataFrame) -> DataFrame:
    """Reader validation (``base_reader.py:54-68``): require ``type``;
    drop text rows whose content is blank."""
    if "type" not in df.columns:
        raise ValueError("missing required column: type")
    if "content" not in df.columns:
        df = df.withColumn("content", F.lit(None).cast("string"))
    return df.where(
        (F.col("type") != "text")
        | (
            F.col("content").isNotNull()
            & (F.trim(F.col("content")) != "")
        )
    )


# Groups: 1=subj iri, 2=subj bnode, 3=pred,
#         4=obj iri, 5=obj bnode, 6=obj literal body.
# The literal tail is an EXPLICIT datatype/lang-tag alternative —
# a lazy [^.]* cannot cross the dots inside XSD datatype IRIs
# ("5"^^<http://www.w3.org/2001/XMLSchema#integer>) and would drop
# every typed literal.
_NT_LINE = (
    r'^\s*(?:<([^>]*)>|(_:\S+))\s+'                  # subject
    r'<([^>]*)>\s+'                                  # predicate
    r'(?:<([^>]*)>|(_:\S+)|"((?:[^"\\]|\\.)*)"'      # object
    r'(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)'              # ^^<dtype> | @lang
    r'\s*\.\s*$'
)


def _unescape_nt_literal(col):
    """N-Triples literal escapes (\\" \\n \\t \\\\ \\uXXXX) are a
    subset of JSON string escapes -> unescape JVM-side via from_json;
    fall back to the raw body for sequences JSON lacks (\\UXXXXXXXX)."""
    unescaped = F.from_json(
        F.concat(F.lit('["'), col, F.lit('"]')), "array<string>"
    )[0]
    return F.coalesce(unescaped, col)


def read_rdf_docs(spark: SparkSession, paths: list[str]) -> DataFrame:
    """N-Triples -> one doc per subject (reference RDFReader,
    ``models/reader/rdf_reader.py:71-134``: content = joined literal
    objects, ``properties`` = predicate -> objects map).

    Spark mapping: line-oriented N-Triples is the one RDF syntax that
    scans distributed — ``spark.read.text`` + JVM regex parse +
    groupBy(subject); no rdflib, no per-row Python.  (Turtle/OWL need
    a stateful parser and a whole-file read; out of scope like the
    reference's other external-tool readers.)
    """
    lines = spark.read.text(paths).select(
        F.col("value"),
        F.input_file_name().alias("source_path"),
    )
    parsed = lines.select(
        F.concat(
            F.regexp_extract("value", _NT_LINE, 1),
            F.regexp_extract("value", _NT_LINE, 2),
        ).alias("subj"),
        F.regexp_extract("value", _NT_LINE, 3).alias("pred"),
        F.concat(
            F.regexp_extract("value", _NT_LINE, 4),
            F.regexp_extract("value", _NT_LINE, 5),
        ).alias("obj_res"),
        F.regexp_extract("value", _NT_LINE, 6).alias("obj_lit"),
        "source_path",
    ).where((F.col("subj") != "") & (F.col("pred") != ""))
    triples = parsed.select(
        "subj",
        "pred",
        F.when(F.col("obj_res") != "", F.col("obj_res"))
        .otherwise(_unescape_nt_literal(F.col("obj_lit")))
        .alias("obj"),
        (F.col("obj_res") == "").alias("is_literal"),
        "source_path",
    )
    # two-level agg: pred-level object lists first (reference props
    # are pred -> list), then subject-level map + joined literals;
    # everything sorted for cross-parallelism determinism
    per_pred = triples.groupBy("subj", "source_path", "pred").agg(
        F.array_sort(F.collect_list("obj")).alias("objs"),
        F.array_sort(
            F.collect_list(F.when(F.col("is_literal"), F.col("obj")))
        ).alias("lits"),
    )
    return (
        per_pred.groupBy("subj", "source_path")
        .agg(
            F.array_join(
                F.flatten(F.array_sort(F.collect_list("lits"))), " "
            ).alias("content"),
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("pred", "objs")))
            ).alias("properties"),
        )
        .select(
            F.lit("text").alias("type"),
            F.col("subj").alias("id"),
            F.trim("content").alias("content"),
            "properties",
            "source_path",
        )
    )


def with_trace_id(df: DataFrame, op: str = "read") -> DataFrame:
    """Deterministic md5 trace id over the sorted row content
    (reference ``utils/hash.py:12-14`` + ``read.py:132-142``)."""
    cols = sorted(c for c in df.columns if not c.startswith("_"))
    # coalesce each column to a NULL sentinel: concat_ws SKIPS nulls,
    # so (a, NULL, b) and (a, b, NULL) would otherwise collide and the
    # checkpoint anti-join would silently drop one of them
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
        for c in cols
    ]
    return df.withColumn(
        "_trace_id",
        F.concat(F.lit(f"{op}-"), F.md5(F.concat_ws("\x1f", *parts))),
    )


def read_documents(
    spark: SparkSession,
    input_paths: list[str],
    read_nums: int | None = None,
) -> DataFrame:
    """Multi-format unified read: group by suffix, per-format read,
    validate, trace-id, union, optional limit (reference
    ``read.py:152-229``)."""
    groups: dict[str, list[str]] = {}
    for p in input_paths:
        groups.setdefault(_suffix(p), []).append(p)

    parts: list[DataFrame] = []
    for suffix, paths in sorted(groups.items()):
        if suffix in JSON_SUFFIXES:
            df = read_json_docs(spark, paths)
        elif suffix in CSV_SUFFIXES:
            df = read_csv_docs(spark, paths)
        elif suffix in PARQUET_SUFFIXES:
            df = read_parquet_docs(spark, paths)
        elif suffix in TEXT_SUFFIXES:
            df = read_text_docs(spark, paths)
        elif suffix in RDF_SUFFIXES:
            df = read_rdf_docs(spark, paths).drop("properties")
        elif suffix in PICKLE_SUFFIXES:
            df = read_pickle_docs(spark, paths)
        else:
            raise ValueError(f"unsupported suffix: {suffix}")
        if "type" not in df.columns:
            df = df.withColumn("type", F.lit("text"))
        parts.append(with_trace_id(validate_docs(df)))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    if read_nums is not None:
        out = out.limit(read_nums)
    return out
