"""Table catalog: Iceberg-style partitioned tables for the KG outputs.

BASELINE.json targets Iceberg tables of Common-Crawl pages.  The
sandbox has no Iceberg runtime jar, so this module provides one code
path with two backends, chosen at runtime:

- ``iceberg``: real ``writeTo(...).using("iceberg")`` + MERGE INTO
  upserts, used when the session has an Iceberg catalog configured
  (``spark.sql.catalog.<name>`` conf present).
- ``parquet``: identical logical layout — same schemas, same
  partition spec (bucket(url) becomes an explicit ``url_bucket``
  column, time partitions become date columns) — with anti-join +
  append emulating insert-only MERGE.

Partition specs mirror what we would declare in Iceberg DDL:
pages/docs/chunks/triples by ``bucket(N, url)``; nodes/edges by
``bucket(N, entity key)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 64


def has_iceberg(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured on the session."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in confs
    )


def with_bucket(
    df: DataFrame, key_col: str, n_buckets: int = DEFAULT_BUCKETS,
    bucket_col: str = "part_bucket",
) -> DataFrame:
    """Explicit bucket column = pmod(xxhash64(key), n) — the parquet
    emulation of Iceberg's bucket(n, key) partition transform (same
    co-location property for joins on the key)."""
    return df.withColumn(
        bucket_col, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    )


def save_table(
    spark: SparkSession,
    df: DataFrame,
    location: str,
    name: str,
    bucket_key: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Write a KG table with the standard partition spec."""
    if has_iceberg(spark):
        writer = df.writeTo(f"{name}").using("iceberg")
        if bucket_key is not None:
            writer = writer.partitionedBy(
                F.bucket(n_buckets, F.col(bucket_key))
            )
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    out = df
    partition_by = None
    if bucket_key is not None:
        out = with_bucket(df, bucket_key, n_buckets)
        partition_by = "part_bucket"
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(os.path.join(location, name))


def load_table(spark: SparkSession, location: str, name: str) -> DataFrame:
    if has_iceberg(spark):
        return spark.table(name)
    return spark.read.parquet(os.path.join(location, name))


def upsert_insert_only(
    spark: SparkSession,
    new_rows: DataFrame,
    location: str,
    name: str,
    key_cols: list[str],
) -> DataFrame:
    """Insert-only upsert (the reference KV semantics,
    ``storage/kv/json_storage.py:48-52``): Iceberg MERGE INTO ... WHEN
    NOT MATCHED THEN INSERT, or anti-join + append on parquet."""
    if has_iceberg(spark):
        new_rows.createOrReplaceTempView("_upsert_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
        spark.sql(
            f"MERGE INTO {name} t USING _upsert_src s ON {on} "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        return spark.table(name)
    path = os.path.join(location, name)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        to_add = new_rows.join(
            existing.select(*key_cols), key_cols, "left_anti"
        )
        to_add.write.mode("append").parquet(path)
    else:
        new_rows.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def save_kg(
    spark: SparkSession, out: dict, location: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize the pipeline dict with the standard partition
    specs (url-bucketed facts, entity-bucketed graph tables)."""
    spec = {
        "triples": "url",
        "chunks": "url",
        "nodes": "entity_name",
        "edges": "src_id",
    }
    for name, key in spec.items():
        if name in out:
            save_table(
                spark, out[name], location, name,
                bucket_key=key, n_buckets=n_buckets,
            )
