"""Local stand-in for the driver's verify: runs entry() as a smoke
check, then each queries()[name] vs oracle_sql()[name] through DuckDB at
a given sf dir, comparing row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted)."""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from graphgen_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # full precision: a %.6g normalization masked a driver-visible
        # 6th-decimal mismatch for two rounds (VERDICT r2, "What's wrong")
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: str | None = None):
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    if only is None:
        t0 = time.time()
        df = entrymod.entry(spark)
        n = df.count()
        print(f"entry(): {n} rows, schema={df.columns} "
              f"[{time.time()-t0:.1f}s]")
        assert n >= 0

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name != only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only, {len(srows)} rows [{elapsed:.1f}s]")
            continue
        ddf = con.sql(oracles[name])
        dcols = [c for c in ddf.columns]
        drows = [tuple(r) for r in ddf.fetchall()]
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        sh = frame_hash(srows, scols)
        dh = frame_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK" if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"  {name}: {status} rows={len(srows)}/{len(drows)} "
            f"cols_ok={ok_cols} hash_ok={ok_hash} [{elapsed:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols: {sorted(scols)}")
                print(f"    duck  cols: {sorted(dcols)}")
            if ok_cols and not ok_hash and len(srows) < 50:
                print(f"    spark: {sorted(srows)[:5]}")
                print(f"    duck : {sorted(drows)[:5]}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main(*sys.argv[1:])
