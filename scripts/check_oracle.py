"""Local replica of the driver's correctness gate: run each queries() entry
via Spark AND its oracle_sql() via DuckDB on the same parquet tables, compare
row-count + column names + (order-insensitive) values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and float repr noise
        return f"{v:.6f}"
    return str(v)


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from tsengine.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions="8")
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(norm(r[c]) for c in scols) for r in sdf.collect()
            )
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if sql is None:
            print(f"[rows-only] {name}: {len(srows)} rows, cols={scols}")
            continue
        try:
            ddf = con.execute(sql).fetch_df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duckdb] {name}: {e}")
            continue
        dcols = sorted(ddf.columns)
        drows = sorted(
            tuple(norm(v) for v in row)
            for row in ddf[dcols].itertuples(index=False, name=None)
        )
        if scols != dcols:
            failures.append((name, f"schema {scols} != {dcols}"))
            print(f"[FAIL-schema] {name}: {scols} != {dcols}")
            continue
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} != {len(drows)}"))
            print(f"[FAIL-count] {name}: {len(srows)} != {len(drows)}")
            continue
        mism = [(a, b) for a, b in zip(srows, drows) if a != b]
        if mism:
            failures.append((name, f"{len(mism)} mismatched rows, first: {mism[0]}"))
            print(f"[FAIL-values] {name}: {len(mism)}/{len(srows)} rows differ; first: {mism[0]}")
        else:
            print(f"[OK] {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
