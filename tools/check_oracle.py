"""Local replica of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
schema (column names), and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from cqaduplicatefind_spark.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    import datetime as dt
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(rows, colnames) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    # fail fast on unknown names BEFORE paying Spark session startup: a
    # typo'd subset would otherwise run zero checks and still print the pass
    # line (harness-integrity, round-5 review)
    unknown = only - set(qs)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        sys.exit(2)

    spark = build_session(master="local[8]", shuffle_partitions=16,
                          extra={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:35s} rows-only: {len(srows)} rows  cols={scols}")
            continue
        ddf = con.execute(oracles[name])
        dcols = [d[0] for d in ddf.description]
        drows = ddf.fetchall()
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        h_s = value_hash([tuple(r) for r in srows], scols)
        h_d = value_hash(drows, dcols)
        ok_h = h_s == h_d
        status = "OK " if (ok_n and ok_c and ok_h) else "FAIL"
        print(f"{name:35s} {status} rows {len(srows)}/{len(drows)} "
              f"cols={'OK' if ok_c else (scols, dcols)} hash={'OK' if ok_h else (h_s, h_d)}")
        if status == "FAIL":
            failures.append(name)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
