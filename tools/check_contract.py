#!/usr/bin/env python3
"""Simulate the driver's correctness gate locally.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the same query on DuckDB over the identical
parquet tables; compares row count, schema (column names sorted), and a
value hash of the full result with columns sorted by name — mirroring the
driver's CORRECTNESS_r{N}.json protocol described in the round brief.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value normalization: round floats to tolerate
        # engine-level least-significant-bit differences
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from web_search_pagerank_project_spark.session import get_spark

    spark = get_spark(app_name="contract-check", master="local[8]",
                      shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        finally:
            # each query builds + caches its own graph/signature state;
            # release it so a full 28-query sweep doesn't accrete pinned
            # storage across queries (VERDICT r1 item 7)
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = [tuple(r) for r in cur.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_n = len(srows) == len(orows)
        ok_schema = sorted(scols) == sorted(ocols)
        ok_hash = (
            value_hash(scols, srows) == value_hash(ocols, orows)
            if ok_n and ok_schema
            else False
        )
        status = "OK   " if (ok_n and ok_schema and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} "
            f"schema={'=' if ok_schema else 'DIFF ' + str(scols) + ' vs ' + str(ocols)} "
            f"hash={'=' if ok_hash else 'DIFF'}"
        )
        if not ok_hash and ok_n and ok_schema and len(srows) <= 2000:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sset = sorted(
                tuple(_norm_cell(r[i]) for i in order) for r in srows
            )
            oset = sorted(
                tuple(_norm_cell(r[i]) for i in oorder) for r in orows
            )
            diffs = [
                (a, b) for a, b in zip(sset, oset) if a != b
            ][:3]
            for a, b in diffs:
                print(f"        spark={a}\n        duck ={b}")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
