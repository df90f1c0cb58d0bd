#!/usr/bin/env python
"""Pre-flight simulation of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares row count, column
set, and a value hash computed the way the driver does (columns sorted by
name, rows sorted, values stringified with float rounding).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # the driver stringifies ints and floats DIFFERENTLY (1234 vs
        # 1234.0): a DuckDB HUGEINT sum arriving as float64 must NOT hash
        # equal to Spark's int64 — keep the float marker so this gate
        # catches the mismatch the way the driver does (round-1 lesson:
        # %.6g alone rendered them identically and masked two red rows)
        if math.isnan(v):
            return "nan"
        s = f"{v:.6g}"
        return s if any(c in s for c in ".einf") else s + ".0"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (bytes, bytearray)):
        # the driver's canonicalizer CRASHES sorting binary columns
        # (unhashable bytearray) — surface that as a failure here too
        raise TypeError(
            "binary output column would crash the driver's canonicalizer; "
            "emit hex strings instead (F.hex / DuckDB hex())"
        )
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from holi_search_engine_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} (no oracle; rows-only check)")
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        else:
            try:
                if table_hash(srows, scols) != table_hash(orows, ocols):
                    problems.append("value-hash mismatch")
            except TypeError as e:
                problems.append(str(e))
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"ok    {name}: rows={len(srows)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} weak (rows-only), {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
