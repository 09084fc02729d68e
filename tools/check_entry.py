"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()``
twin on DuckDB over the same sf tier, and compare row multisets
EXACTLY (floats compared bitwise after the double cast both sides
apply).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from lucene_solr_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if isinstance(v, bool):
        return ("b", v)
    return v


def to_rowset(cols, rows):
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        [tuple(norm_cell(r[i]) for i in order) for r in rows],
        key=repr,
    ), [cols[i] for i in order]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_entry")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t1 = time.time()
        status_extra = ""
        if name not in oracles:
            status = "ROWS-ONLY" if len(srows) >= 0 else "??"
            print(f"{name:24s} {status}  rows={len(srows)}  "
                  f"spark={t1 - t0:.1f}s")
            continue
        ores = con.sql(oracles[name])
        ocols = ores.columns
        orows = ores.fetchall()
        sset, scolss = to_rowset(scols, srows)
        oset, ocolss = to_rowset(ocols, orows)
        ok_schema = [c.lower() for c in scolss] == [c.lower() for c in ocolss]
        ok_rows = len(sset) == len(oset)
        ok_vals = sset == oset
        ok = ok_schema and ok_rows and ok_vals
        if not ok:
            failures.append(name)
            status_extra = (
                f"  schema={ok_schema}({scolss} vs {ocolss}) "
                f"rowcount={len(sset)}/{len(oset)}"
            )
            if ok_schema and ok_rows:
                diffs = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                status_extra += f" first_diffs={diffs}"
        print(
            f"{name:24s} {'OK' if ok else 'FAIL'}  rows={len(sset)}  "
            f"spark={t1 - t0:.1f}s oracle={time.time() - t1:.1f}s"
            + status_extra
        )
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
