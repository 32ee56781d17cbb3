"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the given sf dir, then compares row count, schema (column names), and an
order-insensitive value comparison (columns sorted by name, rows sorted,
doubles compared via repr after normalization).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from collection_templates_spark.session import get_spark

    spark = get_spark("check")
    con = duckdb.connect()
    # r6: by the tail of a 78-oracle run the Spark JVM has grown tens of
    # GB and DuckDB's default memory_limit (80 % of RAM) collides with
    # it — allocation failures on queries that pass standalone. A modest
    # explicit limit makes DuckDB spill instead of fail; sf0.01 oracles
    # never genuinely need more.
    con.execute("SET memory_limit='16GB'")
    con.execute("SET temp_directory='/tmp/duckdb_check_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"WARN: unknown query name(s): {sorted(unknown)}")
    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        sc, sr = normalize(scols, srows)
        dc, dr = normalize(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: schema {sc} vs {dc}")
            failures.append(name)
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            failures.append(name)
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}")
            failures.append(name)
        else:
            print(f"PASS {name} ({len(sr)} rows) [{time.time()-t0:.1f}s]")
    # r5 verdict #5: report the number of queries ACTUALLY checked — a
    # filtered run must not claim the full bank passed
    print(f"\n{checked - len(failures)}/{checked} pass"
          + ("" if not only else f" (of {len(qs)} in bank)"))
    return 1 if failures or unknown else 0


if __name__ == "__main__":
    raise SystemExit(main())
