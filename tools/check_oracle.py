"""Local emulation of the driver's correctness gate.

Runs every query in ``__spark_entry__.queries()`` at a given sf dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet,
and compares row count, column names, and an order-insensitive
value comparison (sorted rows, columns sorted by name, floats
rounded). Prints a per-query PASS/FAIL table.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    # Stricter than round(x, 6): the driver hashes raw values, so the
    # local gate must not paper over sub-1e-6 divergence. Queries are
    # expected to quantize floats themselves (r/sql_r helpers); 9 dp
    # only absorbs half-ulp noise on the already-quantized grid.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, decimal.Decimal):
        return v.normalize()
    if isinstance(v, (list, tuple)):
        return tuple(normalize(x) for x in v)
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from etl_pipeline_4handling_listings_spark.session import get_spark

    if os.environ.get("SPARK_GRAFT_PLAIN"):
        # hostile-driver probe 2: a COMPLETELY stock SparkSession —
        # default 200 shuffle partitions, no AQE/Arrow/timezone conf
        # from session.py — exactly what an unknown driver builds
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("plain-probe")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # hostile-driver probe: the real driver builds its own session,
    # possibly in a non-UTC zone — SPARK_GRAFT_TZ=America/New_York
    # re-runs the whole gate under that assumption
    tz = os.environ.get("SPARK_GRAFT_TZ")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=3)
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc(limit=3)
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            s = canon([tuple(r) for r in srows], scols)
            d = canon(drows, dcols)
            if s != d:
                diff_idx = next(
                    (i for i, (a, b) in enumerate(zip(s, d)) if a != b), None
                )
                problems.append(
                    f"values differ; first diff at sorted row {diff_idx}:\n"
                    f"    spark : {s[diff_idx] if diff_idx is not None else None}\n"
                    f"    duckdb: {d[diff_idx] if diff_idx is not None else None}"
                )
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failed.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows")
    print()
    print(f"{'ALL PASS' if not failed else 'FAILURES: ' + ', '.join(failed)}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
